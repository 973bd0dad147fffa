package graft.ingest

import scala.collection.mutable.ArrayBuffer
import graft.core.Ids
import graft.core.Model._

/** Markdown parser + intelligent chunker (reference:
  * analysis/parser.py:1493-2107): h1/h2 headers become documentation
  * entities; sections are greedily grouped under a token budget, oversized
  * sections split, undersized groups merged, and each emitted chunk gets a
  * fixed-size overlap of its predecessor's tail for retrieval continuity.
  * Token counts are estimated at len/4 (the tiktoken stand-in).
  */
object MarkdownParser {

  val TokenBudget = 850
  val SplitThreshold = 1000
  val MinChunkTokens = 600
  val OverlapChars = 200
  val MaxSectionsPerChunk = 10

  private val HeaderRe = """^(#{1,6})\s+(.*)$""".r

  case class Section(level: Int, title: String, startLine: Int, endLine: Int, text: String) {
    def tokens: Int = text.length / 4
  }

  def sections(content: String): Seq[Section] = {
    val lines = content.split("\n", -1)
    val heads = lines.zipWithIndex.collect { case (HeaderRe(h, t), i) => (h.length, t.trim, i) }
    if (heads.isEmpty) return Seq(Section(0, "", 1, lines.length, content))
    val out = ArrayBuffer[Section]()
    // preamble before the first header
    if (heads.head._3 > 0) {
      val text = lines.slice(0, heads.head._3).mkString("\n")
      if (text.trim.nonEmpty) out += Section(0, "", 1, heads.head._3, text)
    }
    heads.zipWithIndex.foreach { case ((lvl, title, start), idx) =>
      val end = if (idx + 1 < heads.length) heads(idx + 1)._3 else lines.length
      out += Section(lvl, title, start + 1, end, lines.slice(start, end).mkString("\n"))
    }
    out.toSeq
  }

  /** Greedy grouping to the token budget with the reference's 4 passes,
    * simplified: split oversized, group to budget (≤10 sections), emit.
    */
  def groupSections(secs: Seq[Section]): Seq[Seq[Section]] = {
    // pass 1: split sections over SplitThreshold at paragraph boundaries
    val split = secs.flatMap { s =>
      if (s.tokens <= SplitThreshold) Seq(s)
      else {
        val paras = s.text.split("\n\n")
        val parts = ArrayBuffer[String]()
        val cur = new StringBuilder
        paras.foreach { p =>
          if (cur.nonEmpty && (cur.length + p.length) / 4 > TokenBudget) {
            parts += cur.toString; cur.clear()
          }
          if (cur.nonEmpty) cur.append("\n\n")
          cur.append(p)
        }
        if (cur.nonEmpty) parts += cur.toString
        parts.zipWithIndex.map { case (t, i) =>
          Section(s.level, if (i == 0) s.title else s"${s.title} (part ${i + 1})", s.startLine, s.endLine, t)
        }
      }
    }
    // pass 2: greedy grouping under budget
    val groups = ArrayBuffer[ArrayBuffer[Section]]()
    split.foreach { s =>
      if (groups.nonEmpty &&
        groups.last.map(_.tokens).sum + s.tokens <= TokenBudget &&
        groups.last.length < MaxSectionsPerChunk)
        groups.last += s
      else groups += ArrayBuffer(s)
    }
    // pass 3: redistribute undersized groups (reference
    // _redistribute_undersized_chunks, parser.py:1854-1906): an
    // under-minimum group merges forward into the NEXT group if the
    // combined chunk stays within budget and ≤ 8 sections, else backward
    // into the previous — so no tiny chunk sits beside roomy neighbors
    val redistributed = ArrayBuffer[ArrayBuffer[Section]]()
    var i = 0
    while (i < groups.length) {
      val cur = groups(i)
      val curTokens = cur.map(_.tokens).sum
      var merged = false
      if (groups.length > 1 && curTokens < MinChunkTokens) {
        if (i < groups.length - 1) {
          val next = groups(i + 1)
          if (curTokens + next.map(_.tokens).sum <= SplitThreshold &&
            cur.length + next.length <= 8) {
            redistributed += (cur ++ next)
            i += 2
            merged = true
          }
        }
        if (!merged && redistributed.nonEmpty) {
          val prev = redistributed.last
          if (prev.map(_.tokens).sum + curTokens <= SplitThreshold &&
            prev.length + cur.length <= 8) {
            redistributed(redistributed.length - 1) = prev ++ cur
            i += 1
            merged = true
          }
        }
      }
      if (!merged) { redistributed += cur; i += 1 }
    }
    redistributed.map(_.toSeq).toSeq
  }

  def parse(relPath: String, content: String): ParserResult = {
    val entities = ArrayBuffer[Entity]()
    val relations = ArrayBuffer[Relation]()
    val implChunks = ArrayBuffer[Chunk]()

    val lines = content.split("\n", -1)
    entities += Entity(relPath, "file", relPath, 1, lines.length,
      Seq(s"Markdown document with ${lines.length} lines"), "", "")

    val secs = sections(content)
    // h1/h2 entities (reference: parser.py:1638-1732)
    secs.filter(s => s.level == 1 || s.level == 2).foreach { s =>
      entities += Entity(s.title, "documentation", relPath, s.startLine, s.endLine,
        Seq(s"section: ${s.title}", s"level: h${s.level}"), "", "")
      relations += Relation(relPath, s.title, "contains", "", "", 1.0)
    }

    // chunk groups with overlap injection (reference: parser.py:1909-1940)
    val groups = groupSections(secs)
    var prevTail = ""
    groups.zipWithIndex.foreach { case (g, gi) =>
      val headers = g.map(_.title).filter(_.nonEmpty)
      val name = headers.headOption.getOrElse(s"$relPath#chunk$gi") +
        (if (headers.length > 1) s" (+${headers.length - 1} more)" else "")
      val text = g.map(_.text).mkString("\n")
      val withOverlap = if (prevTail.nonEmpty) prevTail + "\n" + text else text
      val cid = Ids.entityChunkId(relPath, name, "implementation")
      implChunks += Chunk(cid, "implementation", name, "documentation", relPath,
        g.head.startLine, g.last.endLine, withOverlap, "",
        Ids.sha256Hex(withOverlap), "", "", hasImplementation = true)
      entities += Entity(name, "documentation", relPath, g.head.startLine, g.last.endLine,
        (Seq(s"documentation chunk: $name", s"sections: ${g.length}",
          s"preview: ${text.take(300).replace("\n", " ")}") ++
          (if (headers.nonEmpty) Seq(s"headers: ${headers.mkString(", ")}") else Seq.empty)),
        "", "")
      relations += Relation(relPath, name, "contains", "", "", 1.0)
      prevTail = text.takeRight(OverlapChars)
    }

    ParserResult(relPath, Ids.sha256Hex(content), entities.toSeq, relations.toSeq,
      implChunks.toSeq, Seq.empty)
  }
}
