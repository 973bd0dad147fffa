package graft.ingest

import scala.collection.mutable.ArrayBuffer
import graft.core.Ids
import graft.core.Model._

/** Text/.log parser (reference: analysis/text_parser.py:16-147): fixed
  * 50-line chunks, 1000-char line truncation, ≥10-char filter; each chunk
  * becomes a DOCUMENTATION entity + implementation chunk + contains edge.
  */
object TextParser {
  val ChunkLines = 50
  val MaxLineChars = 1000
  val MinChunkChars = 10

  def parse(relPath: String, content: String): ParserResult = {
    val lines = content.split("\n", -1).map(l => if (l.length > MaxLineChars) l.take(MaxLineChars) else l)
    val entities = ArrayBuffer[Entity]()
    val relations = ArrayBuffer[Relation]()
    val implChunks = ArrayBuffer[Chunk]()
    entities += Entity(relPath, "file", relPath, 1, lines.length,
      Seq(s"text file with ${lines.length} lines"), "", "")
    lines.grouped(ChunkLines).zipWithIndex.foreach { case (g, ci) =>
      val text = g.mkString("\n")
      if (text.trim.length >= MinChunkChars) {
        val name = s"$relPath#chunk$ci"
        val start = ci * ChunkLines + 1
        val end = start + g.length - 1
        entities += Entity(name, "documentation", relPath, start, end,
          Seq(s"text chunk $ci", s"lines $start-$end"), "", "")
        relations += Relation(relPath, name, "contains", "", "", 1.0)
        implChunks += Chunk(Ids.entityChunkId(relPath, name, "implementation"),
          "implementation", name, "documentation", relPath, start, end, text, "",
          Ids.sha256Hex(text), "", "", hasImplementation = true)
      }
    }
    ParserResult(relPath, Ids.sha256Hex(content), entities.toSeq, relations.toSeq,
      implChunks.toSeq, Seq.empty)
  }
}

/** JSON parser (reference: analysis/json_parser.py:20-285): generic object
  * structure (top-level + nested keys to depth 2), with package.json /
  * tsconfig.json special-cased.
  */
object JsonParser {
  private val KeyRe = """"([^"\\]+)"\s*:""".r

  def parse(relPath: String, content: String): ParserResult = {
    val entities = ArrayBuffer[Entity]()
    val relations = ArrayBuffer[Relation]()
    val lines = content.split("\n", -1)
    val fileName = relPath.split('/').last
    entities += Entity(relPath, "file", relPath, 1, lines.length,
      Seq(s"JSON file with ${lines.length} lines"), "", "")
    val keys = KeyRe.findAllMatchIn(content).map(_.group(1)).toSeq.distinct.take(50)
    if (fileName == "package.json") {
      val nameRe = """"name"\s*:\s*"([^"]+)"""".r
      nameRe.findFirstMatchIn(content).foreach { m =>
        entities += Entity(m.group(1), "module", relPath, 1, lines.length,
          Seq(s"npm package: ${m.group(1)}"), "", "")
        relations += Relation(relPath, m.group(1), "contains", "", "", 1.0)
      }
      // dependencies as imports
      val depBlock = """"(?:dev)?[dD]ependencies"\s*:\s*\{([^}]*)\}""".r
      depBlock.findAllMatchIn(content).flatMap(m => KeyRe.findAllMatchIn(m.group(1)).map(_.group(1)))
        .toSeq.distinct.foreach { dep =>
          relations += Relation(relPath, dep, "imports", "npm", "", 1.0)
        }
    } else {
      keys.foreach { k =>
        entities += Entity(s"$fileName::$k", "variable", relPath, 1, lines.length,
          Seq(s"json key: $k"), "", "")
        relations += Relation(relPath, s"$fileName::$k", "contains", "", "", 1.0)
      }
    }
    ParserResult(relPath, Ids.sha256Hex(content), entities.toSeq, relations.toSeq,
      Seq.empty, Seq.empty)
  }
}

/** YAML parser (reference: analysis/yaml_parser.py:18-325): type sniffing
  * for GitHub workflows / docker-compose / kubernetes, else generic
  * top-level keys.
  */
object YamlParser {
  private val TopKeyRe = """^([A-Za-z_][\w-]*)\s*:""".r

  def parse(relPath: String, content: String): ParserResult = {
    val entities = ArrayBuffer[Entity]()
    val relations = ArrayBuffer[Relation]()
    val lines = content.split("\n", -1)
    entities += Entity(relPath, "file", relPath, 1, lines.length,
      Seq(s"YAML file with ${lines.length} lines"), "", "")
    val topKeys = lines.zipWithIndex.flatMap { case (l, i) =>
      if (l.startsWith(" ") || l.startsWith("\t")) None
      else TopKeyRe.findFirstMatchIn(l).map(m => (m.group(1), i + 1))
    }.toSeq
    val keySet = topKeys.map(_._1).toSet
    val kind =
      if (keySet.contains("jobs") && (keySet.contains("on") || keySet.contains("name"))) "github_workflow"
      else if (keySet.contains("services")) "docker_compose"
      else if (keySet.contains("apiVersion") && keySet.contains("kind")) "kubernetes"
      else "generic"
    kind match {
      case "github_workflow" =>
        val wfName = lines.collectFirst { case l if l.startsWith("name:") => l.drop(5).trim }.getOrElse(relPath)
        entities += Entity(wfName, "module", relPath, 1, lines.length,
          Seq(s"github workflow: $wfName"), "", "")
        relations += Relation(relPath, wfName, "contains", "", "", 1.0)
        // jobs are 2-space-indented keys under 'jobs:'
        val jobsIdx = lines.indexWhere(_.startsWith("jobs:"))
        if (jobsIdx >= 0) lines.drop(jobsIdx + 1).takeWhile(l => l.isEmpty || l.startsWith(" "))
          .zipWithIndex.collect {
            case (l, i) if l.matches("""  [\w-]+:\s*""") => (l.trim.stripSuffix(":"), jobsIdx + i + 2)
          }.foreach { case (job, ln) =>
            entities += Entity(job, "function", relPath, ln, ln, Seq(s"workflow job: $job"), "", "")
            relations += Relation(wfName, job, "contains", "", "", 1.0)
          }
      case "docker_compose" =>
        val svcIdx = lines.indexWhere(_.startsWith("services:"))
        if (svcIdx >= 0) lines.drop(svcIdx + 1).takeWhile(l => l.isEmpty || l.startsWith(" "))
          .zipWithIndex.collect {
            case (l, i) if l.matches("""  [\w-]+:\s*""") => (l.trim.stripSuffix(":"), svcIdx + i + 2)
          }.foreach { case (svc, ln) =>
            entities += Entity(svc, "module", relPath, ln, ln, Seq(s"compose service: $svc"), "", "")
            relations += Relation(relPath, svc, "contains", "", "", 1.0)
          }
      case "kubernetes" =>
        val k8sKind = lines.collectFirst { case l if l.startsWith("kind:") => l.drop(5).trim }.getOrElse("")
        val k8sName = lines.collectFirst { case l if l.trim.startsWith("name:") => l.trim.drop(5).trim }.getOrElse(relPath)
        entities += Entity(k8sName, "module", relPath, 1, lines.length,
          Seq(s"kubernetes $k8sKind: $k8sName"), "", "")
        relations += Relation(relPath, k8sName, "contains", "", "", 1.0)
      case _ =>
        topKeys.take(30).foreach { case (k, ln) =>
          entities += Entity(s"${relPath.split('/').last}::$k", "variable", relPath, ln, ln,
            Seq(s"yaml key: $k"), "", "")
          relations += Relation(relPath, s"${relPath.split('/').last}::$k", "contains", "", "", 1.0)
        }
    }
    ParserResult(relPath, Ids.sha256Hex(content), entities.toSeq, relations.toSeq,
      Seq.empty, Seq.empty)
  }
}

/** CSV parser (reference: analysis/text_parser.py:150-249): header columns
  * as variables.
  */
object CsvParser {
  def parse(relPath: String, content: String): ParserResult = {
    val entities = ArrayBuffer[Entity]()
    val relations = ArrayBuffer[Relation]()
    val lines = content.split("\n", -1)
    entities += Entity(relPath, "file", relPath, 1, lines.length,
      Seq(s"CSV file with ${lines.length} rows"), "", "")
    lines.headOption.filter(_.nonEmpty).foreach { header =>
      header.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
        .take(50).foreach { colName =>
          entities += Entity(s"${relPath.split('/').last}::$colName", "variable", relPath, 1, 1,
            Seq(s"csv column: $colName"), "", "")
          relations += Relation(relPath, s"${relPath.split('/').last}::$colName", "contains", "", "", 1.0)
        }
    }
    ParserResult(relPath, Ids.sha256Hex(content), entities.toSeq, relations.toSeq, Seq.empty, Seq.empty)
  }
}

/** INI parser (reference: analysis/text_parser.py:252-346): sections +
  * keys.
  */
object IniParser {
  private val SectionRe = """^\[([^\]]+)\]""".r
  private val KvRe = """^([\w.-]+)\s*[=:]""".r

  def parse(relPath: String, content: String): ParserResult = {
    val entities = ArrayBuffer[Entity]()
    val relations = ArrayBuffer[Relation]()
    val lines = content.split("\n", -1)
    entities += Entity(relPath, "file", relPath, 1, lines.length,
      Seq(s"INI file with ${lines.length} lines"), "", "")
    var section = ""
    lines.zipWithIndex.foreach { case (line, i) =>
      val t = line.trim
      SectionRe.findFirstMatchIn(t) match {
        case Some(m) =>
          section = m.group(1)
          entities += Entity(section, "module", relPath, i + 1, i + 1,
            Seq(s"ini section: $section"), "", "")
          relations += Relation(relPath, section, "contains", "", "", 1.0)
        case None =>
          if (section.nonEmpty && !t.startsWith("#") && !t.startsWith(";"))
            KvRe.findFirstMatchIn(t).foreach { m =>
              relations += Relation(section, s"$section.${m.group(1)}", "contains", "", "", 1.0)
            }
      }
    }
    ParserResult(relPath, Ids.sha256Hex(content), entities.toSeq, relations.toSeq, Seq.empty, Seq.empty)
  }
}
