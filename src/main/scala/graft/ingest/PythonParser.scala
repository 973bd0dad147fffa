package graft.ingest

import scala.collection.mutable.ArrayBuffer
import graft.core.Ids
import graft.core.Model._

/** Structural Python parser (line/regex-based).
  *
  * Targets the reference's *output contract* — the entity/relation/chunk
  * tables of SURVEY.md §2.2 (reference implementation: tree-sitter + Jedi,
  * analysis/parser.py:119-1490) — not AST equality. Extracts: functions,
  * methods, classes, module variables/constants, imports; INHERITS /
  * IMPORTS / CALLS / CONTAINS edges; per-function observations (signature,
  * docstring purpose, calls, exceptions, complexity, decorators, async) and
  * implementation chunks with semantic metadata.
  */
object PythonParser {

  // NB: used via `line match` which anchors to the FULL line — each pattern
  // therefore ends in `.*` to tolerate trailing comments/content.
  private val DefRe = """^(\s*)(?:async\s+)?def\s+([A-Za-z_]\w*)\s*\(([^)]*)\)\s*(?:->\s*([^:]+))?:.*""".r
  private val ClassRe = """^(\s*)class\s+([A-Za-z_]\w*)\s*(?:\(([^)]*)\))?\s*:.*""".r
  private val ImportRe = """^import\s+([\w. ,]+).*""".r
  private val FromImportRe = """^from\s+([\w.]+)\s+import\s+(.+)""".r
  // plain, tuple, starred, and (nested) parenthesized unpacks
  // (reference: analysis/parser.py:521-607)
  private val AssignRe = """^([(\[]?\s*\*?[A-Za-z_][\w.,()\[\]* ]*?[)\]]?)\s*(?::[^=]+)?=[^=].*""".r
  private val WalrusRe = """\(\s*([A-Za-z_]\w*)\s*:=""".r
  private val CallRe = """([A-Za-z_]\w*)\s*\(""".r
  private val AttrRe = """([A-Za-z_]\w*)\.([A-Za-z_]\w*)""".r
  private val ExceptRe = """except\s+([A-Za-z_]\w*)""".r
  private val DecoratorRe = """^\s*@([\w.]+)""".r
  // file-operation patterns (reference detects ~30 I/O call families,
  // analysis/parser.py:1198-1441); op name + optional string-literal arg
  private val FileOpRe =
    ("""(open|json\.loads?|json\.dumps?|yaml\.safe_load|yaml\.load|pickle\.loads?|pickle\.dumps?|""" +
      """csv\.reader|csv\.writer|pd\.read_\w+|requests\.(?:get|post|put|delete)|""" +
      """configparser\.ConfigParser|toml\.load|Path)\s*\(\s*(?:['"]([^'"]*)['"])?""").r
  private val ControlKeywords = Seq("if ", "elif ", "for ", "while ", "except", "with ", " and ", " or ")
  private val Builtins = Set("print", "len", "range", "str", "int", "float", "list", "dict", "set",
    "tuple", "isinstance", "super", "type", "open", "enumerate", "zip", "map", "filter", "sorted")

  def parse(relPath: String, content: String): ParserResult = {
    val lines = content.split("\n", -1)
    val entities = ArrayBuffer[Entity]()
    val relations = ArrayBuffer[Relation]()
    val implChunks = ArrayBuffer[Chunk]()

    val moduleName = relPath.stripSuffix(".py").replace('/', '.')

    // --- file entity -------------------------------------------------------
    entities += Entity(relPath, "file", relPath, 1, lines.length,
      Seq(s"Python source with ${lines.length} lines"), "", "")

    // --- imports (reference: analysis/parser.py:808-917) -------------------
    lines.zipWithIndex.foreach { case (line, i) =>
      line.trim match {
        case ImportRe(mods) =>
          mods.split(",").map(_.trim.split(" ")(0)).filter(_.nonEmpty).foreach { m =>
            entities += Entity(m, "import", relPath, i + 1, i + 1,
              Seq(s"import: $m"), "", s"import $m")
            relations += Relation(relPath, m, "imports", "module", "", 1.0)
          }
        case FromImportRe(mod, names) =>
          relations += Relation(relPath, mod, "imports", "module", "", 1.0)
          names.split(",").map(_.trim.split(" ")(0).trim).filter(n => n.nonEmpty && n != "*").foreach { n =>
            entities += Entity(n, "import", relPath, i + 1, i + 1,
              Seq(s"import: $n from $mod"), "", s"from $mod import $n")
            relations += Relation(relPath, s"$mod.$n", "imports", "symbol", "", 1.0)
          }
        case _ =>
      }
    }

    // --- block extents -----------------------------------------------------
    def blockEnd(start: Int, indent: Int): Int = {
      var end = start
      var i = start + 1
      while (i < lines.length) {
        val l = lines(i)
        if (l.trim.nonEmpty) {
          val ind = l.takeWhile(_ == ' ').length
          if (ind <= indent && !l.trim.startsWith("#")) return end + 1
          end = i
        }
        i += 1
      }
      end + 1
    }

    def docstringAt(bodyStart: Int): String = {
      if (bodyStart >= lines.length) return ""
      val t = lines.drop(bodyStart).find(_.trim.nonEmpty).map(_.trim).getOrElse("")
      if (t.startsWith("\"\"\"") || t.startsWith("'''")) {
        val q = t.take(3)
        val rest = t.drop(3)
        if (rest.contains(q)) rest.takeWhile(_ != q.head).trim
        else rest.trim match {
          case "" =>
            lines.drop(bodyStart + 1).find(_.trim.nonEmpty).map(_.trim.takeWhile(c => c != '"' && c != '\'')).getOrElse("")
          case s => s
        }
      } else ""
    }

    def decoratorsAbove(line: Int): Seq[String] = {
      var i = line - 1
      val out = ArrayBuffer[String]()
      while (i >= 0 && (DecoratorRe.findFirstIn(lines(i)).isDefined || lines(i).trim.isEmpty)) {
        DecoratorRe.findFirstMatchIn(lines(i)).foreach(m => out += m.group(1))
        i -= 1
      }
      out.toSeq.reverse
    }

    def complexity(body: String): Int =
      1 + ControlKeywords.map(k => body.sliding(k.length).count(_ == k)).sum

    // strip def lines so call extraction sees only bodies
    // (reference: analysis/parser.py:1109-1159)
    def callsIn(body: String): Seq[String] =
      CallRe.findAllMatchIn(body).map(_.group(1)).toSeq.distinct
        .filterNot(Builtins.contains)

    def implChunk(name: String, entityType: String, startL: Int, endL: Int, body: String,
                  calls: Seq[String]): Chunk = {
      val cid = Ids.entityChunkId(relPath, name, "implementation")
      Chunk(cid, "implementation", name, entityType, relPath, startL, endL,
        body, "", Ids.sha256Hex(body), "", "", hasImplementation = true)
    }

    // --- classes & functions ----------------------------------------------
    var i = 0
    var currentClass: Option[(String, Int, Int)] = None // (name, indent, endLine)
    while (i < lines.length) {
      val line = lines(i)
      line match {
        case ClassRe(ws, name, bases) =>
          val indent = ws.length
          val endL = blockEnd(i, indent)
          val body = lines.slice(i, endL).mkString("\n")
          val doc = docstringAt(i + 1)
          val baseSeq = Option(bases).map(_.split(",").map(_.trim.split("\\[")(0).trim)
            .filter(b => b.nonEmpty && b != "object").toSeq).getOrElse(Seq.empty)
          // NB: DefRe anchors with ^ and no (?m) — it would only ever match
          // at offset 0 of `body` (the class line); use a multiline scan
          val methods = """(?m)^\s*(?:async\s+)?def\s+([A-Za-z_]\w*)""".r
            .findAllMatchIn(body).map(_.group(1)).toSeq.take(5)
          val obs = ArrayBuffer[String](s"class: $name")
          if (doc.nonEmpty) obs += s"responsibility: ${doc.split('.').head}"
          if (baseSeq.nonEmpty) obs += s"inherits: ${baseSeq.mkString(", ")}"
          if (methods.nonEmpty) obs += s"key methods: ${methods.mkString(", ")}"
          // design-pattern detection by naming convention
          // (reference: analysis/observation_extractor.py:124-168)
          Seq("Factory", "Builder", "Singleton", "Adapter", "Observer",
            "Strategy", "Visitor", "Proxy", "Decorator", "Facade")
            .find(p => name.endsWith(p))
            .foreach(p => obs += s"design pattern: ${p.toLowerCase}")
          // instance attributes (<=3), reference family:
          // observation_extractor.py:124-168
          val attrs = """self\.([A-Za-z_]\w*)\s*=""".r
            .findAllMatchIn(body).map(_.group(1)).toSeq.distinct.take(3)
          if (attrs.nonEmpty) obs += s"attributes: ${attrs.mkString(", ")}"
          entities += Entity(name, "class", relPath, i + 1, endL, obs.toSeq, doc,
            s"class $name${if (baseSeq.nonEmpty) baseSeq.mkString("(", ", ", ")") else ""}")
          relations += Relation(relPath, name, "contains", "", "", 1.0)
          baseSeq.foreach(b => relations += Relation(name, b, "inherits", "", "", 1.0))
          implChunks += implChunk(name, "class", i + 1, endL, body, Seq.empty)
          currentClass = Some((name, indent, endL))
        case DefRe(ws, name, params, ret) =>
          val indent = ws.length
          val inClass = currentClass.exists { case (_, ci, ce) => indent > ci && i + 1 <= ce }
          val endL = blockEnd(i, indent)
          val body = lines.slice(i, endL).mkString("\n")
          val bodyNoDef = lines.slice(i + 1, endL).mkString("\n")
          val doc = docstringAt(i + 1)
          val calls = callsIn(bodyNoDef)
          val cx = complexity(body)
          val decs = decoratorsAbove(i)
          val excs = ExceptRe.findAllMatchIn(body).map(_.group(1)).toSeq.distinct
          val entityType = if (inClass) "method" else if (name.startsWith("test_")) "test" else "function"
          val sig = s"def $name($params)${Option(ret).map(r => s" -> ${r.trim}").getOrElse("")}"
          val obs = ArrayBuffer[String](s"function: $name", s"signature: $sig")
          if (doc.nonEmpty) obs += s"purpose: ${doc.split('.').head}"
          if (calls.nonEmpty) obs += s"calls: ${calls.take(5).mkString(", ")}"
          if (excs.nonEmpty) obs += s"handles exceptions: ${excs.mkString(", ")}"
          if (Option(ret).exists(_.trim.nonEmpty)) obs += s"returns: ${ret.trim}"
          if (decs.nonEmpty) obs += s"decorators: ${decs.mkString(", ")}"
          if (cx > 5) obs += s"high complexity: $cx"
          if (line.trim.startsWith("async")) obs += "async function"
          val owner = if (inClass) currentClass.get._1 else relPath
          entities += Entity(name, entityType, relPath, i + 1, endL, obs.toSeq, doc, sig)
          relations += Relation(owner, name, "contains", "", "", 1.0)
          calls.foreach(c => relations += Relation(name, c, "calls", "", s"$relPath:${i + 1}", 0.9))
          // file-operation edges, typed by the detected op
          // (reference: analysis/parser.py:1198-1441)
          FileOpRe.findAllMatchIn(bodyNoDef).toSeq
            .map(m => (m.group(1), Option(m.group(2)).getOrElse("")))
            .distinct.take(10)
            .foreach { case (op, target) =>
              val to = if (target.nonEmpty) target else op
              relations += Relation(name, to, "uses", s"file_op:$op", "", 0.8)
            }
          // imports_used pairs (reference: analysis/parser.py:1161-1181)
          AttrRe.findAllMatchIn(bodyNoDef).map(_.group(1)).toSeq.distinct.take(10)
            .foreach(m => relations += Relation(name, m, "uses", "", "", 0.5))
          implChunks += implChunk(name, entityType, i + 1, endL, body, calls)
        case _ =>
          // module-level (indent 0) assignments -> variables/constants
          // (reference scope rules: analysis/parser.py:287-361,521-607)
          if (!line.startsWith(" ") && !line.startsWith("\t")) {
            line match {
              case AssignRe(namesStr) if !line.trim.startsWith("#") =>
                // flatten nested/parenthesized unpacks, strip stars:
                // (a, b), *rest = ... -> a, b, rest
                namesStr.replaceAll("[()\\[\\]]", " ").split(",")
                  .map(_.trim.stripPrefix("*").trim)
                  .filter(n => n.matches("[A-Za-z_]\\w*") && n != "_").foreach { n =>
                    val t = if (n.toUpperCase == n) "constant" else "variable"
                    entities += Entity(n, t, relPath, i + 1, i + 1,
                      Seq(s"$t: $n"), "", line.trim.take(80))
                    relations += Relation(relPath, n, "contains", "", "", 1.0)
                  }
              case _ =>
                // walrus at module scope: (x := ...)
                // (reference: analysis/parser.py:615-641)
                WalrusRe.findAllMatchIn(line).foreach { m =>
                  val n = m.group(1)
                  entities += Entity(n, "variable", relPath, i + 1, i + 1,
                    Seq(s"variable: $n", "walrus assignment"), "", line.trim.take(80))
                  relations += Relation(relPath, n, "contains", "", "", 1.0)
                }
            }
            if (currentClass.exists { case (_, _, ce) => i + 1 > ce }) currentClass = None
          }
      }
      i += 1
    }

    ParserResult(relPath, Ids.sha256Hex(content), entities.toSeq, relations.toSeq,
      implChunks.toSeq, Seq.empty)
  }
}
