package graft.ingest

import scala.collection.mutable.ArrayBuffer
import graft.core.Ids
import graft.core.Model._

/** JS/TS parser (reference: analysis/javascript_parser.py:19-1197,
  * tree-sitter there; line/regex structural here): functions (declaration,
  * arrow, method), classes + extends/implements, interfaces, variables,
  * imports/requires, exports.
  */
object JsParser {
  private val FuncRe = """^\s*(?:export\s+)?(?:default\s+)?(?:async\s+)?function\s*\*?\s*([A-Za-z_$][\w$]*)\s*\(([^)]*)\)""".r
  private val ArrowRe = """^\s*(?:export\s+)?(?:const|let|var)\s+([A-Za-z_$][\w$]*)\s*=\s*(?:async\s*)?(?:\([^)]*\)|[A-Za-z_$][\w$]*)\s*=>""".r
  private val ClassRe = """^\s*(?:export\s+)?(?:default\s+)?(?:abstract\s+)?class\s+([A-Za-z_$][\w$]*)(?:\s+extends\s+([A-Za-z_$][\w$.]*))?(?:\s+implements\s+([\w$,\s]+))?""".r
  private val InterfaceRe = """^\s*(?:export\s+)?interface\s+([A-Za-z_$][\w$]*)(?:\s+extends\s+([\w$,\s]+))?""".r
  private val ImportRe = """^\s*import\s+(?:.+\s+from\s+)?['"]([^'"]+)['"]""".r
  private val RequireRe = """require\s*\(\s*['"]([^'"]+)['"]\s*\)""".r
  private val VarRe = """^(?:export\s+)?(?:const|let|var)\s+([A-Za-z_$][\w$]*)\s*(?::[^=]+)?=""".r
  private val CallRe = """([A-Za-z_$][\w$]*)\s*\(""".r

  def parse(relPath: String, content: String): ParserResult = {
    val entities = ArrayBuffer[Entity]()
    val relations = ArrayBuffer[Relation]()
    val implChunks = ArrayBuffer[Chunk]()
    val lines = content.split("\n", -1)
    entities += Entity(relPath, "file", relPath, 1, lines.length,
      Seq(s"JS/TS source with ${lines.length} lines"), "", "")

    lines.zipWithIndex.foreach { case (line, i) =>
      ImportRe.findFirstMatchIn(line).foreach { m =>
        relations += Relation(relPath, m.group(1), "imports", "module", "", 1.0)
      }
      RequireRe.findAllMatchIn(line).foreach { m =>
        relations += Relation(relPath, m.group(1), "imports", "require", "", 1.0)
      }
      // findFirstMatchIn: these regexes are prefixes of the line (Scala's
      // `case Regex(..)` would demand a full-line match)
      ClassRe.findFirstMatchIn(line) match {
        case Some(m) =>
          val (name, ext, impls) = (m.group(1), m.group(2), m.group(3))
          val obs = ArrayBuffer[String](s"class: $name")
          Option(ext).foreach { e =>
            obs += s"extends: $e"
            relations += Relation(name, e, "extends", "", "", 1.0)
          }
          Option(impls).foreach(_.split(",").map(_.trim).filter(_.nonEmpty).foreach { im =>
            relations += Relation(name, im, "implements", "", "", 1.0)
          })
          entities += Entity(name, "class", relPath, i + 1, i + 1, obs.toSeq, "", line.trim.take(120))
          relations += Relation(relPath, name, "contains", "", "", 1.0)
        case None => InterfaceRe.findFirstMatchIn(line) match {
          case Some(m) =>
            val name = m.group(1)
            entities += Entity(name, "interface", relPath, i + 1, i + 1,
              Seq(s"interface: $name"), "", line.trim.take(120))
            relations += Relation(relPath, name, "contains", "", "", 1.0)
            Option(m.group(2)).foreach(_.split(",").map(_.trim).filter(_.nonEmpty).foreach { e =>
              relations += Relation(name, e, "extends", "", "", 1.0)
            })
          case None => FuncRe.findFirstMatchIn(line) match {
            case Some(m) =>
              val (name, params) = (m.group(1), m.group(2))
              entities += Entity(name, "function", relPath, i + 1, i + 1,
                Seq(s"function: $name", s"signature: function $name($params)"), "",
                s"function $name($params)")
              relations += Relation(relPath, name, "contains", "", "", 1.0)
            case None => ArrowRe.findFirstMatchIn(line) match {
              case Some(m) =>
                val name = m.group(1)
                entities += Entity(name, "function", relPath, i + 1, i + 1,
                  Seq(s"function: $name", "arrow function"), "", line.trim.take(120))
                relations += Relation(relPath, name, "contains", "", "", 1.0)
              case None => VarRe.findFirstMatchIn(line) match {
                case Some(m) =>
                  val name = m.group(1)
                  val t = if (name.toUpperCase == name) "constant" else "variable"
                  entities += Entity(name, t, relPath, i + 1, i + 1,
                    Seq(s"$t: $name"), "", line.trim.take(80))
                  relations += Relation(relPath, name, "contains", "", "", 1.0)
                case None =>
              }
            }
          }
        }
      }
    }
    ParserResult(relPath, Ids.sha256Hex(content), entities.toSeq, relations.toSeq,
      implChunks.toSeq, Seq.empty)
  }
}

/** HTML parser (reference: analysis/html_parser.py:19-578): elements with
  * id, links, inline style CSS entities.
  */
object HtmlParser {
  private val IdRe = """<(\w+)[^>]*\bid\s*=\s*["']([^"']+)["']""".r
  private val LinkRe = """<a[^>]*\bhref\s*=\s*["']([^"']+)["']""".r
  private val ClassRefRe = """\bclass\s*=\s*["']([^"']+)["']""".r
  private val StyleRe = """(?s)<style[^>]*>(.*?)</style>""".r

  def parse(relPath: String, content: String): ParserResult = {
    val entities = ArrayBuffer[Entity]()
    val relations = ArrayBuffer[Relation]()
    val lines = content.split("\n", -1)
    entities += Entity(relPath, "file", relPath, 1, lines.length,
      Seq(s"HTML file with ${lines.length} lines"), "", "")
    // inline <style> blocks run through the CSS parser
    // (reference: analysis/html_parser.py inline-CSS extraction)
    StyleRe.findAllMatchIn(content).zipWithIndex.foreach { case (m, si) =>
      val css = CssParser.parse(s"$relPath#style$si", m.group(1))
      entities ++= css.entities.filter(_.entityType != "file")
        .map(e => e.copy(filePath = relPath))
      relations ++= css.relations.map(r => r.copy(fromEntity =
        if (r.fromEntity == s"$relPath#style$si") relPath else r.fromEntity))
    }
    IdRe.findAllMatchIn(content).toSeq.take(100).foreach { m =>
      entities += Entity(s"#${m.group(2)}", "variable", relPath, 1, 1,
        Seq(s"element <${m.group(1)}> with id ${m.group(2)}"), "", "")
      relations += Relation(relPath, s"#${m.group(2)}", "contains", "", "", 1.0)
    }
    LinkRe.findAllMatchIn(content).map(_.group(1)).toSeq.distinct.take(100).foreach { href =>
      relations += Relation(relPath, href, "references", "link", "", 1.0)
    }
    ClassRefRe.findAllMatchIn(content).flatMap(_.group(1).split("\\s+")).toSeq.distinct.take(100)
      .foreach { cls =>
        relations += Relation(relPath, s".$cls", "uses", "css_class", "", 0.8)
      }
    ParserResult(relPath, Ids.sha256Hex(content), entities.toSeq, relations.toSeq, Seq.empty, Seq.empty)
  }
}

/** CSS parser (reference: analysis/css_parser.py:18-273): class/id/variable
  * definitions, @import relations.
  */
object CssParser {
  private val ClassRe = """(?m)^\s*\.([A-Za-z_][\w-]*)""".r
  private val IdRe = """(?m)^\s*#([A-Za-z_][\w-]*)""".r
  private val VarRe = """--([\w-]+)\s*:""".r
  private val ImportRe = """@import\s+(?:url\()?["']?([^"')]+)""".r

  def parse(relPath: String, content: String): ParserResult = {
    val entities = ArrayBuffer[Entity]()
    val relations = ArrayBuffer[Relation]()
    val lines = content.split("\n", -1)
    entities += Entity(relPath, "file", relPath, 1, lines.length,
      Seq(s"CSS file with ${lines.length} lines"), "", "")
    ClassRe.findAllMatchIn(content).map(_.group(1)).toSeq.distinct.take(200).foreach { c =>
      entities += Entity(s".$c", "variable", relPath, 1, 1, Seq(s"css class: .$c"), "", "")
      relations += Relation(relPath, s".$c", "contains", "", "", 1.0)
    }
    IdRe.findAllMatchIn(content).map(_.group(1)).toSeq.distinct.take(200).foreach { c =>
      entities += Entity(s"#$c", "variable", relPath, 1, 1, Seq(s"css id: #$c"), "", "")
      relations += Relation(relPath, s"#$c", "contains", "", "", 1.0)
    }
    VarRe.findAllMatchIn(content).map(_.group(1)).toSeq.distinct.take(200).foreach { v =>
      entities += Entity(s"--$v", "constant", relPath, 1, 1, Seq(s"css variable: --$v"), "", "")
      relations += Relation(relPath, s"--$v", "contains", "", "", 1.0)
    }
    ImportRe.findAllMatchIn(content).map(_.group(1)).toSeq.distinct.foreach { im =>
      relations += Relation(relPath, im, "imports", "css", "", 1.0)
    }
    ParserResult(relPath, Ids.sha256Hex(content), entities.toSeq, relations.toSeq, Seq.empty, Seq.empty)
  }
}
