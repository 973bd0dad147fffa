package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Measured Python-parser coverage over the reference's OWN codebase
  * (VERDICT r11 task 5): the last substantive `partial` row in SURVEY
  * §2.1 becomes a number. Ground truth is an INDEPENDENT line-regex
  * census of every `.py` file under /root/reference (defs, classes,
  * module-level assignments); coverage is name-level recall — the
  * fraction of census names the structural parser extracts as entities.
  * The reference's README (/root/reference/README.md:169) claims "95.3%
  * variable coverage" for its own tree-sitter+Jedi parser; the floors
  * pinned here are what OUR regex-structural parser measures on the
  * same kind of corpus (the reference's ~23k-LoC source + tests),
  * minus a 1-point safety margin so fixture drift can't flake the suite.
  */
class PythonCoverageSpec extends AnyFunSuite {

  private val Root = Paths.get("/root/reference")

  private def pyFiles(under: String): Seq[Path] = {
    val base = Root.resolve(under)
    if (!Files.isDirectory(base)) Seq.empty
    else Files.walk(base).iterator().asScala
      .filter(p => p.toString.endsWith(".py") && Files.isRegularFile(p))
      .toSeq.sortBy(_.toString)
  }

  // independent census regexes — deliberately NOT the parser's own
  private val DefRe = """^\s*(?:async\s+)?def\s+([A-Za-z_]\w*)\s*\(""".r
  private val ClassRe = """^\s*class\s+([A-Za-z_]\w*)\s*[:(\s]""".r
  // module-level simple assignment at column 0: NAME = ... or NAME: T = ...
  private val VarRe = """^([A-Za-z_]\w*)\s*(?::[^=]+)?=(?!=)""".r

  private case class Census(defs: Set[String], classes: Set[String],
                            vars: Set[String])

  private def census(content: String): Census = {
    val lines = content.split("\n", -1)
    var inStr = false // crude triple-quote tracker so docstring code
    var delim = "" //   examples don't inflate the ground truth
    val defs = Set.newBuilder[String]
    val classes = Set.newBuilder[String]
    val vars = Set.newBuilder[String]
    lines.foreach { raw =>
      val line = raw
      val trips = "\"\"\"".r.findAllIn(line).size + "'''".r.findAllIn(line).size
      if (!inStr) {
        DefRe.findFirstMatchIn(line).foreach(m => defs += m.group(1))
        ClassRe.findFirstMatchIn(line).foreach(m => classes += m.group(1))
        VarRe.findFirstMatchIn(line).foreach(m => vars += m.group(1))
        if (trips % 2 == 1) {
          inStr = true
          delim = if (line.contains("\"\"\"")) "\"\"\"" else "'''"
        }
      } else if (line.contains(delim)) {
        inStr = false
      }
    }
    Census(defs.result(), classes.result(), vars.result())
  }

  private case class Cov(hit: Int, total: Int) {
    def ratio: Double = if (total == 0) 1.0 else hit.toDouble / total
    def +(o: Cov): Cov = Cov(hit + o.hit, total + o.total)
  }

  private def coverageOver(files: Seq[Path]): (Cov, Cov, Cov, Int) = {
    var (fc, cc, vc) = (Cov(0, 0), Cov(0, 0), Cov(0, 0))
    var parsed = 0
    files.foreach { p =>
      val content = new String(Files.readAllBytes(p), "UTF-8")
      val rel = Root.relativize(p).toString
      val res = PythonParser.parse(rel, content)
      if (res.errors.isEmpty) parsed += 1
      val names = res.entities.map(_.name).toSet
      // methods are stored qualified (Class.method) in some paths — accept
      // either the bare or any dotted-suffix form
      def found(n: String): Boolean =
        names.contains(n) || names.exists(_.endsWith("." + n))
      val c = census(content)
      fc += Cov(c.defs.count(found), c.defs.size)
      cc += Cov(c.classes.count(found), c.classes.size)
      vc += Cov(c.vars.count(found), c.vars.size)
    }
    (fc, cc, vc, parsed)
  }

  test("measured coverage over the reference source + tests, floors pinned") {
    val files = pyFiles("claude_indexer") ++ pyFiles("tests")
    assume(files.nonEmpty, "reference corpus not present")
    val (fc, cc, vc, parsed) = coverageOver(files)
    info(f"files parsed clean: $parsed/${files.size}")
    info(f"function/method recall: ${fc.hit}/${fc.total} = ${fc.ratio}%.3f")
    info(f"class recall:           ${cc.hit}/${cc.total} = ${cc.ratio}%.3f")
    info(f"module-var recall:      ${vc.hit}/${vc.total} = ${vc.ratio}%.3f")
    assert(parsed == files.size, "every reference file must parse without errors")
    // floors: measured 1.000 / 1.000 / 1.000 over 65 files (781 defs,
    // 126 classes, 30 module vars) at pin time (r12), minus ~1 point so
    // fixture drift can't flake the suite. SURVEY §2.1 cites these
    // numbers for the Python-source row.
    assert(fc.ratio >= 0.99, f"function recall regressed: ${fc.ratio}%.3f")
    assert(cc.ratio >= 0.99, f"class recall regressed: ${cc.ratio}%.3f")
    assert(vc.ratio >= 0.96, f"variable recall regressed: ${vc.ratio}%.3f")
  }
}
