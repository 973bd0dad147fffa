package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private def report(rows: Seq[(String, String)], minWords: Int = 3,
                     minStop: Int = 1) =
    GopherRules.report(rows.toDF("src", "text"), "src", "text",
      minWords = minWords, maxWords = 100, minStopwords = minStop)

  private def one(rows: Seq[(String, String)], col_ : String,
                  minWords: Int = 3, minStop: Int = 1): Long = {
    val r = report(rows, minWords, minStop).collect().head
    r.getLong(r.fieldIndex(col_))
  }

  test("word-count bounds reject short and long docs") {
    val rows = Seq(
      ("a", "one two"),                          // 2 words < 3
      ("a", "the quick brown fox jumps here"),   // 6 words: pass
      ("a", Seq.fill(101)("w").mkString(" ")))   // 101 > 100
    assert(one(rows, "n_r_words") == 1L)
  }

  test("mean word length window [3,10]") {
    val rows = Seq(
      ("a", "a b c d"),                          // mwl 1: fail
      ("a", "extraordinarily incomprehensible"), // mwl 15.5: fail
      ("a", "the quick brown fox"))              // mwl 4: pass
    assert(one(rows, "n_r_mwl") == 1L)
  }

  test("symbol ratio counts # and non-overlapping ellipses") {
    // 10 words, 2 symbols (one '#', one '...') → 0.2 > 0.1 fails
    val bad = ("a", "w1 w2 w3 w4 w5 w6 w7 w8 # and...")
    val good = ("a", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")
    assert(one(Seq(bad, good), "n_r_symbol") == 1L)
  }

  test("bullet and ellipsis line ratios") {
    val bullets = ("a", "- one\n- two\n- three")          // 3/3 bullets > 0.9
    val dots = ("a", "first...\nsecond...\nthird plain")  // 2/3 ellipsis-ends > 0.3
    val clean = ("a", "first line\nsecond line")
    assert(one(Seq(bullets, clean), "n_r_bullet", minWords = 2) == 1L)
    assert(one(Seq(dots, clean), "n_r_ellipsis", minWords = 2) == 1L)
  }

  test("alpha-word ratio and stopword presence") {
    val numeric = ("a", "12 34 56 78 90")                  // 0% alpha
    val alpha = ("a", "the cat sat on it")                 // 100% alpha, stopwords the+on+it
    assert(one(Seq(numeric, alpha), "n_r_alpha") == 1L)
    assert(one(Seq(numeric, alpha), "n_r_stop", minStop = 2) == 1L)
  }

  test("pass_all is the conjunction") {
    val rows = Seq(("a", "the quick brown fox jumps over it"))
    val r = report(rows).collect().head
    assert(r.getLong(r.fieldIndex("n_pass_all")) == 1L)
    assert(r.getLong(r.fieldIndex("n_docs")) == 1L)
  }
}
