package graft.ingest

import graft.SparkSpec

class ContentExtractSpec extends SparkSpec {

  test("blocks: link-dense nav and short chrome drop, long link-light text survives") {
    val html =
      """<html><body>
        |<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact page</a></nav>
        |<p>This is the actual article body with plenty of plain text to keep.</p>
        |<footer><a href="/tos">Terms of service</a></footer>
        |</body></html>""".stripMargin
    val bs = ContentExtract.blocks(html)
    val content = bs.filter(_.content)
    assert(content.map(_.text) == Seq(
      "This is the actual article body with plenty of plain text to keep."))
    // the nav block was seen but classified out
    assert(bs.exists(b => b.text.startsWith("Home") && !b.content))
  }

  test("link density counts only anchor text; inline links below 1/3 keep the block") {
    val ok = "<p>A paragraph long enough to pass with one <a href='/x'>small link</a> inside it.</p>"
    assert(ContentExtract.blocks(ok).head.content)
    val dense = "<p><a href='/1'>all of this paragraph text body is</a> <a href='/2'>basically links here</a></p>"
    assert(!ContentExtract.blocks(dense).head.content)
  }

  test("script and style bodies never leak into block text") {
    val html = "<div>Real text long enough to classify as content here.</div>" +
      "<script>var x = 'twenty five characters plus of junk';</script>" +
      "<style>.c { color: red; } /* more than minChars of css */</style>"
    val bs = ContentExtract.blocks(html)
    assert(bs.map(_.text).forall(t => !t.contains("var x") && !t.contains("color")))
    assert(bs.count(_.content) == 1)
  }

  test("mainText joins content blocks in order with blank lines") {
    val html = "<p>First paragraph with enough characters to count.</p>" +
      "<p>no</p>" +
      "<p>Second paragraph also with enough characters to count.</p>"
    assert(ContentExtract.mainText(html) ==
      "First paragraph with enough characters to count.\n\nSecond paragraph also with enough characters to count.")
  }

  test("stats: per-doc rollup over a DataFrame html column") {
    import spark.implicits._
    val df = Seq(
      (1L, "<p>A long enough paragraph of plain prose for the filter.</p><nav><a href='/'>x</a></nav>"),
      (2L, "<nav><a href='/'>only chrome</a></nav>")
    ).toDF("doc_id", "html")
    val out = ContentExtract.stats(df, "doc_id", "html")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L)._2 == 1L && out(1L)._3 > 25L)
    assert(out(2L) == ((1L, 0L, 0L)))
  }
}
