package graft.operators

import graft.SparkSpec

class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  private val page = (
    "https://ex.com/dir/page.html",
    """<html><body>
      |<a href="https://other.org/x.html">absolute</a>
      |<a href='/root/y.html'>rooted</a>
      |<a href="z.html">relative</a>
      |<a href="w.html#frag">fragment trimmed</a>
      |<a href="#top">fragment only</a>
      |<a href="mailto:a@b.c">mail</a>
      |<a href="javascript:void(0)">js</a>
      |<a href="z.html">dup edge</a>
      |</body></html>""".stripMargin)

  test("edges: resolves absolute/rooted/relative, trims fragments, drops non-http and dups") {
    val dsts = LinkGraph.edges(Seq(page).toDF("uri", "html"), "uri", "html")
      .collect().map(_.getString(1)).sorted
    assert(dsts.toSeq == Seq(
      "https://ex.com/dir/w.html",
      "https://ex.com/dir/z.html",
      "https://ex.com/root/y.html",
      "https://other.org/x.html"))
  }

  test("degrees: full-outer union of sources and targets with zero fill") {
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("b", "c")
    ).toDF("src", "dst")
    val d = LinkGraph.degrees(edges).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(d("a") == ((2L, 0L))) // pure source
    assert(d("b") == ((1L, 1L)))
    assert(d("c") == ((0L, 2L))) // pure target
  }

  test("edges: a port in the page authority survives resolution") {
    val p = ("http://host.io:8080/a/b.html", """<a href="c.html">x</a><a href="/d.html">y</a>""")
    val dsts = LinkGraph.edges(Seq(p).toDF("uri", "html"), "uri", "html")
      .collect().map(_.getString(1)).sorted
    assert(dsts.toSeq == Seq("http://host.io:8080/a/c.html", "http://host.io:8080/d.html"))
  }

  test("edges: ./ and ../ segments collapse to the canonical URL") {
    val p = ("https://ex.com/a/b/page.html",
      """<a href="./x.html">dot</a>
        |<a href="../y.html">up</a>
        |<a href="../../z.html">upup</a>
        |<a href="/a/./w.html">rooted dot</a>
        |<a href="../../../over.html">past root clamps</a>""".stripMargin)
    val dsts = LinkGraph.edges(Seq(p).toDF("uri", "html"), "uri", "html")
      .collect().map(_.getString(1)).sorted
    assert(dsts.toSeq == Seq(
      "https://ex.com/a/b/x.html",
      "https://ex.com/a/w.html",
      "https://ex.com/a/y.html",
      "https://ex.com/over.html",
      "https://ex.com/z.html"))
  }

  test("anchors: href/text stay aligned through noise filters, text is trimmed, dups kept") {
    val p = ("https://ex.com/dir/page.html",
      """<a href="https://other.org/x.html"> First Link </a>
        |<a href="mailto:a@b.c">skip me</a>
        |<a href='z.html'>second</a>
        |<a href="#top">skip too</a>
        |<a href="z.html">second</a>""".stripMargin)
    val rows = LinkGraph.anchors(Seq(p).toDF("uri", "html"), "uri", "html")
      .collect().map(r => (r.getString(1), r.getString(2))).sorted
    // mailto/fragment dropped WITHOUT shifting which text goes with which
    // href; the duplicate z.html link is two rows
    assert(rows.toSeq == Seq(
      ("https://ex.com/dir/z.html", "second"),
      ("https://ex.com/dir/z.html", "second"),
      ("https://other.org/x.html", "First Link")))
  }
}
