package graft.functions

import graft.SparkSpec

class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  test("continuation count beats raw frequency: the 'san francisco' effect") {
    // "zz" appears often but ONLY after "san"; "the" follows many
    // distinct contexts. Unigram-style smoothing would rate zz high in
    // the backoff; KN's continuation count must not.
    val docs = Seq(
      "san zz san zz san zz san zz san zz",
      "on the mat in the hat by the door at the top",
      "over the hill"
    ).toDF("text")
    val rows = KneserNey.bigramProbs(docs, "text", k = 50).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("pkn")).toMap
    // continuation probability feeds the interpolation weight: a bigram
    // (x, the) unseen-context mass favors "the" over "zz" — compare the
    // backoff parts via two contexts that each saw both words once...
    // directly: P(zz|san) is high (deterministic context), and present
    assert(rows(("san", "zz")) > 0.8)
    // "the" continues 5 distinct contexts, "zz" only 1: with equal raw
    // counts in a shared context the KN probability must favor "the".
    // (on/in/by/at/over)->the each counted once; san->zz 5 times.
    val pThe = rows(("on", "the"))
    val pZz = rows.collectFirst { case ((a, "zz"), p) if a != "san" => p }
    assert(pZz.isEmpty, "zz never follows anything but san")
    assert(pThe > 0, s"p(the|on)=$pThe")
  }

  test("probabilities per context sum to < 1 and every pkn is in (0,1]") {
    // note: the tokenizer (Bm25.tokens) drops single-char tokens
    val docs = Seq(
      "aa bb aa cc aa bb aa dd",
      "bb cc bb dd bb aa",
      "cc aa cc bb"
    ).toDF("text")
    val rows = KneserNey.bigramProbs(docs, "text", k = 100).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Double]("pkn")
      assert(p > 0 && p <= 1, s"${r.getString(0)}->${r.getString(1)} p=$p")
    }
  }

  test("top-k is ordered by raw bigram count with deterministic ties") {
    val docs = Seq("xx yy xx yy xx yy zz ww").toDF("text")
    val rows = KneserNey.bigramProbs(docs, "text", k = 3).collect()
    assert(rows.head.getString(0) == "xx" && rows.head.getString(1) == "yy")
    assert(rows.head.getAs[Long]("cab") == 3L)
  }
}
