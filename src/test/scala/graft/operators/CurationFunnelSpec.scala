package graft.operators

import graft.SparkSpec

class CurationFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val stop = Seq("the", "a", "of", "and", "or", "in", "on", "is", "to", "it")

  // 24 words, avg len in range, 2+ stopwords, no punctuation noise
  private def good(tag: String): String =
    s"the quick brown fox jumps over and over the lazy sleeping dog while " +
      s"$tag watchers count every single bounding stride across wide fields"

  test("each stage drops exactly the doc built to fail it") {
    val docs = Seq(
      (1L, good("alpha")),                                       // survives everything
      (2L, "der hund und die katze das haus und der baum und " +
        "nicht ein wort von alledem war jemals wirklich wahr " +
        "sagte der alte mann"),                                  // German → stage 1
      (3L, "the doc is tiny and short"),                         // en, but fails length → stage 2
      (4L, good("alpha")),                                       // exact dup of 1 → stage 3
      (5L, good("omega"))                                        // near-dup of 1 → novelty ≤ 0.5
    ).toDF("doc_id", "text")
    val rows = CurationFunnel.report(docs, "doc_id", "text", "en", stop, 0.5)
      .orderBy("stage").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq == Seq(
      (0L, "all", 5L),
      (1L, "lang", 4L),         // doc 2 out
      (2L, "quality", 3L),      // doc 3 out
      (3L, "exact_dedup", 2L),  // doc 4 out
      (4L, "novelty", 0L)))     // docs 1 and 5 share most grams → both ≤ 0.5
    assert(rows.head.getDouble(3) == 1.0)
    assert(rows.last.getDouble(3) == 0.0)
  }

  test("a fully distinct corpus passes the funnel intact") {
    val docs = Seq(
      (1L, good("alpha") + " extra unique tail alpha"),
      (2L, "a completely different story is told here about mountains " +
        "rivers valleys and the endless roads that wander to distant " +
        "villages beyond the horizon every summer")
    ).toDF("doc_id", "text")
    val rows = CurationFunnel.report(docs, "doc_id", "text", "en", stop, 0.5)
      .orderBy("stage").collect()
    assert(rows.map(_.getLong(2)).toSeq == Seq(2L, 2L, 2L, 2L, 2L))
  }
}
