package graft.operators

import graft.SparkSpec

class TextRankSpec extends SparkSpec {
  import spark.implicits._

  test("a bridging term outranks an equally frequent but isolated one") {
    // "data" co-occurs with many distinct neighbors; "zzz" repeats the
    // same bigram over and over. Same raw frequency, different rank.
    val docs = Seq(
      "data quality matters here",
      "good data pipelines win today",
      "clean data beats more data",
      "zzz yyy. zzz yyy. zzz yyy. zzz yyy"
    ).toDF("text")
    val top = TextRank.keywords(docs, "text", k = 30)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(top("data") > top("zzz"),
      s"data=${top("data")} should beat zzz=${top("zzz")}")
  }

  test("short tokens and non-letters are excluded; adjacency skips them") {
    val docs = Seq("big co op data 42 ml ai pipelines").toDF("text")
    val terms = TextRank.keywords(docs, "text", k = 50)
      .collect().map(_.getString(0)).toSet
    // 2-letter tokens and digits never appear
    assert(!terms.exists(t => t.length < 3))
    assert(terms == Set("big", "data", "pipelines"))
  }

  test("deterministic top-k cut: ties broken by term") {
    val docs = Seq("alpha beta", "alpha beta").toDF("text")
    val a = TextRank.keywords(docs, "text", k = 1).collect().head.getString(0)
    val b = TextRank.keywords(docs, "text", k = 1).collect().head.getString(0)
    // symmetric 2-node graph: identical ranks, "alpha" wins the tie both runs
    assert(a == "alpha" && b == "alpha")
  }
}
