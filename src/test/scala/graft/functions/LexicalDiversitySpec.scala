package graft.functions

import graft.SparkSpec

class LexicalDiversitySpec extends SparkSpec {
  import spark.implicits._

  test("per-doc TTR, hapax ratio and top-share are exact") {
    // doc 1: aa aa aa bb cc → 5 tokens, 3 types, hapax {bb, cc}, top aa=3
    val docs = Seq((1L, "en", "aa aa aa bb cc")).toDF("doc_id", "lang", "text")
    val r = LexicalDiversity.perDoc(docs, "doc_id", "text").collect().head
    assert(r.getLong(r.fieldIndex("n_tokens")) == 5L)
    assert(r.getLong(r.fieldIndex("n_types")) == 3L)
    assert(r.getDouble(r.fieldIndex("ttr")) == 0.6)
    assert(r.getDouble(r.fieldIndex("hapax_ratio")) == 0.666667)
    assert(r.getDouble(r.fieldIndex("top_share")) == 0.6)
  }

  test("an all-distinct doc maxes every ratio; an all-same doc bottoms TTR") {
    val docs = Seq(
      (1L, "en", "uu vv ww xx"),
      (2L, "en", "zz zz zz zz")
    ).toDF("doc_id", "lang", "text")
    val rows = LexicalDiversity.perDoc(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(r.fieldIndex("ttr")), r.getDouble(r.fieldIndex("hapax_ratio")),
          r.getDouble(r.fieldIndex("top_share")))).toMap
    assert(rows(1L) === ((1.0, 1.0, 0.25)))
    assert(rows(2L) === ((0.25, 0.0, 1.0)))
  }

  test("report groups by the carried column and averages per-doc metrics") {
    val docs = Seq(
      (1L, "en", "uu vv ww xx"),
      (2L, "en", "zz zz zz zz"),
      (3L, "de", "mm nn")
    ).toDF("doc_id", "lang", "text")
    val rep = LexicalDiversity.report(docs, "doc_id", "text", "lang")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(r.fieldIndex("avg_ttr")),
          r.getDouble(r.fieldIndex("min_ttr")))).toMap
    assert(rep("en") === ((2L, 0.625, 0.25)))
    assert(rep("de") === ((1L, 1.0, 1.0)))
  }
}
