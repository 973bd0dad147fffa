package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VocabCoverageSpec extends SparkSpec {
  import spark.implicits._

  // trainPct=100 puts every doc in train → 'val' row absent, and the
  // vocab is fitted on everything: easy closed-form checks.
  test("vocab membership is by count threshold on the train split") {
    val docs = Seq(
      (1L, "aa aa aa bb"),
      (2L, "aa bb cc")
    ).toDF("doc_id", "text")
    val r = VocabCoverage.report(docs, "doc_id", "text", trainPct = 100, minCount = 2)
      .collect().head
    // counts: aa=4, bb=2, cc=1 → vocab {aa, bb}; 7 tokens, 1 OOV (cc)
    assert(r.getString(r.fieldIndex("split")) == "train")
    assert(r.getLong(r.fieldIndex("n_tokens")) == 7L)
    assert(r.getLong(r.fieldIndex("n_types")) == 3L)
    assert(r.getDouble(r.fieldIndex("oov_token_rate")) == 0.142857)
    assert(r.getDouble(r.fieldIndex("oov_type_rate")) == 0.333333)
    assert(r.getLong(r.fieldIndex("vocab_size")) == 2L)
  }

  test("val-split tokens unseen in train count as OOV") {
    val docs = (0L until 50L).map(k => (k, "base base filler")).toDF("doc_id", "text")
    val withNovel = docs.withColumn("text",
      when(Splits.hashBucket(col("doc_id"), 100) >= 80,
        concat(col("text"), lit(" novelword"))).otherwise(col("text")))
    val rows = VocabCoverage.report(withNovel, "doc_id", "text", trainPct = 80, minCount = 2)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(r.fieldIndex("oov_token_rate")), r.getDouble(r.fieldIndex("oov_type_rate")))).toMap
    // 'novelword' exists only in val docs; 'filler'/'base' are everywhere
    assert(rows("train")._1 == 0.0)
    assert(rows("val")._1 > 0.0, "novelword must register as val OOV")
  }
}
