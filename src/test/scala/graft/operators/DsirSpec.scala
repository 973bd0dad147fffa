package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val target = Seq(
    (1L, "t", "the quick brown fox jumps over the lazy dog"),
    (2L, "t", "the quick brown fox runs past the lazy dog"))
  private val raw = Seq(
    (10L, "r", "the quick brown fox sleeps near the lazy dog"), // target-like
    (11L, "r", "stock market prices fell sharply during early trading"),
    (12L, "r", "volcanic eruptions reshaped the island coastline overnight"))

  test("raw documents sharing the target's bigrams score highest") {
    val docs = (target ++ raw).toDF("doc_id", "kind", "text")
    val out = Dsir.select(docs, "doc_id", "text", col("kind") === "t", topN = 3)
      .collect()
    assert(out.map(_.getLong(0)).head == 10L, "target-like doc must rank first")
    // scores strictly separate the overlapping doc from the unrelated ones
    val byId = out.map(r => r.getLong(0) -> r.getAs[Double]("lwr")).toMap
    assert(byId(10L) > byId(11L) && byId(10L) > byId(12L))
  }

  test("scoring is deterministic and the feature space stays closed") {
    val docs = (target ++ raw).toDF("doc_id", "kind", "text")
    val feats = Dsir.bigramBuckets(docs, "doc_id", "text")
    val buckets = feats.agg(min("bucket"), max("bucket")).collect().head
    assert(buckets.getLong(0) >= 0L && buckets.getLong(1) < Dsir.Buckets)
    val a = Dsir.select(docs, "doc_id", "text", col("kind") === "t", 3).collect().toSeq
    val b = Dsir.select(docs.repartition(7), "doc_id", "text", col("kind") === "t", 3)
      .collect().toSeq
    assert(a == b)
  }
}
