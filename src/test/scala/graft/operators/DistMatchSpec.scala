package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DistMatchSpec extends SparkSpec {
  import spark.implicits._

  // target: uniform over buckets 0 and 1; raw: bucket 0 heavy (4x)
  private def mkDocs = {
    val target = (1 to 40).map(i => (1000L + i, "t", (i % 2).toLong))
    val raw = (1 to 80).map(i => (2000L + i, "r", 0L)) ++
      (1 to 20).map(i => (3000L + i, "r", 1L))
    (target ++ raw).toDF("doc_id", "kind", "bucket")
  }

  test("keep rates rebalance raw toward the target histogram, pure downsampling") {
    val out = DistMatch.matchedSample(mkDocs, "doc_id", col("kind") === "t")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // target is 50/50; raw is 80/20 → bucket 1 (under-represented) keeps
    // everything (bp=10000), bucket 0 keeps a quarter (bp=2500)
    assert(out(1L)._2 == 10000L && out(0L)._2 == 2500L)
    assert(out(0L)._1 == 80L && out(1L)._1 == 20L)
    // kept counts: all of bucket 1; ~quarter of bucket 0 (hash coin, bounded)
    assert(out(1L)._3 == 20L)
    assert(out(0L)._3 > 0L && out(0L)._3 < 80L)
  }

  test("a bucket absent from the target keeps nothing; absent from raw emits no row") {
    val docs = (Seq((1L, "t", 0L), (2L, "t", 5L)) ++
      (1 to 10).map(i => (100L + i, "r", 0L)) ++
      (1 to 10).map(i => (200L + i, "r", 9L))).toDF("doc_id", "kind", "bucket")
    val out = DistMatch.matchedSample(docs, "doc_id", col("kind") === "t")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(9L) == ((0L, 0L)))      // raw-only bucket: bp 0, nothing kept
    assert(out(0L)._1 == 10000L)       // the only matched bucket is the max
    assert(!out.contains(5L))          // target-only bucket: nothing to sample
  }

  test("the sample is deterministic under repartitioning (hash coin, no RNG)") {
    val a = DistMatch.matchedSample(mkDocs, "doc_id", col("kind") === "t")
      .orderBy("bucket").collect().toSeq
    val b = DistMatch.matchedSample(mkDocs.repartition(13), "doc_id", col("kind") === "t")
      .orderBy("bucket").collect().toSeq
    assert(a == b)
  }
}
