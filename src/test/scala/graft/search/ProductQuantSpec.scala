package graft.search

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class ProductQuantSpec extends SparkSpec {

  test("PQ codes: complete, in-range, deterministic across fits") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(sfDir).isDirectory)
    val emb = Tables.embeddings(spark, sfDir).limit(100)
    def fitCodes() = {
      val (codes, cents) = ProductQuant.fit(emb, "vec_id", "embedding", 8, 4, 2)
      (codes.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap,
        cents.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap)
    }
    val (codes, cents) = fitCodes()
    assert(codes.size == 100 * 8) // every (vector, subspace) coded exactly once
    assert(codes.values.forall(c => c >= 0 && c < 4))
    assert(cents.size == 8 * 4)
    assert(cents.values.forall(_.length == 8)) // 64 / 8 subspaces
    // 6dp centroid contract (what makes the oracle replay exact)
    assert(cents.values.forall(_.forall(x => math.round(x * 1e6) / 1e6 == x)))
    val (codes2, cents2) = fitCodes()
    assert(codes == codes2 && cents == cents2)
  }

  test("fit seeds exactly k renumbered centroids from sparse non-zero-based ids") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(sfDir).isDirectory)
    // ids 1000, 1010, 1020, ... — a `vid < k` seed filter would find NONE
    val emb = Tables.embeddings(spark, sfDir).limit(50)
      .withColumn("vec_id", col("vec_id") * 10 + 1000)
    val (codes, cents) = ProductQuant.fit(emb, "vec_id", "embedding", 8, 4, 2)
    val cRows = cents.collect()
    assert(cRows.length == 8 * 4)
    assert(cRows.map(_.getLong(1)).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    assert(codes.collect().forall(r => r.getLong(2) >= 0 && r.getLong(2) < 4))
  }

  test("every subspace uses all 4 codes on spread-out data") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(sfDir).isDirectory)
    val emb = Tables.embeddings(spark, sfDir)
    val (codes, _) = ProductQuant.fit(emb, "vec_id", "embedding", 8, 4, 2)
    val used = codes.groupBy(col("s")).agg(countDistinct(col("cluster")).as("k")).collect()
    assert(used.forall(_.getLong(1) == 4L))
  }
}
