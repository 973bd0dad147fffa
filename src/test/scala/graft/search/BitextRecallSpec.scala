package graft.search

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Recall floor for the bucketed (IVF-cell) bitext-mining composition vs
  * exact all-pairs mining — the q203-vs-q168 contract. The cell-scoped
  * approximation must recover most of the exact mutual-best pairs: a true
  * translation pair is an embedding near-twin, so both ends land in the
  * same IVF cell and stay mutual-best inside it. A regression here (bad
  * centroids, a broken assignment join, margin math drifting per cell)
  * drops recall long before the q203 oracle notices anything.
  */
class BitextRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("probed cell mining floors recall vs exact, and probing deeper helps") {
    val emb = Tables.embeddings(spark, dir)
    val src = emb.filter(col("vec_id") % 2 === 0)
    val tgt = emb.filter(col("vec_id") % 2 === 1)

    val exact = BitextMine.mine(src, tgt, "vec_id", "embedding",
        k = 2, marginThreshold = 1.0)
      .select("src_id", "tgt_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture must yield exact pairs")

    val cents = IvfAnn.centroids(emb, "vec_id", "embedding", 16)
    val srcHome = IvfAnn.assign(src, "vec_id", "embedding", cents)
    def recallAt(nprobe: Int): Double = {
      val probed = IvfAnn.assignProbed(tgt, "vec_id", "embedding", cents, nprobe)
      val got = BitextMine.mineBucketed(srcHome, probed,
          "vec_id", "embedding", "cluster", k = 2, marginThreshold = 1.0)
        .select("src_id", "tgt_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & got).size.toDouble / exact.size
    }

    // synthetic embeddings are near-random (worst case for IVF cells) —
    // the floors pin the dial's measured behavior, not a marketing number
    val r4 = recallAt(4)
    val r8 = recallAt(8)
    info(f"recall@nprobe=4 $r4%.3f, @nprobe=8 $r8%.3f (exact=${exact.size})")
    assert(r4 >= 0.50, f"recall@4 $r4%.3f below the 0.50 floor")
    assert(r8 >= 0.75, f"recall@8 $r8%.3f below the 0.75 floor")
    assert(r8 >= r4, "probing more cells must never lose pairs")
  }
}
