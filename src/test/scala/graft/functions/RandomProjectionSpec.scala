package graft.functions

import graft.SparkSpec
import graft.core.Tables

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("projection is deterministic and linear") {
    val pts = Seq(
      (1L, Seq.tabulate(64)(i => math.sin(i + 1))),
      (2L, Seq.tabulate(64)(i => 2.0 * math.sin(i + 1))), // 2 × point 1
      (3L, Seq.fill(64)(0.0))
    ).toDF("vec_id", "embedding")
    def proj() = RandomProjection.project(pts, "vec_id", "embedding", 64, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val a = proj(); val b = proj()
    assert(a == b) // hash-derived matrix: bit-identical across runs
    assert(a(3L).forall(_ == 0.0))
    // linearity: y(2v) = 2·y(v) exactly (pure multiply-accumulate)
    a(1L).zip(a(2L)).foreach { case (y1, y2) => assert(math.abs(y2 - 2 * y1) < 1e-12) }
  }

  test("JL property: pairwise distances roughly preserved at 64 -> 16 on real embeddings") {
    val sfDir = "/root/testdata/sf0.01"
    assume(new java.io.File(sfDir).isDirectory)
    val emb = Tables.embeddings(spark, sfDir).limit(80)
    val orig = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val proj = RandomProjection.project(emb, "vec_id", "embedding", 64, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toSeq.sorted
    val ratios = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      o = d2(orig(ids(i)), orig(ids(j))) if o > 1e-9
    } yield d2(proj(ids(i)), proj(ids(j))) / o
    // E[ratio] = 1; k=16 gives wide but bounded spread. The mean over
    // ~3000 pairs concentrates hard; individual pairs stay in a loose band.
    val mean = ratios.sum / ratios.size
    assert(mean > 0.85 && mean < 1.15, s"mean distance ratio $mean drifted from 1")
    assert(ratios.count(r => r > 0.2 && r < 3.0) > ratios.size * 0.95)
  }
}
