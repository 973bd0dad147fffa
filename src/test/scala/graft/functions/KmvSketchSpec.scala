package graft.functions

import graft.SparkSpec

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("below K distinct values the sketch IS the distinct set and the estimate is exact") {
    val small = (1 to 10).flatMap(i => Seq(("g", s"tok_$i"), ("g", s"tok_$i"))).toDF("grp", "v")
    val row = KmvSketch.estimate(KmvSketch.sketch(small, "grp", "v")).collect().head
    assert(row.getLong(1) == 10L)
    assert(row.getDouble(2) == 10.0)
  }

  test("above K the estimate lands within the order-statistics error envelope") {
    val n = 5000
    val big = (1 to n).map(i => ("g", s"word_$i")).toDF("grp", "v")
    val est = KmvSketch.estimate(KmvSketch.sketch(big, "grp", "v")).collect().head.getDouble(2)
    // relative std error ~ 1/sqrt(K-2) = 18%; 3-sigma envelope
    assert(est > n * 0.45 && est < n * 1.55, s"estimate $est too far from $n")
    // value-determinism: duplicates never move the k-min set
    val est2 = KmvSketch.estimate(KmvSketch.sketch(big.union(big), "grp", "v"))
      .collect().head.getDouble(2)
    assert(est2 == est)
  }

  test("merge of shard sketches equals the sketch of the union") {
    val a = (1 to 800).map(i => ("g", s"item_$i")).toDF("grp", "v")
    val b = (500 to 1200).map(i => ("g", s"item_$i")).toDF("grp", "v") // overlaps a
    val merged = KmvSketch.merge(
      KmvSketch.sketch(a, "grp", "v"), KmvSketch.sketch(b, "grp", "v"))
      .collect().head.getSeq[Long](1)
    val whole = KmvSketch.sketch(a.union(b), "grp", "v")
      .collect().head.getSeq[Long](1)
    assert(merged == whole)
    assert(merged.length == KmvSketch.K)
    assert(merged == merged.sorted && merged.distinct == merged)
  }

  test("kept hashes are the K smallest distinct hash31 values (order statistics, not sampling)") {
    val vals = (1 to 300).map(i => ("g", s"x$i"))
    val kept = KmvSketch.sketch(vals.toDF("grp", "v"), "grp", "v")
      .collect().head.getSeq[Long](1)
    val allHashes = vals.map { case (_, v) => graft.core.Ids.hash31(v) }.distinct.sorted
    assert(kept == allHashes.take(KmvSketch.K))
  }
}
