package graft.functions

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical distributions give ks = 0 and disjoint ranges give ks = 1") {
    val same = ((1 to 100).map(i => ("a", i.toLong)) ++
      (1 to 100).map(i => ("b", i.toLong))).toDF("g", "v")
    val r0 = Drift.ksPairs(same, "g", "v", 10L).collect().head
    assert(r0.getAs[Double]("ks") == 0.0)
    assert(r0.getAs[Long]("n_a") == 100L && r0.getAs[Long]("n_b") == 100L)

    val disjoint = ((1 to 50).map(i => ("a", i.toLong)) ++
      (1 to 50).map(i => ("b", i.toLong + 1000L))).toDF("g", "v")
    assert(Drift.ksPairs(disjoint, "g", "v", 10L)
      .collect().head.getAs[Double]("ks") == 1.0)
  }

  test("a known half-overlap shift yields ks = 0.5 on aligned buckets") {
    // a uniform on buckets 0..9, b uniform on buckets 5..14 (width 1):
    // CDFs diverge maximally at bucket 9: 1.0 vs 0.5
    val df = ((0 until 10).map(i => ("a", i.toLong)) ++
      (5 until 15).map(i => ("b", i.toLong))).toDF("g", "v")
    assert(Drift.ksPairs(df, "g", "v", 1L).collect().head.getAs[Double]("ks") == 0.5)
  }

  test("every unordered pair appears exactly once with grp_a < grp_b") {
    val df = (for (g <- Seq("a", "b", "c"); i <- 1 to 20) yield (g, i.toLong))
      .toDF("g", "v")
    val pairs = Drift.ksPairs(df, "g", "v", 5L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(pairs.toSet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(pairs.length == 3)
  }
}
