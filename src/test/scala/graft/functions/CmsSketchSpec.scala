package graft.functions

import graft.SparkSpec

class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  test("estimates never undercount and hit exactly absent collisions") {
    // 5 distinct values with known multiplicities; 64 buckets × 4 rows
    // make an all-rows collision for one of 5 values vanishingly unlikely
    val occ = Seq.fill(50)("alpha") ++ Seq.fill(20)("beta") ++
      Seq.fill(7)("gamma") ++ Seq.fill(1)("delta") ++ Seq.fill(3)("eps")
    val df = occ.toDF("v")
    val probes = Seq("alpha", "beta", "gamma", "delta", "eps", "absent").toDF("v")
    val est = CmsSketch.estimate(CmsSketch.counters(df, "v"), probes, "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Map("alpha" -> 50L, "beta" -> 20L, "gamma" -> 7L,
      "delta" -> 1L, "eps" -> 3L, "absent" -> 0L)
    exact.foreach { case (v, n) =>
      assert(est(v) >= n, s"$v undercounted: ${est(v)} < $n")
    }
    // the absent probe can only overcount via a collision in EVERY row
    assert(est("alpha") == 50L && est("beta") == 20L)
  }

  test("merge of split sketches equals the sketch of the concatenation") {
    val a = (1 to 300).map(i => s"tok_${i % 40}").toDF("v")
    val b = (1 to 200).map(i => s"tok_${i % 25}").toDF("v")
    val probes = (0 until 40).map(i => s"tok_$i").toDF("v")
    val merged = CmsSketch.estimate(
      CmsSketch.merge(CmsSketch.counters(a, "v"), CmsSketch.counters(b, "v")),
      probes, "v").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val whole = CmsSketch.estimate(CmsSketch.counters(a.unionAll(b), "v"), probes, "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == whole)
  }

  test("counter table is bounded by d*w regardless of input size") {
    val big = (1 to 5000).map(i => s"item_$i").toDF("v")
    val n = CmsSketch.counters(big, "v").count()
    assert(n <= CmsSketch.D.toLong * CmsSketch.W)
    assert(n > 200) // 5000 distinct values should touch nearly every cell
  }
}
