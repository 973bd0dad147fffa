package graft.operators

import graft.SparkSpec

class AutocorrSpec extends SparkSpec {
  import spark.implicits._

  private def series(xs: Seq[Long]) =
    xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("day", "x")

  test("alternating series: strong negative lag-1, positive lag-2") {
    val g = series((0 until 20).map(i => (i % 2).toLong))
    val rows = Autocorr.acf(g, "day", "x", 3).collect()
      .map(r => r.getAs[Long]("lag") -> r.getAs[Double]("r")).toMap
    assert(rows(1L) < -0.9, s"lag1 = ${rows(1L)}")
    assert(rows(2L) >= 0.9, s"lag2 = ${rows(2L)}")
    // finite-sample decay: |r_L| ≈ (n−L)/n for the pure alternation
    assert(rows(3L) <= -0.8)
  }

  test("constant series: zero variance yields NULL r, NULL ljung-box") {
    val g = series(Seq.fill(10)(7L))
    val rows = Autocorr.acf(g, "day", "x", 2).collect()
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("r"))))
    val lb = Autocorr.ljungBox(g, "day", "x", 2, 5.99).collect().head
    assert(lb.isNullAt(lb.fieldIndex("q_lb")))
  }

  test("ljung-box rejects a periodic series and keeps pair counts honest") {
    val g = series((0 until 30).map(i => (i % 2).toLong * 10))
    val lb = Autocorr.ljungBox(g, "day", "x", 7, 14.06714).collect().head
    assert(lb.getAs[Boolean]("reject_white_noise"))
    assert(lb.getAs[Long]("n") == 30L && lb.getAs[Long]("max_lag") == 7L)
    val acf = Autocorr.acf(g, "day", "x", 7).collect()
    assert(acf.map(_.getAs[Long]("n_pairs")).toSeq ==
      (29L to 23L by -1L).toSeq)
  }

  test("runs test: perfect alternation gives R = n, textbook z") {
    // x alternates 0/10 over 10 days: median 5, signs alternate → R = 10
    val g = series((0 until 10).map(i => (i % 2).toLong * 10))
    val r = Autocorr.runsTest(g, "day", "x").collect().head
    assert(r.getAs[Long]("n1") == 5L && r.getAs[Long]("n2") == 5L)
    assert(r.getAs[Long]("r") == 10L)
    assert(r.getAs[Double]("e_r") == 6.0)
    // Var = 2000/900 ; z = (10−6)/sqrt(2000/900)
    val exp = BigDecimal(4.0 / math.sqrt(2000.0 / 900.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("z") == exp)
  }

  test("durbin-watson: alternation near 4, ramp near 0, constant NULL") {
    val alt = series((0 until 10).map(i => (i % 2).toLong * 10))
    val rAlt = Autocorr.durbinWatson(alt, "day", "x").collect().head
    // sdd = 9·100 = 900; den = 10·500 − 2500 = 2500 → DW = 3.6
    assert(rAlt.getAs[Double]("dw") == 3.6)
    val ramp = series((1L to 10L))
    val rRamp = Autocorr.durbinWatson(ramp, "day", "x").collect().head
    // sdd = 9; den = 10·385 − 55² = 825 → DW = 90/825
    assert(rRamp.getAs[Double]("dw") ==
      BigDecimal(90.0 / 825).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val const = series(Seq.fill(6)(4L))
    val rConst = Autocorr.durbinWatson(const, "day", "x").collect().head
    assert(rConst.isNullAt(rConst.fieldIndex("dw")))
  }

  test("runs test: all-tied series has nothing to test -> NULLs") {
    val g = series(Seq.fill(8)(3L))
    val r = Autocorr.runsTest(g, "day", "x").collect().head
    assert(r.getAs[Long]("n1") == 0L && r.getAs[Long]("n2") == 0L)
    assert(r.isNullAt(r.fieldIndex("e_r")))
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("acf is replay-stable across partitionings") {
    val xs = (0 until 40).map(i => ((i * 17L) % 13L))
    val runs = (1 to 3).map { p =>
      Autocorr.acf(series(xs).repartition(p * 3), "day", "x", 5)
        .collect().map(_.toSeq).toSeq
    }
    assert(runs.distinct.size == 1)
  }
}
