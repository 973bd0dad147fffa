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

  test("acf is replay-stable across partitionings") {
    val xs = (0 until 40).map(i => ((i * 17L) % 13L))
    val runs = (1 to 3).map { p =>
      Autocorr.acf(series(xs).repartition(p * 3), "day", "x", 5)
        .collect().map(_.toSeq).toSeq
    }
    assert(runs.distinct.size == 1)
  }
}
