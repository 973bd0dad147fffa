package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  private def report(rows: (Double, Int)*) =
    Calibration.report(rows.toSeq.toDF("p", "y"), "p", "y")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("bins partition [0,1] and p=1.0 folds into the top bin") {
    val m = report((0.05, 0), (0.15, 0), (0.95, 1), (1.0, 1))
    assert(m.keySet == Set(0L, 1L, 9L))
    assert(m(9L).getLong(m(9L).fieldIndex("n")) == 2L)
  }

  test("frac_pos is the empirical rate; mean_pred averages the bin") {
    val m = report((0.72, 1), (0.78, 0), (0.74, 1))
    val b7 = m(7L)
    assert(b7.getLong(b7.fieldIndex("n_pos")) == 2L)
    assert(b7.getDouble(b7.fieldIndex("frac_pos")) == math.round(2.0 / 3.0 * 1e6) / 1e6)
    assert(b7.getDouble(b7.fieldIndex("mean_pred")) == math.round((0.72 + 0.78 + 0.74) / 3 * 1e6) / 1e6)
  }

  test("brier sum: perfect predictions contribute zero") {
    val m = report((1.0, 1), (0.0, 0))
    assert(m.values.forall(r => r.getDouble(r.fieldIndex("brier_sum")) == 0.0))
    val bad = report((0.9, 0))
    assert(bad(9L).getDouble(bad(9L).fieldIndex("brier_sum")) == 0.81)
  }

  test("isotonic PAV: pools the violating bins and never decreases") {
    // bins 1 and 7 hold miscalibrated rates (0.9 then 0.1): PAV must pool
    val rows = Seq.fill(9)((0.15, 1)) ++ Seq((0.15, 0)) ++
      Seq.fill(9)((0.75, 0)) ++ Seq((0.75, 1)) ++
      Seq((0.95, 1), (0.95, 1))
    val out = Calibration.isotonicBins(rows.toDF("p", "y"), "p", "y")
      .orderBy("bin").collect()
    val iso = out.map(r => r.getDouble(r.fieldIndex("iso")))
    assert(iso.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
      s"iso not monotone: ${iso.toSeq}")
    // pooled mean of the two violating bins: (9+1)/(10+10) = 0.5
    assert(iso(0) == 0.5 && iso(1) == 0.5)
    assert(iso(2) == 1.0)
    // weighted sum preserved on the pooled segment (PAV invariant)
    val n = out.map(r => r.getLong(r.fieldIndex("n")))
    assert(math.abs(iso.zip(n).map { case (v, c) => v * c }.sum - (9 + 1 + 2.0)) < 1e-9)
  }

  test("Murphy decomposition ledger closes: brier = REL - RES + UNC + wvar - 2*wcov") {
    val rows = Seq((0.05, 0), (0.12, 0), (0.17, 1), (0.33, 0), (0.38, 1),
      (0.52, 1), (0.58, 0), (0.71, 1), (0.77, 1), (0.93, 1), (0.97, 1))
    val r = Calibration.brierDecomposition(rows.toDF("p", "y"), "p", "y")
      .collect().head
    def f(c: String) = r.getDouble(r.fieldIndex(c))
    val lhs = f("brier")
    val rhs = f("reliability") - f("resolution") + f("uncertainty") +
      f("within_bin_var") - 2.0 * f("within_bin_cov")
    // each term independently 6dp-rounded -> up to ~3e-6 slack
    assert(math.abs(lhs - rhs) < 5e-6, s"ledger open: $lhs vs $rhs")
    assert(f("uncertainty") > 0 && f("uncertainty") <= 0.25 + 1e-9)
    assert(f("reliability") >= 0 && f("resolution") >= 0)
  }
}
