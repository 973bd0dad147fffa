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
}
