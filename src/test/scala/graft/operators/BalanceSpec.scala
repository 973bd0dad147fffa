package graft.operators

import graft.SparkSpec

class BalanceSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("balanced covariate: SMD exactly +0.0, variance ratio 1") {
    val d = Seq(("age", 0L, 10L), ("age", 0L, 20L),
      ("age", 1L, 10L), ("age", 1L, 20L)).toDF("cov", "g", "v")
    val r = Balance.smdPanel(d, "cov", "g", "v").collect().head
    val smd = r.getAs[Double]("smd")
    assert(smd == 0.0)
    assert(java.lang.Double.doubleToRawLongBits(smd) == 0L, "SMD must be +0.0")
    assert(r.getAs[Double]("var_ratio") == 1.0)
  }

  test("shifted covariate: hand-computed SMD") {
    // arm0: 0,2 (m=1, s²=2) ; arm1: 4,6 (m=5, s²=2) → SMD = 4/√2
    val d = Seq(("x", 0L, 0L), ("x", 0L, 2L), ("x", 1L, 4L), ("x", 1L, 6L))
      .toDF("cov", "g", "v")
    val r = Balance.smdPanel(d, "cov", "g", "v").collect().head
    assert(r.getAs[Double]("smd") == r6(4.0 / math.sqrt(2.0)))
    assert(r.getAs[Double]("mean0") == 1.0 && r.getAs[Double]("mean1") == 5.0)
  }

  test("degenerate arms surface NULLs, not errors") {
    // constant values in both arms → zero pooled variance
    val d = Seq(("c", 0L, 5L), ("c", 0L, 5L), ("c", 1L, 5L), ("c", 1L, 5L))
      .toDF("cov", "g", "v")
    val r = Balance.smdPanel(d, "cov", "g", "v").collect().head
    assert(r.isNullAt(r.fieldIndex("smd")))
    assert(r.isNullAt(r.fieldIndex("var_ratio")))
    // single-row arm → n−1 = 0 guard
    val d2 = Seq(("s", 0L, 5L), ("s", 1L, 4L), ("s", 1L, 6L)).toDF("cov", "g", "v")
    val r2 = Balance.smdPanel(d2, "cov", "g", "v").collect().head
    assert(r2.isNullAt(r2.fieldIndex("smd")))
  }
}
