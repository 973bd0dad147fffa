package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NegZeroScanSpec extends SparkSpec {
  import spark.implicits._

  test("a deliberately-injected -0.0 is flagged; +0.0 is not") {
    val bad = Seq(1.5, -0.0, 2.25).toDF("v")
    val found = NegZeroScan.scan(bad)
    assert(found.exists(s => s.column == "v" && s.negZero == 1))

    val good = Seq(1.5, 0.0, 2.25, -3.5).toDF("v")
    assert(NegZeroScan.scan(good).forall(_.negZero == 0))
  }

  test("the +0.0 idiom survives the scan where the bare expression fails") {
    // the q176 shape seen from the engine that CAN emit -0.0: Spark's
    // BigDecimal round already normalizes round(-1e-16, 6) to +0.0, but
    // any non-round float expression (products, sums) still carries the
    // signed zero — exactly what DuckDB's round hands the driver's hash
    val df = Seq(-1.0).toDF("r")
    val bare = df.select((col("r") * lit(0.0)).as("beta"))
    assert(NegZeroScan.scan(bare).exists(_.negZero == 1))
    val pinned = df.select((col("r") * lit(0.0) + lit(0.0)).as("beta"))
    assert(NegZeroScan.scan(pinned).forall(_.negZero == 0))
  }

  test("cells within 1e-9 of a .5e-6 rounding boundary are warned") {
    // 0.0000015 sits exactly on a boundary; 0.1234561 does not
    val df = Seq(0.0000015, 0.1234561, 1.0000005 + 4e-10).toDF("v")
    val s = NegZeroScan.scan(df)
    assert(s.exists(c => c.column == "v" && c.nearBoundary >= 2))
  }

  test("NaN, Inf, nulls, and non-float columns are ignored") {
    val df = Seq(
      (Some(Double.NaN), "a"), (Some(Double.PositiveInfinity), "b"),
      (None: Option[Double], "c"), (Some(1.25), "d")).toDF("v", "s")
    assert(NegZeroScan.scan(df).isEmpty)
    assert(NegZeroScan.scan(Seq(1, 2).toDF("i")).isEmpty)
  }
}
