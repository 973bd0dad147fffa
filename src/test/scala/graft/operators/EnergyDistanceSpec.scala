package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EnergyDistanceSpec extends SparkSpec {
  import spark.implicits._

  private def brute(xs: Seq[Long], ys: Seq[Long]): Double = {
    def cross(a: Seq[Long], b: Seq[Long]) =
      (for (x <- a; y <- b) yield math.abs(x - y).toDouble).sum
    2.0 * cross(xs, ys) / (xs.size * ys.size) -
      cross(xs, xs) / (xs.size.toLong * xs.size) -
      cross(ys, ys) / (ys.size.toLong * ys.size)
  }

  private def run(xs: Seq[Long], ys: Seq[Long]) = {
    val df = (xs.map((_, true)) ++ ys.map((_, false))).toDF("v", "inx")
    EnergyDistance.twoSample(df, "v", col("inx")).collect().head
  }

  test("identical samples give exactly zero") {
    val r = run(Seq(1L, 5L, 9L, 9L, 20L), Seq(1L, 5L, 9L, 9L, 20L))
    assert(r.getAs[Double]("d2") == 0.0)
    assert(r.getAs[Long]("s_xx") == r.getAs[Long]("s_yy"))
  }

  test("gap identity matches the brute-force O(n^2) sums, ties included") {
    val xs = Seq(3L, 3L, 7L, 12L, 12L, 40L)
    val ys = Seq(1L, 7L, 7L, 25L, 60L)
    val r = run(xs, ys)
    def bruteSum(a: Seq[Long]) =
      (for (i <- a.indices; j <- i + 1 until a.size)
        yield math.abs(a(i) - a(j))).sum
    assert(r.getAs[Long]("s_xx") == bruteSum(xs))
    assert(r.getAs[Long]("s_yy") == bruteSum(ys))
    assert(r.getAs[Long]("s_xy") ==
      (for (x <- xs; y <- ys) yield math.abs(x - y)).sum)
    assert(math.abs(r.getAs[Double]("d2") - brute(xs, ys)) < 1e-6)
  }

  test("a pure location shift yields positive distance growing with the shift") {
    val base = Seq(1L, 2L, 3L, 4L, 5L)
    val d1 = run(base, base.map(_ + 2)).getAs[Double]("d2")
    val d2 = run(base, base.map(_ + 10)).getAs[Double]("d2")
    assert(d1 > 0 && d2 > d1)
  }

  test("cliffs delta matches the brute-force pair counts, ties included") {
    val xs = Seq(3L, 3L, 7L, 12L, 40L)
    val ys = Seq(1L, 7L, 7L, 25L)
    val df = (xs.map((_, true)) ++ ys.map((_, false))).toDF("v", "inx")
    val r = EnergyDistance.cliffsDelta(df, "v", col("inx")).collect().head
    val gt = (for (x <- xs; y <- ys) yield if (x > y) 1 else 0).sum
    val lt = (for (x <- xs; y <- ys) yield if (x < y) 1 else 0).sum
    val ties = (for (x <- xs; y <- ys) yield if (x == y) 1 else 0).sum
    assert(r.getAs[Long]("gt") == gt && r.getAs[Long]("lt") == lt)
    assert(r.getAs[Long]("ties") == ties)
    assert(math.abs(r.getAs[Double]("delta")
      - (gt - lt).toDouble / (xs.size * ys.size)) < 1e-6)
  }

  test("cliffs delta: complete separation is +1, identical samples 0") {
    val hi = Seq(10L, 11L, 12L)
    val lo = Seq(1L, 2L, 3L)
    val sep = EnergyDistance.cliffsDelta(
      (hi.map((_, true)) ++ lo.map((_, false))).toDF("v", "inx"),
      "v", col("inx")).collect().head
    assert(sep.getAs[Double]("delta") == 1.0)
    val same = EnergyDistance.cliffsDelta(
      (hi.map((_, true)) ++ hi.map((_, false))).toDF("v", "inx"),
      "v", col("inx")).collect().head
    assert(same.getAs[Double]("delta") == 0.0)
  }
}
