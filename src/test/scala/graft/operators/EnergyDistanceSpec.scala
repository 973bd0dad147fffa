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
}
