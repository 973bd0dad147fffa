package graft.operators

import graft.SparkSpec

class MannKendallSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("strictly increasing series: S = n(n-1)/2, textbook z, 'increasing'") {
    val g = (1L to 10L).map(i => (i, i)).toDF("day", "x")
    val r = MannKendall.test(g, "day", "x").collect().head
    assert(r.getAs[Long]("s") == 45L)
    // no ties: Var = 10·9·25/18 = 125
    assert(r.getAs[Double]("var_s") == 125.0)
    assert(r.getAs[Double]("z") == r6(44.0 / math.sqrt(125.0)))
    assert(r.getAs[String]("trend") == "increasing")
  }

  test("constant series: all ties zero the variance -> NULL, S = 0") {
    val g = (1L to 8L).map(i => (i, 5L)).toDF("day", "x")
    val r = MannKendall.test(g, "day", "x").collect().head
    assert(r.getAs[Long]("s") == 0L)
    assert(r.isNullAt(r.fieldIndex("var_s")))
    assert(r.isNullAt(r.fieldIndex("z")))
    assert(r.isNullAt(r.fieldIndex("trend")))
  }

  test("noisy but trendless series says no_trend; replay-stable") {
    val xs = Seq(5L, 3L, 7L, 4L, 6L, 2L, 8L, 5L, 4L, 6L)
    val runs = (1 to 3).map { p =>
      MannKendall.test(
        xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
          .toDF("day", "x").repartition(p * 2), "day", "x")
        .collect().head.toSeq
    }
    assert(runs.distinct.size == 1)
    val r = MannKendall.test(
      xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("day", "x"),
      "day", "x").collect().head
    assert(r.getAs[String]("trend") == "no_trend")
  }
}
