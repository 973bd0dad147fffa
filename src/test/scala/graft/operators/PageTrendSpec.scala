package graft.operators

import graft.SparkSpec

class PageTrendSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("perfect order across 4 subjects: L = 56, textbook z") {
    // every subject ranks the conditions exactly 1 < 2 < 3
    val d = for (u <- 1 to 4; c <- 1 to 3) yield (s"u$u", c.toLong, c.toLong * 10)
    val r = PageTrend.pageL(d.toDF("u", "c", "v"), "u", "c", "v")
      .collect().head
    assert(r.getAs[Long]("n_subjects") == 4L && r.getAs[Long]("k") == 3L)
    // per subject L = 1+4+9 = 14; E = 3·16/4 = 12; Var_tot = 4·9·4·8/144 = 8
    assert(r.getAs[Double]("l") == 56.0)
    assert(r.getAs[Double]("z") == r6(8.0 / math.sqrt(8.0)))
  }

  test("all-tied values: midranks flatten L to its null mean, z = +0.0") {
    val d = for (u <- 1 to 5; c <- 1 to 3) yield (s"u$u", c.toLong, 7L)
    val r = PageTrend.pageL(d.toDF("u", "c", "v"), "u", "c", "v")
      .collect().head
    // every cell's 2·midrank = 2 + 0 + 2 = 4 → L per subject = (1+2+3)·2 = 12 = E
    assert(r.getAs[Double]("l") == 60.0)
    val z = r.getAs[Double]("z")
    assert(z == 0.0)
    assert(java.lang.Double.doubleToRawLongBits(z) == 0L, "z must be +0.0")
  }

  test("reversed order flips the sign; replay-stable") {
    val d = for (u <- 1 to 4; c <- 1 to 3) yield (s"u$u", c.toLong, -c.toLong)
    val runs = (1 to 3).map { p =>
      PageTrend.pageL(d.toDF("u", "c", "v").repartition(p * 2), "u", "c", "v")
        .collect().head.toSeq
    }
    assert(runs.distinct.size == 1)
    val r = PageTrend.pageL(d.toDF("u", "c", "v"), "u", "c", "v")
      .collect().head
    assert(r.getAs[Double]("z") == r6(-8.0 / math.sqrt(8.0)))
  }
}
