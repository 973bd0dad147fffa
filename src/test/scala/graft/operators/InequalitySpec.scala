package graft.operators

import graft.SparkSpec

class InequalitySpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("perfect equality: all three indices are exactly +0.0") {
    val d = Seq.fill(6)(("g", 100L)).toDF("g", "v")
    val r = Inequality.panel(d, "g", "v").collect().head
    for (c <- Seq("theil", "atkinson_1", "hoover")) {
      val v = r.getAs[Double](c)
      assert(v == 0.0, s"$c = $v")
      assert(java.lang.Double.doubleToRawLongBits(v) == 0L, s"$c not +0.0")
    }
    assert(r.getAs[Double]("mean") == 100.0)
  }

  test("two-point distribution matches the closed forms") {
    val d = Seq(("g", 1L), ("g", 3L)).toDF("g", "v")
    val r = Inequality.panel(d, "g", "v").collect().head
    // μ=2: Theil = ½[(½)ln ½ + (3/2)ln(3/2)]; A1 = 1 − √3/2; Hoover = ¼
    val theil = 0.5 * (0.5 * math.log(0.5) + 1.5 * math.log(1.5))
    assert(r.getAs[Double]("theil") == r6(theil))
    assert(r.getAs[Double]("atkinson_1") == r6(1.0 - math.sqrt(3.0) / 2.0))
    assert(r.getAs[Double]("hoover") == 0.25)
  }

  test("zero values are excluded from the positive-support indices") {
    val d = Seq(("g", 0L), ("g", 2L), ("g", 2L)).toDF("g", "v")
    val r = Inequality.panel(d, "g", "v").collect().head
    assert(r.getAs[Long]("n") == 2L) // the zero row dropped
    assert(r.getAs[Double]("theil") == 0.0)
  }

  test("panel is replay-stable across partitionings") {
    val d = (1L to 60L).map(i => (s"g${i % 3}", (i * 13) % 17 + 1))
    val runs = (1 to 3).map { p =>
      Inequality.panel(d.toDF("g", "v").repartition(p * 3), "g", "v")
        .orderBy("g").collect().map(_.toSeq).toSeq
    }
    assert(runs.distinct.size == 1)
  }
}
