package graft.functions

import graft.SparkSpec

class ZipfLawSpec extends SparkSpec {
  import spark.implicits._

  // frequencies aa=8 bb=4 cc=2 dd=1 → ranks 1..4
  private val docs = Seq(
    (("aa " * 8) + ("bb " * 4)).trim,
    (("cc " * 2) + "dd").trim
  ).toDF("text")

  test("two-point fit: exact slope -1 (f halves as rank doubles)") {
    val r = ZipfLaw.fit(docs, "text", 2).collect().head
    assert(r.getAs[Long]("n_types") == 4L)
    assert(r.getAs[Long]("n_top") == 2L)
    // points (ln1, ln8), (ln2, ln4): slope = (ln4-ln8)/(ln2-ln1) = -1
    assert(r.getAs[Double]("slope") == -1.0)
    // intercept = ln 8
    assert(r.getAs[Double]("intercept") ==
      BigDecimal(math.log(8.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("four-point fit matches the closed-form OLS") {
    val r = ZipfLaw.fit(docs, "text", 100).collect().head
    assert(r.getAs[Long]("n_top") == 4L)
    val xs = (1 to 4).map(i => math.log(i.toDouble))
    val ys = Seq(8.0, 4.0, 2.0, 1.0).map(math.log)
    val m = 4.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-5)
    assert(r.getAs[Double]("slope") < -0.9) // steeper than -0.9: real decay
  }

  test("single-type corpus yields NULL slope, not a divide error") {
    val one = Seq("zz zz zz").toDF("text")
    val r = ZipfLaw.fit(one, "text", 10).collect().head
    assert(r.getAs[Long]("n_types") == 1L)
    assert(r.isNullAt(r.fieldIndex("slope")))
    assert(r.isNullAt(r.fieldIndex("intercept")))
  }
}
