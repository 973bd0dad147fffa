package graft.operators

import graft.SparkSpec

class GiniSpec extends SparkSpec {
  import spark.implicits._

  private def gini(rows: Seq[(String, Long)]) =
    Gini.coefficient(rows.toDF("g", "v"), "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap

  test("perfect equality scores 0; the bottom half holds half the mass") {
    val out = gini((1 to 10).map(_ => ("eq", 7L)))("eq")
    assert(out.getAs[Double]("gini") == 0.0)
    assert(out.getAs[Double]("bottom_half_share") == 0.5)
  }

  test("total concentration approaches (n-1)/n") {
    // one item holds everything
    val rows = (1 to 9).map(_ => ("c", 0L)) :+ (("c", 1000L))
    val out = gini(rows)("c")
    assert(out.getAs[Double]("gini") == 0.9)
    assert(out.getAs[Double]("bottom_half_share") == 0.0)
  }

  test("hand-computed small case with ties") {
    // values 1,1,2,4: sorted ranks 1..4; S = 1*1+1*2+2*3+4*4 = 25
    // G = 2*25/(4*8) - 5/4 = 1.5625 - 1.25 = 0.3125
    val out = gini(Seq(("h", 1L), ("h", 1L), ("h", 2L), ("h", 4L)))("h")
    assert(out.getAs[Double]("gini") == 0.3125)
    // bottom half = 2 items (the two 1s) -> share 2/8
    assert(out.getAs[Double]("bottom_half_share") == 0.25)
    assert(out.getAs[Long]("n_items") == 4L && out.getAs[Long]("total") == 8L)
  }

  test("groups are independent and ordering of input rows is irrelevant") {
    val base = Seq(("a", 5L), ("a", 10L), ("b", 1L), ("b", 100L))
    val o1 = gini(base)
    val o2 = gini(base.reverse)
    assert(o1("a").getAs[Double]("gini") == o2("a").getAs[Double]("gini"))
    assert(o1("b").getAs[Double]("gini") > o1("a").getAs[Double]("gini"),
      "the lopsided group must score more unequal")
  }
}
