package graft.operators

import graft.SparkSpec

class ConcordanceSpec extends SparkSpec {
  import spark.implicits._

  test("kendall w: perfect agreement hits W = 1, chi2 = m(n-1)") {
    // 3 raters, identical order over 4 items
    val d = for (r <- Seq("a", "b", "c"); i <- 1 to 4)
      yield (r, s"item$i", i.toLong)
    val row = Concordance.kendallW(d.toDF("rater", "item", "v"),
      "rater", "item", "v").collect().head
    assert(row.getAs[Long]("m") == 3L && row.getAs[Long]("n") == 4L)
    assert(row.getAs[Double]("w") == 1.0)
    assert(row.getAs[Double]("chi2") == 9.0)
  }

  test("kendall w: two perfectly reversed raters hit W = 0 exactly") {
    val d = (1 to 4).flatMap(i =>
      Seq(("up", s"item$i", i.toLong), ("down", s"item$i", 5L - i)))
    val row = Concordance.kendallW(d.toDF("rater", "item", "v"),
      "rater", "item", "v").collect().head
    assert(row.getAs[Double]("w") == 0.0)
    assert(java.lang.Double.doubleToRawLongBits(row.getAs[Double]("w")) == 0L)
  }

  test("friedman: unanimous ordering gives the textbook chi2 = 6") {
    val d = for (u <- 1 to 3; c <- 1 to 3) yield (s"u$u", s"c$c", c.toLong)
    val row = Concordance.friedman(d.toDF("u", "c", "v"), "u", "c", "v")
      .collect().head
    assert(row.getAs[Long]("n") == 3L && row.getAs[Long]("k") == 3L)
    assert(row.getAs[Double]("chi2_f") == 6.0)
    assert(row.getAs[Double]("chi2_f_tie") == 6.0) // no ties
  }

  test("friedman: all-tied values zero the statistic, tie factor guards") {
    val d = for (u <- 1 to 3; c <- 1 to 3) yield (s"u$u", s"c$c", 7L)
    val row = Concordance.friedman(d.toDF("u", "c", "v"), "u", "c", "v")
      .collect().head
    assert(row.getAs[Double]("chi2_f") == 0.0)
    assert(row.getAs[Double]("chi2_f_tie") == 0.0)
  }
}
