package graft.operators

import graft.SparkSpec

class QuantileNormSpec extends SparkSpec {
  import spark.implicits._

  test("a scale-shifted source maps onto the pooled distribution") {
    // source a: 1..5, source b: 101..105 — same shape, shifted scale.
    // Each rank maps to the same pooled position for both sources.
    val rows = (1 to 5).map(i => ("a", i.toLong, i.toLong)) ++
      (1 to 5).map(i => ("b", (10 + i).toLong, (100 + i).toLong))
    val out = QuantileNorm.normalize(rows.toDF("src", "id", "v"), "src", "id", "v")
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("rank_src")) -> r.getAs[Long]("norm_value"))
      .toMap
    // same within-source rank -> identical normalized value
    (1L to 5L).foreach { rk =>
      assert(out(("a", rk)) == out(("b", rk)), s"rank $rk diverged")
    }
    // extremes hit the pooled extremes
    assert(out(("a", 1L)) == 1L && out(("a", 5L)) == 105L)
  }

  test("normalized values are monotone in within-source rank") {
    val rows = (1 to 20).map(i => ("a", i.toLong, (i * 7 % 13).toLong)) ++
      (1 to 8).map(i => ("b", (100 + i).toLong, (i * 1000).toLong))
    val out = QuantileNorm.normalize(rows.toDF("src", "id", "v"), "src", "id", "v")
    val bySrc = out.collect().groupBy(_.getString(0))
    bySrc.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank_src")).map(_.getAs[Long]("norm_value"))
      assert(sorted.zip(sorted.tail).forall { case (x, y) => x <= y })
    }
    // row count preserved: every input row got exactly one normalized value
    assert(out.count() == 28)
  }

  test("a single-row source maps to the pooled median") {
    val rows = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("lone", 9L, 999999L))
    val out = QuantileNorm.normalize(rows.toDF("src", "id", "v"), "src", "id", "v")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("norm_value")).toMap
    // pooled sorted values: 10,20,30,999999 -> position (4+1) div 2 = 2 -> 20
    assert(out(9L) == 20L)
  }
}
