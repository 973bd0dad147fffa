package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfReclusterSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters on axes 0 and 1; ids 0..5 base-ish layout
  private def vec(hot: Int, eps: Double): Seq[Double] =
    (0 until 4).map(d => if (d == hot) 1.0 else eps)

  test("a batch landing inside one cluster drifts ONLY that centroid") {
    val base = Seq(
      (0L, vec(0, 0.00)), (1L, vec(1, 0.00)),
      (2L, vec(0, 0.02)), (3L, vec(1, 0.02)),
      (4L, vec(0, 0.04)), (5L, vec(1, 0.04))).toDF("vec_id", "v")
    // the batch piles onto cluster 0's side with a visible skew component
    val batch = Seq(
      (10L, Seq(1.0, 0.5, 0.0, 0.0)),
      (11L, Seq(1.0, 0.6, 0.0, 0.0))).toDF("vec_id", "v")
    val rep = IvfRecluster.report(base, batch, "vec_id", "v", 2, 2)
      .orderBy(col("cluster"))
      .as[(Long, Long, Long, Double, Long)].collect()
    assert(rep.length == 2)
    val c0 = rep(0); val c1 = rep(1)
    assert(c0._2 == 3 && c1._2 == 3) // 3 base members each
    assert(c0._3 == 2 && c1._3 == 0) // batch lands in cluster 0
    assert(c0._4 > 0.0, "cluster 0 must drift")
    assert(c1._4 == 0.0, "cluster 1 saw no arrivals: zero drift")
    assert(rep.forall(_._5 >= 0))
  }

  test("no batch → zero drift, zero moves (the idempotence edge)") {
    val base = Seq(
      (0L, vec(0, 0.0)), (1L, vec(1, 0.0)),
      (2L, vec(0, 0.1)), (3L, vec(1, 0.1))).toDF("vec_id", "v")
    val empty = base.filter(col("vec_id") < 0)
    val rep = IvfRecluster.report(base, empty, "vec_id", "v", 2, 1)
      .as[(Long, Long, Long, Double, Long)].collect()
    assert(rep.forall(r => r._3 == 0 && r._4 == 0.0 && r._5 == 0))
  }
}
