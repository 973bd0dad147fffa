package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AssociationRulesSpec extends SparkSpec {
  import spark.implicits._

  // one event per (user, second, item); users far apart in time are
  // separate sessions anyway
  private def ev(rows: (Long, Long, Long)*) =
    rows.zipWithIndex.map { case ((u, s, item), i) => (u, i.toLong, s, item) }
      .toDF("user_id", "event_id", "s", "item")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("s") * 1000000L).as("ts"), col("item"))

  private def mine(minSupport: Long, rows: (Long, Long, Long)*) =
    AssociationRules.rules(ev(rows: _*), "user_id", "ts", "event_id", "item",
      gapSec = 1800L, minSupport = minSupport, k = 100)

  test("confidence is directional, lift is symmetric") {
    // 3 sessions contain {1,2}; item 1 also appears alone twice.
    // conf(1→2) = 3/5, conf(2→1) = 3/3 = 1; lift identical both ways.
    val rows = Seq(
      (1L, 0L, 1L), (1L, 10L, 2L),
      (2L, 0L, 1L), (2L, 10L, 2L),
      (3L, 0L, 1L), (3L, 10L, 2L),
      (4L, 0L, 1L), (5L, 0L, 1L))
    val out = mine(2L, rows: _*).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Double]("confidence"), r.getAs[Double]("lift"))).toMap
    assert(out((1L, 2L))._1 == 0.6)
    assert(out((2L, 1L))._1 == 1.0)
    assert(out((1L, 2L))._2 == out((2L, 1L))._2)
    // lift = n_ab * N / (n_a * n_b) = 3*5 / (5*3) = 1.0
    assert(out((1L, 2L))._2 == 1.0)
  }

  test("lift > 1 for genuinely associated items, < 1 for anti-correlated ones") {
    // items 10,11 always together (4 sessions); items 20,21 mostly in
    // disjoint sessions with one overlap: N=10, n_20=4, n_21=3, n_2021=1
    // -> lift 10/12 < 1.
    val together = (1L to 4L).flatMap(u => Seq((u, 0L, 10L), (u, 5L, 11L)))
    val apart = Seq((5L, 0L, 20L), (6L, 0L, 21L), (7L, 0L, 20L), (7L, 5L, 21L),
      (8L, 0L, 20L), (8L, 5000L, 21L), // 5000s gap -> separate sessions
      (9L, 0L, 20L))
    val out = mine(1L, (together ++ apart): _*).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("lift")).toMap
    assert(out((10L, 11L)) > 1.0, s"together lift ${out((10L, 11L))}")
    assert(out((20L, 21L)) < 1.0, s"apart lift ${out((20L, 21L))}")
  }

  test("session gap splits baskets: distant co-occurrence is no association") {
    // same user sees 1 then 2, but 2 hours apart -> different sessions
    val out = mine(1L, (1L, 0L, 1L), (1L, 7200L, 2L))
    assert(out.isEmpty)
  }

  test("duplicate item views inside a session count once") {
    val rows = Seq((1L, 0L, 1L), (1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L),
      (2L, 0L, 1L), (2L, 1L, 2L))
    val r = mine(1L, rows: _*).collect()
      .find(x => x.getLong(0) == 1L && x.getLong(1) == 2L).get
    assert(r.getAs[Long]("n_ab") == 2L && r.getAs[Long]("n_a") == 2L)
    assert(r.getAs[Double]("confidence") == 1.0)
  }
}
