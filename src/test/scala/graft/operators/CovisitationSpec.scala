package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CovisitationSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, Long, Long)]) =
    rows.toDF("uid", "eid", "epoch_s", "item")
      .withColumn("ts", timestamp_seconds(col("epoch_s")))

  private def pairs(rows: Seq[(Long, Long, Long, Long)], gap: Long = 100L) =
    Covisitation.topPairs(ev(rows), "uid", "ts", "eid", "item", gap, 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap

  test("items in one session pair up; the gap splits sessions") {
    val m = pairs(Seq(
      (1L, 0L, 0L, 10L), (1L, 1L, 50L, 20L),     // session A: 10,20
      (1L, 2L, 500L, 30L), (1L, 3L, 550L, 40L))) // session B: 30,40
    assert(m == Map((10L, 20L) -> 1L, (30L, 40L) -> 1L))
  }

  test("pair support counts distinct sessions, repeats within one session once") {
    val m = pairs(Seq(
      (1L, 0L, 0L, 10L), (1L, 1L, 10L, 20L), (1L, 2L, 20L, 10L),  // u1: 10,20
      (2L, 3L, 0L, 10L), (2L, 4L, 10L, 20L)))                     // u2: 10,20
    assert(m == Map((10L, 20L) -> 2L))
  }

  test("pairs are unordered (a < b) and never self-pairs") {
    val m = pairs(Seq(
      (1L, 0L, 0L, 20L), (1L, 1L, 10L, 10L), (1L, 2L, 20L, 10L)))
    assert(m.keySet == Set((10L, 20L)))
  }

  test("sessions never span users") {
    val m = pairs(Seq((1L, 0L, 0L, 10L), (2L, 1L, 10L, 20L)))
    assert(m.isEmpty)
  }
}
