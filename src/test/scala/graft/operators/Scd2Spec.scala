package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def log(rows: Seq[(Long, String, Long, Long)]) =
    rows.toDF("key", "state", "epoch_s", "seq")
      .withColumn("ts", timestamp_seconds(col("epoch_s")))

  test("consecutive identical states collapse into one version") {
    val l = log(Seq(
      (1L, "a", 0L, 0L), (1L, "a", 10L, 1L), (1L, "b", 20L, 2L),
      (1L, "b", 30L, 3L), (1L, "a", 40L, 4L)))
    val r = Scd2.build(l, "key", "state", "ts", "seq")
      .orderBy(col("version")).collect()
    assert(r.map(_.getString(1)).toSeq == Seq("a", "b", "a"))
    assert(r.map(_.getLong(4)).toSeq == Seq(1L, 2L, 3L))
    // half-open intervals chain: each valid_to = next valid_from
    assert(r(0).getTimestamp(3) == r(1).getTimestamp(2))
    assert(r(1).getTimestamp(3) == r(2).getTimestamp(2))
  }

  test("only the last run is current; its valid_to is null") {
    val l = log(Seq((1L, "x", 0L, 0L), (1L, "y", 5L, 1L)))
    val r = Scd2.build(l, "key", "state", "ts", "seq")
      .orderBy(col("version")).collect()
    assert(!r(0).getBoolean(5) && r(0).getTimestamp(3) != null)
    assert(r(1).getBoolean(5) && r(1).isNullAt(3))
  }

  test("keys version independently") {
    val l = log(Seq(
      (1L, "a", 0L, 0L), (1L, "b", 10L, 1L),
      (2L, "a", 5L, 2L)))
    val r = Scd2.build(l, "key", "state", "ts", "seq")
    assert(r.filter(col("key") === 1L).count() == 2L)
    val k2 = r.filter(col("key") === 2L).collect().head
    assert(k2.getLong(4) == 1L && k2.getBoolean(5))
  }

  test("equal timestamps order by the tie column") {
    // same ts: seq decides which state wins the run boundary
    val l = log(Seq((1L, "a", 0L, 0L), (1L, "b", 0L, 1L), (1L, "a", 0L, 2L)))
    val r = Scd2.build(l, "key", "state", "ts", "seq")
      .orderBy(col("version")).collect()
    assert(r.map(_.getString(1)).toSeq == Seq("a", "b", "a"))
  }
}
