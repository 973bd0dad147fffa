package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asof: latest right at-or-before each left; no-prior -> null; ties -> max id") {
    val left = Seq((1L, 1L, 100L), (2L, 1L, 200L), (3L, 2L, 50L))
      .toDF("lid", "user", "lts")
      .select(col("lid"), col("user"), timestamp_micros(col("lts")).as("ts"))
    // user 1: rights at ts 100 (ids 7 and 8 — a tie) and 150; user 2: none before 50
    val right = Seq((7L, 1L, 100L), (8L, 1L, 100L), (9L, 1L, 150L), (10L, 2L, 60L))
      .toDF("rid", "user", "rts")
      .select(col("rid"), col("user"), timestamp_micros(col("rts")).as("ts"))
    val out = TemporalJoins.asof(left, right, "user", "ts", "ts", "rid")
      .select(col("lid"), col("asof_rid")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out(1L) == 8L) // equal-ts right included; tie -> larger rid
    assert(out(2L) == 9L) // latest of {100, 150} at ts 200
    assert(out(3L) == -1L) // user 2 has no right at ts <= 50
  }

  test("countInWindow: [t, t+w) boundaries; zero matches survive as 0") {
    val left = Seq((1L, 1L, 1000000L), (2L, 2L, 1000000L))
      .toDF("lid", "user", "lts")
      .select(col("lid"), col("user"), timestamp_micros(col("lts")).as("ts"))
    // user 1: points at start (in), start+w-1 (in), start+w (out), before start (out)
    val right = Seq((1L, 1000000L), (1L, 1999999L), (1L, 2000000L), (1L, 999999L))
      .toDF("user", "rts")
      .select(col("user"), timestamp_micros(col("rts")).as("ts"))
    val out = TemporalJoins.countInWindow(left, right, "user", "lid", "ts", "ts", 1000000L)
      .select(col("lid"), col("n_in_window")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 2L)
    assert(out(2L) == 0L)
  }

  test("countInWindow: leftId reused across keys neither merges counts nor fans out") {
    // same lid=1 under two different users — counts must stay per-(key, id, ts)
    val left = Seq((1L, 1L, 1000000L), (1L, 2L, 1000000L))
      .toDF("lid", "user", "lts")
      .select(col("lid"), col("user"), timestamp_micros(col("lts")).as("ts"))
    val right = Seq((1L, 1000000L), (1L, 1500000L), (2L, 1200000L))
      .toDF("user", "rts")
      .select(col("user"), timestamp_micros(col("rts")).as("ts"))
    val rows = TemporalJoins.countInWindow(left, right, "user", "lid", "ts", "ts", 1000000L)
      .select(col("user"), col("lid"), col("n_in_window")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.size == 2) // no fan-out on the join-back
    assert(rows((1L, 1L)) == 2L)
    assert(rows((2L, 1L)) == 1L)
  }
}
