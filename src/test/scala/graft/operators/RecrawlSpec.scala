package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RecrawlSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(String, Long, Long)]) =
    rows.toDF("etype", "uid", "epoch_s")
      .withColumn("ts", timestamp_seconds(col("epoch_s")))

  test("gaps are per-key: interleaved users do not cross-contaminate") {
    // user 1 visits at 0, 100, 200 (gaps 100, 100); user 2 at 50, 350
    // (gap 300). A naive global sort would see gaps 50,50,100,150.
    val events = ev(Seq(
      ("crawl", 1L, 0L), ("crawl", 1L, 100L), ("crawl", 1L, 200L),
      ("crawl", 2L, 50L), ("crawl", 2L, 350L)))
    val r = Recrawl.schedule(events, "etype", "uid", "ts").collect().head
    assert(r.getLong(r.fieldIndex("n_keys")) == 2L)
    assert(r.getLong(r.fieldIndex("n_gaps")) == 3L)
    // (100+100+300)/3 rounded to the reported 4dp
    assert(r.getDouble(r.fieldIndex("avg_gap_s")) == 166.6667)
    assert(r.getLong(r.fieldIndex("max_gap_s")) == 300L)
  }

  test("next due = last seen + ceil(mean gap)") {
    val events = ev(Seq(("a", 1L, 0L), ("a", 1L, 3L), ("a", 1L, 10L)))
    val r = Recrawl.schedule(events, "etype", "uid", "ts").collect().head
    // gaps 3, 7 → mean 5.0 → due at 10 + 5
    assert(r.getLong(r.fieldIndex("last_seen_s")) == 10L)
    assert(r.getLong(r.fieldIndex("next_due_s")) == 15L)
  }

  test("single-event keys produce no gaps but still count as keys") {
    val events = ev(Seq(("a", 1L, 5L), ("a", 2L, 9L)))
    val r = Recrawl.schedule(events, "etype", "uid", "ts").collect().head
    assert(r.getLong(r.fieldIndex("n_keys")) == 2L)
    assert(r.getLong(r.fieldIndex("n_gaps")) == 0L)
    assert(r.isNullAt(r.fieldIndex("avg_gap_s")), "no gaps → no average")
  }

  test("entities are independent schedules") {
    val events = ev(Seq(
      ("fast", 1L, 0L), ("fast", 1L, 10L),
      ("slow", 1L, 0L), ("slow", 1L, 1000L)))
    val rows = Recrawl.schedule(events, "etype", "uid", "ts")
      .collect().map(r => r.getString(0) -> r.getDouble(r.fieldIndex("avg_gap_s"))).toMap
    assert(rows("fast") == 10.0 && rows("slow") == 1000.0)
  }
}
