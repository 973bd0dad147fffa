package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EwmaSpec extends SparkSpec {
  import spark.implicits._

  private def eventsAt(rows: Seq[(String, Long)]) =
    rows.toDF("k", "day")
      .select(col("k"), timestamp_micros(col("day") * 86400000000L).as("ts"))

  test("constant daily rate: ewma equals the rate exactly") {
    // 3 events/day for 5 days
    val rows = for (d <- 0L until 5L; _ <- 1 to 3) yield ("a", d)
    val r = Ewma.dailyCounts(eventsAt(rows), "k", "ts").collect().head
    assert(r.getAs[Long]("m") == 5L)
    assert(r.getAs[Double]("ewma") == 3.0)
    assert(r.getAs[Double]("mean_x") == 3.0)
  }

  test("recency weighting: a final-day spike moves ewma above the mean") {
    // 1/day for 4 days then 9 on day 5:
    // ewma = 9*(1/2) + 1*(1/4+1/8+1/16) + 1*(1/16 seed) = 5.0
    val rows = (for (d <- 0L until 4L) yield ("a", d)) ++
      (1 to 9).map(_ => ("a", 4L))
    val r = Ewma.dailyCounts(eventsAt(rows), "k", "ts").collect().head
    assert(r.getAs[Double]("ewma") == 5.0)
    assert(r.getAs[Double]("mean_x") == 2.6)
    assert(r.getAs[Long]("last_day") == 4L)
  }

  test("window cap: only the most recent `window` days contribute") {
    // 50 days of 1/day, then a day of 7: with window=3 only days 48,49,50
    // matter -> ewma = 7/2 + 1/4 + 1/4 (seed) = 4.0
    val rows = (for (d <- 0L until 50L) yield ("a", d)) ++
      (1 to 7).map(_ => ("a", 50L))
    val r = Ewma.dailyCounts(eventsAt(rows), "k", "ts", window = 3)
      .collect().head
    assert(r.getAs[Long]("m") == 3L)
    assert(r.getAs[Double]("ewma") == 4.0)
  }

  test("keys are independent") {
    val rows = Seq(("a", 0L), ("a", 1L), ("b", 5L))
    val out = Ewma.dailyCounts(eventsAt(rows), "k", "ts")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("ewma")).toMap
    assert(out("a") == 1.0 && out("b") == 1.0)
  }
}
