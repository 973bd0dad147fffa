package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  private def eventsAt(rows: Seq[(String, Long, Int)]) =
    rows.flatMap { case (k, day, n) => (1 to n).map(_ => (k, day)) }
      .toDF("k", "day")
      .select(col("k"), timestamp_micros(col("day") * 86400000000L).as("ts"))

  test("theil-sen: exact slope on a clean linear series") {
    // x = 2*day + 3: every pairwise slope is exactly 2
    val rows = (0L until 10L).map(d => ("a", d, (2 * d + 3).toInt))
    val r = RobustStats.theilSen(eventsAt(rows), "k", "ts").collect().head
    assert(r.getAs[Long]("n_pairs") == 45L)
    assert(r.getAs[Double]("slope_ts") == 2.0)
  }

  test("theil-sen shrugs off outliers that wreck the OLS slope") {
    // linear with slope 1, but two wild spikes
    val rows = (0L until 15L).map(d =>
      ("a", d, if (d == 5 || d == 9) 500 else (d + 10).toInt))
    val r = RobustStats.theilSen(eventsAt(rows), "k", "ts").collect().head
    val ts = r.getAs[Double]("slope_ts")
    assert(ts > 0.5 && ts < 2.0, s"robust slope $ts should stay near 1")
  }

  test("cusum: the changepoint lands on the level shift") {
    // 5/day for 10 days, then 20/day for 10 days: |D| peaks at the shift
    val rows = (0L until 20L).map(d => ("a", d, if (d < 10) 5 else 20))
    val r = RobustStats.cusumChangepoint(eventsAt(rows), "k", "ts").collect().head
    assert(r.getAs[Long]("cp_day") == 9L, s"cp at ${r.getAs[Long]("cp_day")}")
    assert(r.getAs[Long]("n_days") == 20L)
    // peak magnitude: at k=10, |20*50 - 10*250| = 1500
    assert(r.getAs[Long]("cusum_peak") == 1500L)
  }

  test("cusum: a flat series peaks at zero deviation") {
    val rows = (0L until 12L).map(d => ("a", d, 4))
    val r = RobustStats.cusumChangepoint(eventsAt(rows), "k", "ts").collect().head
    assert(r.getAs[Long]("cusum_peak") == 0L)
    assert(r.getAs[Double]("peak_share") == 0.0)
    // earliest-day tie-break
    assert(r.getAs[Long]("cp_day") == 0L)
  }
}
