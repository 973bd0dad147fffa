package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust time-series statistics over per-key daily grids — the
  * outlier-tolerant complements of the exact-moment OLS trend (q111):
  * Theil-Sen slope (median of pairwise slopes — up to ~29% corrupted
  * points can't move it) and CUSUM changepoint location (where the
  * cumulative deviation from the mean peaks — the classic level-shift
  * detector).
  *
  * Scale shape: both operate on the COLLAPSED (key, day) grid — raw rows
  * reduce by one partial agg first, and every window/self-join after is
  * bounded by days-per-key, not corpus size (the q118/q159 grid
  * discipline). CUSUM stays fully integer: `D_k = n·prefix_k − k·total`
  * avoids the float mean entirely, so the argmax is exact on any engine.
  */
/** The shared per-key daily-count grid — the ONE definition of the
  * epoch-day bucketing the time-series operators (EWMA, seasonality,
  * Theil-Sen, CUSUM) all collapse onto before any window or self-join.
  */
object DayGrid {
  /** `(keyCol, day, x)` — integer epoch-day (µs div 86400000000) counts. */
  def of(events: DataFrame, keyCol: String, tsCol: String): DataFrame =
    events.groupBy(col(keyCol),
        expr(s"unix_micros(`$tsCol`) div 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
}

object RobustStats {

  private def dayGrid(events: DataFrame, keyCol: String, tsCol: String) =
    DayGrid.of(events, keyCol, tsCol)

  /** Theil-Sen estimator per key: `n_pairs` and the median pairwise
    * slope (6 dp; even pair counts average the two middle slopes, ties
    * ordered by the pair's days for a deterministic walk).
    */
  def theilSen(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val g = dayGrid(events, keyCol, tsCol)
    val pairs = g.as("a").join(g.as("b"),
        col(s"a.$keyCol") === col(s"b.$keyCol") && col("a.day") < col("b.day"))
      .select(col(s"a.$keyCol").as(keyCol),
        col("a.day").as("d1"), col("b.day").as("d2"),
        ((col("b.x") - col("a.x")).cast("double")
          / (col("b.day") - col("a.day"))).as("slope"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("slope"), col("d1"), col("d2"))
    val n = Window.partitionBy(col(keyCol))
    val ranked = pairs
      .withColumn("rn", row_number().over(w))
      .withColumn("np", count(lit(1)).over(n))
    ranked
      // explicit `div`: ANSI turns a bare long/2 into integral division
      // anyway, but the median index must never silently become a double
      .filter(col("rn") === expr("(np + 1) div 2") ||
        col("rn") === expr("(np + 2) div 2"))
      .groupBy(col(keyCol))
      .agg(max(col("np")).as("n_pairs"),
        round(avg(col("slope")), 6).as("slope_ts"))
  }

  /** CUSUM changepoint per key: the day where `|n·prefix_k − k·total|`
    * peaks (ties → earliest day), with the peak's integer magnitude and
    * its share of the maximum possible deviation (6 dp).
    */
  def cusumChangepoint(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    // internals are _rs-prefixed: a caller whose key column is literally
    // named "k"/"n"/"total" must not collide with the index columns
    val g = dayGrid(events, keyCol, tsCol)
    val byDay = Window.partitionBy(col(keyCol)).orderBy(col("day"))
    val whole = Window.partitionBy(col(keyCol))
    val scored = g
      .withColumn("_rs_k", row_number().over(byDay))
      .withColumn("_rs_prefix", sum(col("x")).over(
        byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_rs_n", count(lit(1)).over(whole))
      .withColumn("_rs_total", sum(col("x")).over(whole))
      .withColumn("_rs_absd",
        abs(col("_rs_n") * col("_rs_prefix") - col("_rs_k") * col("_rs_total")))
    val best = Window.partitionBy(col(keyCol))
      .orderBy(col("_rs_absd").desc, col("day"))
    scored
      .withColumn("_rs_rn", row_number().over(best))
      .filter(col("_rs_rn") === 1)
      .select(col(keyCol), col("_rs_n").as("n_days"), col("day").as("cp_day"),
        col("_rs_k").as("cp_index"), col("_rs_absd").as("cusum_peak"),
        round(col("_rs_absd").cast("double")
          / (col("_rs_n").cast("double") * col("_rs_total")), 6).as("peak_share"))
  }
}
