package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** STL-lite weekday seasonality: detrend daily counts with a centered
  * 7-day moving average, then average the detrended deviation per
  * weekday — "is Monday reliably above its surrounding week" with the
  * trend removed, the decomposition behind capacity dashboards and the
  * q160 hour-of-day profile's weekly sibling.
  *
  * Numeric discipline: the deviation is kept INTEGER — `7·x − Σ₇x` —
  * so every aggregate is an exact int64 sum and the single float
  * division happens once at the output edge (the q186/q79 sufficient-
  * statistics rule; averaging float residuals would inherit sum-order
  * ambiguity). The trend window is RANGE-based on the day number, so a
  * missing day yields an incomplete (<7) window that is EXCLUDED rather
  * than a silently shifted ROWS frame.
  *
  * Scale: one partial-agg to the (key, day) grid, one bounded range
  * window per key over that grid, one final rollup.
  */
object SeasonalDecompose {

  /** Per (key, weekday = epoch-day mod 7): full-window day count, mean
    * detrended deviation (`round(Σ(7x−Σ₇x) / (7·n), 4)`), and the mean
    * raw count for reference.
    */
  def weekday(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = DayGrid.of(events, keyCol, tsCol)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rangeBetween(-3, 3)
    daily
      .withColumn("s7", sum(col("x")).over(w))
      .withColumn("n7", count(lit(1)).over(w))
      .withColumn("dev", lit(7L) * col("x") - col("s7"))
      .filter(col("n7") === 7)
      .groupBy(col(keyCol), (col("day") % 7).as("dow"))
      .agg(count(lit(1)).as("n_days"),
        round(sum(col("dev")).cast("double") / (lit(7.0) * count(lit(1))), 4)
          .as("seasonal_dev"),
        round(sum(col("x")).cast("double") / count(lit(1)), 4).as("mean_x"))
  }
}
