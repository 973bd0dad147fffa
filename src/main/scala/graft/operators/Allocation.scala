package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Neyman allocation (Neyman 1934) of a fixed labeling/review budget
  * across strata: n_h ∝ N_h·S_h — the optimal split of "how many docs
  * from each source do we hand to annotators" when strata differ in both
  * size and variability.
  *
  * Scale story: per-stratum variance comes from INTEGER sufficient
  * statistics (one partial agg); the weights are then quantized to
  * integer micro-units (⌊w·10⁶⌉) so the largest-remainder rounding runs
  * entirely in integer arithmetic — floor = B·w div Σw, remainder =
  * B·w mod Σw — deterministic across engines with no float sum over
  * strata anywhere. The stratum grid is bounded, so the windows are too.
  */
object Allocation {

  /** One row per stratum: n, the integer micro-weight, the floor
    * allocation, and the final largest-remainder allocation of `budget`.
    */
  def neyman(df: DataFrame, keyCol: String, valueCol: String,
             budget: Long): DataFrame = {
    val g = df.select(col(keyCol), col(valueCol).cast("long").as("v"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sx"),
        sum(col("v") * col("v")).as("sxx"))
    // sample sd from the integer sums; n=1 strata carry zero weight
    val sd = when(col("n") > 1,
      sqrt((col("sxx").cast("double") - col("sx").cast("double") * col("sx") / col("n"))
        / (col("n") - 1))).otherwise(lit(0.0))
    val w = g.withColumn("w_int",
      round(col("n") * sd * 1e6, 0).cast("long"))
    val tot = w.agg(sum(col("w_int")).as("w_tot"))
    // all-degenerate strata (every n=1 or zero variance) → w_tot=0: the
    // integer div/mod would throw under ANSI instead of degrading —
    // surface NULL allocations like the guarded sibling operators
    val q = w.crossJoin(broadcast(tot))
      .withColumn("floor_alloc",
        when(col("w_tot") > 0, expr(s"($budget * w_int) div w_tot")))
      .withColumn("rem",
        when(col("w_tot") > 0, expr(s"($budget * w_int) % w_tot")))
    val leftW = Window.orderBy(col("rem").desc, col(keyCol))
    val allW = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    q.withColumn("rrank", row_number().over(leftW).cast("long"))
      .withColumn("leftover", lit(budget) - sum(col("floor_alloc")).over(allW))
      .withColumn("n_alloc",
        col("floor_alloc") + when(col("rrank") <= col("leftover"), 1L).otherwise(0L))
      .select(col(keyCol), col("n"), col("w_int"), col("floor_alloc"),
        col("rem"), col("n_alloc"))
  }
}
