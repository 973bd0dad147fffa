package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust location panel per slice: the trimmed mean (drop the k
  * smallest and k largest) and the winsorized mean (clamp them to the
  * cut values) — the outlier-resistant location reads that complete the
  * robust family (Theil-Sen slope q198, MAD q159, median tests q284):
  * "what's the typical doc length once the tails stop lying".
  *
  * Scale shape: everything reduces to the per-slice distinct-value grid
  * (t, cum integer cumsums). The trimmed core is an exact integer
  * overlap sum — each grid row contributes v · |[rank-block] ∩ [core]|
  * — and the cut values are conditional-min lookups on the same grid.
  * No sort of raw rows, no per-row window; integers until the final
  * divisions.
  */
object RobustLocation {

  /** One row per group: `n`, `k_trim`, `mean_raw`, `trimmed_mean`,
    * `winsorized_mean` (6 dp). `trimPct` is the per-tail percentage. */
  def panel(df: DataFrame, grpCol: String, valCol: String,
            trimPct: Int): DataFrame = {
    val d = df.select(col(grpCol).as("g"), col(valCol).cast("long").as("v"))
    val cells = d.groupBy(col("g"), col("v")).agg(count(lit(1)).as("t"))
    graft.core.GridGuard.check(cells, "RobustLocation.panel",
      s"(group, value) grid of '$grpCol' x '$valCol'")
    val gw = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = Window.partitionBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val grid = cells
      .withColumn("cum", sum(col("t")).over(gw))
      .withColumn("n", max(col("cum")).over(full))
      .withColumn("k", expr(s"n * $trimPct div 100"))
      .withColumn("lo", col("cum") - col("t") + 1)
      .withColumn("overlap", greatest(lit(0L),
        least(col("cum"), col("n") - col("k"))
          - greatest(col("lo"), col("k") + 1) + 1))
    grid.groupBy(col("g"))
      .agg(max(col("n")).as("n"), max(col("k")).as("k_trim"),
        sum(col("v") * col("t")).as("sx"),
        sum(col("v") * col("overlap")).as("core_sum"),
        min(when(col("cum") >= col("k") + 1, col("v"))).as("v_low"),
        min(when(col("cum") >= col("n") - col("k"), col("v"))).as("v_high"))
      .select(col("g").as(grpCol), col("n"), col("k_trim"),
        round(col("sx").cast("double") / col("n"), 6).as("mean_raw"),
        when(col("n") - col("k_trim") * 2 > 0,
          round(col("core_sum").cast("double")
            / (col("n") - col("k_trim") * 2), 6)).as("trimmed_mean"),
        round((col("core_sum") + col("k_trim") * col("v_low")
            + col("k_trim") * col("v_high")).cast("double") / col("n"), 6)
          .as("winsorized_mean"))
  }
}
