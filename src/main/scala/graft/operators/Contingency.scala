package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chi-square test of independence over a two-categorical contingency
  * table, with Cramér's V effect size — the categorical member of the
  * hypothesis-testing family (q190 z/t for proportions/means, q200
  * Mann-Whitney for ordinal shift): "does event mix differ by variant"
  * on a cross-tab instead of a metric.
  *
  * Shape: ONE partial-agg count to the r×c cell grid; marginals and the
  * χ² sum are aggregates over that bounded grid, never over raw rows.
  * Cell counts and marginals stay exact integers; expected counts and
  * the χ² contributions are one float formula per CELL, summed over the
  * ≤ r·c grid (bounded operand count — not a corpus-sized float sum).
  */
object Contingency {

  /** One-row report: table shape, N, χ² (4 dp), degrees of freedom, and
    * Cramér's V = sqrt(χ²/(N·min(r−1,c−1))) (4 dp). Degenerate 1×c /
    * r×1 tables yield NULL statistics rather than a divide-by-zero.
    */
  def chiSquare(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val cells = df.groupBy(col(rowCol).as("r"), col(colCol).as("c"))
      .agg(count(lit(1)).as("n"))
    val rowM = cells.groupBy(col("r")).agg(sum(col("n")).as("nr"))
    val colM = cells.groupBy(col("c")).agg(sum(col("n")).as("nc"))
    val tot = cells.agg(sum(col("n")).as("nn"),
      countDistinct(col("r")).as("nrows"),
      countDistinct(col("c")).as("ncols")) // 1 row
    // densify: a groupBy only materializes OBSERVED cells, but a
    // structural zero still contributes its full expected count to χ² —
    // dropping it halves the statistic on separated tables. The dense
    // grid is marginals × marginals (bounded r·c), not raw rows.
    val dense = rowM.crossJoin(colM)
      .join(cells, Seq("r", "c"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val scored = dense
      .crossJoin(broadcast(tot))
      .withColumn("exp",
        col("nr").cast("double") * col("nc") / col("nn"))
      .withColumn("part",
        pow(col("n") - col("exp"), 2) / col("exp"))
    scored.groupBy(col("nrows"), col("ncols"), col("nn"))
      .agg(sum(col("part")).as("chi2d"))
      .select(col("nrows"), col("ncols"), col("nn").as("n"),
        // a 1×c / r×1 table has no independence question to test —
        // NULL both statistics (a chi2 of "0.0" would read as
        // tested-and-passed)
        when(least(col("nrows"), col("ncols")) > 1,
          round(col("chi2d"), 4)).as("chi2"),
        ((col("nrows") - 1) * (col("ncols") - 1)).as("dof"),
        when(least(col("nrows"), col("ncols")) > 1,
          round(sqrt(col("chi2d") / (col("nn")
            * (least(col("nrows"), col("ncols")) - 1))), 4)).as("cramers_v"))
  }
}
