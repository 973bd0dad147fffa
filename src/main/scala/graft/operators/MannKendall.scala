package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mann-Kendall trend test (Mann 1945, Kendall 1975) over an
  * integer-keyed series — the nonparametric "is this metric drifting"
  * read whose SLOPE companion is [[RobustStats.theilSen]]: S counts
  * concordant minus discordant time pairs, the tie-corrected variance
  * is closed-form, and the continuity-corrected z decides the trend.
  *
  * Scale shape: the pair join runs on the DAY grid — bounded by the
  * calendar, not the corpus (the q198 Theil-Sen precedent), so the
  * quadratic is over ≤ a-few-thousand rows at any corpus size. S and
  * the variance numerator are exact integers; z is one float division
  * at the edge.
  */
object MannKendall {

  /** One row: `n` (grid points), `s`, `var_s` (6 dp), `z` (6 dp,
    * continuity-corrected, sign-pinned), `trend` classified from the
    * ROUNDED z at α=0.05 (|z| vs the 1.959964 literal).
    */
  def test(grid: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val g = grid.select(col(keyCol).cast("long").as("day"),
      col(valCol).cast("long").as("x"))
    val s = g.as("a").join(g.as("b"), col("a.day") < col("b.day"))
      .agg(sum(when(col("b.x") > col("a.x"), 1L)
        .when(col("b.x") < col("a.x"), -1L).otherwise(0L)).as("s"))
    val ties = g.groupBy(col("x")).agg(count(lit(1)).as("t"))
      .agg(sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5)).as("tsum"),
        sum(col("t")).as("n"))
    val rep = s.crossJoin(broadcast(ties))
      .withColumn("var_num",
        col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5) - col("tsum"))
    val z = when(col("var_num") > 0 && col("s") > 0,
        round((col("s") - 1).cast("double")
          / sqrt(col("var_num").cast("double") / 18.0), 6))
      .when(col("var_num") > 0 && col("s") < 0,
        round((col("s") + 1).cast("double")
          / sqrt(col("var_num").cast("double") / 18.0), 6))
      .when(col("var_num") > 0, lit(0.0))
    rep.select(col("n"), col("s"),
      when(col("var_num") > 0,
        round(col("var_num").cast("double") / 18.0, 6)).as("var_s"),
      z.as("z"),
      when(z > 1.959964, lit("increasing"))
        .when(z < -1.959964, lit("decreasing"))
        .when(z.isNotNull, lit("no_trend")).as("trend"))
  }
}
