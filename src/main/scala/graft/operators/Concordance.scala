package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-concordance across matched raters/blocks: Kendall's W (1939) —
  * "do the m quality metrics agree on how they order the n corpus
  * slices" — and Friedman's χ² (1937), the within-block rank test that
  * [[PageTrend]] sharpens when the alternative is ordered and that
  * [[Agreement.cochranQ]] reduces to for binary outcomes.
  *
  * Float discipline: midranks come from integer cumsums on per-rater
  * (or per-subject) distinct-value grids, so every rank is an exact
  * ½-multiple, every rank sum is exact in double, and the squared rank
  * sums are exact ¼-multiples — the cross-group sums are order-FREE
  * (no ordered-window fold needed), which is what makes both statistics
  * safe as plain partial aggs at any scale.
  */
object Concordance {

  /** Kendall's W with the tie correction: W = 12·(ΣR² − (ΣR)²/n) /
    * (m²(n³−n) − m·ΣT). One row: `m` (raters), `n` (items), `w`,
    * `chi2` = m(n−1)·W (both 6 dp). Input: one row per (rater, item)
    * with an integer value; every rater covers every item.
    */
  def kendallW(df: DataFrame, raterCol: String, itemCol: String,
               valCol: String): DataFrame = {
    val d = df.select(col(raterCol).as("rater"), col(itemCol).as("item"),
      col(valCol).cast("long").as("v"))
    val cells = d.groupBy(col("rater"), col("v")).agg(count(lit(1)).as("t"))
    val gw = Window.partitionBy(col("rater")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranks = cells.withColumn("cum", sum(col("t")).over(gw))
      .select(col("rater"), col("v"),
        ((col("cum") - col("t")).cast("double")
          + (col("t") + 1).cast("double") / 2.0).as("r"))
    val perItem = d.join(ranks, Seq("rater", "v"))
      .groupBy(col("item")).agg(sum(col("r")).as("ri"), count(lit(1)).as("m"))
    val ties = cells.agg(
      sum(col("t") * col("t") * col("t") - col("t")).as("tsum"))
    val sums = perItem.agg(count(lit(1)).as("n"), max(col("m")).as("m"),
      sum(col("ri") * col("ri")).as("srr"), sum(col("ri")).as("sr"))
    val den = col("m").cast("double") * col("m") *
      (col("n") * col("n") * col("n") - col("n")) - col("m") * col("tsum")
    val wRaw = lit(12.0) * (col("srr") - col("sr") * col("sr") / col("n")) / den
    sums.crossJoin(broadcast(ties))
      .select(col("m"), col("n"),
        when(col("n") > 1 && den > 0, round(wRaw, 6)).as("w"),
        when(col("n") > 1 && den > 0,
          round(col("m") * (col("n") - 1) * wRaw, 6)).as("chi2"))
  }

  /** Friedman's χ² with the tie correction (the kruskalWallis pattern):
    * one row `n` (subjects), `k` (conditions), `chi2_f`, `chi2_f_tie`
    * (6 dp). Input: the DENSE subject×condition grid with an integer
    * value per cell.
    */
  def friedman(df: DataFrame, subjCol: String, condCol: String,
               valCol: String): DataFrame = {
    val d = df.select(col(subjCol).as("u"), col(condCol).as("c"),
      col(valCol).cast("long").as("v"))
    val cells = d.groupBy(col("u"), col("v")).agg(count(lit(1)).as("t"))
    val gw = Window.partitionBy(col("u")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranks = cells.withColumn("cum", sum(col("t")).over(gw))
      .select(col("u"), col("v"),
        ((col("cum") - col("t")).cast("double")
          + (col("t") + 1).cast("double") / 2.0).as("r"))
    val perCond = d.join(ranks, Seq("u", "v"))
      .groupBy(col("c")).agg(sum(col("r")).as("rj"), count(lit(1)).as("n"))
    val ties = cells.agg(
      sum(col("t") * col("t") * col("t") - col("t")).as("tsum"))
    val sums = perCond.agg(count(lit(1)).as("k"), max(col("n")).as("n"),
      sum(col("rj") * col("rj")).as("srr"))
    val chiRaw = lit(12.0) / (col("n") * col("k") * (col("k") + 1)) * col("srr") -
      lit(3.0) * col("n") * (col("k") + 1)
    val tieFactor = lit(1.0) - col("tsum").cast("double") /
      (col("n") * col("k") * (col("k") * col("k") * col("k") - col("k")))
    sums.crossJoin(broadcast(ties))
      .select(col("n"), col("k"),
        round(chiRaw, 6).as("chi2_f"),
        when(tieFactor > 0, round(chiRaw / tieFactor, 6)).as("chi2_f_tie"))
  }
}
