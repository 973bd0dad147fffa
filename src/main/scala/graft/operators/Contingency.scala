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

  /** Mantel-Haenszel pooled odds ratio across 2×2 strata (Mantel &
    * Haenszel 1959) — the stratified companion to the q256 Simpson audit:
    * the common treatment/outcome association AFTER conditioning on the
    * confounder. Input: one row per item with a stratum, a 0/1 exposure
    * and a 0/1 outcome. Cells are integers from ONE partial agg; the
    * a·d/n and b·c/n terms are doubles, so they accumulate on the
    * single-partition ordered stratum window (bounded grid — the same
    * total-order fold as KSample). Output: one row per stratum with its
    * own OR plus the pooled `or_mh` broadcast onto every row.
    */
  def mantelHaenszel(df: DataFrame, stratumCol: String, exposureCol: String,
                     outcomeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.select(col(stratumCol).cast("long").as("stratum"),
        col(exposureCol).cast("long").as("x"), col(outcomeCol).cast("long").as("y"))
      .groupBy(col("stratum")).agg(
        sum(when(col("x") === 1 && col("y") === 1, 1L).otherwise(0L)).as("a"),
        sum(when(col("x") === 1 && col("y") === 0, 1L).otherwise(0L)).as("b"),
        sum(when(col("x") === 0 && col("y") === 1, 1L).otherwise(0L)).as("c"),
        sum(when(col("x") === 0 && col("y") === 0, 1L).otherwise(0L)).as("d"))
    val w = Window.orderBy(col("stratum"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val acc = cells
      .withColumn("nt", col("a") + col("b") + col("c") + col("d"))
      .withColumn("num", sum(col("a").cast("double") * col("d") / col("nt")).over(w))
      .withColumn("den", sum(col("b").cast("double") * col("c") / col("nt")).over(w))
    val pooled = acc.orderBy(col("stratum").desc).limit(1)
      .select(when(col("den") > 0, round(col("num") / col("den"), 6)).as("or_mh"))
    acc.crossJoin(broadcast(pooled))
      .select(col("stratum"), col("a"), col("b"), col("c"), col("d"),
        when(col("b") * col("c") > 0,
          round(col("a").cast("double") * col("d")
            / (col("b").cast("double") * col("c")), 6)).as("or_stratum"),
        col("or_mh"))
      .orderBy(col("stratum"))
  }

  /** Fisher's exact test on a 2×2 table (two-sided, the R convention:
    * sum the probabilities of all tables as or more extreme than the
    * observed one). Input: one row per item with 0/1 `rowCol` / `colCol`.
    *
    * The hypergeometric weights are built WITHOUT factorials: on the
    * bounded support grid a ∈ [max(0, r1+c1−n), min(r1, c1)], the
    * log-weight w(a) accumulates the step ratio
    * ln((r1−a+1)(c1−a+1)) − ln(a(n−r1−c1+a)) as an ordered-window cumsum
    * (total order → the float fold is deterministic on both engines),
    * is centred on max(w) so exp never overflows, and the tail mass /
    * normalizer fold on the same ordered grid. The grid is bounded by
    * the SMALLER table margin — which is exactly the regime where Fisher
    * is called for (small expected cells; use [[chiSquare]] otherwise).
    */
  def fisherExact(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tot = df.select(col(rowCol).cast("long").as("x"),
        col(colCol).cast("long").as("y"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("r1"),
        sum(col("y")).as("c1"),
        sum(col("x") * col("y")).as("a_obs"))
      .withColumn("lo", greatest(lit(0L), col("r1") + col("c1") - col("n")))
      .withColumn("hi", least(col("r1"), col("c1")))
      // bounded-grid contract, in-plan (tot is one row, so the guard adds
      // no extra pass): a support width beyond MaxGrid means the margins
      // are far outside the small-expected-cell regime Fisher exists for
      .withColumn("hi", when(
        col("hi") - col("lo") < lit(graft.core.GridGuard.MaxGrid),
        col("hi")).otherwise(raise_error(concat(
          lit("graft.operators.Contingency.fisherExact: hypergeometric "
            + "support grid width "),
          (col("hi") - col("lo") + 1).cast("string"),
          lit(" exceeds the bounded-grid contract ("
            + graft.core.GridGuard.MaxGrid
            + "); the margins are large enough that chiSquare is the "
            + "right test"))).cast("long")))
    val grid = tot.select(col("n"), col("r1"), col("c1"), col("a_obs"),
        col("lo"), explode(sequence(col("lo"), col("hi"))).as("a"))
    val w = Window.orderBy(col("a"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lw = grid.withColumn("lw", sum(
      when(col("a") === col("lo"), lit(0.0))
        .otherwise(log(((col("r1") - col("a") + 1)
            * (col("c1") - col("a") + 1)).cast("double"))
          - log((col("a") * (col("n") - col("r1") - col("c1") + col("a")))
            .cast("double")))).over(w))
    val center = lw.agg(max(col("lw")).as("m"),
      max(when(col("a") === col("a_obs"), col("lw"))).as("w_obs"))
    val acc = lw.crossJoin(broadcast(center))
      .withColumn("s_all", sum(exp(col("lw") - col("m"))).over(w))
      .withColumn("s_tail", sum(
        when(col("lw") <= col("w_obs") + 1e-7, exp(col("lw") - col("m")))
          .otherwise(lit(0.0))).over(w))
    acc.orderBy(col("a").desc).limit(1)
      .select(col("n"), col("r1"), col("c1"), col("a_obs").as("a"),
        round(col("s_tail") / col("s_all"), 6).as("p_two_sided"),
        // sample odds ratio; a zero off-diagonal cell → NULL, not ±inf
        when((col("r1") - col("a_obs")) * (col("c1") - col("a_obs")) > 0,
          round(col("a_obs").cast("double")
              * (col("n") - col("r1") - col("c1") + col("a_obs"))
            / ((col("r1") - col("a_obs")).cast("double")
              * (col("c1") - col("a_obs"))), 6)).as("odds_ratio"))
  }

  /** VanderWeele-Ding E-value (2017) for an observed risk ratio — "how
    * strong would an unmeasured confounder have to be to explain this
    * association away": E = RR* + √(RR*(RR*−1)) with RR* the
    * away-from-null direction, plus the same for the CI bound closer to
    * the null (1.0 when the CI crosses it). The sensitivity-analysis
    * companion to the Mantel-Haenszel adjustment (q269) and the Simpson
    * audit (q256). All cells are exact integers; RR, the log-RR SE and
    * both E's are closed-form floats at the edge.
    */
  def eValue(df: DataFrame, exposureCol: String, outcomeCol: String): DataFrame = {
    val tot = df.select(col(exposureCol).cast("long").as("x"),
        col(outcomeCol).cast("long").as("y"))
      .agg(
        sum(when(col("x") === 1, col("y")).otherwise(0L)).as("a"),
        sum(when(col("x") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("x") === 0, col("y")).otherwise(0L)).as("c"),
        sum(when(col("x") === 0, 1L).otherwise(0L)).as("n0"))
    val rr = col("a").cast("double") * col("n0") /
      (col("c").cast("double") * col("n1"))
    val se = sqrt(lit(1.0) / col("a") - lit(1.0) / col("n1")
      + lit(1.0) / col("c") - lit(1.0) / col("n0"))
    val rrLo = exp(log(rr) - lit(1.959964) * se)
    val rrHi = exp(log(rr) + lit(1.959964) * se)
    // away-from-null direction; the CI bound CLOSER to the null
    val rrStar = when(rr >= 1, rr).otherwise(lit(1.0) / rr)
    val bound = when(rr >= 1, rrLo).otherwise(lit(1.0) / rrHi)
    val ok = col("a") > 0 && col("c") > 0 && col("n1") > col("a") &&
      col("n0") > col("c")
    tot.select(col("a"), col("n1"), col("c"), col("n0"),
      when(ok, round(rr, 6)).as("rr"),
      when(ok, round(rrLo, 6)).as("rr_lo"),
      when(ok, round(rrHi, 6)).as("rr_hi"),
      when(ok, round(rrStar + sqrt(rrStar * (rrStar - 1)), 6)).as("e_value"),
      when(ok, when(bound > 1,
          round(bound + sqrt(bound * (bound - 1)), 6))
        .otherwise(lit(1.0))).as("e_value_ci"))
  }
}
