package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multiple-testing machinery for per-slice audits: a family of
  * two-proportion z-tests (one per corpus slice vs the rest) corrected
  * by Benjamini-Hochberg step-up FDR (Benjamini & Hochberg 1995), plus
  * the Cochran-Armitage trend test for ORDERED doses (Cochran 1954,
  * Armitage 1955).
  *
  * Cross-engine float rules (the SPRT/q212 discipline): z comes from
  * integer sufficient statistics; the normal tail probability uses the
  * Abramowitz-Stegun 7.1.26 polynomial with its published constants as
  * DECIMAL LITERALS so both engines evaluate the identical expression
  * shape; p is rounded to 6dp BEFORE the BH comparison so selection
  * happens on a value both engines agree on.
  */
object MultipleTesting {

  /** Upper-tail P(Z > z) for z ≥ 0 — Abramowitz-Stegun 7.1.26 (|ε| <
    * 7.5e-8, far under the 6dp rounding edge). The same formula is
    * rendered verbatim in the DuckDB oracles.
    */
  def normalSf(z: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * z)
    val poly = t * (lit(0.319381530)
      + t * (lit(-0.356563782)
        + t * (lit(1.781477937)
          + t * (lit(-1.821255978) + t * lit(1.330274429)))))
    exp(-z * z / lit(2.0)) / lit(2.5066282746310002) * poly
  }

  /** Per-group two-proportion z (group vs REST of corpus) with two-sided
    * A-S p-values, BH step-up selection at level `alpha` over the m
    * groups. Input: one row per item with a group column and a 0/1 hit
    * column. One partial agg to the m-row family; everything after runs
    * on the bounded grid (a window over m rows + one max).
    */
  def bhFdr(df: DataFrame, grpCol: String, hitCol: String,
            alpha: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.groupBy(col(grpCol))
      .agg(count(lit(1)).as("n"), sum(col(hitCol)).cast("long").as("k"))
    val tot = g.agg(sum(col("n")).as("nn"), sum(col("k")).as("kk"))
    val z = g.crossJoin(broadcast(tot))
      .withColumn("n_rest", col("nn") - col("n"))
      .withColumn("k_rest", col("kk") - col("k"))
      .withColumn("_pp", col("kk").cast("double") / col("nn"))
      .withColumn("z",
        when(col("_pp") > 0 && col("_pp") < 1 && col("n_rest") > 0,
          (col("k").cast("double") / col("n")
            - col("k_rest").cast("double") / col("n_rest"))
            / sqrt(col("_pp") * (lit(1.0) - col("_pp"))
              * (lit(1.0) / col("n") + lit(1.0) / col("n_rest")))))
      // two-sided p, ROUNDED before any comparison (ladder rule). A
      // degenerate group (pooled rate 0/1 or n_rest=0) has NULL z —
      // coalesce its p to 1.0 so it ranks LAST deterministically on both
      // engines (Spark sorts NULLs first, DuckDB last) and is never
      // rejected, instead of silently shifting real ranks (ADVICE r10).
      .withColumn("p",
        coalesce(round(lit(2.0) * normalSf(abs(col("z"))), 6), lit(1.0)))
    val m = Window.orderBy(col("p"), col(grpCol)) // total order: ties by name
    val ranked = z.withColumn("i", row_number().over(m).cast("long"))
      .withColumn("m", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("bh_cut", round(col("i") * lit(alpha) / col("m"), 6))
      .withColumn("under", col("p") <= col("bh_cut"))
    val kmax = ranked.agg(max(when(col("under"), col("i"))).as("kmax"))
    ranked.crossJoin(broadcast(kmax))
      .select(col(grpCol), col("n"), col("k"), round(col("z"), 4).as("z"),
        col("p"), col("i").as("p_rank"), col("bh_cut"),
        (col("kmax").isNotNull && col("i") <= col("kmax")).as("rejected"))
  }

  /** Benjamini-Yekutieli step-up over the same per-group z family as
    * [[bhFdr]] — FDR control under ARBITRARY dependence (Benjamini &
    * Yekutieli 2001): the BH cut shrinks by the harmonic factor
    * c(m) = Σ_{j≤m} 1/j. The harmonic sum accumulates on the ordered
    * rank window (total order — deterministic float fold on both
    * engines), and selection compares 6dp-rounded values.
    */
  def byFdr(df: DataFrame, grpCol: String, hitCol: String,
            alpha: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.groupBy(col(grpCol))
      .agg(count(lit(1)).as("n"), sum(col(hitCol)).cast("long").as("k"))
    val tot = g.agg(sum(col("n")).as("nn"), sum(col("k")).as("kk"))
    val z = g.crossJoin(broadcast(tot))
      .withColumn("n_rest", col("nn") - col("n"))
      .withColumn("k_rest", col("kk") - col("k"))
      .withColumn("_pp", col("kk").cast("double") / col("nn"))
      .withColumn("z",
        when(col("_pp") > 0 && col("_pp") < 1 && col("n_rest") > 0,
          (col("k").cast("double") / col("n")
            - col("k_rest").cast("double") / col("n_rest"))
            / sqrt(col("_pp") * (lit(1.0) - col("_pp"))
              * (lit(1.0) / col("n") + lit(1.0) / col("n_rest")))))
      .withColumn("p",
        coalesce(round(lit(2.0) * normalSf(abs(col("z"))), 6), lit(1.0)))
    val m = Window.orderBy(col("p"), col(grpCol))
    val hw = Window.orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allW = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = z.withColumn("i", row_number().over(m).cast("long"))
      .withColumn("m", count(lit(1)).over(allW))
      .withColumn("h_i", sum(lit(1.0) / col("i")).over(hw))
      .withColumn("c_m", max(col("h_i")).over(allW)) // H_m: max of an increasing cumsum
      .withColumn("by_cut", round(col("i") * lit(alpha) / (col("m") * col("c_m")), 6))
      .withColumn("under", col("p") <= col("by_cut"))
    val kmax = ranked.agg(max(when(col("under"), col("i"))).as("kmax"))
    ranked.crossJoin(broadcast(kmax))
      .select(col(grpCol), col("n"), col("k"), round(col("z"), 4).as("z"),
        col("p"), col("i").as("p_rank"), round(col("c_m"), 6).as("c_m"),
        col("by_cut"),
        (col("kmax").isNotNull && col("i") <= col("kmax")).as("rejected"))
  }

  /** Φ(t) from the same A-S tail, valid for either sign. */
  def normalCdf(t: Column): Column =
    when(t >= 0, lit(1.0) - normalSf(t)).otherwise(normalSf(-t))

  /** Post-hoc power + minimum detectable effect for a two-proportion
    * test at two-sided α=0.05 and 80% target power: power ≈
    * Φ(d−z₀.₉₇₅) + Φ(−d−z₀.₉₇₅) with d = |p̂₁−p̂₂|/se (unpooled se), and
    * MDE₈₀ = (z₀.₉₇₅+z₀.₈)·se — the "was this A/B even able to see the
    * effect we care about" sizing check. One partial agg to four
    * integers; z quantiles are shared decimal literals; the tail reuses
    * [[normalSf]] so both engines evaluate the identical shape.
    */
  def twoPropPower(df: DataFrame, grpCol: String, hitCol: String): DataFrame = {
    val g = df.agg(
      sum(when(col(grpCol) === 0, 1L).otherwise(0L)).as("n1"),
      sum(when(col(grpCol) === 0 && col(hitCol) === 1, 1L).otherwise(0L)).as("k1"),
      sum(when(col(grpCol) =!= 0, 1L).otherwise(0L)).as("n2"),
      sum(when(col(grpCol) =!= 0 && col(hitCol) === 1, 1L).otherwise(0L)).as("k2"))
    val p1 = col("k1").cast("double") / col("n1")
    val p2 = col("k2").cast("double") / col("n2")
    val se = sqrt(p1 * (lit(1.0) - p1) / col("n1")
      + p2 * (lit(1.0) - p2) / col("n2"))
    val z975 = lit(1.959963984540054)
    val z80 = lit(0.8416212335729143)
    val d = abs(p1 - p2) / se
    // se=0 (all-0 / all-1 / empty group) would make d NaN — surface NULL
    // like the guarded sibling operators, not NaN (ADVICE r10)
    g.select(col("n1"), col("k1"), col("n2"), col("k2"),
      round(p1, 6).as("p1"), round(p2, 6).as("p2"),
      round(se, 6).as("se"),
      when(se > 0,
        round(normalCdf(d - z975) + normalCdf(-d - z975), 6)).as("power"),
      when(se > 0, round((z975 + z80) * se, 6)).as("mde80"))
  }

  /** One-sided upper-tail p for a SIGNED z: P(Z > z) = normalSf(z) for
    * z ≥ 0 and 1 − normalSf(−z) below.
    */
  def normalSfSigned(z: Column): Column =
    when(z >= 0, normalSf(z)).otherwise(lit(1.0) - normalSf(-z))

  /** TOST equivalence test (Schuirmann 1987) on a two-proportion A/B
    * with margin ±`margin`: both one-sided tests must reject, so
    * p_tost = max(P(Z > (d+margin)/se rejected low), P(Z > (margin−d)/se
    * rejected high)). Equivalence is claimed when the ROUNDED p_tost ≤ α
    * (round-before-compare). Same four integers as [[twoPropPower]].
    */
  def tostEquivalence(df: DataFrame, grpCol: String, hitCol: String,
                      margin: Double, alpha: Double): DataFrame = {
    val g = df.agg(
      sum(when(col(grpCol) === 0, 1L).otherwise(0L)).as("n1"),
      sum(when(col(grpCol) === 0 && col(hitCol) === 1, 1L).otherwise(0L)).as("k1"),
      sum(when(col(grpCol) =!= 0, 1L).otherwise(0L)).as("n2"),
      sum(when(col(grpCol) =!= 0 && col(hitCol) === 1, 1L).otherwise(0L)).as("k2"))
    val p1 = col("k1").cast("double") / col("n1")
    val p2 = col("k2").cast("double") / col("n2")
    val d = p1 - p2
    val se = sqrt(p1 * (lit(1.0) - p1) / col("n1")
      + p2 * (lit(1.0) - p2) / col("n2"))
    val pLow = normalSfSigned((d + lit(margin)) / se)   // H0: d <= -margin
    val pHigh = normalSfSigned((lit(margin) - d) / se)  // H0: d >= +margin
    // se=0 → z undefined: NULL p_tost / equivalent, not NaN (ADVICE r10)
    val pTost = when(se > 0, round(greatest(pLow, pHigh), 6))
    g.select(col("n1"), col("k1"), col("n2"), col("k2"),
      round(d, 6).as("d"), round(se, 6).as("se"),
      pTost.as("p_tost"), (pTost <= alpha).as("equivalent"))
  }

  /** Holm-Bonferroni step-down over the same per-group z family as
    * [[bhFdr]]: reject while p_(i) ≤ α/(m−i+1), stop at the first
    * failure. Selection happens on 6dp-rounded values on both sides.
    */
  def holm(df: DataFrame, grpCol: String, hitCol: String,
           alpha: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.groupBy(col(grpCol))
      .agg(count(lit(1)).as("n"), sum(col(hitCol)).cast("long").as("k"))
    val tot = g.agg(sum(col("n")).as("nn"), sum(col("k")).as("kk"))
    val z = g.crossJoin(broadcast(tot))
      .withColumn("n_rest", col("nn") - col("n"))
      .withColumn("k_rest", col("kk") - col("k"))
      .withColumn("_pp", col("kk").cast("double") / col("nn"))
      .withColumn("z",
        when(col("_pp") > 0 && col("_pp") < 1 && col("n_rest") > 0,
          (col("k").cast("double") / col("n")
            - col("k_rest").cast("double") / col("n_rest"))
            / sqrt(col("_pp") * (lit(1.0) - col("_pp"))
              * (lit(1.0) / col("n") + lit(1.0) / col("n_rest")))))
      // degenerate group → p = 1.0, ranks last, never rejected (see bhFdr)
      .withColumn("p",
        coalesce(round(lit(2.0) * normalSf(abs(col("z"))), 6), lit(1.0)))
    val m = Window.orderBy(col("p"), col(grpCol))
    val ranked = z.withColumn("i", row_number().over(m).cast("long"))
      .withColumn("m", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("holm_cut", round(lit(alpha) / (col("m") - col("i") + 1), 6))
      .withColumn("under", col("p") <= col("holm_cut"))
    val firstFail = ranked.agg(min(when(!col("under"), col("i"))).as("kfail"))
    ranked.crossJoin(broadcast(firstFail))
      .select(col(grpCol), col("n"), col("k"), round(col("z"), 4).as("z"),
        col("p"), col("i").as("p_rank"), col("holm_cut"),
        (col("kfail").isNull || col("i") < col("kfail")).as("rejected"))
  }

  /** Cochran-Armitage trend test across ordered dose levels 0..D with
    * integer weights w_i = i: z = Σw_i(k_i − n_i·p̄) /
    * sqrt(p̄(1−p̄)(Σw_i²n_i − (Σw_i n_i)²/N)). All sufficient statistics
    * are integers from ONE partial agg; the statistic is closed-form at
    * the edge.
    */
  def cochranArmitage(df: DataFrame, doseCol: String, hitCol: String): DataFrame = {
    val g = df.select(col(doseCol).cast("long").as("d"),
        col(hitCol).cast("long").as("h"))
      .groupBy(col("d")).agg(count(lit(1)).as("n"), sum(col("h")).as("k"))
    g.agg(sum(col("n")).as("nn"), sum(col("k")).as("kk"),
        sum(col("d") * col("k")).as("swk"),
        sum(col("d") * col("n")).as("swn"),
        sum(col("d") * col("d") * col("n")).as("swwn"),
        count(lit(1)).as("levels"))
      .select(col("nn").as("n"), col("kk").as("k"), col("levels"),
        round(col("kk").cast("double") / col("nn"), 6).as("pbar"),
        round((col("swk").cast("double")
          - col("swn").cast("double") * col("kk") / col("nn"))
          / sqrt((col("kk").cast("double") / col("nn"))
            * (lit(1.0) - col("kk").cast("double") / col("nn"))
            * (col("swwn").cast("double")
              - col("swn").cast("double") * col("swn") / col("nn"))), 4)
          .as("z_trend"))
  }
}
