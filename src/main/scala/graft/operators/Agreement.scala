package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Annotator/classifier agreement statistics over a labeled corpus — the
  * audits run before trusting crowd or heuristic labels in a training
  * pipeline: McNemar's paired test (are two classifiers' error rates
  * different on the SAME items?), Cohen's κ (two raters beyond chance),
  * and Fleiss' κ (n raters beyond chance).
  *
  * All three reduce to integer contingency counts from ONE partial agg
  * over the corpus; every statistic is a closed form over those integers
  * with the division at the output edge (the float-determinism ladder),
  * and McNemar's p reuses the shared Abramowitz-Stegun normal tail
  * ([[MultipleTesting.normalSf]]) with identical literal shape in SQL.
  */
object Agreement {

  /** McNemar's test WITHOUT continuity correction: χ² = (b−c)²/(b+c)
    * where b = A right & B wrong, c = A wrong & B right. Input: one row
    * per item with boolean columns aOk/bOk. Output one row:
    * n, both_ok, a_only, b_only, both_wrong, chi2, p (χ²(1) two-sided
    * via p = 2·P(Z > √χ²)). Degenerate b+c = 0 ⇒ chi2 = 0, p = 1.
    */
  def mcnemar(df: DataFrame, aOk: Column, bOk: Column): DataFrame = {
    val g = df.agg(
      count(lit(1)).as("n"),
      sum(when(aOk && bOk, 1L).otherwise(0L)).as("both_ok"),
      sum(when(aOk && !bOk, 1L).otherwise(0L)).as("a_only"),
      sum(when(!aOk && bOk, 1L).otherwise(0L)).as("b_only"),
      sum(when(!aOk && !bOk, 1L).otherwise(0L)).as("both_wrong"))
    val d = col("a_only") - col("b_only")
    val tot = col("a_only") + col("b_only")
    val chi2 = when(tot === 0, lit(0.0))
      .otherwise((d * d).cast("double") / tot)
    g.withColumn("chi2", round(chi2, 6))
      .withColumn("p", when(tot === 0, lit(1.0))
        .otherwise(round(lit(2.0) * MultipleTesting.normalSf(sqrt(chi2)), 6)))
  }

  /** Cohen's κ for two binary raters from the 2×2 confusion integers:
    * κ = 2(ad − bc) / ((a+b)(b+d) + (a+c)(c+d)) — the closed form whose
    * numerator and denominator are both INTEGER, so the only float op is
    * the final division. Output: n, a, b, c, d, po, pe, kappa.
    */
  def cohenKappa(df: DataFrame, rater1: Column, rater2: Column): DataFrame = {
    val g = df.agg(
      count(lit(1)).as("n"),
      sum(when(rater1 && rater2, 1L).otherwise(0L)).as("a"),
      sum(when(rater1 && !rater2, 1L).otherwise(0L)).as("b"),
      sum(when(!rater1 && rater2, 1L).otherwise(0L)).as("c"),
      sum(when(!rater1 && !rater2, 1L).otherwise(0L)).as("d"))
    val num = lit(2L) * (col("a") * col("d") - col("b") * col("c"))
    val den = (col("a") + col("b")) * (col("b") + col("d")) +
      (col("a") + col("c")) * (col("c") + col("d"))
    g.withColumn("po",
        round((col("a") + col("d")).cast("double") / col("n"), 6))
      .withColumn("pe", round(
        ((col("a") + col("b")) * (col("a") + col("c"))
          + (col("c") + col("d")) * (col("b") + col("d"))).cast("double")
          / (col("n") * col("n")), 6))
      .withColumn("kappa",
        when(den === 0, lit(0.0))
          .otherwise(round(num.cast("double") / den, 6)))
  }

  /** Fleiss' κ for r raters × q categories. Input: one row per (item,
    * category) with the integer count of raters who chose that category
    * (rows may omit zero cells). P̄ and P̄e come from integer sums:
    * Σᵢⱼ nᵢⱼ², Σⱼ (Σᵢ nᵢⱼ)² — one partial agg over items plus a bounded
    * per-category agg; divisions happen once at the edge.
    */
  def fleissKappa(counts: DataFrame, itemCol: String, catCol: String,
                  cntCol: String, raters: Long): DataFrame = {
    val sums = counts.agg(
      countDistinct(col(itemCol)).as("n_items"),
      sum(col(cntCol) * col(cntCol)).as("sq_sum"))
    val perCat = counts
      .groupBy(col(catCol))
      .agg(sum(col(cntCol)).as("cj"))
      .agg(sum(col("cj") * col("cj")).as("cj_sq_sum"))
    val r = lit(raters)
    sums.crossJoin(broadcast(perCat))
      .select(
        col("n_items"), r.as("raters"),
        col("sq_sum"), col("cj_sq_sum"),
        // P̄ = (Σ n_ij² − n·r) / (n·r·(r−1))
        round((col("sq_sum") - col("n_items") * r).cast("double")
          / (col("n_items") * r * (r - 1)), 6).as("p_bar"),
        // P̄e = Σ_j (c_j / (n·r))² = Σ c_j² / (n·r)²
        round(col("cj_sq_sum").cast("double")
          / ((col("n_items") * r) * (col("n_items") * r)), 6).as("pe_bar"))
      // κ from the ROUNDED P̄/P̄e so selection math is cross-engine stable
      .withColumn("kappa",
        when(col("pe_bar") === 1.0, lit(0.0))
          .otherwise(round((col("p_bar") - col("pe_bar"))
            / (lit(1.0) - col("pe_bar")), 6)))
  }

  /** Krippendorff's α (nominal metric) — the agreement coefficient that
    * handles VARIABLE raters per item, which [[fleissKappa]] cannot
    * (its r is fixed): the right tool once some annotators abstain.
    * Input: per (item, category) rater counts, zero cells omitted.
    *
    * α = 1 − D_o/D_e with D_o/D_e the observed/expected disagreement.
    * Items with m_i < 2 raters are unpairable and drop out. The only
    * division-before-the-edge, Σᵢ n_ic(m_i−n_ic)/(m_i−1), is regrouped
    * BY RATER COUNT m: the inner sums are exact integers and the outer
    * Σ_m S_m/(m−1) folds on the ordered bounded distinct-m grid — so
    * no corpus-sized float sum exists at any scale. D_e's numerator
    * Σ_c n_c(n_tot−n_c) is pure integer over the bounded category grid.
    */
  def krippendorffAlpha(counts: DataFrame, itemCol: String, catCol: String,
                        cntCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = counts.groupBy(col(itemCol).as("item"))
      .agg(sum(col(cntCol)).as("m_i"))
      .filter(col("m_i") >= 2)
    val pairable = counts.select(col(itemCol).as("item"),
        col(catCol).as("cat"), col(cntCol).cast("long").as("cnt"))
      .join(m, Seq("item"))
    // Σᵢ Σ_c n_ic(m_i − n_ic), grouped by the (bounded) rater count m_i
    val perM = pairable.groupBy(col("m_i"))
      .agg(sum(col("cnt") * (col("m_i") - col("cnt"))).as("s_m"))
    val w = Window.orderBy(col("m_i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val doNum = perM
      .withColumn("acc", sum(
        col("s_m").cast("double") / (col("m_i") - 1)).over(w))
      .orderBy(col("m_i").desc).limit(1)
      .select(col("acc").as("do_num"))
    val tot = m.agg(count(lit(1)).as("n_items"), sum(col("m_i")).as("n_tot"))
    val deNum = pairable.groupBy(col("cat")).agg(sum(col("cnt")).as("n_c"))
      .crossJoin(broadcast(tot))
      .agg(sum(col("n_c") * (col("n_tot") - col("n_c"))).as("de_num"))
    tot.crossJoin(broadcast(doNum)).crossJoin(broadcast(deNum))
      .select(col("n_items"), col("n_tot"),
        // D_o/D_e = do_num·(n_tot−1)/de_num ; all-one-category → no
        // disagreement is even possible → NULL, not a divide error
        when(col("de_num") > 0,
          round(lit(1.0) - col("do_num") * (col("n_tot") - 1)
            / col("de_num"), 6) + lit(0.0)).as("alpha"))
  }

  /** Cochran's Q test (Cochran 1950) for k matched binary treatments —
    * the k-condition generalization of [[mcnemar]]: "do the k conditions
    * have the same success rate over the same subjects". Input: one row
    * per (subject, condition) with a 0/1 outcome — the caller supplies
    * the DENSE grid (absent = 0 rows included), since the test is about
    * matched subjects.
    *
    * Q = (k−1)·(k·ΣT_c² − (ΣT)²) / (k·ΣR_u − ΣR_u²) where T_c are
    * condition totals and R_u subject row-sums — every sufficient
    * statistic is an exact integer sum (order-independent, no float
    * fold anywhere), and Q is one division at the edge.
    */
  def cochranQ(df: DataFrame, subjectCol: String, conditionCol: String,
               hitCol: String): DataFrame = {
    val d = df.select(col(subjectCol).as("u"), col(conditionCol).as("c"),
      col(hitCol).cast("long").as("h"))
    val colTot = d.groupBy(col("c")).agg(sum(col("h")).as("t"))
      .agg(count(lit(1)).as("k"), sum(col("t")).as("st"),
        sum(col("t") * col("t")).as("stt"))
    val rowTot = d.groupBy(col("u")).agg(sum(col("h")).as("r"))
      .agg(count(lit(1)).as("n_subjects"), sum(col("r")).as("sr"),
        sum(col("r") * col("r")).as("srr"))
    colTot.crossJoin(broadcast(rowTot))
      .select(col("k"), col("n_subjects"),
        (col("k") - 1).as("dof"),
        // all-zero / all-one subjects contribute nothing; if EVERY subject
        // is constant the denominator is 0 and there is no test → NULL
        when(col("k") * col("sr") - col("srr") > 0,
          round(((col("k") - 1) * (col("k") * col("stt") - col("st") * col("st")))
            .cast("double")
            / (col("k") * col("sr") - col("srr")), 6)).as("q_stat"))
  }
}
