package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.GridGuard

/** k-sample distribution tests over a grouped value column — the audit
  * battery for "do these corpus slices actually differ": the two-sample
  * Kolmogorov-Smirnov D (Kolmogorov 1933, Smirnov 1948), Kruskal-Wallis
  * H with tie correction (Kruskal & Wallis 1952), Brown-Forsythe
  * median-based variance homogeneity (Brown & Forsythe 1974), and the
  * classic one-way ANOVA F.
  *
  * Float discipline (the q79/q223 ladder): every statistic is built from
  * integer or half-integer sufficient statistics (counts, value sums,
  * midrank sums — exact in double), windows run over DISTINCT-value or
  * group grids (never per-row), and the double formula appears once at
  * the output edge with the identical shape in the DuckDB oracles.
  */
object KSample {

  /** Two-sample KS: input one row per item with a 0/1 side column and an
    * integer value column. The EDF difference is evaluated on the merged
    * distinct-value grid with integer cumulative counts; the sup gap is
    * kept as the INTEGER cross-multiple |c1·n2 − c2·n1| and only divided
    * at the edge, so the argmax is float-free. One row: n1, n2, d_num,
    * ks_d, the α=0.05 asymptotic threshold and the reject flag (compared
    * on 6dp-rounded values).
    */
  def ksTwoSample(df: DataFrame, sideCol: String, valueCol: String): DataFrame = {
    val d = df.select(col(sideCol).cast("long").as("s"),
      col(valueCol).cast("long").as("v"))
    val cells = d.groupBy(col("v")).agg(
      sum(when(col("s") === 0, 1L).otherwise(0L)).as("c0"),
      sum(when(col("s") =!= 0, 1L).otherwise(0L)).as("c1"))
    GridGuard.check(cells, "KSample.ksTwoSample",
      s"distinct-value grid of '$valueCol'")
    // distinct-value grid: the window is bounded by the value domain,
    // not the corpus (the q118 discipline)
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grid = cells
      .withColumn("f0", sum(col("c0")).over(w))
      .withColumn("f1", sum(col("c1")).over(w))
    val tot = grid.agg(max(col("f0")).as("n0"), max(col("f1")).as("n1"))
    grid.crossJoin(broadcast(tot))
      .withColumn("gap", abs(col("f0") * col("n1") - col("f1") * col("n0")))
      .agg(max(col("n0")).as("n0x"), max(col("n1")).as("n1x"),
        max(col("gap")).as("d_num"))
      .select(col("n0x").as("n1"), col("n1x").as("n2"), col("d_num"),
        round(col("d_num").cast("double") / (col("n0x") * col("n1x")), 6).as("ks_d"),
        // c(0.05) = 1.358 as a shared decimal literal
        round(lit(1.358) * sqrt((col("n0x") + col("n1x")).cast("double")
          / (col("n0x") * col("n1x"))), 6).as("crit_05"))
      .withColumn("reject",
        round(col("d_num").cast("double") / (col("n1") * col("n2")), 6) >
          round(lit(1.358) * sqrt((col("n1") + col("n2")).cast("double")
            / (col("n1") * col("n2"))), 6))
  }

  /** Kruskal-Wallis H across the groups of `grpCol`, with the tie
    * correction: H = 12/(N(N+1))·Σ R_g²/n_g − 3(N+1), H_c = H / (1 −
    * Σ(t³−t)/(N³−N)). Midranks are global ½-multiples (exact in double);
    * rank sums R_g are therefore exact too. One row.
    */
  def kruskalWallis(df: DataFrame, grpCol: String, valueCol: String): DataFrame = {
    val d = df.select(col(grpCol).as("g"), col(valueCol).cast("long").as("v"))
    val cells = d.groupBy(col("v")).agg(count(lit(1)).as("t"))
    GridGuard.check(cells, "KSample.kruskalWallis",
      s"distinct-value grid of '$valueCol'")
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranks = cells.withColumn("cum", sum(col("t")).over(w))
      .select(col("v"),
        ((col("cum") - col("t")).cast("double")
          + (col("t") + 1).cast("double") / 2.0).as("r"))
    val perGroup = d.join(ranks, Seq("v"))
      .groupBy(col("g")).agg(count(lit(1)).as("n_g"), sum(col("r")).as("r_g"))
    val ties = cells.agg(sum(col("t") * col("t") * col("t") - col("t")).as("tie3"))
    // Σ R_g²/n_g is a DOUBLE sum over groups — a partial agg would fold
    // it in partition order (engine-dependent). The group grid is bounded
    // (≤ #slices), so accumulate on the single-partition ordered window
    // and keep the last row: a total order makes the fold deterministic
    // on both engines (the q239 bounded-grid discipline).
    val gw = Window.orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perGroup
      .withColumn("nn", sum(col("n_g")).over(gw))
      .withColumn("k", count(lit(1)).over(gw))
      .withColumn("s_rr", sum(col("r_g") * col("r_g") / col("n_g")).over(gw))
      .orderBy(col("g").desc).limit(1)
      .crossJoin(broadcast(ties))
      .select(col("nn").as("n"), col("k").as("groups"),
        round(lit(12.0) / (col("nn") * (col("nn") + 1)) * col("s_rr")
          - lit(3.0) * (col("nn") + 1), 6).as("h"),
        round((lit(12.0) / (col("nn") * (col("nn") + 1)) * col("s_rr")
          - lit(3.0) * (col("nn") + 1))
          / (lit(1.0) - col("tie3").cast("double")
            / (col("nn") * col("nn") * col("nn") - col("nn"))), 6).as("h_tie_corrected"))
  }

  /** Brown-Forsythe W: the ANOVA F applied to z = |x − median_g|.
    * Group medians are type-7 percentile(0.5) (= DuckDB quantile_cont),
    * so z is a ½-multiple of the integer values and the z-sums are exact.
    * One row: n, groups, w_stat.
    */
  def brownForsythe(df: DataFrame, grpCol: String, valueCol: String): DataFrame = {
    val d = df.select(col(grpCol).as("g"), col(valueCol).cast("long").as("v"))
    val med = d.groupBy(col("g"))
      .agg(expr("percentile(v, 0.5)").as("med"))
    val z = d.join(broadcast(med), Seq("g"))
      .select(col("g"), abs(col("v") - col("med")).as("z"))
    val perGroup = z.groupBy(col("g"))
      .agg(count(lit(1)).as("n_g"), sum(col("z")).as("sz"),
        sum(col("z") * col("z")).as("szz"))
    GridGuard.check(perGroup, "KSample.brownForsythe",
      s"group grid of '$grpCol'")
    // z is a ½-multiple so sz/szz sums are exact; the sz²/n_g terms are
    // general doubles — accumulate them on the ordered bounded-grid
    // window (see kruskalWallis) instead of an order-free partial agg
    val gw = Window.orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perGroup
      .withColumn("nn", sum(col("n_g")).over(gw))
      .withColumn("k", count(lit(1)).over(gw))
      .withColumn("sz_all", sum(col("sz")).over(gw))
      // between-group: Σ n_g·z̄_g² = Σ sz²/n_g ; within: Σ(szz − sz²/n_g)
      .withColumn("s_between_raw",
        sum(col("sz") * col("sz") / col("n_g")).over(gw))
      .withColumn("ssw",
        sum(col("szz") - col("sz") * col("sz") / col("n_g")).over(gw))
      .orderBy(col("g").desc).limit(1)
      .select(col("nn").as("n"), col("k").as("groups"),
        round(((col("s_between_raw") - col("sz_all") * col("sz_all") / col("nn"))
          / (col("k") - 1))
          / (col("ssw") / (col("nn") - col("k"))), 6).as("w_stat"))
  }

  /** One-way ANOVA F from integer sufficient statistics (Σx, Σx² per
    * group): F = (SSB/(k−1)) / (SSW/(N−k)), η² = SSB/SST. One row.
    */
  def anovaF(df: DataFrame, grpCol: String, valueCol: String): DataFrame = {
    val d = df.select(col(grpCol).as("g"), col(valueCol).cast("long").as("v"))
    val perGroup = d.groupBy(col("g"))
      .agg(count(lit(1)).as("n_g"), sum(col("v")).as("sx"),
        sum(col("v") * col("v")).as("sxx"))
    GridGuard.check(perGroup, "KSample.anovaF", s"group grid of '$grpCol'")
    // Σ sx²/n_g is the only non-integer sum — ordered bounded-grid window
    val gw = Window.orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perGroup
      .withColumn("nn", sum(col("n_g")).over(gw))
      .withColumn("k", count(lit(1)).over(gw))
      .withColumn("sx_all", sum(col("sx")).over(gw))
      .withColumn("sxx_all", sum(col("sxx")).over(gw))
      .withColumn("s_between_raw",
        sum(col("sx").cast("double") * col("sx") / col("n_g")).over(gw))
      .orderBy(col("g").desc).limit(1)
      .select(col("nn").as("n"), col("k").as("groups"),
        round(((col("s_between_raw") - col("sx_all").cast("double") * col("sx_all") / col("nn"))
          / (col("k") - 1))
          / ((col("sxx_all") - col("s_between_raw")) / (col("nn") - col("k"))), 6)
          .as("f_stat"),
        round((col("s_between_raw") - col("sx_all").cast("double") * col("sx_all") / col("nn"))
          / (col("sxx_all") - col("sx_all").cast("double") * col("sx_all") / col("nn")), 6)
          .as("eta_sq"))
  }

  /** Two-sample Cramér-von Mises T (Anderson 1962) — the EDF test that
    * weighs the WHOLE distribution gap where [[ksTwoSample]] sees only
    * the sup: T = Σ_k t_k·(F₁−F₂)²(x_k) · nm/N². The EDF difference
    * stays the integer cross-multiple c₁·n₂ − c₂·n₁ (squared in double —
    * its square overflows a long at corpus scale) and the weighted sum
    * folds on the ordered distinct-value grid. The asymptotic 5% point
    * T = 0.461 is a shared literal; reject compares rounded values.
    */
  def cramerVonMises(df: DataFrame, sideCol: String, valueCol: String): DataFrame = {
    val d = df.select(col(sideCol).cast("long").as("s"),
      col(valueCol).cast("long").as("v"))
    val cells = d.groupBy(col("v")).agg(
      sum(when(col("s") === 0, 1L).otherwise(0L)).as("c0"),
      sum(when(col("s") =!= 0, 1L).otherwise(0L)).as("c1"))
    GridGuard.check(cells, "KSample.cramerVonMises",
      s"distinct-value grid of '$valueCol'")
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grid = cells
      .withColumn("t", col("c0") + col("c1"))
      .withColumn("f0", sum(col("c0")).over(w))
      .withColumn("f1", sum(col("c1")).over(w))
    val tot = grid.agg(max(col("f0")).as("n0"), max(col("f1")).as("n1"))
    val acc = grid.crossJoin(broadcast(tot))
      .withColumn("gap", (col("f0") * col("n1") - col("f1") * col("n0"))
        .cast("double"))
      .withColumn("acc",
        sum(col("t").cast("double") * col("gap") * col("gap")).over(w))
    acc.orderBy(col("v").desc).limit(1)
      .select(col("n0").as("n1"), col("n1").as("n2"),
        round(col("acc") / (((col("n0") + col("n1")).cast("double")
            * (col("n0") + col("n1"))) * col("n0") * col("n1")), 6)
          .as("t_cvm"),
        lit(0.461).as("crit_05"),
        (round(col("acc") / (((col("n0") + col("n1")).cast("double")
            * (col("n0") + col("n1"))) * col("n0") * col("n1")), 6)
          > lit(0.461)).as("reject"))
  }

  /** Hodges-Lehmann two-sample shift estimator (1963): the median of
    * all pairwise differences x₁ − x₀ — the robust "how much longer are
    * en docs" effect SIZE that pairs with [[ksTwoSample]]'s yes/no and
    * q200 Mann-Whitney's p-value. Convention (documented): the weighted
    * median averages the two middle differences, type-7 style.
    *
    * Scale shape: the pairwise differences collapse to the VALUE-GRID
    * product (c₀·c₁ integer weights per distinct difference) — bounded
    * by the value domain squared, never the corpus squared (the q198
    * Theil-Sen discipline, documented ceiling on the grid). Median
    * positions are integer cum lookups; one /2.0 at the edge.
    */
  def hodgesLehmann(df: DataFrame, sideCol: String, valueCol: String): DataFrame = {
    val d = df.select(col(sideCol).cast("long").as("s"),
      col(valueCol).cast("long").as("v"))
    val c0 = d.filter(col("s") === 0).groupBy(col("v").as("v0"))
      .agg(count(lit(1)).as("c0"))
    val c1 = d.filter(col("s") =!= 0).groupBy(col("v").as("v1"))
      .agg(count(lit(1)).as("c1"))
    // the pair grid is c0 × c1: cap each SIDE so the cross-join
    // intermediate stays <= MaxPairSide² (~16.8M distributed rows)
    GridGuard.check(c0, "KSample.hodgesLehmann",
      s"side-0 value grid of '$valueCol'", GridGuard.MaxPairSide)
    GridGuard.check(c1, "KSample.hodgesLehmann",
      s"side-1 value grid of '$valueCol'", GridGuard.MaxPairSide)
    val diffs = c0.crossJoin(c1)
      .groupBy((col("v1") - col("v0")).as("diff"))
      .agg(sum(col("c0") * col("c1")).as("wgt"))
    val w = Window.orderBy(col("diff"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grid = diffs.withColumn("cum", sum(col("wgt")).over(w))
    val tot = grid.agg(max(col("cum")).as("nw"))
    val ks = tot.select(col("nw"), expr("(nw + 1) div 2").as("k1"),
      expr("(nw + 2) div 2").as("k2"))
    grid.crossJoin(broadcast(ks))
      .agg(max(col("nw")).as("n_pairs"),
        min(when(col("cum") >= col("k1"), col("diff"))).as("d1"),
        min(when(col("cum") >= col("k2"), col("diff"))).as("d2"))
      .select(col("n_pairs"),
        round((col("d1") + col("d2")).cast("double") / 2.0, 6) + lit(0.0)
          as "hl_shift")
  }

  /** Vargha-Delaney Â₁₂ (2000) — the common-language effect size
    * P(X₁ > X₀) + ½P(X₁ = X₀): "if you draw one doc from each side, how
    * often does side 1 win". The magnitude labels are the published
    * thresholds, decided on the ROUNDED value (cross-engine stable).
    * Pooled midranks from the distinct-value grid make R̄₁ an exact
    * ½-multiple; Â is one closed form at the edge.
    */
  def varghaDelaney(df: DataFrame, sideCol: String, valueCol: String): DataFrame = {
    val d = df.select(col(sideCol).cast("long").as("s"),
      col(valueCol).cast("long").as("v"))
    val cells = d.groupBy(col("v")).agg(
      sum(when(col("s") === 0, 1L).otherwise(0L)).as("c0"),
      sum(when(col("s") =!= 0, 1L).otherwise(0L)).as("c1"))
      .withColumn("t", col("c0") + col("c1"))
    GridGuard.check(cells, "KSample.varghaDelaney",
      s"distinct-value grid of '$valueCol'")
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sums = cells.withColumn("cum", sum(col("t")).over(w))
      .withColumn("r", (col("cum") - col("t")).cast("double")
        + (col("t") + 1).cast("double") / 2.0)
      .agg(sum(col("c0")).as("n0"), sum(col("c1")).as("n1"),
        sum(col("r") * col("c1")).as("r1sum")) // exact ½-multiples
    val a12 = (col("r1sum") / col("n1") - (col("n1") + 1).cast("double") / 2.0) /
      col("n0")
    sums.select(col("n0").as("n1"), col("n1").as("n2"),
      round(a12, 6).as("a12"),
      when(abs(round(a12, 6) - 0.5) < 0.06, lit("negligible"))
        .when(abs(round(a12, 6) - 0.5) < 0.14, lit("small"))
        .when(abs(round(a12, 6) - 0.5) < 0.21, lit("medium"))
        .otherwise(lit("large")).as("magnitude"))
  }

  /** Ansari-Bradley two-sample SCALE test (1960): rank the pooled
    * sample from BOTH ends (score = min(rank, N+1−rank)), sum sample-0's
    * scores, and z-test against the exact null moments (which branch on
    * N's parity — both branches mirrored in the oracle). The dispersion
    * companion to [[brownForsythe]] that needs no median estimate, and
    * the scale-shift sibling of [[ksTwoSample]]/[[cramerVonMises]].
    *
    * Tie handling: tied values share the MEAN of the scores their rank
    * block occupies. The per-value score-block sums are closed-form
    * integer range sums on the distinct-value grid (everything stays
    * integer until the single /t per grid row), and the AB fold runs on
    * the ordered bounded value grid.
    */
  def ansariBradley(df: DataFrame, sideCol: String, valueCol: String): DataFrame = {
    val d = df.select(col(sideCol).cast("long").as("s"),
      col(valueCol).cast("long").as("v"))
    val cells = d.groupBy(col("v")).agg(
      sum(when(col("s") === 0, 1L).otherwise(0L)).as("c0"),
      sum(when(col("s") =!= 0, 1L).otherwise(0L)).as("c1"))
      .withColumn("t", col("c0") + col("c1"))
    GridGuard.check(cells, "KSample.ansariBradley",
      s"distinct-value grid of '$valueCol'")
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grid = cells.withColumn("cum", sum(col("t")).over(w))
    val tot = grid.agg(max(col("cum")).as("nn"),
      sum(col("c0")).as("n0"), sum(col("c1")).as("n1"))
    // score-block sum over ranks lo..hi: ascending arm i ≤ ⌊(N+1)/2⌋
    // scores i; the descending arm scores N+1−i — two integer range
    // sums, with `div` (Column / on longs is DOUBLE division under
    // ANSI); both range sums are provably even, so div 2 is exact
    val acc = grid.crossJoin(broadcast(tot))
      .withColumn("lo", col("cum") - col("t") + 1)
      .withColumn("hi", col("cum"))
      .withColumn("mfloor", expr("(nn + 1) div 2"))
      .withColumn("atop", least(col("hi"), col("mfloor")))
      .withColumn("bbot", greatest(col("lo"), col("mfloor") + 1))
      .withColumn("sc1", when(col("lo") <= col("atop"),
        expr("(atop * (atop + 1) - (lo - 1) * lo) div 2")).otherwise(0L))
      .withColumn("sc2", when(col("bbot") <= col("hi"),
        expr("(hi - bbot + 1) * (nn + 1) - ((hi * (hi + 1) - (bbot - 1) * bbot) div 2)"))
        .otherwise(0L))
      .withColumn("ss", col("sc1") + col("sc2"))
      .withColumn("ab", sum(
        (col("c0") * col("ss")).cast("double") / col("t")).over(w))
    val rep = acc.orderBy(col("v").desc).limit(1)
    val even = col("nn") % 2 === 0
    val eAb = when(even,
        col("n0").cast("double") * (col("nn") + 2) / 4.0)
      .otherwise(col("n0").cast("double") * (col("nn") + 1) * (col("nn") + 1)
        / (lit(4.0) * col("nn")))
    val varAb = when(even,
        col("n0").cast("double") * col("n1") * (col("nn") + 2)
          * (col("nn") - 2) / (lit(48.0) * (col("nn") - 1)))
      .otherwise(col("n0").cast("double") * col("n1") * (col("nn") + 1)
        * (lit(3L) + col("nn") * col("nn"))
        / (lit(48.0) * col("nn") * col("nn")))
    rep.select(col("n0").as("n1"), col("n1").as("n2"),
      round(col("ab"), 6).as("ab"),
      round(eAb, 6).as("e_ab"),
      when(varAb > 0,
        round((col("ab") - eAb) / sqrt(varAb), 6) + lit(0.0)).as("z"))
  }

  /** Mood's median test: the k-sample location test with the weakest
    * assumptions — classify every value above / not-above the GLOBAL
    * type-7 median and χ²-test the k×2 table (delegates to
    * [[Contingency.chiSquare]]'s densified integer grid). Robust to the
    * heavy tails that invalidate [[anovaF]] and cheaper than
    * [[kruskalWallis]] (no ranking pass). One row: the χ² report plus
    * the median itself.
    */
  def moodMedian(df: DataFrame, grpCol: String, valueCol: String): DataFrame = {
    val d = df.select(col(grpCol).as("g"), col(valueCol).cast("long").as("v"))
    val med = d.agg(expr("percentile(v, 0.5)").as("median"))
    val flagged = d.crossJoin(broadcast(med))
      .select(col("g"), (col("v") > col("median")).cast("long").as("above"))
    Contingency.chiSquare(flagged, "g", "above")
      .crossJoin(broadcast(med))
      .select(col("nrows").as("groups"), col("n"), col("median"),
        col("chi2"), col("dof"), col("cramers_v"))
  }
}
