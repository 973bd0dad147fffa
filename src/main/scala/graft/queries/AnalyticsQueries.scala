package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Analytics-pipeline operators gated round 8: graph cores (q183),
  * TextRank keyphrases (q184), readability (q185), EWMA smoothing
  * (q186), fill-in-the-middle augmentation (q187), Benford audit
  * (q188), l-diversity (q189), A/B hypothesis tests (q190), Kneser-Ney
  * LM (q191), Markov attribution (q192), bootstrap CIs (q193),
  * quantile normalization (q194), association rules (q195),
  * Jaro-Winkler linkage (q196), weekday seasonality (q197), Theil-Sen
  * (q198), CUSUM changepoints (q199), and Mann-Whitney U (q200).
  *
  * Numeric discipline throughout: counts stay integer, distinct counts
  * are exact, float formulas are written in the SAME shape on both
  * engines and rounded once at the output edge.
  */
object AnalyticsQueries {

  type Q = (SparkSession, String) => DataFrame

  def defs: Map[String, Q] = Map(
    // K-core of a skew-degree synthetic follow graph (quadratic/cubic
    // successors give the degree variance peeling needs — the q67 affine
    // graph is degree-regular and peels trivially): 6 fixed rounds at
    // k=3, then survivors with residual degree. At sf0.01 the shell of
    // 17 degree-2 nodes cascades out and 30 of 57 nodes keep the core.
    "q183_kcore" -> ((s, dir) => {
      // reduce mod 60 BEFORE squaring/cubing: (u² + 7) % 60 ≡ ((u%60)² + 7)
      // % 60, and the reduced form cannot ANSI-overflow on the synthesized
      // sf1's replica-offset ids (~9·10⁹, whose square exceeds Long.Max)
      val ev = Tables.events(s, dir).select((col("user_id") % 60).as("u"))
      val e1 = ev.select(col("u").as("src"),
        ((col("u") * col("u") + 7) % 60).as("dst"))
      val e2 = ev.select(col("u").as("src"),
        ((col("u") * col("u") * col("u") + 11) % 60).as("dst"))
      graft.operators.KCore.peel(e1.unionByName(e2).distinct(),
          "src", "dst", k = 3, rounds = 6)
        .orderBy(col("node"))
    }),

    // TextRank: top-25 corpus keyphrases by 3-iteration PageRank over
    // the adjacent-token co-occurrence graph of documents.
    "q184_textrank" -> ((s, dir) =>
      graft.operators.TextRank.keywords(
        Tables.documents(s, dir), "text", k = 25, iterations = 3)),

    // Flesch / Flesch-Kincaid per document — one codegen projection.
    "q185_readability" -> ((s, dir) =>
      graft.functions.Readability.score(Tables.documents(s, dir), "text")
        .select(col("doc_id"), col("n_words"), col("n_sentences"),
          col("n_syllables"), col("flesch"), col("fk_grade"))
        .orderBy(col("doc_id"))),

    // α=1/2 EWMA of daily event counts per type, exact dyadic integers.
    "q186_ewma" -> ((s, dir) =>
      graft.operators.Ewma.dailyCounts(Tables.events(s, dir),
          "event_type", "ts", window = 25)
        .orderBy(col("event_type"))),

    // Deterministic PSM fill-in-the-middle transform per document.
    "q187_fim" -> ((s, dir) =>
      graft.functions.Augment.fim(Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // Benford first-digit audit of extendedprice per returnflag.
    "q188_benford" -> ((s, dir) =>
      graft.functions.Benford.digitAudit(Tables.lineitem(s, dir),
          "l_returnflag", "l_extendedprice")
        .orderBy(col("l_returnflag"), col("digit"))),

    // l-diversity over the q119 quasi-identifier groups: the sensitive
    // attribute is the account-balance thousand-bucket; a group is weak
    // when it carries fewer than 3 distinct sensitive values (exact
    // distinct — the partial-agg two-level rollup as q119).
    "q189_ldiversity" -> ((s, dir) => {
      val g = Tables.customer(s, dir)
        .groupBy(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("k"),
          countDistinct(floor(col("c_acctbal") / 1000).cast("long")).as("l"))
      g.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_groups"),
          min(col("l")).as("min_l"),
          sum(when(col("l") < 3, 1L).otherwise(0L)).as("n_weak_groups"),
          sum(when(col("l") < 3, col("k")).otherwise(0L)).as("n_rows_weak"))
        .orderBy(col("c_mktsegment"))
    }),

    // A/B test harness: users split by id parity; conversion = any
    // HIGH-VALUE purchase (value > 150 — plain "any purchase" is
    // degenerate here, every user converts and the pooled-variance z
    // denominator is exactly 0, which ANSI mode turns into a
    // DIVIDE_BY_ZERO even for doubles). Two-proportion z on conversion
    // + Welch's t on per-user event counts, all from exact integer
    // sufficient statistics (Σx, Σx² as int64 — no Welford fold, no
    // order dependence), formulas applied once at the output edge.
    "q190_abtest" -> ((s, dir) => {
      val u = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_ev"),
          max(when(col("event_type") === "purchase" && col("value") > 150, 1L)
            .otherwise(0L)).as("conv"))
        .withColumn("v", col("user_id") % 2)
      val a = u.agg(
        sum(when(col("v") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("v") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("v") === 0, col("conv")).otherwise(0L)).as("c0"),
        sum(when(col("v") === 1, col("conv")).otherwise(0L)).as("c1"),
        sum(when(col("v") === 0, col("n_ev")).otherwise(0L)).as("s0"),
        sum(when(col("v") === 1, col("n_ev")).otherwise(0L)).as("s1"),
        sum(when(col("v") === 0, col("n_ev") * col("n_ev")).otherwise(0L)).as("q0"),
        sum(when(col("v") === 1, col("n_ev") * col("n_ev")).otherwise(0L)).as("q1"))
      // every ratio is an explicit DOUBLE division — under ANSI mode a
      // bare long/long `/` is INTEGRAL division (and the statistics
      // would silently floor to 0)
      a.select(col("n0"), col("n1"),
          (col("c0").cast("double") / col("n0")).as("p0d"),
          (col("c1").cast("double") / col("n1")).as("p1d"),
          ((col("c0") + col("c1")).cast("double") / (col("n0") + col("n1"))).as("pp"),
          (col("s0").cast("double") / col("n0")).as("m0d"),
          (col("s1").cast("double") / col("n1")).as("m1d"),
          ((col("q0") - col("s0").cast("double") * col("s0") / col("n0"))
            / (col("n0") - 1)).as("v0"),
          ((col("q1") - col("s1").cast("double") * col("s1") / col("n1"))
            / (col("n1") - 1)).as("v1"))
        .select(col("n0"), col("n1"),
          round(col("p0d"), 4).as("p0"),
          round(col("p1d"), 4).as("p1"),
          round((col("p1d") - col("p0d"))
            / sqrt(col("pp") * (lit(1.0) - col("pp"))
              * (lit(1.0) / col("n0") + lit(1.0) / col("n1"))), 4).as("z_conv"),
          round(col("m0d"), 4).as("m0"),
          round(col("m1d"), 4).as("m1"),
          round((col("m1d") - col("m0d"))
            / sqrt(col("v0") / col("n0") + col("v1") / col("n1")), 4).as("t_welch"),
          round(pow(col("v0") / col("n0") + col("v1") / col("n1"), 2)
            / (pow(col("v0") / col("n0"), 2) / (col("n0") - 1)
              + pow(col("v1") / col("n1"), 2) / (col("n1") - 1)), 2).as("df_welch"))
    }),

    // Kneser-Ney smoothed bigram LM: top-25 bigrams with interpolated
    // continuation-count probabilities.
    "q191_kneser_ney" -> ((s, dir) =>
      graft.functions.KneserNey.bigramProbs(
        Tables.documents(s, dir), "text", k = 25)),

    // Markov removal-effect attribution over user journeys (absorb at
    // first purchase; 12 fixed propagation rounds, oracle-unrolled).
    "q192_attribution" -> ((s, dir) => {
      val trans = graft.operators.MarkovAttribution.transitions(
        Tables.events(s, dir), "user_id", "ts", "event_id",
        "event_type", convType = "purchase")
      graft.operators.MarkovAttribution.removalEffects(s, trans)
    }),

    // Deterministic bootstrap CI of mean event value per type (30
    // hash-weighted replicas, 2nd/29th order-statistic envelope).
    "q193_bootstrap_ci" -> ((s, dir) =>
      graft.operators.Bootstrap.meanCi(Tables.events(s, dir),
          "event_type", "event_id", "value")
        .orderBy(col("event_type"))),

    // Cross-source quantile normalization of document length onto the
    // pooled corpus distribution, integer-exact positions.
    "q194_quantile_norm" -> ((s, dir) =>
      graft.operators.QuantileNorm.normalize(Tables.documents(s, dir),
          "source", "doc_id", "n_chars")
        .orderBy(col("doc_id"))),

    // Directed association rules (confidence + lift) over the q182
    // session baskets — min co-session support 2, top-40 by lift.
    "q195_assoc_rules" -> ((s, dir) =>
      graft.operators.AssociationRules.rules(
        Tables.events(s, dir)
          .withColumn("item", Tables.extractLongProp(col("props"), "k")),
        "user_id", "ts", "event_id", "item",
        gapSec = 1800L, minSupport = 2L, k = 40)),

    // Jaro-Winkler record linkage over part names blocked by brand —
    // the native codegen comparator vs DuckDB's built-in.
    "q196_jaro_linkage" -> ((s, dir) =>
      graft.dedup.JaroLinkage.report(Tables.part(s, dir),
          "p_partkey", "p_name", col("p_brand"))
        .orderBy(col("block"))),

    // Detrended weekday seasonality (7-day centered MA, integer devs).
    "q197_weekday_seasonal" -> ((s, dir) =>
      graft.operators.SeasonalDecompose.weekday(Tables.events(s, dir),
          "event_type", "ts")
        .orderBy(col("event_type"), col("dow"))),

    // Theil-Sen robust slope: median pairwise slope over the day grid.
    "q198_theil_sen" -> ((s, dir) =>
      graft.operators.RobustStats.theilSen(Tables.events(s, dir),
          "event_type", "ts")
        .orderBy(col("event_type"))),

    // CUSUM changepoint: integer n·prefix−k·total peak per event type.
    "q199_changepoint" -> ((s, dir) =>
      graft.operators.RobustStats.cusumChangepoint(Tables.events(s, dir),
          "event_type", "ts")
        .orderBy(col("event_type"))),

    // Mann-Whitney U between user-parity variants on event value.
    "q200_mann_whitney" -> ((s, dir) =>
      graft.operators.RankTests.mannWhitney(
        Tables.events(s, dir).withColumn("g", col("user_id") % 2),
        "g", "value")),

    // Chi-square independence: event mix (type) × user-parity variant.
    "q201_chi2_indep" -> ((s, dir) =>
      graft.operators.Contingency.chiSquare(
        Tables.events(s, dir).withColumn("variant", col("user_id") % 2),
        "event_type", "variant")),

    // Gini concentration of document length per source.
    "q202_gini" -> ((s, dir) =>
      graft.operators.Gini.coefficient(Tables.documents(s, dir),
          "source", "n_chars")
        .orderBy(col("source"))),

    // Kendall τ-b rank correlation between doc length and token count per
    // source (the monotone-association twin of q79's Pearson r). Metrics
    // are BINNED first (n_chars÷64, tokens÷16) so the concordance pair
    // join runs over the bounded cell grid, never raw doc pairs — the
    // q198/q200 grid discipline. Integer C/D/n counts hash exactly; τ is
    // one division at the edge.
    "q210_kendall_tau" -> ((s, dir) => {
      val binned = Tables.documents(s, dir)
        .select(col("source"),
          expr("n_chars div 64").as("xb"),
          graft.functions.TextOps.wsTokenCount(col("text")).cast("long").as("_y"))
        .select(col("source"), col("xb"), expr("_y div 16").as("yb"))
      graft.operators.RankTests.kendallTauB(binned, "source")
        .orderBy(col("source"))
    }),

    // Two-proportion z-test + Wilson 95% CIs: click share per user-parity
    // variant — the categorical-outcome companion to q190's Welch t and
    // q200's rank test. Sufficient statistics are four integers; the z
    // and both CIs are closed-form float expressions at the edge.
    "q212_prop_ztest" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select((col("user_id") % 2).cast("long").as("variant"),
          when(col("event_type") === "click", 1L).otherwise(0L).as("hit"))
      val g = ev.groupBy(col("variant"))
        .agg(count(lit(1)).as("n"), sum(col("hit")).as("k"))
      // z written as the literal (never sqrt(z²) — a 1-ulp cross-engine
      // trap); every float expression mirrors the oracle's shape exactly
      val zl = lit(1.959963984540054)
      val z2 = zl * zl
      def phat = col("k").cast("double") / col("n")
      def halfW = zl * sqrt(phat * (lit(1.0) - phat) / col("n")
        + z2 / (lit(4.0) * col("n") * col("n")))
      def center(sign: Double) =
        round(((col("k") + z2 / 2) / col("n") + lit(sign) * halfW)
          / (lit(1.0) + z2 / col("n")), 6)
      val wils = g.select(col("variant"), col("n"), col("k"),
          round(phat, 6).as("p"),
          // Wilson score interval: (p̂ + z²/2n ± z·sqrt(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)
          center(-1.0).as("wilson_lo"),
          center(1.0).as("wilson_hi"))
      val a = wils.filter(col("variant") === 0).select(
        col("n").as("n0"), col("k").as("k0"), col("p").as("p0"),
        col("wilson_lo").as("lo0"), col("wilson_hi").as("hi0"))
      val b = wils.filter(col("variant") === 1).select(
        col("n").as("n1"), col("k").as("k1"), col("p").as("p1"),
        col("wilson_lo").as("lo1"), col("wilson_hi").as("hi1"))
      a.crossJoin(b) // 1 row × 1 row
        .withColumn("_pp", (col("k0") + col("k1")).cast("double") / (col("n0") + col("n1")))
        .select(col("n0"), col("k0"), col("p0"), col("lo0"), col("hi0"),
          col("n1"), col("k1"), col("p1"), col("lo1"), col("hi1"),
          when(col("_pp") > 0 && col("_pp") < 1,
            round((col("k1").cast("double") / col("n1") - col("k0").cast("double") / col("n0"))
              / sqrt(col("_pp") * (lit(1.0) - col("_pp"))
                * (lit(1.0) / col("n0") + lit(1.0) / col("n1"))), 4)).as("z"))
    }),

    // Embedding dimension-correlation audit — the redundancy report a
    // vector pipeline reads before whitening or Matryoshka truncation
    // (q151): Pearson r for every dim pair. The d²/2 fan-out is built
    // INSIDE each row (two chained posexplodes over the same array — a
    // Generate, not a join), so nothing shuffles until the ONE bounded
    // (i, j)-keyed partial agg (64 dims → 2016 cells; map-side combine
    // collapses each partition to ≤2016 rows before the exchange). The
    // r8 draft self-joined the exploded corpus on vec_id — two full
    // Exchanges to rebuild pairs already present in the row (r9 verdict).
    // ALL 2016 pairs are emitted (no |r| threshold): the row SET is now
    // float-independent, and a 1-ulp sum-order wobble can only nudge a
    // rounded VALUE, never flip rows in or out (r9 advice).
    "q214_dim_corr" -> ((s, dir) => {
      val v = Tables.embeddings(s, dir)
        .select(col("embedding").cast("array<double>").as("v"))
      val pairs = v
        .select(col("v"), posexplode(col("v")).as(Seq("i", "xi")))
        .select(col("i"), col("xi"), posexplode(col("v")).as(Seq("j", "xj")))
        .filter(col("i") < col("j"))
      pairs.groupBy(col("i"), col("j"))
        .agg(count(lit(1)).as("n"),
          sum(col("xi")).as("si"), sum(col("xj")).as("sj"),
          sum(col("xi") * col("xi")).as("sii"),
          sum(col("xj") * col("xj")).as("sjj"),
          sum(col("xi") * col("xj")).as("sij"))
        .withColumn("r",
          // `+ 0.0` pins a cancellation-zero numerator to +0.0 (q176 class)
          round((col("n") * col("sij") - col("si") * col("sj"))
            / (sqrt(col("n") * col("sii") - col("si") * col("si"))
              * sqrt(col("n") * col("sjj") - col("sj") * col("sj"))), 6) + lit(0.0))
        .select((col("i") + 1).cast("long").as("dim_i"),
          (col("j") + 1).cast("long").as("dim_j"), col("r"))
        .orderBy(col("dim_i"), col("dim_j"))
    }),

    // Wald SPRT (Sequential Probability Ratio Test, Wald 1945) on the
    // click rate per user-parity variant: H0 p=0.4 vs H1 p=0.6,
    // α=β=0.05. The LLR after n events is k·ln(p1/p0)+(n−k)·ln(q1/q0) —
    // integer cumsums per variant (one window each), constants baked as
    // IDENTICAL decimal literals on both sides (libm ln can differ by
    // 1 ulp between engines), so the first-crossing index is exact.
    "q215_sprt" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val c1 = math.log(0.6 / 0.4) // ln(p1/p0)
      val c2 = math.log(0.4 / 0.6) // ln((1-p1)/(1-p0))
      val a = math.log(19.0) // ln((1-β)/α), α=β=0.05
      val ev = Tables.events(s, dir)
        .select((col("user_id") % 2).cast("long").as("variant"),
          expr("unix_micros(ts)").as("us"), col("event_id"),
          when(col("event_type") === "click", 1L).otherwise(0L).as("hit"))
      val w = Window.partitionBy(col("variant"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val walk = ev
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("k", sum(col("hit")).over(w))
        .withColumn("llr", col("k") * lit(c1) + (col("n") - col("k")) * lit(c2))
      // final state AND first crossing in ONE partial agg over the walk:
      // min(struct(n, decision)) picks the earliest crossing row (n is
      // unique per variant, so the struct order is total), max(struct(n,
      // llr)) the final LLR. The r9 draft re-derived `walk` three times
      // (filter + two joins) — 3 WindowExecs and 2 joins for values one
      // agg already holds; at 100 TB that is 3 window shuffles of the
      // event horizon instead of 1 (r10 plan fix, PlanShapeSpec-asserted).
      walk.groupBy(col("variant"))
        .agg(max(col("n")).as("n"), max(col("k")).as("k"),
          round(max(struct(col("n"), col("llr"))).getField("llr"), 4).as("llr_final"),
          min(when(col("llr") >= a || col("llr") <= -a,
            struct(col("n").as("cn"),
              when(col("llr") >= a, "reject_h0").otherwise("accept_h0").as("d"))))
            .as("_cross"))
        .select(col("variant"), col("n"), col("k"), col("llr_final"),
          coalesce(col("_cross.d"), lit("continue")).as("decision"),
          col("_cross.cn").as("cross_n"))
        .orderBy(col("variant"))
    }),

    // T-digest bounded-error gate: the digest's centroid layout depends
    // on Spark's partition merge order (documented t-digest property), so
    // no value-replay oracle exists — instead BOTH engines compute the
    // exact per-type quantiles (the hash-matched half) and the Spark side
    // additionally checks its digest estimate's RANK error against the k1
    // envelope (one centroid span, 2π·sqrt(q(1−q))/δ, + interpolation
    // slack). The oracle pins bound_ok=TRUE, so an envelope violation
    // hash-mismatches the gate. The exact percentile here is the gate's
    // validation half (q108 discipline) — the operator under test is the
    // mergeable sketch.
    "q206_tdigest_bound" -> ((s, dir) => {
      import graft.functions.TDigestSketch
      val qsSeq = Seq(0.05, 0.25, 0.5, 0.75, 0.95)
      val ev = Tables.events(s, dir)
        .select(col("event_type"), col("value").cast("double").as("v"))
      val digests = TDigestSketch.sketch(ev, "event_type", "v")
      val qs = s.createDataFrame(qsSeq.map(Tuple1.apply)).toDF("q")
      // 4 groups × 5 quantiles — the digest read is 20 tiny rows, far off
      // the hot path, so a scalar udf over the sketch array is fine here
      val qfn = udf((d: Seq[Double], q: Double) =>
        TDigestSketch.quantile(d.toArray, q))
      val est = digests.crossJoin(broadcast(qs))
        .select(col("grp").as("event_type"), col("q"),
          qfn(col("digest"), col("q")).as("est"))
      val cdf = ev.join(broadcast(est), "event_type")
        .groupBy(col("event_type"), col("q"), col("est"))
        .agg((sum(when(col("v") < col("est"), 1L).otherwise(0L))
            .cast("double") / count(lit(1))).as("lo"),
          (sum(when(col("v") <= col("est"), 1L).otherwise(0L))
            .cast("double") / count(lit(1))).as("hi"))
      val exact = ev.groupBy(col("event_type"))
        .agg(expr(s"percentile(v, array(${qsSeq.mkString(",")}))").as("_eq"))
        .select(col("event_type"), posexplode(col("_eq")).as(Seq("_i", "exact_v")))
        .select(col("event_type"),
          element_at(typedLit(qsSeq), col("_i") + 1).as("q"), col("exact_v"))
      cdf.join(exact, Seq("event_type", "q"))
        .select(col("event_type"), col("q"),
          round(col("exact_v"), 6).as("exact_q"),
          (when(col("q").between(col("lo"), col("hi")), 0.0)
            .otherwise(least(abs(col("q") - col("lo")), abs(col("q") - col("hi"))))
            <= lit(2.0 * math.Pi) * sqrt(col("q") * (lit(1.0) - col("q")))
                 / TDigestSketch.Compression + lit(0.005)).as("bound_ok"))
        .orderBy(col("event_type"), col("q"))
    }),

    // The StreamEwma fold gated end-to-end: the distributed batch replay
    // (flatMapGroups sharing the streaming closure's exact step) emits
    // the full forecast-then-fold trajectory per event type over its
    // daily counts; the oracle replays the same fold as a recursive CTE.
    // α=1/2 keeps every operand dyadic, so the doubles agree bit-for-bit.
    "q204_ewma_replay" -> ((s, dir) => {
      import s.implicits._
      val buckets = Tables.events(s, dir)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type").as("key"), col("bucket"), col("n"))
        .as[graft.streaming.StreamEwma.BucketCount]
      graft.streaming.StreamEwma.batchForecastedDs(buckets).toDF()
        .select(col("key"), col("bucket"), col("n"),
          round(col("forecast"), 6).as("forecast"),
          round(col("err"), 6).as("err"),
          round(col("ewma"), 6).as("ewma"),
          col("nSeen").as("n_seen"))
        .orderBy(col("key"), col("bucket"))
    }),

    // The StreamRateAnomaly Welford fold gated end-to-end (q204's
    // discipline for the rate-anomaly twin): per event_type, each daily
    // count is scored against the running mean/sd of every PRIOR day —
    // score BEFORE fold, so a burst never desensitizes the baseline that
    // judges it. The oracle replays the identical Welford recurrence in a
    // recursive CTE with the same operation order, so the doubles agree
    // bit-for-bit; zero-variance baselines surface as signed Infinity on
    // both engines and bypass rounding (ANSI round() would throw on Inf).
    "q233_rate_replay" -> ((s, dir) => {
      import s.implicits._
      val buckets = Tables.events(s, dir)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type").as("key"), col("bucket"), col("n"))
        .as[graft.streaming.StreamRateAnomaly.BucketCount]
      val inf = lit(Double.PositiveInfinity)
      graft.streaming.StreamRateAnomaly.batchScoredDs(buckets).toDF()
        .select(col("key"), col("bucket"), col("n"),
          when(abs(col("z")) === inf, col("z"))
            .otherwise(round(col("z"), 6)).as("z"),
          round(col("baselineMean"), 6).as("baseline_mean"),
          col("nBuckets").as("n_prior"))
        .orderBy(col("key"), col("bucket"))
    }),

    // The StreamDgim fold gated end-to-end: per (event_type, ISO-week)
    // key, the hour ticks that saw events stream through the DGIM
    // insert/cascade/expire/estimate step (window = 48 hour-ticks); the
    // oracle replays the identical bucket algebra in a recursive CTE
    // with the cascade unrolled as lateral list rewrites. Integer-only —
    // a bit-exact replay of approximate-counting state.
    "q205_dgim_replay" -> ((s, dir) => {
      import s.implicits._
      val hits = Tables.events(s, dir)
        .select(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("t"))
        .distinct()
        .select(concat(col("event_type"), lit("#"),
            expr("CAST(t div 168 AS string)")).as("key"),
          col("t").as("time"))
        .as[graft.streaming.StreamDgim.Hit]
      graft.streaming.StreamDgim.batchCountedDs(hits, window = 48L).toDF()
        .select(col("key"), col("time").as("t"),
          col("estimate"), col("nBuckets").cast("long").as("n_buckets"))
        .orderBy(col("key"), col("t"))
    }),

    // The StreamDedup keep-first fold gated end-to-end (q204/q205
    // discipline): the distributed batch replay shares the streaming
    // closure's sort + verdict, so per event-type bucket the earliest
    // event (by millisecond, then id — getTime precision mirrored as
    // epoch_us // 1000 in the oracle) is the keeper and every later
    // arrival is flagged with its id. One bucket-keyed shuffle; state in
    // the streaming form is ONE long per bucket.
    // STREAM-STATIC ENRICHMENT REPLAY: the events feed split into 3
    // single-file micro-batches (shard = event_id mod 3), streamed
    // through a real file source with maxFilesPerTrigger=1, each
    // micro-batch broadcast-joined against a STATIC dim (per-type global
    // counts MINUS the single most frequent type, so the inner join
    // provably drops rows). foreachBatch stamps batchId; the gate proves
    // every surviving type crossed 3 distinct micro-batches — the oracle
    // mirrors batch identity as event_id % 3 — and that dim values
    // flowed through the join. No stream state, no watermark: the static
    // side is the state, exactly as it would be at 100 TB.
    "q232_enrich_replay" -> ((s, dir) => {
      import java.nio.file.{Files, StandardCopyOption}
      val evAll = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          pmod(col("event_id"), lit(3)).cast("int").as("shard"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("type_n").desc, col("event_type"))
      val dim = Tables.events(s, dir).groupBy(col("event_type"))
        .agg(count(lit(1)).as("type_n"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") > 1).drop("rk")
      val feedDir = Files.createTempDirectory("g232feed")
      val outDir = Files.createTempDirectory("g232out").toString
      // ONE partitioned write instead of three filter+coalesce(1) jobs
      // that each re-scanned events (r12; guide §1.2). repartition(3,
      // shard) puts each shard in exactly one task → one file per shard
      // dir; batch membership is unchanged (same rows per shard file,
      // row order within a shard is irrelevant to the gate's aggregates
      // and the oracle mirrors shards as event_id % 3).
      val part = Files.createTempDirectory("g232part").toString
      evAll.repartition(3, col("shard"))
        .write.mode("overwrite").partitionBy("shard").parquet(part)
      (0 until 3).foreach { i =>
        val f = new java.io.File(s"$part/shard=$i").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        Files.move(f.toPath, feedDir.resolve(s"shard-$i.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
      }
      val feed = s.readStream.schema(evAll.drop("shard").schema)
        .option("maxFilesPerTrigger", 1).parquet(feedDir.toString)
      val q = feed.join(broadcast(dim), "event_type")
        .writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("g232ckpt").toString)
        .foreachBatch { (batch: DataFrame, id: Long) =>
          batch.withColumn("batch_id", lit(id))
            .write.mode("append").parquet(outDir)
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      s.read.parquet(outDir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("batch_id")).as("n_batches"),
          max(col("type_n")).as("type_n"))
        .orderBy(col("event_type"))
    }),

    "q220_keepfirst_replay" -> ((s, dir) => {
      import s.implicits._
      val feed = Tables.events(s, dir)
        .select(col("event_id").cast("long").as("docId"),
          col("event_type").as("bucket"),
          col("ts").cast("timestamp").as("ts"),
          lit("").as("content"))
        .as[graft.streaming.StreamDedup.DocEvent]
      graft.streaming.StreamDedup.batchKeepFirstDs(feed).toDF()
        .select(col("docId").as("doc_id"), col("bucket"), col("kept"),
          col("firstDocId").as("first_doc_id"))
        .orderBy(col("bucket"), col("doc_id"))
    }),

    // The StreamTrending sharded Misra-Gries state gated by its
    // GUARANTEE (the q206 bound_ok discipline — the MG fold itself is
    // order-dependent and not SQL-replayable per event): every token
    // whose exact count exceeds n_shard/(k+1) MUST survive its shard's
    // summary, so the gate emits guarantee-set tokens semi-joined
    // against the fold's candidates — a dropped heavy hitter loses a row
    // and breaks the hash. Thresholding is the INTEGER comparison
    // n·(k+1) > n_shard (no division). Exact counts come from one
    // (token)-keyed partial agg; the fold is one flatMapGroups per shard.
    "q221_trending_mg" -> ((s, dir) => {
      import s.implicits._
      val k = 30
      val shards = 8
      val toks = Tables.documents(s, dir)
        .select(explode(graft.search.Bm25.tokens(col("text"))).as("token"))
      val events = toks
        .select(col("token"), lit(new java.sql.Timestamp(0L)).as("ts"))
        .as[graft.streaming.StreamTrending.TokenEvent]
      val cands = graft.streaming.StreamTrending
        .batchSummariesDs(events, k, shards).toDF()
        .select(col("shard").cast("long").as("shard"),
          explode(col("tokens")).as("token"))
      val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
        .withColumn("shard",
          expr("cast(conv(substring(md5(token), 1, 15), 16, 10) as bigint)" +
            s" % 2147483647 % $shards"))
      val shardTot = exact.groupBy(col("shard")).agg(sum(col("n")).as("n_shard"))
      exact.join(shardTot, Seq("shard"))
        .filter(col("n") * (k + 1) > col("n_shard"))
        .join(cands, Seq("shard", "token"), "left_semi")
        .select(col("shard"), col("token"), col("n"), col("n_shard"))
        .orderBy(col("shard"), col("token"))
    }),

    // Spearman ρ per source between doc length and token count — the
    // monotone-rank twin of q79 (Pearson) and q210 (Kendall): midranks
    // from distinct-value grids, Pearson over ranks (exact ½-multiples,
    // order-free sums).
    "q223_spearman" -> ((s, dir) =>
      graft.operators.RankTests.spearman(
        Tables.documents(s, dir)
          .select(col("source"), col("n_chars").as("x"),
            graft.functions.TextOps.wsTokenCount(col("text")).cast("long").as("y")),
        "source", "x", "y")
        .orderBy(col("source"))),

    // Benjamini-Hochberg FDR over the per-source "en share vs rest"
    // z-test family — the multiple-testing correction a per-slice data
    // audit needs before flagging slices. p-values via the A-S 7.1.26
    // polynomial (identical literal shape both engines), rounded BEFORE
    // the step-up comparison.
    "q224_bh_fdr" -> ((s, dir) =>
      graft.operators.MultipleTesting.bhFdr(
        Tables.documents(s, dir)
          .select(col("source"), when(col("lang") === "en", 1L).otherwise(0L).as("hit")),
        "source", "hit", alpha = 0.05)
        .orderBy(col("source"))),

    // Leading principal component of the embedding corpus (power
    // iteration, 3 unrolled steps) — the all-but-the-top / whitening
    // direction (Mu-Viswanath 2018). Corpus touched ONCE for the d²
    // covariance cells (in-row pair fan-out, q214 shape); iterations are
    // bounded-grid joins.
    "q225_power_iter" -> ((s, dir) =>
      graft.operators.PowerIteration.leadingComponent(
        s, Tables.embeddings(s, dir), "embedding", iters = 3)),

    // Effective sample size of length-weighted sampling per source
    // (Kish 1965): ESS = (Σw)²/Σw² — how many "real" docs a weighted
    // mixture is worth; the diagnostic read before trusting a reweighted
    // corpus. Integer sums, two divisions at the edge.
    "q227_ess_weights" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("source"), col("n_chars").cast("long").as("w"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("w")).as("sw"),
          sum(col("w") * col("w")).as("sww"))
        .select(col("source"), col("n"),
          round(col("sw").cast("double") * col("sw") / col("sww"), 4).as("ess"),
          round(col("sw").cast("double") * col("sw") / col("sww") / col("n"), 6)
            .as("ess_ratio"))
        .orderBy(col("source"))),

    // Cochran-Armitage trend test: does click propensity trend across
    // the ordered user cohorts 0<1<2? The dose-response companion to
    // q212's two-proportion z. Integer sufficient statistics from ONE
    // partial agg; closed form at the edge.
    "q228_cochran_armitage" -> ((s, dir) =>
      graft.operators.MultipleTesting.cochranArmitage(
        Tables.events(s, dir)
          .select((col("user_id") % 3).as("dose"),
            when(col("event_type") === "click", 1L).otherwise(0L).as("hit")),
        "dose", "hit")),

    // Class-balanced loss weights per language (Cui et al. 2019
    // "effective number of samples"): w_c = (1−β)/(1−β^{n_c}), β=0.999,
    // normalized to mean 1 over classes — the reweighting a skewed
    // multilingual corpus trains with. One count agg; pow at the edge.
    "q230_cb_weights" -> ((s, dir) => {
      val g = Tables.documents(s, dir).groupBy(col("lang"))
        .agg(count(lit(1)).as("n"))
        .withColumn("w", (lit(1.0) - lit(0.999)) / (lit(1.0) - pow(lit(0.999), col("n"))))
      val tot = g.agg(sum(col("w")).as("sw"), count(lit(1)).as("c"))
      g.crossJoin(broadcast(tot))
        .select(col("lang"), col("n"),
          round(col("w"), 6).as("w_raw"),
          round(col("w") * col("c") / col("sw"), 6).as("w_norm"))
        .orderBy(col("lang"))
    }),

    // Split-conformal acceptance threshold per source (Vovk 2005): the
    // ⌈(n+1)(1−α)⌉-th smallest calibration n_chars guarantees ≥90%
    // coverage on the exchangeable test half. Rank k is integer-exact;
    // threshold is a passthrough; coverage divides once at the edge.
    "q235_conformal" -> ((s, dir) => {
      // split by the q35 hash bucket, NOT doc_id parity — source is a
      // function of doc_id in the testdata, so a parity split would give
      // cal and test disjoint sources (an empty inner join)
      val docs = Tables.documents(s, dir)
        .select(col("source"), col("doc_id"), col("n_chars"),
          graft.functions.Splits.hashBucket(col("doc_id"), 100).as("b"))
      graft.operators.Conformal.splitThreshold(
        docs.filter(col("b") < 50), docs.filter(col("b") >= 50),
        "source", "doc_id", "n_chars", 1L, 10L)
        .orderBy(col("source"))
    }),

    // McNemar's paired test: do the two langid heuristics (the-rule vs
    // ascii-ratio rule) have different error rates on the SAME docs?
    // Discordant counts are integers from one agg; χ²=(b−c)²/(b+c);
    // p = 2·P(Z>√χ²) via the shared A-S polynomial.
    "q236_mcnemar" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val truth = col("lang") === "en"
      val ruleA = lower(col("text")).contains(" the ")
      val ruleB = length(regexp_replace(col("text"), "[^\\x00-\\x7F]", "")) *
        20 >= length(col("text")) * 19
      graft.operators.Agreement.mcnemar(d, ruleA === truth, ruleB === truth)
    }),

    // Cohen's κ between the same two heuristics treated as independent
    // annotators: κ = 2(ad−bc)/((a+b)(b+d)+(a+c)(c+d)) — integer
    // numerator AND denominator, one division at the edge.
    "q237_cohen_kappa" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val ruleA = lower(col("text")).contains(" the ")
      val ruleB = length(regexp_replace(col("text"), "[^\\x00-\\x7F]", "")) *
        20 >= length(col("text")) * 19
      graft.operators.Agreement.cohenKappa(d, ruleA, ruleB)
    }),

    // Two-sample energy distance (Székely-Rizzo) between en and non-en
    // length distributions — exact O(grid) via the adjacent-gap identity
    // instead of the naive O(n²) pairwise sums; all three sums integer.
    "q239_energy_distance" -> ((s, dir) =>
      graft.operators.EnergyDistance.twoSample(
        Tables.documents(s, dir), "n_chars", col("lang") === "en")),

    // Fleiss' κ across THREE heuristic raters (the-rule, ascii-rule,
    // length-rule) voting en/other per doc: P̄ and P̄e from the integer
    // sums Σn_ij², Σc_j² — one corpus agg + one bounded category agg.
    "q240_fleiss_kappa" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val ruleA = lower(col("text")).contains(" the ")
      val ruleB = length(regexp_replace(col("text"), "[^\\x00-\\x7F]", "")) *
        20 >= length(col("text")) * 19
      val ruleC = col("n_chars") >= 800
      val votes = d.select(col("doc_id"),
        (ruleA.cast("long") + ruleB.cast("long") + ruleC.cast("long"))
          .as("en_cnt"))
      val counts = votes
        .select(col("doc_id"), lit("en").as("category"),
          col("en_cnt").as("cnt"))
        .unionAll(votes.select(col("doc_id"), lit("other").as("category"),
          (lit(3L) - col("en_cnt")).as("cnt")))
      graft.operators.Agreement.fleissKappa(counts, "doc_id", "category",
        "cnt", 3L)
    }),

    // Neyman allocation of a 100-doc labeling budget across sources:
    // n_h ∝ N_h·S_h with integer micro-weights and a pure-integer
    // largest-remainder rounding — no float sum over strata anywhere.
    "q241_neyman_alloc" -> ((s, dir) =>
      graft.operators.Allocation.neyman(
        Tables.documents(s, dir), "source", "n_chars", 100L)
        .orderBy(col("source"))),

    // Information gain of five cheap heuristics about lang='en' — the
    // feature-audit before wiring rules into a curation funnel. One 2×2
    // integer row per feature; all entropy math in-row.
    "q242_info_gain" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      graft.operators.InfoGain.binaryGain(d, Seq(
        "the_rule" -> lower(col("text")).contains(" the "),
        "ascii_rule" -> (length(regexp_replace(col("text"),
          "[^\\x00-\\x7F]", "")) * 20 >= length(col("text")) * 19),
        "len800" -> (col("n_chars") >= 800),
        "http_rule" -> col("text").contains("http"),
        "de_rule" -> lower(col("text")).contains(" de ")),
        col("lang") === "en")
    }),

    // Delete-one-source jackknife influence on the corpus en-share:
    // which crawl moves the headline number. Integer totals broadcast;
    // every leave-one-out estimate computed in-row.
    "q243_jackknife_source" -> ((s, dir) =>
      graft.operators.Jackknife.deleteOneGroup(
        Tables.documents(s, dir), "source", col("lang") === "en")),

    // CUPED variance reduction: per-user pre-period activity (before the
    // corpus midpoint) as covariate for post-period activity. θ and ρ²
    // from six integer sums; squares taken in the double domain.
    "q244_cuped" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(unix_micros(col("ts")).as("us"),
        col("user_id"))
      val mid = ev.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
        .selectExpr("(mn + mx) div 2 AS mid")
      val perUser = ev.crossJoin(broadcast(mid))
        .groupBy(col("user_id"))
        .agg(sum(when(col("us") < col("mid"), 1L).otherwise(0L)).as("x"),
          sum(when(col("us") >= col("mid"), 1L).otherwise(0L)).as("y"))
      graft.operators.Cuped.adjustmentStats(perUser, "x", "y")
    }),

    // Post-hoc power + MDE of the user_id%2 A/B on click rate — the
    // "could this experiment even see the lift" sizing check. Four
    // integers, shared z-quantile literals, the A-S tail both ways.
    "q245_power_calc" -> ((s, dir) =>
      graft.operators.MultipleTesting.twoPropPower(
        Tables.events(s, dir)
          .select(pmod(col("user_id"), lit(2)).cast("long").as("grp"),
            when(col("event_type") === "click", 1L).otherwise(0L).as("hit")),
        "grp", "hit")),

    // Pairwise mutual information between the five q242 heuristics — the
    // rule-REDUNDANCY audit (q242 ranks rules against the label; this
    // says which rules duplicate each other). 10 bounded pairs via a
    // doc-keyed self-join of the stacked rules (fan-out 25 per doc);
    // MI = Σ p·ln(p·n/(rt·ct)) computed IN-ROW from the 2×2 integers.
    "q247_feature_mi" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val feats = Seq(
        "the_rule" -> lower(col("text")).contains(" the "),
        "ascii_rule" -> (length(regexp_replace(col("text"),
          "[^\\x00-\\x7F]", "")) * 20 >= length(col("text")) * 19),
        "len800" -> (col("n_chars") >= 800),
        "http_rule" -> col("text").contains("http"),
        "de_rule" -> lower(col("text")).contains(" de "))
      val stacked = feats.map { case (name, f) =>
        d.select(col("doc_id"), lit(name).as("feature"), f.as("f"))
      }.reduce(_ unionAll _)
      val pairs = stacked.select(col("doc_id"), col("feature").as("fa"),
          col("f").as("va"))
        .join(stacked.select(col("doc_id"), col("feature").as("fb"),
          col("f").as("vb")), Seq("doc_id"))
        .filter(col("fa") < col("fb"))
      val cells = pairs.groupBy(col("fa"), col("fb")).agg(
        sum(when(col("va") && col("vb"), 1L).otherwise(0L)).as("a"),
        sum(when(col("va") && !col("vb"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("va") && col("vb"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("va") && !col("vb"), 1L).otherwise(0L)).as("d"))
      val n = col("a") + col("b") + col("c") + col("d")
      def term(k: org.apache.spark.sql.Column, rt: org.apache.spark.sql.Column,
               ct: org.apache.spark.sql.Column) =
        when(k > 0, (k.cast("double") / n)
          * log(k.cast("double") * n / (rt * ct))).otherwise(lit(0.0))
      val mi = term(col("a"), col("a") + col("b"), col("a") + col("c")) +
        term(col("b"), col("a") + col("b"), col("b") + col("d")) +
        term(col("c"), col("c") + col("d"), col("a") + col("c")) +
        term(col("d"), col("c") + col("d"), col("b") + col("d"))
      cells.select(col("fa"), col("fb"), col("a"), col("b"), col("c"),
          col("d"), round(mi, 6).as("mi"))
        .orderBy(col("fa"), col("fb"))
    }),

    // Cliff's delta ordinal effect size between en and non-en length
    // distributions — integer GT/LT/tie counts from the same distinct-
    // value grid as q239, one division at the edge.
    "q248_cliffs_delta" -> ((s, dir) =>
      graft.operators.EnergyDistance.cliffsDelta(
        Tables.documents(s, dir), "n_chars", col("lang") === "en")),

    // TOST equivalence on the user_id%2 click-rate A/B at margin ±0.02:
    // the "provably no meaningful difference" claim, not just a failed
    // significance test. Both one-sided A-S tails; round-before-compare.
    "q249_tost" -> ((s, dir) =>
      graft.operators.MultipleTesting.tostEquivalence(
        Tables.events(s, dir)
          .select(pmod(col("user_id"), lit(2)).cast("long").as("grp"),
            when(col("event_type") === "click", 1L).otherwise(0L).as("hit")),
        "grp", "hit", margin = 0.02, alpha = 0.05)),

    // Holm-Bonferroni step-down over the q224 per-source z family — the
    // FWER-controlling sibling of BH-FDR; selection on rounded values.
    "q250_holm" -> ((s, dir) =>
      graft.operators.MultipleTesting.holm(
        Tables.documents(s, dir)
          .select(col("source"),
            when(col("lang") === "en", 1L).otherwise(0L).as("hit")),
        "source", "hit", alpha = 0.05)
        .orderBy(col("source"))),

    // Source-concentration audit: HHI and the effective number of
    // sources. HHI = Σn_h²/N² keeps the cross-strata sum INTEGER (a
    // float share sum would be partition-order dependent).
    "q251_hhi" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy(col("source")).agg(count(lit(1)).as("n_h"))
        .agg(count(lit(1)).as("n_sources"), sum(col("n_h")).as("n_docs"),
          sum(col("n_h") * col("n_h")).as("sum_sq"))
        .select(col("n_sources"), col("n_docs"), col("sum_sq"),
          round(col("sum_sq").cast("double") / (col("n_docs") * col("n_docs")), 6)
            .as("hhi"),
          round((col("n_docs") * col("n_docs")).cast("double") / col("sum_sq"), 6)
            .as("eff_sources"))),

    // Embedding-space drift via MMD with random Fourier features
    // (Gretton 2012 / Rahimi-Recht 2007): did the label-0 embedding
    // population move relative to the rest — q239's distributional twin
    // for the VECTOR space, O(n·D·d) with no pairwise kernel. The frozen
    // (w, b) bank is injected as identical decimal literals into both
    // engines; features are rounded to 6dp before the group sums, which
    // makes those sums exact in double and partition-order-independent.
    "q259_mmd_rff" -> ((s, dir) =>
      graft.search.MmdRff.twoSample(
        Tables.embeddings(s, dir), "embedding", col("label") === 0)),

    // Simpson's-paradox audit: does any day-of-week stratum's click-rate
    // direction (variant 1 vs 0) CONTRADICT the pooled direction? The
    // classic trap before shipping a pooled A/B read. Directions are
    // integer cross-multiplication signs (k1·n0 vs k0·n1) — no division
    // anywhere, so the flip flag is exact.
    "q256_simpson" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(
        dayofweek(col("ts")).cast("long").as("dow"),
        pmod(col("user_id"), lit(2)).as("v"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("hit"))
      val strata = e.groupBy(col("dow")).agg(
        sum(when(col("v") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("v") === 0, col("hit")).otherwise(0L)).as("k0"),
        sum(when(col("v") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("v") === 1, col("hit")).otherwise(0L)).as("k1"))
      val pooled = strata.agg(sum(col("n0")).as("pn0"), sum(col("k0")).as("pk0"),
        sum(col("n1")).as("pn1"), sum(col("k1")).as("pk1"))
      def sign(k1: org.apache.spark.sql.Column, n0: org.apache.spark.sql.Column,
               k0: org.apache.spark.sql.Column, n1: org.apache.spark.sql.Column) =
        when(k1 * n0 > k0 * n1, 1L).when(k1 * n0 < k0 * n1, -1L).otherwise(0L)
      strata.crossJoin(broadcast(pooled))
        .select(col("dow"), col("n0"), col("k0"), col("n1"), col("k1"),
          sign(col("k1"), col("n0"), col("k0"), col("n1")).as("dir_stratum"),
          sign(col("pk1"), col("pn0"), col("pk0"), col("pn1")).as("dir_pooled"),
          (sign(col("k1"), col("n0"), col("k0"), col("n1"))
            * sign(col("pk1"), col("pn0"), col("pk0"), col("pn1")) === -1)
            .as("flipped"))
        .orderBy(col("dow"))
    }),

    // Group-sequential monitoring (O'Brien-Fleming, 3 looks): the z at
    // each calendar-third cut against the published OBF boundaries —
    // peeking with integrity, the SPRT's fixed-schedule sibling. Each
    // look's counts are cumulative integer sums from ONE scan; cuts are
    // integer µs thirds of the corpus span.
    "q257_group_sequential" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(unix_micros(col("ts")).as("us"),
        pmod(col("user_id"), lit(2)).as("v"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("hit"))
      val span = e.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
        .selectExpr("mn", "(mx - mn) AS w")
        .selectExpr("mn + (w div 3) AS c1", "mn + ((2 * w) div 3) AS c2",
          "mn + w AS c3")
      val sums = (1 to 3).flatMap { i =>
        val cut = col(s"c$i")
        Seq(
          sum(when(col("us") <= cut && col("v") === 0, 1L).otherwise(0L)).as(s"n0_$i"),
          sum(when(col("us") <= cut && col("v") === 0, col("hit")).otherwise(0L)).as(s"k0_$i"),
          sum(when(col("us") <= cut && col("v") === 1, 1L).otherwise(0L)).as(s"n1_$i"),
          sum(when(col("us") <= cut && col("v") === 1, col("hit")).otherwise(0L)).as(s"k1_$i"))
      }
      val cum = e.crossJoin(broadcast(span)).agg(sums.head, sums.tail: _*)
      val bounds = Map(1 -> 3.471, 2 -> 2.454, 3 -> 2.004)
      // ONE corpus agg, the three looks exploded from its single row — a
      // per-look select would re-run the 12-sum scan three times
      val looks = cum.select(explode(array((1 to 3).map { i =>
        struct(lit(i.toLong).as("look"), col(s"n0_$i").as("n0"),
          col(s"k0_$i").as("k0"), col(s"n1_$i").as("n1"),
          col(s"k1_$i").as("k1"), lit(bounds(i)).as("obf_bound"))
      }: _*)).as("l")).select(col("l.*"))
      val (n0, k0, n1, k1) = (col("n0"), col("k0"), col("n1"), col("k1"))
      val pp = (k0 + k1).cast("double") / (n0 + n1)
      val z = (k1.cast("double") / n1 - k0.cast("double") / n0) /
        sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / n0 + lit(1.0) / n1))
      looks.select(col("look"), n0, k0, n1, k1, round(z, 4).as("z"),
          col("obf_bound"),
          (abs(round(z, 4)) >= col("obf_bound")).as("crossed"))
        .orderBy(col("look"))
    }),

    // Decile lift/gain table for a ranking score (here n_chars ranking
    // lang='en'): the eval every curation-classifier ships with. Decile
    // membership is an exact integer order statistic (rank·10 div n);
    // lift/gain divide integer counts once at the edge.
    "q258_decile_lift" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(s, dir).select(col("doc_id"),
        col("n_chars").as("score"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      val w = Window.orderBy(col("score").desc, col("doc_id"))
      val ranked = d.withColumn("rk", row_number().over(w).cast("long"))
      val n = ranked.agg(count(lit(1)).as("n"), sum(col("y")).as("kk"))
      val deciles = ranked.crossJoin(broadcast(n))
        .withColumn("decile", expr("((rk - 1) * 10) div n") + 1)
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_d"), sum(col("y")).as("k_d"),
          max(col("n")).as("n"), max(col("kk")).as("kk"))
      val cw = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deciles
        .withColumn("cum_k", sum(col("k_d")).over(cw))
        .select(col("decile"), col("n_d"), col("k_d"),
          round(col("k_d").cast("double") * col("n") / (col("n_d") * col("kk")), 4)
            .as("lift"),
          col("cum_k"),
          round(col("cum_k").cast("double") / col("kk"), 4).as("cum_gain"))
        .orderBy(col("decile"))
    }),

    // Token-bucket admission replay per (event_type, ISO-week) over hour
    // ticks (capacity 5, refill 1/tick) — the crawl-politeness budget
    // simulator. PURE integer fold (two longs per key); the q205 shard
    // keying bounds recursion depth for the CTE oracle.
    "q254_token_bucket" -> ((s, dir) => {
      import s.implicits._
      val ticks = Tables.events(s, dir)
        .select(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("t"))
        .groupBy(concat(col("event_type"), lit("#"),
          expr("CAST(t div 168 AS string)")).as("key"), col("t"))
        .agg(count(lit(1)).as("n"))
        .as[graft.operators.TokenBucket.Tick]
      graft.operators.TokenBucket.admitDs(ticks, capacity = 5L,
        refillPerTick = 1L).toDF()
        .select(col("key"), col("t"), col("n"), col("admitted"),
          col("rejected"), col("tokensAfter").as("tokens_after"))
        .orderBy(col("key"), col("t"))
    }),

    // Page-Hinkley drift detector replayed per event_type over daily
    // counts (the q233 fold discipline): running mean from an INTEGER
    // sum, m/min-m state, PH = m − min m, alarm on the ROUNDED statistic.
    "q252_page_hinkley" -> ((s, dir) => {
      import s.implicits._
      val buckets = Tables.events(s, dir)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type").as("key"), col("bucket"), col("n"))
        .as[graft.operators.PageHinkley.BucketCount]
      graft.operators.PageHinkley.detectDs(buckets, delta = 0.5).toDF()
        .select(col("key"), col("bucket"), col("n"),
          round(col("m"), 6).as("m"), round(col("ph"), 6).as("ph"),
          (round(col("ph"), 6) > 20.0).as("alarm"),
          col("nSeen").as("n_seen"))
        .orderBy(col("key"), col("bucket"))
    }),

    // ===== r11 wave: k-sample tests, survival, stratified OR, FDR under
    // dependence, mixture temperature =====

    // Kaplan-Meier survival curve of SESSION durations (seconds, 30-min
    // gap sessions — the q9 sessionization): a session whose last event
    // lies within one gap of the corpus end may still be open and is
    // right-CENSORED; every other session's end is observed. Integer grid
    // cumsums; the survival product folds on the ordered duration grid
    // (operators/Survival.scala). User lifetimes would be degenerate here
    // (every synthetic user stays active to the corpus end — zero deaths).
    "q263_kaplan_meier" -> ((s, dir) => {
      val sess = graft.streaming.Sessionize.sessionSummaries(
          Tables.events(s, dir), "user_id", "ts", "event_id", 1800L)
        .select(expr("unix_micros(sess_start)").as("s_us"),
          expr("unix_micros(sess_end)").as("e_us"))
      val span = Tables.events(s, dir)
        .agg(max(expr("unix_micros(ts)")).as("t1"))
      val subjects = sess.crossJoin(broadcast(span))
        .select(expr("(e_us - s_us) div 1000000").as("dur"),
          when(col("e_us") < col("t1") - lit(1800L * 1000000L), 1L)
            .otherwise(0L).as("ev"))
      graft.operators.Survival.kaplanMeier(subjects, "dur", "ev")
    }),

    // Two-sample Kolmogorov-Smirnov: doc-length distribution, en vs rest.
    // The sup gap stays an integer cross-multiple until the output edge.
    "q264_ks_test" -> ((s, dir) =>
      graft.operators.KSample.ksTwoSample(
        Tables.documents(s, dir)
          .select(when(col("lang") === "en", 0L).otherwise(1L).as("side"),
            col("n_chars")),
        "side", "n_chars")),

    // Kruskal-Wallis H across sources on doc length (global ½-multiple
    // midranks, tie-corrected) — the k-sample companion to q200's
    // Mann-Whitney.
    "q265_kruskal_wallis" -> ((s, dir) =>
      graft.operators.KSample.kruskalWallis(
        Tables.documents(s, dir).select(col("source"), col("n_chars")),
        "source", "n_chars")),

    // Brown-Forsythe median-based variance homogeneity across sources —
    // "do slices differ in SPREAD, not just level" (the prerequisite
    // check before pooling variances in q190-style t tests).
    "q266_brown_forsythe" -> ((s, dir) =>
      graft.operators.KSample.brownForsythe(
        Tables.documents(s, dir).select(col("source"), col("n_chars")),
        "source", "n_chars")),

    // One-way ANOVA F on milli-quantized event values across event types
    // (integer sufficient statistics; quantize-then-sum, the q111 rule).
    "q267_anova_f" -> ((s, dir) =>
      graft.operators.KSample.anovaF(
        Tables.events(s, dir).filter(col("value").isNotNull)
          .select(col("event_type"), round(col("value") * 1000, 0).cast("long").as("mv")),
        "event_type", "mv")),

    // Benjamini-Yekutieli step-up on the q224 per-source z family — FDR
    // control under arbitrary dependence; the harmonic factor accumulates
    // on the ordered rank window.
    "q268_by_fdr" -> ((s, dir) =>
      graft.operators.MultipleTesting.byFdr(
        Tables.documents(s, dir)
          .select(col("source"), when(col("lang") === "en", 1L).otherwise(0L).as("hit")),
        "source", "hit", alpha = 0.05)
        .orderBy(col("source"))),

    // Mantel-Haenszel pooled odds ratio across day-of-week strata —
    // the confounder-adjusted companion to the q256 Simpson audit.
    "q269_mantel_haenszel" -> ((s, dir) =>
      graft.operators.Contingency.mantelHaenszel(
        Tables.events(s, dir).select(
          dayofweek(col("ts")).cast("long").as("dow"),
          pmod(col("user_id"), lit(2)).as("v"),
          when(col("event_type") === "click", 1L).otherwise(0L).as("hit")),
        "dow", "v", "hit")),

    // Temperature-scaled source mixing weights p_s^α / Σ p_s^α (α = 0.7,
    // the mT5/multilingual sampling rule): the knob between proportional
    // (α=1) and uniform (α=0) corpus mixing. Bounded source grid; the
    // normalizer folds on the ordered window; p^α = exp(α·ln p) with the
    // identical literal shape in the oracle.
    "q272_mixture_temperature" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val g = Tables.documents(s, dir).groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
      val tot = g.agg(sum(col("n_docs")).as("nn"))
      val w = Window.orderBy(col("source"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val allW = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      g.crossJoin(broadcast(tot))
        .withColumn("p", col("n_docs").cast("double") / col("nn"))
        .withColumn("w", exp(lit(0.7) * log(col("p"))))
        .withColumn("z", sum(col("w")).over(w))
        .withColumn("z_all", max(col("z")).over(allW)) // max of increasing cumsum
        .select(col("source"), col("n_docs"), round(col("p"), 6).as("p_raw"),
          round(col("w") / col("z_all"), 6).as("p_temp"))
        .orderBy(col("source"))
    }),

    // ===== r11 wave 2: survival comparison, exact/matched categorical
    // tests, ordinal-association panel =====

    // Two-group log-rank test on the q263 session durations, split by
    // user parity: "do the two user cohorts retain sessions equally".
    // O₁ is integer; E₁/V fold on the ordered duration grid
    // (operators/Survival.scala logRank).
    "q273_log_rank" -> ((s, dir) => {
      val sess = graft.streaming.Sessionize.sessionSummaries(
          Tables.events(s, dir), "user_id", "ts", "event_id", 1800L)
        .select(pmod(col("user_id"), lit(2)).cast("long").as("g"),
          expr("unix_micros(sess_start)").as("s_us"),
          expr("unix_micros(sess_end)").as("e_us"))
      val span = Tables.events(s, dir)
        .agg(max(expr("unix_micros(ts)")).as("t1"))
      val subjects = sess.crossJoin(broadcast(span))
        .select(col("g"), expr("(e_us - s_us) div 1000000").as("dur"),
          when(col("e_us") < col("t1") - lit(1800L * 1000000L), 1L)
            .otherwise(0L).as("ev"))
      graft.operators.Survival.logRank(subjects, "dur", "ev", "g")
    }),

    // Nelson-Aalen cumulative hazard + Breslow survival over the SAME
    // censored session durations as q263 — the hazard-scale read of the
    // same curve (KM multiplies survival fractions, NA sums hazards).
    "q274_nelson_aalen" -> ((s, dir) => {
      val sess = graft.streaming.Sessionize.sessionSummaries(
          Tables.events(s, dir), "user_id", "ts", "event_id", 1800L)
        .select(expr("unix_micros(sess_start)").as("s_us"),
          expr("unix_micros(sess_end)").as("e_us"))
      val span = Tables.events(s, dir)
        .agg(max(expr("unix_micros(ts)")).as("t1"))
      val subjects = sess.crossJoin(broadcast(span))
        .select(expr("(e_us - s_us) div 1000000").as("dur"),
          when(col("e_us") < col("t1") - lit(1800L * 1000000L), 1L)
            .otherwise(0L).as("ev"))
      graft.operators.Survival.nelsonAalen(subjects, "dur", "ev")
    }),

    // Fisher's EXACT independence test on the small-margin 2×2
    // "is English over-represented in src7": the factorial-free
    // hypergeometric fold on the bounded support grid (the margin is
    // 1/20 of the corpus — exactly the small-cell regime where q201's
    // χ² approximation is untrustworthy).
    "q275_fisher_exact" -> ((s, dir) =>
      graft.operators.Contingency.fisherExact(
        Tables.documents(s, dir).select(
          when(col("lang") === "en", 1L).otherwise(0L).as("x"),
          when(col("source") === "src7", 1L).otherwise(0L).as("y")),
        "x", "y")),

    // Cochran's Q across k=3 matched binary treatments: for each
    // (user, day) subject, did the user click / purchase / error that
    // day — "do the three action types fire at the same per-day rate".
    // The dense subject×condition grid is built here (absent = 0); every
    // sufficient statistic in the operator is an exact integer sum.
    "q276_cochran_q" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select((col("user_id") * 100000L
          + expr("unix_date(to_date(ts))")).as("subj"), col("event_type"))
      val conds = Seq("click", "purchase", "error")
      val subjects = ev.select(col("subj")).distinct()
      val grid = subjects.crossJoin(broadcast(conds.toDF("cond")))
      val hits = ev.filter(col("event_type").isin(conds: _*))
        .select(col("subj"), col("event_type").as("cond")).distinct()
        .withColumn("h", lit(1L))
      graft.operators.Agreement.cochranQ(
        grid.join(hits, Seq("subj", "cond"), "left")
          .withColumn("h", coalesce(col("h"), lit(0L))),
        "subj", "cond", "h")
    }),

    // Ordinal-association panel (Goodman-Kruskal γ, Somers' D both
    // directions, Stuart τ-c) per source over the SAME length×token bin
    // grid as q210's τ-b — the tie-sensitivity spectrum on a grid where
    // ties dominate. Integer pair counts; one division per statistic.
    "q277_ordinal_assoc" -> ((s, dir) => {
      val binned = Tables.documents(s, dir)
        .select(col("source"),
          expr("n_chars div 64").as("xb"),
          graft.functions.TextOps.wsTokenCount(col("text")).cast("long").as("_y"))
        .select(col("source"), col("xb"), expr("_y div 16").as("yb"))
      graft.operators.RankTests.ordinalAssociation(binned, "source")
        .orderBy(col("source"))
    }),

    // Krippendorff's α with VARIABLE raters per item — the q240 Fleiss
    // panel, but the length-rule rater abstains on short docs
    // (n_chars < 400), which Fleiss' fixed-r cannot model. The one
    // rational-per-item division is regrouped onto the bounded
    // distinct-m grid (operators/Agreement.scala krippendorffAlpha).
    "q278_krippendorff" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val ruleA = lower(col("text")).contains(" the ")
      val ruleB = length(regexp_replace(col("text"), "[^\\x00-\\x7F]", "")) *
        20 >= length(col("text")) * 19
      val ruleC = col("n_chars") >= 800
      val votes = d.select(col("doc_id"),
        (ruleA.cast("long") + ruleB.cast("long")
          + when(col("n_chars") >= 400, ruleC.cast("long")).otherwise(0L))
          .as("en_cnt"),
        (lit(2L) + (col("n_chars") >= 400).cast("long")).as("m"))
      val counts = votes
        .select(col("doc_id"), lit("en").as("category"),
          col("en_cnt").as("cnt"))
        .unionAll(votes.select(col("doc_id"), lit("other").as("category"),
          (col("m") - col("en_cnt")).as("cnt")))
      graft.operators.Agreement.krippendorffAlpha(counts, "doc_id",
        "category", "cnt")
    }),

    // Sample ACF of the daily event-count series at lags 1..7: per-lag
    // sufficient statistics are integer sums from a day+lag equi-join;
    // the ratio is one double formula per LAG with every cross-term
    // cast to double before multiplying (operators/Autocorr.scala).
    "q279_acf" -> ((s, dir) =>
      graft.operators.Autocorr.acf(
        Tables.events(s, dir)
          .groupBy(expr("unix_date(to_date(ts))").as("day"))
          .agg(count(lit(1)).as("x")),
        "day", "x", 7)),

    // Ljung-Box portmanteau over those 7 lags — "is the daily volume
    // white noise". Folds the ROUNDED r_l² on the ordered bounded lag
    // grid; χ²(7, 0.95) = 14.067140 is a shared literal.
    "q280_ljung_box" -> ((s, dir) =>
      graft.operators.Autocorr.ljungBox(
        Tables.events(s, dir)
          .groupBy(expr("unix_date(to_date(ts))").as("day"))
          .agg(count(lit(1)).as("x")),
        "day", "x", 7, crit = 14.06714)),

    // ===== r11 wave 4: robust k-sample, trend/randomness tests, ordered
    // alternatives =====

    // Mood's median test of doc length across sources — the
    // weakest-assumption location test (q267's ANOVA assumes normal
    // spread, q265's KW assumes shift): above/not-above the global
    // type-7 median, χ² on the densified k×2 grid.
    "q284_mood_median" -> ((s, dir) =>
      graft.operators.KSample.moodMedian(
        Tables.documents(s, dir).select(col("source"), col("n_chars")),
        "source", "n_chars")),

    // Mann-Kendall trend over the daily event-count series — the
    // nonparametric drift alarm whose slope companion is q198's
    // Theil-Sen. Pair join on the calendar-bounded day grid; S and the
    // tie-corrected variance numerator exact integers.
    "q285_mann_kendall" -> ((s, dir) =>
      graft.operators.MannKendall.test(
        Tables.events(s, dir)
          .groupBy(expr("unix_date(to_date(ts))").as("day"))
          .agg(count(lit(1)).as("x")),
        "day", "x")),

    // Wald-Wolfowitz runs test on the same series — sign-pattern
    // randomness, the complement of q279's linear ACF.
    "q286_runs_test" -> ((s, dir) =>
      graft.operators.Autocorr.runsTest(
        Tables.events(s, dir)
          .groupBy(expr("unix_date(to_date(ts))").as("day"))
          .agg(count(lit(1)).as("x")),
        "day", "x")),

    // Page's L for the ORDERED alternative view ≤ click ≤ purchase per
    // user (funnel depth): more powerful than q276's any-difference
    // Cochran Q when the order is known. Dense user×condition grid;
    // within-user midranks from the bounded k² pair comparison (2L
    // stays an exact integer).
    "q287_page_trend" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val conds = Seq(("view", 1L), ("click", 2L), ("purchase", 3L))
      val users = ev.select(col("user_id")).distinct()
      val grid = users.crossJoin(broadcast(conds.toDF("cond", "c")))
      val counts = ev.filter(col("event_type").isin(conds.map(_._1): _*))
        .groupBy(col("user_id"), col("event_type").as("cond"))
        .agg(count(lit(1)).as("v"))
      graft.operators.PageTrend.pageL(
        grid.join(counts, Seq("user_id", "cond"), "left")
          .withColumn("v", coalesce(col("v"), lit(0L))),
        "user_id", "c", "v")
    }),

    // Link prediction over the q183 synthetic follow graph: top-20
    // non-adjacent pairs by Adamic-Adar, with common-neighbor/Jaccard/
    // preferential-attachment companions. Candidates from the
    // shared-neighbor equi-join (never all-pairs); the Σ1/ln(deg) fold
    // is regrouped onto the bounded degree grid.
    "q288_link_predict" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select((col("user_id") % 60).as("u"))
      val e1 = ev.select(col("u").as("src"),
        ((col("u") * col("u") + 7) % 60).as("dst"))
      val e2 = ev.select(col("u").as("src"),
        ((col("u") * col("u") * col("u") + 11) % 60).as("dst"))
      graft.operators.LinkPredict.scores(
        e1.unionByName(e2).distinct(), "src", "dst", 20)
    }),

    // Two-sample Cramér-von Mises on doc length, en vs rest — the
    // whole-distribution companion of q264's sup-only KS (a mid-scale
    // hump KS misses, CvM sees). Integer cross-multiple gaps squared in
    // double; the weighted sum folds on the ordered value grid.
    "q289_cvm" -> ((s, dir) =>
      graft.operators.KSample.cramerVonMises(
        Tables.documents(s, dir)
          .select(when(col("lang") === "en", 0L).otherwise(1L).as("side"),
            col("n_chars")),
        "side", "n_chars")),

    // Chatterjee's ξ per source between doc length and token count —
    // the any-functional-dependence coefficient completing the
    // correlation family (q79 Pearson, q223 Spearman, q210 Kendall).
    // Integer rank walks; doc_id is the documented stable tie-break.
    "q290_chatterjee_xi" -> ((s, dir) =>
      graft.operators.RankTests.chatterjeeXi(
        Tables.documents(s, dir)
          .select(col("source"), col("n_chars").as("x"),
            graft.functions.TextOps.wsTokenCount(col("text")).cast("long").as("y"),
            col("doc_id")),
        "source", "x", "y", "doc_id")
        .orderBy(col("source"))),

    // ===== r11 wave 6: concordance, serial correlation, inequality,
    // survey estimation =====

    // Kendall's W: do three corpus metrics (total chars, total tokens,
    // en-doc count) agree on how they ORDER the 20 sources. Midranks
    // from per-rater distinct-value grids — every cross-group sum is an
    // exact ¼-multiple, order-free.
    "q291_kendall_w" -> ((s, dir) => {
      val m = Tables.documents(s, dir).groupBy(col("source")).agg(
        sum(col("n_chars")).as("va"),
        sum(graft.functions.TextOps.wsTokenCount(col("text")).cast("long")).as("vb"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("vc"))
      val long = m.select(lit("chars").as("rater"), col("source").as("item"),
          col("va").as("v"))
        .unionAll(m.select(lit("tokens").as("rater"), col("source").as("item"),
          col("vb").as("v")))
        .unionAll(m.select(lit("enshare").as("rater"), col("source").as("item"),
          col("vc").as("v")))
      graft.operators.Concordance.kendallW(long, "rater", "item", "v")
    }),

    // Friedman's χ² over the q287 user×event-type grid — the unordered
    // within-block rank test (Page's L is its ordered sharpening,
    // Cochran's Q its binary reduction).
    "q292_friedman" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val conds = Seq("view", "click", "purchase")
      val users = ev.select(col("user_id")).distinct()
      val grid = users.crossJoin(broadcast(conds.toDF("cond")))
      val counts = ev.filter(col("event_type").isin(conds: _*))
        .groupBy(col("user_id"), col("event_type").as("cond"))
        .agg(count(lit(1)).as("v"))
      graft.operators.Concordance.friedman(
        grid.join(counts, Seq("user_id", "cond"), "left")
          .withColumn("v", coalesce(col("v"), lit(0L))),
        "user_id", "cond", "v")
    }),

    // Durbin-Watson over the daily event-count series — the one-number
    // serial-correlation read (≈2 white noise); every sufficient
    // statistic an exact integer since demeaning cancels inside Δ.
    "q293_durbin_watson" -> ((s, dir) =>
      graft.operators.Autocorr.durbinWatson(
        Tables.events(s, dir)
          .groupBy(expr("unix_date(to_date(ts))").as("day"))
          .agg(count(lit(1)).as("x")),
        "day", "x")),

    // Inequality panel per source (Theil, Atkinson ε=1, Hoover) —
    // completing the q202 Gini / q251 HHI concentration family with
    // top-, bottom-, and mass-transfer-sensitive indices.
    "q294_inequality" -> ((s, dir) =>
      graft.operators.Inequality.panel(
        Tables.documents(s, dir).select(col("source"), col("n_chars")),
        "source", "n_chars")
        .orderBy(col("source"))),

    // Post-stratified mean of doc length under equal LANGUAGE weights
    // (languages are genuinely unequal — en ≈ 2.5× the others, so the
    // reweight moves the mean and deff > 1) + the Kish design effect
    // pricing it — Neyman's (q241) after-the-fact companion.
    "q295_post_stratified" -> ((s, dir) =>
      graft.operators.PostStratify.equalWeight(
        Tables.documents(s, dir).select(col("lang"), col("n_chars")),
        "lang", "n_chars")),

    // ===== r11 wave 7: Bayesian decision, balance audit, sensitivity =====

    // Bayesian A/B on click-through by user parity: posterior
    // P(p₁ > p₀) under Beta(1,1) priors via fixed 512-point midpoint
    // grid integration (documented convention; q275-style max-centred
    // log-weights). The decision-ready companion to q190/q212/q245.
    "q296_bayes_ab" -> ((s, dir) =>
      graft.operators.BayesAb.betaBinomial(
        Tables.events(s, dir).select(
          pmod(col("user_id"), lit(2)).as("variant"),
          when(col("event_type") === "click", 1L).otherwise(0L).as("hit")),
        "variant", "hit")),

    // Covariate-balance audit of the user-parity split: SMD + variance
    // ratio per covariate (milli-quantized value, hour, day-of-week) —
    // the pre-analysis check that the "random" split balanced the
    // confounders (the q244 CUPED / q256 Simpson design-side sibling).
    "q297_balance_smd" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("g", pmod(col("user_id"), lit(2)))
      val longf = ev.filter(col("value").isNotNull)
        .select(lit("value_milli").as("cov"), col("g"),
          round(col("value") * 1000, 0).cast("long").as("v"))
        .unionAll(ev.select(lit("hour").as("cov"), col("g"),
          hour(col("ts")).cast("long").as("v")))
        .unionAll(ev.select(lit("dow").as("cov"), col("g"),
          dayofweek(col("ts")).cast("long").as("v")))
      graft.operators.Balance.smdPanel(longf, "cov", "g", "v")
    }),

    // E-value sensitivity for the purchase-rate risk ratio by user
    // parity — "how strong a hidden confounder would explain this
    // away"; the q269 Mantel-Haenszel / q256 Simpson companion.
    "q298_e_value" -> ((s, dir) =>
      graft.operators.Contingency.eValue(
        Tables.events(s, dir).select(
          pmod(col("user_id"), lit(2)).as("x"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y")),
        "x", "y")),

    // Ansari-Bradley SCALE test on doc length, en vs rest — completes
    // the two-sample EDF trio (q264 KS sup, q289 CvM mass) with the
    // rank-from-both-ends dispersion read; exact integer score-block
    // range sums on the value grid, parity-branched null moments.
    "q299_ansari_bradley" -> ((s, dir) =>
      graft.operators.KSample.ansariBradley(
        Tables.documents(s, dir)
          .select(when(col("lang") === "en", 0L).otherwise(1L).as("side"),
            col("n_chars")),
        "side", "n_chars")),

    // Trimmed + winsorized mean of doc length per source (10% per
    // tail) — the robust-location panel: integer overlap sums on the
    // per-slice value grid, no raw-row sort anywhere.
    "q300_robust_location" -> ((s, dir) =>
      graft.operators.RobustLocation.panel(
        Tables.documents(s, dir).select(col("source"), col("n_chars")),
        "source", "n_chars", trimPct = 10)
        .orderBy(col("source"))),

    // Hodges-Lehmann shift: the robust "how much longer are en docs"
    // effect size (median of pairwise differences), collapsing the pair
    // product onto the value-grid product — the size companion to
    // q200's Mann-Whitney p-value.
    "q301_hodges_lehmann" -> ((s, dir) =>
      graft.operators.KSample.hodgesLehmann(
        Tables.documents(s, dir)
          .select(when(col("lang") === "en", 0L).otherwise(1L).as("side"),
            col("n_chars")),
        "side", "n_chars")),

    // Vargha-Delaney Â₁₂ — the common-language effect size P(X₁>X₀)+½P(=)
    // with the published magnitude labels (decided on rounded values):
    // the benchmark-comparison standard for "does it matter", next to
    // q301's "by how much".
    "q302_vargha_delaney" -> ((s, dir) =>
      graft.operators.KSample.varghaDelaney(
        Tables.documents(s, dir)
          .select(when(col("lang") === "en", 0L).otherwise(1L).as("side"),
            col("n_chars")),
        "side", "n_chars")),

    // Average precision + best-F1 of the binned token count ranking the
    // "long doc" label (n_chars ≥ 400, the upper ~30% of the corpus) — a
    // genuinely graded, imperfect predictor (the synthetic lang labels
    // carry no text signal, so a lang target would only measure
    // prevalence). The threshold-free PR-curve eval completing the
    // classifier family (q25/q29 fixed-threshold confusions, q174
    // lang-ID eval, q237 calibration). Integer cumsums on the ordered
    // score grid; AP folds on the same grid.
    "q304_avg_precision" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(
          (graft.functions.TextOps.wsTokenCount(col("text")).cast("long"))
            .as("tc"),
          when(col("n_chars") >= 400, 1L).otherwise(0L).as("y"))
        .select(expr("tc div 16").as("score"), col("y"))
      graft.operators.ClassifierEval.averagePrecision(d, "score", "y")
    })
  )

  def oracles: Map[String, String] = Map(
    "q183_kcore" -> {
      val base =
        """WITH f AS (
          |  SELECT DISTINCT user_id % 60 AS a, (user_id * user_id + 7) % 60 AS b FROM events
          |  UNION SELECT DISTINCT user_id % 60, (user_id * user_id * user_id + 11) % 60 FROM events
          |), e0 AS (
          |  SELECT a, b FROM f WHERE a <> b
          |  UNION SELECT b, a FROM f WHERE a <> b
          |)""".stripMargin
      val rounds = (1 to 6).map { r =>
        s""", k$r AS (SELECT a FROM e${r - 1} GROUP BY a HAVING count(*) >= 3)
           |, e$r AS (SELECT e.a, e.b FROM e${r - 1} e
           |          JOIN k$r x ON e.a = x.a JOIN k$r y ON e.b = y.a)""".stripMargin
      }.mkString("\n")
      base + rounds +
        """
          |SELECT a AS node, CAST(count(*) AS BIGINT) AS deg
          |FROM e6 GROUP BY a HAVING count(*) >= 3 ORDER BY node""".stripMargin
    },

    "q184_textrank" -> {
      // 3 unrolled PageRank iterations over the adjacent-token graph —
      // the q67 unrolling discipline applied to a text-derived edge set.
      """WITH toks AS (
        |  SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
        |                     t -> length(t) >= 3) AS t
        |  FROM documents
        |), pr AS (
        |  SELECT z[1] AS w1, z[2] AS w2 FROM (
        |    SELECT unnest(list_zip(t[1:length(t)-1], t[2:length(t)])) AS z
        |    FROM toks WHERE length(t) >= 2)
        |  WHERE z[1] <> z[2]
        |), e AS (
        |  SELECT DISTINCT w1, w2 FROM pr
        |  UNION SELECT DISTINCT w2, w1 FROM pr
        |), deg AS (SELECT w1, count(*) AS d FROM e GROUP BY w1),
        |n AS (SELECT w1 AS node FROM e UNION SELECT w2 FROM e),
        |p0 AS (SELECT node, 1.0 AS r FROM n),
        |c1 AS (SELECT e.w2 AS node, sum(p0.r / deg.d) AS s
        |       FROM e JOIN deg USING (w1) JOIN p0 ON p0.node = e.w1 GROUP BY e.w2),
        |p1 AS (SELECT n.node, 0.15 + 0.85 * coalesce(c1.s, 0) AS r
        |       FROM n LEFT JOIN c1 USING (node)),
        |c2 AS (SELECT e.w2 AS node, sum(p1.r / deg.d) AS s
        |       FROM e JOIN deg USING (w1) JOIN p1 ON p1.node = e.w1 GROUP BY e.w2),
        |p2 AS (SELECT n.node, 0.15 + 0.85 * coalesce(c2.s, 0) AS r
        |       FROM n LEFT JOIN c2 USING (node)),
        |c3 AS (SELECT e.w2 AS node, sum(p2.r / deg.d) AS s
        |       FROM e JOIN deg USING (w1) JOIN p2 ON p2.node = e.w1 GROUP BY e.w2),
        |p3 AS (SELECT n.node, 0.15 + 0.85 * coalesce(c3.s, 0) AS r
        |       FROM n LEFT JOIN c3 USING (node))
        |SELECT node AS term, round(r, 6) AS rank FROM p3
        |ORDER BY rank DESC, term LIMIT 25""".stripMargin
    },

    "q185_readability" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
        |       w -> length(w) > 0)) AS BIGINT) AS n_words,
        |  CAST(len(list_filter(regexp_split_to_array(text, '[.!?]+'),
        |       x -> length(trim(x)) > 0)) AS BIGINT) AS n_sentences,
        |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables,
        |  CASE WHEN n_words > 0 AND n_sentences > 0 THEN
        |    round(206.835 - 1.015 * n_words / n_sentences
        |          - 84.6 * n_syllables / n_words, 4) END AS flesch,
        |  CASE WHEN n_words > 0 AND n_sentences > 0 THEN
        |    round(0.39 * n_words / n_sentences
        |          + 11.8 * n_syllables / n_words - 15.59, 4) END AS fk_grade
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q186_ewma" ->
      """WITH d AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS x
        |  FROM events GROUP BY 1, 2
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY day DESC) AS rn
        |  FROM d
        |), w AS (
        |  SELECT event_type, day, x,
        |         row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
        |  FROM r WHERE rn <= 25
        |)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS m,
        |       CAST(max(day) AS BIGINT) AS last_day,
        |       round(CAST(sum(CASE WHEN i = 1 THEN 2 * x
        |                           ELSE (1::BIGINT << (i - 1)) * x END) AS DOUBLE)
        |             / CAST(1::BIGINT << CAST(max(i) AS INT) AS DOUBLE), 4) AS ewma,
        |       round(CAST(sum(x) AS DOUBLE) / count(*), 4) AS mean_x
        |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q187_fim" ->
      """WITH b AS (
        |  SELECT doc_id, text, length(text) AS L,
        |         greatest(length(text) // 3, 1) AS t3
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, text, L,
        |         t3 + 1 + (doc_id * 37) % t3 AS sp1,
        |         2 * t3 + 1 + (doc_id * 53) % t3 AS sp2
        |  FROM b
        |)
        |SELECT doc_id, CAST(L AS BIGINT) AS n_chars,
        |       CAST(sp1 AS BIGINT) AS sp1, CAST(sp2 AS BIGINT) AS sp2,
        |       '<PRE>' || substr(text, 1, sp1 - 1) ||
        |       '<SUF>' || substr(text, sp2, L) ||
        |       '<MID>' || substr(text, sp1, sp2 - sp1) AS fim
        |FROM p ORDER BY doc_id""".stripMargin,

    "q188_benford" ->
      """WITH c AS (
        |  SELECT l_returnflag,
        |         CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
        |         count(*) AS obs
        |  FROM lineitem WHERE l_extendedprice >= 1
        |  GROUP BY 1, 2
        |), t AS (SELECT l_returnflag, sum(obs) AS n FROM c GROUP BY 1),
        |dg AS (SELECT unnest(generate_series(1, 9)) AS digit),
        |dense AS (
        |  SELECT t.l_returnflag, dg.digit, t.n, coalesce(c.obs, 0) AS obs
        |  FROM t CROSS JOIN dg
        |  LEFT JOIN c ON c.l_returnflag = t.l_returnflag AND c.digit = dg.digit
        |)
        |SELECT l_returnflag, digit, CAST(obs AS BIGINT) AS obs,
        |       round(obs / n, 4) AS share_obs,
        |       round(log10(1.0 + 1.0 / digit), 4) AS share_exp,
        |       round(pow(obs - n * log10(1.0 + 1.0 / digit), 2)
        |             / (n * log10(1.0 + 1.0 / digit)), 6) AS chi2_part
        |FROM dense
        |ORDER BY l_returnflag, digit""".stripMargin,

    "q189_ldiversity" ->
      """WITH g AS (
        |  SELECT c_mktsegment, c_nationkey, count(*) AS k,
        |         count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS l
        |  FROM customer GROUP BY 1, 2
        |)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_groups,
        |       CAST(min(l) AS BIGINT) AS min_l,
        |       CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_weak_groups,
        |       CAST(sum(CASE WHEN l < 3 THEN k ELSE 0 END) AS BIGINT) AS n_rows_weak
        |FROM g GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q190_abtest" ->
      """WITH u AS (
        |  SELECT user_id, count(*) AS n_ev,
        |         max(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS conv,
        |         user_id % 2 AS v
        |  FROM events GROUP BY user_id
        |), a AS (
        |  SELECT
        |    sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS n0,
        |    sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN v = 0 THEN conv ELSE 0 END) AS c0,
        |    sum(CASE WHEN v = 1 THEN conv ELSE 0 END) AS c1,
        |    sum(CASE WHEN v = 0 THEN n_ev ELSE 0 END) AS s0,
        |    sum(CASE WHEN v = 1 THEN n_ev ELSE 0 END) AS s1,
        |    sum(CASE WHEN v = 0 THEN n_ev * n_ev ELSE 0 END) AS q0,
        |    sum(CASE WHEN v = 1 THEN n_ev * n_ev ELSE 0 END) AS q1
        |  FROM u
        |), m AS (
        |  SELECT n0, n1,
        |         CAST(c0 AS DOUBLE) / n0 AS p0d, CAST(c1 AS DOUBLE) / n1 AS p1d,
        |         CAST(c0 + c1 AS DOUBLE) / (n0 + n1) AS pp,
        |         CAST(s0 AS DOUBLE) / n0 AS m0d, CAST(s1 AS DOUBLE) / n1 AS m1d,
        |         (q0 - CAST(s0 AS DOUBLE) * s0 / n0) / (n0 - 1) AS v0,
        |         (q1 - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) AS v1
        |  FROM a
        |)
        |SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
        |       round(p0d, 4) AS p0, round(p1d, 4) AS p1,
        |       round((p1d - p0d) / sqrt(pp * (1.0 - pp) * (1.0 / n0 + 1.0 / n1)), 4) AS z_conv,
        |       round(m0d, 4) AS m0, round(m1d, 4) AS m1,
        |       round((m1d - m0d) / sqrt(v0 / n0 + v1 / n1), 4) AS t_welch,
        |       round(pow(v0 / n0 + v1 / n1, 2)
        |             / (pow(v0 / n0, 2) / (n0 - 1) + pow(v1 / n1, 2) / (n1 - 1)), 2) AS df_welch
        |FROM m""".stripMargin,

    "q191_kneser_ney" ->
      """WITH toks AS (
        |  SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 1) AS t
        |  FROM documents
        |), bg AS (
        |  SELECT u['a'] AS a, u['b'] AS b FROM (
        |    SELECT unnest(list_transform(generate_series(1, greatest(len(t) - 1, 0)),
        |           i -> {'a': t[i], 'b': t[i+1]})) AS u
        |    FROM toks)
        |), cab AS (SELECT a, b, count(*) AS cab FROM bg GROUP BY a, b),
        |ctx AS (SELECT a, sum(cab) AS ca, count(*) AS n1r FROM cab GROUP BY a),
        |cont AS (SELECT b, count(*) AS n1l FROM cab GROUP BY b),
        |ty AS (SELECT count(*) AS tt FROM cab)
        |SELECT cab.a, cab.b, CAST(cab.cab AS BIGINT) AS cab,
        |       round(greatest(cab.cab - 0.75, 0.0) / ctx.ca
        |             + 0.75 * ctx.n1r / ctx.ca * (CAST(cont.n1l AS DOUBLE) / ty.tt), 6) AS pkn
        |FROM cab JOIN ctx USING (a) JOIN cont USING (b) CROSS JOIN ty
        |ORDER BY cab DESC, a, b LIMIT 25""".stripMargin,

    "q192_attribution" -> {
      // the q183/q67 unrolling discipline: 12 fixed mass-propagation
      // rounds per chain (base + one removal chain per channel), CTEs
      // generated mechanically
      val prolog =
        """WITH e AS (
          |  SELECT user_id, event_type, event_id,
          |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          |  FROM events
          |), c AS (
          |  SELECT *, min(CASE WHEN event_type = 'purchase' THEN rn END)
          |              OVER (PARTITION BY user_id) AS cvrn
          |  FROM e
          |), k AS (
          |  SELECT user_id, rn, cvrn,
          |         CASE WHEN rn = cvrn THEN 'CONV' ELSE event_type END AS state,
          |         max(rn) OVER (PARTITION BY user_id) AS lastrn
          |  FROM c WHERE cvrn IS NULL OR rn <= cvrn
          |), st AS (
          |  SELECT coalesce(lag(state) OVER (PARTITION BY user_id ORDER BY rn), 'START') AS src,
          |         state AS dst
          |  FROM k
          |  UNION ALL
          |  SELECT state, 'NULL' FROM k WHERE cvrn IS NULL AND rn = lastrn
          |), tc AS (SELECT src, dst, count(*) AS n FROM st GROUP BY 1, 2),
          |tp AS (SELECT src, dst, CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY src) AS p FROM tc),
          |tb AS (SELECT src, dst, p FROM tp
          |       UNION ALL SELECT 'CONV', 'CONV', 1.0 UNION ALL SELECT 'NULL', 'NULL', 1.0)""".stripMargin
      def chain(tag: String, table: String): String =
        s", m${tag}0 AS (SELECT 'START' AS state, 1.0 AS m)" +
          (1 to 12).map(i =>
            s", m$tag$i AS (SELECT t.dst AS state, sum(m.m * t.p) AS m" +
              s" FROM m$tag${i - 1} m JOIN $table t ON t.src = m.state GROUP BY t.dst)").mkString
      // COUPLING: the Spark side derives the channel set from the observed
      // transition matrix; SQL can't unroll a removal chain per unknown
      // channel, so the oracle pins the generator's current event_type
      // domain. A regenerated dataset with a new/removed event_type will
      // (correctly) break this gate — update this list alongside it.
      val channels = Seq("click", "error", "signup", "view")
      val removals = channels.zipWithIndex.map { case (ch, i) =>
        s""", t$i AS (SELECT src, CASE WHEN dst = '$ch' THEN 'NULL' ELSE dst END AS dst,
           |          sum(p) AS p FROM tp WHERE src <> '$ch' GROUP BY 1, 2),
           |tb$i AS (SELECT src, dst, p FROM t$i
           |         UNION ALL SELECT 'CONV', 'CONV', 1.0 UNION ALL SELECT 'NULL', 'NULL', 1.0)""".stripMargin +
          chain(s"r$i", s"tb$i")
      }.mkString
      val finals = channels.zipWithIndex.map { case (ch, i) =>
        s"""SELECT '$ch' AS channel,
           |  round((SELECT m FROM mb12 WHERE state = 'CONV'), 6) AS p_conv,
           |  round(coalesce((SELECT m FROM mr${i}12 WHERE state = 'CONV'), 0), 6) AS p_removed,
           |  round(((SELECT m FROM mb12 WHERE state = 'CONV')
           |         - coalesce((SELECT m FROM mr${i}12 WHERE state = 'CONV'), 0))
           |        / (SELECT m FROM mb12 WHERE state = 'CONV'), 6) AS removal_effect""".stripMargin
      }.mkString("\nUNION ALL\n")
      prolog + chain("b", "tb") + removals + "\n" + finals + "\nORDER BY channel"
    },

    "q193_bootstrap_ci" ->
      """WITH h AS (
        |  SELECT event_type, value, event_id,
        |         CAST(('0x' || substr(md5(event_id || ':0'), 1, 15)) AS BIGINT) AS h0,
        |         CAST(('0x' || substr(md5(event_id || ':1'), 1, 15)) AS BIGINT) AS h1
        |  FROM events
        |), r AS (
        |  SELECT event_type, value, h0, h1, unnest(generate_series(0, 29)) AS b
        |  FROM h
        |), ww AS (
        |  SELECT event_type, value, b,
        |         ((CASE WHEN b < 15 THEN h0 ELSE h1 END
        |           // (1::BIGINT << ((b % 15) * 2))) % 2)
        |         + ((CASE WHEN b < 15 THEN h0 ELSE h1 END
        |           // (1::BIGINT << ((b % 15) * 2 + 1))) % 2) AS w
        |  FROM r
        |),
        |mb AS (SELECT event_type, b,
        |       CASE WHEN sum(w) > 0 THEN sum(w * value) / sum(w) END AS mb
        |       FROM ww GROUP BY 1, 2),
        |mb2 AS (SELECT * FROM mb WHERE mb IS NOT NULL),
        |rk AS (SELECT event_type, b, mb,
        |       row_number() OVER (PARTITION BY event_type ORDER BY mb, b) AS rn,
        |       count(*) OVER (PARTITION BY event_type) AS cnt FROM mb2),
        |ci AS (SELECT event_type,
        |       round(min(CASE WHEN rn = 2 THEN mb END), 4) AS ci_lo,
        |       round(min(CASE WHEN rn = cnt - 1 THEN mb END), 4) AS ci_hi
        |       FROM rk GROUP BY 1),
        |base AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         round(avg(value), 4) AS mean_v FROM events GROUP BY 1)
        |SELECT base.event_type, base.n, base.mean_v, ci.ci_lo, ci.ci_hi
        |FROM base JOIN ci USING (event_type) ORDER BY event_type""".stripMargin,

    "q194_quantile_norm" ->
      """WITH rws AS (SELECT source, doc_id, n_chars FROM documents),
        |tot AS (SELECT count(*) AS n_all FROM rws),
        |sn AS (SELECT source, count(*) AS n_src FROM rws GROUP BY 1),
        |rk AS (SELECT source, doc_id, n_chars,
        |       row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rank_src
        |       FROM rws),
        |grid AS (SELECT n_chars AS v, count(*) AS c FROM rws GROUP BY 1),
        |g2 AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum_hi,
        |       sum(c) OVER (ORDER BY v) - c + 1 AS cum_lo FROM grid),
        |p AS (SELECT rk.source, rk.doc_id, rk.n_chars, rk.rank_src, sn.n_src,
        |      CASE WHEN sn.n_src = 1 THEN (tot.n_all + 1) // 2
        |           ELSE ((rk.rank_src - 1) * (tot.n_all - 1)) // (sn.n_src - 1) + 1 END AS p
        |      FROM rk JOIN sn USING (source) CROSS JOIN tot)
        |SELECT p.source, p.doc_id, p.n_chars, CAST(p.rank_src AS BIGINT) AS rank_src,
        |       CAST(p.n_src AS BIGINT) AS n_src, g2.v AS norm_value
        |FROM p JOIN g2 ON p.p >= g2.cum_lo AND p.p <= g2.cum_hi
        |ORDER BY doc_id""".stripMargin,

    "q195_assoc_rules" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |         CAST(epoch_us(ts) // 1000000 AS BIGINT) AS s,
        |         TRY_CAST(NULLIF(regexp_extract(props, '"k"\s*:\s*(\d+)', 1), '') AS BIGINT) AS item
        |  FROM events
        |), g AS (
        |  SELECT user_id, event_id, item, s,
        |         CASE WHEN lag(s) OVER w IS NULL OR s - lag(s) OVER w > 1800
        |              THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id)
        |), sn AS (
        |  SELECT user_id, item,
        |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY s, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
        |  FROM g
        |), si AS (
        |  SELECT DISTINCT user_id || '#' || sess_no AS sid, item FROM sn
        |), isup AS (SELECT item, count(*) AS n_item FROM si GROUP BY 1),
        |tot AS (SELECT count(DISTINCT sid) AS n_total FROM si),
        |pr AS (
        |  SELECT a.item AS antecedent, b.item AS consequent, count(*) AS n_ab
        |  FROM si a JOIN si b ON a.sid = b.sid AND a.item <> b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |)
        |SELECT pr.antecedent, pr.consequent, CAST(pr.n_ab AS BIGINT) AS n_ab,
        |       CAST(ia.n_item AS BIGINT) AS n_a, CAST(ib.n_item AS BIGINT) AS n_b,
        |       CAST(tot.n_total AS BIGINT) AS n_total,
        |       round(CAST(pr.n_ab AS DOUBLE) / ia.n_item, 6) AS confidence,
        |       round(CAST(pr.n_ab AS DOUBLE) * tot.n_total / (ia.n_item * ib.n_item), 6) AS lift
        |FROM pr JOIN isup ia ON pr.antecedent = ia.item
        |        JOIN isup ib ON pr.consequent = ib.item CROSS JOIN tot
        |ORDER BY lift DESC, confidence DESC, antecedent, consequent LIMIT 40""".stripMargin,

    "q196_jaro_linkage" ->
      """WITH x AS (
        |  SELECT p_brand AS block, p_partkey, p_name,
        |         lag(p_name) OVER (PARTITION BY p_brand ORDER BY p_name, p_partkey) AS prev
        |  FROM part
        |), s AS (
        |  SELECT block,
        |         CASE WHEN prev IS NOT NULL
        |              THEN round(jaro_winkler_similarity(p_name, prev), 6) END AS jw
        |  FROM x
        |)
        |SELECT block, CAST(count(*) AS BIGINT) AS n_recs,
        |       CAST(count(jw) AS BIGINT) AS n_pairs,
        |       CAST(sum(CASE WHEN jw >= 0.85 THEN 1 ELSE 0 END) AS BIGINT) AS n_match_lo,
        |       CAST(sum(CASE WHEN jw >= 0.95 THEN 1 ELSE 0 END) AS BIGINT) AS n_match_hi,
        |       max(jw) AS max_jw
        |FROM s GROUP BY block ORDER BY block""".stripMargin,

    "q197_weekday_seasonal" ->
      """WITH d AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS x
        |  FROM events GROUP BY 1, 2
        |), t AS (
        |  SELECT event_type, day, x,
        |         sum(x) OVER w AS s7, count(*) OVER w AS n7
        |  FROM d
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |               RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |)
        |SELECT event_type, CAST(day % 7 AS BIGINT) AS dow,
        |       CAST(count(*) AS BIGINT) AS n_days,
        |       round(CAST(sum(7 * x - s7) AS DOUBLE) / (7.0 * count(*)), 4) AS seasonal_dev,
        |       round(CAST(sum(x) AS DOUBLE) / count(*), 4) AS mean_x
        |FROM t WHERE n7 = 7
        |GROUP BY 1, 2 ORDER BY event_type, dow""".stripMargin,

    "q198_theil_sen" ->
      """WITH d AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS x
        |  FROM events GROUP BY 1, 2
        |), p AS (
        |  SELECT a.event_type, a.day AS d1, b.day AS d2,
        |         CAST(b.x - a.x AS DOUBLE) / (b.day - a.day) AS slope
        |  FROM d a JOIN d b ON a.event_type = b.event_type AND a.day < b.day
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY slope, d1, d2) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS np
        |  FROM p
        |)
        |SELECT event_type, CAST(max(np) AS BIGINT) AS n_pairs,
        |       round(avg(slope), 6) AS slope_ts
        |FROM r WHERE rn = (np + 1) // 2 OR rn = (np + 2) // 2
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q199_changepoint" ->
      """WITH d AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS x
        |  FROM events GROUP BY 1, 2
        |), s AS (
        |  SELECT event_type, day,
        |         row_number() OVER (PARTITION BY event_type ORDER BY day) AS k,
        |         sum(x) OVER (PARTITION BY event_type ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix,
        |         count(*) OVER (PARTITION BY event_type) AS n,
        |         sum(x) OVER (PARTITION BY event_type) AS total
        |  FROM d
        |), sc AS (
        |  SELECT *, abs(n * prefix - k * total) AS absd,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY abs(n * prefix - k * total) DESC, day) AS rn
        |  FROM s
        |)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days, CAST(day AS BIGINT) AS cp_day,
        |       CAST(k AS BIGINT) AS cp_index, CAST(absd AS BIGINT) AS cusum_peak,
        |       round(CAST(absd AS DOUBLE) / (CAST(n AS DOUBLE) * total), 6) AS peak_share
        |FROM sc WHERE rn = 1 ORDER BY event_type""".stripMargin,

    "q200_mann_whitney" ->
      """WITH r AS (SELECT CAST(user_id % 2 AS INT) AS g, value AS v FROM events),
        |grid AS (
        |  SELECT v, count(*) AS c,
        |         sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS c1
        |  FROM r GROUP BY v
        |), rk AS (
        |  SELECT v, c, c1,
        |         coalesce(sum(c) OVER (ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumBefore
        |  FROM grid
        |), m AS (
        |  SELECT cumBefore + (c + 1.0) / 2 AS midrank, c, c1 FROM rk
        |), a AS (
        |  SELECT sum(c) AS nTot, sum(c1) AS n1, sum(midrank * c1) AS r1,
        |         sum(c * c * c - c) AS tieSum
        |  FROM m
        |)
        |, v AS (
        |  SELECT *, CAST(nTot - n1 AS DOUBLE) * n1 / 12
        |            * ((nTot + 1) - CAST(tieSum AS DOUBLE) / (nTot * (nTot - 1))) AS var
        |  FROM a
        |)
        |SELECT CAST(nTot - n1 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
        |       r1 AS rank_sum_1,
        |       r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2 AS u1,
        |       CASE WHEN var > 0 THEN
        |         round((r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2
        |                - CAST(nTot - n1 AS DOUBLE) * n1 / 2) / sqrt(var), 4) END AS z,
        |       CASE WHEN nTot - n1 > 0 AND n1 > 0 THEN
        |         round((r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2)
        |               / (CAST(nTot - n1 AS DOUBLE) * n1), 4) END AS effect
        |FROM v""".stripMargin,

    "q201_chi2_indep" ->
      """WITH cells AS (
        |  SELECT event_type AS r, user_id % 2 AS c, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), rm AS (SELECT r, sum(n) AS nr FROM cells GROUP BY 1),
        |cm AS (SELECT c, sum(n) AS nc FROM cells GROUP BY 1),
        |tot AS (SELECT sum(n) AS nn, count(DISTINCT r) AS nrows,
        |        count(DISTINCT c) AS ncols FROM cells),
        |dense AS (
        |  SELECT rm.r, cm.c, rm.nr, cm.nc, coalesce(cells.n, 0) AS n
        |  FROM rm CROSS JOIN cm LEFT JOIN cells USING (r, c)
        |),
        |sc AS (
        |  SELECT tot.nrows, tot.ncols, tot.nn,
        |         pow(dense.n - CAST(dense.nr AS DOUBLE) * dense.nc / tot.nn, 2)
        |           / (CAST(dense.nr AS DOUBLE) * dense.nc / tot.nn) AS part
        |  FROM dense CROSS JOIN tot
        |)
        |SELECT CAST(nrows AS BIGINT) AS nrows, CAST(ncols AS BIGINT) AS ncols,
        |       CAST(nn AS BIGINT) AS n,
        |       CASE WHEN least(nrows, ncols) > 1 THEN round(sum(part), 4) END AS chi2,
        |       CAST((nrows - 1) * (ncols - 1) AS BIGINT) AS dof,
        |       CASE WHEN least(nrows, ncols) > 1 THEN
        |         round(sqrt(sum(part) / (nn * (least(nrows, ncols) - 1))), 4) END AS cramers_v
        |FROM sc GROUP BY nrows, ncols, nn""".stripMargin,

    "q202_gini" ->
      """WITH grid AS (
        |  SELECT source, CAST(n_chars AS BIGINT) AS v, count(*) AS c
        |  FROM documents GROUP BY 1, 2
        |), rk AS (
        |  SELECT source, v, c,
        |         coalesce(sum(c) OVER (PARTITION BY source ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumBefore
        |  FROM grid
        |), a AS (
        |  SELECT source, sum(c) AS n, sum(c * v) AS t,
        |         sum(v * (c * cumBefore + c * (c + 1) // 2)) AS s
        |  FROM rk GROUP BY 1
        |), bh AS (
        |  SELECT rk.source,
        |         sum(greatest(0, least(rk.c, a.n // 2 - rk.cumBefore)) * rk.v) AS bh
        |  FROM rk JOIN a USING (source) GROUP BY 1
        |)
        |SELECT a.source, CAST(a.n AS BIGINT) AS n_items, CAST(a.t AS BIGINT) AS total,
        |       CASE WHEN a.t > 0 AND a.n > 0 THEN
        |         round(2.0 * a.s / (CAST(a.n AS DOUBLE) * a.t)
        |               - CAST(a.n + 1 AS DOUBLE) / a.n, 6) END AS gini,
        |       CASE WHEN a.t > 0 THEN round(CAST(bh.bh AS DOUBLE) / a.t, 6) END AS bottom_half_share
        |FROM a JOIN bh USING (source) ORDER BY a.source""".stripMargin,

    // same binned cell grid, same pair join, same integer counts
    "q210_kendall_tau" ->
      """WITH d AS (
        |  SELECT source, n_chars // 64 AS xb,
        |         len(list_filter(string_split_regex(text, '\s+'), t -> len(t) > 0)) // 16 AS yb
        |  FROM documents),
        |cells AS (SELECT source, xb, yb, count(*) AS c FROM d GROUP BY 1, 2, 3),
        |cd AS (
        |  SELECT a.source,
        |         sum(CASE WHEN (b.xb - a.xb) * (b.yb - a.yb) > 0 THEN a.c * b.c ELSE 0 END) AS nc,
        |         sum(CASE WHEN (b.xb - a.xb) * (b.yb - a.yb) < 0 THEN a.c * b.c ELSE 0 END) AS nd
        |  FROM cells a JOIN cells b ON a.source = b.source
        |    AND (a.xb < b.xb OR (a.xb = b.xb AND a.yb < b.yb))
        |  GROUP BY 1),
        |tot AS (SELECT source, sum(c) AS n, sum(c) * (sum(c) - 1) // 2 AS n0 FROM cells GROUP BY 1),
        |tx AS (SELECT source, sum(cx * (cx - 1) // 2) AS n1
        |       FROM (SELECT source, xb, sum(c) AS cx FROM cells GROUP BY 1, 2) GROUP BY 1),
        |ty AS (SELECT source, sum(cy * (cy - 1) // 2) AS n2
        |       FROM (SELECT source, yb, sum(c) AS cy FROM cells GROUP BY 1, 2) GROUP BY 1)
        |SELECT tot.source, CAST(n AS BIGINT) AS n,
        |       CAST(coalesce(nc, 0) AS BIGINT) AS concordant,
        |       CAST(coalesce(nd, 0) AS BIGINT) AS discordant,
        |       CASE WHEN n0 > n1 AND n0 > n2 THEN
        |         round(CAST(coalesce(nc, 0) - coalesce(nd, 0) AS DOUBLE)
        |               / sqrt(CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n2 AS DOUBLE)), 6) END AS tau_b
        |FROM tot LEFT JOIN cd USING (source) JOIN tx USING (source) JOIN ty USING (source)
        |ORDER BY tot.source""".stripMargin,

    // identical Wilson/z float shapes; z is the literal on both sides
    "q212_prop_ztest" ->
      """WITH e AS (
        |  SELECT user_id % 2 AS variant,
        |         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS hit
        |  FROM events),
        |g AS (SELECT variant, CAST(count(*) AS BIGINT) AS n, CAST(sum(hit) AS BIGINT) AS k
        |      FROM e GROUP BY 1),
        |w AS (SELECT variant, n, k,
        |        round(CAST(k AS DOUBLE) / n, 6) AS p,
        |        round(((k + 1.959963984540054*1.959963984540054/2) / n
        |          + (-1.0) * (1.959963984540054 * sqrt(CAST(k AS DOUBLE)/n * (1.0 - CAST(k AS DOUBLE)/n) / n
        |              + 1.959963984540054*1.959963984540054 / (4.0 * n * n))))
        |          / (1.0 + 1.959963984540054*1.959963984540054 / n), 6) AS wilson_lo,
        |        round(((k + 1.959963984540054*1.959963984540054/2) / n
        |          + 1.0 * (1.959963984540054 * sqrt(CAST(k AS DOUBLE)/n * (1.0 - CAST(k AS DOUBLE)/n) / n
        |              + 1.959963984540054*1.959963984540054 / (4.0 * n * n))))
        |          / (1.0 + 1.959963984540054*1.959963984540054 / n), 6) AS wilson_hi
        |      FROM g),
        |a AS (SELECT n AS n0, k AS k0, p AS p0, wilson_lo AS lo0, wilson_hi AS hi0 FROM w WHERE variant = 0),
        |b AS (SELECT n AS n1, k AS k1, p AS p1, wilson_lo AS lo1, wilson_hi AS hi1 FROM w WHERE variant = 1)
        |SELECT n0, k0, p0, lo0, hi0, n1, k1, p1, lo1, hi1,
        |       CASE WHEN pp > 0 AND pp < 1 THEN
        |         round((CAST(k1 AS DOUBLE)/n1 - CAST(k0 AS DOUBLE)/n0)
        |               / sqrt(pp * (1.0 - pp) * (1.0/n0 + 1.0/n1)), 4) END AS z
        |FROM (SELECT *, CAST(k0 + k1 AS DOUBLE) / (n0 + n1) AS pp FROM a, b)""".stripMargin,

    // same (i, j)-keyed sufficient statistics, pairs built in-row from the
    // doubly-unnested array (dims 1-based); ALL 2016 pairs emitted
    "q214_dim_corr" ->
      """WITH p AS (
        |  SELECT di.i AS di, dj.i AS dj,
        |         CAST(embedding AS DOUBLE[])[di.i] AS xi,
        |         CAST(embedding AS DOUBLE[])[dj.i] AS xj
        |  FROM embeddings,
        |       (SELECT unnest(generate_series(1, 64)) AS i) di,
        |       (SELECT unnest(generate_series(1, 64)) AS i) dj
        |  WHERE di.i < dj.i),
        |s AS (
        |  SELECT di, dj, CAST(count(*) AS BIGINT) AS n,
        |         sum(xi) AS si, sum(xj) AS sj,
        |         sum(xi * xi) AS sii, sum(xj * xj) AS sjj,
        |         sum(xi * xj) AS sij
        |  FROM p GROUP BY di, dj)
        |SELECT CAST(di AS BIGINT) AS dim_i, CAST(dj AS BIGINT) AS dim_j,
        |       round((n * sij - si * sj)
        |             / (sqrt(n * sii - si * si) * sqrt(n * sjj - sj * sj)), 6) + 0.0 AS r
        |FROM s
        |ORDER BY dim_i, dim_j""".stripMargin,

    "q215_sprt" -> sprtSql,

    // exact quantiles only (type-7 interpolation = Spark `percentile`);
    // bound_ok is pinned TRUE — the Spark side computes the digest's rank
    // error, and a violation breaks the hash.
    "q206_tdigest_bound" ->
      """WITH qq AS (
        |  SELECT event_type,
        |         unnest([0.05, 0.25, 0.5, 0.75, 0.95]) AS q,
        |         unnest(quantile_cont(value, [0.05, 0.25, 0.5, 0.75, 0.95])) AS exact_v
        |  FROM events GROUP BY event_type
        |)
        |SELECT event_type, q, round(exact_v, 6) AS exact_q, TRUE AS bound_ok
        |FROM qq ORDER BY event_type, q""".stripMargin,

    // Recursive-CTE replay of StreamEwma.step (the q92/q126 discipline):
    // base row per key = empty state; each iteration advances every key
    // one bucket through the SAME forecast-then-fold arithmetic. All
    // operands are dyadic rationals, so DOUBLE agrees bit-for-bit.
    "q204_ewma_replay" ->
      """WITH RECURSIVE
        |d AS (SELECT event_type AS key, epoch_us(ts) // 86400000000 AS bucket,
        |             CAST(count(*) AS BIGINT) AS n
        |      FROM events GROUP BY 1, 2),
        |s AS (SELECT key, bucket, n,
        |             row_number() OVER (PARTITION BY key ORDER BY bucket) AS rn
        |      FROM d),
        |f AS (
        |  SELECT key, 0::BIGINT AS rn, CAST(0 AS DOUBLE) AS ewma,
        |         0::BIGINT AS n_seen, 0::BIGINT AS bucket, 0::BIGINT AS n,
        |         CAST(0 AS DOUBLE) AS forecast
        |  FROM (SELECT DISTINCT key FROM s)
        |  UNION ALL
        |  SELECT s.key, s.rn,
        |         CASE WHEN f.n_seen = 0 THEN CAST(s.n AS DOUBLE)
        |              ELSE (s.n + f.ewma) / 2 END,
        |         f.n_seen + 1, s.bucket, s.n,
        |         CASE WHEN f.n_seen = 0 THEN CAST(s.n AS DOUBLE) ELSE f.ewma END
        |  FROM f JOIN s ON s.key = f.key AND s.rn = f.rn + 1
        |)
        |SELECT key, bucket, n, round(forecast, 6) AS forecast,
        |       round(n - forecast, 6) AS err, round(ewma, 6) AS ewma, n_seen
        |FROM f WHERE rn >= 1 ORDER BY key, bucket""".stripMargin,

    "q205_dgim_replay" -> dgimReplaySql,

    // Welford recurrence replayed with the EXACT operation order of
    // StreamRateAnomaly.fold/score: cnt+1; mean' = mean + (x-mean)/cnt';
    // m2' = m2 + (x-mean)*(x-mean'). Score uses the PRIOR state (f.*).
    "q233_rate_replay" ->
      """WITH RECURSIVE
        |d AS (SELECT event_type AS key, epoch_us(ts) // 86400000000 AS bucket,
        |             CAST(count(*) AS BIGINT) AS n
        |      FROM events GROUP BY 1, 2),
        |s AS (SELECT key, bucket, n,
        |             row_number() OVER (PARTITION BY key ORDER BY bucket) AS rn
        |      FROM d),
        |f AS (
        |  SELECT key, 0::BIGINT AS rn, 0::BIGINT AS cnt,
        |         CAST(0 AS DOUBLE) AS mean, CAST(0 AS DOUBLE) AS m2,
        |         0::BIGINT AS bucket, 0::BIGINT AS n,
        |         CAST(0 AS DOUBLE) AS z, CAST(0 AS DOUBLE) AS bmean,
        |         0::BIGINT AS nprior
        |  FROM (SELECT DISTINCT key FROM s)
        |  UNION ALL
        |  SELECT s.key, s.rn,
        |         f.cnt + 1,
        |         f.mean + (s.n - f.mean) / (f.cnt + 1),
        |         f.m2 + (s.n - f.mean)
        |              * (s.n - (f.mean + (s.n - f.mean) / (f.cnt + 1))),
        |         s.bucket, s.n,
        |         CASE WHEN f.cnt < 2 THEN CAST(0 AS DOUBLE)
        |              WHEN sqrt(f.m2 / (f.cnt - 1)) = 0.0 THEN
        |                CASE WHEN s.n = f.mean THEN CAST(0 AS DOUBLE)
        |                     WHEN s.n > f.mean THEN CAST('Infinity' AS DOUBLE)
        |                     ELSE CAST('-Infinity' AS DOUBLE) END
        |              ELSE (s.n - f.mean) / sqrt(f.m2 / (f.cnt - 1)) END,
        |         f.mean, f.cnt
        |  FROM f JOIN s ON s.key = f.key AND s.rn = f.rn + 1
        |)
        |SELECT key, bucket, n,
        |       CASE WHEN isinf(z) THEN z ELSE round(z, 6) END AS z,
        |       round(bmean, 6) AS baseline_mean, nprior AS n_prior
        |FROM f WHERE rn >= 1 ORDER BY key, bucket""".stripMargin,

    // batch identity = event_id % 3 (the shard rule that built the three
    // feed files); the dim drops the most frequent type on both sides
    "q232_enrich_replay" ->
      """WITH dim AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS type_n
        |  FROM events GROUP BY 1
        |  QUALIFY row_number() OVER (ORDER BY count(*) DESC, event_type) > 1
        |)
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(count(DISTINCT e.event_id % 3) AS BIGINT) AS n_batches,
        |       CAST(max(d.type_n) AS BIGINT) AS type_n
        |FROM events e JOIN dim d ON e.event_type = d.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // first-by-(ms, id) per bucket — epoch_us // 1000 mirrors
    // java.sql.Timestamp.getTime's millisecond floor exactly
    "q220_keepfirst_replay" ->
      """WITH e AS (
        |  SELECT CAST(event_id AS BIGINT) AS doc_id, event_type AS bucket,
        |         epoch_us(ts) // 1000 AS ms
        |  FROM events),
        |w AS (
        |  SELECT doc_id, bucket,
        |         first_value(doc_id) OVER (PARTITION BY bucket
        |           ORDER BY ms, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_doc_id
        |  FROM e)
        |SELECT doc_id, bucket, doc_id = first_doc_id AS kept, first_doc_id
        |FROM w ORDER BY bucket, doc_id""".stripMargin,

    // the guarantee set computed exactly: hash31-sharded token counts
    // with the integer threshold n*(k+1) > n_shard (k=30, 8 shards);
    // the Spark side's MG-candidate semi-join must keep every row
    "q221_trending_mg" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                x -> len(x) > 1)) AS token
        |  FROM documents),
        |exact AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS n,
        |         CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT)
        |           % 2147483647 % 8 AS shard
        |  FROM toks GROUP BY token),
        |tot AS (SELECT shard, sum(n) AS n_shard FROM exact GROUP BY shard)
        |SELECT e.shard, e.token, e.n, CAST(t.n_shard AS BIGINT) AS n_shard
        |FROM exact e JOIN tot t USING (shard)
        |WHERE e.n * 31 > t.n_shard
        |ORDER BY e.shard, e.token""".stripMargin,

    // midranks from distinct-value grids (exact ½-multiples), Pearson
    // over ranks with the identical expression shape
    "q223_spearman" ->
      """WITH d AS (
        |  SELECT source AS g, n_chars AS x,
        |         len(list_filter(string_split_regex(text, '\s+'),
        |             t -> len(t) > 0)) AS y
        |  FROM documents),
        |rx AS (
        |  SELECT g, x, CAST(cum - c AS DOUBLE) + CAST(c + 1 AS DOUBLE) / 2.0 AS rx
        |  FROM (SELECT g, x, count(*) AS c,
        |               sum(count(*)) OVER (PARTITION BY g ORDER BY x
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |        FROM d GROUP BY g, x)),
        |ry AS (
        |  SELECT g, y, CAST(cum - c AS DOUBLE) + CAST(c + 1 AS DOUBLE) / 2.0 AS ry
        |  FROM (SELECT g, y, count(*) AS c,
        |               sum(count(*)) OVER (PARTITION BY g ORDER BY y
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |        FROM d GROUP BY g, y)),
        |j AS (SELECT d.g, rx.rx, ry.ry
        |      FROM d JOIN rx ON d.g = rx.g AND d.x = rx.x
        |             JOIN ry ON d.g = ry.g AND d.y = ry.y),
        |s AS (SELECT g, CAST(count(*) AS BIGINT) AS n, sum(rx) AS sx, sum(ry) AS sy,
        |             sum(rx * rx) AS sxx, sum(ry * ry) AS syy, sum(rx * ry) AS sxy
        |      FROM j GROUP BY g)
        |SELECT g AS source, n,
        |       CASE WHEN n * sxx > sx * sx AND n * syy > sy * sy THEN
        |         round((n * sxy - sx * sy)
        |               / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) + 0.0
        |       END AS rho
        |FROM s ORDER BY source""".stripMargin,

    // z from integer sufficient statistics; Abramowitz-Stegun 7.1.26
    // two-sided p (identical literal shape), rounded BEFORE the BH
    // step-up comparison; rank ties broken by source name
    "q224_bh_fdr" ->
      """WITH g AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS k
        |  FROM documents GROUP BY 1),
        |t AS (SELECT sum(n) AS nn, sum(k) AS kk FROM g),
        |z AS (
        |  SELECT source, n, k,
        |         CASE WHEN kk > 0 AND kk < nn AND nn - n > 0 THEN
        |           (CAST(k AS DOUBLE) / n - CAST(kk - k AS DOUBLE) / (nn - n))
        |             / sqrt((CAST(kk AS DOUBLE) / nn) * (1.0 - CAST(kk AS DOUBLE) / nn)
        |                    * (1.0 / n + 1.0 / (nn - n))) END AS z
        |  FROM g, t),
        |p AS (
        |  SELECT source, n, k, z,
        |         coalesce(round(2.0 * (exp(-abs(z) * abs(z) / 2.0) / 2.5066282746310002
        |           * (tt * (0.319381530 + tt * (-0.356563782 + tt * (1.781477937
        |              + tt * (-1.821255978 + tt * 1.330274429)))))), 6), 1.0) AS p
        |  FROM (SELECT *, 1.0 / (1.0 + 0.2316419 * abs(z)) AS tt FROM z)),
        |r AS (SELECT *, CAST(row_number() OVER (ORDER BY p, source) AS BIGINT) AS i,
        |             CAST(count(*) OVER () AS BIGINT) AS m
        |      FROM p),
        |c AS (SELECT *, round(i * 0.05 / m, 6) AS bh_cut,
        |             p <= round(i * 0.05 / m, 6) AS under
        |      FROM r),
        |km AS (SELECT max(CASE WHEN under THEN i END) AS kmax FROM c)
        |SELECT source, n, k, round(z, 4) AS z, p, i AS p_rank, bh_cut,
        |       (kmax IS NOT NULL AND i <= kmax) AS rejected
        |FROM c, km ORDER BY source""".stripMargin,

    // covariance cells via the q214 in-row fan-out; 3 power steps
    // unrolled CTE-for-CTE; sign fixed on dim 1; Rayleigh λ at the edge
    "q225_power_iter" ->
      """WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |x AS (
        |  SELECT di.i AS i, dj.i AS j, v[di.i] AS xi, v[dj.i] AS xj
        |  FROM e, (SELECT unnest(generate_series(1, 64)) AS i) di,
        |         (SELECT unnest(generate_series(1, 64)) AS i) dj),
        |cov AS (
        |  SELECT i, j, sij / n - (si / n) * (sj / n) AS c
        |  FROM (SELECT i, j, CAST(count(*) AS BIGINT) AS n, sum(xi) AS si,
        |               sum(xj) AS sj, sum(xi * xj) AS sij
        |        FROM x GROUP BY i, j)),
        |v0 AS (SELECT unnest(generate_series(1, 64)) AS j, 1.0 / sqrt(64.0) AS vj),
        |w1 AS (SELECT cov.i, sum(cov.c * v0.vj) AS wi FROM cov JOIN v0 USING (j) GROUP BY 1),
        |n1 AS (SELECT sqrt(sum(wi * wi)) AS nrm FROM w1),
        |v1 AS (SELECT i AS j, wi / nrm AS vj FROM w1, n1),
        |w2 AS (SELECT cov.i, sum(cov.c * v1.vj) AS wi FROM cov JOIN v1 USING (j) GROUP BY 1),
        |n2 AS (SELECT sqrt(sum(wi * wi)) AS nrm FROM w2),
        |v2 AS (SELECT i AS j, wi / nrm AS vj FROM w2, n2),
        |w3 AS (SELECT cov.i, sum(cov.c * v2.vj) AS wi FROM cov JOIN v2 USING (j) GROUP BY 1),
        |n3 AS (SELECT sqrt(sum(wi * wi)) AS nrm FROM w3),
        |v3 AS (SELECT i AS j, wi / nrm AS vj FROM w3, n3),
        |lam AS (
        |  SELECT sum(cov.c * a.vj * b.vj) AS lambda
        |  FROM cov JOIN v3 a ON cov.j = a.j JOIN v3 b ON cov.i = b.j),
        |sgn AS (SELECT CASE WHEN vj < 0 THEN -1.0 ELSE 1.0 END AS sgn FROM v3 WHERE j = 1)
        |SELECT CAST(v3.j AS BIGINT) AS dim, round(v3.vj * sgn, 6) + 0.0 AS v,
        |       round(lambda, 6) + 0.0 AS lambda
        |FROM v3, sgn, lam ORDER BY dim""".stripMargin,

    "q227_ess_weights" ->
      """WITH g AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n,
        |         sum(CAST(n_chars AS BIGINT)) AS sw,
        |         sum(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT)) AS sww
        |  FROM documents GROUP BY 1)
        |SELECT source, n,
        |       round(CAST(sw AS DOUBLE) * sw / sww, 4) AS ess,
        |       round(CAST(sw AS DOUBLE) * sw / sww / n, 6) AS ess_ratio
        |FROM g ORDER BY source""".stripMargin,

    // integer sufficient statistics; the identical closed form at the edge
    "q228_cochran_armitage" ->
      """WITH g AS (
        |  SELECT user_id % 3 AS d, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS k
        |  FROM events GROUP BY 1),
        |a AS (SELECT sum(n) AS nn, sum(k) AS kk, sum(d * k) AS swk,
        |             sum(d * n) AS swn, sum(d * d * n) AS swwn,
        |             CAST(count(*) AS BIGINT) AS levels
        |      FROM g)
        |SELECT CAST(nn AS BIGINT) AS n, CAST(kk AS BIGINT) AS k, levels,
        |       round(CAST(kk AS DOUBLE) / nn, 6) AS pbar,
        |       round((CAST(swk AS DOUBLE) - CAST(swn AS DOUBLE) * kk / nn)
        |             / sqrt((CAST(kk AS DOUBLE) / nn) * (1.0 - CAST(kk AS DOUBLE) / nn)
        |                    * (CAST(swwn AS DOUBLE) - CAST(swn AS DOUBLE) * swn / nn)), 4)
        |         AS z_trend
        |FROM a""".stripMargin,

    // pow at the edge; normalization to mean 1 over classes
    "q230_cb_weights" ->
      """WITH g AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |         (1.0 - 0.999) / (1.0 - pow(0.999, count(*))) AS w
        |  FROM documents GROUP BY 1),
        |t AS (SELECT sum(w) AS sw, CAST(count(*) AS BIGINT) AS c FROM g)
        |SELECT lang, n, round(w, 6) AS w_raw,
        |       round(w * c / sw, 6) AS w_norm
        |FROM g, t ORDER BY lang""".stripMargin,

    // k = ceil((n+1)*9/10) in pure integer arithmetic; threshold is the
    // k-th order statistic (NULL = +inf when the calibration half is too
    // small for the level, and then every test row is covered)
    "q235_conformal" ->
      """WITH lb AS (SELECT source, doc_id, n_chars,
        |                    CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 100 AS b
        |             FROM documents),
        |cal AS (SELECT source, doc_id, n_chars FROM lb WHERE b < 50),
        |tst AS (SELECT source, doc_id, n_chars FROM lb WHERE b >= 50),
        |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n_cal,
        |              CAST(((count(*) + 1) * 9 + 9) // 10 AS BIGINT) AS k
        |       FROM cal GROUP BY 1),
        |rk AS (SELECT source, n_chars,
        |              row_number() OVER (PARTITION BY source
        |                                 ORDER BY n_chars, doc_id) AS rn
        |       FROM cal),
        |thr AS (SELECT sz.source, sz.n_cal, sz.k, rk.n_chars AS threshold
        |        FROM sz LEFT JOIN rk ON rk.source = sz.source AND rk.rn = sz.k)
        |SELECT t.source, max(th.n_cal) AS n_cal, max(th.k) AS k,
        |       CAST(max(th.threshold) AS BIGINT) AS threshold,
        |       CAST(count(*) AS BIGINT) AS n_test,
        |       CAST(sum(CASE WHEN th.threshold IS NULL
        |                       OR t.n_chars <= th.threshold
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
        |       round(CAST(sum(CASE WHEN th.threshold IS NULL
        |                             OR t.n_chars <= th.threshold
        |                           THEN 1 ELSE 0 END) AS DOUBLE)
        |             / count(*), 4) AS coverage
        |FROM tst t JOIN thr th ON th.source = t.source
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the two heuristics and the A-S tail rendered with the q212 shapes;
    // DuckDB regexp_replace needs the 'g' flag to match Spark's
    // replace-all default
    "q236_mcnemar" ->
      """WITH r AS (
        |  SELECT (lang = 'en') AS truth,
        |         contains(lower(text), ' the ') AS ra,
        |         length(regexp_replace(text, '[^\x00-\x7F]', '', 'g')) * 20
        |           >= length(text) * 19 AS rb
        |  FROM documents),
        |g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN (ra = truth) AND (rb = truth) THEN 1 ELSE 0 END) AS BIGINT) AS both_ok,
        |         CAST(sum(CASE WHEN (ra = truth) AND NOT (rb = truth) THEN 1 ELSE 0 END) AS BIGINT) AS a_only,
        |         CAST(sum(CASE WHEN NOT (ra = truth) AND (rb = truth) THEN 1 ELSE 0 END) AS BIGINT) AS b_only,
        |         CAST(sum(CASE WHEN NOT (ra = truth) AND NOT (rb = truth) THEN 1 ELSE 0 END) AS BIGINT) AS both_wrong
        |  FROM r),
        |c AS (SELECT *, CASE WHEN a_only + b_only = 0 THEN 0.0
        |                     ELSE CAST((a_only - b_only) * (a_only - b_only) AS DOUBLE)
        |                          / (a_only + b_only) END AS chi2raw
        |      FROM g),
        |z AS (SELECT *, sqrt(chi2raw) AS zz,
        |             1.0 / (1.0 + 0.2316419 * sqrt(chi2raw)) AS tt FROM c)
        |SELECT n, both_ok, a_only, b_only, both_wrong,
        |       round(chi2raw, 6) AS chi2,
        |       CASE WHEN a_only + b_only = 0 THEN 1.0
        |            ELSE round(2.0 * (exp(-zz * zz / 2.0) / 2.5066282746310002
        |              * (tt * (0.319381530 + tt * (-0.356563782 + tt * (1.781477937
        |                 + tt * (-1.821255978 + tt * 1.330274429)))))), 6) END AS p
        |FROM z""".stripMargin,

    "q237_cohen_kappa" ->
      """WITH r AS (
        |  SELECT contains(lower(text), ' the ') AS ra,
        |         length(regexp_replace(text, '[^\x00-\x7F]', '', 'g')) * 20
        |           >= length(text) * 19 AS rb
        |  FROM documents),
        |g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |         CAST(sum(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |         CAST(sum(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |         CAST(sum(CASE WHEN NOT ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM r)
        |SELECT n, a, b, c, d,
        |       round(CAST(a + d AS DOUBLE) / n, 6) AS po,
        |       round(CAST((a + b) * (a + c) + (c + d) * (b + d) AS DOUBLE)
        |             / (n * n), 6) AS pe,
        |       CASE WHEN (a + b) * (b + d) + (a + c) * (c + d) = 0 THEN 0.0
        |            ELSE round(CAST(2 * (a * d - b * c) AS DOUBLE)
        |                       / ((a + b) * (b + d) + (a + c) * (c + d)), 6)
        |            END AS kappa
        |FROM g""".stripMargin,

    // adjacent-gap identity over the distinct-value grid — every pair
    // straddling gap t contributes gap once: Nleft(t) * Nright(t)
    "q239_energy_distance" ->
      """WITH grid AS (
        |  SELECT n_chars AS v,
        |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS cx,
        |         CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS cy
        |  FROM documents GROUP BY 1),
        |c AS (
        |  SELECT v, cx, cy,
        |         sum(cx) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lx,
        |         sum(cy) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ly,
        |         sum(cx) OVER () AS nx, sum(cy) OVER () AS ny,
        |         lead(v) OVER (ORDER BY v) - v AS gap
        |  FROM grid),
        |s AS (
        |  SELECT CAST(max(nx) AS BIGINT) AS n_x, CAST(max(ny) AS BIGINT) AS n_y,
        |         CAST(sum(gap * lx * (nx - lx)) AS BIGINT) AS s_xx,
        |         CAST(sum(gap * ly * (ny - ly)) AS BIGINT) AS s_yy,
        |         CAST(sum(gap * (lx + ly) * (nx + ny - lx - ly)) AS BIGINT) AS s_comb
        |  FROM c WHERE gap IS NOT NULL)
        |SELECT n_x, n_y, s_xx, s_yy, s_comb - s_xx - s_yy AS s_xy,
        |       round(CAST(s_comb - s_xx - s_yy AS DOUBLE) / (n_x * n_y), 6) AS e_xy,
        |       round(2.0 * s_xx / (n_x * n_x), 6) AS e_xx,
        |       round(2.0 * s_yy / (n_y * n_y), 6) AS e_yy,
        |       round(2.0 * (s_comb - s_xx - s_yy) / (n_x * n_y)
        |             - 2.0 * s_xx / (n_x * n_x)
        |             - 2.0 * s_yy / (n_y * n_y), 6) AS d2
        |FROM s""".stripMargin,

    // integer micro-weights then pure-integer largest-remainder rounding
    "q241_neyman_alloc" ->
      """WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |                  CAST(sum(n_chars) AS BIGINT) AS sx,
        |                  CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
        |           FROM documents GROUP BY 1),
        |w AS (SELECT source, n,
        |             CAST(round(n * (CASE WHEN n > 1
        |                 THEN sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
        |                           / (n - 1))
        |                 ELSE 0.0 END) * 1e6, 0) AS BIGINT) AS w_int
        |      FROM g),
        |t AS (SELECT CAST(sum(w_int) AS BIGINT) AS w_tot FROM w),
        |q AS (SELECT source, n, w_int,
        |             CAST(CASE WHEN w_tot > 0 THEN (100 * w_int) // w_tot END AS BIGINT) AS floor_alloc,
        |             CAST(CASE WHEN w_tot > 0 THEN (100 * w_int) % w_tot END AS BIGINT) AS rem
        |      FROM w, t),
        |r AS (SELECT *, CAST(row_number() OVER (ORDER BY rem DESC, source) AS BIGINT) AS rrank,
        |             CAST(100 - sum(floor_alloc) OVER () AS BIGINT) AS leftover
        |      FROM q)
        |SELECT source, n, w_int, floor_alloc, rem,
        |       CAST(floor_alloc + CASE WHEN rrank <= leftover THEN 1 ELSE 0 END AS BIGINT) AS n_alloc
        |FROM r ORDER BY source""".stripMargin,

    // per-feature 2x2 integer cells; all entropy terms in fixed order
    "q242_info_gain" ->
      """WITH f AS (
        |  SELECT 'the_rule' AS feature, contains(lower(text), ' the ') AS f, (lang = 'en') AS y FROM documents
        |  UNION ALL
        |  SELECT 'ascii_rule', length(regexp_replace(text, '[^\x00-\x7F]', '', 'g')) * 20 >= length(text) * 19, (lang = 'en') FROM documents
        |  UNION ALL
        |  SELECT 'len800', n_chars >= 800, (lang = 'en') FROM documents
        |  UNION ALL
        |  SELECT 'http_rule', contains(text, 'http'), (lang = 'en') FROM documents
        |  UNION ALL
        |  SELECT 'de_rule', contains(lower(text), ' de '), (lang = 'en') FROM documents),
        |cc AS (SELECT feature,
        |              CAST(sum(CASE WHEN f AND y THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |              CAST(sum(CASE WHEN f AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |              CAST(sum(CASE WHEN NOT f AND y THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |              CAST(sum(CASE WHEN NOT f AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS d
        |       FROM f GROUP BY 1),
        |e AS (SELECT *, a + b + c + d AS n, a + b AS nf, c + d AS nn FROM cc),
        |h AS (SELECT *,
        |        CASE WHEN a + c > 0 THEN -(CAST(a + c AS DOUBLE) / n) * ln(CAST(a + c AS DOUBLE) / n) ELSE 0.0 END
        |      + CASE WHEN b + d > 0 THEN -(CAST(b + d AS DOUBLE) / n) * ln(CAST(b + d AS DOUBLE) / n) ELSE 0.0 END AS hy,
        |        CASE WHEN nf > 0 THEN (CAST(nf AS DOUBLE) / n)
        |          * (CASE WHEN a > 0 THEN -(CAST(a AS DOUBLE) / nf) * ln(CAST(a AS DOUBLE) / nf) ELSE 0.0 END
        |           + CASE WHEN b > 0 THEN -(CAST(b AS DOUBLE) / nf) * ln(CAST(b AS DOUBLE) / nf) ELSE 0.0 END)
        |          ELSE 0.0 END
        |      + CASE WHEN nn > 0 THEN (CAST(nn AS DOUBLE) / n)
        |          * (CASE WHEN c > 0 THEN -(CAST(c AS DOUBLE) / nn) * ln(CAST(c AS DOUBLE) / nn) ELSE 0.0 END
        |           + CASE WHEN d > 0 THEN -(CAST(d AS DOUBLE) / nn) * ln(CAST(d AS DOUBLE) / nn) ELSE 0.0 END)
        |          ELSE 0.0 END AS hcond
        |      FROM e)
        |SELECT feature, a, b, c, d, round(hy, 6) AS h_label,
        |       round(hy - hcond, 6) AS info_gain
        |FROM h ORDER BY feature""".stripMargin,

    "q243_jackknife_source" ->
      """WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_h,
        |                  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS k_h
        |           FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_h) AS BIGINT) AS nn, CAST(sum(k_h) AS BIGINT) AS kk FROM g)
        |SELECT source, n_h, k_h,
        |       round(CAST(kk AS DOUBLE) / nn, 6) AS theta,
        |       CASE WHEN nn > n_h THEN round(CAST(kk - k_h AS DOUBLE) / (nn - n_h), 6) END AS theta_del,
        |       CASE WHEN nn > n_h THEN round(CAST(kk AS DOUBLE) / nn
        |                                     - CAST(kk - k_h AS DOUBLE) / (nn - n_h), 6) END AS influence
        |FROM g, t ORDER BY source""".stripMargin,

    // six integer sums; rho2 squared in the double domain (the gate's
    // overflow guard), identical products -> identical doubles
    "q244_cuped" ->
      """WITH b AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events),
        |u AS (SELECT user_id,
        |             CAST(sum(CASE WHEN epoch_us(ts) < mid THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |             CAST(sum(CASE WHEN epoch_us(ts) >= mid THEN 1 ELSE 0 END) AS BIGINT) AS y
        |      FROM events, b GROUP BY 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |             CAST(sum(x * y) AS BIGINT) AS sxy,
        |             CAST(sum(x * x) AS BIGINT) AS sxx,
        |             CAST(sum(y * y) AS BIGINT) AS syy
        |      FROM u)
        |SELECT n, sx, sy, sxy, sxx, syy,
        |       CASE WHEN n * sxx - sx * sx > 0
        |            THEN round(CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx), 6) END AS theta,
        |       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |            THEN round(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
        |                       / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6)
        |            END AS rho2
        |FROM s""".stripMargin,

    // the A-S tail both ways (Φ via 1−SF / SF with abs: bit-equal to the
    // gate's sign-flip form); z quantiles as shared decimal literals
    "q245_power_calc" ->
      """WITH e AS (SELECT user_id % 2 AS grp,
        |                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS hit
        |           FROM events),
        |g AS (SELECT CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |             CAST(sum(CASE WHEN grp = 0 AND hit = 1 THEN 1 ELSE 0 END) AS BIGINT) AS k1,
        |             CAST(sum(CASE WHEN grp <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |             CAST(sum(CASE WHEN grp <> 0 AND hit = 1 THEN 1 ELSE 0 END) AS BIGINT) AS k2
        |      FROM e),
        |x AS (SELECT *, CAST(k1 AS DOUBLE) / n1 AS p1d, CAST(k2 AS DOUBLE) / n2 AS p2d FROM g),
        |y AS (SELECT *, sqrt(p1d * (1.0 - p1d) / n1 + p2d * (1.0 - p2d) / n2) AS se FROM x),
        |z AS (SELECT *, abs(p1d - p2d) / se - 1.959963984540054 AS t1,
        |             -(abs(p1d - p2d) / se) - 1.959963984540054 AS t2
        |      FROM y),
        |w AS (SELECT *, 1.0 / (1.0 + 0.2316419 * abs(t1)) AS u1,
        |             1.0 / (1.0 + 0.2316419 * abs(t2)) AS u2
        |      FROM z),
        |v AS (SELECT *,
        |        exp(-t1 * t1 / 2.0) / 2.5066282746310002
        |          * (u1 * (0.319381530 + u1 * (-0.356563782 + u1 * (1.781477937
        |             + u1 * (-1.821255978 + u1 * 1.330274429))))) AS sf1,
        |        exp(-t2 * t2 / 2.0) / 2.5066282746310002
        |          * (u2 * (0.319381530 + u2 * (-0.356563782 + u2 * (1.781477937
        |             + u2 * (-1.821255978 + u2 * 1.330274429))))) AS sf2
        |      FROM w)
        |SELECT n1, k1, n2, k2, round(p1d, 6) AS p1, round(p2d, 6) AS p2,
        |       round(se, 6) AS se,
        |       CASE WHEN se > 0 THEN
        |         round((CASE WHEN t1 >= 0 THEN 1.0 - sf1 ELSE sf1 END)
        |               + (CASE WHEN t2 >= 0 THEN 1.0 - sf2 ELSE sf2 END), 6) END AS power,
        |       CASE WHEN se > 0 THEN
        |         round((1.959963984540054 + 0.8416212335729143) * se, 6) END AS mde80
        |FROM v""".stripMargin,

    // MI terms in the same in-row order as the gate: a, b, c, d
    "q247_feature_mi" ->
      """WITH f AS (
        |  SELECT doc_id, 'the_rule' AS feature, contains(lower(text), ' the ') AS f FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'ascii_rule', length(regexp_replace(text, '[^\x00-\x7F]', '', 'g')) * 20 >= length(text) * 19 FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'len800', n_chars >= 800 FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'http_rule', contains(text, 'http') FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'de_rule', contains(lower(text), ' de ') FROM documents),
        |p AS (SELECT l.feature AS fa, r.feature AS fb, l.f AS va, r.f AS vb
        |      FROM f l JOIN f r ON l.doc_id = r.doc_id AND l.feature < r.feature),
        |cc AS (SELECT fa, fb,
        |              CAST(sum(CASE WHEN va AND vb THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |              CAST(sum(CASE WHEN va AND NOT vb THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |              CAST(sum(CASE WHEN NOT va AND vb THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |              CAST(sum(CASE WHEN NOT va AND NOT vb THEN 1 ELSE 0 END) AS BIGINT) AS d
        |       FROM p GROUP BY 1, 2),
        |e AS (SELECT *, a + b + c + d AS n FROM cc)
        |SELECT fa, fb, a, b, c, d,
        |  round(
        |    CASE WHEN a > 0 THEN (CAST(a AS DOUBLE) / n) * ln(CAST(a AS DOUBLE) * n / ((a + b) * (a + c))) ELSE 0.0 END
        |  + CASE WHEN b > 0 THEN (CAST(b AS DOUBLE) / n) * ln(CAST(b AS DOUBLE) * n / ((a + b) * (b + d))) ELSE 0.0 END
        |  + CASE WHEN c > 0 THEN (CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) * n / ((c + d) * (a + c))) ELSE 0.0 END
        |  + CASE WHEN d > 0 THEN (CAST(d AS DOUBLE) / n) * ln(CAST(d AS DOUBLE) * n / ((c + d) * (b + d))) ELSE 0.0 END, 6) AS mi
        |FROM e ORDER BY fa, fb""".stripMargin,

    // same grid as q239; GT/LT/tie counts integer, one division
    "q248_cliffs_delta" ->
      """WITH grid AS (
        |  SELECT n_chars AS v,
        |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS cx,
        |         CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS cy
        |  FROM documents GROUP BY 1),
        |c AS (
        |  SELECT v, cx, cy,
        |         sum(cx) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lx,
        |         sum(cx) OVER () AS nx, sum(cy) OVER () AS ny
        |  FROM grid)
        |SELECT CAST(max(nx) AS BIGINT) AS n_x, CAST(max(ny) AS BIGINT) AS n_y,
        |       CAST(sum(cy * (nx - lx)) AS BIGINT) AS gt,
        |       CAST(sum(cy * (lx - cx)) AS BIGINT) AS lt,
        |       CAST(sum(cy * cx) AS BIGINT) AS ties,
        |       round(CAST(sum(cy * (nx - lx)) - sum(cy * (lx - cx)) AS DOUBLE)
        |             / (max(nx) * max(ny)), 6) AS delta
        |FROM c""".stripMargin,

    // both one-sided A-S tails; signed SF via the sign-split (1-SF(-z)
    // below zero); equivalence decided on the rounded p
    "q249_tost" ->
      """WITH e AS (SELECT user_id % 2 AS grp,
        |                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS hit
        |           FROM events),
        |g AS (SELECT CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |             CAST(sum(CASE WHEN grp = 0 AND hit = 1 THEN 1 ELSE 0 END) AS BIGINT) AS k1,
        |             CAST(sum(CASE WHEN grp <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |             CAST(sum(CASE WHEN grp <> 0 AND hit = 1 THEN 1 ELSE 0 END) AS BIGINT) AS k2
        |      FROM e),
        |x AS (SELECT *, CAST(k1 AS DOUBLE) / n1 - CAST(k2 AS DOUBLE) / n2 AS d,
        |             sqrt((CAST(k1 AS DOUBLE) / n1) * (1.0 - CAST(k1 AS DOUBLE) / n1) / n1
        |                  + (CAST(k2 AS DOUBLE) / n2) * (1.0 - CAST(k2 AS DOUBLE) / n2) / n2) AS se
        |      FROM g),
        |z AS (SELECT *, (d + 0.02) / se AS z1, (0.02 - d) / se AS z2 FROM x),
        |w AS (SELECT *, 1.0 / (1.0 + 0.2316419 * abs(z1)) AS u1,
        |             1.0 / (1.0 + 0.2316419 * abs(z2)) AS u2
        |      FROM z),
        |v AS (SELECT *,
        |        exp(-z1 * z1 / 2.0) / 2.5066282746310002
        |          * (u1 * (0.319381530 + u1 * (-0.356563782 + u1 * (1.781477937
        |             + u1 * (-1.821255978 + u1 * 1.330274429))))) AS sf1,
        |        exp(-z2 * z2 / 2.0) / 2.5066282746310002
        |          * (u2 * (0.319381530 + u2 * (-0.356563782 + u2 * (1.781477937
        |             + u2 * (-1.821255978 + u2 * 1.330274429))))) AS sf2
        |      FROM w),
        |q AS (SELECT *,
        |        CASE WHEN se > 0 THEN
        |          round(greatest(CASE WHEN z1 >= 0 THEN sf1 ELSE 1.0 - sf1 END,
        |                         CASE WHEN z2 >= 0 THEN sf2 ELSE 1.0 - sf2 END), 6) END AS p_tost
        |      FROM v)
        |SELECT n1, k1, n2, k2, round(d, 6) AS d, round(se, 6) AS se,
        |       p_tost, p_tost <= 0.05 AS equivalent
        |FROM q""".stripMargin,

    // the q224 family with the step-down cut alpha/(m-i+1); rejection
    // runs to the first failure
    "q250_holm" ->
      """WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |                  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS k
        |           FROM documents GROUP BY 1),
        |t AS (SELECT sum(n) AS nn, sum(k) AS kk FROM g),
        |z AS (
        |  SELECT source, n, k,
        |         CASE WHEN kk > 0 AND kk < nn AND nn - n > 0 THEN
        |           (CAST(k AS DOUBLE) / n - CAST(kk - k AS DOUBLE) / (nn - n))
        |             / sqrt((CAST(kk AS DOUBLE) / nn) * (1.0 - CAST(kk AS DOUBLE) / nn)
        |                    * (1.0 / n + 1.0 / (nn - n))) END AS z
        |  FROM g, t),
        |p AS (
        |  SELECT source, n, k, z,
        |         coalesce(round(2.0 * (exp(-abs(z) * abs(z) / 2.0) / 2.5066282746310002
        |           * (tt * (0.319381530 + tt * (-0.356563782 + tt * (1.781477937
        |              + tt * (-1.821255978 + tt * 1.330274429)))))), 6), 1.0) AS p
        |  FROM (SELECT *, 1.0 / (1.0 + 0.2316419 * abs(z)) AS tt FROM z)),
        |r AS (SELECT *, CAST(row_number() OVER (ORDER BY p, source) AS BIGINT) AS i,
        |             CAST(count(*) OVER () AS BIGINT) AS m
        |      FROM p),
        |c AS (SELECT *, round(0.05 / (m - i + 1), 6) AS holm_cut,
        |             p <= round(0.05 / (m - i + 1), 6) AS under
        |      FROM r),
        |kf AS (SELECT min(CASE WHEN NOT under THEN i END) AS kfail FROM c)
        |SELECT source, n, k, round(z, 4) AS z, p, i AS p_rank, holm_cut,
        |       (kfail IS NULL OR i < kfail) AS rejected
        |FROM c, kf ORDER BY source""".stripMargin,

    "q251_hhi" ->
      """WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_h FROM documents GROUP BY 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n_sources,
        |             CAST(sum(n_h) AS BIGINT) AS n_docs,
        |             CAST(sum(n_h * n_h) AS BIGINT) AS sum_sq
        |      FROM g)
        |SELECT n_sources, n_docs, sum_sq,
        |       round(CAST(sum_sq AS DOUBLE) / (n_docs * n_docs), 6) AS hhi,
        |       round(CAST(n_docs * n_docs AS DOUBLE) / sum_sq, 6) AS eff_sources
        |FROM s""".stripMargin,

    // rendered from the SAME frozen (w, b) Scala doubles the gate uses
    "q259_mmd_rff" -> graft.search.MmdRff.oracleSql("label = 0"),

    // KM product-limit on the ordered duration grid; the -infinity
    // branch is pinned explicitly (Spark log(0) is NULL, DuckDB -inf)
    "q263_kaplan_meier" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
        |              THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, ts,
        |         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) - 1 AS session_id
        |  FROM flagged
        |), summ AS (
        |  SELECT epoch_us(min(ts)) AS s_us, epoch_us(max(ts)) AS e_us
        |  FROM sess GROUP BY user_id, session_id
        |), span AS (SELECT max(epoch_us(ts)) AS t1 FROM events),
        |subjects AS (
        |  SELECT (e_us - s_us) // 1000000 AS dur,
        |         CASE WHEN e_us < t1 - 1800000000 THEN 1 ELSE 0 END AS ev
        |  FROM summ, span),
        |cells AS (SELECT dur AS t, sum(ev) AS d, sum(1 - ev) AS c, count(*) AS alln
        |          FROM subjects GROUP BY dur),
        |tot AS (SELECT sum(alln) AS nn FROM cells),
        |g AS (SELECT t, d, c, alln, nn,
        |             sum(alln) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lt
        |      FROM cells, tot),
        |g2 AS (SELECT t, d, c, nn - lt + alln AS n_risk FROM g),
        |g3 AS (SELECT t, n_risk, d, c,
        |        exp(sum(CASE WHEN d > 0 AND n_risk > d
        |                       THEN ln(CAST(n_risk - d AS DOUBLE) / n_risk)
        |                     WHEN d > 0 THEN CAST('-infinity' AS DOUBLE)
        |                     ELSE 0.0 END)
        |            OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS surv
        |      FROM g2)
        |SELECT CAST(t AS BIGINT) AS t, CAST(n_risk AS BIGINT) AS n_risk,
        |       CAST(d AS BIGINT) AS d, CAST(c AS BIGINT) AS c,
        |       round(surv, 6) AS survival
        |FROM g3 WHERE d > 0 ORDER BY t""".stripMargin,

    // sup EDF gap as an integer cross-multiple until the edge
    "q264_ks_test" ->
      """WITH d AS (SELECT CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS s, n_chars AS v FROM documents),
        |cells AS (SELECT v, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS c0,
        |                 sum(CASE WHEN s <> 0 THEN 1 ELSE 0 END) AS c1
        |          FROM d GROUP BY v),
        |grid AS (SELECT v, sum(c0) OVER w AS f0, sum(c1) OVER w AS f1 FROM cells
        |         WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT max(f0) AS n0, max(f1) AS n1 FROM grid),
        |m AS (SELECT max(abs(f0 * n1 - f1 * n0)) AS d_num, max(n0) AS n0x, max(n1) AS n1x
        |      FROM grid, tot)
        |SELECT CAST(n0x AS BIGINT) AS n1, CAST(n1x AS BIGINT) AS n2,
        |       CAST(d_num AS BIGINT) AS d_num,
        |       round(CAST(d_num AS DOUBLE) / (n0x * n1x), 6) AS ks_d,
        |       round(1.358 * sqrt(CAST(n0x + n1x AS DOUBLE) / (n0x * n1x)), 6) AS crit_05,
        |       round(CAST(d_num AS DOUBLE) / (n0x * n1x), 6)
        |         > round(1.358 * sqrt(CAST(n0x + n1x AS DOUBLE) / (n0x * n1x)), 6) AS reject
        |FROM m""".stripMargin,

    // global ½-multiple midranks; Σ R²/n on the ordered group window
    "q265_kruskal_wallis" ->
      """WITH d AS (SELECT source AS g, n_chars AS v FROM documents),
        |cells AS (SELECT v, count(*) AS t FROM d GROUP BY v),
        |ranks AS (SELECT v, CAST(cum - t AS DOUBLE) + CAST(t + 1 AS DOUBLE) / 2.0 AS r
        |          FROM (SELECT v, t, sum(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |                FROM cells)),
        |pg AS (SELECT g, count(*) AS n_g, sum(r) AS r_g FROM d JOIN ranks USING (v) GROUP BY g),
        |ties AS (SELECT sum(t * t * t - t) AS tie3 FROM cells),
        |acc AS (SELECT g, sum(n_g) OVER w AS nn, count(*) OVER w AS k,
        |               sum(r_g * r_g / n_g) OVER w AS s_rr
        |        FROM pg WINDOW w AS (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |fin AS (SELECT * FROM acc ORDER BY g DESC LIMIT 1)
        |SELECT CAST(nn AS BIGINT) AS n, CAST(k AS BIGINT) AS groups,
        |       round(12.0 / (nn * (nn + 1)) * s_rr - 3.0 * (nn + 1), 6) AS h,
        |       round((12.0 / (nn * (nn + 1)) * s_rr - 3.0 * (nn + 1))
        |             / (1.0 - CAST(tie3 AS DOUBLE) / (nn * nn * nn - nn)), 6) AS h_tie_corrected
        |FROM fin, ties""".stripMargin,

    // z = |x − type-7 median| is a ½-multiple: sums exact; ratio terms on
    // the ordered group window
    "q266_brown_forsythe" ->
      """WITH d AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v FROM documents),
        |med AS (SELECT g, quantile_cont(v, 0.5) AS med FROM d GROUP BY g),
        |z AS (SELECT d.g, abs(v - med) AS z FROM d JOIN med ON d.g = med.g),
        |pg AS (SELECT g, count(*) AS n_g, sum(z) AS sz, sum(z * z) AS szz FROM z GROUP BY g),
        |acc AS (SELECT g, sum(n_g) OVER w AS nn, count(*) OVER w AS k,
        |               sum(sz) OVER w AS sz_all,
        |               sum(sz * sz / n_g) OVER w AS s_between_raw,
        |               sum(szz - sz * sz / n_g) OVER w AS ssw
        |        FROM pg WINDOW w AS (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |fin AS (SELECT * FROM acc ORDER BY g DESC LIMIT 1)
        |SELECT CAST(nn AS BIGINT) AS n, CAST(k AS BIGINT) AS groups,
        |       round(((s_between_raw - sz_all * sz_all / nn) / (k - 1))
        |             / (ssw / (nn - k)), 6) AS w_stat
        |FROM fin""".stripMargin,

    // integer Σx/Σx² per group; only Σ sx²/n rides the ordered window
    "q267_anova_f" ->
      """WITH d AS (SELECT event_type AS g, CAST(round(value * 1000, 0) AS BIGINT) AS v
        |           FROM events WHERE value IS NOT NULL),
        |pg AS (SELECT g, count(*) AS n_g, sum(v) AS sx, sum(v * v) AS sxx FROM d GROUP BY g),
        |acc AS (SELECT g, sum(n_g) OVER w AS nn, count(*) OVER w AS k,
        |               sum(sx) OVER w AS sx_all, sum(sxx) OVER w AS sxx_all,
        |               sum(CAST(sx AS DOUBLE) * sx / n_g) OVER w AS s_between_raw
        |        FROM pg WINDOW w AS (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |fin AS (SELECT * FROM acc ORDER BY g DESC LIMIT 1)
        |SELECT CAST(nn AS BIGINT) AS n, CAST(k AS BIGINT) AS groups,
        |       round(((s_between_raw - CAST(sx_all AS DOUBLE) * sx_all / nn) / (k - 1))
        |             / ((sxx_all - s_between_raw) / (nn - k)), 6) AS f_stat,
        |       round((s_between_raw - CAST(sx_all AS DOUBLE) * sx_all / nn)
        |             / (sxx_all - CAST(sx_all AS DOUBLE) * sx_all / nn), 6) AS eta_sq
        |FROM fin""".stripMargin,

    // the q224 family under the BY harmonic correction; c(m) accumulates
    // on the ordered rank window
    "q268_by_fdr" ->
      """WITH g AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS k
        |  FROM documents GROUP BY 1),
        |t AS (SELECT sum(n) AS nn, sum(k) AS kk FROM g),
        |z AS (
        |  SELECT source, n, k,
        |         CASE WHEN kk > 0 AND kk < nn AND nn - n > 0 THEN
        |           (CAST(k AS DOUBLE) / n - CAST(kk - k AS DOUBLE) / (nn - n))
        |             / sqrt((CAST(kk AS DOUBLE) / nn) * (1.0 - CAST(kk AS DOUBLE) / nn)
        |                    * (1.0 / n + 1.0 / (nn - n))) END AS z
        |  FROM g, t),
        |p AS (
        |  SELECT source, n, k, z,
        |         coalesce(round(2.0 * (exp(-abs(z) * abs(z) / 2.0) / 2.5066282746310002
        |           * (tt * (0.319381530 + tt * (-0.356563782 + tt * (1.781477937
        |              + tt * (-1.821255978 + tt * 1.330274429)))))), 6), 1.0) AS p
        |  FROM (SELECT *, 1.0 / (1.0 + 0.2316419 * abs(z)) AS tt FROM z)),
        |r AS (SELECT *, CAST(row_number() OVER (ORDER BY p, source) AS BIGINT) AS i,
        |             CAST(count(*) OVER () AS BIGINT) AS m
        |      FROM p),
        |h AS (SELECT *, sum(1.0 / i) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h_i FROM r),
        |h2 AS (SELECT *, max(h_i) OVER () AS c_m FROM h),
        |c AS (SELECT *, round(i * 0.05 / (m * c_m), 6) AS by_cut,
        |             p <= round(i * 0.05 / (m * c_m), 6) AS under
        |      FROM h2),
        |km AS (SELECT max(CASE WHEN under THEN i END) AS kmax FROM c)
        |SELECT source, n, k, round(z, 4) AS z, p, i AS p_rank,
        |       round(c_m, 6) AS c_m, by_cut,
        |       (kmax IS NOT NULL AND i <= kmax) AS rejected
        |FROM c, km ORDER BY source""".stripMargin,

    // DuckDB dayofweek is 0-based; Spark 1-based — shift (the q256 rule).
    // a·d/n and b·c/n terms fold on the ordered stratum window.
    "q269_mantel_haenszel" ->
      """WITH e AS (SELECT dayofweek(ts) + 1 AS stratum, user_id % 2 AS x,
        |                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS y
        |           FROM events),
        |cells AS (SELECT stratum,
        |                 sum(CASE WHEN x = 1 AND y = 1 THEN 1 ELSE 0 END) AS a,
        |                 sum(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END) AS b,
        |                 sum(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END) AS c,
        |                 sum(CASE WHEN x = 0 AND y = 0 THEN 1 ELSE 0 END) AS d
        |          FROM e GROUP BY stratum),
        |acc AS (SELECT *,
        |               sum(CAST(a AS DOUBLE) * d / (a + b + c + d)) OVER w AS num,
        |               sum(CAST(b AS DOUBLE) * c / (a + b + c + d)) OVER w AS den
        |        FROM cells WINDOW w AS (ORDER BY stratum ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |pooled AS (SELECT CASE WHEN den > 0 THEN round(num / den, 6) END AS or_mh
        |           FROM acc ORDER BY stratum DESC LIMIT 1)
        |SELECT CAST(stratum AS BIGINT) AS stratum, CAST(a AS BIGINT) AS a,
        |       CAST(b AS BIGINT) AS b, CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
        |       CASE WHEN b * c > 0 THEN
        |         round(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 6) END AS or_stratum,
        |       or_mh
        |FROM acc, pooled ORDER BY stratum""".stripMargin,

    // p^α = exp(α·ln p), identical literal shape; normalizer on the
    // ordered source window
    "q272_mixture_temperature" ->
      """WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1),
        |t AS (SELECT sum(n_docs) AS nn FROM g),
        |a0 AS (SELECT source, n_docs, CAST(n_docs AS DOUBLE) / nn AS p FROM g, t),
        |a AS (SELECT *, exp(0.7 * ln(p)) AS w FROM a0),
        |b AS (SELECT *, sum(w) OVER (ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS z FROM a),
        |c AS (SELECT *, max(z) OVER () AS z_all FROM b)
        |SELECT source, n_docs, round(p, 6) AS p_raw, round(w / z_all, 6) AS p_temp
        |FROM c ORDER BY source""".stripMargin,

    // the q263 session-duration grid split by user parity; O1 integer,
    // E1/V fold on the ordered duration window
    "q273_log_rank" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
        |              THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, ts,
        |         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) - 1 AS session_id
        |  FROM flagged
        |), summ AS (
        |  SELECT user_id % 2 AS g, epoch_us(min(ts)) AS s_us, epoch_us(max(ts)) AS e_us
        |  FROM sess GROUP BY user_id, session_id
        |), span AS (SELECT max(epoch_us(ts)) AS t1 FROM events),
        |subjects AS (
        |  SELECT g, (e_us - s_us) // 1000000 AS dur,
        |         CASE WHEN e_us < t1 - 1800000000 THEN 1 ELSE 0 END AS ev
        |  FROM summ, span),
        |cells AS (SELECT dur AS t, sum(ev) AS d,
        |                 sum(CASE WHEN g = 1 THEN ev ELSE 0 END) AS d1,
        |                 count(*) AS alln,
        |                 sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS a1
        |          FROM subjects GROUP BY dur),
        |tot AS (SELECT sum(alln) AS nn, sum(a1) AS nn1 FROM cells),
        |g1 AS (SELECT t, d, d1, alln, a1, nn, nn1,
        |              sum(alln) OVER w AS lt, sum(a1) OVER w AS lt1
        |       FROM cells, tot
        |       WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |g2 AS (SELECT *, nn - lt + alln AS n_risk, nn1 - lt1 + a1 AS n1_risk FROM g1),
        |g3 AS (SELECT t, nn, nn1,
        |              sum(d1) OVER w AS o1,
        |              sum(CAST(d AS DOUBLE) * n1_risk / n_risk) OVER w AS e1,
        |              sum(CASE WHEN n_risk > 1 THEN
        |                    CAST(d AS DOUBLE) * n1_risk * (n_risk - n1_risk) * (n_risk - d)
        |                      / (CAST(n_risk AS DOUBLE) * n_risk * (n_risk - 1))
        |                  ELSE 0.0 END) OVER w AS v
        |       FROM g2
        |       WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |fin AS (SELECT * FROM g3 ORDER BY t DESC LIMIT 1)
        |SELECT CAST(nn AS BIGINT) AS n, CAST(nn1 AS BIGINT) AS n1,
        |       CAST(o1 AS BIGINT) AS o1, round(e1, 6) AS e1, round(v, 6) AS v,
        |       CASE WHEN v > 0 THEN round((o1 - e1) / sqrt(v), 6) + 0.0 END AS z,
        |       CASE WHEN v > 0 THEN round(pow(o1 - e1, 2) / v, 6) END AS chi2
        |FROM fin""".stripMargin,

    // same censored-duration grid as q263; the hazard increments fold on
    // the ordered grid, Breslow survival is exp(-H) of the raw cumsum
    "q274_nelson_aalen" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
        |              THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, ts,
        |         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) - 1 AS session_id
        |  FROM flagged
        |), summ AS (
        |  SELECT epoch_us(min(ts)) AS s_us, epoch_us(max(ts)) AS e_us
        |  FROM sess GROUP BY user_id, session_id
        |), span AS (SELECT max(epoch_us(ts)) AS t1 FROM events),
        |subjects AS (
        |  SELECT (e_us - s_us) // 1000000 AS dur,
        |         CASE WHEN e_us < t1 - 1800000000 THEN 1 ELSE 0 END AS ev
        |  FROM summ, span),
        |cells AS (SELECT dur AS t, sum(ev) AS d, count(*) AS alln
        |          FROM subjects GROUP BY dur),
        |tot AS (SELECT sum(alln) AS nn FROM cells),
        |g AS (SELECT t, d, alln, nn,
        |             sum(alln) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lt
        |      FROM cells, tot),
        |g2 AS (SELECT t, d, nn - lt + alln AS n_risk FROM g),
        |g3 AS (SELECT t, n_risk, d,
        |             sum(CAST(d AS DOUBLE) / n_risk)
        |               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS haz
        |      FROM g2)
        |SELECT CAST(t AS BIGINT) AS t, CAST(n_risk AS BIGINT) AS n_risk,
        |       CAST(d AS BIGINT) AS d,
        |       round(haz, 6) AS na_hazard, round(exp(-haz), 6) AS breslow_surv
        |FROM g3 WHERE d > 0 ORDER BY t""".stripMargin,

    // factorial-free hypergeometric: the log-weight accumulates step
    // ratios on the ordered bounded support grid, centred on max(w)
    "q275_fisher_exact" ->
      """WITH tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |                    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS r1,
        |                    CAST(sum(CASE WHEN source = 'src7' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |                    CAST(sum(CASE WHEN lang = 'en' AND source = 'src7' THEN 1 ELSE 0 END) AS BIGINT) AS a_obs
        |             FROM documents),
        |t2 AS (SELECT *, greatest(CAST(0 AS BIGINT), r1 + c1 - n) AS lo, least(r1, c1) AS hi FROM tot),
        |grid AS (SELECT n, r1, c1, a_obs, lo, unnest(generate_series(lo, hi)) AS a FROM t2),
        |lwt AS (SELECT *, sum(CASE WHEN a = lo THEN 0.0
        |                           ELSE ln(CAST((r1 - a + 1) * (c1 - a + 1) AS DOUBLE))
        |                              - ln(CAST(a * (n - r1 - c1 + a) AS DOUBLE)) END)
        |                    OVER (ORDER BY a ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lw
        |        FROM grid),
        |ctr AS (SELECT max(lw) AS m, max(CASE WHEN a = a_obs THEN lw END) AS w_obs FROM lwt),
        |acc AS (SELECT a, n, r1, c1, a_obs,
        |               sum(exp(lw - m)) OVER w AS s_all,
        |               sum(CASE WHEN lw <= w_obs + 1e-7 THEN exp(lw - m) ELSE 0.0 END) OVER w AS s_tail
        |        FROM lwt, ctr
        |        WINDOW w AS (ORDER BY a ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |fin AS (SELECT * FROM acc ORDER BY a DESC LIMIT 1)
        |SELECT n, r1, c1, a_obs AS a,
        |       round(s_tail / s_all, 6) AS p_two_sided,
        |       CASE WHEN (r1 - a_obs) * (c1 - a_obs) > 0 THEN
        |         round(CAST(a_obs AS DOUBLE) * (n - r1 - c1 + a_obs)
        |               / (CAST(r1 - a_obs AS DOUBLE) * (c1 - a_obs)), 6) END AS odds_ratio
        |FROM fin""".stripMargin,

    // dense (user,day)×condition grid; every sufficient statistic is an
    // exact integer sum — no float fold anywhere
    "q276_cochran_q" ->
      """WITH ev AS (SELECT user_id * 100000 + (CAST(ts AS DATE) - DATE '1970-01-01') AS subj,
        |                   event_type
        |            FROM events),
        |subjects AS (SELECT DISTINCT subj FROM ev),
        |conds AS (SELECT unnest(['click', 'purchase', 'error']) AS cond),
        |grid AS (SELECT subj, cond FROM subjects CROSS JOIN conds),
        |hits AS (SELECT DISTINCT subj, event_type AS cond, 1 AS h FROM ev
        |         WHERE event_type IN ('click', 'purchase', 'error')),
        |d AS (SELECT g.subj AS u, g.cond AS c, coalesce(h.h, 0) AS h
        |      FROM grid g LEFT JOIN hits h ON g.subj = h.subj AND g.cond = h.cond),
        |ct AS (SELECT c, sum(h) AS t FROM d GROUP BY c),
        |ctt AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(t) AS BIGINT) AS st,
        |               CAST(sum(t * t) AS BIGINT) AS stt FROM ct),
        |rt AS (SELECT u, sum(h) AS r FROM d GROUP BY u),
        |rtt AS (SELECT CAST(count(*) AS BIGINT) AS n_subjects, CAST(sum(r) AS BIGINT) AS sr,
        |               CAST(sum(r * r) AS BIGINT) AS srr FROM rt)
        |SELECT k, n_subjects, k - 1 AS dof,
        |       CASE WHEN k * sr - srr > 0 THEN
        |         round(CAST((k - 1) * (k * stt - st * st) AS DOUBLE) / (k * sr - srr), 6) END AS q_stat
        |FROM ctt, rtt""".stripMargin,

    // the q210 cell grid and pair join; four tie-treatment ratios at the
    // edge, each sign-pinned with + 0.0
    "q277_ordinal_assoc" ->
      """WITH d AS (
        |  SELECT source, n_chars // 64 AS xb,
        |         len(list_filter(string_split_regex(text, '\s+'), t -> len(t) > 0)) // 16 AS yb
        |  FROM documents),
        |cells AS (SELECT source, xb, yb, count(*) AS c FROM d GROUP BY 1, 2, 3),
        |cd AS (
        |  SELECT a.source,
        |         sum(CASE WHEN (b.xb - a.xb) * (b.yb - a.yb) > 0 THEN a.c * b.c ELSE 0 END) AS nc,
        |         sum(CASE WHEN (b.xb - a.xb) * (b.yb - a.yb) < 0 THEN a.c * b.c ELSE 0 END) AS nd
        |  FROM cells a JOIN cells b ON a.source = b.source
        |    AND (a.xb < b.xb OR (a.xb = b.xb AND a.yb < b.yb))
        |  GROUP BY 1),
        |tot AS (SELECT source, sum(c) AS n, sum(c) * (sum(c) - 1) // 2 AS n0,
        |               count(DISTINCT xb) AS rx, count(DISTINCT yb) AS ry
        |        FROM cells GROUP BY 1),
        |tx AS (SELECT source, sum(cx * (cx - 1) // 2) AS n1
        |       FROM (SELECT source, xb, sum(c) AS cx FROM cells GROUP BY 1, 2) GROUP BY 1),
        |ty AS (SELECT source, sum(cy * (cy - 1) // 2) AS n2
        |       FROM (SELECT source, yb, sum(c) AS cy FROM cells GROUP BY 1, 2) GROUP BY 1),
        |j AS (SELECT tot.source AS source, n, n0, rx, ry, n1, n2,
        |             coalesce(nc, 0) AS ncc, coalesce(nd, 0) AS ndd,
        |             coalesce(nc, 0) - coalesce(nd, 0) AS s
        |      FROM tot LEFT JOIN cd USING (source) JOIN tx USING (source) JOIN ty USING (source))
        |SELECT source, CAST(n AS BIGINT) AS n,
        |       CAST(ncc AS BIGINT) AS concordant, CAST(ndd AS BIGINT) AS discordant,
        |       CASE WHEN ncc + ndd > 0 THEN
        |         round(CAST(s AS DOUBLE) / (ncc + ndd), 6) + 0.0 END AS gamma,
        |       CASE WHEN n0 > n1 THEN
        |         round(CAST(s AS DOUBLE) / (n0 - n1), 6) + 0.0 END AS somers_dyx,
        |       CASE WHEN n0 > n2 THEN
        |         round(CAST(s AS DOUBLE) / (n0 - n2), 6) + 0.0 END AS somers_dxy,
        |       CASE WHEN least(rx, ry) > 1 THEN
        |         round(2.0 * least(rx, ry) * s
        |               / (CAST(n AS DOUBLE) * n * (least(rx, ry) - 1)), 6) + 0.0 END AS tau_c
        |FROM j ORDER BY source""".stripMargin,

    // the q240 rater panel with an abstaining third rater; D_o regrouped
    // on the bounded distinct-m grid, D_e numerator pure integer
    "q278_krippendorff" ->
      """WITH r AS (
        |  SELECT doc_id,
        |         (CASE WHEN contains(lower(text), ' the ') THEN 1 ELSE 0 END
        |          + CASE WHEN length(regexp_replace(text, '[^\x00-\x7F]', '', 'g')) * 20
        |                      >= length(text) * 19 THEN 1 ELSE 0 END
        |          + CASE WHEN n_chars >= 400 AND n_chars >= 800 THEN 1 ELSE 0 END)::BIGINT AS en_cnt,
        |         (2 + CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END)::BIGINT AS m
        |  FROM documents),
        |counts AS (
        |  SELECT doc_id, 'en' AS cat, en_cnt AS cnt, m FROM r
        |  UNION ALL
        |  SELECT doc_id, 'other' AS cat, m - en_cnt AS cnt, m FROM r),
        |perm AS (SELECT m AS m_i, sum(cnt * (m - cnt)) AS s_m FROM counts GROUP BY 1),
        |don AS (SELECT acc AS do_num FROM (
        |          SELECT m_i, sum(CAST(s_m AS DOUBLE) / (m_i - 1))
        |                        OVER (ORDER BY m_i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS acc
        |          FROM perm) ORDER BY m_i DESC LIMIT 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_items, CAST(sum(m) AS BIGINT) AS n_tot FROM r),
        |de AS (SELECT CAST(sum(n_c * (n_tot - n_c)) AS BIGINT) AS de_num
        |       FROM (SELECT cat, sum(cnt) AS n_c FROM counts GROUP BY 1), tot)
        |SELECT n_items, n_tot,
        |       CASE WHEN de_num > 0 THEN
        |         round(1.0 - do_num * (n_tot - 1) / de_num, 6) + 0.0 END AS alpha
        |FROM tot, don, de""".stripMargin,

    // integer Σxy/Σx sums from the day+lag equi-join; every cross-term
    // cast to double BEFORE multiplying, identically on both engines
    "q279_acf" ->
      """WITH g AS (SELECT CAST(ts AS DATE) - DATE '1970-01-01' AS day,
        |                  CAST(count(*) AS BIGINT) AS x
        |           FROM events GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |             CAST(sum(x * x) AS BIGINT) AS sxx FROM g),
        |lags AS (SELECT unnest(generate_series(1, 7)) AS lag),
        |p AS (SELECT l.lag, CAST(count(*) AS BIGINT) AS np,
        |             CAST(sum(a.x * b.x) AS BIGINT) AS sxy,
        |             CAST(sum(a.x) AS BIGINT) AS s1, CAST(sum(b.x) AS BIGINT) AS s2
        |      FROM lags l CROSS JOIN g a JOIN g b ON b.day = a.day + l.lag
        |      GROUP BY l.lag)
        |SELECT CAST(lag AS BIGINT) AS lag, np AS n_pairs,
        |       CASE WHEN CAST(sxx AS DOUBLE) * n * n - CAST(sx AS DOUBLE) * sx * n > 0 THEN
        |         round((CAST(sxy AS DOUBLE) * n * n
        |                - CAST(sx AS DOUBLE) * n * (s1 + s2)
        |                + CAST(np AS DOUBLE) * sx * sx)
        |               / (CAST(sxx AS DOUBLE) * n * n - CAST(sx AS DOUBLE) * sx * n), 6)
        |           + 0.0 END AS r
        |FROM p, t ORDER BY lag""".stripMargin,

    // the q279 r_l, ROUNDED, squared on the ordered bounded lag grid;
    // chi2(7, .95) literal shared with the gate
    "q280_ljung_box" ->
      """WITH g AS (SELECT CAST(ts AS DATE) - DATE '1970-01-01' AS day,
        |                  CAST(count(*) AS BIGINT) AS x
        |           FROM events GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |             CAST(sum(x * x) AS BIGINT) AS sxx FROM g),
        |lags AS (SELECT unnest(generate_series(1, 7)) AS lag),
        |p AS (SELECT l.lag, CAST(count(*) AS BIGINT) AS np,
        |             CAST(sum(a.x * b.x) AS BIGINT) AS sxy,
        |             CAST(sum(a.x) AS BIGINT) AS s1, CAST(sum(b.x) AS BIGINT) AS s2
        |      FROM lags l CROSS JOIN g a JOIN g b ON b.day = a.day + l.lag
        |      GROUP BY l.lag),
        |rr AS (SELECT lag,
        |              CASE WHEN CAST(sxx AS DOUBLE) * n * n - CAST(sx AS DOUBLE) * sx * n > 0 THEN
        |                round((CAST(sxy AS DOUBLE) * n * n
        |                       - CAST(sx AS DOUBLE) * n * (s1 + s2)
        |                       + CAST(np AS DOUBLE) * sx * sx)
        |                      / (CAST(sxx AS DOUBLE) * n * n - CAST(sx AS DOUBLE) * sx * n), 6)
        |                  + 0.0 END AS r,
        |              n
        |       FROM p, t),
        |acc AS (SELECT lag, n,
        |               sum(r * r / (n - lag))
        |                 OVER (ORDER BY lag ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS qacc
        |        FROM rr),
        |fin AS (SELECT * FROM acc ORDER BY lag DESC LIMIT 1)
        |SELECT n, CAST(lag AS BIGINT) AS max_lag,
        |       round(CAST(n AS DOUBLE) * (n + 2) * qacc, 6) AS q_lb,
        |       14.06714 AS crit,
        |       round(CAST(n AS DOUBLE) * (n + 2) * qacc, 6) > 14.06714 AS reject_white_noise
        |FROM fin""".stripMargin,

    // global type-7 median flag, then the q201 densified chi2 grid
    "q284_mood_median" ->
      """WITH d AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v FROM documents),
        |med AS (SELECT quantile_cont(v, 0.5) AS median FROM d),
        |f AS (SELECT g AS r, CASE WHEN v > median THEN 1 ELSE 0 END AS c FROM d, med),
        |cells AS (SELECT r, c, count(*) AS n FROM f GROUP BY 1, 2),
        |rm AS (SELECT r, sum(n) AS nr FROM cells GROUP BY 1),
        |cm AS (SELECT c, sum(n) AS nc FROM cells GROUP BY 1),
        |tot AS (SELECT sum(n) AS nn, count(DISTINCT r) AS nrows,
        |        count(DISTINCT c) AS ncols FROM cells),
        |dense AS (
        |  SELECT rm.r, cm.c, rm.nr, cm.nc, coalesce(cells.n, 0) AS n
        |  FROM rm CROSS JOIN cm LEFT JOIN cells USING (r, c)),
        |sc AS (
        |  SELECT tot.nrows, tot.ncols, tot.nn,
        |         pow(dense.n - CAST(dense.nr AS DOUBLE) * dense.nc / tot.nn, 2)
        |           / (CAST(dense.nr AS DOUBLE) * dense.nc / tot.nn) AS part
        |  FROM dense CROSS JOIN tot)
        |SELECT CAST(nrows AS BIGINT) AS groups, CAST(nn AS BIGINT) AS n, median,
        |       CASE WHEN least(nrows, ncols) > 1 THEN round(sum(part), 4) END AS chi2,
        |       CAST((nrows - 1) * (ncols - 1) AS BIGINT) AS dof,
        |       CASE WHEN least(nrows, ncols) > 1 THEN
        |         round(sqrt(sum(part) / (nn * (least(nrows, ncols) - 1))), 4) END AS cramers_v
        |FROM sc, med GROUP BY nrows, ncols, nn, median""".stripMargin,

    // S and the tie-corrected variance numerator exact integers on the
    // calendar-bounded day-pair grid; continuity-corrected z at the edge
    "q285_mann_kendall" ->
      """WITH g AS (SELECT CAST(ts AS DATE) - DATE '1970-01-01' AS day,
        |                  CAST(count(*) AS BIGINT) AS x
        |           FROM events GROUP BY 1),
        |s AS (SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
        |                           WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s
        |      FROM g a JOIN g b ON a.day < b.day),
        |t AS (SELECT CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tsum,
        |             CAST(sum(t) AS BIGINT) AS n
        |      FROM (SELECT x, count(*) AS t FROM g GROUP BY 1)),
        |rep AS (SELECT s, tsum, n, n * (n - 1) * (2 * n + 5) - tsum AS var_num FROM s, t),
        |z AS (SELECT *,
        |        CASE WHEN var_num > 0 AND s > 0 THEN
        |               round(CAST(s - 1 AS DOUBLE) / sqrt(CAST(var_num AS DOUBLE) / 18.0), 6)
        |             WHEN var_num > 0 AND s < 0 THEN
        |               round(CAST(s + 1 AS DOUBLE) / sqrt(CAST(var_num AS DOUBLE) / 18.0), 6)
        |             WHEN var_num > 0 THEN 0.0 END AS z
        |      FROM rep)
        |SELECT n, s,
        |       CASE WHEN var_num > 0 THEN round(CAST(var_num AS DOUBLE) / 18.0, 6) END AS var_s,
        |       z,
        |       CASE WHEN z > 1.959964 THEN 'increasing'
        |            WHEN z < -1.959964 THEN 'decreasing'
        |            WHEN z IS NOT NULL THEN 'no_trend' END AS trend
        |FROM z""".stripMargin,

    // above/below the global median, one lag pass on the ordered day
    // grid; exact integer null-moment pieces
    "q286_runs_test" ->
      """WITH g AS (SELECT CAST(ts AS DATE) - DATE '1970-01-01' AS day,
        |                  CAST(count(*) AS BIGINT) AS x
        |           FROM events GROUP BY 1),
        |med AS (SELECT quantile_cont(x, 0.5) AS median FROM g),
        |signed AS (SELECT day, CASE WHEN x > median THEN 1
        |                            WHEN x < median THEN -1 ELSE 0 END AS s
        |           FROM g, med),
        |nz AS (SELECT day, s FROM signed WHERE s <> 0),
        |runs AS (SELECT CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |                CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |                CAST(sum(CASE WHEN prev IS NULL OR prev <> s THEN 1 ELSE 0 END) AS BIGINT) AS r
        |         FROM (SELECT s, lag(s) OVER (ORDER BY day) AS prev FROM nz)),
        |rep AS (SELECT n1, n2, r, median, n1 + n2 AS m,
        |               2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) AS var_num,
        |               (n1 + n2) * (n1 + n2) * (n1 + n2 - 1) AS var_den
        |        FROM runs, med)
        |SELECT n1, n2, r, median,
        |       CASE WHEN m > 0 THEN round(1.0 + 2.0 * n1 * n2 / m, 6) END AS e_r,
        |       CASE WHEN var_num > 0 THEN
        |         round((r - (1.0 + 2.0 * n1 * n2 / m))
        |               / sqrt(CAST(var_num AS DOUBLE) / var_den), 6) + 0.0 END AS z
        |FROM rep""".stripMargin,

    // dense user×condition grid; within-user midranks from the bounded
    // k² pair comparison (2L exact integer); closed-form null moments
    "q287_page_trend" ->
      """WITH conds AS (SELECT * FROM (VALUES ('view', 1), ('click', 2), ('purchase', 3)) AS t(cond, c)),
        |users AS (SELECT DISTINCT user_id FROM events),
        |grid AS (SELECT user_id, cond, c FROM users CROSS JOIN conds),
        |counts AS (SELECT user_id, event_type AS cond, CAST(count(*) AS BIGINT) AS v
        |           FROM events WHERE event_type IN ('view', 'click', 'purchase')
        |           GROUP BY 1, 2),
        |d AS (SELECT g.user_id AS u, CAST(g.c AS BIGINT) AS c, coalesce(ct.v, 0) AS v
        |      FROM grid g LEFT JOIN counts ct ON g.user_id = ct.user_id AND g.cond = ct.cond),
        |r2 AS (SELECT a.u, a.c,
        |              2 + 2 * sum(CASE WHEN b.v < a.v THEN 1 ELSE 0 END)
        |                + sum(CASE WHEN b.v = a.v THEN 1 ELSE 0 END) AS r2
        |       FROM d a JOIN d b ON a.u = b.u AND a.c <> b.c
        |       GROUP BY a.u, a.c),
        |sums AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n, CAST(max(c) AS BIGINT) AS k,
        |                CAST(sum(c * r2) AS BIGINT) AS l2 FROM r2)
        |SELECT n AS n_subjects, k, CAST(l2 AS DOUBLE) / 2.0 AS l,
        |       CASE WHEN n > 0 AND k > 1 THEN
        |         round((CAST(l2 AS DOUBLE) / 2.0
        |                - CAST(n AS DOUBLE) * k * (k + 1) * (k + 1) / 4.0)
        |               / sqrt(CAST(n AS DOUBLE) * k * k * (k + 1) * (k * k - 1) / 144.0), 6)
        |           + 0.0 END AS z
        |FROM sums""".stripMargin,

    // the q183 symmetric graph; shared-neighbor candidates, anti-join
    // against existing edges, AA fold on the bounded degree grid
    "q288_link_predict" ->
      """WITH f AS (
        |  SELECT DISTINCT user_id % 60 AS a, (user_id * user_id + 7) % 60 AS b FROM events
        |  UNION SELECT DISTINCT user_id % 60, (user_id * user_id * user_id + 11) % 60 FROM events
        |), e0 AS (
        |  SELECT a, b FROM f WHERE a <> b
        |  UNION SELECT b, a FROM f WHERE a <> b
        |),
        |deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS deg FROM e0 GROUP BY 1),
        |thr AS (SELECT x.a AS u, y.a AS w, x.b AS n FROM e0 x JOIN e0 y ON x.b = y.b AND x.a < y.a),
        |cand AS (SELECT t.u, t.w, t.n FROM thr t
        |         LEFT JOIN e0 adj ON adj.a = t.u AND adj.b = t.w
        |         WHERE adj.a IS NULL),
        |wd AS (SELECT c.u, c.w, d.deg AS deg_n FROM cand c JOIN deg d ON c.n = d.node),
        |perdeg AS (SELECT u, w, deg_n, CAST(count(*) AS BIGINT) AS c FROM wd GROUP BY 1, 2, 3),
        |acc AS (SELECT u, w, deg_n,
        |               sum(c) OVER (PARTITION BY u, w) AS cn,
        |               sum(CAST(c AS DOUBLE) / ln(CAST(deg_n AS DOUBLE)))
        |                 OVER (PARTITION BY u, w ORDER BY deg_n
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS aa_acc,
        |               max(deg_n) OVER (PARTITION BY u, w) AS maxdeg
        |        FROM perdeg),
        |one AS (SELECT u, w, cn, deg_n, maxdeg,
        |               max(aa_acc) OVER (PARTITION BY u, w) AS aa
        |        FROM acc),
        |fin AS (SELECT u, w, cn, aa FROM one WHERE deg_n = maxdeg),
        |sc AS (SELECT f2.u, f2.w, CAST(f2.cn AS BIGINT) AS cn,
        |              round(CAST(f2.cn AS DOUBLE) / (du.deg + dw2.deg - f2.cn), 6) AS jaccard,
        |              CAST(du.deg * dw2.deg AS BIGINT) AS pref_attach,
        |              round(f2.aa, 6) AS adamic_adar
        |       FROM fin f2 JOIN deg du ON f2.u = du.node JOIN deg dw2 ON f2.w = dw2.node)
        |SELECT * FROM sc ORDER BY adamic_adar DESC, u, w LIMIT 20""".stripMargin,

    // the q264 value grid; integer cross-multiple gap squared in double,
    // weighted fold on the ordered grid; 0.461 asymptotic 5% literal
    "q289_cvm" ->
      """WITH d AS (SELECT CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS s, n_chars AS v FROM documents),
        |cells AS (SELECT v, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS c0,
        |                 sum(CASE WHEN s <> 0 THEN 1 ELSE 0 END) AS c1
        |          FROM d GROUP BY v),
        |grid AS (SELECT v, c0 + c1 AS t, sum(c0) OVER w AS f0, sum(c1) OVER w AS f1 FROM cells
        |         WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT max(f0) AS n0, max(f1) AS n1 FROM grid),
        |acc AS (SELECT v, n0, n1,
        |               sum(CAST(t AS DOUBLE) * CAST(f0 * n1 - f1 * n0 AS DOUBLE)
        |                   * CAST(f0 * n1 - f1 * n0 AS DOUBLE))
        |                 OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS acc
        |        FROM grid, tot),
        |fin AS (SELECT * FROM acc ORDER BY v DESC LIMIT 1)
        |SELECT CAST(n0 AS BIGINT) AS n1, CAST(n1 AS BIGINT) AS n2,
        |       round(acc / ((CAST(n0 + n1 AS DOUBLE) * (n0 + n1)) * n0 * n1), 6) AS t_cvm,
        |       0.461 AS crit_05,
        |       round(acc / ((CAST(n0 + n1 AS DOUBLE) * (n0 + n1)) * n0 * n1), 6) > 0.461 AS reject
        |FROM fin""".stripMargin,

    // integer rank walk sorted by (x, doc_id); den/sd exact integers;
    // n·Σd cast to double before multiplying
    "q290_chatterjee_xi" ->
      """WITH d AS (
        |  SELECT source AS g, n_chars AS x,
        |         len(list_filter(string_split_regex(text, '\s+'), t -> len(t) > 0)) AS y,
        |         doc_id AS tb
        |  FROM documents),
        |cells AS (SELECT g, y, count(*) AS t FROM d GROUP BY 1, 2),
        |rk AS (SELECT g, y, t,
        |              sum(t) OVER (PARTITION BY g ORDER BY y
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r
        |       FROM cells),
        |rk2 AS (SELECT g, y, t, r, max(r) OVER (PARTITION BY g) AS n FROM rk),
        |rk3 AS (SELECT *, n - r + t AS l FROM rk2),
        |dn AS (SELECT g, CAST(sum(2 * t * l * (n - l)) AS BIGINT) AS dnm,
        |              CAST(max(n) AS BIGINT) AS n
        |       FROM rk3 GROUP BY g),
        |seq AS (SELECT d.g, d.x, d.tb, rk3.r FROM d JOIN rk3 ON d.g = rk3.g AND d.y = rk3.y),
        |sd AS (SELECT g, CAST(sum(dnext) AS BIGINT) AS sd FROM (
        |         SELECT g, abs(lead(r) OVER (PARTITION BY g ORDER BY x, tb) - r) AS dnext
        |         FROM seq)
        |       GROUP BY g)
        |SELECT dn.g AS source, dn.n,
        |       CASE WHEN dnm > 0 THEN
        |         round(1.0 - CAST(dn.n AS DOUBLE) * sd / dnm, 6) + 0.0 END AS xi
        |FROM dn JOIN sd USING (g) ORDER BY source""".stripMargin,

    // per-rater midrank grids; all cross-group sums exact ¼-multiples
    "q291_kendall_w" ->
      """WITH m AS (SELECT source,
        |             CAST(sum(n_chars) AS BIGINT) AS va,
        |             CAST(sum(len(list_filter(string_split_regex(text, '\s+'),
        |                 t -> len(t) > 0))) AS BIGINT) AS vb,
        |             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS vc
        |           FROM documents GROUP BY 1),
        |d AS (SELECT 'chars' AS rater, source AS item, va AS v FROM m
        |      UNION ALL SELECT 'tokens', source, vb FROM m
        |      UNION ALL SELECT 'enshare', source, vc FROM m),
        |cells AS (SELECT rater, v, count(*) AS t FROM d GROUP BY 1, 2),
        |ranks AS (SELECT rater, v, CAST(cum - t AS DOUBLE) + CAST(t + 1 AS DOUBLE) / 2.0 AS r
        |          FROM (SELECT rater, v, t,
        |                       sum(t) OVER (PARTITION BY rater ORDER BY v
        |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |                FROM cells)),
        |pi AS (SELECT item, sum(r) AS ri, count(*) AS mm
        |       FROM d JOIN ranks USING (rater, v) GROUP BY item),
        |ties AS (SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tsum FROM cells),
        |sums AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(max(mm) AS BIGINT) AS m,
        |                sum(ri * ri) AS srr, sum(ri) AS sr FROM pi)
        |SELECT m, n,
        |       CASE WHEN n > 1 AND CAST(m AS DOUBLE) * m * (n * n * n - n) - m * tsum > 0 THEN
        |         round(12.0 * (srr - sr * sr / n)
        |               / (CAST(m AS DOUBLE) * m * (n * n * n - n) - m * tsum), 6) END AS w,
        |       CASE WHEN n > 1 AND CAST(m AS DOUBLE) * m * (n * n * n - n) - m * tsum > 0 THEN
        |         round(m * (n - 1) * (12.0 * (srr - sr * sr / n)
        |               / (CAST(m AS DOUBLE) * m * (n * n * n - n) - m * tsum)), 6) END AS chi2
        |FROM sums, ties""".stripMargin,

    // within-subject midrank grids; the q265 tie-factor pattern
    "q292_friedman" ->
      """WITH conds AS (SELECT unnest(['view', 'click', 'purchase']) AS cond),
        |users AS (SELECT DISTINCT user_id FROM events),
        |grid AS (SELECT user_id, cond FROM users CROSS JOIN conds),
        |counts AS (SELECT user_id, event_type AS cond, CAST(count(*) AS BIGINT) AS v
        |           FROM events WHERE event_type IN ('view', 'click', 'purchase')
        |           GROUP BY 1, 2),
        |d AS (SELECT g.user_id AS u, g.cond AS c, coalesce(ct.v, 0) AS v
        |      FROM grid g LEFT JOIN counts ct ON g.user_id = ct.user_id AND g.cond = ct.cond),
        |cells AS (SELECT u, v, count(*) AS t FROM d GROUP BY 1, 2),
        |ranks AS (SELECT u, v, CAST(cum - t AS DOUBLE) + CAST(t + 1 AS DOUBLE) / 2.0 AS r
        |          FROM (SELECT u, v, t,
        |                       sum(t) OVER (PARTITION BY u ORDER BY v
        |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |                FROM cells)),
        |pc AS (SELECT c, sum(r) AS rj, count(*) AS n
        |       FROM d JOIN ranks USING (u, v) GROUP BY c),
        |ties AS (SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tsum FROM cells),
        |sums AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(max(n) AS BIGINT) AS n,
        |                sum(rj * rj) AS srr FROM pc)
        |SELECT n, k,
        |       round(12.0 / (n * k * (k + 1)) * srr - 3.0 * n * (k + 1), 6) AS chi2_f,
        |       CASE WHEN 1.0 - CAST(tsum AS DOUBLE) / (n * k * (k * k * k - k)) > 0 THEN
        |         round((12.0 / (n * k * (k + 1)) * srr - 3.0 * n * (k + 1))
        |               / (1.0 - CAST(tsum AS DOUBLE) / (n * k * (k * k * k - k))), 6)
        |       END AS chi2_f_tie
        |FROM sums, ties""".stripMargin,

    // demeaning cancels inside the difference — all integers
    "q293_durbin_watson" ->
      """WITH g AS (SELECT CAST(ts AS DATE) - DATE '1970-01-01' AS day,
        |                  CAST(count(*) AS BIGINT) AS x
        |           FROM events GROUP BY 1),
        |l AS (SELECT x, x - lag(x) OVER (ORDER BY day) AS dx FROM g),
        |sums AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |                CAST(sum(x * x) AS BIGINT) AS sxx,
        |                CAST(sum(dx * dx) AS BIGINT) AS sdd
        |         FROM l)
        |SELECT n, sdd AS sum_sq_diff,
        |       CASE WHEN CAST(sxx AS DOUBLE) * n - CAST(sx AS DOUBLE) * sx > 0 THEN
        |         round(CAST(sdd AS DOUBLE) * n
        |               / (CAST(sxx AS DOUBLE) * n - CAST(sx AS DOUBLE) * sx), 6) END AS dw
        |FROM sums""".stripMargin,

    // distinct-value grid per source; ln/abs folds on the ordered
    // per-slice window; perfectly equal slices sign-pinned to +0.0
    "q294_inequality" ->
      """WITH d AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v
        |           FROM documents WHERE n_chars > 0),
        |cells AS (SELECT g, v, count(*) AS t FROM d GROUP BY 1, 2),
        |tot AS (SELECT g, CAST(sum(t) AS BIGINT) AS n, CAST(sum(t * v) AS BIGINT) AS sx
        |        FROM cells GROUP BY g),
        |tot2 AS (SELECT g, n, sx, CAST(sx AS DOUBLE) / n AS mu FROM tot),
        |acc AS (SELECT c.g, c.v, n, sx, mu,
        |               sum(t * (v / mu) * ln(v / mu)) OVER w AS theil_acc,
        |               sum(t * ln(CAST(v AS DOUBLE))) OVER w AS ln_acc,
        |               sum(t * abs(v - mu)) OVER w AS abs_acc
        |        FROM cells c JOIN tot2 USING (g)
        |        WINDOW w AS (PARTITION BY c.g ORDER BY c.v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |fin AS (SELECT *, row_number() OVER (PARTITION BY g ORDER BY v DESC) AS rn FROM acc)
        |SELECT g AS source, n, round(mu, 6) AS mean,
        |       round(theil_acc / n, 6) + 0.0 AS theil,
        |       round(1.0 - exp(ln_acc / n) / mu, 6) + 0.0 AS atkinson_1,
        |       round(abs_acc / (2.0 * sx), 6) + 0.0 AS hoover
        |FROM fin WHERE rn = 1 ORDER BY source""".stripMargin,

    // per-stratum integer sums; mean/weight terms fold on the ordered
    // stratum window; Kish deff closed-form
    "q295_post_stratified" ->
      """WITH d AS (SELECT lang AS h, CAST(n_chars AS BIGINT) AS v FROM documents),
        |strata AS (SELECT h, CAST(count(*) AS BIGINT) AS n_h, CAST(sum(v) AS BIGINT) AS sx_h
        |           FROM d GROUP BY 1),
        |acc AS (SELECT h, count(*) OVER w AS k, sum(n_h) OVER w AS n, sum(sx_h) OVER w AS sx,
        |               sum(CAST(sx_h AS DOUBLE) / n_h) OVER w AS mean_acc,
        |               sum(CAST(n_h AS DOUBLE) * (1.0 / n_h)) OVER w AS sw,
        |               sum(CAST(n_h AS DOUBLE) * (1.0 / n_h) * (1.0 / n_h)) OVER w AS sww
        |        FROM strata
        |        WINDOW w AS (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |fin AS (SELECT * FROM acc ORDER BY h DESC LIMIT 1)
        |SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
        |       round(CAST(sx AS DOUBLE) / n, 6) AS mean_raw,
        |       round(mean_acc / k, 6) AS mean_post,
        |       round(CAST(n AS DOUBLE) * sww / (sw * sw), 6) AS deff_kish
        |FROM fin""".stripMargin,

    // fixed 512-point midpoint grid; max-centred log-weights; exclusive
    // cross-CDF convention mirrored exactly
    "q296_bayes_ab" ->
      """WITH e AS (SELECT user_id % 2 AS g,
        |                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS y
        |           FROM events),
        |tot AS (SELECT CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |               CAST(sum(CASE WHEN g = 0 THEN y ELSE 0 END) AS BIGINT) AS k0,
        |               CAST(sum(CASE WHEN g <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |               CAST(sum(CASE WHEN g <> 0 THEN y ELSE 0 END) AS BIGINT) AS k1
        |        FROM e),
        |grid AS (SELECT n0, k0, n1, k1, unnest(generate_series(1, 512)) AS j FROM tot),
        |g2 AS (SELECT *, (CAST(j AS DOUBLE) - 0.5) / 512 AS p FROM grid),
        |g3 AS (SELECT *, k0 * ln(p) + (n0 - k0) * ln(1.0 - p) AS lw0,
        |              k1 * ln(p) + (n1 - k1) * ln(1.0 - p) AS lw1
        |       FROM g2),
        |ctr AS (SELECT max(lw0) AS m0, max(lw1) AS m1 FROM g3),
        |g4 AS (SELECT g3.*, exp(lw0 - m0) AS w0, exp(lw1 - m1) AS w1 FROM g3, ctr),
        |g5 AS (SELECT *, sum(w0) OVER w AS s0, sum(w1) OVER w AS s1
        |       FROM g4 WINDOW w AS (ORDER BY j ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |acc AS (SELECT *, sum(w1 * (s0 - w0)) OVER w AS num
        |        FROM g5 WINDOW w AS (ORDER BY j ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |fin AS (SELECT * FROM acc ORDER BY j DESC LIMIT 1)
        |SELECT n0, k0, n1, k1,
        |       round(CAST(k0 + 1 AS DOUBLE) / (n0 + 2), 6) AS mean0,
        |       round(CAST(k1 + 1 AS DOUBLE) / (n1 + 2), 6) AS mean1,
        |       round(CAST(k1 + 1 AS DOUBLE) / (n1 + 2)
        |             - CAST(k0 + 1 AS DOUBLE) / (n0 + 2), 6) + 0.0 AS lift,
        |       round(num / (s0 * s1), 6) AS p_beats
        |FROM fin""".stripMargin,

    // one partial agg over the bounded covariate×arm grid; closed-form
    // SMD/ratio at the edge (DuckDB dayofweek is 0-based — shift)
    "q297_balance_smd" ->
      """WITH longf AS (
        |  SELECT 'value_milli' AS cov, user_id % 2 AS g,
        |         CAST(round(value * 1000, 0) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL
        |  UNION ALL
        |  SELECT 'hour', user_id % 2, CAST(extract(hour FROM ts) AS BIGINT) FROM events
        |  UNION ALL
        |  SELECT 'dow', user_id % 2, CAST(dayofweek(ts) + 1 AS BIGINT) FROM events),
        |cells AS (SELECT cov,
        |                 CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |                 CAST(sum(CASE WHEN g = 0 THEN v ELSE 0 END) AS BIGINT) AS sx0,
        |                 CAST(sum(CASE WHEN g = 0 THEN v * v ELSE 0 END) AS BIGINT) AS sxx0,
        |                 CAST(sum(CASE WHEN g <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |                 CAST(sum(CASE WHEN g <> 0 THEN v ELSE 0 END) AS BIGINT) AS sx1,
        |                 CAST(sum(CASE WHEN g <> 0 THEN v * v ELSE 0 END) AS BIGINT) AS sxx1
        |          FROM longf GROUP BY cov)
        |SELECT cov AS covariate, n0, n1,
        |       CASE WHEN n0 > 0 THEN round(CAST(sx0 AS DOUBLE) / n0, 6) END AS mean0,
        |       CASE WHEN n1 > 0 THEN round(CAST(sx1 AS DOUBLE) / n1, 6) END AS mean1,
        |       CASE WHEN n0 > 1 AND n1 > 1 AND
        |                 ((sxx0 - CAST(sx0 AS DOUBLE) * sx0 / n0) / (n0 - 1)
        |                  + (sxx1 - CAST(sx1 AS DOUBLE) * sx1 / n1) / (n1 - 1)) > 0 THEN
        |         round((CAST(sx1 AS DOUBLE) / n1 - CAST(sx0 AS DOUBLE) / n0)
        |               / sqrt(((sxx1 - CAST(sx1 AS DOUBLE) * sx1 / n1) / (n1 - 1)
        |                       + (sxx0 - CAST(sx0 AS DOUBLE) * sx0 / n0) / (n0 - 1)) / 2.0), 6)
        |           + 0.0 END AS smd,
        |       CASE WHEN n0 > 1 AND n1 > 1 AND
        |                 (sxx0 - CAST(sx0 AS DOUBLE) * sx0 / n0) / (n0 - 1) > 0 THEN
        |         round(((sxx1 - CAST(sx1 AS DOUBLE) * sx1 / n1) / (n1 - 1))
        |               / ((sxx0 - CAST(sx0 AS DOUBLE) * sx0 / n0) / (n0 - 1)), 6)
        |       END AS var_ratio
        |FROM cells ORDER BY covariate""".stripMargin,

    // integer 2x2 cells; RR / log-RR SE / both E's closed-form
    "q298_e_value" ->
      """WITH e AS (SELECT user_id % 2 AS x,
        |                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |           FROM events),
        |tot AS (SELECT CAST(sum(CASE WHEN x = 1 THEN y ELSE 0 END) AS BIGINT) AS a,
        |               CAST(sum(CASE WHEN x = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |               CAST(sum(CASE WHEN x = 0 THEN y ELSE 0 END) AS BIGINT) AS c,
        |               CAST(sum(CASE WHEN x = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
        |        FROM e),
        |t2 AS (SELECT *,
        |         CAST(a AS DOUBLE) * n0 / (CAST(c AS DOUBLE) * n1) AS rr,
        |         sqrt(1.0 / a - 1.0 / n1 + 1.0 / c - 1.0 / n0) AS se,
        |         (a > 0 AND c > 0 AND n1 > a AND n0 > c) AS ok
        |       FROM tot),
        |t3 AS (SELECT *,
        |         exp(ln(rr) - 1.959964 * se) AS rr_lo_raw,
        |         exp(ln(rr) + 1.959964 * se) AS rr_hi_raw,
        |         CASE WHEN rr >= 1 THEN rr ELSE 1.0 / rr END AS rr_star
        |       FROM t2),
        |t4 AS (SELECT *,
        |         CASE WHEN rr >= 1 THEN rr_lo_raw ELSE 1.0 / rr_hi_raw END AS bound
        |       FROM t3)
        |SELECT a, n1, c, n0,
        |       CASE WHEN ok THEN round(rr, 6) END AS rr,
        |       CASE WHEN ok THEN round(rr_lo_raw, 6) END AS rr_lo,
        |       CASE WHEN ok THEN round(rr_hi_raw, 6) END AS rr_hi,
        |       CASE WHEN ok THEN round(rr_star + sqrt(rr_star * (rr_star - 1)), 6) END AS e_value,
        |       CASE WHEN ok THEN
        |         CASE WHEN bound > 1 THEN round(bound + sqrt(bound * (bound - 1)), 6)
        |              ELSE 1.0 END
        |       END AS e_value_ci
        |FROM t4""".stripMargin,

    // integer score-block range sums on the value grid; parity-branched
    // exact null moments mirrored on both engines
    "q299_ansari_bradley" ->
      """WITH d AS (SELECT CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS s, n_chars AS v FROM documents),
        |cells AS (SELECT v, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS c0,
        |                 sum(CASE WHEN s <> 0 THEN 1 ELSE 0 END) AS c1,
        |                 count(*) AS t
        |          FROM d GROUP BY v),
        |grid AS (SELECT *, sum(t) OVER w AS cum FROM cells
        |         WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT max(cum) AS nn, sum(c0) AS n0, sum(c1) AS n1 FROM grid),
        |sc AS (SELECT g.v, g.c0, g.t, nn, n0, n1,
        |              g.cum - g.t + 1 AS lo, g.cum AS hi,
        |              (nn + 1) // 2 AS mfloor
        |       FROM grid g, tot),
        |sc2 AS (SELECT *, least(hi, mfloor) AS atop, greatest(lo, mfloor + 1) AS bbot FROM sc),
        |sc3 AS (SELECT *,
        |          CASE WHEN lo <= atop THEN (atop * (atop + 1) - (lo - 1) * lo) // 2 ELSE 0 END
        |          + CASE WHEN bbot <= hi THEN (hi - bbot + 1) * (nn + 1)
        |                   - ((hi * (hi + 1) - (bbot - 1) * bbot) // 2) ELSE 0 END AS ss
        |        FROM sc2),
        |acc AS (SELECT *, sum(CAST(c0 * ss AS DOUBLE) / t)
        |                    OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ab
        |        FROM sc3),
        |fin AS (SELECT * FROM acc ORDER BY v DESC LIMIT 1),
        |rep AS (SELECT CAST(n0 AS BIGINT) AS n0x, CAST(n1 AS BIGINT) AS n1x, nn, ab,
        |               CASE WHEN nn % 2 = 0 THEN CAST(n0 AS DOUBLE) * (nn + 2) / 4.0
        |                    ELSE CAST(n0 AS DOUBLE) * (nn + 1) * (nn + 1) / (4.0 * nn) END AS e_ab,
        |               CASE WHEN nn % 2 = 0 THEN
        |                      CAST(n0 AS DOUBLE) * n1 * (nn + 2) * (nn - 2) / (48.0 * (nn - 1))
        |                    ELSE CAST(n0 AS DOUBLE) * n1 * (nn + 1) * (3 + nn * nn)
        |                         / (48.0 * nn * nn) END AS var_ab
        |        FROM fin)
        |SELECT n0x AS n1, n1x AS n2, round(ab, 6) AS ab, round(e_ab, 6) AS e_ab,
        |       CASE WHEN var_ab > 0 THEN round((ab - e_ab) / sqrt(var_ab), 6) + 0.0 END AS z
        |FROM rep""".stripMargin,

    // integer overlap sums on the per-slice value grid; cut values are
    // conditional-min grid lookups
    "q300_robust_location" ->
      """WITH d AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v FROM documents),
        |cells AS (SELECT g, v, count(*) AS t FROM d GROUP BY 1, 2),
        |grid AS (SELECT *, sum(t) OVER gw AS cum FROM cells
        |         WINDOW gw AS (PARTITION BY g ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |g2 AS (SELECT *, max(cum) OVER (PARTITION BY g) AS n FROM grid),
        |g3 AS (SELECT *, n * 10 // 100 AS k, cum - t + 1 AS lo FROM g2),
        |g4 AS (SELECT *, greatest(CAST(0 AS BIGINT),
        |                          least(cum, n - k) - greatest(lo, k + 1) + 1) AS overlap
        |       FROM g3),
        |agg AS (SELECT g, CAST(max(n) AS BIGINT) AS n, CAST(max(k) AS BIGINT) AS k_trim,
        |               CAST(sum(v * t) AS BIGINT) AS sx,
        |               CAST(sum(v * overlap) AS BIGINT) AS core_sum,
        |               CAST(min(CASE WHEN cum >= k + 1 THEN v END) AS BIGINT) AS v_low,
        |               CAST(min(CASE WHEN cum >= n - k THEN v END) AS BIGINT) AS v_high
        |        FROM g4 GROUP BY g)
        |SELECT g AS source, n, k_trim,
        |       round(CAST(sx AS DOUBLE) / n, 6) AS mean_raw,
        |       CASE WHEN n - 2 * k_trim > 0 THEN
        |         round(CAST(core_sum AS DOUBLE) / (n - 2 * k_trim), 6) END AS trimmed_mean,
        |       round(CAST(core_sum + k_trim * v_low + k_trim * v_high AS DOUBLE) / n, 6) AS winsorized_mean
        |FROM agg ORDER BY source""".stripMargin,

    // pairwise differences collapsed to the value-grid product; weighted
    // median via integer cum lookups, type-7 middle-pair average
    "q301_hodges_lehmann" ->
      """WITH d AS (SELECT CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS s, n_chars AS v FROM documents),
        |c0 AS (SELECT v AS v0, count(*) AS c0 FROM d WHERE s = 0 GROUP BY 1),
        |c1 AS (SELECT v AS v1, count(*) AS c1 FROM d WHERE s <> 0 GROUP BY 1),
        |diffs AS (SELECT v1 - v0 AS diff, sum(c0 * c1) AS wgt FROM c0 CROSS JOIN c1 GROUP BY 1),
        |grid AS (SELECT diff, sum(wgt) OVER (ORDER BY diff
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM diffs),
        |tot AS (SELECT max(cum) AS nw FROM grid),
        |ks AS (SELECT nw, (nw + 1) // 2 AS k1, (nw + 2) // 2 AS k2 FROM tot),
        |agg AS (SELECT CAST(max(nw) AS BIGINT) AS n_pairs,
        |               min(CASE WHEN cum >= k1 THEN diff END) AS d1,
        |               min(CASE WHEN cum >= k2 THEN diff END) AS d2
        |        FROM grid, ks)
        |SELECT n_pairs, round(CAST(d1 + d2 AS DOUBLE) / 2.0, 6) + 0.0 AS hl_shift
        |FROM agg""".stripMargin,

    // pooled midranks (exact ½-multiples); Â and its label from the same
    // closed form; labels decided on the ROUNDED value
    "q302_vargha_delaney" ->
      """WITH d AS (SELECT CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS s, n_chars AS v FROM documents),
        |cells AS (SELECT v, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS c0,
        |                 sum(CASE WHEN s <> 0 THEN 1 ELSE 0 END) AS c1,
        |                 count(*) AS t
        |          FROM d GROUP BY v),
        |g AS (SELECT *, sum(t) OVER (ORDER BY v
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM cells),
        |r AS (SELECT *, CAST(cum - t AS DOUBLE) + CAST(t + 1 AS DOUBLE) / 2.0 AS r FROM g),
        |sums AS (SELECT CAST(sum(c0) AS BIGINT) AS cnt0, CAST(sum(c1) AS BIGINT) AS cnt1,
        |                sum(r * c1) AS r1sum FROM r),
        |sc AS (SELECT cnt0, cnt1,
        |              round((r1sum / cnt1 - CAST(cnt1 + 1 AS DOUBLE) / 2.0) / cnt0, 6) AS a12
        |       FROM sums)
        |SELECT cnt0 AS n1, cnt1 AS n2, a12,
        |       CASE WHEN abs(a12 - 0.5) < 0.06 THEN 'negligible'
        |            WHEN abs(a12 - 0.5) < 0.14 THEN 'small'
        |            WHEN abs(a12 - 0.5) < 0.21 THEN 'medium'
        |            ELSE 'large' END AS magnitude
        |FROM sc""".stripMargin,

    // integer cumsums on the ordered distinct-score grid; F1 is one
    // integer ratio per row (argmax ties break to the highest score)
    "q304_avg_precision" ->
      """WITH d AS (
        |  SELECT len(list_filter(string_split_regex(text, '\s+'), t -> len(t) > 0)) // 16 AS score,
        |         CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |cells AS (SELECT score, CAST(sum(y) AS BIGINT) AS pos, count(*) AS tot
        |          FROM d GROUP BY 1),
        |g AS (SELECT *, sum(pos) OVER w AS tp, sum(tot) OVER w AS np FROM cells
        |      WINDOW w AS (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |t AS (SELECT max(tp) AS p_tot, max(np) AS n FROM g),
        |acc AS (SELECT *, round(2.0 * tp / (np + p_tot), 6) AS f1,
        |               sum(pos * (CAST(tp AS DOUBLE) / np))
        |                 OVER (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS apacc
        |        FROM g, t),
        |bf AS (SELECT max(f1) AS best_f1 FROM acc),
        |bt AS (SELECT CAST(max(score) AS BIGINT) AS best_f1_score,
        |              CAST(max(best_f1) AS DOUBLE) AS best_f1
        |       FROM acc, bf WHERE f1 = best_f1),
        |fin AS (SELECT * FROM acc ORDER BY score ASC LIMIT 1)
        |SELECT CAST(n AS BIGINT) AS n, CAST(p_tot AS BIGINT) AS n_pos,
        |       CASE WHEN p_tot > 0 THEN round(apacc / p_tot, 6) END AS ap,
        |       best_f1, best_f1_score
        |FROM fin, bt""".stripMargin,

    // DuckDB dayofweek is 0-based (Sunday=0); Spark's is 1-based — shift.
    // Directions via integer cross-multiplication: division-free.
    "q256_simpson" ->
      """WITH e AS (SELECT dayofweek(ts) + 1 AS dow, user_id % 2 AS v,
        |                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS hit
        |           FROM events),
        |g AS (SELECT dow,
        |             CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |             CAST(sum(CASE WHEN v = 0 THEN hit ELSE 0 END) AS BIGINT) AS k0,
        |             CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |             CAST(sum(CASE WHEN v = 1 THEN hit ELSE 0 END) AS BIGINT) AS k1
        |      FROM e GROUP BY 1),
        |t AS (SELECT sum(n0) AS pn0, sum(k0) AS pk0, sum(n1) AS pn1, sum(k1) AS pk1 FROM g),
        |s AS (SELECT *,
        |        CAST(CASE WHEN k1 * n0 > k0 * n1 THEN 1
        |                  WHEN k1 * n0 < k0 * n1 THEN -1 ELSE 0 END AS BIGINT) AS dir_stratum,
        |        CAST(CASE WHEN pk1 * pn0 > pk0 * pn1 THEN 1
        |                  WHEN pk1 * pn0 < pk0 * pn1 THEN -1 ELSE 0 END AS BIGINT) AS dir_pooled
        |      FROM g, t)
        |SELECT CAST(dow AS BIGINT) AS dow, n0, k0, n1, k1, dir_stratum, dir_pooled,
        |       dir_stratum * dir_pooled = -1 AS flipped
        |FROM s ORDER BY dow""".stripMargin,

    // cumulative-look z against the published OBF boundaries; cuts are
    // integer thirds of the span
    "q257_group_sequential" ->
      """WITH sp AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM events),
        |cts AS (SELECT mn + (mx - mn) // 3 AS c1,
        |               mn + (2 * (mx - mn)) // 3 AS c2,
        |               mn + (mx - mn) AS c3 FROM sp),
        |e AS (SELECT epoch_us(ts) AS us, user_id % 2 AS v,
        |             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS hit
        |      FROM events),
        |g AS (SELECT
        |  CAST(sum(CASE WHEN us <= c1 AND v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0_1,
        |  CAST(sum(CASE WHEN us <= c1 AND v = 0 THEN hit ELSE 0 END) AS BIGINT) AS k0_1,
        |  CAST(sum(CASE WHEN us <= c1 AND v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1_1,
        |  CAST(sum(CASE WHEN us <= c1 AND v = 1 THEN hit ELSE 0 END) AS BIGINT) AS k1_1,
        |  CAST(sum(CASE WHEN us <= c2 AND v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0_2,
        |  CAST(sum(CASE WHEN us <= c2 AND v = 0 THEN hit ELSE 0 END) AS BIGINT) AS k0_2,
        |  CAST(sum(CASE WHEN us <= c2 AND v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1_2,
        |  CAST(sum(CASE WHEN us <= c2 AND v = 1 THEN hit ELSE 0 END) AS BIGINT) AS k1_2,
        |  CAST(sum(CASE WHEN us <= c3 AND v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0_3,
        |  CAST(sum(CASE WHEN us <= c3 AND v = 0 THEN hit ELSE 0 END) AS BIGINT) AS k0_3,
        |  CAST(sum(CASE WHEN us <= c3 AND v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1_3,
        |  CAST(sum(CASE WHEN us <= c3 AND v = 1 THEN hit ELSE 0 END) AS BIGINT) AS k1_3
        | FROM e, cts),
        |l AS (
        |  SELECT 1::BIGINT AS look, n0_1 AS n0, k0_1 AS k0, n1_1 AS n1, k1_1 AS k1, 3.471 AS obf_bound FROM g
        |  UNION ALL
        |  SELECT 2::BIGINT, n0_2, k0_2, n1_2, k1_2, 2.454 FROM g
        |  UNION ALL
        |  SELECT 3::BIGINT, n0_3, k0_3, n1_3, k1_3, 2.004 FROM g),
        |z AS (SELECT *,
        |        round((CAST(k1 AS DOUBLE) / n1 - CAST(k0 AS DOUBLE) / n0)
        |          / sqrt((CAST(k0 + k1 AS DOUBLE) / (n0 + n1))
        |                 * (1.0 - CAST(k0 + k1 AS DOUBLE) / (n0 + n1))
        |                 * (1.0 / n0 + 1.0 / n1)), 4) AS z
        |      FROM l)
        |SELECT look, n0, k0, n1, k1, z, obf_bound, abs(z) >= obf_bound AS crossed
        |FROM z ORDER BY look""".stripMargin,

    // decile = exact integer order statistic ((rk-1)*10 div n);
    // lift/gain divide integer counts once at the edge
    "q258_decile_lift" ->
      """WITH d AS (SELECT doc_id, n_chars AS score,
        |                  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |           FROM documents),
        |r AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk FROM d),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS kk FROM d),
        |dd AS (SELECT ((rk - 1) * 10) // n + 1 AS decile, y, n, kk FROM r, t),
        |g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_d,
        |             CAST(sum(y) AS BIGINT) AS k_d,
        |             max(n) AS n, max(kk) AS kk
        |      FROM dd GROUP BY 1),
        |cw AS (SELECT *, sum(k_d) OVER (ORDER BY decile
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_k
        |       FROM g)
        |SELECT CAST(decile AS BIGINT) AS decile, n_d, k_d,
        |       round(CAST(k_d AS DOUBLE) * n / (n_d * kk), 4) AS lift,
        |       CAST(cum_k AS BIGINT) AS cum_k,
        |       round(CAST(cum_k AS DOUBLE) / kk, 4) AS cum_gain
        |FROM cw ORDER BY decile""".stripMargin,

    // pure integer bucket algebra: refill by the tick gap (clamped at
    // capacity 5), admit min(n, tokens); first row of each key sees dt=0
    "q254_token_bucket" ->
      """WITH RECURSIVE
        |d AS (SELECT event_type || '#' ||
        |             CAST((epoch_us(ts) // 3600000000) // 168 AS VARCHAR) AS key,
        |             epoch_us(ts) // 3600000000 AS t, CAST(count(*) AS BIGINT) AS n
        |      FROM events GROUP BY 1, 2),
        |s AS (SELECT key, t, n, row_number() OVER (PARTITION BY key ORDER BY t) AS rn
        |      FROM d),
        |f AS (
        |  SELECT key, 0::BIGINT AS rn, 5::BIGINT AS tokens, 0::BIGINT AS t_prev,
        |         0::BIGINT AS t, 0::BIGINT AS n,
        |         0::BIGINT AS admitted, 0::BIGINT AS rejected
        |  FROM (SELECT DISTINCT key FROM s)
        |  UNION ALL
        |  SELECT s.key, s.rn,
        |         least(5, f.tokens + CASE WHEN f.rn = 0 THEN 0 ELSE s.t - f.t_prev END)
        |           - least(s.n, least(5, f.tokens + CASE WHEN f.rn = 0 THEN 0 ELSE s.t - f.t_prev END)),
        |         s.t, s.t, s.n,
        |         least(s.n, least(5, f.tokens + CASE WHEN f.rn = 0 THEN 0 ELSE s.t - f.t_prev END)),
        |         s.n - least(s.n, least(5, f.tokens + CASE WHEN f.rn = 0 THEN 0 ELSE s.t - f.t_prev END))
        |  FROM f JOIN s ON s.key = f.key AND s.rn = f.rn + 1
        |)
        |SELECT key, t, n, admitted, rejected, tokens AS tokens_after
        |FROM f WHERE rn >= 1 ORDER BY key, t""".stripMargin,

    // the PH fold replayed with the gate's exact operation order:
    // mean = (sx+n)/(cnt+1) with an INTEGER numerator; m' = m + (n -
    // mean - 0.5); min m carried; PH = m - min m
    "q252_page_hinkley" ->
      """WITH RECURSIVE
        |d AS (SELECT event_type AS key, epoch_us(ts) // 86400000000 AS bucket,
        |             CAST(count(*) AS BIGINT) AS n
        |      FROM events GROUP BY 1, 2),
        |s AS (SELECT key, bucket, n,
        |             row_number() OVER (PARTITION BY key ORDER BY bucket) AS rn
        |      FROM d),
        |f AS (
        |  SELECT key, 0::BIGINT AS rn, 0::BIGINT AS cnt, 0::BIGINT AS sx,
        |         CAST(0 AS DOUBLE) AS m, CAST(0 AS DOUBLE) AS minm,
        |         0::BIGINT AS bucket, 0::BIGINT AS n
        |  FROM (SELECT DISTINCT key FROM s)
        |  UNION ALL
        |  SELECT s.key, s.rn, f.cnt + 1, f.sx + s.n,
        |         f.m + (s.n - CAST(f.sx + s.n AS DOUBLE) / (f.cnt + 1) - 0.5),
        |         least(f.minm,
        |               f.m + (s.n - CAST(f.sx + s.n AS DOUBLE) / (f.cnt + 1) - 0.5)),
        |         s.bucket, s.n
        |  FROM f JOIN s ON s.key = f.key AND s.rn = f.rn + 1
        |)
        |SELECT key, bucket, n, round(m, 6) AS m, round(m - minm, 6) AS ph,
        |       round(m - minm, 6) > 20.0 AS alarm, rn AS n_seen
        |FROM f WHERE rn >= 1 ORDER BY key, bucket""".stripMargin,

    // κ from the ROUNDED P̄/P̄e (the ladder rule: round before compare)
    "q240_fleiss_kappa" ->
      """WITH r AS (
        |  SELECT doc_id,
        |         (CASE WHEN contains(lower(text), ' the ') THEN 1 ELSE 0 END
        |          + CASE WHEN length(regexp_replace(text, '[^\x00-\x7F]', '', 'g')) * 20
        |                      >= length(text) * 19 THEN 1 ELSE 0 END
        |          + CASE WHEN n_chars >= 800 THEN 1 ELSE 0 END)::BIGINT AS en_cnt
        |  FROM documents),
        |counts AS (
        |  SELECT doc_id, 'en' AS category, en_cnt AS cnt FROM r
        |  UNION ALL
        |  SELECT doc_id, 'other' AS category, 3 - en_cnt AS cnt FROM r),
        |sums AS (
        |  SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_items,
        |         CAST(sum(cnt * cnt) AS BIGINT) AS sq_sum
        |  FROM counts),
        |pc AS (
        |  SELECT CAST(sum(cj * cj) AS BIGINT) AS cj_sq_sum
        |  FROM (SELECT category, sum(cnt) AS cj FROM counts GROUP BY 1)),
        |k AS (
        |  SELECT n_items, 3::BIGINT AS raters, sq_sum, cj_sq_sum,
        |         round(CAST(sq_sum - n_items * 3 AS DOUBLE)
        |               / (n_items * 3 * 2), 6) AS p_bar,
        |         round(CAST(cj_sq_sum AS DOUBLE)
        |               / ((n_items * 3) * (n_items * 3)), 6) AS pe_bar
        |  FROM sums, pc)
        |SELECT n_items, raters, sq_sum, cj_sq_sum, p_bar, pe_bar,
        |       CASE WHEN pe_bar = 1.0 THEN 0.0
        |            ELSE round((p_bar - pe_bar) / (1.0 - pe_bar), 6) END AS kappa
        |FROM k""".stripMargin
  )

  /** The q215 oracle with the SPRT constants rendered from the SAME
    * Scala doubles the gate uses (shortest round-trip decimal — DuckDB
    * parses back to the identical bits; computing ln() in each engine
    * could differ by 1 ulp and shift the crossing index).
    */
  private lazy val sprtSql: String = {
    val c1 = math.log(0.6 / 0.4)
    val c2 = math.log(0.4 / 0.6)
    val a = math.log(19.0)
    s"""WITH ev AS (
       |  SELECT user_id % 2 AS variant, epoch_us(ts) AS us, event_id,
       |         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS hit
       |  FROM events),
       |w AS (
       |  SELECT variant,
       |         count(*) OVER win AS n, sum(hit) OVER win AS k
       |  FROM ev
       |  WINDOW win AS (PARTITION BY variant ORDER BY us, event_id
       |                 ROWS UNBOUNDED PRECEDING)),
       |walk AS (SELECT variant, n, k, k * $c1 + (n - k) * $c2 AS llr FROM w),
       |crossed AS (SELECT variant, min(n) AS cross_n FROM walk
       |            WHERE llr >= $a OR llr <= -$a GROUP BY variant),
       |cs AS (SELECT walk.variant, cross_n,
       |              CASE WHEN llr >= $a THEN 'reject_h0' ELSE 'accept_h0' END AS decision
       |       FROM walk JOIN crossed
       |         ON walk.variant = crossed.variant AND walk.n = crossed.cross_n),
       |fin AS (SELECT variant, CAST(max(n) AS BIGINT) AS n,
       |               CAST(max(k) AS BIGINT) AS k,
       |               round(max_by(llr, n), 4) AS llr_final
       |        FROM walk GROUP BY variant)
       |SELECT fin.variant, n, k, llr_final,
       |       coalesce(decision, 'continue') AS decision,
       |       CAST(cross_n AS BIGINT) AS cross_n
       |FROM fin LEFT JOIN cs USING (variant) ORDER BY fin.variant""".stripMargin
  }

  /** Max one-insert cascade depth the q205 oracle unrolls: a 48-tick
    * window holds bucket sizes ≤32, so a single insert chains at most 6
    * oldest-pair merges (1→2→4→8→16→32); 9 adds safety margin.
    */
  private val CascadeLevels = 9

  /** Recursive-CTE replay of StreamDgim.step: state = (sizes, times)
    * lists newest-first; each iteration prepends the size-1 bucket, then
    * [[CascadeLevels]] lateral rewrites each apply ONE oldest-pair merge
    * (exactly the Scala walk's restart-from-head semantics), then expiry
    * keeps in-window buckets and the estimate counts full buckets plus
    * half the oldest — integer-only, so the replay is bit-exact.
    */
  private lazy val dgimReplaySql: String = {
    val cascade = new StringBuilder
    var ps = "i0.s0"
    var pt = "i0.t0"
    for (lvl <- 1 to CascadeLevels) {
      cascade.append(
        s"""  CROSS JOIN LATERAL (SELECT list_filter(range(1, len($ps)-1),
           |      i -> $ps[i] = $ps[i+1] AND $ps[i+1] = $ps[i+2])[1] AS idx) x$lvl
           |  CROSS JOIN LATERAL (SELECT
           |      CASE WHEN x$lvl.idx IS NULL THEN $ps
           |           ELSE $ps[1:x$lvl.idx] || [2*$ps[x$lvl.idx+1]] || $ps[x$lvl.idx+3:] END AS s,
           |      CASE WHEN x$lvl.idx IS NULL THEN $pt
           |           ELSE $pt[1:x$lvl.idx] || [$pt[x$lvl.idx+1]] || $pt[x$lvl.idx+3:] END AS tm) c$lvl
           |""".stripMargin)
      ps = s"c$lvl.s"
      pt = s"c$lvl.tm"
    }
    s"""WITH RECURSIVE
       |h AS (SELECT key, t, row_number() OVER (PARTITION BY key ORDER BY t) AS rn
       |      FROM (SELECT event_type || '#' || CAST(t // 168 AS VARCHAR) AS key, t
       |            FROM (SELECT DISTINCT event_type, epoch_us(ts) // 3600000000 AS t
       |                  FROM events))),
       |f AS (
       |  SELECT key, 0::BIGINT AS rn, []::BIGINT[] AS s, []::BIGINT[] AS tm,
       |         0::BIGINT AS t, 0::BIGINT AS est, 0::BIGINT AS nb
       |  FROM (SELECT DISTINCT key FROM h)
       |  UNION ALL
       |  SELECT f.key, h.rn, m.s2, m.tm2, h.t,
       |         CAST(coalesce(list_sum(m.s2[1:len(m.s2)-1]), 0)
       |              + (m.s2[len(m.s2)]+1)//2 AS BIGINT) AS est,
       |         CAST(len(m.s2) AS BIGINT) AS nb
       |  FROM f
       |  JOIN h ON h.key = f.key AND h.rn = f.rn + 1
       |  CROSS JOIN LATERAL (SELECT list_prepend(1::BIGINT, f.s) AS s0,
       |                             list_prepend(h.t, f.tm) AS t0) i0
       |$cascade  CROSS JOIN LATERAL (SELECT list_filter(range(1, len($ps)+1),
       |      i -> $pt[i] > h.t - 48) AS kp) e0
       |  CROSS JOIN LATERAL (SELECT list_transform(e0.kp, i -> $ps[i]) AS s2,
       |                             list_transform(e0.kp, i -> $pt[i]) AS tm2) m
       |)
       |SELECT key, t, est AS estimate, nb AS n_buckets
       |FROM f WHERE rn >= 1 ORDER BY key, t""".stripMargin
  }
}
