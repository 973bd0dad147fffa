package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Analytics-pipeline operators gated round 8: graph cores (q183),
  * TextRank keyphrases (q184), readability (q185), EWMA smoothing
  * (q186), fill-in-the-middle augmentation (q187), Benford audit
  * (q188), l-diversity (q189), and A/B hypothesis tests (q190).
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
      val ev = Tables.events(s, dir)
      val e1 = ev.select((col("user_id") % 60).as("src"),
        ((col("user_id") * col("user_id") + 7) % 60).as("dst"))
      val e2 = ev.select((col("user_id") % 60).as("src"),
        ((col("user_id") * col("user_id") * col("user_id") + 11) % 60).as("dst"))
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
    // + Welch's t on
    // per-user event counts, all from exact integer sufficient
    // statistics (Σx, Σx² as int64 — no Welford fold, no order
    // dependence), formulas applied once at the output edge.
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
        |), t AS (SELECT l_returnflag, sum(obs) AS n FROM c GROUP BY 1)
        |SELECT c.l_returnflag, c.digit, CAST(c.obs AS BIGINT) AS obs,
        |       round(c.obs / t.n, 4) AS share_obs,
        |       round(log10(1.0 + 1.0 / c.digit), 4) AS share_exp,
        |       round(pow(c.obs - t.n * log10(1.0 + 1.0 / c.digit), 2)
        |             / (t.n * log10(1.0 + 1.0 / c.digit)), 6) AS chi2_part
        |FROM c JOIN t USING (l_returnflag)
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
        |FROM m""".stripMargin
  )
}
