package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan-Meier product-limit survival estimate (Kaplan & Meier 1958)
  * over right-censored durations — "how long does a user/job/crawl stay
  * alive", the standard retention read over any event stream.
  *
  * Input: one row per subject with an integer duration and a 0/1 event
  * flag (1 = observed end, 0 = censored). The estimator runs entirely on
  * the DISTINCT-duration grid: n_at_risk(t) = N − (#ended-or-censored
  * before t) and d(t) are integer window cumsums, and the survival
  * product Π(1 − d/n) accumulates as exp(Σ ln((n−d)/n)) on the same
  * ordered bounded grid — a total order, so the float fold is
  * deterministic on both engines (ln/exp literal-shape parity, the
  * q68/q93 precedent).
  */
object Survival {

  /** One row per distinct duration with at least one observed event:
    * `t`, `n_risk`, `d` (events), `c` (censored at t), `survival` (6dp).
    */
  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: String): DataFrame = {
    val d = df.select(col(durationCol).cast("long").as("t"),
      col(eventCol).cast("long").as("e"))
    val cells = d.groupBy(col("t")).agg(
      sum(col("e")).as("d"),
      sum(lit(1L) - col("e")).as("c"),
      count(lit(1)).as("all"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = cells.agg(sum(col("all")).as("nn"))
    cells.crossJoin(broadcast(tot))
      // at-risk just before t: everyone whose duration >= t
      .withColumn("left_through", sum(col("all")).over(w))
      .withColumn("n_risk", col("nn") - col("left_through") + col("all"))
      // n_risk = d (everyone left dies at t) must contribute −∞, not the
      // engines' divergent log(0) (Spark: NULL, DuckDB: -inf) — pin the
      // branch explicitly; exp(−∞) = +0.0 on both
      .withColumn("surv_raw",
        exp(sum(when(col("d") > 0 && col("n_risk") > col("d"),
          log((col("n_risk") - col("d")).cast("double") / col("n_risk")))
          .when(col("d") > 0, lit(Double.NegativeInfinity))
          .otherwise(lit(0.0))).over(w)))
      .filter(col("d") > 0)
      .select(col("t"), col("n_risk"), col("d"), col("c"),
        round(col("surv_raw"), 6).as("survival"))
      .orderBy(col("t"))
  }

  /** Nelson-Aalen cumulative hazard H(t) = Σ d/n on the same
    * distinct-duration grid as [[kaplanMeier]], plus the Breslow
    * survival estimate exp(−H). The hazard increments are one double
    * ratio per grid row accumulated on the ordered bounded grid (total
    * order → deterministic float fold on both engines); everything
    * upstream of them is an integer window cumsum.
    */
  def nelsonAalen(df: DataFrame, durationCol: String, eventCol: String): DataFrame = {
    val d = df.select(col(durationCol).cast("long").as("t"),
      col(eventCol).cast("long").as("e"))
    val cells = d.groupBy(col("t")).agg(
      sum(col("e")).as("d"),
      count(lit(1)).as("all"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = cells.agg(sum(col("all")).as("nn"))
    cells.crossJoin(broadcast(tot))
      .withColumn("left_through", sum(col("all")).over(w))
      .withColumn("n_risk", col("nn") - col("left_through") + col("all"))
      .withColumn("haz_raw",
        sum(col("d").cast("double") / col("n_risk")).over(w))
      .filter(col("d") > 0)
      .select(col("t"), col("n_risk"), col("d"),
        round(col("haz_raw"), 6).as("na_hazard"),
        round(exp(-col("haz_raw")), 6).as("breslow_surv"))
      .orderBy(col("t"))
  }

  /** Two-group log-rank test (Mantel 1966) on the shared
    * distinct-duration grid: O₁ (group-1 events) is an exact integer;
    * the hypergeometric expectation E₁ = Σ d·n₁/n and variance
    * V = Σ d·n₁·(n−n₁)·(n−d) / (n²·(n−1)) accumulate on the ordered
    * grid (the KSample `fin` fold), so the float sums are
    * order-deterministic. Group at-risk counts are conditional integer
    * cumsums over the SAME window as the totals. The variance product
    * is cast to double before multiplying — at 100 TB, n₁·(n−n₁)·(n−d)·d
    * overflows a long long before it troubles a double's exponent.
    * Input: one row per subject with duration, 0/1 event, 0/1 group.
    */
  def logRank(df: DataFrame, durationCol: String, eventCol: String,
              groupCol: String): DataFrame = {
    val d = df.select(col(durationCol).cast("long").as("t"),
      col(eventCol).cast("long").as("e"),
      col(groupCol).cast("long").as("g"))
    val cells = d.groupBy(col("t")).agg(
      sum(col("e")).as("d"),
      sum(when(col("g") === 1, col("e")).otherwise(0L)).as("d1"),
      count(lit(1)).as("all"),
      sum(when(col("g") === 1, 1L).otherwise(0L)).as("a1"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = cells.agg(sum(col("all")).as("nn"), sum(col("a1")).as("nn1"))
    val acc = cells.crossJoin(broadcast(tot))
      .withColumn("lt", sum(col("all")).over(w))
      .withColumn("lt1", sum(col("a1")).over(w))
      .withColumn("n_risk", col("nn") - col("lt") + col("all"))
      .withColumn("n1_risk", col("nn1") - col("lt1") + col("a1"))
      .withColumn("o1", sum(col("d1")).over(w))
      .withColumn("e1", sum(
        col("d").cast("double") * col("n1_risk") / col("n_risk")).over(w))
      .withColumn("v", sum(when(col("n_risk") > 1,
        col("d").cast("double") * col("n1_risk")
          * (col("n_risk") - col("n1_risk")) * (col("n_risk") - col("d"))
          / (col("n_risk").cast("double") * col("n_risk")
            * (col("n_risk") - 1))).otherwise(lit(0.0))).over(w))
    acc.orderBy(col("t").desc).limit(1)
      .select(col("nn").as("n"), col("nn1").as("n1"), col("o1"),
        round(col("e1"), 6).as("e1"),
        round(col("v"), 6).as("v"),
        // all subjects in one group (or a single death) → no test
        when(col("v") > 0,
          round((col("o1") - col("e1")) / sqrt(col("v")), 6) + lit(0.0)).as("z"),
        when(col("v") > 0,
          round(pow(col("o1") - col("e1"), 2) / col("v"), 6)).as("chi2"))
  }
}
