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
}
