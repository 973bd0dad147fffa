package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Delete-one-group jackknife influence (Quenouille 1956; Tukey 1958)
  * for a corpus-level ratio: recompute the statistic with each source
  * held out and report how far every source MOVES the headline number —
  * the standard "is one crawl skewing the en-share/dup-rate/quality
  * mean" audit before trusting a mixture decision.
  *
  * Scale story: one partial agg to per-group integer sums + a 1-row
  * broadcast of the totals; every leave-one-out estimate is computed
  * IN-ROW from (K−k_h)/(N−n_h) — integer subtractions, one division,
  * no float aggregation across groups (the variance roll-up is left to
  * the caller precisely because a cross-group float sum is
  * order-dependent; the per-group influence table is the useful,
  * deterministic artifact).
  */
object Jackknife {

  /** θ = ΣhitCol / count. One row per group: n_h, k_h, the full-corpus
    * theta, the delete-one theta, and influence = theta − theta_del.
    */
  def deleteOneGroup(df: DataFrame, keyCol: String,
                     hitCol: org.apache.spark.sql.Column): DataFrame = {
    val g = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_h"),
        sum(when(hitCol, 1L).otherwise(0L)).as("k_h"))
    val tot = g.agg(sum(col("n_h")).as("nn"), sum(col("k_h")).as("kk"))
    g.crossJoin(broadcast(tot))
      .select(col(keyCol), col("n_h"), col("k_h"),
        round(col("kk").cast("double") / col("nn"), 6).as("theta"),
        when(col("nn") > col("n_h"),
          round((col("kk") - col("k_h")).cast("double")
            / (col("nn") - col("n_h")), 6)).as("theta_del"),
        when(col("nn") > col("n_h"),
          round(col("kk").cast("double") / col("nn")
            - (col("kk") - col("k_h")).cast("double")
              / (col("nn") - col("n_h")), 6)).as("influence"))
      .orderBy(col(keyCol))
  }
}
