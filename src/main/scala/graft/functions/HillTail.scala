package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hill tail-index estimator (Hill 1975 — the standard order-statistics
  * estimator for a power-law tail): over the k largest token frequencies
  * x₁ ≥ … ≥ x_k with threshold x_{k+1},
  *
  *   α̂ = k / Σᵢ ln(xᵢ / x_{k+1})
  *
  * The q78 Zipf slope fits log-rank/log-freq by OLS over the whole head;
  * Hill is the complementary PUBLISHED estimator that uses only the
  * extreme tail and is the standard answer to "how heavy is the
  * frequency tail really" (hot-key risk for shuffles, vocabulary design).
  *
  * The ranking window runs over the VOCAB count table — bounded by
  * distinct tokens, never raw occurrences (q165's discipline). k is a
  * constant, so the final agg sums k logs of integer ratios.
  */
object HillTail {

  /** One-row report: `k`, `x_k1` (the threshold frequency), `alpha`
    * (6dp), and `inv_alpha` = 1/α̂ (6dp), the implied Zipf exponent of
    * the tail.
    */
  def estimate(docs: DataFrame, tokens: Column, k: Int = 20): DataFrame = {
    val counts = docs.select(explode(tokens).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val ranked = counts.withColumn("rk",
      row_number().over(Window.orderBy(col("c").desc, col("w"))))
    val threshold = ranked.filter(col("rk") === k + 1)
      .select(col("c").as("x_k1"))
    ranked.filter(col("rk") <= k)
      .crossJoin(broadcast(threshold))
      .agg(
        count(lit(1)).as("k"),
        max(col("x_k1")).as("x_k1"),
        sum(log(col("c").cast("double") / col("x_k1"))).as("_s"))
      .select(col("k"), col("x_k1"),
        // a perfectly flat tail (all top-k equal to the threshold) has no
        // finite tail index — report null rather than divide by zero
        when(col("_s") > 0, round(lit(k) / col("_s"), 6)).as("alpha"),
        round(col("_s") / lit(k), 6).as("inv_alpha"))
  }
}
