package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-key quantiles at corpus scale — the statistic behind
  * percentile-band quality filtering ("drop docs outside [P05, P95] of
  * length for their language"), a standard LLM-corpus cleaning step with
  * no reference analog.
  *
  * Scale story: Spark's exact `percentile` buffers every row of a group on
  * one task, and `approx_percentile` trades the exactness an oracle-gated
  * filter needs. This computes the discrete quantile from the DISTINCT-
  * value distribution instead: `groupBy(key, value)` (partial-agg
  * friendly), one cumulative window over the distinct values of each key,
  * one conditional-min agg. Cost scales with distinct values per key, not
  * rows — a boilerplate-heavy key with billions of rows but a bounded
  * value domain costs the same as a small one. Integer-only arithmetic:
  * the result is an actual population value, so downstream comparisons
  * are exact in any engine.
  */
object Quantiles {

  /** Discrete quantiles per key: for each `(name, q)` the value at 0-based
    * index `ceil(q * n) - 1` of the key's sorted value multiset — the
    * classic inverse-CDF definition (DuckDB `quantile_disc`, PostgreSQL
    * `percentile_disc`). Returns one row per key: (key, name...).
    */
  def exactQuantiles(df: DataFrame, keyCol: String, valCol: String,
                     qs: Seq[(String, Double)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q > 0.0 && q <= 1.0 },
      "quantiles must be in (0, 1]")
    val dist = df.groupBy(col(keyCol), col(valCol)).agg(count(lit(1)).as("_c"))
    val byVal = Window.partitionBy(col(keyCol)).orderBy(col(valCol))
    val whole = Window.partitionBy(col(keyCol))
    val cum = dist
      .withColumn("_cum", sum(col("_c")).over(byVal)) // rows with value <= this
      .withColumn("_n", sum(col("_c")).over(whole))
    // value at index ceil(q*n)-1 = smallest value whose cumulative count
    // reaches rank ceil(q*n)
    val aggs = qs.map { case (name, q) =>
      min(when(col("_cum") >= ceil(lit(q) * col("_n")), col(valCol))).as(name)
    }
    cum.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }
}
