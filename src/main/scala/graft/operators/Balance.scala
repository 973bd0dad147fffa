package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Covariate-balance audit for an experiment split: per covariate, the
  * standardized mean difference SMD = (μ₁−μ₀)/√((s₁²+s₀²)/2) and the
  * variance ratio between arms — the pre-analysis check that a "random"
  * split actually balanced the confounders (|SMD| < 0.1 is the
  * conventional all-clear; a skewed ratio flags heteroscedastic arms).
  * The design-side companion to CUPED (q244) and the Simpson audit
  * (q256).
  *
  * Input: LONG form — one row per (covariate name, 0/1 variant, integer
  * value). Every sufficient statistic (n, Σx, Σx² per cell) is an exact
  * integer from ONE partial agg over the bounded covariate×arm grid;
  * the SMD/ratio are closed-form at the edge.
  */
object Balance {

  /** One row per covariate: `covariate, n0, n1, mean0, mean1, smd,
    * var_ratio` (6 dp, SMD sign-pinned). */
  def smdPanel(df: DataFrame, covCol: String, variantCol: String,
               valCol: String): DataFrame = {
    val cells = df.select(col(covCol).as("cov"),
        col(variantCol).cast("long").as("g"), col(valCol).cast("long").as("v"))
      .groupBy(col("cov")).agg(
        sum(when(col("g") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("g") === 0, col("v")).otherwise(0L)).as("sx0"),
        sum(when(col("g") === 0, col("v") * col("v")).otherwise(0L)).as("sxx0"),
        sum(when(col("g") =!= 0, 1L).otherwise(0L)).as("n1"),
        sum(when(col("g") =!= 0, col("v")).otherwise(0L)).as("sx1"),
        sum(when(col("g") =!= 0, col("v") * col("v")).otherwise(0L)).as("sxx1"))
    val m0 = col("sx0").cast("double") / col("n0")
    val m1 = col("sx1").cast("double") / col("n1")
    val v0 = (col("sxx0") - col("sx0").cast("double") * col("sx0") / col("n0")) /
      (col("n0") - 1)
    val v1 = (col("sxx1") - col("sx1").cast("double") * col("sx1") / col("n1")) /
      (col("n1") - 1)
    // ANSI: the n>1 guard must be the OUTER when — an && would evaluate
    // the (n−1)-divisor variance inside the condition and throw on a
    // single-row arm (nested CASE branches are lazily evaluated)
    cells.select(col("cov").as("covariate"), col("n0"), col("n1"),
      when(col("n0") > 0, round(m0, 6)).as("mean0"),
      when(col("n1") > 0, round(m1, 6)).as("mean1"),
      when(col("n0") > 1 && col("n1") > 1,
        when((v0 + v1) > 0,
          round((m1 - m0) / sqrt((v1 + v0) / 2.0), 6) + lit(0.0))).as("smd"),
      when(col("n0") > 1 && col("n1") > 1,
        when(v0 > 0, round(v1 / v0, 6))).as("var_ratio"))
      .orderBy(col("covariate"))
  }
}
