package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CUPED variance reduction (Deng, Xu, Kohavi & Walker 2013): use each
  * unit's PRE-experiment covariate x to shrink the variance of the
  * post-period metric y — θ = cov(x,y)/var(x), ŷ = y − θ(x − x̄), and the
  * achievable variance reduction is exactly ρ²(x,y). The first thing an
  * experimentation platform computes before trusting a small lift.
  *
  * Scale story: everything reduces to SIX integer sufficient statistics
  * (n, Σx, Σy, Σxy, Σx², Σy²) from one per-user partial agg + one global
  * agg. θ and ρ² are single divisions of integer-valued longs — bit-exact
  * across engines with no float accumulation anywhere: the ρ² numerator
  * (nΣxy−ΣxΣy)² and denominator (nΣx²−(Σx)²)(nΣy²−(Σy)²) stay integral.
  */
object Cuped {

  /** Input: one row per unit with integer covariate x and metric y.
    * Output one row: the six sums, theta, rho2, var_reduction = rho2.
    */
  def adjustmentStats(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val g = df.select(col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val covN = col("n") * col("sxy") - col("sx") * col("sy")
    val varXN = col("n") * col("sxx") - col("sx") * col("sx")
    val varYN = col("n") * col("syy") - col("sy") * col("sy")
    g.select(col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"), col("syy"),
      when(varXN > 0, round(covN.cast("double") / varXN, 6)).as("theta"),
      // square in the DOUBLE domain: covN² can pass 2^63 at large SF,
      // and an identical integer→double product is bit-equal cross-engine
      when(varXN > 0 && varYN > 0,
        round(covN.cast("double") * covN.cast("double")
          / (varXN.cast("double") * varYN.cast("double")), 6))
        .as("rho2"))
  }
}
