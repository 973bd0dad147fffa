package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Post-stratified estimation + Kish design effect — the survey-sampling
  * read of a skewed corpus: "what would the mean be if every stratum
  * counted equally, and how much effective sample do the reweights
  * burn". The experimentation companion to Neyman allocation (q241):
  * Neyman plans the sample, this one corrects the estimate after the
  * fact; deff = 1 + CV²(w) (Kish 1965) prices the correction.
  *
  * Scale shape: everything reduces to per-stratum integer sums (n_h,
  * Σx_h) on the bounded stratum grid; the per-stratum mean terms fold
  * on the ordered stratum window (the KSample `fin` pattern); deff is
  * closed-form from the same integers.
  */
object PostStratify {

  /** One row: `k` (strata), `n`, `mean_raw`, `mean_post` (equal-weight
    * strata), `deff_kish` (all 6 dp). */
  def equalWeight(df: DataFrame, stratumCol: String, valCol: String): DataFrame = {
    val d = df.select(col(stratumCol).as("h"), col(valCol).cast("long").as("v"))
    val strata = d.groupBy(col("h"))
      .agg(count(lit(1)).as("n_h"), sum(col("v")).as("sx_h"))
    val gw = Window.orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val acc = strata
      .withColumn("k", count(lit(1)).over(gw))
      .withColumn("n", sum(col("n_h")).over(gw))
      .withColumn("sx", sum(col("sx_h")).over(gw))
      .withColumn("mean_acc",
        sum(col("sx_h").cast("double") / col("n_h")).over(gw))
      // Kish: deff = n·Σ(n_h·w_h²)/(Σ n_h·w_h)² with w_h ∝ 1/n_h —
      // the w_h scale cancels, so use w_h = 1/n_h exactly
      .withColumn("sw", sum(col("n_h").cast("double")
        * (lit(1.0) / col("n_h"))).over(gw))
      .withColumn("sww", sum(col("n_h").cast("double")
        * (lit(1.0) / col("n_h")) * (lit(1.0) / col("n_h"))).over(gw))
    acc.orderBy(col("h").desc).limit(1)
      .select(col("k"), col("n"),
        round(col("sx").cast("double") / col("n"), 6).as("mean_raw"),
        round(col("mean_acc") / col("k"), 6).as("mean_post"),
        round(col("n").cast("double") * col("sww")
          / (col("sw") * col("sw")), 6).as("deff_kish"))
  }
}
