package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reliability-diagram binning + Brier decomposition for a probabilistic
  * binary classifier (Murphy 1973; the standard calibration audit): bucket
  * predictions by predicted probability, compare mean predicted
  * probability to the empirical positive rate per bucket. A filter model
  * whose 0.9-bin is only 60% positive is miscalibrated — its threshold
  * sweeps admit different data than its scores claim.
  *
  * Probabilities are 6dp-rounded BEFORE binning so the bin edge
  * comparison is on a value both engines agree on exactly (a raw σ(w·x)
  * double at a bin edge could land either side across engines). The
  * positive-rate column is integer/integer; mean-prediction and the Brier
  * sum are float partial aggs rounded at 6dp (the q95 discipline). One
  * shuffle: the per-bin partial agg.
  */
object Calibration {

  /** Per-bin report: `bin` ∈ [0, bins), `n`, `n_pos`, `mean_pred`,
    * `frac_pos`, `brier_sum` (Σ(p−y)² within the bin).
    */
  def report(scored: DataFrame, probCol: String, labelCol: String,
             bins: Int = 10): DataFrame = {
    val d = scored.select(
      round(col(probCol), 6).as("p"),
      col(labelCol).cast("double").as("y"))
    d.withColumn("bin",
        least(floor(col("p") * bins), lit(bins - 1)).cast("long"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("y")).cast("long").as("n_pos"),
        round(avg(col("p")), 6).as("mean_pred"),
        round(sum(col("y")) / count(lit(1)), 6).as("frac_pos"),
        round(sum(pow(col("p") - col("y"), 2)), 6).as("brier_sum"))
  }
}
