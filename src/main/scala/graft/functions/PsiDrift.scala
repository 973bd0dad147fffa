package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Population-Stability-Index drift report between two deterministic
  * halves of a corpus — the standard scorecard-monitoring statistic
  * (PSI = Σ (pA−pB)·ln(pA/pB) over bins); the companion to the q134 KS
  * test: KS answers "did the distribution move", PSI localizes WHERE and
  * by how much per bin, which is what a curation dashboard actually plots.
  *
  * Bins are fixed-width on the metric (integer edges) rather than split-A
  * quantiles: quantile edges are floats whose last-ulp placement differs
  * across engines and would make bin membership — and therefore every
  * count — unreproducible. Counts get +0.5 Laplace smoothing so empty
  * bins contribute finitely.
  *
  * Scale shape: one codegen map pass assigns (split, bin), one partial-agg
  * groupBy counts, and the ≤`nBins` bin table pivots/joins to itself
  * broadcast-size. Nothing after the first agg depends on corpus size.
  */
object PsiDrift {

  /** Per-bin PSI contributions between split A (hash bucket < cutPct) and
    * split B, binning `metricCol` at `binWidth`, plus the total in every
    * row (the single-scan dashboard shape).
    */
  def report(df: DataFrame, keyCol: String, metricCol: String,
             binWidth: Int, nBins: Int, cutPct: Int): DataFrame = {
    // clamp BOTH edges so signed metrics stay inside the fixed nBins
    // support the smoothing denominator assumes; null metrics are dropped
    // (they belong in a data-quality gate, not a distribution bin)
    val binned = df.filter(col(metricCol).isNotNull).select(
      (Splits.hashBucket(col(keyCol), 100) < cutPct).as("in_a"),
      greatest(least(floor(col(metricCol) / binWidth), lit(nBins - 1)), lit(0))
        .cast("long").as("bin"))

    val counts = binned.groupBy(col("bin"))
      .agg(
        sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("n_b"))

    // Totals are a 1-row broadcast; the smoothed probabilities use the
    // fixed bin budget so A and B normalize over the same support.
    val tot = counts.agg(sum(col("n_a")).as("tot_a"), sum(col("n_b")).as("tot_b"))
    val terms = counts.crossJoin(broadcast(tot))
      .withColumn("pa", (col("n_a") + 0.5) / (col("tot_a") + 0.5 * nBins))
      .withColumn("pb", (col("n_b") + 0.5) / (col("tot_b") + 0.5 * nBins))
      .withColumn("psi_term", (col("pa") - col("pb")) * log(col("pa") / col("pb")))

    val total = terms.agg(sum(col("psi_term")).as("t"))
    terms.crossJoin(broadcast(total))
      .select(
        col("bin"),
        col("n_a"), col("n_b"),
        round(col("psi_term"), 6).as("psi_term"),
        round(col("t"), 6).as("psi_total"))
      .orderBy(col("bin"))
  }
}
