package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Split-conformal prediction threshold (Vovk et al. 2005; Papadopoulos
  * et al. 2002): given a calibration sample of nonconformity scores, the
  * conformal quantile q̂ = the ⌈(n+1)(1−α)⌉-th smallest calibration score
  * guarantees P(score ≤ q̂) ≥ 1−α on exchangeable test points — the
  * distribution-free "how bad can a conforming document score" cutoff a
  * curation pipeline uses to auto-accept with a coverage guarantee.
  *
  * Scale story: one window per key over the CALIBRATION rows ordered by
  * (score, id) picks the k-th order statistic — a partitioned window,
  * never global; the test-side coverage check is one broadcast join of
  * the per-key thresholds (bounded by |keys|) onto the test scan plus a
  * single partial agg. The rank k = ⌈(n+1)(1−α)⌉ is computed in INTEGER
  * arithmetic (α given as a rational aNum/aDen), so both engines select
  * the same row; the threshold itself is a passthrough of the score —
  * no float arithmetic before the coverage ratio at the output edge.
  */
object Conformal {

  /** Per-key split-conformal report. `cal` and `test` both carry
    * (keyCol, idCol, scoreCol); α = aNum/aDen (e.g. 1/10). Returns one
    * row per key: n_cal, k, threshold, n_test, n_covered, coverage.
    * When k > n_cal (calibration sample too small for the level) the
    * guarantee needs the +∞ threshold; the row surfaces threshold = NULL
    * with full coverage, mirrored in SQL.
    */
  def splitThreshold(cal: DataFrame, test: DataFrame, keyCol: String,
                     idCol: String, scoreCol: String,
                     aNum: Long, aDen: Long): DataFrame = {
    // k = ceil((n+1)(1-alpha)) = ceil((n+1)(aDen-aNum)/aDen), all integer
    val sizes = cal.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_cal"))
      .withColumn("k", // `div`: Column./ on longs is double division
        expr(s"((n_cal + 1) * ${aDen - aNum} + ${aDen - 1}) div $aDen"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(scoreCol), col(idCol))
    val ranked = cal
      .withColumn("rn", row_number().over(w).cast("long"))
      .join(broadcast(sizes), Seq(keyCol))
      .filter(col("rn") === col("k"))
      .select(col(keyCol), col(scoreCol).as("threshold"))
    // keys whose k > n_cal find no k-th row -> NULL threshold (= +inf)
    val thr = sizes.join(ranked, Seq(keyCol), "left")
    val testScored = test.join(broadcast(thr), Seq(keyCol))
    testScored.groupBy(col(keyCol))
      .agg(max(col("n_cal")).as("n_cal"), max(col("k")).as("k"),
        max(col("threshold")).as("threshold"),
        count(lit(1)).as("n_test"),
        sum(when(col("threshold").isNull || col(scoreCol) <= col("threshold"),
          1L).otherwise(0L)).as("n_covered"))
      .withColumn("coverage",
        round(col("n_covered").cast("double") / col("n_test"), 4))
  }
}
