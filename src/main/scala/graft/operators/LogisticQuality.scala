package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINABLE LOGISTIC-REGRESSION QUALITY CLASSIFIER — the fourth trained
  * model in the engine next to k-means (q37/q46), PQ codebooks (q98) and
  * the BPE tokenizer (q92): corpus pipelines routinely fit a small linear
  * model over cheap text statistics (fastText-style quality filters,
  * CCNet's LM-based filter's linear head) to score documents at ingest.
  *
  * Full-batch gradient descent with the engine's CROSS-ENGINE REPLAY
  * contract: each iteration's gradient components are rounded to 6 dp
  * (collapsing float-sum ordering differences, the q37/q98 discipline),
  * and every other step — the dot product's association order, σ(z) =
  * 1/(1+exp(−z)), the weight additions — is the identical sequence of
  * IEEE double operations in Spark and in the oracle's unrolled CTEs, so
  * the FITTED WEIGHTS replay bit-for-bit.
  *
  * Scale shape: one partial-agg pass per iteration (k gradient averages —
  * map-side combine, a 1-row result), weights live on the driver as k
  * doubles (the k-means centroid pattern). Scoring is a pure codegen
  * projection with the weights as literals. Nothing grows with the
  * corpus.
  */
object LogisticQuality {

  private def dot(w: Seq[Double], xCols: Seq[String]): Column =
    xCols.zip(w).map { case (c, wi) => col(c) * lit(wi) }.reduce(_ + _)

  /** Fit weights (init 0) by `iters` full-batch GD steps with unit
    * learning rate folded into the rounded gradient: wᵢ += round(avg((y −
    * σ(w·x)) · xᵢ), 6). Returns the weight vector.
    */
  def fit(feats: DataFrame, yCol: String, xCols: Seq[String], iters: Int): Array[Double] = {
    val w = Array.fill(xCols.size)(0.0)
    for (_ <- 1 to iters) {
      val p = lit(1.0) / (lit(1.0) + exp(-dot(w.toSeq, xCols)))
      val err = col(yCol) - p
      val aggs = xCols.zipWithIndex.map { case (c, i) =>
        round(avg(err * col(c)), 6).as(s"g$i")
      }
      val row = feats.agg(aggs.head, aggs.tail: _*).head()
      w.indices.foreach(i => w(i) += row.getDouble(i))
    }
    w
  }

  /** σ(w·x) ≥ 0.5 ⇔ w·x ≥ 0 — the decision column, pure codegen. */
  def predictPos(w: Seq[Double], xCols: Seq[String]): Column =
    dot(w, xCols) >= lit(0.0)

  /** σ(w·x) itself — the probability column for calibration audits. */
  def predictProb(w: Seq[Double], xCols: Seq[String]): Column =
    lit(1.0) / (lit(1.0) + exp(-dot(w, xCols)))
}
