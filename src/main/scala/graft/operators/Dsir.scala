package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Splits
import graft.search.Bm25

/** DSIR-style IMPORTANCE RESAMPLING (Xie et al., "Data Selection for
  * Language Models via Importance Resampling", NeurIPS 2023) — select raw
  * documents that look like a small high-quality target corpus, using
  * hashed word-bigram features as the tractable proxy distribution.
  *
  * Each document is a bag of hashed bigram buckets; the importance weight
  * is the log-likelihood ratio under add-one-smoothed unigram-over-buckets
  * models of the target vs the raw corpus:
  *
  *   w(d) = Σ_{g ∈ bigrams(d)} [ ln p̂_target(bucket(g)) − ln p̂_raw(bucket(g)) ]
  *
  * Scale shape: the feature space is CLOSED at `Buckets` cells, so both
  * model tables are bounded — they reduce by partial-agg counts and then
  * BROADCAST (a few KB) to the per-occurrence scoring join; no shuffle
  * keyed by document pairs or raw vocabulary anywhere. Scoring is one
  * map-side join + one per-doc partial-agg sum, so the pass over 100 TB of
  * raw text is embarrassingly parallel. The bucket hash is the engine-wide
  * portable md5-31 derivation ([[Splits.hashBucket]]), so any engine —
  * including the DuckDB oracle — replays features exactly.
  */
object Dsir {

  /** Hashed feature space size. 4096 keeps the broadcast tiny while
    * leaving bigram collisions rare at gate scale; production DSIR uses
    * 2^16 buckets with the same plan shape.
    */
  val Buckets = 4096

  /** `(doc_id, bucket)` — one row per bigram OCCURRENCE (not distinct):
    * the model is multinomial, so repeated bigrams count.
    */
  def bigramBuckets(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        Bm25.tokens(col(textCol)).as("t"))
      .select(col("doc_id"), explode(expr(
        "zip_with(slice(t, 1, greatest(size(t) - 1, 0)), slice(t, 2, greatest(size(t) - 1, 0)), (x, y) -> concat(x, ' ', y))"))
        .as("g"))
      .select(col("doc_id"), Splits.hashBucket(col("g"), Buckets).as("bucket"))

  /** `(bucket, cnt)` occurrence counts — the sufficient statistics of one
    * corpus's feature model (≤ [[Buckets]] rows; broadcastable).
    */
  def bucketModel(feats: DataFrame): DataFrame =
    feats.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Score every raw document by its target-vs-raw log-likelihood ratio.
    * Output: `(doc_id, n_big, lwr)` with `lwr` rounded to 6 dp (shared
    * float discipline with the q95/q115 LM scores).
    */
  def importanceScores(rawFeats: DataFrame, targetModel: DataFrame,
                       rawModel: DataFrame): DataFrame = {
    val tTot = targetModel.agg(sum(col("cnt")).as("nt")) // 1 row
    val rTot = rawModel.agg(sum(col("cnt")).as("nr"))    // 1 row
    rawFeats
      .join(broadcast(targetModel.withColumnRenamed("cnt", "ct")), Seq("bucket"), "left")
      .join(broadcast(rawModel.withColumnRenamed("cnt", "cr")), Seq("bucket"), "left")
      .crossJoin(broadcast(tTot))
      .crossJoin(broadcast(rTot))
      .select(col("doc_id"),
        (log((coalesce(col("ct"), lit(0L)) + lit(1.0)) / (col("nt") + lit(Buckets)))
          - log((coalesce(col("cr"), lit(0L)) + lit(1.0)) / (col("nr") + lit(Buckets))))
          .as("llr"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_big"), round(sum(col("llr")), 6).as("lwr"))
  }

  /** End-to-end: split `docs` into target (`targetPred`) and raw, fit both
    * feature models, and return the `topN` raw documents most like the
    * target. Deterministic: content-hash features, no RNG.
    */
  def select(docs: DataFrame, idCol: String, textCol: String,
             targetPred: org.apache.spark.sql.Column, topN: Int): DataFrame = {
    val target = docs.filter(targetPred)
    val raw = docs.filter(!targetPred)
    // raw features feed BOTH the raw model and the scoring join — one
    // materialization instead of tokenizing the raw corpus twice (the
    // q19/q73 reused-branch discipline)
    val rawFeats = bigramBuckets(raw, idCol, textCol).localCheckpoint(false) // lazy (r13)
    importanceScores(rawFeats,
        bucketModel(bigramBuckets(target, idCol, textCol)),
        bucketModel(rawFeats))
      .orderBy(col("lwr").desc, col("doc_id"))
      .limit(topN)
  }
}
