package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.search.Bm25

/** WINNOWED DOCUMENT SKETCHES (the MOSS algorithm): slide a window of
  * `w` consecutive word-n-gram hashes and keep each window's minimum
  * (rightmost on ties), deduplicated by position. The selected-hash set
  * is a position-aware fingerprint with a GUARANTEE the q26 rolling hash
  * and the MinHash signature both lack: any shared substring of at least
  * `n + w - 1` tokens contributes at least one COMMON sketch hash, so
  * sketch overlap is a sound detector for partial plagiarism/quotation —
  * not just whole-document similarity.
  *
  * Scale shape: one JIT'd typed map pass per document (the same
  * discipline as [[graft.dedup.MinHashLsh.signatures]] — the w-window
  * argmin loop is a hot inner loop where interpreted HOF lambdas would
  * dominate), NO shuffle; downstream consumers join sketches on the hash
  * value exactly like [[graft.dedup.Decontamination]] grams.
  *
  * Reference for the algorithm: Schleimer/Wilkerson/Aiken, "Winnowing:
  * Local Algorithms for Document Fingerprinting" (SIGMOD 2003) — public
  * literature, no reference-repo analog.
  */
object Winnowing {

  /** Gram-hash sequence (in order, NOT distinct) for one document. */
  private def gramSeq(text: String, n: Int): Array[Long] =
    Bm25.tokenizeScala(text).sliding(n).filter(_.length == n)
      .map(g => graft.core.Ids.hash31(g.mkString(" "))).toArray

  /** Selected positions (sorted, deduplicated) for a gram-hash sequence:
    * each length-`w` window's rightmost minimum; a sequence shorter than
    * one window selects its single global minimum.
    */
  private[functions] def winnow(hs: Array[Long], w: Int): Array[Int] = {
    if (hs.isEmpty) Array.empty
    else if (hs.length < w) {
      var m = hs(0); var mi = 0
      var k = 1
      while (k < hs.length) { if (hs(k) <= m) { m = hs(k); mi = k }; k += 1 }
      Array(mi)
    } else {
      val selected = Array.fill(hs.length)(false)
      var i = 0
      while (i + w <= hs.length) {
        var m = hs(i); var mi = i
        var k = i + 1
        while (k < i + w) { if (hs(k) <= m) { m = hs(k); mi = k }; k += 1 }
        selected(mi) = true
        i += 1
      }
      selected.indices.filter(selected).toArray
    }
  }

  /** The joinable sketch surface: `(doc_id, pos, hash)` — one row per
    * selected gram occurrence, position kept so overlap hits localize the
    * shared span. Join two corpora on `hash` to find shared fragments.
    */
  def sketchHashes(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, w: Int): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val hs = gramSeq(text, n)
        winnow(hs, w).map(p => (id, p, hs(p)))
      }.toDF("doc_id", "pos", "hash")
  }

  /** SHARED-FRAGMENT PAIRS (the MOSS report): documents whose winnowed
    * sketches share at least `minShared` distinct hashes — evidence of a
    * copied span, even inside otherwise-unrelated documents.
    *
    * Scale shape: a HASH-KEYED self-join (the LSH-banding discipline —
    * no doc×doc scan); `maxDf` drops hashes present in more than that
    * many documents BEFORE the join, so one ubiquitous boilerplate
    * fragment cannot quadratically explode a bucket (ubiquitous text is
    * [[graft.dedup.NgramNovelty]]'s department, not this operator's).
    */
  def sharedFragments(docs: DataFrame, idCol: String, textCol: String,
                      n: Int, w: Int, minShared: Int, maxDf: Int): DataFrame = {
    val sk = sketchHashes(docs, idCol, textCol, n, w)
      .select(col("doc_id"), col("hash")).distinct()
    val rare = sk.groupBy(col("hash")).agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= maxDf).select(col("hash"))
    val kept = sk.join(rare, Seq("hash"), "left_semi")
    kept.select(col("hash"), col("doc_id").as("doc_a"))
      .join(kept.select(col("hash"), col("doc_id").as("doc_b")), Seq("hash"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Per-doc sketch summary `(doc_id, n_grams, n_sel, fp_sum)`:
    * gram-sequence length, selected-position count, and the sum of
    * selected hashes (an order-free exact digest of the sketch; all
    * values < 2^31 so the sum stays far from Long overflow).
    */
  def sketches(docs: DataFrame, idCol: String, textCol: String,
               n: Int, w: Int): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val hs = gramSeq(text, n)
        val sel = winnow(hs, w)
        var sum = 0L
        sel.foreach(p => sum += hs(p))
        (id, hs.length.toLong, sel.length.toLong, sum)
      }.toDF("doc_id", "n_grams", "n_sel", "fp_sum")
  }
}
