package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked sorted-neighborhood duplicate detection (Hernández & Stolfo,
  * "The merge/purge problem for large databases", SIGMOD 1995 — public
  * method): records sort within a blocking key, and each record is
  * compared only to its immediate predecessor in sort order — near-dups
  * land adjacent after sorting, so the quadratic pair space collapses to
  * n-1 comparisons per block.
  *
  * This is the cheap first-pass complement of the MinHash/PPJoin family:
  * no shingling, no banding — one window lag per block and a token-set
  * Jaccard against the predecessor. Misses only dups that sort apart
  * (the documented SNM trade-off; widening the window or multi-pass with
  * a second blocking key is the published mitigation).
  *
  * Scale: the ONE window partitions by the blocking key — bounded
  * partitions, never a global sort (an unpartitioned orderBy window would
  * collapse to one task at 100 TB). The report is micro-averaged with
  * integer sufficient statistics (Σ|∩| / Σ|∪|), so no float sum-order
  * ambiguity crosses engines.
  */
object SortedNeighbors {

  /** Per-block dedup report. `blockKey` is the sortable blocking
    * expression (e.g. the first token); neighbor pairs with Jaccard ≥
    * `threshold` count as duplicates.
    */
  def report(docs: DataFrame, idCol: String, textCol: String,
             blockKey: Column, threshold: Double = 0.5): DataFrame = {
    val toks = array_sort(array_distinct(filter(
      split(lower(col(textCol)), "[^a-z0-9]+"), t => length(t) > 1)))
    val w = Window.partitionBy(col("block")).orderBy(col(textCol), col(idCol))
    val lagged = docs
      .select(col(idCol), blockKey.as("block"), col(textCol), toks.as("_t"))
      .withColumn("_pt", lag(col("_t"), 1).over(w))
      .withColumn("n_inter",
        when(col("_pt").isNotNull, size(array_intersect(col("_t"), col("_pt")))))
      .withColumn("n_union",
        when(col("_pt").isNotNull,
          size(col("_t")) + size(col("_pt")) - col("n_inter")))
      .withColumn("jac", col("n_inter").cast("double") / col("n_union"))

    lagged.groupBy(col("block"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(col("jac")).as("n_pairs"),
        sum(when(col("jac") >= threshold, 1L).otherwise(0L)).as("n_dups"),
        round(sum(col("n_inter")).cast("double") / sum(col("n_union")), 6)
          .as("micro_jaccard"),
        round(max(col("jac")), 6).as("max_jaccard"))
  }
}
