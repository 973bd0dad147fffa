package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.search.Bm25

/** Exact deduplication (the hash-groupBy family a training-data pipeline
  * runs first, and the reference's content-hash dedup,
  * processing/content_processor.py:45-67, re-expressed set-at-a-time).
  *
  * Two fingerprints:
  *  - `contentHash`: md5 of the verbatim text — byte-identical dups;
  *  - `wordSetFingerprint`: md5 of the sorted distinct token set — catches
  *    reordered/repeated-word dups (bag-of-words duplicates).
  *
  * Scale shape: one groupBy per fingerprint — a single shuffle each, with
  * map-side partial aggregation. Dedup-keep-first is `row_number() over
  * (partition by hash order by id) = 1`, same single shuffle.
  */
object ExactDedup {

  def contentHash(text: Column): Column = md5(text)

  def wordSetFingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(Bm25.tokens(text))), " "))

  /** Per-group dup stats: docs vs distinct exact hashes vs distinct word
    * sets.
    */
  def dupStats(docs: DataFrame, groupCol: String, textCol: String): DataFrame =
    docs
      .select(col(groupCol),
        contentHash(col(textCol)).as("h_exact"),
        wordSetFingerprint(col(textCol)).as("h_wordset"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("h_exact")).as("n_exact"),
        countDistinct(col("h_wordset")).as("n_wordset"))

  /** Keep the first row (lowest `idCol`) per exact content hash. */
  def dedupKeepFirst(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(contentHash(col(textCol))).orderBy(col(idCol).asc)
    docs.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }
}
