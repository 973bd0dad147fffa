package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** INVERTED-INDEX POSTING LISTS — the materialized term → sorted-doc-list
  * table behind every keyword search engine, built as a batch artifact
  * (the [[Bm25]] scorer walks term rows at query time; a serving system
  * exports THIS shape). The build is df-banded BEFORE any list is
  * collected: term document frequencies come from one partial-aggregated
  * count, the [minDf, maxDf] band filters on that (stopwords and hapax
  * noise never reach the collect), and only then does `collect_list`
  * materialize postings — so the longest possible list is maxDf entries,
  * chosen by the caller, and the classic stopword-straggler (one reducer
  * holding "the"'s billion-entry list) cannot happen at any scale.
  *
  * Two shuffles total, both on the term key; postings sort inside the
  * aggregated row (`sort_array`), never via a window.
  */
object InvertedIndex {

  /** `(w, df, postings)` from a `(doc_id, term)` occurrence table (need
    * not be deduplicated — df counts distinct docs); postings =
    * comma-joined ascending doc ids, only for terms whose df lies in
    * [minDf, maxDf].
    */
  def postings(terms: DataFrame, idCol: String, termCol: String,
               minDf: Int, maxDf: Int): DataFrame = {
    val dw = terms
      .select(col(idCol).cast("long").as("doc_id"), col(termCol).as("w"))
      .distinct()
    val banded = dw.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .filter(col("df").between(minDf, maxDf))
    dw.join(banded, Seq("w")) // band cap applied BEFORE any list exists
      .groupBy(col("w"))
      .agg(max(col("df")).as("df"),
        array_join(
          transform(sort_array(collect_list(col("doc_id"))), _.cast("string")),
          ",").as("postings"))
  }

  /** Word n-gram phrase terms `(doc_id, w)` for a document table — the
    * pure-column twin of [[graft.dedup.Decontamination.docGrams]] minus
    * the hashing (postings want the readable term). One codegen map.
    */
  def phraseTerms(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        Bm25.tokens(col(textCol)).as("_toks"))
      // shorter-than-n docs yield no grams; the filter also dodges
      // Spark's DESCENDING sequence(1, 0) = [1, 0] surprise
      .filter(size(col("_toks")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(_toks) - ${n - 1}), i -> array_join(slice(_toks, i, $n), ' '))"
      )).as("w"))
}
