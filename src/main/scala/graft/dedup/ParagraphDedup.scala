package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Paragraph-level exact deduplication — the sub-document complement to the
  * whole-document dedup family (ExactDedup &c.): boilerplate paragraphs
  * (headers, licenses, navigation chrome) repeat across millions of pages
  * and survive document-level dedup, so training pipelines dedup at the
  * paragraph grain and keep the FIRST occurrence.
  *
  * Scale shape: explode to (doc, idx, para) rows, then ONE shuffle keyed by
  * the paragraph's md5 for the keep-first window. No pairwise comparison
  * anywhere; the md5 key keeps the shuffle narrow (the window carries the
  * digest, not the paragraph body, into the sort key).
  */
object ParagraphDedup {

  /** Explode `textCol` into trimmed non-empty paragraphs:
    * (idCol, idx, para), split on `splitRx` (default: blank lines).
    */
  def paragraphs(docs: DataFrame, idCol: String, textCol: String,
                 splitRx: String = "\\n{2,}"): DataFrame =
    docs.select(col(idCol),
        posexplode(filter(transform(split(col(textCol), splitRx), p => trim(p)),
          p => length(p) > 0)).as(Seq("idx", "para")))

  /** Fixed-size word-block view for corpora WITHOUT paragraph breaks
    * (single-line text): consecutive `n`-token blocks in the [[graft.search.Bm25.tokens]]
    * normalization, same output shape as [[paragraphs]].
    */
  def wordBlocks(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val t = graft.search.Bm25.tokens(col(textCol))
    // the empty guard matters: Spark sequence(1, 0) yields DESCENDING
    // [1, 0], not an empty sequence
    val blocks = when(size(t) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), ceil(size(t) / lit(n.toDouble)).cast("int")),
        i => array_join(slice(t, (i - lit(1)) * lit(n) + lit(1), lit(n)), " ")))
    docs.select(col(idCol), posexplode(blocks).as(Seq("idx", "para")))
  }

  /** Mark each paragraph row `kept` iff it is the corpus-first occurrence
    * of its content (ordered by `(idCol, idx)`). Keyed by md5 of the
    * paragraph — identical content always collides into one window
    * partition; distinct content splitting a digest is a 2^-128 event.
    */
  def keepFirst(paras: DataFrame, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col("para")))
      .orderBy(col(idCol).asc, col("idx").asc)
    paras.withColumn("_rn", row_number().over(w))
      .withColumn("kept", col("_rn") === 1).drop("_rn")
  }

  /** Rebuild each document from its surviving paragraphs (drop-dup
    * scrubbing): documents whose every paragraph was a repeat vanish.
    */
  def scrub(docs: DataFrame, idCol: String, textCol: String,
            splitRx: String = "\\n{2,}", sep: String = "\n\n"): DataFrame =
    keepFirst(paragraphs(docs, idCol, textCol, splitRx), idCol)
      .filter(col("kept"))
      .groupBy(col(idCol))
      .agg(array_join(transform(sort_array(collect_list(struct(col("idx"), col("para")))),
        e => e("para")), sep).as(textCol))
}
