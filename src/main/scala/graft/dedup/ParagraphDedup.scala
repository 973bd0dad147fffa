package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Paragraph-level exact deduplication — the sub-document complement to the
  * whole-document dedup family (ExactDedup &c.): boilerplate paragraphs
  * (headers, licenses, navigation chrome) repeat across millions of pages
  * and survive document-level dedup, so training pipelines dedup at the
  * paragraph grain and keep the FIRST occurrence.
  *
  * Scale shape: explode to (doc, idx, para) rows, then a partially-agg'd
  * groupBy on the paragraph's md5 to elect the first occurrence, joined
  * back by digest. No pairwise comparison anywhere; the md5 key keeps the
  * shuffle narrow, and map-side combine collapses hot digests (see
  * [[keepFirst]]).
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
    * of its content (ordered by `(idCol, idx)`; rows are assumed unique on
    * `(idCol, idx)`, which [[paragraphs]]/[[wordBlocks]] guarantee by
    * construction). Keyed by md5 of the paragraph — identical content
    * always collides into one digest; distinct content splitting a digest
    * is a 2^-128 event.
    *
    * Deliberately NOT a `row_number` window: a boilerplate paragraph
    * repeated across millions of documents (license header, nav chrome —
    * the exact content this operator targets) would put every occurrence
    * into ONE window partition with no partial aggregation — a straggler
    * task sorting billions of rows at 100 TB. `groupBy(digest).agg(min)`
    * instead gets map-side combine (each task contributes one candidate
    * per hot digest), and the join-back is an equi-join on the digest
    * where the firsts side has exactly one row per distinct paragraph.
    */
  def keepFirst(paras: DataFrame, idCol: String): DataFrame = {
    val withDigest = paras.withColumn("_dg", md5(col("para")))
    // struct min = lexicographic (idCol asc, idx asc) — the same
    // first-occurrence order the old window used
    val firsts = withDigest.groupBy(col("_dg"))
      .agg(min(struct(col(idCol), col("idx"))).as("_first"))
    withDigest.join(firsts, Seq("_dg"))
      .withColumn("kept",
        col("_first")(idCol) === col(idCol) && col("_first")("idx") === col("idx"))
      .drop("_dg", "_first")
  }

  /** Flag BOILERPLATE paragraphs: content repeating across at least
    * `minDf` DISTINCT documents of the same `grpCol` group (site/source) —
    * the CCNet/RefinedWeb template-chrome filter (nav bars, license
    * headers, cookie banners repeat per host). Complement of [[keepFirst]]:
    * dedup keeps the first occurrence, boilerplate removal drops ALL
    * occurrences once the per-group document frequency crosses the bar.
    *
    * `paras` must carry `(idCol, grpCol, idx, para)`. Output adds
    * `boiler` (true = drop). Scale shape: digest-keyed two-level partial
    * agg (distinct doc count per (group, digest)) + an equi-join back on
    * the same key — no window, no pairwise compare; a paragraph repeated
    * on millions of pages collapses map-side exactly like [[keepFirst]].
    */
  def boilerplate(paras: DataFrame, idCol: String, grpCol: String,
                  minDf: Int): DataFrame = {
    val withDigest = paras.withColumn("_dg", md5(col("para")))
    val dfs = withDigest.groupBy(col(grpCol), col("_dg"))
      .agg(countDistinct(col(idCol)).as("_df"))
    withDigest.join(dfs, Seq(grpCol, "_dg"))
      .withColumn("boiler", col("_df") >= minDf)
      .drop("_dg", "_df")
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
