package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.search.Bm25

/** SLIDING-WINDOW TOKEN CHUNKER — overlapping fixed-size windows with a
  * stride, the standard RAG / training-prep segmentation (reference
  * counterpart: the markdown chunker's split-group-redistribute-overlap
  * pass, chunking/markdown.py; this is its format-agnostic token twin for
  * plain corpora).
  *
  * chunk i covers tokens [i·stride+1, i·stride+window]; the chunk count is
  * 1 + ⌈max(n − window, 0) / stride⌉, so every token lands in ≥1 chunk and
  * consecutive chunks overlap by (window − stride) tokens.
  *
  * Scale shape: one codegen map pass (tokenize → transform/sequence →
  * posexplode) — no shuffle at all; the chunk table inherits the input's
  * partitioning, and at 100 TB it's exactly the shape you feed the
  * embedding stage. Fan-out is bounded by ~n/stride per doc.
  */
object SlidingChunker {

  /** `(doc_id, chunk_idx, n_toks, digest)` — md5 digest per chunk is the
    * join-key downstream dedup/embedding caches want. `stride ≤ window`
    * keeps chunks contiguous (no token skipped).
    */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
             window: Int, stride: Int): DataFrame = {
    require(stride > 0 && stride <= window,
      s"need 0 < stride ($stride) <= window ($window)")
    docs.select(col(idCol).cast("long").as("doc_id"),
        Bm25.tokens(col(textCol)).as("t"))
      .withColumn("nc",
        when(size(col("t")) === 0, lit(0)).otherwise(
          lit(1) + ceil(greatest(size(col("t")) - lit(window), lit(0))
            .cast("double") / lit(stride.toDouble)).cast("int")))
      .filter(col("nc") > 0)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, nc - 1), i -> struct(
           |  size(slice(t, i * $stride + 1, $window)) AS nt,
           |  array_join(slice(t, i * $stride + 1, $window), ' ') AS piece))"""
          .stripMargin)).as(Seq("chunk_idx", "u")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("u.nt").cast("long").as("n_toks"), md5(col("u.piece")).as("digest"))
  }
}
