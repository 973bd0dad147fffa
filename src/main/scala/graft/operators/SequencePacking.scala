package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing — the "concat then chunk" step of an LLM data
  * pipeline: documents are laid end-to-end in a deterministic order and cut
  * into fixed-token-budget training sequences; each document's sequence id
  * is the budget-quotient of the tokens that precede it.
  *
  * Scale shape: packing never sorts globally. Documents are sharded by
  * `id mod nShards` and each shard packs independently under ONE window
  * (partitionBy shard, orderBy id) — mirroring how packing actually runs on
  * a training cluster, where every data-loader worker packs its own shard
  * and sequences never cross workers. With nShards = O(cluster cores) the
  * per-shard sort is the size a single task handles comfortably, and the
  * shard column is the natural partition key for everything downstream.
  *
  * A document longer than the budget keeps its place in the stream: the
  * cumulative sum carries its full length, so it spans several sequence
  * ids' budget and later documents shift accordingly (the downstream
  * chunker cuts its token stream at the same boundaries).
  */
object SequencePacking {

  /** Adds `shard` and `seq_id` to `docs`.
    *
    * `seq_id = floor(tokens_before_this_doc_in_shard / budget)` where
    * "before" walks the shard's `idCol`-ascending stream — i.e. the
    * sequence the document's FIRST token lands in.
    */
  def assign(docs: DataFrame, idCol: String, tokensCol: String,
             budget: Long, nShards: Int): DataFrame = {
    require(budget > 0 && nShards > 0)
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("shard", pmod(col(idCol), lit(nShards)))
      .withColumn("_cum", sum(col(tokensCol)).over(w))
      .withColumn("seq_id", floor((col("_cum") - col(tokensCol)) / budget))
      .drop("_cum")
  }

  /** Per-sequence fill stats over an [[assign]] result: document count,
    * token sum, and fill ratio vs the budget (>1 when a long document's
    * stream spills past its first sequence; the chunker truncates there).
    */
  def packStats(assigned: DataFrame, tokensCol: String, budget: Long): DataFrame =
    assigned.groupBy(col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokensCol)).as("sum_tokens"))
      .withColumn("fill_ratio", round(col("sum_tokens") / budget.toDouble, 6))
}
