package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Splits

/** Deterministic global shuffle + sharding — the export step of a
  * training-data pipeline. Sequence trainers want input order
  * decorrelated from crawl/source/time locality, split into N
  * size-balanced shard files; doing it with `rand()` makes retried tasks
  * and re-runs produce different corpora.
  *
  * Everything here derives from the portable md5 bucket
  * ([[Splits.hashBucket]]), so the same input produces byte-identical
  * shards on any cluster, any partitioning, any retry: `shard` is a
  * 15-hex-digit hash bucket of the id under one salt, the within-shard
  * sort key `ord` the same under another (independent salts mean shard
  * and order don't correlate).
  *
  * Scale shape: one shuffle (`repartition(nShards, shard)`) + a
  * within-partition sort — no global sort, no driver involvement. Each
  * task then holds exactly its shard's rows in final order, ready for a
  * one-file-per-shard write; uniform hashing makes shard sizes balanced
  * to ~sqrt(n/N) fluctuation.
  */
object ShardedExport {

  /** Adds `shard` in [0, nShards) and `ord`, repartitioned so each
    * partition holds whole shards, sorted by (`ord`, id) within.
    */
  def shuffled(df: DataFrame, idCol: String, nShards: Int): DataFrame =
    df.withColumn("shard", Splits.hashBucket(col(idCol), nShards, ":shard"))
      .withColumn("ord", Splits.hashBucket(col(idCol), 1000000000, ":ord"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("ord"), col(idCol))

  /** Epoch-parameterized shuffle: weave the epoch into both salts so each
    * epoch is a DIFFERENT deterministic permutation of the identical row
    * set — multi-epoch training order without `rand()` and without
    * materializing N shuffled copies. Same one-shuffle scale shape as
    * [[shuffled]].
    */
  def epochShuffled(df: DataFrame, idCol: String, nShards: Int, epoch: Int): DataFrame =
    df.withColumn("shard", Splits.hashBucket(col(idCol), nShards, s":shard:e$epoch"))
      .withColumn("ord", Splits.hashBucket(col(idCol), 1000000000, s":ord:e$epoch"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("ord"), col(idCol))

  /** Per-shard manifest: row count, payload size, order-hash span —
    * what an export job logs and a reader uses to plan.
    */
  def shardStats(df: DataFrame, idCol: String, sizeCol: String, nShards: Int): DataFrame =
    df.withColumn("shard", Splits.hashBucket(col(idCol), nShards, ":shard"))
      .withColumn("ord", Splits.hashBucket(col(idCol), 1000000000, ":ord"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col(sizeCol)).as("total_size"),
        min(col("ord")).as("min_ord"),
        max(col("ord")).as("max_ord"))
}
