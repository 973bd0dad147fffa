package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed table layout — the cluster-scale answer to "this join/agg
  * shuffles the big table every time". Writing a fact table bucketed
  * (and sorted) by its join key pre-partitions it ON DISK; Catalyst then
  * plans joins and aggregations between co-bucketed tables with NO
  * Exchange on either side (`BucketedJoinSpec` asserts exactly that on
  * the physical plan). At 100 TB this turns the recurring
  * per-query shuffle of the biggest table into a one-time layout cost —
  * the same trade Delta/Iceberg clustering and Hive bucketing make.
  *
  * The number of buckets bounds write-side memory (one open file per
  * bucket per task) and sets the join's parallelism floor; both sides of
  * a co-located join must agree on (key, numBuckets).
  */
object Bucketing {

  /** Persist `df` as a managed parquet table bucketed and sorted by
    * `key` — the layout that makes every later equi-join/groupBy on
    * `key` between co-bucketed tables shuffle-free.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
