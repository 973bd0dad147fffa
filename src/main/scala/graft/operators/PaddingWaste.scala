package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Length-bucketed padding-waste audit: when sequences batch by padded
  * length buckets (the standard bucketed-batching layout), every sequence
  * pays `bucket_len − len` pad tokens. This reports, per bucket, how much
  * of the padded token volume is real — the number that decides bucket
  * granularity and max-length truncation for a training run.
  *
  * Bucket width MUST be a power of two here: `(n + width−1)/width` is then
  * exact in binary floating point, so the bucket id is engine-exact
  * without integer-division quirks. Pure map + one integer partial agg.
  */
object PaddingWaste {

  /** Per-bucket report: `bucket_len`, `n_seqs`, `n_real` (true tokens,
    * post-truncation), `n_padded` (bucket_len × n_seqs), `waste_frac`
    * (6dp). Sequences longer than `maxLen` are truncated to it first
    * (their overflow is reported in `n_truncated`).
    */
  def report(docs: DataFrame, tokens: Column, bucketWidth: Int = 64,
             maxLen: Int = 512): DataFrame = {
    require((bucketWidth & (bucketWidth - 1)) == 0, "bucketWidth must be a power of two")
    val n = size(tokens).cast("long")
    val d = docs.select(least(n, lit(maxLen.toLong)).as("len"),
      greatest(n - maxLen, lit(0L)).as("overflow"))
    d.withColumn("bucket_len",
        (floor((col("len") + (bucketWidth - 1)) / bucketWidth) * bucketWidth)
          .cast("long"))
      .groupBy(col("bucket_len"))
      .agg(
        count(lit(1)).as("n_seqs"),
        sum(col("len")).as("n_real"),
        (max(col("bucket_len")) * count(lit(1))).as("n_padded"),
        sum(col("overflow")).as("n_truncated"))
      .withColumn("waste_frac",
        round((col("n_padded") - col("n_real")).cast("double") / col("n_padded"), 6))
  }
}
