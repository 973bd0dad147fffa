package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Splits

/** DISTRIBUTION-MATCHED DOWNSAMPLING — reshape a raw corpus so a chosen
  * feature's histogram matches a target corpus's (length-matching a web
  * crawl to a curated set, balancing per-domain shares, …). The classic
  * curation companion to DSIR ([[Dsir]]): DSIR matches CONTENT, this
  * matches a marginal DISTRIBUTION.
  *
  * Per-bucket keep-probability ∝ target-share / raw-share, normalized so
  * the most under-represented bucket keeps everything (pure downsampling,
  * no duplication). All ratios are integer arithmetic — ppm quotients and
  * basis-point keep rates via long division — so the sample is exactly
  * reproducible on any engine, and the keep decision is the engine's
  * deterministic content-hash coin ([[Splits.hashBucket]]), not an RNG.
  *
  * Scale shape: two bounded histogram partial-aggs (≤ buckets rows each)
  * broadcast into one per-row map pass — scoring 100 TB of raw rows
  * shuffles nothing but the two tiny count tables.
  */
object DistMatch {

  /** Per-bucket plan: `(bucket, n_raw, bp, n_kept)` where `bp` is the
    * keep rate in basis points (0..10000). `df` must carry `(idCol,
    * bucket)`; rows satisfying `targetPred` define the target histogram,
    * the rest are the raw pool being sampled.
    */
  def matchedSample(df: DataFrame, idCol: String,
                    targetPred: Column): DataFrame = {
    val t = df.filter(targetPred).groupBy(col("bucket"))
      .agg(count(lit(1)).as("tc"))
    val r = df.filter(!targetPred).groupBy(col("bucket"))
      .agg(count(lit(1)).as("rc"))
    // ppm quotient of target/raw share per bucket (buckets absent from the
    // target sample at rate 0; buckets absent from raw have nothing to keep)
    val q = r.join(t, Seq("bucket"), "left")
      .select(col("bucket"), col("rc"),
        expr("coalesce(tc, 0L) * 1000000L div rc").as("q"))
    val m = q.agg(max(col("q")).as("m")) // 1 row
    val bp = q.crossJoin(broadcast(m))
      .select(col("bucket"), col("rc").as("n_raw"),
        expr("q * 10000L div m").as("bp"))
    df.filter(!targetPred)
      .join(broadcast(bp), Seq("bucket"))
      .withColumn("_keep", Splits.hashBucket(col(idCol), 10000, ":dm") < col("bp"))
      .groupBy(col("bucket"))
      .agg(max(col("n_raw")).as("n_raw"), max(col("bp")).as("bp"),
        sum(when(col("_keep"), 1L).otherwise(0L)).as("n_kept"))
  }
}
