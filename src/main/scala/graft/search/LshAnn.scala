package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Approximate nearest neighbor via random-hyperplane-style sign-bit LSH
  * (SURVEY.md §7.4 "IVF-style partition-pruned layout" scaling lever).
  *
  * Bucket id = integer of the sign bits of the first `nBits` dimensions —
  * a deterministic, data-independent hash family (axis-aligned hyperplanes).
  * At scale the vectors table is written `partitionBy("bucket")`, so a probe
  * reads exactly the probed buckets (partition pruning) instead of the full
  * corpus; recall is tuned by probing Hamming-adjacent buckets.
  */
object LshAnn {

  /** Sign-bit bucket of dims [1..nBits] (1-based element_at). Vectors
    * shorter than nBits contribute 0-bits for the missing dims — the same
    * rule the query side applies, so self-lookup is symmetric.
    */
  def bucketOf(vec: Column, nBits: Int): Column =
    (1 to nBits).map { i =>
      when(coalesce(try_element_at(vec, lit(i)), lit(-1.0)) >= 0.0, lit(1L << (i - 1)))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** Buckets within Hamming distance 1 of the query's bucket. */
  def probeBuckets(queryBucket: Long, nBits: Int): Seq[Long] =
    queryBucket +: (0 until nBits).map(i => queryBucket ^ (1L << i))

  /** ANN top-k: restrict to probed buckets, exact cosine inside. */
  def topK(df: DataFrame, idCol: String, vecCol: String,
           query: Seq[Double], k: Int, nBits: Int, probes1: Boolean = true): DataFrame = {
    // same missing-dim rule as bucketOf: dims beyond the vector are 0-bits
    val qBucket = (0 until nBits).map(i =>
      if (i < query.length && query(i) >= 0.0) 1L << i else 0L).sum
    val buckets = if (probes1) probeBuckets(qBucket, nBits) else Seq(qBucket)
    df.withColumn("bucket", bucketOf(col(vecCol).cast("array<double>"), nBits))
      .filter(col("bucket").isin(buckets: _*))
      .withColumn("score", VectorOps.cosine(col(vecCol), VectorOps.vecLit(query)))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("bucket"), col("score"))
  }
}
