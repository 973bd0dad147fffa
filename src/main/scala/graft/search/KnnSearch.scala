package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Dense top-k retrieval (SURVEY.md §2.4 row "Dense top-k search";
  * reference: storage/qdrant.py:827-886).
  *
  * Brute force is the exact baseline: score with the codegen'd
  * CosineSimilarity expression, then `orderBy(...).limit(k)` — Spark plans
  * this as TakeOrderedAndProject (per-partition heap of k, then a k-sized
  * merge on the driver), so no global sort ever materializes. At 100 TB the
  * scan is embarrassingly parallel and the reduce traffic is k rows per
  * partition.
  *
  * The scale path is [[LshAnn]]: a sign-bit bucket column prunes the scan to
  * one bucket (partition pruning when the table is written partitioned by
  * bucket).
  */
object KnnSearch {

  /** Exact cosine top-k of `df(vecCol)` against a literal query vector. */
  def topK(df: DataFrame, idCol: String, vecCol: String,
           query: Seq[Double], k: Int,
           threshold: Double = Double.NegativeInfinity): DataFrame = {
    val scored = df
      .withColumn("score", VectorOps.cosine(col(vecCol), VectorOps.vecLit(query)))
    val thresholded = if (threshold.isNegInfinity) scored else scored.filter(col("score") >= threshold)
    thresholded
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("score"))
  }

  /** Driver-side point lookup of one stored vector (the "query by example"
    * entry point — mirrors embedding the query text, indexer.py:741-792).
    */
  def vectorOf(df: DataFrame, idCol: String, vecCol: String, id: Long): Seq[Double] =
    df.filter(col(idCol) === id)
      .select(col(vecCol).cast("array<double>"))
      .head()
      .getSeq[Double](0)
}
