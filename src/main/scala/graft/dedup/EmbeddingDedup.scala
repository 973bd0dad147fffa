package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.search.LshAnn

/** Embedding-cosine near-duplicate detection.
  *
  * `pairsBrute` is the exact baseline (all pairs — only for bounded inputs
  * or within small groups). `pairsBucketed` is the scale path: sign-bit LSH
  * buckets bound the quadratic pair term exactly like [[SimHash]] grouping;
  * at 100 TB the bucket column is the table's partition key, so the
  * self-join is co-located and never shuffles the full corpus.
  */
object EmbeddingDedup {

  def pairsBrute(emb: DataFrame, idCol: String, vecCol: String,
                 minCos: Double): DataFrame = {
    val e = emb.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val a = e.select(col("id").as("id_a"), col("v").as("v_a"))
    val b = e.select(col("id").as("id_b"), col("v").as("v_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", VectorOps.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  def pairsBucketed(emb: DataFrame, idCol: String, vecCol: String,
                    minCos: Double, nBits: Int): DataFrame = {
    val e = emb.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("bucket", LshAnn.bucketOf(col("v"), nBits))
    val a = e.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = e.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", VectorOps.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= minCos)
      .select(col("bucket"), col("id_a"), col("id_b"), col("cos"))
  }
}
