package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Margin-based bitext mining (Artetxe & Schwenk, "Margin-based Parallel
  * Corpus Mining with Multilingual Sentence Embeddings", ACL 2019 — public
  * method): candidate translation pairs are MUTUAL nearest neighbors
  * between the two language sides, scored by the ratio margin
  *
  *   margin(x, y) = cos(x, y) / ((meanTopK(x) + meanTopK(y)) / 2)
  *
  * which normalizes away "hub" sentences that are close to everything —
  * raw cosine alone over-selects them.
  *
  * Scale: the quadratic candidate product is the inherent cost of exact
  * mining; this implementation broadcasts the (smaller) target side so the
  * product never shuffles, and both ranking windows partition by one
  * sentence id — a few-hundred-row partition regardless of corpus size on
  * that side. At 100 TB both sides are first bucketed by an IVF/LSH
  * centroid column (q30/q17) and mining runs per bucket — the margin math
  * here is unchanged, only the candidate set shrinks.
  *
  * All cosines are 6dp-rounded BEFORE ranking and margin arithmetic so the
  * pipeline replays bit-for-bit in any engine that agrees at 6dp (the
  * q13/q22 discipline).
  */
object BitextMine {

  /** Mutual-best pairs with ratio margin.
    * Output: `src_id`, `tgt_id`, `cos` (6dp), `margin` (6dp), filtered to
    * `margin >= marginThreshold`.
    */
  def mine(src: DataFrame, tgt: DataFrame, idCol: String, vecCol: String,
           k: Int = 2, marginThreshold: Double = 1.0): DataFrame = {
    val a = src.select(col(idCol).as("src_id"), col(vecCol).as("_va"))
    val b = tgt.select(col(idCol).as("tgt_id"), col(vecCol).as("_vb"))
    val pairs = a.crossJoin(broadcast(b))
      .select(col("src_id"), col("tgt_id"),
        round(VectorOps.cosine(col("_va"), col("_vb")), 6).as("cos"))

    val bySrc = Window.partitionBy(col("src_id"))
      .orderBy(col("cos").desc, col("tgt_id"))
    val byTgt = Window.partitionBy(col("tgt_id"))
      .orderBy(col("cos").desc, col("src_id"))
    val ranked = pairs
      .withColumn("rna", row_number().over(bySrc))
      .withColumn("rnb", row_number().over(byTgt))

    val ma = ranked.filter(col("rna") <= k)
      .groupBy(col("src_id")).agg(avg(col("cos")).as("ma"))
    val mb = ranked.filter(col("rnb") <= k)
      .groupBy(col("tgt_id")).agg(avg(col("cos")).as("mb"))

    ranked.filter(col("rna") === 1 && col("rnb") === 1)
      .join(ma, "src_id").join(mb, "tgt_id")
      .withColumn("margin",
        round(col("cos") / ((col("ma") + col("mb")) / lit(2.0)), 6))
      .filter(col("margin") >= marginThreshold)
      .select(col("src_id"), col("tgt_id"), col("cos"), col("margin"))
  }

  /** The 100 TB composition [[mine]]'s header promises: both sides carry a
    * cluster/bucket column (IVF cell from [[IvfAnn.assign]], or an LSH
    * band) and mining runs PER BUCKET — the candidate product is an
    * equi-join on the bucket key, so the plan shuffles each side once on
    * the bucket and never materializes the corpus×corpus product. Margin
    * math is [[mine]]'s, with neighborhoods (mutual ranks and top-k means)
    * scoped to the cell — the approximation that buys the scale-out.
    *
    * Output adds the bucket column; recall vs exact mining is floored by
    * `BitextRecallSpec` and the composition is gated end-to-end by q203.
    */
  def mineBucketed(src: DataFrame, tgt: DataFrame, idCol: String, vecCol: String,
                   bucketCol: String, k: Int = 2, marginThreshold: Double = 1.0): DataFrame = {
    val a = src.select(col(bucketCol).as("bucket"), col(idCol).as("src_id"),
      col(vecCol).as("_va"))
    val b = tgt.select(col(bucketCol).as("bucket"), col(idCol).as("tgt_id"),
      col(vecCol).as("_vb"))
    val pairs = a.join(b, "bucket")
      .select(col("bucket"), col("src_id"), col("tgt_id"),
        round(VectorOps.cosine(col("_va"), col("_vb")), 6).as("cos"))

    val bySrc = Window.partitionBy(col("bucket"), col("src_id"))
      .orderBy(col("cos").desc, col("tgt_id"))
    val byTgt = Window.partitionBy(col("bucket"), col("tgt_id"))
      .orderBy(col("cos").desc, col("src_id"))
    val ranked = pairs
      .withColumn("rna", row_number().over(bySrc))
      .withColumn("rnb", row_number().over(byTgt))

    val ma = ranked.filter(col("rna") <= k)
      .groupBy(col("bucket"), col("src_id")).agg(avg(col("cos")).as("ma"))
    val mb = ranked.filter(col("rnb") <= k)
      .groupBy(col("bucket"), col("tgt_id")).agg(avg(col("cos")).as("mb"))

    ranked.filter(col("rna") === 1 && col("rnb") === 1)
      .join(ma, Seq("bucket", "src_id")).join(mb, Seq("bucket", "tgt_id"))
      .withColumn("margin",
        round(col("cos") / ((col("ma") + col("mb")) / lit(2.0)), 6))
      .filter(col("margin") >= marginThreshold)
      .select(col("bucket"), col("src_id"), col("tgt_id"), col("cos"), col("margin"))
  }
}
