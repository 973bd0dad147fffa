package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** IVF-style ANN (SURVEY.md §7.4 "IVF partition pruning by cluster-id
  * partition column"): vectors are assigned to the nearest of K centroids;
  * a query probes only its `nprobe` nearest clusters and runs exact cosine
  * inside them.
  *
  * Centroid choice: [[topK]] uses a deterministic seed (the vectors with
  * the K lowest ids — reproducible across engines); [[topKWith]] accepts a
  * fitted centroid table, with [[KMeans.fit]] as the production source
  * (gated end-to-end by q46, whose oracle replays the fit in SQL).
  *
  * Everything is relational: assignment is a (vectors × centroids) cosine
  * ranked by a window — a broadcast join since centroids are K rows. At
  * 100 TB the assignment runs once at ingest, `cluster` becomes the
  * table's partition column, and probing prunes to nprobe/K of the data.
  */
object IvfAnn {

  /** K-row centroid table: (cluster, centroid) from the K lowest ids. */
  def centroids(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
    emb.orderBy(col(idCol).asc).limit(k)
      .select(col(idCol).as("cluster"), col(vecCol).cast("array<double>").as("centroid"))

  /** Assign each vector to its max-cosine centroid (ties → lowest cluster
    * id).
    *
    * r12 shape: argmax as ONE partial-aggregated `max(struct(cos,
    * -cluster, payload))` — the k candidate rows per vector collapse
    * MAP-SIDE before the exchange, so the shuffle carries one row per
    * vector instead of k, and the per-partition sort + row_number window
    * disappears (guide §2.3 "aggregate before you shuffle"; the q89
    * max-struct election discipline). `max(struct(cos, -cluster))` picks
    * exactly the old window's rank-1 row: highest cosine, ties to the
    * LOWEST cluster id (negation flips the tiebreak under max); -cluster
    * can't itself tie since cluster ids are unique per centroid row.
    */
  def assign(emb: DataFrame, idCol: String, vecCol: String, cents: DataFrame): DataFrame = {
    val payload = emb.columns.map(c => col(c).as(c))
    emb.crossJoin(broadcast(cents))
      .withColumn("_ccos", VectorOps.cosine(col(vecCol), col("centroid")))
      .groupBy(col(idCol).as("_gid"))
      .agg(max(struct(col("_ccos").as("c"), (-col("cluster")).as("nc"),
        struct(payload.toIndexedSeq: _*).as("p"))).as("_best"))
      .select((emb.columns.map(c => col(s"_best.p.$c").as(c)) :+
        (-col("_best.nc")).as("cluster")).toIndexedSeq: _*)
  }

  /** Multi-probe assignment: each vector is replicated into its `nprobe`
    * nearest cells (rank 1 = its home cell). The query-side half of an
    * IVF composition joins on ALL probed cells while the indexed side
    * stays in its home cell — the FAISS-style recall/candidate-volume
    * dial. Output multiplies the input by nprobe, so use it on the
    * (smaller) probing side only.
    */
  def assignProbed(emb: DataFrame, idCol: String, vecCol: String, cents: DataFrame,
                   nprobe: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("_ccos").desc, col("cluster").asc)
    emb.crossJoin(broadcast(cents))
      .withColumn("_ccos", VectorOps.cosine(col(vecCol), col("centroid")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= nprobe)
      .drop("_rn", "_ccos", "centroid")
  }

  /** Probed ANN top-k over the seeded centroid table. */
  def topK(emb: DataFrame, idCol: String, vecCol: String, query: Seq[Double],
           k: Int, numClusters: Int, nprobe: Int): DataFrame =
    topKWith(emb, idCol, vecCol, centroids(emb, idCol, vecCol, numClusters), query, k, nprobe)

  /** Probed ANN top-k against a PROVIDED `(cluster, centroid)` table — the
    * production shape: centroids come from a persisted [[KMeans.fit]] run
    * (better-balanced clusters → the same nprobe prunes more), and at
    * 100 TB `cluster` is the table's partition column so the probe is
    * partition pruning.
    */
  def topKWith(emb: DataFrame, idCol: String, vecCol: String, cents: DataFrame,
               query: Seq[Double], k: Int, nprobe: Int): DataFrame = {
    val qv = VectorOps.vecLit(query)
    val probed = cents
      .withColumn("qcos", VectorOps.cosine(col("centroid"), qv))
      .orderBy(col("qcos").desc, col("cluster").asc)
      .limit(nprobe)
      .select(col("cluster"))
    assign(emb, idCol, vecCol, cents)
      .join(broadcast(probed), Seq("cluster"), "left_semi")
      .withColumn("score", VectorOps.cosine(col(vecCol), qv))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("cluster"), col("score"))
  }
}
