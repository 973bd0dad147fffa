package graft.search

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over an embedding column — the "real
  * k-means" upgrade for [[IvfAnn]] centroids (SURVEY.md §7.4: IVF partition
  * pruning is the brute-force-kNN scale lever; the centroid quality decides
  * how much probing prunes).
  *
  * Determinism contract (so a SQL oracle can replay the fit exactly):
  *  - init = the k vectors with the lowest ids, labeled by their seed id
  *    (k-means|| trades determinism for quality; a production fit would
  *    persist its centroid table and everything downstream is identical);
  *  - assignment = max cosine, ties to the lowest cluster id;
  *  - each new centroid component is round(avg, 6) — the rounding pins the
  *    floating-point result so summation order (Spark partial aggs vs any
  *    other engine's order) cannot leak into the next iteration;
  *  - empty clusters drop out (both engines lose them from the groupBy).
  *
  * Scale shape: per iteration, one broadcast cross-join (k centroids) +
  * argmax window per point, then a posexplode + two-level aggregation for
  * the means — all partial-aggregated, one shuffle each. Centroids
  * (k × dim doubles) are collected to the driver between iterations so the
  * next assignment joins against a literal table, keeping the plan
  * constant-size regardless of iteration count.
  */
object KMeans {

  /** (cluster, centroid: array<double>) after `iters` Lloyd iterations. */
  def fit(emb: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int): DataFrame = {
    val spark = emb.sparkSession
    val vecs = emb.select(col(idCol).cast("long").as("vid"), col(vecCol).cast("array<double>").as("v"))
      .persist()
    var cents: DataFrame = vecs.orderBy(col("vid").asc).limit(k)
      .select(col("vid").as("cluster"), col("v").as("centroid"))
    (1 to iters).foreach { _ =>
      val assigned = IvfAnn.assign(vecs, "vid", "v", cents)
      val means = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(round(avg(col("x")), 6).as("m"))
        .groupBy(col("cluster"))
        .agg(expr("transform(sort_array(collect_list(struct(pos, m))), e -> e.m)").as("centroid"))
      // k × dim doubles — collect so the next iteration's plan starts from
      // a literal local relation instead of a growing DAG
      val rows = means.collect().toSeq
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
        .sortBy(_._1)
      import spark.implicits._
      cents = rows.toDF("cluster", "centroid")
    }
    vecs.unpersist()
    cents
  }

  /** Final assignment of every vector to its fitted cluster. */
  def assignments(emb: DataFrame, idCol: String, vecCol: String, cents: DataFrame): DataFrame =
    IvfAnn.assign(
      emb.select(col(idCol).cast("long").as("vid"), col(vecCol).cast("array<double>").as("v")),
      "vid", "v", cents)
}
