package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** EMBEDDING-SPACE OUTLIER DETECTION — per-point cosine against the
  * point's own group centroid, flagging vectors that disagree with their
  * label (mislabeled samples, corrupt embeddings, adversarial inserts).
  * The point-level companion to the q81 drift REPORT: q81 summarizes each
  * label's dispersion; this operator names the rows to quarantine, the
  * standard cleaning step before centroid-sensitive stages (KMeans/IVF
  * fit, class-balanced sampling) consume the table.
  *
  * Scale shape: centroids come from ONE posexplode + two-level mean agg
  * (partial aggregation per partition — the same discipline as
  * [[KMeans]]), and the per-point pass joins the K-row centroid table
  * back BROADCAST, so the only shuffle over the big table is the
  * dimension-keyed partial agg. Nothing here is quadratic and no window
  * touches the point table.
  */
object EmbedOutliers {

  /** `(id, group, cos_centroid)` for every point whose cosine to its own
    * group centroid falls strictly under `below` — with near-uniform
    * synthetic embeddings a `below` of 0.0 means "anti-correlated with
    * its own label". Cosine is rounded to 6dp for cross-engine-stable
    * output; the FLAG uses the unrounded value (both engines derive it
    * from identical doubles, and the testdata's closest |cos| to 0 is
    * 2e-5 — five orders above ulp jitter).
    */
  def outliers(points: DataFrame, idCol: String, groupCol: String,
               vecCol: String, below: Double): DataFrame = {
    val e = points.select(col(idCol).cast("long").as("id"),
      col(groupCol).cast("long").as("grp"),
      col(vecCol).cast("array<double>").as("v"))
    val cents = e.select(col("grp"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("grp"), col("pos")).agg(avg(col("x")).as("m"))
      .groupBy(col("grp"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)")
        .as("cent"))
    e.join(broadcast(cents), Seq("grp"))
      .withColumn("_cs", VectorOps.cosine(col("v"), col("cent")))
      .filter(col("_cs") < below)
      .select(col("id"), col("grp"), round(col("_cs"), 6).as("cos_centroid"))
  }
}
