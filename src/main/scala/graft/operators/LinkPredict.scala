package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Link prediction scores over an undirected graph (Liben-Nowell &
  * Kleinberg 2003): common neighbors, Jaccard, preferential attachment,
  * and Adamic-Adar — "which entities/pages/users are about to connect",
  * the graph-curation read that complements the descriptive q67/q126
  * centralities.
  *
  * Scale shape: candidate pairs come from the shared-neighbor equi-join
  * (two edges through one node), never an all-pairs product — the same
  * discipline as the dedup band joins. The Adamic-Adar Σ 1/ln(deg) is a
  * float sum over an UNORDERED neighbor set, so it is regrouped by
  * degree (the Krippendorff distinct-m trick): integer counts per
  * (pair, deg), then the fold runs on the ordered bounded degree grid.
  * A common neighbor has both endpoints adjacent, so deg ≥ 2 and
  * ln(deg) > 0 — no zero division.
  */
object LinkPredict {

  /** Top-N NON-adjacent pairs by Adamic-Adar (6 dp; ties broken by the
    * pair ids). Input: directed or undirected edge list; symmetrized and
    * de-self-looped here.
    */
  def scores(edges: DataFrame, srcCol: String, dstCol: String,
             topN: Int): DataFrame = {
    val und = edges.select(col(srcCol).cast("long").as("node"),
        col(dstCol).cast("long").as("nbr"))
      .unionByName(edges.select(col(dstCol).cast("long").as("node"),
        col(srcCol).cast("long").as("nbr")))
      .filter(col("node") =!= col("nbr")).distinct()
    val deg = und.groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // candidate pairs u<w through a shared neighbor n, carrying deg(n)
    val throughN = und.select(col("node").as("u"), col("nbr").as("n"))
      .join(und.select(col("node").as("w"), col("nbr").as("n")), Seq("n"))
      .filter(col("u") < col("w"))
      .join(deg.select(col("node").as("n"), col("deg").as("deg_n")), Seq("n"))
    // drop already-adjacent pairs
    val cand = throughN.join(
      und.select(col("node").as("u"), col("nbr").as("w")),
      Seq("u", "w"), "left_anti")
    val perDeg = cand.groupBy(col("u"), col("w"), col("deg_n"))
      .agg(count(lit(1)).as("c"))
    val dw = Window.partitionBy(col("u"), col("w")).orderBy(col("deg_n"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = Window.partitionBy(col("u"), col("w"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val scored = perDeg
      .withColumn("cn", sum(col("c")).over(full))
      .withColumn("aa_acc",
        sum(col("c").cast("double") / log(col("deg_n").cast("double"))).over(dw))
      // the fold is positive-increasing, so its max IS its last value
      .withColumn("aa", max(col("aa_acc")).over(full))
      .withColumn("maxdeg", max(col("deg_n")).over(full))
      .filter(col("deg_n") === col("maxdeg")) // one row per pair
      .join(deg.select(col("node").as("u"), col("deg").as("deg_u")), Seq("u"))
      .join(deg.select(col("node").as("w"), col("deg").as("deg_w")), Seq("w"))
    scored.select(col("u"), col("w"), col("cn"),
        round(col("cn").cast("double")
          / (col("deg_u") + col("deg_w") - col("cn")), 6).as("jaccard"),
        (col("deg_u") * col("deg_w")).as("pref_attach"),
        round(col("aa"), 6).as("adamic_adar"))
      .orderBy(round(col("aa"), 6).desc, col("u"), col("w"))
      .limit(topN)
  }
}
