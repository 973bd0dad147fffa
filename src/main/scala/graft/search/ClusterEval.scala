package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** External clustering evaluation — per-cluster purity and corpus NMI
  * against a ground-truth label column: the "did the clusters find the
  * real classes" check run after every k-means/embedding-cluster job
  * (q37/q42) before anyone trusts cluster ids downstream.
  *
  * NMI uses the entropy identity I(C;L) = H(C) + H(L) − H(C,L) over the
  * contingency counts, normalized by sqrt(H(C)·H(L)) (Strehl & Ghosh
  * 2002); natural log.
  *
  * Scale shape: ONE partial-agg groupBy builds the (cluster, label)
  * contingency table; everything downstream — marginals, entropies, the
  * per-cluster majority window — runs on that ≤k·|labels| grid, so the
  * corpus is scanned once regardless of size and no window ever touches
  * raw rows.
  */
object ClusterEval {

  /** Per-cluster report with the global NMI repeated in every row (the
    * single-scan dashboard shape): cluster, n_points, top_label, n_top,
    * purity, nmi.
    */
  def purityReport(assigned: DataFrame, clusterCol: String, labelCol: String): DataFrame = {
    // eager-checkpoint the ≤ k·|labels| contingency grid: FIVE consumers
    // below (tot, h_c, h_l, h_cl, the majority window) would otherwise each
    // re-run the full upstream assignment pipeline (centroid join + argmax
    // window over the corpus) — ReuseExchange only collapses some of them
    // (r12; guide §1.2 "don't compute things twice")
    val cont = assigned.groupBy(col(clusterCol).as("cluster"), col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_cl"))
      .localCheckpoint(false) // lazy (r13): same reuse, one less driver barrier

    val tot = cont.agg(sum(col("n_cl")).as("n"))
    // entropies from the contingency grid + its two marginals
    val hC = cont.groupBy(col("cluster")).agg(sum(col("n_cl")).as("nc"))
      .crossJoin(broadcast(tot))
      .agg(sum(-(col("nc") / col("n")) * log(col("nc") / col("n"))).as("h_c"))
    val hL = cont.groupBy(col("label")).agg(sum(col("n_cl")).as("nl"))
      .crossJoin(broadcast(tot))
      .agg(sum(-(col("nl") / col("n")) * log(col("nl") / col("n"))).as("h_l"))
    val hCL = cont.crossJoin(broadcast(tot))
      .agg(sum(-(col("n_cl") / col("n")) * log(col("n_cl") / col("n"))).as("h_cl"))
    // degenerate partitions (one cluster, or one label) have H = 0 and
    // zero mutual information — report the conventional 0, not NULL 0/0
    val nmi = hC.crossJoin(hL).crossJoin(hCL)
      .select(when(col("h_c") * col("h_l") === 0.0, 0.0)
        .otherwise((col("h_c") + col("h_l") - col("h_cl"))
          / sqrt(col("h_c") * col("h_l"))).as("nmi"))

    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("n_cl").desc, col("label"))
    cont.withColumn("rn", row_number().over(w))
      .groupBy(col("cluster"))
      .agg(sum(col("n_cl")).as("n_points"),
        max(when(col("rn") === 1, col("label"))).as("top_label"),
        max(when(col("rn") === 1, col("n_cl"))).as("n_top"))
      .withColumn("purity", round(col("n_top") / col("n_points"), 6))
      .crossJoin(broadcast(nmi))
      .select(col("cluster"), col("n_points"), col("top_label"),
        col("n_top"), col("purity"), round(col("nmi"), 6).as("nmi"))
  }
}
