package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Newman-Girvan modularity (Newman 2006) of a node partition over an
  * undirected graph — the quality score for a community detection result
  * (here: how well label propagation's communities explain the near-dup
  * graph's edge mass): Q = Σ_c [ e_c/m − (d_c/2m)² ].
  *
  * Scale story: the naive per-community float sum is order-dependent;
  * this reduces Q to TWO integer sufficient statistics — E_in = Σ_c e_c
  * (intra-community edge count) and D2 = Σ_c d_c² (squared community
  * degree sums) — so Q = E_in/m − D2/(4m²) with one float expression at
  * the edge. Everything is equi-joins and partial aggs: two node-keyed
  * label joins onto the edge list, one degree agg, one community agg.
  * Nothing enumerates node pairs; cost is O(|E|) shuffled on node ids.
  */
object Modularity {

  /** `pairs` holds each undirected edge once (aCol < bCol); `comm` maps
    * every node to its community. Output one row: m, n_nodes, n_comm,
    * e_in, d2, q.
    */
  def partitionQuality(pairs: DataFrame, aCol: String, bCol: String,
                       comm: DataFrame, nodeCol: String,
                       commCol: String): DataFrame = {
    val lbl = comm.select(col(nodeCol).as("_node"), col(commCol).as("_c"))
    val tagged = pairs
      .join(lbl.withColumnRenamed("_c", "_ca"),
        col(aCol) === col("_node")).drop("_node")
      .join(lbl.withColumnRenamed("_c", "_cb"),
        col(bCol) === col("_node")).drop("_node")
    val edgeSums = tagged.agg(
      count(lit(1)).as("m"),
      sum(when(col("_ca") === col("_cb"), 1L).otherwise(0L)).as("e_in"))
    // degree = #incident edges; community degree sums then Σ d_c²
    val deg = pairs.select(col(aCol).as("_node"))
      .unionAll(pairs.select(col(bCol).as("_node")))
      .groupBy(col("_node")).agg(count(lit(1)).as("deg"))
    val d2 = deg.join(lbl, Seq("_node"))
      .groupBy(col("_c")).agg(sum(col("deg")).as("d_c"))
      .agg(count(lit(1)).as("n_comm"), sum(col("d_c") * col("d_c")).as("d2"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    edgeSums.crossJoin(broadcast(nNodes)).crossJoin(broadcast(d2))
      .select(col("m"), col("n_nodes"), col("n_comm"), col("e_in"), col("d2"),
        round(col("e_in").cast("double") / col("m")
          - col("d2").cast("double") / (lit(4.0) * col("m") * col("m")), 6)
          .as("q"))
  }
}
