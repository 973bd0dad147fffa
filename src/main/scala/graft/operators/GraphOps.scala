package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph traversal primitives over a plain (src, dst) edge
  * DataFrame — the scale path for the engine's graph reads (the reference
  * traverses client-side; see `GraftEngine.readGraph`).
  */
object GraphOps {

  /** Multi-source BFS: (node, depth) for every node within `maxDepth`
    * directed hops of a seed, depth = hop count from the NEAREST seed.
    *
    * Shape: iterative frontier expansion where each level is one semi-join
    * (edges × frontier) + one anti-join (drop already-visited) — the
    * frontier never leaves the cluster, unlike a collect-and-isin BFS, so
    * a hub node with millions of neighbors costs a shuffle, not a driver
    * OOM. `localCheckpoint` per level cuts the growing lineage (the
    * DupClusters pointer-jumping pattern); the per-level `isEmpty` is the
    * convergence probe. For an undirected walk, pass `edges` unioned with
    * its own reversal.
    */
  def bfs(edges: DataFrame, srcCol: String, dstCol: String,
          seeds: DataFrame, maxDepth: Int): DataFrame = {
    val e = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
    var visited = seeds.select(col(seeds.columns.head).as("node")).distinct()
      .withColumn("depth", lit(0L)).localCheckpoint()
    var frontier = visited.select("node")
    var d = 0L
    var done = false
    while (!done && d < maxDepth) {
      d += 1
      val next = e.join(frontier.withColumnRenamed("node", "_src"), Seq("_src"), "left_semi")
        .select(col("_dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("depth", lit(d))
        .localCheckpoint()
      if (next.isEmpty) done = true
      else {
        visited = visited.unionByName(next).localCheckpoint()
        frontier = next.select("node")
      }
    }
    visited
  }
}
