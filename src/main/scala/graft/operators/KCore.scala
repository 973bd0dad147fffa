package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-core decomposition by iterative peeling (Seidman 1983; the
  * distributed formulation follows Montresor et al., "Distributed k-Core
  * Decomposition", and the degree-peel loop used in web-graph curation —
  * spam farms and boilerplate link rings concentrate outside the dense
  * core, so "keep the k-core" is a standard crawl-corpus quality filter).
  *
  * Shape per round: one partial-agg `groupBy(node)` for degrees + two
  * semi-joins to drop edges touching peeled nodes. Both sides of every
  * join are hash-partitioned on the node key, survivors shrink
  * monotonically, and `localCheckpoint` truncates the per-round lineage
  * (the [[GraphOps.pageRank]] / DupClusters discipline). Nothing is
  * collected to the driver; at 100 TB the edge table dominates and each
  * round is a bounded pair of shuffles on it.
  *
  * `rounds` is FIXED (not run-to-fixpoint) so the result is replayable by
  * an unrolled SQL oracle; on real graphs peeling converges in a handful
  * of rounds because each pass removes whole shells, and the fixpoint
  * variant is the same loop with an `isEmpty` convergence probe.
  */
object KCore {

  /** Nodes surviving `rounds` peels at threshold `k` over the UNDIRECTED
    * simple graph of `edges`, with their residual degree. Input edges are
    * symmetrized (both directions added), de-duplicated, and self-loops
    * dropped, so "degree" is the count of distinct neighbors.
    */
  def peel(edges: DataFrame, srcCol: String, dstCol: String,
           k: Int, rounds: Int): DataFrame = {
    val fwd = edges.select(col(srcCol).as("_a"), col(dstCol).as("_b"))
    val sym = fwd.unionByName(fwd.select(col("_b").as("_a"), col("_a").as("_b")))
      .filter(col("_a") =!= col("_b")).distinct()
    var e = sym.localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = e.groupBy(col("_a")).agg(count(lit(1)).as("_deg"))
        .filter(col("_deg") >= k).select(col("_a"))
      e = e.join(keep, Seq("_a"), "left_semi")
        .join(keep.withColumnRenamed("_a", "_b"), Seq("_b"), "left_semi")
        .localCheckpoint()
    }
    e.groupBy(col("_a").as("node")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= k)
  }
}
