package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: connected components over a near-dup pair
  * list (minhash / simhash / jaccard candidates), so a training pipeline can
  * keep one representative per duplicate family ("cluster id = min doc id
  * in the component" — the same convention the oracle's recursive CTE
  * computes, so the fixpoint is engine-independent by construction).
  *
  * Algorithm: iterative min-label propagation. Each node starts labeled
  * with itself; every round each node takes the min of its own label and
  * its neighbors' labels; convergence (no label changed) is the exact
  * component minimum. Rounds needed = graph diameter — duplicate families
  * are short-diameter blobs, so this converges in a handful of joins.
  *
  * Scale shape: one join + one groupBy per round over the EDGE list (not
  * the corpus); edges from LSH banding are sparse by construction. Each
  * round's labels are persisted and the previous round freed, so the plan
  * doesn't grow with iterations. For adversarial long-chain graphs swap in
  * the large-star/small-star variant (O(log n) rounds) — same per-round
  * primitives.
  */
object DupClusters {

  /** (node, cluster_id) for every node appearing in `edges`. */
  def components(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val sym0 = edges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val sym = sym0.union(sym0.select(col("dst").as("src"), col("src").as("dst"))).persist()

    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node")).persist()
    labels.count() // materialize before the loop mutates the reference

    var changed = 1L
    var persisted = labels
    while (changed > 0) {
      val neighborLbl = sym
        .join(labels.select(col("node").as("dst"), col("lbl")), Seq("dst"))
        .select(col("src").as("node"), col("lbl"), lit(null).cast("long").as("own"))
      // each node contributes exactly one self row carrying its current
      // label in `own`, so the SAME aggregation yields both the new label
      // (min over self+neighbors) and the old one (max ignores nulls) —
      // no second join to detect convergence
      val selfLbl = labels.select(col("node"), col("lbl"), col("lbl").as("own"))
      val agg = selfLbl.union(neighborLbl)
        .groupBy(col("node")).agg(min(col("lbl")).as("lbl"), max(col("own")).as("own"))
        .persist()
      changed = agg.filter(col("lbl") =!= col("own")).count()
      persisted.unpersist()
      persisted = agg
      labels = agg.select(col("node"), col("lbl"))
    }
    // materialize the (small) result eagerly so the loop's cache can be
    // released — otherwise the final labels stay pinned in the block
    // manager with no owner to unpersist them
    val out = labels.withColumnRenamed("lbl", "cluster_id").localCheckpoint(true)
    persisted.unpersist()
    sym.unpersist()
    out
  }
}
