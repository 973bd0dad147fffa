package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance-verified near-duplication — the fuzzy-dedup shape real
  * curation pipelines use when token-set measures (jaccard/minhash) are
  * too coarse: LSH proposes candidates, exact Levenshtein confirms.
  *
  * Neither stage enumerates doc×doc. Candidates come from the banded
  * MinHash join ([[MinHashLsh.candidatePairs]] — band buckets bound the
  * quadratic term); the verify is one equi-join back to the text and a
  * codegen `levenshtein` per CANDIDATE pair only. The Levenshtein call
  * carries Spark's banded `threshold` bound (O(k·len) instead of
  * O(len²)): any pair that could still pass `minSim` has distance
  * ≤ (1-minSim)·global_max_len, so the bound prunes exactly the pairs
  * the similarity filter would drop (the -1 sentinel rows).
  */
object EditDistanceDedup {

  /** Candidate pairs with edit similarity ≥ `minSim`, where
    * `edit_sim = 1 - lev(a,b) / max(len(a), len(b))` (1.0 = identical).
    */
  def verifiedPairs(docs: DataFrame, idCol: String, textCol: String,
                    minSim: Double): DataFrame = {
    val cands = MinHashLsh.candidatePairs(docs, idCol, textCol)
      .select(col("doc_a"), col("doc_b"))
    val txt = docs.select(col(idCol), col(textCol))
    // global distance bound for the banded levenshtein (1-row broadcast)
    val maxLen = txt.agg(max(length(col(textCol))).cast("double").as("_maxlen"))
    val bound = maxLen.head().getDouble(0)
    val thr = math.max(1, math.ceil((1.0 - minSim) * bound).toInt)
    // The DP is the expensive per-row step, so two plan guards: an
    // explicit repartition (AQE would coalesce the tiny candidate join to
    // ONE task, serializing every distance), and an eager checkpoint
    // after scoring (predicate pushdown substitutes an aliased expression
    // into each referencing filter — without the barrier the DP would run
    // 3x per pair: sentinel filter, sim filter, projection).
    val scored = cands
      .join(txt.select(col(idCol).as("doc_a"), col(textCol).as("_ta")), Seq("doc_a"))
      .join(txt.select(col(idCol).as("doc_b"), col(textCol).as("_tb")), Seq("doc_b"))
      .repartition(cands.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("_ta"), col("_tb"), thr).as("lev"),
        greatest(length(col("_ta")), length(col("_tb"))).as("_mx"))
      .localCheckpoint(false) // lazy (r13): same pushdown barrier, no extra driver job
    scored
      // -1 = distance exceeded the bound → cannot reach minSim
      .filter(col("lev") >= 0)
      .withColumn("edit_sim", lit(1.0) - col("lev") / col("_mx"))
      .filter(col("edit_sim") >= minSim)
      .select(col("doc_a"), col("doc_b"), col("lev").cast("long").as("lev"),
        round(col("edit_sim"), 6).as("edit_sim"))
  }
}
