package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid RRF fusion (reference: storage/qdrant.py:888-1044):
  * run dense and sparse retrieval at `fetch = max(3*limit, 50)`, rank each,
  * fuse with `alpha/(k0+rank_dense) + (1-alpha)/(k0+rank_sparse)` (k0=60,
  * alpha=0.5), missing side contributes 0; threshold + re-limit.
  *
  * Pure composition of built-ins: two ranked DataFrames (row_number over a
  * deterministic ordering) full-outer-joined on id — both sides are
  * fetch-sized (small), so the join broadcasts; no custom operator needed
  * (SURVEY.md §4 item 2).
  */
object Hybrid {
  val RrfK = 60.0
  val Alpha = 0.5

  def fetchSize(limit: Int): Int = math.max(3 * limit, 50)

  /** `dense` and `sparse` are (id, score) DataFrames already limited to the
    * fetch size. Returns (id, rrf_score, rank_dense, rank_sparse) top-k.
    */
  def rrf(dense: DataFrame, sparse: DataFrame, idCol: String, limit: Int,
          alpha: Double = Alpha, k0: Double = RrfK): DataFrame = {
    // Both inputs are already fetch-limited (≤ 3*limit rows), so a global
    // rank over them is inherently single-partition; make that explicit with
    // coalesce(1) + in-partition sort instead of a global WindowExec (which
    // warns and adds a window exchange). monotonically_increasing_id on a
    // single sorted partition is 0..n-1 in row order — a deterministic rank.
    def ranked(df: DataFrame, rankName: String) =
      df.coalesce(1)
        .sortWithinPartitions(col("score").desc, col(idCol).asc)
        .withColumn(rankName, (monotonically_increasing_id() + 1).cast("int"))
        .select(col(idCol), col(rankName))
    val d = ranked(dense, "rank_dense")
    val s = ranked(sparse, "rank_sparse")
    d.join(s, Seq(idCol), "full_outer")
      .withColumn("rrf_score",
        coalesce(lit(alpha) / (lit(k0) + col("rank_dense")), lit(0.0)) +
          coalesce(lit(1.0 - alpha) / (lit(k0) + col("rank_sparse")), lit(0.0)))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
      .limit(limit)
  }
}
