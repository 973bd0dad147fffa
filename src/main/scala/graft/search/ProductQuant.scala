package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PRODUCT QUANTIZATION (Jégou 2011) — split each d-dim vector into
  * `numSub` subvectors and Lloyd-quantize every subspace independently
  * (L2, deterministic): a vector compresses to `numSub` small codes
  * (here 8 × 2 bits = 2 bytes for a 256-byte float vector), the memory
  * layout ANN systems use when even int8 ([[graft.functions.VectorQuant]])
  * is too wide. Everything is deterministic — init = the first k vectors'
  * subvectors, ties → smallest cluster id, centroids rounded to 6dp per
  * iteration — so the DuckDB oracle replays the whole fit bit-for-bit
  * (the q37 KMeans contract, per subspace).
  *
  * Scale shape: the subspace explode is a narrow flatMap (rows × numSub,
  * each 1/numSub as wide); the codebook is numSub×k tiny rows BROADCAST
  * to every assignment join; assignment argmin is a partial-aggregated
  * `min(struct(dist, cluster))` — never a window over points; centroid
  * means are two-level aggs keyed on (subspace, cluster, dim).
  */
object ProductQuant {

  /** `(vid, s, sv)` — one row per (vector, subspace). */
  private def subvectors(emb: DataFrame, idCol: String, vecCol: String,
                         numSub: Int): DataFrame = {
    import emb.sparkSession.implicits._
    emb.select(col(idCol).cast("long").as("vid"),
      col(vecCol).cast("array<double>").as("v"))
      .as[(Long, Seq[Double])]
      .flatMap { case (id, v) =>
        val d = v.length / numSub
        (0 until numSub).map(s => (id, s, v.slice(s * d, (s + 1) * d)))
      }.toDF("vid", "s", "sv")
  }

  private def l2(a: String, b: String) =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), 0d, (acc, e) -> acc + e)")

  /** Assign every (vid, s) row to its nearest centroid of subspace `s`:
    * `(vid, s, sv, cluster)`. Codebook is broadcast; argmin is an agg.
    */
  private def assign(sub: DataFrame, cents: DataFrame): DataFrame =
    sub.join(broadcast(cents), Seq("s"))
      .withColumn("_d", l2("sv", "cent"))
      .groupBy(col("vid"), col("s"))
      .agg(min(struct(col("_d").as("d"), col("cluster").as("c"),
        col("sv").as("sv"))).as("_best"))
      .select(col("vid"), col("s"), col("_best.sv").as("sv"),
        col("_best.c").as("cluster"))

  /** Fit the per-subspace codebooks and return the final assignments:
    * `(vid, s, cluster)` plus the codebook `(s, cluster, cent)` — the PQ
    * code of vector `vid` is the `numSub`-tuple of its cluster ids.
    */
  def fit(emb: DataFrame, idCol: String, vecCol: String,
          numSub: Int, k: Int, iters: Int): (DataFrame, DataFrame) = {
    val sub = subvectors(emb, idCol, vecCol, numSub).localCheckpoint(false) // lazy (r13)
    // Seed = the k SMALLEST vector ids, renumbered 0..k-1 — exactly k
    // centroids per subspace whatever the id space looks like (a
    // `vid < k` filter would silently under-seed sparse or non-zero-based
    // ids). orderBy+limit is a TakeOrdered (no full sort); the global
    // row_number window runs over those k rows only.
    val seeds = sub.select(col("vid")).distinct().orderBy(col("vid")).limit(k)
      .withColumn("cluster", row_number().over(Window.orderBy(col("vid"))) - 1)
    var cents = sub.join(broadcast(seeds), Seq("vid"))
      .select(col("s"), col("cluster").cast("long").as("cluster"), col("sv").as("cent"))
    (1 to iters).foreach { _ =>
      val assigned = assign(sub, cents)
      cents = assigned
        .select(col("s"), col("cluster"), posexplode(col("sv")).as(Seq("i", "x")))
        .groupBy(col("s"), col("cluster"), col("i"))
        .agg(round(avg(col("x")), 6).as("m")) // 6dp contract: SQL replays
        .groupBy(col("s"), col("cluster"))
        .agg(expr("transform(array_sort(collect_list(struct(i, m))), t -> t.m)").as("cent"))
        .localCheckpoint(false) // lazy (r13): fixed rounds, no probe
    }
    val codes = assign(sub, cents).select(col("vid"), col("s"), col("cluster"))
    (codes, cents)
  }
}
