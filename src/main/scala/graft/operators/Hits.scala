package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs & authorities (Kleinberg 1999) — the second eigenvector
  * ranking over the q84 link-graph surface, complementing PageRank
  * (q67): authority = endorsed BY good hubs, hub = points AT good
  * authorities. The iteration is mutual reinforcement: auth ← Σ hub over
  * in-edges, hub ← Σ auth over out-edges, normalized each half-step.
  *
  * All arithmetic is INTEGER: scores live in parts-per-million longs
  * (initial hub = 1e6), each step sums exact longs, and auth
  * renormalizes by integer division to total mass 1e6. No float ever
  * appears, so the DuckDB oracle unrolls the iterations CTE-for-CTE and
  * matches bit-for-bit (the q98/q37 replayable-fit contract, minus even
  * the 6dp rounding — there is nothing to round). The ppm grid loses
  * < 1e-6 of mass per step to floor division, identically in both
  * engines.
  *
  * Scale shape: each half-step is one broadcast-or-shuffle equi-join of
  * the edge table with the |V|-row score table plus one partial-agg
  * groupBy — the same shape as the q67 PageRank loop, one eager
  * checkpoint per iteration. Raw (un-renormalized) hub stays below
  * maxOutDeg·1e6, so the renorm dividend raw·1e6 fits a long while
  * maxOutDeg·maxInDeg < ~9·10^6 — ample for link graphs, and a
  * denser-than-that graph would move the scale factor down, not
  * silently overflow.
  */
object Hits {

  val Scale = 1000000L

  /** `(page, hub_ppm, auth_ppm)` after `iters` full iterations over a
    * `(src, dst)` edge table. Nodes with no in-edges carry auth 0; no
    * out-edges, hub 0.
    */
  def run(edges: DataFrame, iters: Int): DataFrame = {
    // lazy checkpoints (r12): plan truncation is identical, but the fixed
    // 5-iteration loop no longer pays a driver job barrier per half-step —
    // the whole walk materializes in one cascaded action at the sink
    val e = edges.select(col("src"), col("dst")).localCheckpoint(false)
    val nodes = e.select(col("src").as("page"))
      .union(e.select(col("dst").as("page"))).distinct().localCheckpoint(false)

    def renorm(raw: DataFrame, outCol: String): DataFrame = {
      val total = raw.agg(sum(col("raw")).as("_t"))
      nodes.join(raw, Seq("page"), "left")
        .crossJoin(broadcast(total)) // 1 row
        .select(col("page"),
          call_function("div", coalesce(col("raw"), lit(0L)) * Scale, col("_t"))
            .as(outCol))
    }

    // Only AUTH is renormalized inside the loop: normalization is linear,
    // so feeding the RAW hub sums into the next auth step yields the same
    // normalized auth — and costs one global total per iteration instead
    // of two. Raw hub stays ≤ maxOutDeg·1e6 (≤ ~1e10 for a 10k-link
    // page), so the next auth sum fits a long with room to spare. One
    // eager checkpoint per iteration truncates the lineage (the q67
    // PageRank discipline); hub is normalized once at the end.
    var hubRaw = nodes.select(col("page"), lit(Scale).as("raw"))
    var auth: DataFrame = null
    (1 to iters).foreach { _ =>
      // auth is consumed 2-3x (hub step, next renorm total, final join) —
      // the lazy checkpoint caches ONE evaluation of the renorm join
      auth = renorm(
        e.join(hubRaw.withColumnRenamed("page", "src"), Seq("src"))
          .groupBy(col("dst").as("page")).agg(sum(col("raw")).as("raw")),
        "auth_ppm").localCheckpoint(false)
      hubRaw = e.join(auth.withColumnRenamed("page", "dst"), Seq("dst"))
        .groupBy(col("src").as("page")).agg(sum(col("auth_ppm")).as("raw"))
        .localCheckpoint(false)
    }
    renorm(hubRaw, "hub_ppm").join(auth, Seq("page"))
  }
}
