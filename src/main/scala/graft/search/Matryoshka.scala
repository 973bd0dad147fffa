package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Matryoshka (MRL) truncation-fidelity audit: how much retrieval quality
  * survives when embeddings are truncated to a dim prefix (Kusupati et al.
  * 2022). Two measures per tier d:
  *   - energy: avg over the corpus of ‖v[1..d]‖/‖v‖ (cosine between the
  *     full vector and its zero-padded truncation);
  *   - overlap@k: for a fixed probe set, |top-k under d-dim cosine ∩
  *     top-k under full cosine| — the operational "can we serve ANN from
  *     the prefix" answer that drives index sizing.
  *
  * Determinism: candidates rank by 6dp-ROUNDED cosine with vec_id as the
  * tiebreak, so last-ulp float divergence between engines cannot reorder
  * the cut (the q13/q151-family discipline).
  *
  * Scale shape: the probe set is a handful of vectors folded in as a
  * broadcast cross join (corpus × |probes|·|tiers| rows, a constant
  * fan-out); per-(probe, tier) ranking is TakeOrdered-sized — the window
  * partitions are (probe, tier), never the corpus. Energy is one codegen
  * map pass + partial agg. Nothing shuffles on an unbounded key.
  */
object Matryoshka {

  /** Per-tier fidelity report over `dims` prefixes.
    * Output: dim, avg_energy, avg_overlap (of `k`), min_overlap.
    */
  def fidelity(embeddings: DataFrame, idCol: String, vecCol: String,
               probeIds: Seq[Long], dims: Seq[Int], k: Int): DataFrame = {
    val full = dims.max
    val vecs = embeddings.select(
      col(idCol).cast("long").as("vec_id"),
      col(vecCol).cast("array<double>").as("v"))

    // --- energy: ‖prefix‖/‖full‖ per tier, averaged over the corpus ---
    val ssq = (c: org.apache.spark.sql.Column) =>
      aggregate(c, lit(0.0), (acc, x) => acc + x * x)
    val energy = vecs
      .select(explode(array(dims.map(d =>
        struct(lit(d).as("dim"),
          sqrt(ssq(slice(col("v"), 1, d)) / ssq(col("v"))).as("e"))): _*)).as("s"))
      .select(col("s.dim").as("dim"), col("s.e").as("e"))
      .groupBy(col("dim"))
      .agg(round(avg(col("e")), 6).as("avg_energy"))

    // --- overlap@k: per probe, top-k at tier d vs top-k at full dim ---
    val probes = vecs.filter(col("vec_id").isInCollection(probeIds))
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    val scored = vecs.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("vec_id"), col("probe_id"),
        explode(array(dims.map(d =>
          struct(lit(d).as("dim"),
            round(VectorOps.cosine(slice(col("v"), 1, d), slice(col("pv"), 1, d)), 6)
              .as("cos"))): _*)).as("s"))
      .select(col("vec_id"), col("probe_id"), col("s.dim").as("dim"), col("s.cos").as("cos"))

    val w = Window.partitionBy(col("probe_id"), col("dim"))
      .orderBy(col("cos").desc, col("vec_id"))
    val topk = scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("probe_id", "dim", "vec_id")

    // ≤ |probes|·k rows — broadcast so the overlap check never sort-merges.
    // Count overlaps per top-k MEMBER row and sum per (probe, tier) so a
    // probe with ZERO overlap still yields a row (ov = 0) — a semi-join +
    // count would silently drop it and inflate the average; a tier where
    // every probe misses must report 0, not "no data".
    val fullTop = topk.filter(col("dim") === full)
      .select(col("probe_id"), col("vec_id"), lit(1L).as("hit"))
    val overlap = topk.filter(col("dim") =!= full)
      .join(broadcast(fullTop), Seq("probe_id", "vec_id"), "left")
      .groupBy(col("probe_id"), col("dim"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("ov"))
    val perTier = overlap
      .groupBy(col("dim"))
      .agg(round(avg(col("ov")), 6).as("avg_overlap"),
        min(col("ov")).as("min_overlap"))

    // the left-join coalesce fills ONLY the full tier (excluded above by
    // construction), which trivially overlaps itself at k
    energy.join(broadcast(perTier), Seq("dim"), "left")
      .select(col("dim").cast("long").as("dim"), col("avg_energy"),
        coalesce(col("avg_overlap"), lit(k.toDouble)).as("avg_overlap"),
        coalesce(col("min_overlap"), lit(k.toLong)).as("min_overlap"))
      .orderBy(col("dim"))
  }
}
