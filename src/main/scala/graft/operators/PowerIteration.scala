package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Leading principal component of an embedding corpus via unrolled power
  * iteration — the direction "all-but-the-top" post-processing removes
  * before similarity search (Mu & Viswanath 2018) and the first step of
  * any whitening pipeline.
  *
  * Scale story: the ONLY corpus-sized work is the covariance sufficient
  * statistics — d² cells built IN-ROW (two chained posexplodes, the q214
  * shape, here without the i<j cut because the full symmetric matrix is
  * needed) collapsing in one bounded (i, j) partial agg. Every
  * iteration after that is a d²-row × d-row broadcast join + a d-row agg
  * — nothing touches the corpus again, and d is a constant (64), not a
  * scale axis. Iterations are UNROLLED (fixed count, the q67 PageRank
  * discipline) so the oracle replays them CTE-for-CTE.
  */
object PowerIteration {

  /** Returns one row per dimension: (dim 1-based, v — the unit leading
    * eigenvector after `iters` power steps from the uniform start, and
    * lambda — the Rayleigh quotient after the final step). Sign is
    * normalized so the lexicographically-first nonzero-ish rule is
    * simple: the component of dim 1 is made ≥ 0 (both engines apply the
    * same rule to the same rounded vector).
    */
  def leadingComponent(spark: SparkSession, emb: DataFrame, vecCol: String,
                       iters: Int = 3): DataFrame = {
    val v0 = emb.select(col(vecCol).cast("array<double>").as("v"))
    val cells = v0
      .select(col("v"), posexplode(col("v")).as(Seq("i", "xi")))
      .select(col("i"), col("xi"), posexplode(col("v")).as(Seq("j", "xj")))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"), sum(col("xi")).as("si"),
        sum(col("xj")).as("sj"), sum(col("xi") * col("xj")).as("sij"))
      // covariance C_ij = E[xy] − E[x]E[y]
      .select(col("i"), col("j"),
        (col("sij") / col("n")
          - (col("si") / col("n")) * (col("sj") / col("n"))).as("c"))
      .localCheckpoint(false) // d² rows; iterations must not re-run the corpus agg (lazy r13: the d-probe head() below materializes it)
    val d = cells.agg(max(col("i")).cast("int")).head().getInt(0) + 1
    val start = spark.range(d).select(col("id").cast("int").as("j"),
      lit(1.0 / math.sqrt(d.toDouble)).as("vj"))
    val vFinal = (1 to iters).foldLeft(start) { (v, _) =>
      val w = cells.join(broadcast(v), Seq("j"))
        .groupBy(col("i")).agg(sum(col("c") * col("vj")).as("wi"))
      val norm = w.agg(sqrt(sum(col("wi") * col("wi"))).as("nrm"))
      w.crossJoin(broadcast(norm))
        .select(col("i").as("j"), (col("wi") / col("nrm")).as("vj"))
    }
    // Rayleigh quotient λ = vᵀCv (v is unit)
    val lam = cells.join(broadcast(vFinal.select(col("j"), col("vj"))), Seq("j"))
      .join(broadcast(vFinal.select(col("j").as("i"), col("vj").as("vi"))), Seq("i"))
      .agg(sum(col("c") * col("vi") * col("vj")).as("lambda"))
    val sign = vFinal.filter(col("j") === 0)
      .select(when(col("vj") < 0, lit(-1.0)).otherwise(lit(1.0)).as("sgn"))
    vFinal.crossJoin(broadcast(sign)).crossJoin(broadcast(lam))
      .select((col("j") + 1).cast("long").as("dim"),
        // `+ 0.0` pins a cancellation-zero component to +0.0 (q176 class)
        (round(col("vj") * col("sgn"), 6) + lit(0.0)).as("v"),
        (round(col("lambda"), 6) + lit(0.0)).as("lambda"))
      .orderBy(col("dim"))
  }
}
