package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LSH banding planner — the design tool behind every (bands, rows)
  * choice in the MinHash family (q19/q86): for each feasible (b, r) with
  * b·r ≤ totalPerms, integrate the S-curve p(s) = 1 − (1 − sʳ)ᵇ to score
  * expected false-positive mass below the target Jaccard threshold plus
  * false-negative mass above it (Leskovec-Rajaraman-Ullman ch. 3), and
  * rank the configurations. Run once before committing a layout: at
  * 100 TB the wrong (b, r) is a 10× candidate-volume mistake.
  *
  * Determinism: the integral is a midpoint Riemann sum over a FIXED
  * 100-point grid folded IN-ROW by a HOF (`aggregate`), left-to-right on
  * both engines; the below/above-threshold branch is decided by the
  * INTEGER grid index (s = (k+0.5)/100 < t ⟺ k ≤ ⌈100t⌉−1), so no float
  * comparison ever selects a branch. The (b, r) grid is bounded
  * (≤ 16·64 rows), so the ranking window is too.
  */
object LshPlanner {

  /** One row per feasible (b, r): fp/fn mass and the combined score,
    * ranked ascending (ties broken by b then r). `thresholdPct` is the
    * target Jaccard threshold in integer percent (e.g. 70).
    */
  def plan(spark: SparkSession, totalPerms: Int = 128,
           thresholdPct: Int = 70, topK: Int = 10): DataFrame = {
    val kCut = thresholdPct - 1 // s=(k+0.5)/100 < t ⟺ k ≤ t·100 − 1
    val grid = spark.range(1, 17).select(col("id").as("r"))
      .crossJoin(spark.range(1, 65).select(col("id").as("b")))
      .filter(col("b") * col("r") <= totalPerms)
    def sCurve(k: org.apache.spark.sql.Column) = {
      val s = (k.cast("double") + lit(0.5)) / lit(100.0)
      lit(1.0) - pow(lit(1.0) - pow(s, col("r").cast("double")),
        col("b").cast("double"))
    }
    val scored = grid
      .withColumn("fp_raw", aggregate(sequence(lit(0), lit(99)), lit(0.0),
        (acc, k) => acc + when(k <= kCut, sCurve(k)).otherwise(lit(0.0))))
      .withColumn("fn_raw", aggregate(sequence(lit(0), lit(99)), lit(0.0),
        (acc, k) => acc + when(k > kCut, lit(1.0) - sCurve(k)).otherwise(lit(0.0))))
      .select(col("b"), col("r"), (col("b") * col("r")).as("perms"),
        round(col("fp_raw") / 100.0, 6).as("fp"),
        round(col("fn_raw") / 100.0, 6).as("fn"),
        round((col("fp_raw") + col("fn_raw")) / 100.0, 6).as("score"))
    val w = Window.orderBy(col("score"), col("b"), col("r"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .orderBy(col("rank"))
  }
}
