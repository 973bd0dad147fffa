package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bayesian A/B read of a binary metric: Beta(1,1) priors, posterior
  * P(p₁ > p₀) and the posterior means/lift — the decision-ready
  * companion to the frequentist battery (q190 z-test, q212 Wilson,
  * q245 power): "what's the probability B actually beats A", which is
  * the question the z-test's p-value is routinely mistaken for.
  *
  * Exactness contract: the posterior probability is evaluated by
  * MIDPOINT GRID INTEGRATION on a fixed 512-point p-grid (documented
  * convention: the cross-CDF uses the strictly-preceding cumulative,
  * exclusive of the current cell). Log-weights k·ln p + (n−k)·ln(1−p)
  * are centred on their grid max so exp never overflows (the q275
  * discipline); every fold runs on the single-partition ordered grid —
  * metadata-sized, deterministic on both engines. The sufficient
  * statistics (n, k per arm) are exact integers at any corpus scale;
  * the grid never grows.
  */
object BayesAb {

  /** One row: `n0 k0 n1 k1`, posterior `mean0`/`mean1`/`lift`, and
    * `p_beats` = P(p₁ > p₀ | data) (6 dp). */
  def betaBinomial(df: DataFrame, variantCol: String, hitCol: String,
                   gridPoints: Int = 512): DataFrame = {
    val tot = df.select(col(variantCol).cast("long").as("g"),
        col(hitCol).cast("long").as("y"))
      .agg(
        sum(when(col("g") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("g") === 0, col("y")).otherwise(0L)).as("k0"),
        sum(when(col("g") =!= 0, 1L).otherwise(0L)).as("n1"),
        sum(when(col("g") =!= 0, col("y")).otherwise(0L)).as("k1"))
    val grid = tot.select(col("n0"), col("k0"), col("n1"), col("k1"),
        explode(sequence(lit(1), lit(gridPoints))).as("j"))
      .withColumn("p", (col("j").cast("double") - 0.5) / gridPoints)
      .withColumn("lw0", col("k0") * log(col("p"))
        + (col("n0") - col("k0")) * log(lit(1.0) - col("p")))
      .withColumn("lw1", col("k1") * log(col("p"))
        + (col("n1") - col("k1")) * log(lit(1.0) - col("p")))
    val center = grid.agg(max(col("lw0")).as("m0"), max(col("lw1")).as("m1"))
    val w = Window.orderBy(col("j"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val acc = grid.crossJoin(broadcast(center))
      .withColumn("w0", exp(col("lw0") - col("m0")))
      .withColumn("w1", exp(col("lw1") - col("m1")))
      .withColumn("s0", sum(col("w0")).over(w))
      .withColumn("s1", sum(col("w1")).over(w))
      // P(p1 > p0) numerator: Σ_j w1_j · W0(< p_j)  (exclusive cum)
      .withColumn("num", sum(col("w1") * (col("s0") - col("w0"))).over(w))
    acc.orderBy(col("j").desc).limit(1)
      .select(col("n0"), col("k0"), col("n1"), col("k1"),
        round((col("k0") + 1).cast("double") / (col("n0") + 2), 6).as("mean0"),
        round((col("k1") + 1).cast("double") / (col("n1") + 2), 6).as("mean1"),
        round((col("k1") + 1).cast("double") / (col("n1") + 2)
          - (col("k0") + 1).cast("double") / (col("n0") + 2), 6)
          + lit(0.0) as "lift",
        round(col("num") / (col("s0") * col("s1")), 6).as("p_beats"))
  }
}
