package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample energy distance (Székely & Rizzo 2004) on an integer-valued
  * scalar: D² = 2·E|X−Y| − E|X−X'| − E|Y−Y'| — zero iff the distributions
  * match, the drift statistic that sees location AND shape changes the
  * KS sup-gap can miss in the tails.
  *
  * Scale story: the naive statistic is three O(n²) pairwise sums; this
  * implementation computes each EXACTLY in O(grid) from the distinct-value
  * grid via the adjacent-gap identity Σᵢ<ⱼ|vᵢ−vⱼ| = Σₜ gapₜ·Nₗ(t)·Nᵣ(t)
  * (every pair straddling a gap contributes that gap once). One scan →
  * one (value)-keyed partial agg with per-group counts → one ordered
  * window over the bounded grid. The cross-sum falls out as
  * S_XY = S_combined − S_XX − S_YY, so no second pass. All sums are
  * INTEGER (values and counts are longs); the three divisions and the
  * final D² happen once at the output edge.
  */
object EnergyDistance {

  /** `df` carries an integer-valued `valueCol` and a boolean `inX`
    * grouping expression. Output one row: n_x, n_y, the three integer
    * pairwise sums, and e_xy/e_xx/e_yy/d2 rounded at 6dp.
    */
  def twoSample(df: DataFrame, valueCol: String,
                inX: org.apache.spark.sql.Column): DataFrame = {
    val grid = df
      .select(col(valueCol).cast("long").as("v"),
        when(inX, 1L).otherwise(0L).as("cx"),
        when(inX, 0L).otherwise(1L).as("cy"))
      .groupBy(col("v"))
      .agg(sum(col("cx")).as("cx"), sum(col("cy")).as("cy"))
    val ord = Window.orderBy(col("v"))
    val cumW = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allW = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // cumulative counts AT OR BELOW each grid value + group totals
    val cum = grid
      .withColumn("lx", sum(col("cx")).over(cumW))
      .withColumn("ly", sum(col("cy")).over(cumW))
      .withColumn("nx", sum(col("cx")).over(allW))
      .withColumn("ny", sum(col("cy")).over(allW))
      .withColumn("gap", lead(col("v"), 1).over(ord) - col("v"))
      .filter(col("gap").isNotNull)
    // every pair straddling gap t contributes gap_t once: Nleft * Nright
    val sums = cum.agg(
      max(col("nx")).as("n_x"), max(col("ny")).as("n_y"),
      sum(col("gap") * col("lx") * (col("nx") - col("lx"))).as("s_xx"),
      sum(col("gap") * col("ly") * (col("ny") - col("ly"))).as("s_yy"),
      sum(col("gap") * (col("lx") + col("ly"))
        * (col("nx") + col("ny") - col("lx") - col("ly"))).as("s_comb"))
    sums
      .withColumn("s_xy", col("s_comb") - col("s_xx") - col("s_yy"))
      .select(col("n_x"), col("n_y"), col("s_xx"), col("s_yy"), col("s_xy"),
        round(col("s_xy").cast("double") / (col("n_x") * col("n_y")), 6)
          .as("e_xy"),
        round(lit(2.0) * col("s_xx") / (col("n_x") * col("n_x")), 6)
          .as("e_xx"),
        round(lit(2.0) * col("s_yy") / (col("n_y") * col("n_y")), 6)
          .as("e_yy"),
        round(lit(2.0) * col("s_xy") / (col("n_x") * col("n_y"))
          - lit(2.0) * col("s_xx") / (col("n_x") * col("n_x"))
          - lit(2.0) * col("s_yy") / (col("n_y") * col("n_y")), 6).as("d2"))
  }

  /** Cliff's delta ordinal effect size (Cliff 1993): δ = (#(x>y) −
    * #(x<y)) / (n_x·n_y), the assumption-free "how often does X beat Y"
    * companion to Mann-Whitney. Same distinct-value-grid machinery as
    * [[twoSample]]: per grid value v, #(x>v) = n_x − cum_x(≤v) and
    * #(x<v) = cum_x(≤v) − c_x(v), each weighted by c_y(v) — INTEGER
    * throughout, one division at the edge.
    */
  def cliffsDelta(df: DataFrame, valueCol: String,
                  inX: org.apache.spark.sql.Column): DataFrame = {
    val grid = df
      .select(col(valueCol).cast("long").as("v"),
        when(inX, 1L).otherwise(0L).as("cx"),
        when(inX, 0L).otherwise(1L).as("cy"))
      .groupBy(col("v"))
      .agg(sum(col("cx")).as("cx"), sum(col("cy")).as("cy"))
    val ord = Window.orderBy(col("v"))
    val cumW = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allW = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    grid
      .withColumn("lx", sum(col("cx")).over(cumW))
      .withColumn("nx", sum(col("cx")).over(allW))
      .withColumn("ny", sum(col("cy")).over(allW))
      .agg(max(col("nx")).as("n_x"), max(col("ny")).as("n_y"),
        sum(col("cy") * (col("nx") - col("lx"))).as("gt"),
        sum(col("cy") * (col("lx") - col("cx"))).as("lt"),
        sum(col("cy") * col("cx")).as("ties"))
      .select(col("n_x"), col("n_y"), col("gt"), col("lt"), col("ties"),
        round((col("gt") - col("lt")).cast("double")
          / (col("n_x") * col("n_y")), 6).as("delta"))
  }
}
