package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gini coefficient + Lorenz bottom-half share per group — the
  * inequality/concentration measure for "is this source's mass carried
  * by a few giant documents" (complements the q165 top-N concentration
  * curve with the standard single-number summary economists use).
  *
  * Exact under ties via the distinct-value grid: the rank-sum of a tie
  * group of `c` items after `a` predecessors is `c·a + c(c+1)/2` —
  * integer arithmetic end-to-end (the q118/q159 grid discipline), with
  * the two Gini/Lorenz divisions happening once per GROUP at the edge.
  */
object Gini {

  /** Per `groupCol`: item count, total mass, Gini `2S/(nT) − (n+1)/n`
    * (6 dp), and the exact share of mass held by the bottom half of
    * items (6 dp). Values must be non-negative integers.
    */
  def coefficient(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val grid = df.groupBy(col(groupCol), col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val byV = Window.partitionBy(col(groupCol)).orderBy(col("v"))
    val ranked = grid
      .withColumn("cumBefore", coalesce(sum(col("c")).over(
        byV.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // rank-sum of the tie group: ranks cumBefore+1 .. cumBefore+c
      .withColumn("rsum",
        col("c") * col("cumBefore") + expr("c * (c + 1) div 2"))
    val agg = ranked.groupBy(col(groupCol))
      .agg(sum(col("c")).as("n"),
        sum(col("c") * col("v")).as("t"),
        sum(col("v") * col("rsum")).as("s"))
    // bottom-half mass needs n, known only after the agg: join it back
    // onto the grid and clamp each tie group to the ranks <= n/2
    val half = ranked
      .join(agg.select(col(groupCol), col("n")), groupCol :: Nil)
      .withColumn("inHalf",
        greatest(lit(0L), least(col("c"),
          expr("n div 2") - col("cumBefore"))))
      .groupBy(col(groupCol))
      .agg(sum(col("inHalf") * col("v")).as("bh"))
    agg
      .join(half, groupCol :: Nil)
      .select(col(groupCol), col("n").as("n_items"), col("t").as("total"),
        when(col("t") > 0 && col("n") > 0,
          round(lit(2.0) * col("s") / (col("n").cast("double") * col("t"))
            - (col("n") + 1).cast("double") / col("n"), 6)).as("gini"),
        when(col("t") > 0,
          round(col("bh").cast("double") / col("t"), 6)).as("bottom_half_share"))
  }
}
