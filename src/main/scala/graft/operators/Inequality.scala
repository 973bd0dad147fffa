package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inequality panel per slice — Theil index T, Atkinson A(ε=1), and the
  * Hoover/Robin-Hood index — completing the concentration family the
  * Gini (q202) and HHI (q251) started: "how unevenly is length/compute
  * distributed inside each source", each index weighting a different
  * part of the distribution (Theil top-sensitive, Atkinson
  * bottom-sensitive, Hoover the mass to move).
  *
  * Scale shape: per-slice sufficient statistics reduce to the
  * distinct-value grid (t, v counts — integers); μ is one rational; the
  * three ln/abs folds run on the per-slice ordered value grid (bounded
  * by the value domain, the q202 discipline). Zero/negative values are
  * excluded (the indices are defined on positive support) and reported.
  */
object Inequality {

  /** One row per group: `n`, `mean` (6 dp), `theil`, `atkinson_1`,
    * `hoover` (6 dp each, sign-pinned — perfectly equal slices cancel
    * to exact zero).
    */
  def panel(df: DataFrame, grpCol: String, valCol: String): DataFrame = {
    val d = df.select(col(grpCol).as("g"), col(valCol).cast("long").as("v"))
      .filter(col("v") > 0)
    val cells = d.groupBy(col("g"), col("v")).agg(count(lit(1)).as("t"))
    graft.core.GridGuard.check(cells, "Inequality.panel",
      s"(group, value) grid of '$grpCol' x '$valCol'")
    val tot = cells.groupBy(col("g"))
      .agg(sum(col("t")).as("n"), sum(col("t") * col("v")).as("sx"))
    val gw = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val acc = cells.join(tot, Seq("g"))
      .withColumn("mu", col("sx").cast("double") / col("n"))
      .withColumn("theil_acc", sum(
        col("t") * (col("v") / col("mu")) * log(col("v") / col("mu"))).over(gw))
      .withColumn("ln_acc", sum(
        col("t") * log(col("v").cast("double"))).over(gw))
      .withColumn("abs_acc", sum(
        col("t") * abs(col("v") - col("mu"))).over(gw))
    acc.withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").desc)))
      .filter(col("rn") === 1)
      .select(col("g").as(grpCol), col("n"),
        round(col("mu"), 6).as("mean"),
        round(col("theil_acc") / col("n"), 6) + lit(0.0) as "theil",
        round(lit(1.0) - exp(col("ln_acc") / col("n")) / col("mu"), 6)
          + lit(0.0) as "atkinson_1",
        round(col("abs_acc") / (lit(2.0) * col("sx")), 6)
          + lit(0.0) as "hoover")
  }
}
