package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Information-gain ranking of binary features against a binary label —
  * the "which cheap rule actually predicts quality" audit run before
  * wiring heuristics into a curation funnel (the split criterion of
  * ID3/C4.5, Quinlan 1986).
  *
  * Scale story: each feature reduces to ONE row of four integer
  * confusion counts via conditional sums in a single corpus pass (the
  * features are stacked with a union, so the scan count equals the
  * feature count but each pass is a pure codegen map + partial agg; for
  * a wide feature set, stack columns instead). Every entropy term is
  * computed IN-ROW from those integers in a fixed expression order — no
  * float aggregation across rows anywhere.
  */
object InfoGain {

  /** −(k/n)·ln(k/n) with the k=0 guard; k=n gives −1·ln(1) = 0. */
  private def plp(k: Column, n: Column): Column =
    when(k > 0,
      -(k.cast("double") / n) * log(k.cast("double") / n)).otherwise(lit(0.0))

  /** One row per named feature: the 2×2 integer cells and the
    * information gain of the feature about the label, rounded at 6dp.
    */
  def binaryGain(df: DataFrame, features: Seq[(String, Column)],
                 label: Column): DataFrame = {
    val stacked = features.map { case (name, f) =>
      df.select(lit(name).as("feature"), f.as("f"), label.as("y"))
    }.reduce(_ unionAll _)
    val cells = stacked.groupBy(col("feature")).agg(
      sum(when(col("f") && col("y"), 1L).otherwise(0L)).as("a"),
      sum(when(col("f") && !col("y"), 1L).otherwise(0L)).as("b"),
      sum(when(!col("f") && col("y"), 1L).otherwise(0L)).as("c"),
      sum(when(!col("f") && !col("y"), 1L).otherwise(0L)).as("d"))
    val n = col("a") + col("b") + col("c") + col("d")
    val nf = col("a") + col("b")
    val nn = col("c") + col("d")
    val hy = plp(col("a") + col("c"), n) + plp(col("b") + col("d"), n)
    val hGivenF = when(nf > 0,
      (nf.cast("double") / n) * (plp(col("a"), nf) + plp(col("b"), nf)))
      .otherwise(lit(0.0)) +
      when(nn > 0,
        (nn.cast("double") / n) * (plp(col("c"), nn) + plp(col("d"), nn)))
        .otherwise(lit(0.0))
    cells.select(col("feature"), col("a"), col("b"), col("c"), col("d"),
        round(hy, 6).as("h_label"),
        round(hy - hGivenF, 6).as("info_gain"))
      .orderBy(col("feature"))
  }
}
