package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-class precision / recall / F1 from (actual, predicted) label pairs
  * — the evaluation layer over any labeled classifier output (the q25
  * confusion grid reports raw counts; this derives the standard metrics).
  *
  * The class axis is the UNION of actual and predicted labels, so a class
  * the model never predicts (recall but no precision) and a spurious
  * predicted class like 'unknown' (precision but no recall) both appear
  * with null for the undefined metric instead of silently vanishing.
  *
  * All three metrics are single divisions of integer sums — F1 uses the
  * harmonic identity F1 = 2·TP / (pred + actual), so no float chain
  * crosses engines. Shuffles: one partial agg to the confusion grid
  * (classes² rows at most), everything downstream is grid-sized.
  */
object ClassifierEval {

  /** Threshold-free ranking eval of an integer SCORE against a 0/1
    * label: average precision (the area under the step PR curve,
    * evaluated at the distinct-score thresholds — the documented tie
    * convention) plus the best achievable F1 and the score cut that
    * achieves it. Where [[perClass]] grades ONE chosen threshold, this
    * grades the score itself — the committee view before a filter
    * threshold gets frozen.
    *
    * All sufficient statistics are integer cumsums on the ordered
    * distinct-score grid; the AP fold runs on the same ordered grid;
    * F1 = 2·TP/(n_pred + n_pos) is a single integer ratio per row, so
    * max/argmax compare identical doubles on both engines (argmax ties
    * break to the highest score).
    */
  def averagePrecision(df: DataFrame, scoreCol: String,
                       labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = df.select(col(scoreCol).cast("long").as("score"),
      col(labelCol).cast("long").as("y"))
    val cells = d.groupBy(col("score"))
      .agg(sum(col("y")).as("pos"), count(lit(1)).as("tot"))
    val w = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val g = cells
      .withColumn("tp", sum(col("pos")).over(w))
      .withColumn("np", sum(col("tot")).over(w))
    val tot = g.agg(max(col("tp")).as("p_tot"), max(col("np")).as("n"))
    val acc = g.crossJoin(broadcast(tot))
      .withColumn("f1", round(lit(2.0) * col("tp")
        / (col("np") + col("p_tot")), 6))
      .withColumn("apacc", sum(
        col("pos") * (col("tp").cast("double") / col("np"))).over(w))
    val best = acc.agg(max(col("f1")).as("best_f1"))
    val bestAt = acc.crossJoin(broadcast(best))
      .filter(col("f1") === col("best_f1"))
      .agg(max(col("score")).as("best_f1_score"), max(col("best_f1")).as("best_f1"))
    acc.orderBy(col("score").asc).limit(1)
      .crossJoin(broadcast(bestAt))
      .select(col("n"), col("p_tot").as("n_pos"),
        when(col("p_tot") > 0,
          round(col("apacc") / col("p_tot"), 6)).as("ap"),
        col("best_f1"), col("best_f1_score"))
  }

  def perClass(df: DataFrame, actualCol: String, predCol: String): DataFrame = {
    val grid = df
      .groupBy(col(actualCol).as("cls_a"), col(predCol).as("cls_p"))
      .agg(count(lit(1)).as("n"))
    val actual = grid.groupBy(col("cls_a").as("cls")).agg(sum(col("n")).as("n_actual"))
    val pred = grid.groupBy(col("cls_p").as("cls")).agg(sum(col("n")).as("n_pred"))
    val tp = grid.filter(col("cls_a") === col("cls_p"))
      .select(col("cls_a").as("cls"), col("n").as("tp"))

    actual.join(pred, Seq("cls"), "full_outer")
      .join(tp, Seq("cls"), "left_outer")
      .na.fill(0L, Seq("n_actual", "n_pred", "tp"))
      .select(
        col("cls"), col("n_actual"), col("n_pred"), col("tp"),
        when(col("n_pred") > 0,
          round(col("tp").cast("double") / col("n_pred"), 6)).as("precision"),
        when(col("n_actual") > 0,
          round(col("tp").cast("double") / col("n_actual"), 6)).as("recall"),
        when(col("n_pred") + col("n_actual") > 0,
          round(lit(2.0) * col("tp") / (col("n_pred") + col("n_actual")), 6))
          .as("f1"))
  }
}
