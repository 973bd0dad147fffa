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
