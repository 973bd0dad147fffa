package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Zipf rank-frequency fit: OLS of ln(freq) on ln(rank) over the top-R
  * token types — the third member of the corpus-law family (Heaps
  * q176 vocabulary growth, Hill q163 tail index). A healthy natural
  * corpus fits slope ≈ −1; template/boilerplate floods flatten the
  * head and machine-generated spam steepens it, so the slope is a
  * cheap one-number corpus-health probe at any scale.
  *
  * Scale shape: ONE token-count agg (map-side combined), a top-R
  * rank cut (freq desc, token asc tiebreak — a WindowGroupLimit, not
  * a full sort), then every OLS sum folds on the ordered ≤R-row rank
  * grid: bounded operand count, deterministic float fold on both
  * engines.
  */
object ZipfLaw {

  /** One row: `n_types` (corpus distinct types), `n_top` (grid rows
    * actually fit), `slope`, `intercept` (both 6 dp, sign-pinned).
    */
  def fit(docs: DataFrame, textCol: String, topR: Int): DataFrame = {
    val counts = docs
      .select(explode(graft.search.Bm25.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("f"))
    val types = counts.agg(count(lit(1)).as("n_types"))
    val ranked = counts
      .withColumn("rank", row_number().over(
        Window.orderBy(col("f").desc, col("token").asc)))
      .filter(col("rank") <= topR)
      .select(col("rank").cast("long").as("rank"), col("f"))
    val w = Window.orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val acc = ranked
      .withColumn("x", log(col("rank").cast("double")))
      .withColumn("y", log(col("f").cast("double")))
      .withColumn("m", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
    acc.orderBy(col("rank").desc).limit(1)
      .crossJoin(broadcast(types))
      .select(col("n_types"), col("m").as("n_top"),
        // a 1-row grid (or all-equal ranks — impossible, ranks are
        // distinct) would zero the variance; guard anyway
        when(col("m") * col("sxx") - col("sx") * col("sx") > 0,
          round((col("m") * col("sxy") - col("sx") * col("sy"))
            / (col("m") * col("sxx") - col("sx") * col("sx")), 6)
            + lit(0.0)).as("slope"),
        when(col("m") * col("sxx") - col("sx") * col("sx") > 0,
          round((col("sy") - (col("m") * col("sxy") - col("sx") * col("sy"))
              / (col("m") * col("sxx") - col("sx") * col("sx")) * col("sx"))
            / col("m"), 6) + lit(0.0)).as("intercept"))
  }
}
