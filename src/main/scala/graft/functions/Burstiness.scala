package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Term burstiness via the variance-to-mean ratio (Church & Gale 1995's
  * observation that content words are "bursty" — Poisson would give
  * VMR = 1, real terms clump): over per-document counts INCLUDING the
  * zero-count documents,
  *
  *   VMR = var/mean = E[x²]/μ − μ = Q/S − S/D
  *
  * where S = Σc, Q = Σc², D = total docs — so the whole statistic is
  * three integer sufficient stats and two exact divisions; the zeros
  * never materialize. High-VMR terms are topical (a few docs use them
  * heavily); VMR ≈ 1 terms are function-word background — the signal
  * separating "keyword" from "stopword" beyond raw frequency.
  *
  * One (doc, term) partial agg, one term-level rollup; the top-K ranking
  * window runs over the vocab-sized count table (q165's discipline).
  */
object Burstiness {

  /** Top-K terms by total count with their burstiness. Output: `w`,
    * `total` (S), `df` (docs containing), `mean` (S/D, 6dp), `vmr` (6dp).
    */
  def report(docs: DataFrame, idCol: String, tokens: Column,
             topK: Int = 20): DataFrame = {
    val perDoc = docs.select(col(idCol).as("_id"), explode(tokens).as("w"))
      .groupBy(col("_id"), col("w")).agg(count(lit(1)).as("c"))
    val nDocs = docs.agg(count(lit(1)).as("d"))
    val terms = perDoc.groupBy(col("w"))
      .agg(sum(col("c")).as("total"),
        count(lit(1)).as("df"),
        sum(col("c") * col("c")).as("q"))
    val ranked = terms.withColumn("rk",
      row_number().over(Window.orderBy(col("total").desc, col("w"))))
    ranked.filter(col("rk") <= topK)
      .crossJoin(broadcast(nDocs))
      .select(col("w"), col("total"), col("df"),
        round(col("total").cast("double") / col("d"), 6).as("mean"),
        round(col("q").cast("double") / col("total") -
          col("total").cast("double") / col("d"), 6).as("vmr"))
  }
}
