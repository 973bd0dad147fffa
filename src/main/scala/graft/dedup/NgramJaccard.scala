package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact character n-gram Jaccard similarity — the precise verifier behind
  * MinHash candidates (and a standalone near-dup scorer for short docs).
  *
  * Scale shape: pairs are generated within a grouping key only (same
  * source/bucket); the n-gram sets live as array columns so the
  * intersection is a per-row `array_intersect`, not an explode-join.
  */
object NgramJaccard {

  /** Distinct character n-grams of the named text column (SQL-expression
    * form: `substring` with a lambda index isn't exposed through the Column
    * API's fixed-position overloads).
    */
  def charNgrams(textCol: String, n: Int): Column =
    array_distinct(expr(
      s"transform(sequence(1, greatest(length($textCol) - ${n - 1}, 0)), i -> substring($textCol, i, $n))"))

  /** Pairwise jaccard within `groupCol`, threshold + sorted output. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   groupCol: String, n: Int, minJaccard: Double): DataFrame = {
    val grams = docs.select(
      col(idCol).as("doc_id"), col(groupCol).as("grp"),
      charNgrams(textCol, n).as("g"))
    val a = grams.select(col("grp"), col("doc_id").as("doc_a"), col("g").as("g_a"))
    val b = grams.select(col("grp"), col("doc_id").as("doc_b"), col("g").as("g_b"))
    a.join(b, Seq("grp"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("inter", size(array_intersect(col("g_a"), col("g_b"))).cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("g_a")) + size(col("g_b")) - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("grp"), col("doc_a"), col("doc_b"), col("jaccard"))
  }
}
