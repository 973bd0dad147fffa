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
    // NB: Spark's sequence(1, 0) yields the DESCENDING [1, 0], not an empty
    // list — texts shorter than n must short-circuit to array() or they get
    // phantom grams (and diverge from the oracle's empty generate_series)
    array_distinct(expr(
      s"""CASE WHEN length($textCol) >= $n
         |     THEN transform(sequence(1, length($textCol) - ${n - 1}), i -> substring($textCol, i, $n))
         |     ELSE array() END""".stripMargin))

  /** Pairwise jaccard within `groupCol`, threshold + sorted output.
    *
    * Two scale levers (both semantics-preserving):
    *  - the gram arrays are persisted once, so the self-join doesn't
    *    recompute the n-gram extraction for each side;
    *  - a size-ratio prefilter runs BEFORE the O(|A|+|B|) intersection:
    *    jaccard ≤ min(|A|,|B|)/max(|A|,|B|), so pairs whose cardinality
    *    ratio is already below the threshold never pay for intersect.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   groupCol: String, n: Int, minJaccard: Double): DataFrame = {
    // intersect on SORTED 64-bit gram hashes, not strings: |A∩B| is
    // identical (distinct-set hashing; collision odds ~|A||B|/2^64), and
    // the per-pair work becomes a codegen'd O(n+m) merge walk
    // (SortedIntersectSize) instead of a per-row hash set — sorting happens
    // once per DOCUMENT, the merge once per PAIR.
    val grams = docs.select(
      col(idCol).as("doc_id"), col(groupCol).as("grp"),
      charNgrams(textCol, n).as("gs"))
      .withColumn("g", expr("array_sort(transform(gs, x -> xxhash64(x)))")).drop("gs")
      .withColumn("sz", size(col("g")))
      .persist()
    val a = grams.select(col("grp"), col("doc_id").as("doc_a"), col("g").as("g_a"), col("sz").as("sz_a"))
    val b = grams.select(col("grp"), col("doc_id").as("doc_b"), col("g").as("g_b"), col("sz").as("sz_b"))
    val pairs = a.join(b, Seq("grp"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(least(col("sz_a"), col("sz_b")).cast("double") /
        greatest(col("sz_a"), col("sz_b")) >= minJaccard)
      .withColumn("inter",
        org.apache.spark.sql.graftx.SortedIntersectSize.asColumn(col("g_a"), col("g_b")).cast("double"))
      .withColumn("jaccard", col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("grp"), col("doc_a"), col("doc_b"), col("jaccard"))
      .localCheckpoint(true) // materialize small output, free the gram cache
    grams.unpersist()
    pairs
  }
}
