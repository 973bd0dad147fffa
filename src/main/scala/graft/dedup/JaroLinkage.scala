package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftx.JaroWinklerSim

/** Record-linkage pass over blocked sorted neighborhoods scored with the
  * native Jaro-Winkler expression ([[JaroWinklerSim]]) — the
  * Hernández-Stolfo candidate generation of [[SortedNeighbors]] with the
  * census-linkage comparator instead of token Jaccard: right for short
  * name-like fields where transpositions and shared prefixes carry the
  * signal and token sets are too coarse.
  *
  * Scale: identical to SortedNeighbors — ONE window per blocking key
  * (bounded partitions, no global sort), then a partial-agg rollup.
  * The comparator runs inside whole-stage codegen; match counts
  * threshold the ROUNDED score so both engines threshold the same 6-dp
  * value (a raw-double threshold would let a 1-ulp difference flip an
  * integer count).
  */
object JaroLinkage {

  /** Per-block linkage report: record/pair counts, matches at ≥ `tLo`
    * and ≥ `tHi` (on the 6-dp score), and the block's best score.
    */
  def report(df: DataFrame, idCol: String, nameCol: String,
             blockKey: Column, tLo: Double = 0.85, tHi: Double = 0.95): DataFrame = {
    val w = Window.partitionBy(col("block")).orderBy(col(nameCol), col(idCol))
    val scored = df
      .select(col(idCol), blockKey.as("block"), col(nameCol))
      .withColumn("_prev", lag(col(nameCol), 1).over(w))
      .withColumn("jw",
        when(col("_prev").isNotNull,
          round(JaroWinklerSim.asColumn(col(nameCol), col("_prev")), 6)))
    scored.groupBy(col("block"))
      .agg(count(lit(1)).as("n_recs"),
        count(col("jw")).as("n_pairs"),
        sum(when(col("jw") >= tLo, 1L).otherwise(0L)).as("n_match_lo"),
        sum(when(col("jw") >= tHi, 1L).otherwise(0L)).as("n_match_hi"),
        max(col("jw")).as("max_jw"))
  }
}
