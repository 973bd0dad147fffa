package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EQUI-WIDTH HISTOGRAM QUANTILE SKETCH (b = 64 bins) — the mergeable
  * O(b) quantile structure for rollups and streams, completing the
  * sketch family (HLL q96 = distinct, CMS q99 = frequency, this =
  * distribution). Where [[Quantiles.exactQuantiles]] needs the full
  * distinct-value distribution, the sketch keeps 64 integers per key:
  * counts merge by addition across shards/days, and a quantile estimate
  * is off by at most one bin width — the classic accuracy/state trade
  * every monitoring pipeline makes.
  *
  * All arithmetic is integer (the ZOrder bucket formula at 6 bits), so
  * the DuckDB oracle replays bins AND estimates bit-for-bit.
  *
  * Scale shape: per-key min/max is one partial agg broadcast back; bin
  * assignment is a codegen map; counts partial-aggregate on (key, bin).
  * The estimate walks ≤ b rows per key — the window in [[estimate]]
  * partitions by key over AT MOST 64 rows, so there is no skew surface
  * regardless of row counts.
  */
object HistSketch {

  val B = 64

  /** Per-key bin counts `(key, bin, cnt)` plus the key's value range —
    * `(key, xmin, xmax, n)` rides along for edge reconstruction.
    */
  def bins(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val x = col(valCol).cast("long")
    val ranges = df.groupBy(col(keyCol).as("_k"))
      .agg(min(col(valCol)).cast("long").as("xmin"),
        max(col(valCol)).cast("long").as("xmax"))
    val d = (x - col("xmin")) * lit(B.toLong)
    val s = col("xmax") - col("xmin") + lit(1L)
    df.join(broadcast(ranges), col(keyCol) === col("_k"))
      // SQL `div` = pure long division: exact for any span (a double
      // quotient would truncate once the dividend passes 2^53)
      .withColumn("bin", call_function("div", d, s))
      .groupBy(col(keyCol), col("xmin"), col("xmax"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge bin tables from shard-level sketches over the SAME value
    * range (rollup case: ranges were computed globally, counts built per
    * shard). Cell-wise sum.
    */
  def merge(keyCol: String, tables: DataFrame*): DataFrame =
    tables.reduce(_ unionByName _)
      .groupBy(col(keyCol), col("xmin"), col("xmax"), col("bin"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Quantile estimates per key: for each `(name, q)` the LOWER EDGE of
    * the first bin whose cumulative count reaches ceil(q·n) — within one
    * bin width of the exact discrete quantile by construction.
    */
  def estimate(binTable: DataFrame, keyCol: String,
               qs: Seq[(String, Double)]): DataFrame = {
    val byBin = Window.partitionBy(col(keyCol)).orderBy(col("bin")) // ≤ b rows/key
    val whole = Window.partitionBy(col(keyCol))
    val cum = binTable
      .withColumn("_cum", sum(col("cnt")).over(byBin))
      .withColumn("_n", sum(col("cnt")).over(whole))
    // lower edge of bin k = xmin + ceil(k * (span + 1) / B) rounded down:
    // integer arithmetic mirroring the bin assignment's division
    val s = col("xmax") - col("xmin") + lit(1L)
    val e = col("bin") * s
    val edge = col("xmin") + call_function("div", e, lit(B.toLong))
    val aggs = qs.map { case (name, q) =>
      min(when(col("_cum") >= ceil(lit(q) * col("_n")), edge)).as(name)
    }
    cum.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }
}
