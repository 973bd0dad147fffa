package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (MORTON) LAYOUT — multi-dimensional data clustering for
  * scan pruning, the technique behind Delta Lake's `OPTIMIZE ZORDER BY`
  * and the classic Morton curve (Morton 1966). Interleaving the bits of
  * two range-bucketed columns gives a single sort key whose consecutive
  * runs cover TIGHT RECTANGLES in (x, y) space: a file holding one run
  * carries narrow min/max footer stats on BOTH columns, so a predicate
  * on either dimension prunes files — impossible with a single-column
  * sort, where the second column's stats span everything.
  *
  * All arithmetic is integer and closed-form from the per-column
  * min/max, so the DuckDB oracle replays z-values bit-for-bit.
  *
  * Scale shape: the min/max pass is one partial agg; bucketing +
  * interleaving is a pure codegen map (shift/and/or only); the layout
  * write is `repartitionByRange(z)` + `sortWithinPartitions(z)` — one
  * range shuffle, balanced by Spark's range sampler, no skew (z-values
  * are near-unique). With 2^b buckets per dim and files of 4^k
  * consecutive z-values, every file spans ≤ 2^k of the 2^b buckets in
  * EACH dimension.
  */
object ZOrder {

  val Bits = 8 // buckets per dimension = 256

  /** Range-bucket a non-negative long column into [0, 2^Bits) given its
    * min/max — integer division (x - min) * 2^Bits div (span + 1) via
    * SQL `div`, which stays in LONG arithmetic end to end. (The earlier
    * (d - d % s) / s form went through double division, whose ≤ 2^53
    * mantissa truncates the dividend for spans above 2^45 — e.g. a year
    * of epoch-micros — and could disagree with an exact integer replay.)
    */
  def bucket(x: Column, minV: Column, maxV: Column): Column = {
    val d = (x - minV) * lit(1L << Bits)
    val s = maxV - minV + lit(1L)
    call_function("div", d, s)
  }

  /** Interleave two bucketed columns' bits: x in even positions, y in
    * odd. Pure shift/and/or — whole-stage codegen keeps it in the scan.
    */
  def zvalue(xb: Column, yb: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftright(xb, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yb, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Physically cluster `df` by the z-value: one range shuffle into
    * `nFiles` output splits, sorted within each so parquet row-group
    * stats stay tight inside a file too.
    */
  def layout(df: DataFrame, zCol: String, nFiles: Int): DataFrame =
    df.repartitionByRange(nFiles, col(zCol)).sortWithinPartitions(col(zCol))

  /** The SQL replay of [[zvalue]] over columns named `xb`/`yb` — the
    * oracle embeds this so the interleave formula lives in ONE place.
    */
  def zvalueSql: String =
    (0 until Bits).map { i =>
      s"(((xb >> $i) & 1) << ${2 * i}) + (((yb >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
}
