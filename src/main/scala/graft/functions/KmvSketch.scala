package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) DISTINCT-COUNT SKETCH (Bar-Yossef 2002,
  * Beyer 2007) — the third mergeable cardinality structure in the sketch
  * family (HLL q96 trades accuracy for 16 registers; KMV keeps the k
  * smallest distinct hash values and estimates n ≈ (k-1)·M / h_(k), the
  * classic order-statistics argument: k uniform draws on [0, M) space
  * themselves ~M/n apart). Below k distinct values the sketch IS the
  * distinct set, so the estimate is exact — the property HLL lacks and
  * the reason production pipelines keep KMV for the many-small-groups
  * regime. Sketches merge by unioning hash sets and re-truncating to k.
  *
  * The hash is the engine-wide portable md5-31 ([[graft.core.Ids.hash31]];
  * column twin [[Splits.hashBucket]]), so the DuckDB oracle replays every
  * kept hash AND the estimate bit-for-bit — the estimator is a single
  * double division of exact integers, not a parallel float sum.
  *
  * Scale shape: the k-min state lives in a typed [[Aggregator]] whose
  * buffer is a sorted ≤ k long array — partial aggregation (map-side
  * combine) collapses every partition to k longs BEFORE the shuffle, so
  * a group with a billion distinct values ships the same 256 bytes as a
  * group with fifty. No window, no skew surface, no collect.
  */
object KmvSketch {

  val K = 32
  val M = 2147483647L // hash31 range is [0, M)

  /** Bounded-state k-min aggregator: buffer = SORTED DISTINCT array of at
    * most `k` hash values. reduce is a binary-search insert; merge is a
    * sorted-merge truncated at `k` — both O(k), both order-insensitive,
    * which is what makes the result deterministic under Spark's
    * partition-order-free aggregation.
    */
  class MinKAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.emptyLongArray

    def reduce(st: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(st, h)
      if (pos >= 0) st // already kept
      else {
        val ins = -pos - 1
        if (ins >= k) st // not among the k smallest
        else {
          val n = math.min(st.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(st, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(st, ins, out, ins + 1, n - ins - 1)
          out
        }
      }
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val cap = math.min(a.length + b.length, k)
      val out = new Array[Long](cap)
      var i = 0; var j = 0; var n = 0
      while (n < cap && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
          else { val x = b(j); j += 1; x }
        if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
      }
      if (n == cap) out else java.util.Arrays.copyOf(out, n)
    }

    def finish(st: Array[Long]): Array[Long] = st
    def bufferEncoder: ExpressionEncoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: ExpressionEncoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  private val minK = udaf(new MinKAgg(K), org.apache.spark.sql.Encoders.scalaLong)

  /** `(grp, kmv)` — per-group sorted array of the K smallest distinct
    * md5-31 hashes of `valCol`.
    */
  def sketch(df: DataFrame, grpCol: String, valCol: String): DataFrame =
    df.select(col(grpCol).as("grp"),
        Splits.hashBucket(col(valCol), M.toInt).as("h"))
      .groupBy(col("grp")).agg(minK(col("h")).as("kmv"))

  /** Merge sketch tables built on shards of the same key space: union the
    * kept hashes, re-aggregate to k-min — the rollup never rescans data.
    */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .select(col("grp"), explode(col("kmv")).as("h"))
      .groupBy(col("grp")).agg(minK(col("h")).as("kmv"))

  /** `(grp, n_kept, est)` — the cardinality estimate: exact `n_kept` when
    * the group held fewer than K distinct values, else (K-1)·M / h_(K).
    */
  def estimate(sk: DataFrame): DataFrame =
    sk.select(col("grp"),
      size(col("kmv")).cast("long").as("n_kept"),
      when(size(col("kmv")) < K, size(col("kmv")).cast("double"))
        .otherwise(round(lit((K - 1).toDouble * M) / element_at(col("kmv"), K), 6))
        .as("est"))
}
