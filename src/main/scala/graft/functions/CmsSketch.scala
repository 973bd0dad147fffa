package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PORTABLE COUNT-MIN SKETCH (Cormode & Muthukrishnan 2005, d = 4 rows ×
  * w = 64 buckets) — the mergeable frequency structure a 100 TB pipeline
  * keeps per shard/day and SUMS together at read time, answering "how
  * often does token X occur" without materializing the full term
  * dictionary. The companion to [[HllSketch]] (distinct counts): same
  * portable md5-31 hash family, so the DuckDB oracle reconstructs the
  * identical counters bit-for-bit:
  *
  *   row i ∈ [0, d):  b_i(v) = hash31(i + "|" + v) mod w;
  *   counter C[i][b] = Σ occurrences hashing there;
  *   estimate(v) = min_i C[i][b_i(v)]   (≥ truth; = truth absent collisions).
  *
  * Scale shape: ONE partial-aggregated groupBy on (row, bucket) — counts
  * combine map-side, so the sketch for a petabyte stream is d·w = 256
  * rows. Sketches MERGE by counter addition ([[merge]]), which is the
  * same aggregate re-run over unioned counter tables. Probing is a
  * d-row broadcast join per probe key — no shuffle of the corpus.
  */
object CmsSketch {

  val D = 4   // independent hash rows
  val W = 64  // buckets per row

  private[functions] def bucket(row: Int, v: String): Int =
    (graft.core.Ids.hash31(s"$row|$v") % W).toInt

  /** Counter table `(i, b, cnt)` — one row per non-empty cell. The input
    * is one row per OCCURRENCE (pre-aggregating to per-value counts first
    * is an optimization the caller may apply; the sums are identical).
    */
  def counters(df: DataFrame, valueCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(valueCol).cast("string").as("v"))
      .as[String]
      .flatMap(v => (0 until D).map(i => (i, bucket(i, v))))
      .toDF("i", "b")
      .groupBy(col("i"), col("b")).agg(count(lit(1)).as("cnt"))
  }

  /** Merge counter tables from independent sketch runs (cell-wise sum). */
  def merge(tables: DataFrame*): DataFrame =
    tables.reduce(_ unionByName _)
      .groupBy(col("i"), col("b")).agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for a probe set: `(v, est)` where est = min over
    * rows of the counter the probe hashes into (0 when a cell is empty —
    * the item was definitely never seen). The probe table fans out ×d and
    * joins the ≤256-row counter table broadcast — corpus never reshuffles.
    */
  def estimate(counterTable: DataFrame, probes: DataFrame, probeCol: String): DataFrame = {
    import probes.sparkSession.implicits._
    val probed = probes.select(col(probeCol).cast("string").as("v"))
      .as[String]
      .flatMap(v => (0 until D).map(i => (v, i, bucket(i, v))))
      .toDF("v", "i", "b")
    probed.join(broadcast(counterTable), Seq("i", "b"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .groupBy(col("v")).agg(min(col("cnt")).as("est"))
  }
}
