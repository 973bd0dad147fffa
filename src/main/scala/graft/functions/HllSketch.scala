package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PORTABLE HYPERLOGLOG SKETCH (Flajolet 2007, m = 16 registers) — the
  * mergeable distinct-count structure a 100 TB pipeline keeps per
  * partition/day/source and ORs together at read time. Unlike Spark's
  * built-in `approx_count_distinct` (whose xxHash64-based HLL++ sketch
  * is not reproducible outside Spark), every stage here derives from the
  * engine's portable md5-31 hash, so any engine — the DuckDB oracle
  * included — reconstructs the identical registers bit-for-bit:
  *
  *   h = md5-31(value);  bucket j = h mod 16;  w = h div 16 (27 bits);
  *   rank r = 28 - ⌊log₂ w⌋ - ... (leading-zero count + 1; 28 when w=0);
  *   register M_j = max rank in bucket;  E = α₁₆·m²/Σ 2^(−M_j),
  *   with the standard small-range correction E ≤ 2.5m → m·ln(m/V).
  *
  * Scale shape: ONE partial-aggregated groupBy on (group, bucket) — the
  * `max` combines map-side, so a register table for a petabyte group is
  * 16 rows — then a 16-row-per-group rollup. Sketches MERGE by register
  * max, which is exactly the same aggregate re-run over unioned register
  * tables ([[merge]]).
  */
object HllSketch {

  val M = 16           // registers (b = 4 bucket bits)
  val Alpha16 = 0.673  // published α for m = 16

  private[functions] def rank(h: Long): (Int, Int) = {
    val j = (h % M).toInt
    val w = h / M
    val r = if (w == 0) 28 else 27 - (63 - java.lang.Long.numberOfLeadingZeros(w))
    (j, r)
  }

  /** Register table `(grp, j, reg)` — one row per non-empty bucket. */
  def registers(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(groupCol).cast("string").as("grp"), col(valueCol).cast("string").as("v"))
      .as[(String, String)]
      .map { case (g, v) =>
        val (j, r) = rank(graft.core.Ids.hash31(v))
        (g, j, r)
      }.toDF("grp", "j", "r")
      .groupBy(col("grp"), col("j")).agg(max(col("r")).as("reg"))
  }

  /** Merge register tables from independent sketch runs (register max). */
  def merge(tables: DataFrame*): DataFrame =
    tables.reduce(_ unionByName _)
      .groupBy(col("grp"), col("j")).agg(max(col("reg")).as("reg"))

  /** Per-group estimate from a register table: `(grp, n_zero_regs, est)`.
    * Empty buckets count as register 0 (the 2^0 = 1 indicator term).
    */
  def estimate(regTable: DataFrame): DataFrame = {
    val spark = regTable.sparkSession
    import spark.implicits._
    val grid = regTable.select(col("grp")).distinct()
      .crossJoin(spark.range(M).select(col("id").cast("int").as("j")))
    grid.join(regTable, Seq("grp", "j"), "left")
      .withColumn("reg", coalesce(col("reg"), lit(0)))
      .groupBy(col("grp"))
      .agg(count(when(col("reg") === 0, 1)).as("n_zero_regs"),
        sum(pow(lit(2.0), -col("reg"))).as("_denom"))
      .withColumn("_raw", lit(Alpha16 * M * M) / col("_denom"))
      .withColumn("est",
        when(col("_raw") <= 2.5 * M && col("n_zero_regs") > 0,
          lit(M.toDouble) * log(lit(M.toDouble) / col("n_zero_regs")))
          .otherwise(col("_raw")))
      .select(col("grp"), col("n_zero_regs"), round(col("est"), 6).as("est"))
  }
}
