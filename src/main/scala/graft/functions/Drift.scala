package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DISTRIBUTION DRIFT detection — the two-sample Kolmogorov–Smirnov
  * statistic between every pair of groups, computed on a BUCKETED CDF so
  * the whole comparison runs in bounded state.
  *
  * Corpus pipelines rerun ingestion weekly; "did source X's length /
  * quality / score distribution move?" is the gate before a new snapshot
  * is allowed into the mix. Exact KS needs a global sort of both samples;
  * at 100 TB that is a full-data skew-prone sort for a single scalar. The
  * standard engineering answer is KS on a fixed-width histogram: counts
  * per (group, bucket) reduce with map-side combine, and everything after
  * — the dense grid, the cumulative sums, the pairwise max-gap — runs on
  * ≤ groups × buckets rows. The bucketed statistic differs from exact KS
  * by at most the probability mass of one bucket, the usual resolution/
  * cost dial.
  */
object Drift {

  /** `(grp_a, grp_b, n_a, n_b, ks)` for every unordered group pair
    * (`grp_a < grp_b`), where `ks = max_b |CDF_a(b) − CDF_b(b)|` over
    * `valCol div bucketWidth` buckets, rounded to 6 dp.
    *
    * Both window passes run over the DENSE group×bucket grid — bounded by
    * construction (groups are a curated dimension, buckets = value range /
    * width), which is also why the two building crossJoins are broadcast
    * grids, not data joins. Each CDF cell is a single long/long division,
    * and max is order-insensitive — no float-sum nondeterminism, so any
    * engine replays the statistic bit-for-bit.
    */
  def ksPairs(df: DataFrame, grpCol: String, valCol: String,
              bucketWidth: Long): DataFrame = {
    val h = df.select(col(grpCol).as("grp"),
        (col(valCol).cast("long") - pmod(col(valCol).cast("long"), lit(bucketWidth)))
          .divide(lit(bucketWidth)).cast("long").as("b"))
      .groupBy(col("grp"), col("b")).agg(count(lit(1)).as("c"))
    val grid = h.select(col("grp")).distinct()
      .crossJoin(h.select(col("b")).distinct()) // bounded: groups × buckets
    val cum = grid.join(h, Seq("grp", "b"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col("grp")).orderBy(col("b"))))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("grp"))))
      .select(col("grp"), col("b"),
        (col("cum").cast("double") / col("n")).as("cdf"), col("n"))
    cum.as("x").join(broadcast(cum.as("y")), // grid side is ≤ groups×buckets rows
        col("x.b") === col("y.b") && col("x.grp") < col("y.grp"))
      .groupBy(col("x.grp").as("grp_a"), col("y.grp").as("grp_b"))
      .agg(max(col("x.n")).as("n_a"), max(col("y.n")).as("n_b"),
        round(max(abs(col("x.cdf") - col("y.cdf"))), 6).as("ks"))
  }
}
