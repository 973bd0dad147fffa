package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting. AQE handles skewed JOINS at runtime;
  * salting is the complementary lever for skewed AGGREGATIONS, where one
  * hot key (e.g. one giant file's chunks, one dominant content hash) would
  * pin a single reducer.
  *
  * Two-phase aggregation: a deterministic salt (hash of the whole row
  * modulo `saltFactor`) splits each key into `saltFactor` sub-keys, the
  * partial aggregate shuffles on (key, salt), and a second, tiny aggregate
  * over at most `saltFactor` rows per key removes the salt. Results are
  * bit-identical for sums/counts (addition is associative over the exact
  * longs / the same doubles either way only regrouped — use for
  * count/sum-of-integers or tolerance-checked doubles).
  */
object Salting {

  def withSalt(df: DataFrame, saltFactor: Int, saltCol: String = "_salt"): DataFrame =
    // the salt must split even BYTE-IDENTICAL duplicate rows (the canonical
    // hot key), so a pure row-content hash is not enough — mix in the
    // physical row position; aggregation results are salt-invariant, so
    // this nondeterminism never reaches the output
    df.withColumn(saltCol, pmod(
      xxhash64(struct(df.columns.toIndexedSeq.map(col): _*), spark_partition_id(), monotonically_increasing_id()),
      lit(saltFactor)))

  /** Salted count per key: (key, salt) partial counts → final sum. */
  def saltedCount(df: DataFrame, keyCols: Seq[String], saltFactor: Int): DataFrame =
    withSalt(df, saltFactor)
      .groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_partial")).as("cnt"))

  /** Salted equi-join for a skewed BIG side: every big-side row gets a
    * salt in [0, saltFactor) and the SMALL side is replicated saltFactor
    * ways, so one hot key's rows spread across saltFactor reducers instead
    * of pinning one. The manual counterpart of AQE's skew-join split — for
    * when the skew is known ahead of time (or the join sits under
    * operators AQE won't split through); results are exactly the plain
    * join's, rows only regrouped.
    *
    * The join salt is a pure CONTENT hash — deterministic under stage
    * retry, unlike [[withSalt]]'s position-mixed salt. A shuffle key that
    * changes when a lost map task recomputes can double-count or drop
    * rows once some reducers have already fetched the old output (the
    * round-robin-repartition failure class); aggregations tolerate the
    * positional salt because their RESULT is salt-invariant, a join's row
    * routing is not. Trade-off: byte-identical duplicate rows share a
    * salt, so a hot key composed of exact duplicates spreads only as far
    * as its distinct rows — acceptable, and the price of retry safety.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCols: Seq[String],
                 saltFactor: Int): DataFrame = {
    val sb = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.toIndexedSeq.map(col): _*)), lit(saltFactor.toLong)))
    val ss = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    sb.join(ss, keyCols :+ "_salt").drop("_salt")
  }

  /** Salted long-sum per key (exact — integer addition is associative). */
  def saltedSumLong(df: DataFrame, keyCols: Seq[String], valueCol: String,
                    saltFactor: Int): DataFrame =
    withSalt(df, saltFactor)
      .groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_partial")).as("sum"))
}
