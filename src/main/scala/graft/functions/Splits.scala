package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines: hash-based
  * train/val/test assignment and per-stratum sampling. The bucket hash is
  * the portable md5 derivation used across the engine (see
  * [[graft.core.Ids.hash31]]) so any engine — including the DuckDB oracle —
  * reproduces the exact same split:
  * Spark `conv(substring(md5(x),1,15),16,10) % m`
  * ≡ DuckDB `CAST(('0x'||substr(md5(x),1,15)) AS BIGINT) % m`.
  *
  * Scale shape: a narrow codegen map pass — no shuffle, no sampling RNG
  * (rand() would be nondeterministic across retries and re-runs; a content
  * hash is stable, idempotent, and reproducible on a different cluster).
  */
object Splits {

  /** Portable bucket in [0, m): 60-bit md5 prefix of `c` (+ optional salt,
    * so independent splits of the same key-space don't correlate) mod m.
    */
  def hashBucket(c: Column, m: Int, salt: String = ""): Column =
    (conv(substring(md5(concat(c.cast("string"), lit(salt))), 1, 15), 16, 10)
      .cast("long") % m)

  /** 'train' / 'val' / 'test' label with the given percentage cut points
    * (trainPct + valPct ≤ 100; the rest is test).
    */
  def splitLabel(c: Column, trainPct: Int, valPct: Int): Column = {
    val b = hashBucket(c, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** True for a deterministic 1-in-`outOf` sample of the key column —
    * stratification comes from applying it inside any groupBy.
    */
  def sampled(c: Column, outOf: Int, salt: String = ":s"): Column =
    hashBucket(c, outOf, salt) === 0

  /** Deterministic weighted keep for corpus mixing: true for ~`weightBp`
    * basis points (1/10000ths) of keys. Weights stay INTEGER basis points
    * end-to-end — a float weight would hit engine-specific double→int
    * rounding (Spark casts truncate, DuckDB casts round) and break
    * cross-engine replay.
    */
  def weightedKeep(c: Column, weightBp: Column, salt: String = ":mix"): Column =
    hashBucket(c, 10000, salt) < weightBp
}
