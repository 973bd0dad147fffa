package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.search.Bm25

/** SimHash fingerprinting: each token occurrence votes ±1 on every bit of a
  * `Bits`-bit fingerprint according to its md5 bit pattern; the
  * fingerprint's bit is 1 where the vote sum is positive. Near-dups land at
  * small Hamming distance (`bit_count(xor)`).
  *
  * Portable hashing as in [[MinHashLsh]] (md5 → 31-bit int), so the DuckDB
  * oracle reproduces fingerprints bit-for-bit.
  *
  * Scale shape: fingerprinting is a narrow map pass producing one long per
  * doc. Pairing is restricted to a grouping key (source/shard/simhash
  * prefix), bounding the quadratic term; the fingerprint table is tiny.
  */
object SimHash {
  val Bits = 24

  /** Fingerprint from a precomputed token-hash array column `_sh_hs`
    * (hashes computed once, re-scanned per bit).
    */
  private def fpExpr: Column =
    expr(
      s"""aggregate(
         |  transform(sequence(0, ${Bits - 1}), j ->
         |    CASE WHEN aggregate(
         |           transform(_sh_hs, x -> CASE WHEN (shiftright(x, j) & 1) = 1 THEN 1 ELSE -1 END),
         |           0, (a, v) -> a + v) > 0
         |         THEN cast(shiftleft(1, j) as bigint) ELSE cast(0 as bigint) END),
         |  cast(0 as bigint), (a, v) -> a + v)""".stripMargin)

  /** (doc_id, grp, fp) fingerprints. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String, groupCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), col(groupCol).as("grp"), Bm25.tokens(col(textCol)).as("tk"))
      .withColumn("_sh_hs", expr(
        s"transform(tk, s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint) % ${MinHashLsh.P}L)"))
      .withColumn("fp", fpExpr)
      .select(col("doc_id"), col("grp"), col("fp"))

  /** Pairs within `groupCol` whose fingerprints are ≤ maxHamming apart. */
  def closePairs(docs: DataFrame, idCol: String, textCol: String,
                 groupCol: String, maxHamming: Int): DataFrame = {
    // persist: the fingerprint table is one long per doc — tiny — and the
    // self-join must not recompute the per-bit md5 votes for each side
    val fp = fingerprints(docs, idCol, textCol, groupCol).persist()
    val a = fp.select(col("grp"), col("doc_id").as("doc_a"), col("fp").as("fp_a"))
    val b = fp.select(col("grp"), col("doc_id").as("doc_b"), col("fp").as("fp_b"))
    a.join(b, Seq("grp"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("grp"), col("doc_a"), col("doc_b"), col("hamming"))
  }
}
