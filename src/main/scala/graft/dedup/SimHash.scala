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

  /** (doc_id, grp, fp) fingerprints.
    *
    * Typed map instead of nested HOFs for the bit-vote loop (interpreted
    * lambda evaluation is the bottleneck — see MinHashLsh.signatures);
    * formula identical to the SQL derivation the oracle replays.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String, groupCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"), col(groupCol).as("grp"), col(textCol).as("text"))
      .as[(Long, String, String)]
      .map { case (id, grp, text) =>
        val hs = Bm25.tokenizeScala(text).map(graft.core.Ids.hash31)
        var fp = 0L
        var j = 0
        while (j < Bits) {
          var votes = 0L
          var k = 0
          while (k < hs.length) {
            votes += (if (((hs(k) >> j) & 1L) == 1L) 1L else -1L)
            k += 1
          }
          if (votes > 0) fp |= (1L << j)
          j += 1
        }
        (id, grp, fp)
      }
      .toDF("doc_id", "grp", "fp")
  }

  /** Pairs within `groupCol` whose fingerprints are ≤ maxHamming apart. */
  def closePairs(docs: DataFrame, idCol: String, textCol: String,
                 groupCol: String, maxHamming: Int): DataFrame = {
    // persist: the fingerprint table is one long per doc — tiny — and the
    // self-join must not recompute the per-bit md5 votes for each side
    val fp = fingerprints(docs, idCol, textCol, groupCol).persist()
    val a = fp.select(col("grp"), col("doc_id").as("doc_a"), col("fp").as("fp_a"))
    val b = fp.select(col("grp"), col("doc_id").as("doc_b"), col("fp").as("fp_b"))
    val pairs = a.join(b, Seq("grp"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("grp"), col("doc_a"), col("doc_b"), col("hamming"))
      .localCheckpoint(true) // materialize small output, free the fp cache
    fp.unpersist()
    pairs
  }
}
