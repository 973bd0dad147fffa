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

  /** Pairs within `groupCol` whose fingerprints are ≤ maxHamming apart.
    *
    * Pigeonhole banding instead of the all-pairs self-join: the `Bits` bits
    * are split into `maxHamming + 1` disjoint bands — two fingerprints with
    * Hamming distance ≤ maxHamming MUST agree on at least one whole band, so
    * joining on (band, band bits) finds every qualifying pair while touching
    * only docs whose band collides. The quadratic term is now per
    * (grp, band, band_key) bucket — the near-dup clusters themselves — which
    * is what survives a 100×  scale-up; the exact bit_count(xor) check then
    * verifies candidates (no false negatives by pigeonhole, false positives
    * filtered here).
    */
  def closePairs(docs: DataFrame, idCol: String, textCol: String,
                 groupCol: String, maxHamming: Int): DataFrame = {
    val nBands = maxHamming + 1
    // split Bits into nBands contiguous bands as evenly as possible
    val base = Bits / nBands
    val extra = Bits % nBands
    val widths = Seq.tabulate(nBands)(i => base + (if (i < extra) 1 else 0))
    val shifts = widths.scanLeft(0)(_ + _).init
    val bandStructs = shifts.zip(widths).zipWithIndex.map { case ((sh, w), i) =>
      s"named_struct('band', $i, 'bkey', shiftright(fp, $sh) & ${(1L << w) - 1})"
    }.mkString(", ")

    // persist: the fingerprint table is one long per doc — tiny — and the
    // band join must not recompute the per-bit md5 votes for each side
    val fp = fingerprints(docs, idCol, textCol, groupCol).persist()
    val banded = fp
      .select(col("grp"), col("doc_id"), col("fp"),
        explode(expr(s"array($bandStructs)")).as("b"))
      .select(col("grp"), col("doc_id"), col("fp"),
        col("b.band").as("band"), col("b.bkey").as("bkey"))
    val a = banded.select(col("grp"), col("band"), col("bkey"),
      col("doc_id").as("doc_a"), col("fp").as("fp_a"))
    val b = banded.select(col("grp"), col("band"), col("bkey"),
      col("doc_id").as("doc_b"), col("fp").as("fp_b"))
    val pairs = a.join(b, Seq("grp", "band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      // a pair can collide on several bands — dedup before the exact check
      .select(col("grp"), col("doc_a"), col("doc_b"), col("fp_a"), col("fp_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("grp"), col("doc_a"), col("doc_b"), col("hamming"))
      .localCheckpoint(true) // materialize small output, free the fp cache
    fp.unpersist()
    pairs
  }
}
