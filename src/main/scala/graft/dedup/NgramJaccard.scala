package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact character n-gram Jaccard similarity — the precise verifier behind
  * MinHash candidates (and a standalone near-dup scorer for short docs).
  *
  * Scale shape: pairs are generated within a grouping key only (same
  * source/bucket); the n-gram sets live as array columns so the
  * intersection is a per-row `array_intersect`, not an explode-join.
  */
object NgramJaccard {

  /** Distinct character n-grams of the named text column (SQL-expression
    * form: `substring` with a lambda index isn't exposed through the Column
    * API's fixed-position overloads).
    */
  def charNgrams(textCol: String, n: Int): Column =
    // NB: Spark's sequence(1, 0) yields the DESCENDING [1, 0], not an empty
    // list — texts shorter than n must short-circuit to array() or they get
    // phantom grams (and diverge from the oracle's empty generate_series)
    array_distinct(expr(
      s"""CASE WHEN length($textCol) >= $n
         |     THEN transform(sequence(1, length($textCol) - ${n - 1}), i -> substring($textCol, i, $n))
         |     ELSE array() END""".stripMargin))

  /** Pairwise jaccard within `groupCol`, threshold + sorted output.
    *
    * The exact all-pairs join is kept (PPJoin-style prefix filtering was
    * measured: char-3-grams on short same-domain docs share even their
    * "rare" grams, so the prefix join kept 71% of the naive pairs and just
    * added two shuffles) — but BLOCKED for parallelism: joining on the
    * group key alone collapses the work into #groups tasks (5 sources =
    * 5 busy cores regardless of cluster size). Hashing docs into B buckets
    * and replicating each side B ways turns one group's pair space into
    * B² independent (bucket_i, bucket_j) cells — every unordered pair
    * meets in exactly one cell, shuffle volume grows only B× over the
    * per-doc gram table, and parallelism is groups × B², which is how the
    * triangle self-join stays balanced on a 1000-executor cluster.
    *
    * Per-pair verification (semantics-identical to the naive join):
    *  - a size-ratio prefilter (jaccard ≤ min/max of set sizes) before any
    *    intersection work;
    *  - a codegen'd O(n+m) merge walk (SortedIntersectSize) over SORTED
    *    64-bit gram hashes — |A∩B| identical to string intersection
    *    (distinct-set hashing; collision odds ~|A||B|/2^64), sorted once
    *    per DOCUMENT, merged once per PAIR.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   groupCol: String, n: Int, minJaccard: Double,
                   buckets: Int = 16): DataFrame = {
    val grams = docs.select(
      col(idCol).as("doc_id"), col(groupCol).as("grp"),
      charNgrams(textCol, n).as("gs"))
      .withColumn("g", expr("array_sort(transform(gs, x -> xxhash64(x)))")).drop("gs")
      .withColumn("sz", size(col("g")))
      .persist()
    // The pair space is enumerated over (doc_id, sz) ONLY — attaching the
    // gram arrays before the doc_a<doc_b / size-ratio filters would copy
    // two ~|grams| arrays into every raw join row (n²/groups rows — tens of
    // GB of memcpy at sf0.1, unbounded at scale). Arrays join in AFTER the
    // candidate set is pruned, once per surviving pair side.
    val ids = grams.select(col("grp"), col("doc_id"), col("sz"))
    // A LENGTH-BAND join-key component (band = floor(ln sz / ln(1/t)),
    // b keyed on its band, a exploded to {band−1, band, band+1}) was
    // A/B-measured in r13 and REJECTED: at t=0.6 the ratio window spans
    // a full ×1.67, so 62% of candidate pairs survive ±1-band pruning on
    // this corpus's length distribution while the a side triples — four
    // interleaved jar-vs-jar sessions showed 0.89×–1.10× (flat, noise-
    // bound), short of the ≥15% keep bar. The size-ratio FILTER below
    // already removes the same pairs post-join at codegen cost ~zero.
    val a = ids.select(col("grp"), col("doc_id").as("doc_a"), col("sz").as("sz_a"))
      .withColumn("bi", pmod(hash(col("doc_a")), lit(buckets)))
      .withColumn("bj", explode(sequence(lit(0), lit(buckets - 1))))
    val b = ids.select(col("grp"), col("doc_id").as("doc_b"), col("sz").as("sz_b"))
      .withColumn("bi", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("bj", pmod(hash(col("doc_b")), lit(buckets)))
    val cand = a.join(b, Seq("grp", "bi", "bj"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(least(col("sz_a"), col("sz_b")).cast("double") /
        greatest(col("sz_a"), col("sz_b")) >= minJaccard)
      .select(col("grp"), col("doc_a"), col("doc_b"), col("sz_a"), col("sz_b"))
    val pairs = cand
      // re-join includes grp: the id column is only guaranteed unique
      // WITHIN a group by this function's contract
      .join(grams.select(col("grp"), col("doc_id").as("doc_a"), col("g").as("g_a")), Seq("grp", "doc_a"))
      .join(grams.select(col("grp"), col("doc_id").as("doc_b"), col("g").as("g_b")), Seq("grp", "doc_b"))
      // jaccard >= t  ⟺  inter >= t/(1+t) * (sz_a+sz_b): pass that lower
      // bound into the merge walk so true negatives (most candidates) abort
      // the moment the bound is unreachable instead of walking both arrays
      // to the end. The 1e-9 slack guards the ceil against float error
      // inflating an exactly-integral bound (a wrongly-raised bound would
      // DROP a passing pair; a slightly-low one only admits pairs the exact
      // jaccard filter below re-checks).
      .withColumn("need", greatest(lit(0),
        ceil(lit(minJaccard / (1.0 + minJaccard)) * (col("sz_a") + col("sz_b")) - lit(1e-9))).cast("int"))
      .withColumn("inter",
        org.apache.spark.sql.graftx.SortedIntersectAtLeast.asColumn(col("g_a"), col("g_b"), col("need"))
          .cast("double"))
      .filter(col("inter") >= 0)
      .withColumn("jaccard", col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("grp"), col("doc_a"), col("doc_b"), col("jaccard"))
      .localCheckpoint(true) // materialize small output, free the gram cache
    grams.unpersist()
    pairs
  }
}
