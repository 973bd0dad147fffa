package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PREFIX-FILTERED set-similarity join (the PPJoin/AllPairs candidate
  * discipline, Chaudhuri 2006 / Xiao 2008) over WORD n-gram sets: two
  * sets with Jaccard ≥ t must share a token within each one's first
  * p = |d| − ⌈t·|d|⌉ + 1 tokens under a GLOBAL rarest-first token order —
  * so candidates come from an equi-join on prefix tokens only, and the
  * guarantee is exact: no false negatives, verified by the oracle's
  * brute-force pair scan.
  *
  * Complementary to [[NgramJaccard.jaccardPairs]], which measured prefix
  * filtering on CHAR-3-grams and rightly rejected it (char grams on
  * same-domain text share even their rare grams). Word shingles are the
  * opposite regime — df-selective — which is where the prefix join earns
  * its keep: candidate volume tracks ACTUAL similarity, not block sizes.
  *
  * Scale shape: token df is one partial-agg count; per-doc rarest-first
  * ranking is a window BOUNDED by document length; the candidate join
  * keys on prefix tokens whose fan-out is small BY SELECTION (each doc
  * exposes its df-minimal tokens); verification is a gram-keyed count
  * join over surviving pairs only. No doc×doc enumeration anywhere, no
  * global token ranking (rarest-first needs only (df, token) ORDER, not
  * a dense global rank — the per-doc window sorts its own few hundred
  * tokens).
  */
object PrefixJoin {

  /** `(doc_a, doc_b, n_int, jacc)` for all pairs with word-`n`-gram
    * Jaccard ≥ `minJaccard`; ids from `idCol`, distinct gram hashes via
    * the engine's portable md5-31 ([[Decontamination.docGrams]]).
    *
    * Verification is per-PAIR, not per-gram: candidates join the two
    * docs' SORTED hash arrays and run the q21 early-abort merge walk
    * ([[org.apache.spark.sql.graftx.SortedIntersectAtLeast]]) with the
    * jaccard-derived bound — a candidate costs O(|a|+|b|) codegen with
    * instant abort for true negatives, instead of an exploded
    * |a|-row join per pair. A size-ratio prefilter (jaccard ≤ min/max
    * of set sizes) runs inside the candidate join, before the distinct.
    */
  def similarPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, minJaccard: Double): DataFrame = {
    // LAZY checkpoints (r13; guide §5 — the eager form serialized two
    // full driver job barriers before the real query even started): the
    // plan truncation and the compute-once caching are identical, but
    // grams and docArr now materialize inside the single query action.
    val grams = Decontamination.docGrams(docs, idCol, textCol, n)
      .distinct() // per-doc distinct HASHES: merge-walk ∩ == join-count ∩
      .localCheckpoint(false) // reused: df, prefix, per-doc arrays
    val docArr = grams.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("gram"))).as("g"), count(lit(1)).as("sz"))
      .localCheckpoint(false)
    val dfT = grams.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("gram"))
    // ceil slack mirrors NgramJaccard's: float error may only LENGTHEN
    // the prefix (extra candidates the exact verify rejects), never
    // shorten it (which would drop true pairs)
    val prefix = grams.join(dfT, Seq("gram"))
      .join(docArr.select(col("doc_id"), col("sz")), Seq("doc_id"))
      .withColumn("_rn", row_number().over(byRarity))
      .filter(col("_rn") <=
        col("sz") - ceil(lit(minJaccard) * col("sz") - lit(1e-9)) + lit(1))
      .select(col("gram"), col("doc_id"), col("sz"))
    val cand = prefix.select(col("gram"), col("doc_id").as("doc_a"), col("sz").as("sz_a"))
      .join(prefix.select(col("gram"), col("doc_id").as("doc_b"), col("sz").as("sz_b")),
        Seq("gram"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(least(col("sz_a"), col("sz_b")).cast("double") /
        greatest(col("sz_a"), col("sz_b")) >= minJaccard) // size-ratio cut
      .select(col("doc_a"), col("doc_b"), col("sz_a"), col("sz_b")).distinct()
    cand
      .join(docArr.select(col("doc_id").as("doc_a"), col("g").as("g_a")), Seq("doc_a"))
      .join(docArr.select(col("doc_id").as("doc_b"), col("g").as("g_b")), Seq("doc_b"))
      .withColumn("need", greatest(lit(0),
        ceil(lit(minJaccard / (1.0 + minJaccard)) * (col("sz_a") + col("sz_b")) - lit(1e-9))).cast("int"))
      .withColumn("n_int",
        org.apache.spark.sql.graftx.SortedIntersectAtLeast.asColumn(
          col("g_a"), col("g_b"), col("need")).cast("long"))
      .filter(col("n_int") >= 0) // negative = early abort, below threshold
      .withColumn("jacc",
        col("n_int") / (col("sz_a") + col("sz_b") - col("n_int")))
      .filter(col("jacc") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("n_int"), round(col("jacc"), 6).as("jacc"))
  }
}
