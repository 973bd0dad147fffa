package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** MISRA–GRIES HEAVY HITTERS (Misra & Gries 1982; mergeable form Agarwal
  * et al., PODS 2012) — find every token whose frequency exceeds a φ
  * fraction of the corpus without ever shuffling the full vocabulary.
  *
  * The classic two-pass shape production frequency pipelines use:
  *
  *   1. CANDIDATES — a bounded-state sketch (≤ k counters) aggregated with
  *      map-side combine. The MG guarantee: any item with true count
  *      > n/(k+1) is present in the final summary, under ANY reduce/merge
  *      order — so with φ > 1/(k+1) the candidate set has no false
  *      negatives. A partition with a billion distinct rare tokens
  *      contributes the same ≤ k counters as a tiny one.
  *   2. VERIFY — exact counts for candidates only, via a broadcast semi
  *      join (≤ k keys) followed by a partial-agg count. The final filter
  *      on the EXACT count makes the output deterministic even though the
  *      sketch contents depend on partitioning.
  *
  * Contrast with the CMS top-k (q99): CMS answers point queries with
  * ε-overcounts and needs a candidate stream; MG is the one-sided summary
  * whose support IS the candidate set. At 100 TB pass 2 touches only rows
  * whose token survives the broadcast filter — no full groupBy over a
  * possibly-unbounded key space.
  */
object HeavyHitters {

  /** Default capacity: supports any φ > 1/(K+1); 1% hitters need K ≥ 100. */
  val K = 256

  /** Bounded-state MG summary. `reduce` folds one item in as a singleton
    * merge; `merge` is the Agarwal et al. mergeable-summaries rule: sum
    * counts, then subtract the (k+1)-th largest count from every counter
    * and drop the non-positive — each call is O(k log k) and keeps the
    * total error ≤ n/(k+1), hence the no-false-negative guarantee above.
    */
  class MgAgg(k: Int) extends Aggregator[String, Map[String, Long], Array[String]] {
    def zero: Map[String, Long] = Map.empty

    private def shrink(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= k) m
      else {
        // (k+1)-th largest count (0-indexed k); reduce only ever exceeds
        // k by one, merge by at most k.
        val cut = m.valuesIterator.toArray.sortInPlaceWith(_ > _).apply(k)
        m.collect { case (w, c) if c > cut => (w, c - cut) }
      }

    def reduce(st: Map[String, Long], w: String): Map[String, Long] =
      st.get(w) match {
        case Some(c) => st.updated(w, c + 1L)
        case None if st.size < k => st.updated(w, 1L)
        case None => shrink(st.updated(w, 1L))
      }

    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val (small, big) = if (a.size < b.size) (a, b) else (b, a)
      shrink(small.foldLeft(big) { case (m, (w, c)) =>
        m.updated(w, m.getOrElse(w, 0L) + c)
      })
    }

    def finish(st: Map[String, Long]): Array[String] = st.keys.toArray.sorted
    def bufferEncoder: ExpressionEncoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: ExpressionEncoder[Array[String]] =
      ExpressionEncoder[Array[String]]()
  }

  private val mg = udaf(new MgAgg(K), org.apache.spark.sql.Encoders.STRING)

  /** MG candidate summary of `valCol` as a Column aggregate (≤ K items). */
  def candidates(valCol: Column): Column = mg(valCol)

  /** `(item, cnt)` — every distinct value of `valCol` in `df` whose EXACT
    * count times `phiDenom` is ≥ the total row count (frequency ≥
    * 1/phiDenom). Requires phiDenom ≤ K (else the sketch could miss a
    * qualifying item). Output is exact and partitioning-independent.
    */
  def exactHeavyHitters(df: DataFrame, valCol: String, phiDenom: Int): DataFrame = {
    require(phiDenom <= K, s"phiDenom=$phiDenom needs capacity > itself (K=$K)")
    val vals = df.select(col(valCol).as("item"))
    // pass 1: candidate sketch AND the stream length in ONE aggregate —
    // the result is a single driver row (≤ K strings + a long), the
    // k-means-centroid materialization pattern
    val row = vals.agg(candidates(col("item")).as("cand"),
      count(lit(1)).as("n")).head()
    val cand = row.getSeq[String](0)
    val n = row.getLong(1)
    // pass 2: exact counts restricted to the ≤ K candidates (literal
    // IN-set → a codegen filter, no join), final bar on the EXACT count
    vals.filter(col("item").isInCollection(cand))
      .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * phiDenom >= lit(n))
      .select(col("item"), col("cnt"))
  }
}
