package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Search-result snippet extraction (the highlighting step between ranking
  * and display; the reference surfaces whole metadata chunks — reference
  * storage/qdrant.py:896-960 returns payload text verbatim — so this is
  * the engine-side upgrade a search UI needs at scale: ship a window, not
  * the document).
  *
  * Window rule, deterministic and oracle-replayable: tokenize like BM25,
  * find the FIRST occurrence of any query term (smallest position across
  * terms), emit the fixed-width token window starting at
  * `max(1, pos - before)`. Pure codegen HOFs over the scan — no UDF, no
  * shuffle; at 100 TB snippets ride the same map pass as scoring.
  */
object Snippets {

  /** 1-based position of the first occurrence of any query term in the
    * BM25 token array of `textCol`, or null when no term occurs.
    */
  def firstMatchPos(textCol: Column, terms: Seq[String]): Column = {
    if (terms.isEmpty) return lit(null).cast("long") // no terms -> no hit, not a 0-arg least()
    val toks = Bm25.tokens(textCol)
    val positions = terms.map(t => array_position(toks, t))
    // array_position: 0 = absent; map to null then take the minimum
    val nonZero = positions.map(p => when(p > 0, p))
    if (nonZero.size == 1) nonZero.head else least(nonZero: _*)
  }

  /** The fixed-width snippet: `before` tokens of left context, `width`
    * tokens total. Null when no query term occurs.
    */
  def extract(textCol: Column, terms: Seq[String],
              before: Int = 5, width: Int = 11): Column = {
    val toks = Bm25.tokens(textCol)
    val pos = firstMatchPos(textCol, terms)
    val start = greatest(pos - before, lit(1))
    when(pos.isNotNull,
      array_join(slice(toks, start, lit(width)), " "))
  }
}
