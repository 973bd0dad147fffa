package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TextRank keyword extraction (Mihalcea & Tarau 2004): rank terms by
  * PageRank over the word co-occurrence graph instead of raw frequency,
  * so a term that bridges many contexts outranks one repeated inside a
  * single boilerplate block — a corpus-level keyphrase signal for
  * curation dashboards and topic labeling.
  *
  * Graph construction is three codegen map passes (tokenize, adjacent
  * pairs via `arrays_zip` of the token array against its own 1-shift,
  * explode) followed by a `distinct()` — per-doc work, no shuffle until
  * the edge dedup. The rank loop is [[GraphOps.pageRank]] verbatim: the
  * per-iteration cost is one ranks×edges equi-join plus one partial-agg
  * groupBy, and the edge set is the (small) VOCABULARY co-occurrence
  * graph, not the corpus — at 100 TB the token explode dominates and it
  * is embarrassingly parallel.
  */
object TextRank {

  /** Top-`k` terms of `textCol` by `iterations`-step PageRank over the
    * undirected adjacent-token graph (tokens lowercased, `[a-z]{minLen,}`
    * only, adjacency = consecutive surviving tokens). Rank rounded to
    * 6 dp; ties broken by term for a deterministic cut.
    */
  def keywords(docs: DataFrame, textCol: String, k: Int,
               iterations: Int = 3, minLen: Int = 3): DataFrame = {
    val toks = docs.select(
      filter(split(lower(col(textCol)), "[^a-z]+"),
        t => length(t) >= minLen).as("t"))
    // consecutive surviving tokens: zip the array with its own tail
    val pairs = toks
      .filter(size(col("t")) >= 2)
      .select(explode(arrays_zip(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1))).as("p"))
      .select(col("p.0").as("w1"), col("p.1").as("w2"))
      .filter(col("w1") =!= col("w2"))
    val edges = pairs.unionByName(
      pairs.select(col("w2").as("w1"), col("w1").as("w2")))
    GraphOps.pageRank(edges, "w1", "w2", iterations)
      .select(col("node").as("term"), round(col("rank"), 6).as("rank"))
      .orderBy(col("rank").desc, col("term"))
      .limit(k)
  }
}
