package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TRAINABLE BYTE-PAIR-ENCODING TOKENIZER — the real merge-learning loop
  * (Sennrich 2016 / GPT-2 formulation), Spark-first:
  *
  *   1. ONE corpus pass aggregates word frequencies (`groupBy(word)`,
  *      partial-agged) — after this, training never touches the corpus
  *      again: every merge iteration runs over the VOCABULARY table
  *      (unique words × symbol sequences, orders of magnitude smaller
  *      than 100 TB of text).
  *   2. Per merge round: explode each vocab word's adjacent symbol
  *      pairs weighted by word count → one partial-agged groupBy →
  *      argmax (count desc, pair lexicographic asc — deterministic) →
  *      apply the merge to the vocab table (narrow map). One checkpoint
  *      per round bounds lineage (the DupClusters discipline).
  *   3. `tokenCounts` encodes documents with the learned merges shipped
  *      in the closure (tiny array) — a single JIT'd map pass.
  *
  * Pre-tokens are letter runs / digit runs / single marks, the same
  * split as [[TextOps.bpeishTokenCount]], so learned-BPE counts are
  * directly comparable with the heuristic estimator they upgrade.
  * Merges never cross pre-token boundaries (the cl100k contract
  * documented at [[graft.index.EmbedBatching]]).
  */
object BpeTokenizer {

  private val PreTokRx = java.util.regex.Pattern.compile("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]")

  private[functions] def preTokens(text: String): Seq[String] = {
    val m = PreTokRx.matcher(text)
    val out = Seq.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** Apply ONE merge (a, b) → a+b to a symbol sequence, leftmost-first,
    * non-overlapping — the exact update both training and encoding use.
    */
  private[functions] def applyMerge(sym: List[String], a: String, b: String): List[String] = {
    val out = List.newBuilder[String]
    var rest = sym
    while (rest.nonEmpty) rest match {
      case x :: y :: tail if x == a && y == b => out += (a + b); rest = tail
      case x :: tail => out += x; rest = tail
      case Nil => ()
    }
    out.result()
  }

  /** Greedy BPE encode of one pre-token under an ordered merge list. */
  private[functions] def encodeWord(word: String, merges: Seq[(String, String)]): List[String] = {
    var sym = word.split("").toList
    merges.foreach { case (a, b) =>
      if (sym.lengthCompare(1) > 0) sym = applyMerge(sym, a, b)
    }
    sym
  }

  /** Learn `nMerges` merges from the corpus. Returns them in rank order.
    * Each round is one vocab-table aggregate + a 1-row collect — the
    * corpus itself is read exactly once (the word-frequency pass).
    */
  def fit(docs: DataFrame, textCol: String, nMerges: Int): Seq[(String, String)] = {
    import docs.sparkSession.implicits._
    var vocab = docs.select(col(textCol).as("text")).as[String]
      .flatMap(preTokens)
      .groupByKey(identity).count()
      .map { case (w, c) => (w.split("").toList, c) }
      .toDF("sym", "wc")
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    var r = 0
    var exhausted = false
    while (r < nMerges && !exhausted) {
      val top = vocab.as[(List[String], Long)]
        .flatMap { case (sym, wc) =>
          sym.zip(sym.tail).map { case (a, b) => ((a, b), wc) }
        }
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case ((a, b), c) => (a, b, c) }
        .toDF("a", "b", "c")
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        vocab = vocab.as[(List[String], Long)]
          .map { case (sym, wc) => (applyMerge(sym, a, b), wc) }
          .toDF("sym", "wc")
          .localCheckpoint(true)
        r += 1
      }
    }
    merges.result()
  }

  /** Per-doc token counts under the learned merges: `(doc_id, n_pretok,
    * n_tokens)` — pre-token count (= the no-merge upper bound) and the
    * true merged BPE count. One JIT'd map pass; `merges` rides the
    * closure.
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val pts = preTokens(text)
        var n = 0L
        pts.foreach(w => n += encodeWord(w, merges).length)
        (id, pts.length.toLong, n)
      }.toDF("doc_id", "n_pretok", "n_tokens")
  }
}
