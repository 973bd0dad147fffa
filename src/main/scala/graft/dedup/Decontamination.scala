package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Splits
import graft.search.Bm25

/** Train/eval DECONTAMINATION — flag eval-split documents that share any
  * word n-gram with a train document (the standard LLM benchmark-overlap
  * check: GPT-3's 13-gram, PaLM/Llama's 8-10-gram variants).
  *
  * Scale shape: the check is a JOIN KEYED BY GRAM, never a doc×doc pair
  * join — tokenize → distinct n-gram hashes per doc (one JIT'd flatMap,
  * same discipline as [[MinHashLsh.signatures]]) → eval grams LEFT SEMI
  * join the distinct train-gram set. One shuffle on the gram hash; the
  * contaminated-id set is a second semi-join away. At 100 TB both sides
  * partition by gram and the train-gram table is reusable across eval
  * sets.
  *
  * Gram hashes use the engine's portable md5-31 derivation
  * ([[graft.core.Ids.hash31]]), so the DuckDB oracle replays them exactly.
  */
object Decontamination {

  /** (doc_id, gram) — distinct word n-gram 31-bit hashes per document. */
  def docGrams(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = Bm25.tokenizeScala(text)
        toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toArray
          .distinct.map(s => (id, graft.core.Ids.hash31(s)))
      }.toDF("doc_id", "gram")
  }

  /** Distinct (doc_id, split) of non-train documents sharing at least one
    * n-gram with any train document, under the deterministic hash split
    * (trainPct/valPct as in [[Splits.splitLabel]]).
    */
  def contaminated(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, trainPct: Int, valPct: Int): DataFrame = {
    val labels = docs.select(col(idCol).cast("long").as("doc_id"),
      Splits.splitLabel(col(idCol), trainPct, valPct).as("split"))
    val grams = docGrams(docs, idCol, textCol, n)
      .join(labels, Seq("doc_id"))
    val trainGrams = grams.filter(col("split") === "train").select("gram").distinct()
    grams.filter(col("split") =!= "train")
      .join(trainGrams, Seq("gram"), "left_semi")
      .select(col("doc_id"), col("split"))
      .distinct()
  }

  /** Containment-scored (eval, train) pairs — the GRADED form of
    * [[contaminated]]: instead of a binary any-gram flag, score each
    * candidate pair by |grams(eval) ∩ grams(train)| / |grams(eval)|
    * (Broder's containment coefficient), the measure benchmark-overlap
    * audits report so reviewers can separate verbatim inclusions
    * (≈1.0) from idiom-level overlap.
    *
    * Scale shape: still NO doc×doc enumeration — pairs materialize only
    * through shared gram keys, and train grams shared by more than
    * `maxDf` train docs are dropped first (one partial-agg count), so a
    * boilerplate gram fans out at most maxDf× (same recall caveat as the
    * q97 fragment-pair df cap: ubiquitous grams stop distinguishing
    * sources anyway). The denominator counts the eval doc's FULL distinct
    * gram set, so the cap can only lower a score, never inflate it.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       n: Int, trainPct: Int, valPct: Int,
                       maxDf: Int, minContainment: Double): DataFrame = {
    val labels = docs.select(col(idCol).cast("long").as("doc_id"),
      Splits.splitLabel(col(idCol), trainPct, valPct).as("split"))
    val grams = docGrams(docs, idCol, textCol, n).join(labels, Seq("doc_id"))
    val trainG = grams.filter(col("split") === "train")
      .select(col("doc_id").as("train_id"), col("gram"))
    val keep = trainG.groupBy(col("gram")).agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= maxDf).select(col("gram"))
    val evalG = grams.filter(col("split") =!= "train")
      .select(col("doc_id").as("eval_id"), col("gram"))
    val evalSize = evalG.groupBy(col("eval_id")).agg(count(lit(1)).as("n_eval_grams"))
    evalG.join(keep, Seq("gram"), "left_semi")
      .join(trainG, Seq("gram"))
      .groupBy(col("eval_id"), col("train_id"))
      .agg(count(lit(1)).as("n_shared"))
      .join(evalSize, Seq("eval_id"))
      .filter(col("n_shared") * lit(1.0) / col("n_eval_grams") >= minContainment)
      .withColumn("containment",
        round(col("n_shared") * lit(1.0) / col("n_eval_grams"), 6))
  }
}
