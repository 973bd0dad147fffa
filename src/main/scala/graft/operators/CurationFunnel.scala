package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.dedup.NgramNovelty
import graft.functions.TextOps

/** TRAINING-DATA CURATION FUNNEL — the standard filter chain a corpus
  * passes through before pre-training, with per-stage survivor counts:
  *
  *   all → language-ID → quality rules → exact dedup (keep-first) →
  *   novelty (boilerplate) gate
  *
  * Each stage consumes the previous stage's SURVIVORS (the novelty df is
  * recomputed on the deduplicated set — removing duplicates changes what
  * counts as corpus-common), and the report is the funnel table every
  * curation run publishes: how much each rule costs, end to end.
  *
  * Scale shape: stages 1–2 are codegen'd column predicates (narrow);
  * dedup elects survivors with `groupBy(hash).agg(min(id))` + semi-join —
  * the partial-agg shape that collapses a hot identical document map-side
  * (NOT a row_number window over the hash, which would put every copy of
  * one boilerplate doc in a single task); the novelty stage is gram-keyed
  * ([[NgramNovelty]]). Stage counts are 1-row aggregates and the input
  * total joins back as a 1-row broadcast.
  */
object CurationFunnel {

  /** The q41 quality composite as one reusable predicate. */
  def qualityKeep(text: Column, stopwords: Seq[String]): Column = {
    val w = TextOps.words(text)
    size(w).between(20, 100000) &&
      TextOps.avgWordLen(text).between(3.0, 10.0) &&
      TextOps.punctRatio(text) < 0.1 &&
      size(array_intersect(array_distinct(w), array(stopwords.map(lit(_)): _*))) >= 2
  }

  /** Funnel report: `(stage, filter, n_docs, share)` — share is of the
    * unfiltered input (an exact integer ratio; identical doubles in any
    * engine).
    */
  def report(docs: DataFrame, idCol: String, textCol: String,
             keepLang: String, stopwords: Seq[String],
             noveltyFloor: Double): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"))
    val s1 = base.filter(TextOps.langGuess(col("text")) === keepLang)
    val s2 = s1.filter(qualityKeep(col("text"), stopwords))
    val firsts = s2.groupBy(md5(col("text")).as("_h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val s3 = s2.join(firsts, Seq("doc_id"), "left_semi")
    val s4 = s3.join(
      NgramNovelty.docNovelty(s3, "doc_id", "text", 3)
        .filter(col("novelty") > noveltyFloor)
        .select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    val stages = Seq(
      (0, "all", base), (1, "lang", s1), (2, "quality", s2),
      (3, "exact_dedup", s3), (4, "novelty", s4))
    val counts = stages.map { case (i, nm, df) =>
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(i.toLong).as("stage"), lit(nm).as("filter"), col("n_docs"))
    }.reduce(_ unionByName _)
    counts
      .crossJoin(broadcast(base.agg(count(lit(1)).as("_n0")))) // 1 row
      .withColumn("share", col("n_docs") / col("_n0"))
      .drop("_n0")
  }
}
