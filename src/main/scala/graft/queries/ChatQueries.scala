package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ingest.ChatPipeline

/** Chat-analysis operators (§2.7) made gate-checkable over the testdata:
  * the 9-category keyword classifier runs over `documents` (same scoring
  * the reference applies to chat content, chat/summarizer.py:336-354), and
  * the oracle SQL is GENERATED from the same keyword lists so the two
  * can't drift.
  */
object ChatQueries {

  type Q = (SparkSession, String) => DataFrame

  def defs: Map[String, Q] = Map(
    "q29_classify" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("lang"), ChatPipeline.classify(col("text")).as("category"))
        .groupBy(col("lang"), col("category"))
        .agg(count(lit(1)).as("n")))
  )

  private def scoreSql(keywords: Seq[String]): String =
    keywords.map(k => s"CASE WHEN contains(lower(text), '$k') THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")

  private val classifySql: String = {
    val scores = ChatPipeline.CategoryPatterns.map { case (c, ks) => c -> scoreSql(ks) }
    val maxExpr = scores.map(_._2).reduceLeft((a, b) => s"greatest($a, $b)")
    scores.foldRight("'general'") { case ((c, s), els) =>
      s"CASE WHEN $maxExpr > 0 AND $s = $maxExpr THEN '$c' ELSE $els END"
    }
  }

  def oracles: Map[String, String] = Map(
    "q29_classify" ->
      s"""SELECT lang, $classifySql AS category, count(*) AS n
         |FROM documents GROUP BY 1, 2""".stripMargin
  )
}
