package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ingest.{ChatPipeline, DeterministicSummarizer}

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
        .agg(count(lit(1)).as("n"))),

    // Summarization stage made gate-checkable: each `source` plays a chat
    // session (its documents, ordered by doc_id, are the messages). The
    // DeterministicSummarizer runs in the SAME mapPartitions seam an LLM
    // transport would (chat/summarizer.py:208-403), and its extractive
    // logic has an exact SQL twin below.
    "q44_summarize" -> ((s, dir) => {
      val tr = Tables.documents(s, dir)
        .groupBy(col("source").as("session_id"))
        .agg(substring(array_join(transform(
          array_sort(collect_list(struct(col("doc_id"), col("text")))),
          m => m.getField("text")), "\n"), 1, 2000).as("transcript"))
      ChatPipeline.summarizeSessions(tr, DeterministicSummarizer(200, 3))
        .select(col("session_id").as("source"), col("summary"),
          array_join(col("topics"), ",").as("topics"))
    })
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
         |FROM documents GROUP BY 1, 2""".stripMargin,

    "q44_summarize" -> {
      val stop = DeterministicSummarizer.Stopwords.map(s => s"'$s'").mkString(", ")
      s"""WITH tr AS (
         |  SELECT source, substr(string_agg(text, chr(10) ORDER BY doc_id), 1, 2000) AS transcript
         |  FROM documents GROUP BY source
         |), toks AS (
         |  SELECT source, u.t
         |  FROM tr, unnest(list_filter(string_split_regex(lower(transcript), '[^a-z0-9]+'),
         |                              x -> len(x) > 3 AND x NOT IN ($stop))) AS u(t)
         |), counted AS (
         |  SELECT source, t, count(*) AS n FROM toks GROUP BY source, t
         |), rk AS (
         |  SELECT source, t, row_number() OVER (PARTITION BY source ORDER BY n DESC, t ASC) AS rn
         |  FROM counted
         |), top AS (
         |  SELECT source, string_agg(t, ',' ORDER BY rn) AS topics FROM rk WHERE rn <= 3 GROUP BY source
         |)
         |SELECT tr.source, substr(tr.transcript, 1, 200) AS summary,
         |       coalesce(top.topics, '') AS topics
         |FROM tr LEFT JOIN top ON tr.source = top.source""".stripMargin
    }
  )
}
