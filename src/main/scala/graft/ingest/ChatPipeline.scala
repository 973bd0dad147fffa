package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Ids
import graft.core.Model.Chunk

/** Chat-conversation pipeline (SURVEY.md §2.7; reference: chat/parser.py,
  * chat/summarizer.py): JSONL conversations → normalized messages →
  * per-session metadata aggregation → keyword-scored 9-category
  * classification → chat chunks for the vector store.
  *
  * All session aggregation is one groupBy (single shuffle on session_id);
  * language detection and classification are narrow regexp/contains
  * expressions — scan-bound at 100 TB of chat logs.
  */
object ChatPipeline {

  /** Normalize raw JSONL rows (three format variants the reference
    * accepts, chat/parser.py:110-213) into
    * (session_id, role, content, ts, source_file).
    * Expected available columns (any subset): sessionId/session_id, role or
    * message.role or type, content (string) or message.content, timestamp.
    */
  def normalize(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.StructType
    // schema-aware resolution: col() never throws at construction time, so
    // presence (including nested struct fields) must be checked against the
    // schema up front
    def fieldExists(path: String): Boolean = {
      def walk(dt: org.apache.spark.sql.types.DataType, parts: List[String]): Boolean =
        (dt, parts) match {
          case (_, Nil) => true
          case (st: StructType, p :: rest) =>
            st.fields.find(_.name == p).exists(f => walk(f.dataType, rest))
          case _ => false
        }
      walk(StructType(raw.schema.fields), path.split('.').toList)
    }
    def colOr(name: String, fallback: Column): Column =
      if (fieldExists(name)) col(name) else fallback
    val role = coalesce(
      colOr("role", lit(null)), colOr("message.role", lit(null)),
      colOr("type", lit(null))).as("role")
    val content = coalesce(
      colOr("content", lit(null)), colOr("message.content", lit(null)),
      colOr("text", lit(null))).cast("string").as("content")
    val session = coalesce(
      colOr("sessionId", lit(null)), colOr("session_id", lit(null)),
      lit("unknown")).cast("string").as("session_id")
    val ts = coalesce(colOr("timestamp", lit(null)), colOr("ts", lit(null)))
      .cast("timestamp").as("ts")
    raw.select(session, role, content, ts, input_file_name().as("source_file"))
      .filter(col("role").isin("user", "assistant") && col("content").isNotNull)
  }

  /** Code-heaviness indicator (chat/parser.py:26-30). */
  def isCodeHeavy(content: Column): Column =
    Seq("```", "def ", "class ", "import ", "function", "{", "}")
      .map(ind => content.contains(ind)).reduce(_ || _)

  /** Per-session metadata aggregation (chat/parser.py:215-270):
    * start/end, message_count, total_words, has_code, primary language
    * (most frequent non-shell code-fence language, lexicographic
    * tie-break).
    */
  def sessionMetadata(messages: DataFrame): DataFrame = {
    val base = messages.groupBy(col("session_id"))
      .agg(
        min(col("ts")).as("start_time"),
        max(col("ts")).as("end_time"),
        count(lit(1)).as("message_count"),
        sum(size(split(col("content"), "\\s+"))).as("total_words"),
        max(isCodeHeavy(col("content")).cast("int")).cast("boolean").as("has_code"))
    val langs = messages
      .select(col("session_id"),
        explode(expr("regexp_extract_all(content, '```(\\\\w+)', 1)")).as("lang"))
      .withColumn("lang", lower(col("lang")))
      .filter(!col("lang").isin("bash", "shell", "text", "plaintext"))
      .groupBy(col("session_id"), col("lang")).agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("session_id")).orderBy(col("n").desc, col("lang").asc)))
      .filter(col("rn") === 1)
      .select(col("session_id"), col("lang").as("primary_language"))
    base.join(langs, Seq("session_id"), "left")
  }

  /** Sessions whose last activity is older than thresholdHours before
    * `now` (chat/parser.py:272-287).
    */
  def inactiveSessions(meta: DataFrame, nowEpoch: Long, thresholdHours: Double): DataFrame =
    meta.filter(unix_timestamp(col("end_time")) < nowEpoch - (thresholdHours * 3600).toLong)

  /** The reference's 9 category keyword lists, verbatim
    * (chat/summarizer.py:59-184).
    */
  val CategoryPatterns: Seq[(String, Seq[String])] = Seq(
    "debugging_pattern" -> Seq("error", "exception", "bug", "fix", "debug", "traceback",
      "stack trace", "memory leak", "crash", "failure", "issue", "problem", "troubleshoot"),
    "implementation_pattern" -> Seq("class", "function", "method", "algorithm", "pattern",
      "best practice", "code", "solution", "implement", "create", "build", "develop"),
    "integration_pattern" -> Seq("api", "service", "integration", "database", "authentication",
      "pipeline", "external", "third-party", "connect", "interface", "endpoint"),
    "configuration_pattern" -> Seq("config", "environment", "deploy", "setup", "docker",
      "ci/cd", "install", "settings", "parameters", "variables", "build", "deployment"),
    "architecture_pattern" -> Seq("architecture", "design", "structure", "component",
      "system", "module", "organization", "framework", "pattern", "design pattern"),
    "performance_pattern" -> Seq("performance", "optimization", "scalability", "memory",
      "speed", "bottleneck", "cache", "efficient", "fast", "slow", "optimize", "scale"),
    "knowledge_insight" -> Seq("research", "learning", "methodology", "strategy", "analysis",
      "insight", "findings", "discovery", "understanding", "lesson"),
    "active_issue" -> Seq("active", "issue", "bug", "problem", "todo", "fixme", "hack",
      "workaround", "blocked", "investigate", "urgent", "critical", "blocker", "regression"),
    "ideas" -> Seq("idea", "feature", "suggestion", "enhancement", "brainstorm", "concept",
      "proposal", "future", "roadmap", "vision", "inspiration", "innovation")
  )

  /** Keyword-presence score for one category (count of list keywords
    * appearing as substrings of the lowercased content).
    */
  def categoryScore(content: Column, keywords: Seq[String]): Column =
    keywords.map(k => when(lower(content).contains(k), 1).otherwise(0))
      .reduce(_ + _)

  /** Argmax category with deterministic declaration-order tie-break
    * (first listed category ≥ all others wins); all-zero scores →
    * 'general'.
    */
  def classify(content: Column): Column = {
    // argmax via array_position (FIRST index of the max = declaration-order
    // tie-break, same as the old when-fold) — the old form inlined the
    // greatest-of-8 tree into every branch, so each score expression
    // appeared ~10x and the tree hit Catalyst/codegen super-linearly (r12;
    // guide §1.2 "per-task work"). Values are identical by construction.
    val arr = array(CategoryPatterns.map { case (_, ks) => categoryScore(content, ks) }: _*)
    val names = array(CategoryPatterns.map { case (c, _) => lit(c) }: _*)
    when(array_max(arr) > 0,
      element_at(names, array_position(arr, array_max(arr)).cast("int")))
      .otherwise(lit("general"))
  }

  /** Per-session transcript: messages sorted by (ts, content, role),
    * rendered "role: content" per line, truncated to `maxChars` (the
    * reference truncates the GPT context the same way,
    * chat/summarizer.py:290-310). One groupBy — a single shuffle on
    * session_id; the sort is per-group inside the aggregation, never a
    * global order.
    */
  def transcripts(messages: DataFrame, maxChars: Int = 4000): DataFrame =
    messages
      .groupBy(col("session_id"))
      .agg(substring(array_join(transform(
        array_sort(collect_list(struct(col("ts"), col("content"), col("role")))),
        m => concat(m.getField("role"), lit(": "), m.getField("content"))),
        "\n"), 1, maxChars).as("transcript"))

  /** Summarization stage: one summarizer call per session inside
    * `mapPartitions` (reference: chat/summarizer.py:208-403 — with an LLM
    * transport this is where the batched HTTP requests happen, exactly like
    * RemoteEmbedder's embed pass).
    */
  def summarizeSessions(transcriptDf: DataFrame, summarizer: Summarizer): DataFrame = {
    import transcriptDf.sparkSession.implicits._
    transcriptDf.select(col("session_id"), col("transcript")).as[(String, String)]
      .mapPartitions { it =>
        it.map { case (sid, tr) =>
          val s = summarizer.summarize(sid, tr)
          (sid, tr, s.summary, s.topics)
        }
      }
      .toDF("session_id", "transcript", "summary", "topics")
  }

  /** Summarized chat chunks (reference: analysis/entities.py:309-343 +
    * chat/summarizer.py:356-403): per session, a `chat_summary` metadata
    * chunk (summary + topics — the searchable surface) and a `chat_detail`
    * implementation chunk carrying the transcript excerpt. Replaces the
    * plain [[chatChunks]] when a summarizer is enabled, same ids.
    */
  def summaryChunks(summaries: DataFrame): DataFrame = {
    import summaries.sparkSession.implicits._
    summaries.select(col("session_id"), col("transcript"), col("summary"), col("topics"))
      .as[(String, String, String, Seq[String])]
      .flatMap { case (sid, transcript, summary, topics) =>
        val summaryText = s"Chat session $sid: $summary" +
          (if (topics.nonEmpty) s" | topics: ${topics.mkString(", ")}" else "")
        Seq(
          Chunk(s"chat::$sid::chat_summary", "metadata", s"chat_$sid", "chat_history",
            "", 0, 0, summaryText, summaryText, Ids.sha256Hex(summaryText), "", "",
            hasImplementation = true),
          Chunk(s"chat::$sid::chat_detail", "implementation", s"chat_$sid", "chat_history",
            "", 0, 0, transcript, transcript, Ids.sha256Hex(transcript), "", "",
            hasImplementation = false))
      }.toDF()
  }

  /** Chat chunks for the store (reference ChatChunk,
    * analysis/entities.py:309-343): one summary chunk per session.
    */
  def chatChunks(meta: DataFrame, messages: DataFrame): DataFrame = {
    import meta.sparkSession.implicits._
    val firstUser = messages.filter(col("role") === "user")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("session_id")).orderBy(col("ts").asc, col("content").asc)))
      .filter(col("rn") === 1)
      .select(col("session_id"), col("content").as("first_user"))
    meta.join(firstUser, Seq("session_id"), "left")
      .select(col("session_id"), col("message_count"), col("total_words"),
        col("has_code"), coalesce(col("primary_language"), lit("")).as("lang"),
        coalesce(col("first_user"), lit("")).as("first_user"))
      .as[(String, Long, Long, Boolean, String, String)]
      .map { case (sid, n, words, hasCode, lang, firstUserMsg) =>
        val content = s"Chat session $sid: $n messages, $words words" +
          (if (hasCode) s", code-heavy${if (lang.nonEmpty) s" ($lang)" else ""}" else "") +
          s" | ${firstUserMsg.take(300)}"
        Chunk(s"chat::$sid::chat_summary", "metadata", s"chat_$sid", "chat_history",
          "", 0, 0, content, content, Ids.sha256Hex(content), "", "",
          hasImplementation = false)
      }.toDF()
  }
}
