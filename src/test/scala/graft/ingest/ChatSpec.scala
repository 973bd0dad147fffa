package graft.ingest

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.SparkSpec

class ChatSpec extends SparkSpec {

  private val dir = Files.createTempDirectory("graft_chat").toString

  private def writeJsonl(): Unit = {
    val s1 = Seq(
      """{"sessionId":"s1","role":"user","content":"How do I fix this error in my code?","timestamp":"2024-01-01T10:00:00"}""",
      """{"sessionId":"s1","role":"assistant","content":"Try this:\n```python\ndef fix():\n    pass\n```","timestamp":"2024-01-01T10:01:00"}""",
      """{"sessionId":"s1","role":"user","content":"Thanks, the bug is gone","timestamp":"2024-01-01T10:05:00"}"""
    )
    val s2 = Seq(
      """{"sessionId":"s2","role":"user","content":"Plain chat without any programming.","timestamp":"2024-01-02T09:00:00"}""",
      """{"sessionId":"s2","role":"assistant","content":"Sure, happy to help with that.","timestamp":"2024-01-02T09:02:00"}"""
    )
    Files.writeString(Paths.get(dir, "session1.jsonl"), s1.mkString("\n"))
    Files.writeString(Paths.get(dir, "session2.jsonl"), s2.mkString("\n"))
  }

  private lazy val messages = {
    writeJsonl()
    ChatPipeline.normalize(spark.read.json(s"$dir/*.jsonl"))
  }

  test("normalize: roles, sessions, timestamps from JSONL") {
    val rows = messages.collect()
    assert(rows.length == 5)
    assert(rows.forall(r => Set("user", "assistant").contains(r.getAs[String]("role"))))
    assert(messages.filter(col("session_id") === "s1").count() == 3)
  }

  test("session metadata: counts, words, code detection, primary language") {
    val meta = ChatPipeline.sessionMetadata(messages).collect()
      .map(r => r.getAs[String]("session_id") -> r).toMap
    val s1 = meta("s1")
    assert(s1.getAs[Long]("message_count") == 3)
    assert(s1.getAs[Boolean]("has_code"))
    assert(s1.getAs[String]("primary_language") == "python")
    assert(s1.getAs[java.sql.Timestamp]("start_time").toString.startsWith("2024-01-01 10:00"))
    val s2 = meta("s2")
    assert(!s2.getAs[Boolean]("has_code"))
    assert(s2.getAs[String]("primary_language") == null)
  }

  test("inactive filter by last activity") {
    val meta = ChatPipeline.sessionMetadata(messages)
    // "now" = 2024-01-01 12:00 UTC: s1 ended 10:05 (inactive at 1h), s2 is in the future
    val now = java.time.Instant.parse("2024-01-01T12:00:00Z").getEpochSecond
    val inactive = ChatPipeline.inactiveSessions(meta, now, 1.0).collect()
      .map(_.getAs[String]("session_id")).toSet
    assert(inactive == Set("s1"))
  }

  test("9-category keyword classification with deterministic tie-break") {
    import spark.implicits._
    val df = Seq(
      "hit an error and a traceback while debugging the crash",
      "design the architecture structure of this system module",
      "an idea for a future feature enhancement roadmap",
      "zebra giraffe lion" // no keywords -> general
    ).toDF("text").select(ChatPipeline.classify(col("text")).as("cat"))
    val cats = df.collect().map(_.getString(0)).toSeq
    assert(cats(0) == "debugging_pattern")
    assert(cats(1) == "architecture_pattern")
    assert(cats(2) == "ideas")
    assert(cats(3) == "general")
  }

  test("chat chunks: one summary per session, deterministic ids") {
    val meta = ChatPipeline.sessionMetadata(messages)
    val chunks = ChatPipeline.chatChunks(meta, messages).collect()
    assert(chunks.length == 2)
    val byId = chunks.map(r => r.getAs[String]("chunkId") -> r).toMap
    val s1 = byId("chat::s1::chat_summary")
    assert(s1.getAs[String]("entityType") == "chat_history")
    assert(s1.getAs[String]("content").contains("3 messages"))
    assert(s1.getAs[String]("content").contains("code-heavy (python)"))
    assert(s1.getAs[String]("content").contains("How do I fix this error"))
  }

  test("deterministic summarizer: extractive summary + frequency-ranked topics") {
    val s = DeterministicSummarizer(summaryChars = 10, topicCount = 2)
      .summarize("x", "alpha beta alpha gamma beta alpha tiny")
    assert(s.summary == "alpha beta") // leading excerpt
    // alpha×3, beta×2; "tiny" loses on count, len>3 filter drops nothing else
    assert(s.topics == Seq("alpha", "beta"))
    // stopwords and short tokens never become topics
    val t = DeterministicSummarizer(200, 3).summarize("y", "this that with from it is a code")
    assert(t.topics == Seq("code"))
  }

  test("summarization stage: transcript build, mapPartitions summarize, chunk pair") {
    val tr = ChatPipeline.transcripts(messages)
    val trMap = tr.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // messages render in ts order as "role: content"
    assert(trMap("s1").startsWith("user: How do I fix this error"))
    assert(trMap("s1").contains("assistant: Try this"))

    val summaries = ChatPipeline.summarizeSessions(tr, DeterministicSummarizer(50, 3))
    val chunks = ChatPipeline.summaryChunks(summaries).collect()
    assert(chunks.length == 4) // 2 sessions × (chat_summary + chat_detail)
    val byId = chunks.map(r => r.getAs[String]("chunkId") -> r).toMap
    val sum1 = byId("chat::s1::chat_summary")
    assert(sum1.getAs[String]("chunkType") == "metadata")
    assert(sum1.getAs[String]("content").contains("topics:"))
    val det1 = byId("chat::s1::chat_detail")
    assert(det1.getAs[String]("chunkType") == "implementation")
    assert(det1.getAs[String]("content").startsWith("user: How do I fix"))
  }
}
