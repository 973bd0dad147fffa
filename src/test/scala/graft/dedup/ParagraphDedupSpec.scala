package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  test("paragraphs: blank-line split, trim, drop empties") {
    val docs = Seq((1L, "first para\n\n\n  second para  \n\nthird")).toDF("doc_id", "text")
    val out = ParagraphDedup.paragraphs(docs, "doc_id", "text")
      .orderBy("idx").select("para").as[String].collect().toSeq
    assert(out == Seq("first para", "second para", "third"))
  }

  test("keepFirst: first occurrence by (doc, idx) owns the content; scrub drops repeats") {
    val docs = Seq(
      (1L, "license header\n\nunique one"),
      (2L, "license header\n\nunique two"),
      (3L, "license header")
    ).toDF("doc_id", "text")
    val marked = ParagraphDedup.keepFirst(
      ParagraphDedup.paragraphs(docs, "doc_id", "text"), "doc_id")
    val kept = marked.filter(col("kept"))
      .select("doc_id", "para").as[(Long, String)].collect().toSet
    assert(kept == Set((1L, "license header"), (1L, "unique one"), (2L, "unique two")))

    val scrubbed = ParagraphDedup.scrub(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(scrubbed(1L) == "license header\n\nunique one")
    assert(scrubbed(2L) == "unique two")
    assert(!scrubbed.contains(3L)) // every paragraph was a repeat
  }

  test("wordBlocks: 0-indexed fixed blocks with ragged tail; empty text -> no rows") {
    val docs = Seq((1L, "aa bb cc dd ee"), (2L, "")).toDF("doc_id", "text")
    val out = ParagraphDedup.wordBlocks(docs, "doc_id", "text", 2)
      .orderBy("doc_id", "idx").select("doc_id", "idx", "para")
      .as[(Long, Int, String)].collect().toSeq
    assert(out == Seq((1L, 0, "aa bb"), (1L, 1, "cc dd"), (1L, 2, "ee")))
  }

  test("boilerplate: per-group df bar drops ALL occurrences, scoped to the group") {
    // "nav chrome" repeats in 3 docs of source A → boilerplate there;
    // the SAME content in only 2 docs of source B stays (df below bar)
    val paras = Seq(
      (1L, "A", 0, "nav chrome"), (1L, "A", 1, "body one"),
      (2L, "A", 0, "nav chrome"), (2L, "A", 1, "body two"),
      (3L, "A", 0, "nav chrome"),
      // duplicate WITHIN one doc must not inflate the distinct-doc df
      (4L, "B", 0, "nav chrome"), (4L, "B", 1, "nav chrome"),
      (5L, "B", 0, "nav chrome")
    ).toDF("doc_id", "source", "idx", "para")
    val out = ParagraphDedup.boilerplate(paras, "doc_id", "source", 3)
      .select("doc_id", "idx", "boiler").as[(Long, Int, Boolean)].collect().toSet
    assert(out == Set(
      (1L, 0, true), (1L, 1, false),
      (2L, 0, true), (2L, 1, false),
      (3L, 0, true),
      (4L, 0, false), (4L, 1, false),
      (5L, 0, false)))
  }
}
