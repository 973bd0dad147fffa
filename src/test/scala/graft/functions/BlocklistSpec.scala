package graft.functions

import graft.SparkSpec

class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private val severe = Seq("bad")
  private val mild = Seq("meh", "ugh")

  test("whole-token matching only — substrings do not hit") {
    val docs = Seq(
      (1L, "s1", "badge embedded notbad fine"),   // 'bad' only as substring
      (2L, "s1", "this is bad text")
    ).toDF("doc_id", "source", "text")
    val tagged = Blocklist.tag(docs, "text", severe, mild, 2)
      .select("doc_id", "severe_hits", "admitted")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(tagged(1L) === ((0L, true)), "substring 'bad' inside 'badge' must not match")
    assert(tagged(2L) === ((1L, false)))
  }

  test("mild hits admit up to the tolerance, reject past it") {
    val docs = Seq(
      (1L, "s1", "meh once is fine"),
      (2L, "s1", "meh meh twice still fine"),
      (3L, "s1", "meh meh ugh three is too many")
    ).toDF("doc_id", "source", "text")
    val admitted = Blocklist.tag(docs, "text", severe, mild, 2)
      .collect().map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("admitted"))).toMap
    assert(admitted(1L) && admitted(2L) && !admitted(3L))
  }

  test("terms are lowercased for matching; un-normalizable terms are rejected loudly") {
    val docs = Seq((1L, "s1", "this is bad text")).toDF("doc_id", "source", "text")
    // uppercase list entry still matches the lowercased token stream
    val row = Blocklist.tag(docs, "text", Seq("BAD"), Nil, 2).collect().head
    assert(row.getLong(row.fieldIndex("severe_hits")) == 1L)
    // a term that can never survive tokenization must throw, not silently admit
    val err = intercept[IllegalArgumentException] {
      Blocklist.tag(docs, "text", Seq("foo-bar"), Nil, 2)
    }
    assert(err.getMessage.contains("foo-bar"))
  }

  test("repeated occurrences count individually, and the report rolls up per source") {
    val docs = Seq(
      (1L, "a", "bad bad bad"),
      (2L, "a", "clean text here"),
      (3L, "b", "meh ugh meh ugh")
    ).toDF("doc_id", "source", "text")
    val rep = Blocklist.report(docs, "source", "text", severe, mild, 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // source a: 2 docs, 1 admitted, 3 severe hits, 0 mild, 1 severe doc
    assert(rep("a") === ((2L, 1L, 3L, 0L, 1L)))
    // source b: 1 doc, 0 admitted (4 mild > 2), 0 severe, 4 mild hits
    assert(rep("b") === ((1L, 0L, 0L, 4L, 0L)))
  }
}
