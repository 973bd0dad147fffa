package graft.dedup

import graft.SparkSpec

class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  // 12 tokens each: docs 1 and 2 share their first 9 tokens (two
  // overlapping 8-gram windows); doc 3 is disjoint.
  private val sharedPrefix = "a1 b2 c3 d4 e5 f6 g7 h8 i9"
  private def docs = Seq(
    (1L, s"$sharedPrefix x1 x2 x3"),
    (2L, s"$sharedPrefix y1 y2 y3"),
    (3L, "p1 p2 p3 p4 p5 p6 p7 p8 p9 p0 q1 q2")
  ).toDF("doc_id", "text")

  test("shared 9-token prefix yields two duplicated 8-gram windows covering 9 positions") {
    val rows = DupSpans.coverage(docs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // windows at i=1 and i=2 are shared; they cover positions 1..9
    assert(rows(1L) === ((12L, 2L, 9L, 0.75)))
    assert(rows(2L) === ((12L, 2L, 9L, 0.75)))
  }

  test("a doc with no cross-doc grams reports zero coverage") {
    val rows = DupSpans.coverage(docs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(rows(3L) === ((0L, 0L, 0.0)))
  }

  test("a doc shorter than n contributes no grams but still appears") {
    val short = Seq((1L, "only three tokens"), (2L, "only three tokens")).toDF("doc_id", "text")
    val rows = DupSpans.coverage(short, "doc_id", "text", 8).collect()
    assert(rows.length == 2)
    assert(rows.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L))
  }

  test("duplication WITHIN one doc only does not count as cross-doc") {
    val selfDup = Seq(
      (1L, "r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8"),
      (2L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z0")
    ).toDF("doc_id", "text")
    val rows = DupSpans.coverage(selfDup, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows(1L) == 0L, "repeated gram inside a single doc is not a cross-doc dup")
  }
}
