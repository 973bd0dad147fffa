package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SortedNeighborsSpec extends SparkSpec {
  import spark.implicits._

  private val firstToken = lower(split(col("text"), "\\s+")(0))

  private def report(rows: Seq[(Long, String)], thr: Double = 0.5) =
    SortedNeighbors.report(rows.toDF("id", "text"), "id", "text",
      firstToken, threshold = thr)

  test("adjacent near-dups in the same block are caught") {
    val rows = Seq(
      (1L, "apple pie with sugar and cream"),
      (2L, "apple pie with sugar and butter"),   // 5/7 shared with #1
      (3L, "apple strudel vienna style dessert"))
    val r = report(rows).collect().head
    assert(r.getLong(r.fieldIndex("n_docs")) == 3L)
    assert(r.getLong(r.fieldIndex("n_pairs")) == 2L)
    assert(r.getLong(r.fieldIndex("n_dups")) == 1L)
  }

  test("different blocks never compare") {
    val rows = Seq(
      (1L, "apple pie with sugar"),
      (2L, "banana pie with sugar"))  // near-dup but different first token
    val r = report(rows)
    assert(r.count() == 2)
    assert(r.agg(sum(col("n_pairs"))).collect().head.getLong(0) == 0L)
  }

  test("micro jaccard is the ratio of integer sums") {
    val rows = Seq(
      (1L, "apple aa bb"),
      (2L, "apple aa bb"),     // identical: inter 3 union 3
      (3L, "apple xx yy zz"))  // vs #2 sorted order: inter 1 union 6
    val r = report(rows).collect().head
    // sorted by text: "apple aa bb","apple aa bb","apple xx yy zz"
    assert(r.getDouble(r.fieldIndex("micro_jaccard")) ==
      math.round((3.0 + 1.0) / (3.0 + 6.0) * 1e6) / 1e6)
    assert(r.getDouble(r.fieldIndex("max_jaccard")) == 1.0)
  }

  test("single-doc blocks report no pairs and null stats") {
    val r = report(Seq((1L, "unique text here"))).collect().head
    assert(r.getLong(r.fieldIndex("n_pairs")) == 0L)
    assert(r.isNullAt(r.fieldIndex("micro_jaccard")))
    assert(r.isNullAt(r.fieldIndex("max_jaccard")))
  }
}
