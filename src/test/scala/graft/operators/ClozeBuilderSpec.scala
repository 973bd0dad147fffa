package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClozeBuilderSpec extends SparkSpec {
  import spark.implicits._

  private def build(rows: (Long, String)*) =
    ClozeBuilder.build(rows.toSeq.toDF("id", "text"), "id", "text")

  test("masks the ceil(n/2)-th token and reports it as the answer") {
    val r = build(1L -> "alpha beta gamma delta").collect().head
    // n=4 → k=2: "beta" is masked
    assert(r.getLong(r.fieldIndex("n_tokens")) == 4L)
    assert(r.getString(r.fieldIndex("answer")) == "beta")
    assert(r.getString(r.fieldIndex("masked")) == "alpha <mask> gamma delta")
  }

  test("odd token counts mask the exact middle") {
    val r = build(1L -> "a b c d e").collect().head
    assert(r.getString(r.fieldIndex("answer")) == "c")
    assert(r.getString(r.fieldIndex("masked")) == "a b <mask> d e")
  }

  test("short documents are dropped; whitespace runs collapse") {
    assert(build(1L -> "one two").count() == 0)
    val r = build(2L -> "  one   two\tthree  ").collect().head
    assert(r.getLong(r.fieldIndex("n_tokens")) == 3L)
    assert(r.getString(r.fieldIndex("answer")) == "two")
  }

  test("deterministic: same input, same pairs") {
    val a = build(1L -> "w1 w2 w3 w4 w5 w6 w7").collect().head
    val b = build(1L -> "w1 w2 w3 w4 w5 w6 w7").collect().head
    assert(a == b)
    assert(a.getString(a.fieldIndex("answer")) == "w4")
  }
}
