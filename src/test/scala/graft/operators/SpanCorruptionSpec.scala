package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanCorruptionSpec extends SparkSpec {
  import spark.implicits._

  private def build(rows: (Long, String)*) =
    SpanCorruption.build(rows.toSeq.toDF("id", "text"), "id", "text")

  test("cuts the middle ~15% span and sentinels both sides") {
    val r = build(1L -> "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10").collect().head
    // n=10 → len=1, start = floor(9/2)+1 = 5
    assert(r.getLong(r.fieldIndex("span_start")) == 5L)
    assert(r.getLong(r.fieldIndex("span_len")) == 1L)
    assert(r.getString(r.fieldIndex("inputs")) ==
      "t1 t2 t3 t4 <extra_id_0> t6 t7 t8 t9 t10")
    assert(r.getString(r.fieldIndex("targets")) == "<extra_id_0> t5")
  }

  test("longer documents get proportionally longer spans") {
    val toks = (1 to 20).map(i => s"w$i").mkString(" ")
    val r = build(1L -> toks).collect().head
    // n=20 → len=3, start = floor(17/2)+1 = 9
    assert(r.getLong(r.fieldIndex("span_len")) == 3L)
    assert(r.getString(r.fieldIndex("targets")) == "<extra_id_0> w9 w10 w11")
    // inputs + targets jointly carry every original token exactly once
    val inToks = r.getString(r.fieldIndex("inputs")).split(" ").filterNot(_ == "<extra_id_0>")
    val tgToks = r.getString(r.fieldIndex("targets")).split(" ").drop(1)
    assert((inToks ++ tgToks).sorted.toSeq == (1 to 20).map(i => s"w$i").sorted.toSeq)
  }

  test("short documents are excluded") {
    assert(build(1L -> "a b c d e f").count() == 0)
    assert(build(1L -> "a b c d e f g").count() == 1)
  }
}
