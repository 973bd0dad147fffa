package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HillTailSpec extends SparkSpec {
  import spark.implicits._

  test("alpha = k / sum(ln(x_i/x_k1)) over the top-k frequencies") {
    // counts: a=8, b=4, c=2, d=1, e=1 → k=2: x1=8, x2=4, x3=2
    val docs = Seq("a a a a a a a a b b b b c c d e").toDF("text")
    val r = HillTail.estimate(docs, split(col("text"), " "), k = 2)
      .collect().head
    assert(r.getLong(r.fieldIndex("k")) == 2L)
    assert(r.getLong(r.fieldIndex("x_k1")) == 2L)
    val expected = 2.0 / (math.log(8.0 / 2) + math.log(4.0 / 2))
    assert(r.getDouble(r.fieldIndex("alpha")) == math.round(expected * 1e6) / 1e6.toDouble)
  }

  test("inv_alpha is the mean log ratio (the implied Zipf exponent)") {
    val docs = Seq("a a a a b b c").toDF("text")
    val r = HillTail.estimate(docs, split(col("text"), " "), k = 2)
      .collect().head
    val s = math.log(4.0 / 1) + math.log(2.0 / 1)
    assert(r.getDouble(r.fieldIndex("inv_alpha")) == math.round(s / 2 * 1e6) / 1e6.toDouble)
  }

  test("ties at the threshold break deterministically by token") {
    // a=2, b=2, c=2: k=2 takes a,b; threshold c=2 → all ratios 1 → sum 0
    val docs = Seq("a a b b c c").toDF("text")
    val r = HillTail.estimate(docs, split(col("text"), " "), k = 2)
      .collect().head
    assert(r.getLong(r.fieldIndex("x_k1")) == 2L)
    // a perfectly flat tail has no finite index → null, not an error
    assert(r.isNullAt(r.fieldIndex("alpha")))
  }
}
