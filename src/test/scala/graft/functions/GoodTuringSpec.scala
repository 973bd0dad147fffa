package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GoodTuringSpec extends SparkSpec {
  import spark.implicits._

  private def report(texts: String*) =
    GoodTuring.report(texts.toSeq.toDF("text"),
      split(col("text"), " ")).collect().head

  test("sufficient statistics: N, V, f1, f2") {
    // counts: a=3, b=2, c=1, d=1 → N=7 V=4 f1=2 f2=1
    val r = report("a a a b", "b c d")
    assert(r.getLong(0) == 7L && r.getLong(1) == 4L)
    assert(r.getLong(2) == 2L && r.getLong(3) == 1L)
  }

  test("missing mass is f1/N; chao1 adds f1^2/(2 f2)") {
    val r = report("a a a b", "b c d")
    assert(r.getDouble(r.fieldIndex("p_unseen")) == math.round(2.0 / 7.0 * 1e6) / 1e6)
    // chao1 = 4 + 4/(2*1) = 6
    assert(r.getDouble(r.fieldIndex("chao1")) == 6.0)
  }

  test("chao1 is undefined (null) when no doubletons exist") {
    val r = report("a a a", "b c")
    assert(r.getLong(3) == 0L)
    assert(r.isNullAt(r.fieldIndex("chao1")))
  }

  test("saturated corpus: no singletons, zero missing mass") {
    val r = report("a a b b")
    assert(r.getLong(2) == 0L)
    assert(r.getDouble(r.fieldIndex("p_unseen")) == 0.0)
  }
}
