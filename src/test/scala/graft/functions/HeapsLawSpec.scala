package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeapsLawSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("id", "text")

  test("checkpoint grid counts tokens and first-occurrence vocabulary") {
    // ids 0..3; checkpoints at ck=1,2,3,4 (4 checkpoints over max+1=4)
    val d = docs(0L -> "a b", 1L -> "a c", 2L -> "a b c d", 3L -> "e")
    val g = HeapsLaw.fit(d, "id", split(col("text"), " "), checkpoints = 4)
      .orderBy(col("ck")).collect()
    assert(g.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(g.map(_.getLong(1)).toSeq == Seq(2L, 4L, 8L, 9L))   // N(c)
    assert(g.map(_.getLong(2)).toSeq == Seq(2L, 3L, 4L, 5L))   // V(c)
  }

  test("a pure power law is recovered exactly") {
    // construct V = N^0.5: doc i adds tokens so that at each checkpoint
    // ln V = 0.5 ln N + 0 — use N=4,16 with V=2,4 at 2 checkpoints
    val d = docs(
      0L -> "a a a b",                              // N=4, V=2
      1L -> (Seq.fill(10)("a") ++ Seq("c", "d")).mkString(" ")) // N=16, V=4
    val g = HeapsLaw.fit(d, "id", split(col("text"), " "), checkpoints = 2)
      .orderBy(col("ck")).collect()
    val beta = g.head.getDouble(g.head.fieldIndex("beta"))
    val logk = g.head.getDouble(g.head.fieldIndex("log_k"))
    assert(beta == 0.5)
    assert(logk == 0.0)
  }

  test("exact-zero slope is +0.0, never -0.0 (sign-stabilized output)") {
    // saturated vocabulary: V is constant at every checkpoint, so the OLS
    // numerator is a pure cancellation residual whose sign is summation-
    // order luck. The `round(...) + 0.0` edge must pin the bit pattern to
    // +0.0 (r10's q176 flake: DuckDB returned -0.0 and +0.0 across runs).
    val d = docs(0L -> "a b a b", 1L -> "b a a", 2L -> "a b", 3L -> "b a b a")
    val g = HeapsLaw.fit(d, "id", split(col("text"), " "), checkpoints = 4)
      .limit(1).collect().head
    val beta = g.getDouble(g.fieldIndex("beta"))
    assert(beta == 0.0)
    assert(java.lang.Double.doubleToRawLongBits(beta) == 0L,
      s"beta must be +0.0, got bit pattern of $beta")
  }

  test("bigrams: adjacent pairs, short arrays yield empty") {
    val d = Seq("a b c d", "x", "").toDF("t")
      .select(HeapsLaw.bigrams(split(col("t"), " ")).as("bg"))
      .collect().map(_.getSeq[String](0).toList)
    assert(d(0) == List("a b", "b c", "c d"))
    assert(d(1) == Nil)
  }

  test("every grid row carries the same fitted law") {
    val d = docs(0L -> "a b c", 1L -> "a b d", 2L -> "a e f g")
    val g = HeapsLaw.fit(d, "id", split(col("text"), " "), checkpoints = 3)
      .collect()
    assert(g.map(_.getDouble(3)).distinct.length == 1)
    assert(g.map(_.getDouble(4)).distinct.length == 1)
  }
}
