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

  test("every grid row carries the same fitted law") {
    val d = docs(0L -> "a b c", 1L -> "a b d", 2L -> "a e f g")
    val g = HeapsLaw.fit(d, "id", split(col("text"), " "), checkpoints = 3)
      .collect()
    assert(g.map(_.getDouble(3)).distinct.length == 1)
    assert(g.map(_.getDouble(4)).distinct.length == 1)
  }
}
