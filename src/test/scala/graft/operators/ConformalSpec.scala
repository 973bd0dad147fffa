package graft.operators

import graft.SparkSpec

class ConformalSpec extends SparkSpec {
  import spark.implicits._

  test("threshold is the ceil((n+1)(1-alpha))-th smallest calibration score") {
    // n=9, alpha=1/10: k = ceil(10*0.9) = 9 -> the 9th of 9 scores
    val cal = (1 to 9).map(i => ("k", i.toLong, i * 10L)).toDF("g", "id", "s")
    val test = (1 to 4).map(i => ("k", 100L + i, 25L + i)).toDF("g", "id", "s")
    val r = Conformal.splitThreshold(cal, test, "g", "id", "s", 1L, 10L)
      .collect().head
    assert(r.getAs[Long]("k") == 9L)
    assert(r.getAs[Long]("threshold") == 90L)
    assert(r.getAs[Long]("n_covered") == 4L && r.getAs[Double]("coverage") == 1.0)
  }

  test("tiny calibration sample (k > n) surfaces the +inf threshold as NULL") {
    // n=3, alpha=1/10: k = ceil(4*0.9) = 4 > 3
    val cal = (1 to 3).map(i => ("k", i.toLong, i * 10L)).toDF("g", "id", "s")
    val test = Seq(("k", 99L, 1000000L)).toDF("g", "id", "s")
    val r = Conformal.splitThreshold(cal, test, "g", "id", "s", 1L, 10L)
      .collect().head
    assert(r.getAs[Long]("k") == 4L)
    assert(r.isNullAt(r.fieldIndex("threshold")))
    // +inf threshold covers everything, preserving the guarantee
    assert(r.getAs[Long]("n_covered") == 1L)
  }

  test("coverage hits at least 1-alpha on an exchangeable split") {
    // scores 1..200 hash-split in half: the conformal guarantee is
    // distribution-free, so empirical coverage must be >= ~0.9 - noise
    val all = (1 to 200).map(i => ("g", i.toLong, ((i * 7919) % 1000).toLong))
    val (cal, test) = all.partition(_._2 % 2 == 0)
    val r = Conformal.splitThreshold(cal.toDF("g", "id", "s"),
      test.toDF("g", "id", "s"), "g", "id", "s", 1L, 10L).collect().head
    assert(r.getAs[Double]("coverage") >= 0.85, r.getAs[Double]("coverage"))
  }
}
