package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TDigestSpec extends SparkSpec {
  import spark.implicits._
  import TDigestSketch._

  // deterministic heavy-tailed sample: exp of a hash-derived uniform
  private def sample(n: Int): Seq[Double] =
    (1 to n).map { i =>
      val u = ((i * 2654435761L) & 0x7fffffffL).toDouble / Int.MaxValue
      math.exp(6.0 * u) // spans ~1 .. 400
    }

  private def rankError(values: Seq[Double], est: Double, q: Double): Double = {
    val sorted = values.sorted
    val below = sorted.count(_ <= est).toDouble / sorted.size
    math.abs(below - q)
  }

  test("rank error stays under 2% at the median and under 1% in the tails") {
    val vals = sample(20000)
    val df = vals.map(("g", _)).toDF("grp", "v")
    val digest = sketch(df, "grp", "v").collect().head.getSeq[Double](1).toArray
    for ((q, tol) <- Seq(0.5 -> 0.02, 0.9 -> 0.02, 0.99 -> 0.01, 0.999 -> 0.01)) {
      val e = rankError(vals, quantile(digest, q), q)
      assert(e <= tol, f"q=$q rank error $e%.4f")
    }
  }

  test("digest size is bounded regardless of input size") {
    val small = sketch(sample(500).map(("g", _)).toDF("grp", "v"), "grp", "v")
      .collect().head.getSeq[Double](1).size
    val big = sketch(sample(50000).map(("g", _)).toDF("grp", "v"), "grp", "v")
      .collect().head.getSeq[Double](1).size
    assert(big / 2 <= 2 * Compression, s"${big / 2} centroids")
    assert(small <= big * 2 + 4)
  }

  test("shard digests merge into (approximately) the union's digest") {
    val vals = sample(12000)
    val (a, b) = vals.splitAt(5000)
    val da = sketch(a.map(("g", _)).toDF("grp", "v"), "grp", "v")
    val db = sketch(b.map(("g", _)).toDF("grp", "v"), "grp", "v")
    val merged = merge(da, db).collect().head.getSeq[Double](1).toArray
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val e = rankError(vals, quantile(merged, q), q)
      assert(e <= 0.025, f"merged q=$q rank error $e%.4f")
    }
    // total weight is conserved exactly (weights are sums of 1.0)
    val w = merged.grouped(2).map(_(1)).sum
    assert(w == vals.size.toDouble)
  }

  test("quantile estimates are monotone in q and clamp at the extremes") {
    val vals = sample(5000)
    val digest = sketch(vals.map(("g", _)).toDF("grp", "v"), "grp", "v")
      .collect().head.getSeq[Double](1).toArray
    val qs = (0 to 20).map(_ / 20.0)
    val es = qs.map(quantile(digest, _))
    es.zip(es.tail).foreach { case (x, y) => assert(x <= y + 1e-9) }
    assert(es.head >= vals.min - 1e-9 && es.last <= vals.max + 1e-9)
  }

  test("tiny groups are exact: digest of <= compression points keeps every value") {
    val vals = Seq(1.0, 2.0, 5.0, 9.0)
    val digest = sketch(vals.map(("g", _)).toDF("grp", "v"), "grp", "v")
      .collect().head.getSeq[Double](1).toArray
    // extremes are exact on singleton centroids
    assert(quantile(digest, 0.0) == 1.0)
    assert(quantile(digest, 1.0) == 9.0)
  }
}
