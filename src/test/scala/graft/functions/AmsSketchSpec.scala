package graft.functions

import graft.SparkSpec

class AmsSketchSpec extends SparkSpec {
  import spark.implicits._

  test("single type: every estimator is exact (ratio 1)") {
    val docs = Seq("xx xx xx xx xx").toDF("text") // f = 5, F2 = 25
    val rows = AmsSketch.f2(docs, "text", 8).collect()
    assert(rows.length == 8)
    assert(rows.forall(r => math.abs(r.getAs[Long]("y")) == 5L))
    assert(rows.forall(_.getAs[Long]("f2_exact") == 25L))
    assert(rows.forall(_.getAs[Double]("ratio") == 1.0))
    assert(rows.forall(r => r.getAs[Double]("y_sq") == 25.0))
  }

  test("two types: y lands on the ±f1±f2 lattice, F2 exact") {
    val docs = Seq("aa aa aa bb bb").toDF("text") // f = 3, 2 → F2 = 13
    val rows = AmsSketch.f2(docs, "text", 16).collect()
    assert(rows.forall(_.getAs[Long]("f2_exact") == 13L))
    assert(rows.forall(r => Set(-5L, -1L, 1L, 5L)(r.getAs[Long]("y"))))
    // md5 signs must not collapse to one point of the lattice
    assert(rows.map(r => math.abs(r.getAs[Long]("y"))).distinct.length == 2)
  }

  test("estimates are deterministic across partitionings") {
    val docs = (0 until 50)
      .map(i => s"t${i % 7} t${i % 7} t${i % 3} filler word$i")
      .toDF("text")
    val runs = (1 to 3).map { p =>
      AmsSketch.f2(docs.repartition(p * 4), "text", 16)
        .collect().map(_.toSeq).toSeq
    }
    assert(runs.distinct.size == 1)
  }

  test("mean of y_sq over estimators brackets F2 within 3x") {
    // not a statistical assertion so much as a sanity rail: the signs
    // must be balanced enough that the estimator is in the right decade
    val docs = (0 until 60).map(i => s"w${i % 11} w${i % 5} w${i % 2}")
      .toDF("text")
    val rows = AmsSketch.f2(docs, "text", 16).collect()
    val f2 = rows.head.getAs[Long]("f2_exact").toDouble
    val mean = rows.map(_.getAs[Double]("y_sq")).sum / rows.length
    assert(mean > f2 / 3 && mean < f2 * 3, s"mean $mean vs F2 $f2")
  }
}
