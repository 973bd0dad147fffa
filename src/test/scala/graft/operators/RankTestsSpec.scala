package graft.operators

import graft.SparkSpec

class RankTestsSpec extends SparkSpec {
  import spark.implicits._

  private def mw(rows: Seq[(Int, Double)]) =
    RankTests.mannWhitney(rows.toDF("g", "v"), "g", "v").collect().head

  test("identical distributions: U centers at n0*n1/2, z near 0, effect 0.5") {
    val rows = (1 to 100).map(i => (i % 2, (i / 2).toDouble))
    val r = mw(rows)
    assert(r.getAs[Long]("n0") == 50L && r.getAs[Long]("n1") == 50L)
    assert(math.abs(r.getAs[Double]("effect") - 0.5) < 0.05)
    assert(math.abs(r.getAs[Double]("z")) < 1.0)
  }

  test("complete separation: effect 1.0 and a large positive z") {
    // group 1 strictly above group 0
    val rows = (1 to 40).map(i => (0, i.toDouble)) ++
      (1 to 40).map(i => (1, 1000.0 + i))
    val r = mw(rows)
    assert(r.getAs[Double]("effect") == 1.0)
    assert(r.getAs[Double]("z") > 5.0)
    // U1 = n0*n1 exactly at full separation
    assert(r.getAs[Double]("u1") == 1600.0)
  }

  test("ties get midranks: all-equal values give effect 0.5 exactly") {
    val rows = (1 to 30).map(i => (i % 2, 7.0))
    val r = mw(rows)
    assert(r.getAs[Double]("effect") == 0.5)
    // rank sum of group 1: 15 values at midrank 15.5
    assert(r.getAs[Double]("rank_sum_1") == 15 * 15.5)
  }

  test("direction: shifting group 1 down flips the z sign") {
    val up = mw((1 to 60).map(i => (i % 2, if (i % 2 == 1) 10.0 + i else i.toDouble)))
    val dn = mw((1 to 60).map(i => (i % 2, if (i % 2 == 1) i.toDouble - 10.0 else i.toDouble)))
    assert(up.getAs[Double]("z") > 0)
    assert(dn.getAs[Double]("z") < 0)
  }
}
