package graft.operators

import graft.SparkSpec

class BayesAbSpec extends SparkSpec {
  import spark.implicits._

  private def arms(n0: Int, k0: Int, n1: Int, k1: Int) = {
    val rows = Seq.fill(k0)((0L, 1L)) ++ Seq.fill(n0 - k0)((0L, 0L)) ++
      Seq.fill(k1)((1L, 1L)) ++ Seq.fill(n1 - k1)((1L, 0L))
    rows.toDF("variant", "hit")
  }

  test("symmetric arms: P(p1 > p0) = 0.5 by symmetry, zero lift") {
    val r = BayesAb.betaBinomial(arms(40, 10, 40, 10), "variant", "hit")
      .collect().head
    assert(r.getAs[Double]("lift") == 0.0)
    // the exclusive-cum convention shaves the diagonal mass equally on
    // both sides, so identical arms sit just under 0.5
    val p = r.getAs[Double]("p_beats")
    assert(p > 0.4 && p < 0.5, s"p_beats = $p")
    assert(r.getAs[Double]("mean0") == r.getAs[Double]("mean1"))
  }

  test("dominant B: posterior probability concentrates near 1") {
    val r = BayesAb.betaBinomial(arms(100, 10, 100, 40), "variant", "hit")
      .collect().head
    assert(r.getAs[Double]("p_beats") > 0.999)
    assert(r.getAs[Double]("lift") ==
      BigDecimal(41.0 / 102 - 11.0 / 102)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("dominant A mirrors dominant B (grid symmetry)") {
    val b = BayesAb.betaBinomial(arms(100, 10, 100, 40), "variant", "hit")
      .collect().head.getAs[Double]("p_beats")
    val a = BayesAb.betaBinomial(arms(100, 40, 100, 10), "variant", "hit")
      .collect().head.getAs[Double]("p_beats")
    assert(a < 0.001 && b > 0.999)
  }

  test("posterior is replay-stable across partitionings") {
    val df = arms(60, 20, 60, 30)
    val runs = (1 to 3).map { p =>
      BayesAb.betaBinomial(df.repartition(p * 4), "variant", "hit")
        .collect().head.toSeq
    }
    assert(runs.distinct.size == 1)
  }
}
