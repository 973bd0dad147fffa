package graft.operators

import graft.SparkSpec

class LinkPredictSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("path graph: the two 2-hop pairs score 1/ln(2)") {
    // 1-2-3-4: candidates (1,3) via 2 and (2,4) via 3, both deg-2 bridges
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val rows = LinkPredict.scores(e, "src", "dst", 10).collect()
    assert(rows.length == 2)
    assert(rows.map(r => (r.getAs[Long]("u"), r.getAs[Long]("w"))).toSeq ==
      Seq((1L, 3L), (2L, 4L)))
    for (r <- rows) {
      assert(r.getAs[Long]("cn") == 1L)
      assert(r.getAs[Double]("adamic_adar") == r6(1.0 / math.log(2.0)))
      assert(r.getAs[Double]("jaccard") == 0.5) // 1/(1+2-1)
      assert(r.getAs[Long]("pref_attach") == 2L)
    }
  }

  test("adjacent pairs are excluded; directed duplicates collapse") {
    // triangle 1-2-3 plus 3-4, with a reversed duplicate edge
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val rows = LinkPredict.scores(e, "src", "dst", 10).collect()
    val pairs = rows.map(r => (r.getAs[Long]("u"), r.getAs[Long]("w"))).toSet
    assert(pairs == Set((1L, 4L), (2L, 4L))) // only the via-3 candidates
    // deg(3) = 3 → AA = 1/ln 3
    assert(rows.forall(_.getAs[Double]("adamic_adar") == r6(1.0 / math.log(3.0))))
  }

  test("scores are replay-stable across partitionings") {
    val e = (0L until 40L).map(i => (i % 10, (i * 7 + 3) % 10))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    val runs = (1 to 3).map { p =>
      LinkPredict.scores(e.repartition(p * 3), "src", "dst", 15)
        .collect().map(_.toSeq).toSeq
    }
    assert(runs.distinct.size == 1)
  }
}
