package graft.operators

import graft.SparkSpec

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("textbook product-limit: deaths at 1 and 3, censor at 2") {
    // subjects: durations (1,e) (2,c) (3,e) (3,e) (4,c)
    val d = Seq((1L, 1L), (2L, 0L), (3L, 1L), (3L, 1L), (4L, 0L))
    val rows = Survival.kaplanMeier(d.toDF("dur", "ev"), "dur", "ev")
      .collect().map(r => (r.getAs[Long]("t"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("d"), r.getAs[Double]("survival")))
    // t=1: n=5, d=1 → S=0.8 ; t=3: n=3, d=2 → S=0.8·(1/3)=0.266667
    assert(rows.toSeq == Seq((1L, 5L, 1L, 0.8), (3L, 3L, 2L, 0.266667)))
  }

  test("censored-only rows never appear; survival hits +0.0 when all die") {
    val d = Seq((1L, 1L), (2L, 1L), (2L, 1L))
    val rows = Survival.kaplanMeier(d.toDF("dur", "ev"), "dur", "ev").collect()
    val last = rows.last
    assert(last.getAs[Double]("survival") == 0.0)
    assert(java.lang.Double.doubleToRawLongBits(last.getAs[Double]("survival")) == 0L,
      "all-die survival must be +0.0, not -0.0")
    val c = Seq((5L, 0L), (6L, 0L))
    assert(Survival.kaplanMeier(c.toDF("dur", "ev"), "dur", "ev").collect().isEmpty)
  }

  test("survival is nonincreasing and replay-stable") {
    val d = (1L to 500L).map(i => ((i * 31L) % 40L, i % 4 match {
      case 0 => 0L
      case _ => 1L
    }))
    val runs = (1 to 3).map { i =>
      Survival.kaplanMeier(d.toDF("dur", "ev").repartition(1 + i * 2), "dur", "ev")
        .orderBy("t").collect().map(_.toSeq).toSeq
    }
    assert(runs.distinct.size == 1)
    val surv = runs.head.map(_(4).asInstanceOf[Double])
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a })
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("nelson-aalen: hand-computed hazard and Breslow survival") {
    // same subjects as the KM textbook case: (1,e) (2,c) (3,e) (3,e) (4,c)
    val d = Seq((1L, 1L), (2L, 0L), (3L, 1L), (3L, 1L), (4L, 0L))
    val rows = Survival.nelsonAalen(d.toDF("dur", "ev"), "dur", "ev")
      .collect()
    assert(rows.length == 2)
    val h1 = 1.0 / 5
    val h3 = h1 + 2.0 / 3
    assert(rows(0).getAs[Double]("na_hazard") == r6(h1))
    assert(rows(0).getAs[Double]("breslow_surv") == r6(math.exp(-h1)))
    assert(rows(1).getAs[Double]("na_hazard") == r6(h3))
    assert(rows(1).getAs[Double]("breslow_surv") == r6(math.exp(-h3)))
    assert(rows(1).getAs[Long]("n_risk") == 3L)
  }

  test("log-rank: hand-computed two-group O/E/V") {
    // g0: (1,e) (3,e) ; g1: (2,e) (4,c)
    val d = Seq((1L, 1L, 0L), (3L, 1L, 0L), (2L, 1L, 1L), (4L, 0L, 1L))
    val row = Survival.logRank(d.toDF("dur", "ev", "g"), "dur", "ev", "g")
      .collect().head
    // t=1: n=4 n1=2 d=1 → E1 += 0.5,      V += 1·2·2·3/(16·3)
    // t=2: n=3 n1=2 d=1 → E1 += 2/3,      V += 1·2·1·2/(9·2)
    // t=3: n=2 n1=1 d=1 → E1 += 0.5,      V += 1·1·1·1/(4·1)
    // t=4: d=0 → nothing
    val e1 = 0.5 + 2.0 / 3 + 0.5
    val v = 0.25 + 4.0 / 18 + 0.25
    assert(row.getAs[Long]("o1") == 1L)
    assert(row.getAs[Double]("e1") == r6(e1))
    assert(row.getAs[Double]("v") == r6(v))
    assert(row.getAs[Double]("z") == r6((1L - e1) / math.sqrt(v)))
    assert(row.getAs[Double]("chi2") == r6(math.pow(1L - e1, 2) / v))
  }

  test("log-rank: one-group input yields NULL z, not a divide error") {
    val d = Seq((1L, 1L, 1L), (2L, 1L, 1L), (3L, 0L, 1L))
    val row = Survival.logRank(d.toDF("dur", "ev", "g"), "dur", "ev", "g")
      .collect().head
    assert(row.isNullAt(row.fieldIndex("z")))
    assert(row.isNullAt(row.fieldIndex("chi2")))
    assert(row.getAs[Long]("o1") == 2L)
  }
}
