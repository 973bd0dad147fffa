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
}
