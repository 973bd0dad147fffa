package graft.dedup

import graft.SparkSpec

class LshPlannerSpec extends SparkSpec {

  private lazy val top = LshPlanner.plan(spark, totalPerms = 128,
    thresholdPct = 70, topK = 10).collect()

  test("every ranked config is feasible and scored in [0, 2]") {
    assert(top.length == 10)
    top.foreach { r =>
      assert(r.getAs[Long]("b") * r.getAs[Long]("r") <= 128)
      val s = r.getAs[Double]("score")
      assert(s >= 0.0 && s <= 2.0, s)
    }
    // ranks are 1..10 in order
    assert(top.map(_.getAs[Long]("rank")).toSeq == (1L to 10L))
  }

  test("the winner's S-curve midpoint sits near the 0.7 target") {
    val best = top.head
    val (b, r) = (best.getAs[Long]("b").toDouble, best.getAs[Long]("r").toDouble)
    // the curve's 50% point is (1/b)^(1/r); a good plan centers it on t
    val mid = math.pow(1.0 / b, 1.0 / r)
    assert(math.abs(mid - 0.7) < 0.1, s"b=$b r=$r mid=$mid")
  }

  test("degenerate single-band plans never win: b=1,r=1 scores far worse") {
    val all = LshPlanner.plan(spark, 128, 70, topK = 1024).collect()
    val trivial = all.find(x => x.getAs[Long]("b") == 1 && x.getAs[Long]("r") == 1).get
    val best = all.minBy(_.getAs[Long]("rank"))
    // identity p(s)=s integrates to 0.29 at t=0.7; a tuned plan is ~4x tighter
    assert(trivial.getAs[Double]("score") > 3 * best.getAs[Double]("score"))
  }
}
