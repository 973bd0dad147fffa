package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LogisticQualitySpec extends SparkSpec {
  import spark.implicits._

  // linearly separable: y = 1 iff x1 > 0.5
  private def mkFeats = (1 to 200).map { i =>
    val x1 = (i % 100) / 100.0
    (if (x1 > 0.5) 1.0 else 0.0, 1.0, x1)
  }.toDF("y", "x0", "x1")

  test("GD on separable data learns the sign structure and improves accuracy") {
    val feats = mkFeats
    val w = LogisticQuality.fit(feats, "y", Seq("x0", "x1"), iters = 5)
    assert(w(1) > 0.0, s"slope must be positive toward y=1, got ${w.toSeq}")
    val acc = feats
      .withColumn("ok", LogisticQuality.predictPos(w.toSeq, Seq("x0", "x1")) === (col("y") === 1.0))
      .agg(avg(col("ok").cast("double"))).head().getDouble(0)
    assert(acc >= 0.7, s"accuracy $acc after 5 steps on separable data")
  }

  test("the fit is deterministic under repartitioning (6dp gradient contract)") {
    val a = LogisticQuality.fit(mkFeats, "y", Seq("x0", "x1"), 3).toSeq
    val b = LogisticQuality.fit(mkFeats.repartition(17), "y", Seq("x0", "x1"), 3).toSeq
    assert(a == b)
  }

  test("first step from zero weights is the 0.5-residual gradient exactly") {
    // σ(0) = 0.5, so w after 1 iter = round(avg((y - 0.5) x), 6)
    val feats = Seq((1.0, 1.0), (0.0, 1.0), (0.0, 1.0), (1.0, 1.0)).toDF("y", "x0")
    val w = LogisticQuality.fit(feats, "y", Seq("x0"), 1)
    assert(w(0) == 0.0) // balanced labels -> zero first gradient
    val w2 = LogisticQuality.fit(Seq((1.0, 1.0), (1.0, 1.0), (0.0, 1.0)).toDF("y", "x0"),
      "y", Seq("x0"), 1)
    assert(w2(0) == 0.166667) // round(avg(0.5, 0.5, -0.5), 6)
  }
}
