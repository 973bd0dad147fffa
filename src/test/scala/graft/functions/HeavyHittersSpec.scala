package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("exact heavy hitters survive an adversarial long tail of distinct singletons") {
    // 8000 distinct noise tokens (each once) + two hot tokens: the sketch
    // may not track any given noise token, but the MG guarantee says both
    // hot ones (freq > n/(K+1)) MUST be candidates, and the verify pass
    // returns their EXACT counts.
    val noise = (1 to 8000).map(i => s"noise_$i")
    val hot = Seq.fill(600)("alpha") ++ Seq.fill(400)("beta")
    val df = (noise ++ hot).toDF("w").repartition(16)
    // n = 9000; threshold 1/30 = 300 → alpha(600) and beta(400) qualify
    val out = HeavyHitters.exactHeavyHitters(df, "w", 30)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("alpha" -> 600L, "beta" -> 400L))
  }

  test("result is partitioning-independent even though the sketch is not") {
    val data = (1 to 3000).map(i => s"t_${i % 97}") ++ Seq.fill(500)("big")
    val a = HeavyHitters.exactHeavyHitters(data.toDF("w").repartition(2), "w", 50)
      .orderBy("item").collect().toSeq
    val b = HeavyHitters.exactHeavyHitters(data.toDF("w").repartition(31), "w", 50)
      .orderBy("item").collect().toSeq
    assert(a == b)
    assert(a.exists(_.getString(0) == "big"))
  }

  test("items below the frequency bar are excluded even if the sketch tracked them") {
    val df = (Seq.fill(90)("a") ++ Seq.fill(9)("b") ++ Seq.fill(1)("c")).toDF("w")
    // n=100, bar 1/10 = 10: only 'a' (90) qualifies; 'b' (9) misses by one
    val out = HeavyHitters.exactHeavyHitters(df, "w", 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 90L))
  }

  test("phiDenom beyond the sketch capacity is rejected") {
    val df = Seq("x").toDF("w")
    intercept[IllegalArgumentException] {
      HeavyHitters.exactHeavyHitters(df, "w", HeavyHitters.K + 1)
    }
  }

  test("MG summary error bound: tracked counts under-estimate by at most n/(k+1)") {
    // direct unit check of the aggregator on one partition
    val agg = new HeavyHitters.MgAgg(4)
    val stream = Seq.fill(40)("h") ++ (1 to 60).map(i => s"r_$i")
    val st = stream.foldLeft(agg.zero)(agg.reduce)
    assert(st.size <= 4)
    // h: true count 40, n=100, k=4 → tracked count ≥ 40 - 100/5 = 20
    assert(st.getOrElse("h", 0L) >= 20L)
  }
}
