package graft.operators

import graft.SparkSpec

class PostStratifySpec extends SparkSpec {
  import spark.implicits._

  test("balanced strata: post-stratified mean = raw mean, deff = 1") {
    val d = Seq(("a", 10L), ("a", 20L), ("b", 30L), ("b", 40L))
      .toDF("h", "v")
    val r = PostStratify.equalWeight(d, "h", "v").collect().head
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("mean_raw") == 25.0)
    assert(r.getAs[Double]("mean_post") == 25.0)
    assert(r.getAs[Double]("deff_kish") == 1.0)
  }

  test("skewed strata: hand-computed reweight and Kish deff") {
    // a: (0,0) n=2 ; b: (6) n=1 → raw 2, post (0+6)/2 = 3
    // deff = 3·(2·¼ + 1·1)/(2·½ + 1)² = 4.5/4 = 1.125
    val d = Seq(("a", 0L), ("a", 0L), ("b", 6L)).toDF("h", "v")
    val r = PostStratify.equalWeight(d, "h", "v").collect().head
    assert(r.getAs[Double]("mean_raw") == 2.0)
    assert(r.getAs[Double]("mean_post") == 3.0)
    assert(r.getAs[Double]("deff_kish") == 1.125)
  }
}
