package graft.operators

import graft.SparkSpec

class RobustLocationSpec extends SparkSpec {
  import spark.implicits._

  test("uniform 1..10 at 10% trim: every mean is 5.5") {
    val d = (1L to 10L).map(("g", _)).toDF("g", "v")
    val r = RobustLocation.panel(d, "g", "v", 10).collect().head
    assert(r.getAs[Long]("k_trim") == 1L)
    assert(r.getAs[Double]("mean_raw") == 5.5)
    assert(r.getAs[Double]("trimmed_mean") == 5.5)
    assert(r.getAs[Double]("winsorized_mean") == 5.5)
  }

  test("one wild outlier moves the raw mean but not the robust ones") {
    val d = ((1L to 9L) :+ 1000L).map(("g", _)).toDF("g", "v")
    val r = RobustLocation.panel(d, "g", "v", 10).collect().head
    assert(r.getAs[Double]("mean_raw") == 104.5)
    assert(r.getAs[Double]("trimmed_mean") == 5.5) // core ranks 2..9
    assert(r.getAs[Double]("winsorized_mean") == 5.5) // clamp to 2 and 9
  }

  test("k = 0 (tiny group) degrades to the raw mean; ties fine") {
    val d = Seq(("g", 5L), ("g", 5L), ("g", 7L), ("g", 7L)).toDF("g", "v")
    val r = RobustLocation.panel(d, "g", "v", 10).collect().head
    assert(r.getAs[Long]("k_trim") == 0L)
    assert(r.getAs[Double]("trimmed_mean") == 6.0)
    assert(r.getAs[Double]("winsorized_mean") == 6.0)
  }

  test("panel is replay-stable across partitionings") {
    val d = (1L to 90L).map(i => (s"g${i % 3}", (i * 31) % 23))
    val runs = (1 to 3).map { p =>
      RobustLocation.panel(d.toDF("g", "v").repartition(p * 3), "g", "v", 10)
        .orderBy("g").collect().map(_.toSeq).toSeq
    }
    assert(runs.distinct.size == 1)
  }
}
