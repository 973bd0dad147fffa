package graft.operators

import graft.SparkSpec
import PageHinkley._

class PageHinkleySpec extends SparkSpec {
  import spark.implicits._

  private def run(data: Seq[(String, Long, Long)], delta: Double = 0.5) =
    PageHinkley.detectDs(
      spark.createDataset(data.map(t => BucketCount(t._1, t._2, t._3))),
      delta).collect().sortBy(r => (r.key, r.bucket))

  test("a level shift drives PH past the stable-series ceiling") {
    val stable = (1L to 30L).map(("s", _, 100L))
    val shifted = (1L to 15L).map(("k", _, 100L)) ++
      (16L to 30L).map(("k", _, 140L))
    val out = run(stable ++ shifted)
    val stableMax = out.filter(_.key == "s").map(_.ph).max
    val shiftMax = out.filter(_.key == "k").map(_.ph).max
    assert(stableMax < 1.0, s"stable PH $stableMax")
    assert(shiftMax > 50.0, s"shifted PH $shiftMax")
    // the statistic rises AFTER the shift point, not before
    val k = out.filter(_.key == "k")
    assert(k.filter(_.bucket <= 15).map(_.ph).max < 1.0)
  }

  test("hand-checked fold on a 3-point series") {
    // x = 10, 10, 16; delta = 0.5
    // t1: mean 10, m = -0.5, min -0.5, ph 0
    // t2: mean 10, m = -1.0, min -1.0, ph 0
    // t3: mean 12, m = -1.0 + (16-12-0.5) = 2.5, ph = 2.5 - (-1.0) = 3.5
    val out = run(Seq(("k", 1L, 10L), ("k", 2L, 10L), ("k", 3L, 16L)))
    assert(out.map(_.m).toSeq == Seq(-0.5, -1.0, 2.5))
    assert(out.map(_.ph).toSeq == Seq(0.0, 0.0, 3.5))
    assert(out.map(_.nSeen).toSeq == Seq(1L, 2L, 3L))
  }

  test("state is per key: a drifting key never alarms its neighbor") {
    val data = (1L to 10L).map(("quiet", _, 50L)) ++
      ((1L to 5L).map(("loud", _, 10L)) ++ (6L to 10L).map(("loud", _, 500L)))
    val out = run(data)
    assert(out.filter(_.key == "quiet").map(_.ph).max < 1.0)
    assert(out.filter(_.key == "loud").map(_.ph).max > 100.0)
  }
}
