package graft.functions

import graft.SparkSpec

class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  test("estimate lands within the m=16 error envelope; duplicates don't move the sketch") {
    val distinct = (1 to 1000).map(i => ("g", s"value_$i")).toDF("grp", "v")
    val est = HllSketch.estimate(HllSketch.registers(distinct, "grp", "v"))
      .collect().head.getDouble(2)
    // std error 1.04/sqrt(16) = 26%; 2 sigma envelope
    assert(est > 480 && est < 1520, s"estimate $est too far from 1000")
    // hashing is value-deterministic: replaying every value 3x is a no-op
    val dup = distinct.unionAll(distinct).unionAll(distinct)
    val est2 = HllSketch.estimate(HllSketch.registers(dup, "grp", "v"))
      .collect().head.getDouble(2)
    assert(est2 == est)
  }

  test("merge of split sketches equals the sketch of the union") {
    val a = (1 to 400).map(i => ("g", s"item_$i")).toDF("grp", "v")
    val b = (200 to 600).map(i => ("g", s"item_$i")).toDF("grp", "v") // overlaps a
    val merged = HllSketch.estimate(HllSketch.merge(
      HllSketch.registers(a, "grp", "v"), HllSketch.registers(b, "grp", "v")))
      .collect().head.getDouble(2)
    val whole = HllSketch.estimate(HllSketch.registers(a.unionAll(b), "grp", "v"))
      .collect().head.getDouble(2)
    assert(merged == whole)
  }

  test("small-range correction: a handful of values uses the linear-counting branch") {
    val tiny = Seq(("g", "a"), ("g", "b"), ("g", "c")).toDF("grp", "v")
    val row = HllSketch.estimate(HllSketch.registers(tiny, "grp", "v")).collect().head
    val (zeros, est) = (row.getLong(1), row.getDouble(2))
    assert(zeros >= 13) // at most 3 of 16 buckets occupied
    // linear counting: m * ln(m / V)
    val expected = 16.0 * math.log(16.0 / zeros)
    assert(math.abs(est - (math.round(expected * 1e6) / 1e6)) < 1e-9)
  }
}
