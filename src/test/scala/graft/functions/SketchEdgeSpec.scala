package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input behavior of the sketch/layout family — the shapes a
  * 100 TB pipeline WILL eventually feed them (empty shards, constant
  * columns, single rows) must not throw or mis-count.
  */
class SketchEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("CMS: empty input yields an empty counter table and zero estimates") {
    val empty = Seq.empty[String].toDF("v")
    val ctr = CmsSketch.counters(empty, "v")
    assert(ctr.count() == 0)
    val est = CmsSketch.estimate(ctr, Seq("x").toDF("v"), "v").collect()
    assert(est.length == 1 && est.head.getLong(1) == 0L)
  }

  test("Bloom: empty build rejects every probe; single-key build accepts it") {
    val out = BloomFilter.filterColumn(Seq.empty[String].toDF("k"), "k",
      Seq("a", "b").toDF("k"), "k")
    assert(out.filter(col("might_contain")).count() == 0)
    val one = BloomFilter.filterColumn(Seq("only").toDF("k"), "k",
      Seq("only", "other").toDF("k"), "k")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(one("only"))
  }

  test("ZOrder: constant column buckets to 0 and the curve degenerates to a line") {
    val df = (1 to 50).map(i => (7L, i.toLong)).toDF("x", "y")
      .withColumn("xb", ZOrder.bucket(col("x"), lit(7L), lit(7L)))
    assert(df.filter(col("xb") =!= 0).count() == 0)
    // with xb = 0 the z-value is just the y bits spread to odd positions:
    // strictly monotone in yb — ordering by z == ordering by yb
    val z = df.withColumn("yb", col("y") % 256)
      .withColumn("z", ZOrder.zvalue(col("xb"), col("yb")))
      .orderBy(col("yb")).select(col("z")).collect().map(_.getLong(0))
    assert(z.toSeq == z.sorted.toSeq)
  }

  test("HistSketch: constant values land in bin 0 and every quantile is that value") {
    val df = (1 to 100).map(_ => ("g", 42)).toDF("k", "v")
    val bins = HistSketch.bins(df, "k", "v").collect()
    assert(bins.length == 1 && bins.head.getLong(3) == 0L && bins.head.getLong(4) == 100L)
    val est = HistSketch.estimate(HistSketch.bins(df, "k", "v"), "k",
      Seq("e50" -> 0.5, "e99" -> 0.99)).collect().head
    assert(est.getLong(1) == 42L && est.getLong(2) == 42L)
  }

  test("HLL: single value estimates ~1 via linear counting") {
    val est = HllSketch.estimate(
      HllSketch.registers(Seq(("g", "x")).toDF("grp", "v"), "grp", "v"))
      .collect().head.getDouble(2)
    val expected = 16.0 * math.log(16.0 / 15.0)
    assert(math.abs(est - (math.round(expected * 1e6) / 1e6)) < 1e-9)
  }

  test("dedupLines: empty string and separator-only input survive") {
    val rows = Seq("", "\n", "a\n\na").toDF("t")
      .select(TextNorm.dedupLines(col("t")).as("d")).as[String].collect()
    assert(rows(0) == "")
    assert(rows(1) == "") // two empty lines dedup to one empty line -> ""
    assert(rows(2) == "a\n") // duplicate 'a' dropped, distinct '' kept
  }
}
