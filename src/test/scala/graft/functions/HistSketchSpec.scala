package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HistSketchSpec extends SparkSpec {
  import spark.implicits._

  test("estimate lands within one bin width of the exact discrete quantile") {
    val df = (1 to 1000).map(i => ("g", (i * i) % 997)).toDF("k", "v") // skewed-ish values
    val est = HistSketch.estimate(HistSketch.bins(df, "k", "v"), "k",
      Seq("e50" -> 0.5, "e90" -> 0.9)).collect().head
    val ex = Quantiles.exactQuantiles(df, "k", "v",
      Seq("p50" -> 0.5, "p90" -> 0.9)).collect().head
    val binWidth = math.ceil(997.0 / HistSketch.B).toLong + 1
    assert(math.abs(est.getLong(1) - ex.getInt(1)) <= binWidth)
    assert(math.abs(est.getLong(2) - ex.getInt(2)) <= binWidth)
    // the estimate's lower-edge convention never overshoots the exact value
    assert(est.getLong(1) <= ex.getInt(1) && est.getLong(2) <= ex.getInt(2))
  }

  test("merge of shard sketches over a shared range equals the whole sketch") {
    // both halves contain the global min and max so per-half ranges agree
    val a = (Seq(0, 999) ++ (1 to 400).map(_ * 2 % 997)).map(("g", _)).toDF("k", "v")
    val b = (Seq(0, 999) ++ (1 to 300).map(_ * 5 % 997)).map(("g", _)).toDF("k", "v")
    val merged = HistSketch.merge("k", HistSketch.bins(a, "k", "v"), HistSketch.bins(b, "k", "v"))
    val whole = HistSketch.bins(a.unionAll(b), "k", "v")
    val m = merged.collect().map(r => r.getLong(3) -> r.getLong(4)).toMap
    val w = whole.collect().map(r => r.getLong(3) -> r.getLong(4)).toMap
    assert(m == w)
  }

  test("state is bounded by B bins per key no matter the input") {
    val df = (1 to 20000).map(i => (s"k${i % 3}", i)).toDF("k", "v")
    val perKey = HistSketch.bins(df, "k", "v")
      .groupBy(col("k")).agg(count(lit(1)).as("n")).collect()
    perKey.foreach(r => assert(r.getLong(1) <= HistSketch.B))
  }
}
