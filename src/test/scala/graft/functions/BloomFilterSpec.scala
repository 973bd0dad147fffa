package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every inserted key passes") {
    val build = (1 to 200).map(i => s"key_$i").toDF("k")
    val out = BloomFilter.filterColumn(build, "k", build, "k")
      .filter(!col("might_contain")).count()
    assert(out == 0L)
  }

  test("false-positive rate on absent keys stays near the analytic bound") {
    val build = (1 to 100).map(i => s"key_$i").toDF("k")
    val absent = (1 to 2000).map(i => s"other_$i").toDF("k")
    val fp = BloomFilter.filterColumn(build, "k", absent, "k")
      .filter(col("might_contain")).count()
    // k=4, n=100, m=1024: p = (1 - e^(-kn/m))^k ~ 0.011; allow 4x slack
    assert(fp < 2000 * 0.045, s"fp=$fp")
  }

  test("bit table is bounded by m and column probe matches driver-side positions") {
    val build = (1 to 5000).map(_.toString).toDF("k")
    val bits = BloomFilter.bits(build, "k")
    assert(bits.count() <= BloomFilter.M)
    // Column-side position formula == the portable hash31-derived one
    val posDf = Seq("42").toDF("v")
      .select((0 until BloomFilter.K).map(i => BloomFilter.position(i, col("v")).as(s"p$i")): _*)
      .collect().head
    (0 until BloomFilter.K).foreach { i =>
      val expected = graft.core.Ids.hash31(s"$i|42") % BloomFilter.M
      assert(posDf.getLong(i) == expected)
    }
  }
}
