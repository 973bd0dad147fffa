package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BitextMineSpec extends SparkSpec {
  import spark.implicits._

  private def side(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("id", "v")

  test("mutual nearest neighbors pair up; non-mutual hubs are excluded") {
    val src = side(Seq(1L -> Seq(1f, 0f), 2L -> Seq(0f, 1f)))
    // t3 is a hub near everything but is nobody's best match
    val tgt = side(Seq(
      11L -> Seq(1f, 0.1f), 12L -> Seq(0.1f, 1f), 13L -> Seq(0.6f, 0.6f)))
    val r = BitextMine.mine(src, tgt, "id", "v", k = 2, marginThreshold = 0.0)
      .orderBy(col("src_id")).collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSeq ==
      Seq((1L, 11L), (2L, 12L)))
  }

  test("margin exceeds 1 for clear pairs and is ratio-of-rounded-cosines") {
    val src = side(Seq(1L -> Seq(1f, 0f)))
    val tgt = side(Seq(11L -> Seq(1f, 0f), 12L -> Seq(0f, 1f)))
    val r = BitextMine.mine(src, tgt, "id", "v", k = 2, marginThreshold = 0.0)
      .collect().head
    // cos(s, t11) = 1, cos(s, t12) = 0 → ma = 0.5; mb(t11): only one src so
    // its top-2 mean is 1. margin = 1 / ((0.5 + 1) / 2) = 1.333333
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 1.333333)
  }

  test("margin threshold filters weak pairs") {
    val src = side(Seq(1L -> Seq(1f, 0f), 2L -> Seq(0.9f, 0.1f)))
    val tgt = side(Seq(11L -> Seq(1f, 0.05f), 12L -> Seq(0.95f, 0.15f)))
    // everything is near everything: margins hover at ~1
    val all = BitextMine.mine(src, tgt, "id", "v", k = 2, marginThreshold = 0.0)
    val strict = BitextMine.mine(src, tgt, "id", "v", k = 2, marginThreshold = 1.5)
    assert(strict.count() <= all.count())
    assert(all.collect().forall(r => r.getDouble(3) < 1.5))
  }
}
