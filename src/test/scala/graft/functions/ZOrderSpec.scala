package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def refInterleave(xb: Long, yb: Long): Long =
    (0 until ZOrder.Bits).map { i =>
      (((xb >> i) & 1L) << (2 * i)) | (((yb >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zvalue matches the reference bit-interleave on the full corner set") {
    val pts = for (x <- Seq(0L, 1L, 2L, 127L, 128L, 255L); y <- Seq(0L, 1L, 85L, 170L, 255L)) yield (x, y)
    val got = pts.toDF("xb", "yb")
      .select(col("xb"), col("yb"), ZOrder.zvalue(col("xb"), col("yb")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == refInterleave(x, y), s"($x,$y)")
    }
    // distinct inputs -> distinct z (the curve is a bijection)
    assert(got.values.toSeq.distinct.size == pts.size)
  }

  test("bucket is exact long division even when the dividend passes 2^53") {
    // span ~2^50 (e.g. 35 years of epoch-micros): the dividend
    // (x - min) * 256 reaches 2^58, far past double's 2^53 mantissa — a
    // double-division quotient truncates here; SQL `div` must not
    val minV = 0L
    val maxV = (1L << 50) - 1L
    val xs = (0 until 1000).map(i => (maxV.toDouble * i / 999).toLong) ++
      Seq(minV, maxV, maxV - 1, maxV / 2, maxV / 2 + 1)
    val got = xs.toDF("x")
      .select(col("x"), ZOrder.bucket(col("x"), lit(minV), lit(maxV)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { x =>
      val expected = ((BigInt(x - minV) * 256) / BigInt(maxV - minV + 1)).toLong
      assert(got(x) == expected, s"x=$x")
    }
    assert(got(minV) == 0L && got(maxV) == 255L)
  }

  test("every 1024-z-value file covers a rectangle of at most 32x32 buckets") {
    val grid = (for (x <- 0 until 256 by 3; y <- 0 until 256 by 5) yield (x.toLong, y.toLong))
      .toDF("xb", "yb")
    val spans = grid.withColumn("z", ZOrder.zvalue(col("xb"), col("yb")))
      .groupBy(shiftright(col("z"), 10).as("zfile"))
      .agg((max(col("xb")) - min(col("xb"))).as("xs"),
        (max(col("yb")) - min(col("yb"))).as("ys"))
      .agg(max(col("xs")).as("mxs"), max(col("ys")).as("mys"))
      .collect().head
    assert(spans.getLong(0) <= 31, s"x span ${spans.getLong(0)}")
    assert(spans.getLong(1) <= 31, s"y span ${spans.getLong(1)}")
  }

  test("layout produces non-overlapping contiguous z-ranges per partition") {
    val df = (1 to 4000).map { i => (i.toLong * 37 % 256, i.toLong * 91 % 256) }
      .toDF("xb", "yb")
      .withColumn("z", ZOrder.zvalue(col("xb"), col("yb")))
    val ranges = ZOrder.layout(df, "z", 8)
      .withColumn("pid", spark_partition_id())
      .groupBy(col("pid")).agg(min(col("z")).as("lo"), max(col("z")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"overlap: $hi1 > $lo2")
      case _ =>
    }
  }
}
