package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamEwmaSpec extends SparkSpec {
  import spark.implicits._
  import StreamEwma._

  test("streaming: forecast uses PRIOR history; spike surprises, then folds in") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[BucketCount]
    val q = forecasted(mem.toDS()).writeStream
      .outputMode("update").format("memory").queryName("sewma").start()
    try {
      mem.addData(BucketCount("k", 1, 4), BucketCount("k", 2, 4))
      q.processAllAvailable()
      mem.addData(BucketCount("k", 3, 20)) // the spike, later batch
      q.processAllAvailable()
      val rows = spark.table("sewma").as[Forecasted].collect().sortBy(_.bucket)
      // constant prefix: exact forecasts, zero error
      assert(rows(0).forecast == 4.0 && rows(0).err == 0.0)
      assert(rows(1).forecast == 4.0 && rows(1).err == 0.0)
      // the spike is judged by the old level, then pulls the level halfway
      assert(rows(2).forecast == 4.0 && rows(2).err == 16.0)
      assert(rows(2).ewma == 12.0) // (20 + 4) / 2
    } finally q.stop()
  }

  test("streaming fold equals batch replay equals the batch operator's closed form") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      BucketCount("a", 0, 1), BucketCount("a", 1, 1), BucketCount("a", 2, 1),
      BucketCount("a", 3, 1), BucketCount("a", 4, 9),
      BucketCount("b", 0, 3), BucketCount("b", 1, 5))
    val mem = MemoryStream[BucketCount]
    val q = forecasted(mem.toDS()).writeStream
      .outputMode("update").format("memory").queryName("sewma2").start()
    try {
      // feed in two batches to exercise state carry-over
      mem.addData(data.take(4): _*); q.processAllAvailable()
      mem.addData(data.drop(4): _*); q.processAllAvailable()
      val streamed = spark.table("sewma2").as[Forecasted].collect()
        .map(r => (r.key, r.bucket) -> r).toMap
      val replayed = batchForecasted(data).map(r => (r.key, r.bucket) -> r).toMap
      assert(streamed == replayed, "stream vs batch replay drift")
      // and the final level matches the batch operator's dyadic closed form
      // (q186 recipe: same α=1/2 fold over daily counts)
      val events = data.flatMap(b => (1L to b.n).map(_ => (b.key, b.bucket)))
        .toDF("k", "day")
        .select(col("k"), timestamp_micros(col("day") * 86400000000L).as("ts"))
      val batch = graft.operators.Ewma.dailyCounts(events, "k", "ts")
        .collect().map(r => r.getString(0) -> r.getAs[Double]("ewma")).toMap
      assert(streamed(("a", 4L)).ewma == batch("a")) // 5.0: the spec'd spike value
      assert(streamed(("b", 1L)).ewma == batch("b"))
      // and the DISTRIBUTED replay (the q204 gate surface) agrees exactly
      val ds = batchForecastedDs(spark.createDataset(data)).collect()
        .map(r => (r.key, r.bucket) -> r).toMap
      assert(ds == replayed, "Dataset replay vs driver-side replay drift")
    } finally q.stop()
  }

  test("keys are independent and state survives many triggers") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[BucketCount]
    val q = forecasted(mem.toDS()).writeStream
      .outputMode("update").format("memory").queryName("sewma3").start()
    try {
      (0L until 10L).foreach { i =>
        mem.addData(BucketCount("x", i, 2 + (i % 2)))
        q.processAllAvailable()
      }
      val rows = spark.table("sewma3").as[Forecasted].collect().sortBy(_.bucket)
      assert(rows.last.nSeen == 10L)
      // level stays inside the data's range forever
      assert(rows.forall(r => r.ewma >= 2.0 && r.ewma <= 3.0))
    } finally q.stop()
  }
}
