package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamRateAnomalySpec extends SparkSpec {
  import spark.implicits._
  import StreamRateAnomaly._

  test("streaming: a burst scores against the PRIOR baseline, then folds in") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[BucketCount]
    val q = scored(mem.toDS()).writeStream
      .outputMode("update").format("memory").queryName("srate").start()
    try {
      mem.addData(BucketCount("k", 1, 10), BucketCount("k", 2, 12),
        BucketCount("k", 3, 11), BucketCount("k", 4, 9))
      q.processAllAvailable()
      mem.addData(BucketCount("k", 5, 100)) // the burst, in a later batch
      q.processAllAvailable()
      val rows = spark.table("srate").as[Scored].collect().sortBy(_.bucket)
      assert(rows.length == 5)
      // first two buckets can't be scored (needs >= 2 prior points)
      assert(rows(0).z == 0.0 && rows(1).z == 0.0)
      // the burst is judged by the 4-bucket baseline (mean 10.5)
      val burst = rows.find(_.bucket == 5L).get
      assert(burst.nBuckets == 4L && burst.baselineMean == 10.5)
      assert(burst.z > 10, s"z ${burst.z}")
    } finally q.stop()
  }

  test("streaming state is per key: a noisy key never widens a quiet key's bands") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[BucketCount]
    val q = scored(mem.toDS()).writeStream
      .outputMode("update").format("memory").queryName("srate2").start()
    try {
      mem.addData(
        BucketCount("quiet", 1, 10), BucketCount("quiet", 2, 10), BucketCount("quiet", 3, 10),
        BucketCount("noisy", 1, 0), BucketCount("noisy", 2, 1000), BucketCount("noisy", 3, 5))
      q.processAllAvailable()
      mem.addData(BucketCount("quiet", 4, 14), BucketCount("noisy", 4, 500))
      q.processAllAvailable()
      val rows = spark.table("srate2").as[Scored].collect()
      val quiet4 = rows.find(r => r.key == "quiet" && r.bucket == 4L).get
      val noisy4 = rows.find(r => r.key == "noisy" && r.bucket == 4L).get
      // zero-variance quiet baseline: any deviation is infinitely anomalous
      assert(quiet4.z.isPosInfinity)
      // the same absolute jump inside the noisy key is unremarkable
      assert(math.abs(noisy4.z) < 2.0, s"noisy z ${noisy4.z}")
    } finally q.stop()
  }

  test("zero-variance baseline keeps the sign: a drop is negative-infinite, not a burst") {
    import StreamRateAnomaly._
    val out = batchScored(Seq(
      BucketCount("k", 1, 10), BucketCount("k", 2, 10), BucketCount("k", 3, 10),
      BucketCount("k", 4, 0),   // outage against a flat baseline
      BucketCount("k", 5, 50))) // burst — baseline now has variance
      .sortBy(_.bucket)
    assert(out(3).z.isNegInfinity, "an outage must not alert as a spike")
    assert(out(4).z > 0.0)
  }

  test("batch replay matches the streaming fold bucket-for-bucket") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      BucketCount("a", 1, 5), BucketCount("a", 2, 7), BucketCount("a", 3, 6),
      BucketCount("a", 4, 40), BucketCount("b", 1, 1), BucketCount("b", 2, 2))
    val mem = MemoryStream[BucketCount]
    val q = scored(mem.toDS()).writeStream
      .outputMode("update").format("memory").queryName("srate3").start()
    try {
      data.foreach { b => mem.addData(b); q.processAllAvailable() } // one per batch
      val streamed = spark.table("srate3").as[Scored].collect()
        .map(s => (s.key, s.bucket) -> s).toMap
      val replayed = batchScored(data).map(s => (s.key, s.bucket) -> s).toMap
      assert(streamed.keySet == replayed.keySet)
      streamed.foreach { case (k, s) =>
        val r = replayed(k)
        assert(s.z == r.z && s.baselineMean == r.baselineMean && s.nBuckets == r.nBuckets,
          s"mismatch at $k: $s vs $r")
      }
    } finally q.stop()
  }

  test("distributed batchScoredDs replays the fold bit-for-bit (q233 surface)") {
    val data = Seq(
      BucketCount("a", 1, 10), BucketCount("a", 2, 12), BucketCount("a", 3, 7),
      BucketCount("a", 4, 40), BucketCount("b", 1, 5), BucketCount("b", 2, 5),
      BucketCount("b", 3, 5), BucketCount("b", 4, 9))
    val ds = spark.createDataset(data)(implicitly)
    val viaDs = batchScoredDs(ds).collect().map(s => (s.key, s.bucket) -> s).toMap
    val viaSeq = batchScored(data).map(s => (s.key, s.bucket) -> s).toMap
    assert(viaDs.keySet == viaSeq.keySet)
    viaDs.foreach { case (k, s) =>
      val r = viaSeq(k)
      assert(s.z == r.z && s.baselineMean == r.baselineMean && s.nBuckets == r.nBuckets,
        s"mismatch at $k: $s vs $r")
    }
    // zero-variance baseline surfaces as signed infinity through the Ds path
    assert(viaDs(("b", 4L)).z.isPosInfinity)
  }
}
