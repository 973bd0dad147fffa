package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamDgimSpec extends SparkSpec {
  import spark.implicits._
  import StreamDgim._

  private def exact(hits: Seq[Long], t: Long, window: Long): Long =
    hits.count(h => h > t - window && h <= t)

  test("estimate is exact while few buckets exist, bounded-error always") {
    val window = 256L
    // bursty deterministic arrival pattern
    val times = (1L to 2000L).filter(t => (t * 2654435761L % 7) < 3)
    val ests = batchCounted(times.map(Hit("k", _)), window)
    ests.foreach { e =>
      val truth = exact(times, e.time, window)
      assert(math.abs(e.estimate - truth) <= math.max(1L, truth / 2),
        s"t=${e.time} est=${e.estimate} truth=$truth")
    }
    // overall the estimate tracks much tighter than the worst case
    val rel = ests.map { e =>
      val truth = exact(times, e.time, window)
      if (truth == 0) 0.0 else math.abs(e.estimate - truth).toDouble / truth
    }
    assert(rel.sum / rel.size < 0.15, f"mean rel error ${rel.sum / rel.size}%.3f")
  }

  test("state stays logarithmic in the window, not linear in the stream") {
    val window = 1024L
    val times = (1L to 20000L)
    val ests = batchCounted(times.map(Hit("k", _)), window)
    // ≤ 2 buckets per power-of-2 size up to log2(1024)+1 sizes
    assert(ests.map(_.nBuckets).max <= 2 * 12,
      s"bucket blowup: ${ests.map(_.nBuckets).max}")
  }

  test("expiry: a long gap empties the window") {
    val window = 100L
    val times = (1L to 50L) ++ Seq(10000L)
    val ests = batchCounted(times.map(Hit("k", _)), window)
    assert(ests.last.estimate == 1L)
  }

  test("streaming equals batch replay across trigger boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val window = 64L
    val data = (1L to 300L).filter(_ % 3 != 0).map(Hit("a", _)) ++
      (5L to 100L by 5).map(Hit("b", _))
    val mem = MemoryStream[Hit]
    val q = counted(mem.toDS(), window).writeStream
      .outputMode("update").format("memory").queryName("dgim").start()
    try {
      val (first, rest) = data.splitAt(100)
      mem.addData(first: _*); q.processAllAvailable()
      mem.addData(rest: _*); q.processAllAvailable()
      val streamed = spark.table("dgim").as[Estimate].collect()
        .map(e => (e.key, e.time) -> e.estimate).toMap
      val replayed = batchCounted(data, window)
        .map(e => (e.key, e.time) -> e.estimate).toMap
      assert(streamed == replayed)
    } finally q.stop()
  }

  test("tied timestamps replay identically across 10 runs (ADVICE r10 #3)") {
    // duplicate (key, time) rows: a Hit carries no payload beyond its
    // tick, so tied rows are value-identical and sortBy(_.time) is a
    // total order over row VALUES — any shuffle-arrival permutation folds
    // to the same output multiset. Prove it: 10 distributed replays over
    // a dup-heavy input, each repartitioned differently, must agree.
    val hits = (1L to 400L).flatMap { t =>
      val dups = 1 + (t % 3).toInt // up to 3 identical hits per tick
      Seq.fill(dups)(Hit(s"k${t % 4}", t / 2))
    }
    val runs = (1 to 10).map { i =>
      batchCountedDs(hits.toDS().repartition(1 + i % 7), 64L)
        .collect().toSeq
        .sortBy(e => (e.key, e.time, e.estimate, e.nBuckets))
    }
    runs.tail.foreach(r => assert(r == runs.head))
    // and the distributed replay agrees with the driver-side fold
    val local = batchCounted(hits, 64L)
      .sortBy(e => (e.key, e.time, e.estimate, e.nBuckets))
    assert(runs.head == local)
  }

  test("distributed batch replay (q205 surface) equals the driver-side fold") {
    val window = 64L
    val data = (1L to 300L).filter(_ % 3 != 0).map(Hit("a", _)) ++
      (5L to 100L by 5).map(Hit("b", _))
    val ds = batchCountedDs(spark.createDataset(data), window).collect()
      .map(e => (e.key, e.time) -> (e.estimate, e.nBuckets)).toMap
    val seq = batchCounted(data, window)
      .map(e => (e.key, e.time) -> (e.estimate, e.nBuckets)).toMap
    assert(ds == seq)
  }
}
