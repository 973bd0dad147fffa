package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamDedup.DocEvent
import graft.streaming.StreamTrending.TokenEvent

/** The q220/q221/q222 replay contracts: the DISTRIBUTED batch replays
  * (flatMapGroups) agree with the streaming folds / driver-side folds
  * they share their step with, and the stream-static probe is stateless
  * across micro-batch boundaries.
  */
class StreamDedupReplaySpec extends SparkSpec {

  private def t(s: Long) = new java.sql.Timestamp(s * 1000)

  test("keep-first batch replay equals the streaming fold on the same feed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val feed = Seq(
      DocEvent(1L, "bx", t(10), "a"), DocEvent(2L, "by", t(11), "b"),
      DocEvent(3L, "bx", t(12), "c"), DocEvent(5L, "bx", t(12), "tie-later-id"),
      DocEvent(4L, "by", t(9), "earliest-by"))
    val mem = MemoryStream[DocEvent]
    val q = StreamDedup.keepFirstPerBucket(mem.toDS(), "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("kfrep").start()
    val streamed = try {
      mem.addData(feed: _*)
      q.processAllAvailable()
      spark.table("kfrep").as[StreamDedup.DedupVerdict].collect().toSet
    } finally q.stop()
    val replay = StreamDedup.batchKeepFirstDs(feed.toDS()).collect().toSet
    assert(replay == streamed, s"replay $replay != streamed $streamed")
    // the by-bucket keeper is the EARLIEST event, tie on ts -> smaller id
    assert(replay.filter(_.kept).map(_.docId) == Set(1L, 4L))
    assert(replay.find(_.docId == 5L).get.firstDocId == 1L)
  }

  test("keep-first replay is shuffle-order independent (tied timestamps)") {
    import spark.implicits._
    val ties = (1L to 40L).map(i => DocEvent(i, "b" + (i % 3), t(100), s"d$i"))
    val a = StreamDedup.batchKeepFirstDs(ties.toDS().repartition(7)).collect().toSet
    val b = StreamDedup.batchKeepFirstDs(ties.reverse.toDS().repartition(2)).collect().toSet
    assert(a == b)
    // tie on ts -> smallest id per bucket keeps
    assert(a.filter(_.kept).map(_.docId) == Set(1L, 2L, 3L))
  }

  test("distributed MG summaries equal the driver-side fold and honor the guarantee") {
    import spark.implicits._
    val tokens = (Seq.fill(60)("hot") ++ Seq.fill(25)("warm") ++
      (1 to 80).map(i => s"cold$i")).sorted
    val events = tokens.map(w => TokenEvent(w, t(0)))
    val ds = StreamTrending.batchSummariesDs(events.toDS().repartition(5), k = 4, shards = 2)
      .collect().sortBy(_.shard)
    val drv = StreamTrending.batchSummaries(tokens, k = 4, shards = 2).sortBy(_.shard)
    assert(ds.length == drv.length)
    ds.zip(drv).foreach { case (d, v) =>
      assert(d.shard == v.shard && d.nSeen == v.nSeen)
      assert(d.tokens.toSeq == v.tokens.toSeq, s"shard ${d.shard}")
      assert(d.counts.toSeq == v.counts.toSeq)
    }
    // MG guarantee: any token with count > n_shard/(k+1) survives its shard
    val byShard = ds.map(s => s.shard -> s).toMap
    tokens.groupBy(identity).foreach { case (w, occ) =>
      val shard = (graft.core.Ids.hash31(w) % 2).toInt
      val nShard = byShard(shard).nSeen
      if (occ.size.toLong * 5 > nShard)
        assert(byShard(shard).tokens.contains(w), s"dropped heavy hitter $w")
    }
  }

  test("stream-static near-dup probe: micro-batch union equals the one-shot probe") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val mk = (i: Int, s: String) => (i.toLong, s)
    val corpus = Seq(
      mk(1, "the quick brown fox jumps over the lazy dog again and again today"),
      mk(2, "completely different content about spark physical plans and shuffles"),
      mk(3, "the quick brown fox jumps over the lazy dog again and again tonight"))
      .toDF("doc_id", "text")
    val feed = Seq(
      mk(10, "the quick brown fox jumps over the lazy dog again and again today"),
      mk(11, "completely different content about spark physical plans and exchanges"),
      mk(12, "nothing like anything in the corpus whatsoever truly unique text here"))
      .toDF("doc_id", "text")
    val cb = graft.dedup.MinHashLsh.corpusBands(corpus, "doc_id", "text")
      .localCheckpoint(true)
    val once = graft.dedup.MinHashLsh.newVsCorpusBands(cb, feed, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val unioned = (0 until 3).map { mb =>
      graft.dedup.MinHashLsh.newVsCorpusBands(cb,
        feed.filter(col("doc_id") % 3 === mb), "doc_id", "text")
    }.reduce(_ unionByName _).collect().map(_.toSeq).toSet
    assert(unioned == once, s"batch split changed the probe result")
    assert(once.nonEmpty, "near-identical docs must produce candidates")
  }
}
