package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.index.RemoteEmbedder

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted count/sum match direct aggregation on a skewed key") {
    // one hot key with 10k rows, many cold keys
    val df = ((1 to 10000).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"cold$i", i.toLong))).toDF("k", "v")
    val direct = df.groupBy("k").agg(count(lit(1)).as("cnt"), sum("v").as("sum"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sc = Salting.saltedCount(df, Seq("k"), 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ss = Salting.saltedSumLong(df, Seq("k"), "v", 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    direct.foreach { case (k, (c, s)) =>
      assert(sc(k) == c, s"count mismatch for $k")
      assert(ss(k) == s, s"sum mismatch for $k")
    }
    // the salt really splits the hot key into multiple partial groups
    val partials = Salting.withSalt(df.filter($"k" === "hot"), 8)
      .select("_salt").distinct().count()
    assert(partials > 1)
  }

  test("salted join matches the plain join row multiset; hot key spreads") {
    val big = ((1 to 5000).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => (s"cold$i", i.toLong))).toDF("k", "v")
    val small = (Seq("hot") ++ (1 to 50).map(i => s"cold$i"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "w")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "w").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val plain = canon(big.join(small, Seq("k")))
    val salted = canon(Salting.saltedJoin(big, small, Seq("k"), 8))
    assert(salted == plain)
    // the hot key's rows really occupy multiple salt buckets
    val spread = Salting.withSalt(big.filter($"k" === "hot"), 8)
      .select("_salt").distinct().count()
    assert(spread > 1)
  }

  test("remote embedder: distributed batching produces per-text vectors") {
    val transport: Seq[String] => Seq[Seq[Double]] =
      batch => batch.map(t => Seq(t.length.toDouble, 1.0))
    val emb = RemoteEmbedder(dim = 2, transport = transport, tokenBudget = 10L, backoffMs = 1L)
    val df = Seq("aa", "bbbb", "cccccc", "dd").toDF("content")
    val out = emb.embed(df, "content", "dense")
      .select("content", "dense").collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(out("aa") == Seq(2.0, 1.0))
    assert(out("cccccc") == Seq(6.0, 1.0))
    assert(out.size == 4)
  }

  test("remote embedder: retries transient failures with backoff (driver path)") {
    // counters only observable driver-side: executor closures get
    // serialized copies, so retry semantics are asserted via embedText
    val failures = new java.util.concurrent.atomic.AtomicInteger(0)
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val transport: Seq[String] => Seq[Seq[Double]] = { batch =>
      calls.incrementAndGet()
      if (failures.getAndIncrement() < 2) throw new RuntimeException("transient 429")
      batch.map(t => Seq(t.length.toDouble))
    }
    val emb = RemoteEmbedder(dim = 1, transport = transport, backoffMs = 1L)
    assert(emb.embedText("xyz") == Seq(3.0))
    assert(calls.get() == 3) // two transient failures + one success
    // exhausted retries surface the error
    val alwaysFail = RemoteEmbedder(dim = 1,
      transport = _ => throw new RuntimeException("hard down"),
      maxRetries = 1, backoffMs = 1L)
    intercept[RuntimeException] { alwaysFail.embedText("x") }
  }
}
