package graft.dedup

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Skew-balance assertion for the two heaviest pair joins (VERDICT r11
  * task 7): PlanShapeSpec pins the LOGICAL shape, but whether a hot key
  * serializes a stage is a RUNTIME property. This spec feeds a
  * deliberately skewed corpus — 90% of documents in one group, heavy
  * shared-gram overlap, the worst case for a (group/gram)-keyed join —
  * through the REAL q21/q112 operators and asserts, from executor task
  * metrics, that no stage's hottest task carries more than a bounded
  * multiple of the stage's mean shuffle-read records.
  *
  * The claim is STRUCTURAL, so the tests disable broadcast joins (to
  * force real shuffles) AND AQE's skew-join splitter: q21
  * (NgramJaccard) salts its candidate join with a 16×16 doc-hash bucket
  * fan-out — a hot GROUP spreads over 256 (grp,bi,bj) cells; q112
  * (PrefixJoin/PPJoin) keys candidates on each doc's RAREST grams —
  * corpus-hot grams are excluded from prefixes by construction. AQE
  * skew-split (on by default in Spark 4) is a second net BEHIND the
  * structure, not the structure itself — the contrast test shows the
  * raw failure mode it would otherwise have to clean up.
  */
class SkewBalanceSpec extends SparkSpec {
  import spark.implicits._

  /** max-over-mean shuffle-read record ratio per data-moving stage.
    * Takes the DataFrame BY NAME: q21's pipeline ends in an eager
    * localCheckpoint, so construction itself executes the joins — the
    * listener must already be attached when the operator is called.
    */
  private def stageSkewRatios(mkDf: => DataFrame): Seq[(Int, Double, Long)] = {
    val byStage = mutable.Map.empty[Int, mutable.ArrayBuffer[Long]]
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val recs = Option(t.taskMetrics)
          .map(m => m.shuffleReadMetrics.recordsRead).getOrElse(0L)
        byStage.synchronized {
          byStage.getOrElseUpdate(t.stageId, mutable.ArrayBuffer.empty) += recs
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      mkDf.write.format("noop").mode("overwrite").save()
      // the listener bus is async (and private[spark]) — poll until the
      // per-stage counts stop changing
      var last = -1
      var same = 0
      while (same < 3) {
        Thread.sleep(150)
        val now = byStage.synchronized(byStage.valuesIterator.map(_.size).sum)
        if (now == last) same += 1 else { same = 0; last = now }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    info("stages seen: " + byStage.toSeq.sortBy(_._1)
      .map { case (s, r) => s"$s:${r.size}t/${r.sum}rec" }.mkString(" "))
    byStage.toSeq.collect {
      case (sid, recs) if recs.sum > 3000 && recs.size > 1 =>
        val mean = recs.sum.toDouble / recs.size
        (sid, recs.max / mean, recs.sum)
    }
  }

  /** 2 000 docs, 90% in one hot group, sharing a rotating window over a
    * common token stream — hot group, hot grams, realistic near-dup mass.
    */
  private def skewedDocs: DataFrame = {
    val words = (0 until 400).map(i => s"tok$i")
    (0 until 2000).map { i =>
      val grp = if (i % 10 == 0) s"cold${i % 7}" else "hot"
      val text = (0 until 60).map(j => words((i / 4 + j) % words.size)).mkString(" ")
      (i.toLong, grp, text)
    }.toDF("doc_id", "source", "text")
      // a local Seq stays a driver-side LocalRelation that the optimizer
      // can fold through — repartition makes the source genuinely
      // distributed so the join shuffles are real and measurable
      .repartition(8)
  }

  /** Force real shuffle joins and strip AQE's skew net for the duration. */
  private def structural[T](body: => T): T = {
    val saved = Seq(
      "spark.sql.shuffle.partitions",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    // AQE would coalesce these test-sized shuffles into ONE task, hiding
    // the very distribution under measurement
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q21's salted candidate join keeps every stage balanced under 90% group skew") {
    structural {
      val ratios = stageSkewRatios(
        NgramJaccard.jaccardPairs(skewedDocs, "doc_id", "text", "source", 3, 0.6))
      assert(ratios.nonEmpty, "expected at least one data-moving stage")
      ratios.foreach { case (sid, ratio, total) =>
        info(f"stage $sid: max/mean shuffle-read = $ratio%.2f over $total records")
        assert(ratio <= 6.0,
          f"stage $sid serializes on a hot task: max/mean = $ratio%.2f")
      }
    }
  }

  test("q112's rarest-gram prefix join keeps every stage balanced under the same skew") {
    structural {
      val ratios = stageSkewRatios(
        PrefixJoin.similarPairs(skewedDocs, "doc_id", "text", 3, 0.5))
      assert(ratios.nonEmpty, "expected at least one data-moving stage")
      ratios.foreach { case (sid, ratio, total) =>
        info(f"stage $sid: max/mean shuffle-read = $ratio%.2f over $total records")
        assert(ratio <= 6.0,
          f"stage $sid serializes on a hot task: max/mean = $ratio%.2f")
      }
    }
  }

  test("contrast: the same skew on a NAIVE group-keyed self-join does serialize") {
    structural {
      val ids = skewedDocs.select(col("source"), col("doc_id"))
      val naive = ids.join(ids.withColumnRenamed("doc_id", "doc_b"), Seq("source"))
        .filter(col("doc_id") < col("doc_b"))
      val ratios = stageSkewRatios(naive)
      // the hot group owns ~90% of rows → with 16 partitions the task
      // holding it reads ~14x the stage mean; this is the failure mode
      // the salting (and, at runtime, AQE skew-split) prevents
      assert(ratios.exists(_._2 > 6.0),
        s"expected the naive join to skew, got ${ratios.map(_._2).mkString(",")}")
    }
  }
}
