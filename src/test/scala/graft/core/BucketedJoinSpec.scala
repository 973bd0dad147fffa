package graft.core

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/** Physical-plan proof that the bucketed layout removes the join
  * shuffle: two tables co-bucketed on the key sort-merge-join with ZERO
  * Exchange operators, while the same join over plain parquet shuffles
  * both sides.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  // AQE wraps finalized exchanges in QueryStageExec nodes where a naive
  // collect misses them — the spec runs with AQE off so ShuffleExchangeExec
  // appears literally in the executed plan
  private def shuffles(plan: SparkPlan): Int = {
    val expanded = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    expanded.collectWithSubqueries { case s: ShuffleExchangeExec => s }.size
  }

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.get(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("co-bucketed tables sort-merge-join with no Exchange on either side") {
    val left = (1L to 1000L).map(i => (i % 97, s"l$i")).toDF("k", "lv")
    val right = (1L to 1000L).map(i => (i % 97, s"r$i")).toDF("k", "rv")
    Bucketing.writeBucketed(left, "bj_left", "k", 8)
    Bucketing.writeBucketed(right, "bj_right", "k", 8)
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
    try {
      val joined = spark.table("bj_left")
        .join(spark.table("bj_right"), "k")
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
      joined.collect() // materialize so AQE finalizes the plan
      assert(shuffles(joined.queryExecution.executedPlan) == 0,
        "co-bucketed join+agg must plan without any Exchange")

      // control: the same data as plain (unbucketed) parquet shuffles
      val dir = java.nio.file.Files.createTempDirectory("bj_plain").toString
      left.write.mode("overwrite").parquet(s"$dir/l")
      right.write.mode("overwrite").parquet(s"$dir/r")
      val plain = spark.read.parquet(s"$dir/l")
        .join(spark.read.parquet(s"$dir/r"), "k")
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
      plain.collect()
      assert(shuffles(plain.queryExecution.executedPlan) > 0,
        "control join over plain parquet should shuffle")

      // and the answers agree
      assert(joined.orderBy("k").collect().toSeq ==
        plain.orderBy("k").collect().toSeq)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bj_left")
      spark.sql("DROP TABLE IF EXISTS bj_right")
    }
    }
  }

  test("groupBy on the bucket key aggregates without a shuffle") {
    val df = (1L to 500L).map(i => (i % 31, i)).toDF("k", "v")
    Bucketing.writeBucketed(df, "bj_agg", "k", 4)
    withConf("spark.sql.adaptive.enabled" -> "false") {
      try {
        val agg = spark.table("bj_agg").groupBy(col("k"))
          .agg(sum(col("v")).as("s"))
        agg.collect()
        assert(shuffles(agg.queryExecution.executedPlan) == 0,
          "bucketed groupBy on the bucket key must not exchange")
        // control: the same aggregate over unbucketed data exchanges
        val plain = df.groupBy(col("k")).agg(sum(col("v")).as("s"))
        plain.collect()
        assert(shuffles(plain.queryExecution.executedPlan) > 0)
      } finally spark.sql("DROP TABLE IF EXISTS bj_agg")
    }
  }
}
