package graft.index

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Proof of the co-located join layout the store uses at cluster scale
  * (SURVEY.md §7.1 / prompt: "bucketing for co-located joins"): two tables
  * bucketed+sorted on the join key join with ZERO Exchange operators —
  * the shuffle happened once at write time, not per query.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed chunk tables join without a shuffle") {
    val a = (1L to 1000L).map(i => (i, s"content_$i")).toDF("pointId", "content")
    val b = (1L to 1000L).map(i => (i, i % 7)).toDF("pointId", "label")
    spark.sql("DROP TABLE IF EXISTS bt_chunks")
    spark.sql("DROP TABLE IF EXISTS bt_vectors")
    a.write.bucketBy(4, "pointId").sortBy("pointId").saveAsTable("bt_chunks")
    b.write.bucketBy(4, "pointId").sortBy("pointId").saveAsTable("bt_vectors")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("bt_chunks").join(spark.table("bt_vectors"), "pointId")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("unbucketed baseline DOES shuffle (sanity check of the assertion)") {
    val a = (1L to 1000L).map(i => (i, s"c$i")).toDF("pointId", "content")
    val b = (1L to 1000L).map(i => (i, i % 7)).toDF("pointId", "label")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = a.join(b, "pointId").queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
