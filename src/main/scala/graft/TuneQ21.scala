package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scratch harness: phase breakdown of q21's jaccardPairs plan. Delete
  * after tuning.
  */
object TuneQ21 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val (idCol, textCol, groupCol, n, minJaccard, buckets) =
      ("doc_id", "text", "source", 3, 0.6, 16)
    def timeIt[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[tune] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    for (round <- 1 to 2) {
      println(s"[tune] === round $round ===")
      val docs = Tables.documents(spark, sfDir)
      val grams = docs.select(
        col(idCol).as("doc_id"), col(groupCol).as("grp"),
        graft.dedup.NgramJaccard.charNgrams(textCol, n).as("gs"))
        .withColumn("g", expr("array_sort(transform(gs, x -> xxhash64(x)))")).drop("gs")
        .withColumn("sz", size(col("g")))
        .persist()
      timeIt("gram build + persist")(grams.count())
      val ids = grams.select(col("grp"), col("doc_id"), col("sz"))
      val a = ids.select(col("grp"), col("doc_id").as("doc_a"), col("sz").as("sz_a"))
        .withColumn("bi", pmod(hash(col("doc_a")), lit(buckets)))
        .withColumn("bj", explode(sequence(lit(0), lit(buckets - 1))))
      val b = ids.select(col("grp"), col("doc_id").as("doc_b"), col("sz").as("sz_b"))
        .withColumn("bi", explode(sequence(lit(0), lit(buckets - 1))))
        .withColumn("bj", pmod(hash(col("doc_b")), lit(buckets)))
      val cand = a.join(b, Seq("grp", "bi", "bj"))
        .filter(col("doc_a") < col("doc_b"))
        .filter(least(col("sz_a"), col("sz_b")).cast("double") /
          greatest(col("sz_a"), col("sz_b")) >= minJaccard)
        .select(col("grp"), col("doc_a"), col("doc_b"), col("sz_a"), col("sz_b"))
      timeIt("candidate fabric only")(cand.count())
      val attached = cand
        .join(grams.select(col("grp"), col("doc_id").as("doc_a"), col("g").as("g_a")), Seq("grp", "doc_a"))
        .join(grams.select(col("grp"), col("doc_id").as("doc_b"), col("g").as("g_b")), Seq("grp", "doc_b"))
      timeIt("+ array attach (count only)")(attached.count())
      val full = attached
        .withColumn("inter",
          org.apache.spark.sql.graftx.SortedIntersectSize.asColumn(col("g_a"), col("g_b")).cast("double"))
        .withColumn("jaccard", col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
        .filter(col("jaccard") >= minJaccard)
        .select(col("grp"), col("doc_a"), col("doc_b"), col("jaccard"))
      timeIt("+ merge-intersect + filter")(full.count())
      grams.unpersist()
    }
    spark.stop()
  }
}
