package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Harness-only: counts Spark JOBS submitted while one gate runs (noop
  * sink) — the driver-barrier evidence for the r13 serialized-action
  * collapses. Every eager checkpoint, `.head()`, `.count()` and
  * `.collect()` on a query path is its own job; removing one shows up
  * here even when the dumped plan (a checkpoint RDD scan) cannot show it.
  *
  * Usage: runMain graft.JobCount <sfDir> <query...>
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = new AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { n.incrementAndGet(); () }
    })
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      graft.core.Tables.lineitem(spark, sfDir).limit(1000)
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => }
    names.foreach { name =>
      Thread.sleep(300) // drain warmup/prior events off the async bus
      n.set(0)
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      Thread.sleep(300)
      println(s"[jobs] $name jobs=${n.get}")
    }
    spark.stop()
  }
}
