package graft

import org.apache.spark.sql.SparkSession

/** CORE-COUNT scaling probe (r12 verdict item 2): the full bench at sf0.1
  * cannot demonstrate parallel scaling — per-query wall (~1-2 s) is
  * dominated by fixed per-job overhead (scheduling, codegen, small-file
  * I/O), so 8-core vs 32-core ratios sit at ≈1 and the driver's
  * `suspect_cpus_ignored` flag fires spuriously. This main times a small
  * set of compute-dominant queries against a LARGER input (the
  * [[ScaleData]]-synthesized sf1 by default) at the core count given by
  * `$SPARK_GRAFT_CPUS`, and echoes the EFFECTIVE parallelism
  * (`sc.defaultParallelism` + resolved master) into its one-line JSON so
  * the scaling contract is checkable from the artifact alone.
  *
  * Harness-only code — never on a query path. Same methodology as
  * [[Bench]]: noop sink, untimed warmup, min of `reps` passes.
  *
  * Usage: runMain graft.BenchCores <sfDir> <reps> <query...>
  */
object BenchCores {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096") // match Bench
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      graft.core.Tables.lineitem(spark, sfDir).limit(1000)
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => }
    val results = names.map { name =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"cores_probe","value":$total%.3f,"unit":"sec","cpus":$cpus,"parallelism":${spark.sparkContext.defaultParallelism},"master":"${spark.sparkContext.master}","queries":$qs,"sf":"$sfDir","runs":$reps,"agg":"min"}""")
    spark.stop()
  }
}
