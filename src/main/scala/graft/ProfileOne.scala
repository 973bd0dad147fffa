package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Optimization-round profiler: times individual queries with the Bench
  * methodology (noop sink, min-of-N after an untimed warmup) and dumps
  * `explain("formatted")` into a plan ledger directory (plans/r12/...).
  * Harness-only code — never on a query path.
  *
  * Usage: runMain graft.ProfileOne <sfDir> <planDir> <suffix> <reps> q...
  * (empty suffix skips the plan dump; suffix "before"/"after" writes
  * <planDir>/<query>_<suffix>.txt)
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val planDir = args(1)
    val suffix = args(2)
    val reps = args(3).toInt
    val names = args.drop(4)
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
    Files.createDirectories(Paths.get(planDir))
    names.foreach { name =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      if (suffix.nonEmpty) {
        val df = SparkEntry.queries(name)(spark, sfDir)
        Files.writeString(Paths.get(planDir, s"${name}_$suffix.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      }
      println(f"[profile] $name min=${times.min}%.3f s  " +
        s"runs=[${times.map(t => f"$t%.3f").mkString(",")}]")
    }
    spark.stop()
  }
}
