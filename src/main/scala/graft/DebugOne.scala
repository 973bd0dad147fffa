package graft
import org.apache.spark.sql.SparkSession

/** Scratch runner: execute a single SparkEntry query in a fresh JVM
  * (`runMain graft.DebugOne <name> <sfDir>`) — for isolating per-query
  * memory/perf behavior from the full Verify sweep.
  */
object DebugOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // run twice: the first timing carries JVM/codegen warmup, the second is
    // the steady-state number comparable to a mid-suite Bench entry
    val reps = if (args.length > 2) args(2).toInt else 2
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[debugone] $name run$i rows=$n in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
