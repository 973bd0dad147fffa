package graft.streaming

import java.nio.file.{Files, Paths}
import graft.SparkSpec
import graft.api.GraftEngine

class WatchSourceSpec extends SparkSpec {
  import spark.implicits._

  private def write(dir: String, rel: String, content: String): Unit = {
    val p = Paths.get(dir, rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  test("directory watch source: created/modified/deleted micro-batches") {
    val dir = Files.createTempDirectory("graft_watch_dir").toString
    val ckpt = Files.createTempDirectory("graft_watch_ckpt").toString
    write(dir, "a.py", "def f():\n    return 1\n")

    val events = spark.readStream
      .format("graft.streaming.FileWatchSource")
      .option("path", dir)
      .load()
      .as[WatchPipeline.FileEvent]

    val seen = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val q = events.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[WatchPipeline.FileEvent], _: Long) =>
        seen.synchronized { seen ++= batch.collect().map(e => e.relPath -> e.eventType) }: Unit
      }
      .start()
    try {
      // baseline snapshot: the pre-existing file emits NO event
      q.processAllAvailable()
      assert(seen.isEmpty)

      write(dir, "b.py", "def g():\n    return 2\n")
      q.processAllAvailable()
      assert(seen.toSet == Set("b.py" -> "created"))

      write(dir, "a.py", "def f():\n    return 42\n")
      Files.delete(Paths.get(dir, "b.py"))
      q.processAllAvailable()
      assert(seen.toSet == Set("b.py" -> "created", "a.py" -> "modified", "b.py" -> "deleted"))
    } finally q.stop()
  }

  test("watch end-to-end: directory edits flow through the incremental merge into the store") {
    val dir = Files.createTempDirectory("graft_watch_proj").toString
    val ckpt = Files.createTempDirectory("graft_watch_ckpt2").toString
    val store = Files.createTempDirectory("graft_watch_store").toString
    write(dir, "main.py", "def alpha():\n    '''First.'''\n    return 1\n")

    val events = spark.readStream
      .format("graft.streaming.FileWatchSource")
      .option("path", dir)
      .load()
      .as[WatchPipeline.FileEvent]

    // initial full index of the pre-existing tree, then watch
    val q = WatchPipeline.initialIndexThenWatch(spark, dir, events, store, ckpt, debounceMs = 100L)
    val engine = GraftEngine(spark, store)
    try {
      q.processAllAvailable()
      assert(engine.entitiesForFile("main.py").count() > 0)

      write(dir, "extra.py", "def beta():\n    '''Second.'''\n    return 2\n")
      q.processAllAvailable()
      assert(engine.entitiesForFile("extra.py")
        .filter(org.apache.spark.sql.functions.array_contains(
          org.apache.spark.sql.functions.col("entities"), "beta")).count() > 0)

      Files.delete(Paths.get(dir, "extra.py"))
      q.processAllAvailable()
      assert(engine.entitiesForFile("extra.py").count() == 0)
    } finally q.stop()
  }
}
