package graft.queries

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.api.GraftEngine

/** End-to-end indexing exercise for the gate: generates a deterministic
  * synthetic source tree (python + markdown + json), runs the FULL
  * pipeline (scan → parse → chunk → dedup → embed → store), then runs one
  * hybrid search and graph read against the fresh store, and reports
  * structural counts. No SQL oracle (the parser isn't SQL-expressible) —
  * the driver records the rows-only check; determinism of every count is
  * what makes the check meaningful.
  */
object IndexBenchQueries {

  type Q = (SparkSession, String) => DataFrame

  val NumPyFiles = 120
  val NumMdFiles = 30

  /** Deterministic synthetic project: functions call functions of the
    * previous file (real CALLS edges), every 10th file re-uses file 0's
    * body (content-hash dedup work), markdown docs reference sections.
    */
  def writeSyntheticRepo(root: String): Unit = {
    (0 until NumPyFiles).foreach { i =>
      val src = if (i % 10 == 0 && i > 0) pySource(0) else pySource(i)
      val p = Paths.get(root, f"mod$i%03d.py")
      Files.createDirectories(p.getParent)
      Files.writeString(p, src)
    }
    (0 until NumMdFiles).foreach { i =>
      Files.writeString(Paths.get(root, f"doc$i%02d.md"),
        s"# Guide $i\n\nIntro for guide $i.\n\n## Usage\n\n" +
          (s"Call helper_${i % NumPyFiles}_a for step. " * 30) +
          s"\n\n## Notes\n\n" + (s"Note body $i. " * 40))
    }
    Files.writeString(Paths.get(root, "package.json"),
      """{"name": "synthetic", "dependencies": {"left-pad": "1.0"}}""")
  }

  private def pySource(i: Int): String = {
    val prev = if (i == 0) 0 else i - 1
    s"""import os
       |from json import loads
       |
       |LIMIT_$i = ${i * 10}
       |
       |def helper_${i}_a(x):
       |    '''Helper A of module $i doing transformation work.'''
       |    y = helper_${prev}_a(x) if x > 0 else x
       |    return y + $i
       |
       |def helper_${i}_b(items):
       |    '''Helper B of module $i aggregating items.'''
       |    total = 0
       |    for it in items:
       |        total += helper_${i}_a(it)
       |    return total
       |
       |class Processor$i:
       |    '''Processes batches for module $i.'''
       |    def run(self, batch):
       |        return helper_${i}_b(batch)
       |""".stripMargin
  }

  def defs: Map[String, Q] = Map(
    "q32_index_e2e" -> ((s, _) => {
      import s.implicits._
      val repo = Files.createTempDirectory("graft_synth_repo").toString
      val store = Files.createTempDirectory("graft_synth_store").toString
      writeSyntheticRepo(repo)
      val engine = GraftEngine(s, store)
      val res = engine.index(repo)
      val searchHits = engine.searchSimilar("aggregating items total", "hybrid", limit = 5).count()
      val graphRows = engine.readGraph("helper_5_a", "relationships", limit = 100).count()
      val info = engine.collectionInfo().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      Seq(
        ("files_scanned", res.filesScanned),
        ("entities", res.entities),
        ("relation_chunks", res.relations),
        ("metadata_chunks", info.getOrElse("metadata", 0L)),
        ("implementation_chunks", info.getOrElse("implementation", 0L)),
        ("search_hits", searchHits),
        ("graph_edges", graphRows),
        ("parse_errors", res.errors.length.toLong)
      ).toDF("metric", "value")
    })
  )
}
