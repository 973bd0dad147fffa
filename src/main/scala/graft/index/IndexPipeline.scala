package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Ids
import graft.core.Model._
import graft.ingest.SourceScan

/** The batch indexing pipeline (reference lifecycle SURVEY.md §3.1):
  * scan → diff vs file_state → parse changed → chunk build → entity-aware
  * relation filter → content-hash dedup → embed new → merge store →
  * orphan cleanup → state update.
  *
  * Every maintenance step is a join (set-at-a-time), not a per-item RPC:
  *  - changed/deleted detection: full-outer join of scan vs state on path;
  *  - CALLS filter: left-semi join of edges vs the entity-name set
  *    (broadcast — names are small relative to chunks);
  *  - dedup: left-anti join on contentHash (skips re-embedding unchanged
  *    content — the reference's embedding-cache semantics, set-at-a-time);
  *  - orphan cleanup: anti-joins of relation chunks vs entity names.
  */
object IndexPipeline {

  case class IndexingResult(
      mode: String,
      filesScanned: Long,
      filesParsed: Long,
      entities: Long,
      relations: Long,
      chunksWritten: Long,
      chunksCarried: Long,
      errors: Seq[String])

  /** External-target whitelist for orphan cleanup (reference 25-ext list,
    * storage/qdrant.py:2150-2180): relation targets that look like files or
    * external modules are not orphans even if unresolved.
    */
  private val ExternalExts = Seq(
    ".py", ".js", ".ts", ".tsx", ".json", ".yaml", ".yml", ".md", ".txt",
    ".css", ".html", ".csv", ".ini", ".cfg", ".toml", ".log", ".sh", ".sql")

  private val ExtPattern = ExternalExts.map(e => s".*\\$e$$").mkString("|")

  /** The single well-formedness rule for relation chunks, shared by the
    * index pass and the maintenance pass (so a freshly-written store is a
    * cleanup fixed point): keep an edge iff its target is a known entity,
    * OR it's an import (external modules are legitimate targets), OR the
    * target looks like an external file.
    */
  def keepWellFormedRelations(relChunks: DataFrame, names: DataFrame): DataFrame =
    relChunks.alias("r")
      .join(broadcast(names).alias("n"), col("r.relationTarget") === col("n.entityName"), "left_semi")
      .unionByName(relChunks.filter(col("relationType") === "imports" ||
        col("relationTarget").rlike(ExtPattern)))
      .dropDuplicates("chunkId")

  def index(spark: SparkSession, projectDir: String, storeDir: String,
            embedder: Embedder = DeterministicEmbedder()): IndexingResult = {
    import spark.implicits._

    val scanned = SourceScan.scan(spark, projectDir).cache()
    val filesScanned = scanned.count()

    val prevState = IndexStore.readState(spark, storeDir)
    val incremental = prevState.isDefined && IndexStore.exists(storeDir)

    // --- incremental diff (reference: indexer.py:886-1021) ---------------
    val currentMeta = scanned.map(f => FileState(f.relPath, Ids.sha256Hex(f.content), f.size, f.mtime))
    val (toParse: Dataset[FileRow], removedPaths: Seq[String]) = prevState match {
      case Some(st) if incremental =>
        val prev = st.as[FileState]
        val joined = currentMeta.toDF.alias("cur")
          .join(prev.toDF.alias("prev"), Seq("relPath"), "full_outer")
          .select(col("relPath"),
            col("cur.hash").as("curHash"), col("prev.hash").as("prevHash"))
        val changedPaths = joined
          .filter(col("curHash").isNotNull && (col("prevHash").isNull || col("curHash") =!= col("prevHash")))
          .select("relPath").as[String].collect().toSet
        val removed = joined.filter(col("curHash").isNull).select("relPath").as[String].collect().toSeq
        (scanned.filter(f => changedPaths.contains(f.relPath)), removed)
      case _ => (scanned, Seq.empty[String])
    }

    // --- parse + merge ---------------------------------------------------
    val results = SourceScan.parseAll(toParse).cache()
    val filesParsed = results.count()
    val replacedPaths = toParse.map(_.relPath).collect().toSet ++ removedPaths

    val res = applyChanges(spark, storeDir, results, replacedPaths, incremental, embedder)

    IndexStore.writeState(currentMeta.toDF(), storeDir)
    scanned.unpersist(); results.unpersist()
    res.copy(mode = if (incremental) "incremental" else "full",
      filesScanned = filesScanned, filesParsed = filesParsed)
  }

  /** Merge a batch of parse results into the store: drop replaced/deleted
    * files' chunks, entity-aware relation filter, content-hash dedup,
    * embed what's new, copy-on-write swap. Shared by the batch indexer and
    * the streaming `foreachBatch` path (SURVEY.md §3.3 "same batch
    * pipeline").
    */
  def applyChanges(spark: SparkSession, storeDir: String,
                   results: Dataset[ParserResult], replacedPaths: Set[String],
                   incremental: Boolean, embedder: Embedder): IndexingResult = {
    import spark.implicits._

    val errors = results.flatMap(_.errors).collect().toSeq
    val entities = results.flatMap(_.entities.map(e => (e.filePath, e.name, e.entityType)))
      .toDF("filePath", "name", "entityType")
    val nEntities = entities.count()

    val newChunksRaw = results.flatMap(r => ChunkBuilder.chunksOf(r)).toDF().cache()

    // --- carry over unchanged chunks, drop replaced/deleted --------------
    val carried: DataFrame =
      if (incremental) {
        val existing = IndexStore.readChunks(spark, storeDir)
        if (replacedPaths.isEmpty) existing
        else existing.filter(!col("filePath").isin(replacedPaths.toSeq: _*))
      } else spark.emptyDataset[Chunk].toDF()
        .withColumn("pointId", lit(0L)).withColumn("dense", lit(null).cast("array<double>"))

    // global entity-name set: current batch + carried store
    // (reference: indexer.py:1212-1247)
    val carriedNames = carried.filter(col("chunkType") === "metadata").select(col("entityName"))
    val names = entities.select(col("name").as("entityName")).union(carriedNames).distinct().cache()

    // entity-aware CALLS filter + orphan pre-filter
    // (reference: indexer.py:496-520,1132-1210)
    val relChunks = newChunksRaw.filter(col("chunkType") === "relation")
    val keepRelations = keepWellFormedRelations(relChunks, names)
    val nonRelChunks = newChunksRaw.filter(col("chunkType") =!= "relation")
    val newChunks = nonRelChunks.unionByName(keepRelations).dropDuplicates("chunkId")

    // carried relation chunks may now be orphaned by deletions: the FROM
    // side must still exist AND the target must stay well-formed
    val carriedClean =
      if (incremental) {
        val carriedRel = keepWellFormedRelations(
          carried.filter(col("chunkType") === "relation"), names)
          .alias("r")
          .join(broadcast(names).alias("n"), col("r.entityName") === col("n.entityName"), "left_semi")
        carried.filter(col("chunkType") =!= "relation").unionByName(carriedRel)
      } else carried

    // --- content-hash dedup before embedding (the big cost saver) --------
    val toEmbed = newChunks.alias("nw")
      .join(carriedClean.select("contentHash").distinct().alias("ex"),
        Seq("contentHash"), "left_anti")
    val reusable = newChunks.alias("nw")
      .join(carriedClean.select(col("contentHash"), col("dense").as("dense_ex")).dropDuplicates("contentHash").alias("ex"),
        Seq("contentHash"), "inner")
      .withColumn("dense", col("dense_ex")).drop("dense_ex")

    val embedded = embedder.embed(toEmbed, "content")
      .withColumn("pointId", expr("cast(conv(substring(sha2(chunkId, 256), 1, 15), 16, 10) as bigint)"))
    val reused = reusable
      .withColumn("pointId", expr("cast(conv(substring(sha2(chunkId, 256), 1, 15), 16, 10) as bigint)"))

    // persist: the embed DAG must run ONCE — the stat counts and the store
    // write would otherwise each re-embed every new chunk (4x the work; with
    // a remote embedder, 4x the HTTP spend)
    val finalNew = embedded.unionByName(reused.select(embedded.columns.map(col): _*))
      .persist()
    val all = carriedClean.select(finalNew.columns.map(col): _*).unionByName(finalNew)
      .dropDuplicates("chunkId")
      .persist()

    val chunksWritten = finalNew.count()
    // one job for total + relation count instead of two over `all`
    val statRow = all.agg(
      count(lit(1)).as("total"),
      count(when(col("chunkType") === "relation", 1)).as("rel")).head()
    val nRelations = statRow.getLong(1)
    val chunksCarried = statRow.getLong(0) - chunksWritten

    IndexStore.writeChunks(all, storeDir)
    newChunksRaw.unpersist(); names.unpersist(); all.unpersist(); finalNew.unpersist()
    IndexingResult(if (incremental) "incremental" else "full",
      0, 0, nEntities, nRelations, chunksWritten, chunksCarried, errors)
  }

  /** Phantom-CALLS detection (reference: storage/qdrant.py:2325-2381):
    * calls edges whose caller implementation no longer contains
    * `callee(` outside comments. Returns the phantom relation chunkIds.
    */
  def phantomCalls(chunks: DataFrame): DataFrame = {
    val calls = chunks.filter(col("chunkType") === "relation" && col("relationType") === "calls")
      .select(col("chunkId"), col("entityName").as("caller"), col("relationTarget").as("callee"))
    val impls = chunks.filter(col("chunkType") === "implementation")
      .select(col("entityName").as("caller"),
        regexp_replace(col("content"), "(?m)#.*$", "").as("body"))
    calls.join(impls, Seq("caller"), "inner")
      .filter(!col("body").contains(concat(col("callee"), lit("("))))
      .select(col("chunkId"))
  }
}
