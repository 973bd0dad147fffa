package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Ids, Tables}
import graft.core.Model.Entity
import graft.index.{ChunkBuilder, DeterministicEmbedder}
import graft.search.KnnSearch

/** Engine-core operators driven through the REAL library code paths
  * (ChunkBuilder / DeterministicEmbedder / KnnSearch), oracle-checked by
  * re-deriving the same deterministic formulas in SQL. This is the
  * BASELINE.json north star — "DataFrame-based vector index build" — as a
  * verifiable query: documents → entities → metadata chunks (+ids, hashes)
  * → dense embeddings → top-k semantic search.
  */
object EngineQueries {

  type Q = (SparkSession, String) => DataFrame

  val SearchText = "spark join stream"
  private val embedder = DeterministicEmbedder(64)

  /** documents rows as code-memory entities (one doc = one documentation
    * entity; observation = 200-char preview).
    */
  private def docEntities(s: SparkSession, dir: String) = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .map { case (id, src, text) =>
        Entity(s"doc_$id", "documentation", src, 1, 1, Seq(text.take(200)), "", "")
      }
  }

  def defs: Map[String, Q] = Map(
    // Metadata-chunk build: ids, weighted content, bm25 doc, content hash.
    "q27_chunk_build" -> ((s, dir) => {
      import s.implicits._
      docEntities(s, dir)
        .map(ChunkBuilder.metadataChunk)
        .map(c => (c.chunkId, Ids.pointId(c.chunkId), c.entityName, c.content,
          c.contentBm25, c.contentHash))
        .toDF("chunk_id", "point_id", "entity_name", "content", "content_bm25", "content_hash")
    }),

    // Vector index build + semantic top-k: embed all chunk contents with
    // the deterministic embedder (pure codegen map), then cosine search.
    "q28_semantic_search" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val indexed = embedder.embed(docs, "text", "dense")
      KnnSearch.topK(indexed, "doc_id", "dense", embedder.embedText(SearchText), 10)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
    })
  )

  private val h31 = "CAST(('0x'||substr(md5(s),1,15)) AS BIGINT) % 2147483647"
  private def embedSql(textExpr: String): String =
    s"""list_transform(generate_series(0, 63), d ->
       |  ((CAST(('0x'||substr(md5($textExpr || ':' || d),1,15)) AS BIGINT) % 2147483647 % 2001) - 1000) / 1000.0)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q27_chunk_build" ->
      """WITH e AS (
        |  SELECT doc_id, source, text,
        |         'doc_' || doc_id AS name,
        |         substr(text, 1, 200) AS obs
        |  FROM documents
        |), c AS (
        |  SELECT source || '::' || name || '::metadata' AS chunk_id,
        |         name AS entity_name,
        |         'documentation: ' || name || ' | ' || obs AS content,
        |         name || ' ' || name || ' ' || replace(name, '_', ' ') || ' documentation ' || source AS content_bm25
        |  FROM e
        |)
        |SELECT chunk_id,
        |       CAST(('0x'||substr(sha256(chunk_id),1,15)) AS BIGINT) AS point_id,
        |       entity_name, content, content_bm25,
        |       sha256(content) AS content_hash
        |FROM c""".stripMargin,

    "q28_semantic_search" ->
      s"""WITH qv AS (SELECT ${embedSql(s"'$SearchText'")} AS v),
         |emb AS (SELECT doc_id, ${embedSql("text")} AS e FROM documents)
         |SELECT doc_id, round(list_cosine_similarity(e, (SELECT v FROM qv)), 6) AS score
         |FROM emb
         |ORDER BY list_cosine_similarity(e, (SELECT v FROM qv)) DESC, doc_id
         |LIMIT 10""".stripMargin
  )
}
