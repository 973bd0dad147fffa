package graft.core

/** Core data model of the code-memory engine (SURVEY.md §1.1; reference
  * dataclasses: analysis/entities.py:346-437, storage/base.py:51-98).
  *
  * Everything is a plain case class so `Dataset[T]` gets a product encoder;
  * the stored tables use these exact shapes (schema-on-write parquet).
  * IDs are fully content-deterministic (SURVEY §7.4 "non-determinism to
  * avoid"): no timestamps, no object-identity salts.
  */
object Model {

  /** Entity kinds (reference: analysis/entities.py:10-27, 14 values). */
  object EntityTypes {
    val All: Set[String] = Set(
      "project", "directory", "file", "class", "interface", "function",
      "method", "variable", "import", "module", "constant", "documentation",
      "test", "chat_history")
  }

  /** Relation kinds (reference: analysis/entities.py:29-41, 10 values). */
  object RelationTypes {
    val All: Set[String] = Set(
      "contains", "imports", "inherits", "calls", "uses", "implements",
      "extends", "documents", "tests", "references")

    /** Types that hold in BOTH directions (reference Relation.__post_init__
      * sets is_bidirectional for these, analysis/entities.py:417-437).
      * Derived from the type — never stored independently, so it can't
      * drift from the edge rows.
      */
    val Bidirectional: Set[String] = Set("references", "uses")
  }

  /** A graph node (reference Entity, analysis/entities.py:346-393). */
  case class Entity(
      name: String,
      entityType: String,
      filePath: String,
      lineNumber: Int,
      endLineNumber: Int,
      observations: Seq[String],
      docstring: String,
      signature: String)

  /** A graph edge (reference Relation, analysis/entities.py:396-437). */
  case class Relation(
      fromEntity: String,
      toEntity: String,
      relationType: String,
      importType: String,
      context: String,
      confidence: Double) {
    /** Reference Relation.is_bidirectional (analysis/entities.py:417-437). */
    def isBidirectional: Boolean = RelationTypes.Bidirectional.contains(relationType)
  }

  /** The unit of vector storage (reference EntityChunk/RelationChunk,
    * analysis/entities.py:48-306): progressive disclosure — cheap
    * `metadata` chunks are searched first, heavyweight `implementation`
    * chunks fetched on demand, `relation` chunks carry edges.
    */
  case class Chunk(
      chunkId: String,
      chunkType: String, // metadata | implementation | relation
      entityName: String,
      entityType: String,
      filePath: String,
      lineNumber: Int,
      endLineNumber: Int,
      content: String,
      contentBm25: String,
      contentHash: String,
      relationTarget: String, // relation chunks only, else ""
      relationType: String, // relation chunks only, else ""
      hasImplementation: Boolean)

  /** Per-file parse output (reference ParserResult, analysis/parser.py:45-83). */
  case class ParserResult(
      filePath: String,
      fileHash: String,
      entities: Seq[Entity],
      relations: Seq[Relation],
      implementationChunks: Seq[Chunk],
      errors: Seq[String])

  /** Scanned source file (the ingestion unit). */
  case class FileRow(
      path: String,
      relPath: String,
      size: Long,
      mtime: Long,
      content: String)

  /** Indexing state entry (reference .claude-indexer/{collection}.json,
    * indexer.py:1485-1593): drives incremental diffs.
    */
  case class FileState(relPath: String, hash: String, size: Long, mtime: Long)
}
