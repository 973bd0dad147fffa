package graft.core

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Deterministic hashing/IDs (reference: storage/qdrant.py:1423-1430 —
  * `int(sha256(chunk_id)[:16], 16)`; we take 15 hex digits = 60 bits so the
  * value is a positive signed long in every engine, and the same derivation
  * is expressible in SQL as `conv(substring(sha2(x,256),1,15),16,10)`).
  */
object Ids {

  def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** 60-bit positive long from the first 15 hex chars of sha256. */
  def pointId(chunkId: String): Long =
    java.lang.Long.parseLong(sha256Hex(chunkId).substring(0, 15), 16)

  /** 31-bit hash used by the deterministic embedder and dedup family —
    * must stay formula-identical to the SQL side
    * (`conv(substring(md5(s),1,15),16,10) % 2147483647`).
    */
  def hash31(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16) % 2147483647L

  /** Chunk-id grammar (reference: analysis/entities.py:81-143,247-262 —
    * minus the `id(relation)` salt, which would break determinism).
    */
  def entityChunkId(filePath: String, name: String, chunkType: String): String =
    s"$filePath::$name::$chunkType"

  def relationChunkId(from: String, relType: String, to: String): String =
    s"$from::$relType::$to"
}
