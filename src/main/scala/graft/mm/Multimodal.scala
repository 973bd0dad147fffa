package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Ids

/** Multimodal column plumbing for a training-data pipeline: media as
  * opaque `binary` columns + typed metadata, with decode / feature-extract
  * / resize / frame-sample as batched per-partition stages.
  *
  * The Spark-side shape is real and tested — schema, partitioning, batch
  * iteration — while the codec itself is STUBBED (this container has no
  * image/audio libraries): `decodeStub` derives deterministic pseudo
  * dimensions/features from the bytes. Swapping in a real decoder changes
  * ONLY the function body passed to `mapPartitions`; the pipeline shape
  * (batched iterator in, rows out — the Scala analog of `mapInPandas`
  * batches) stays identical.
  */
object Multimodal {

  /** A media row: opaque payload + typed envelope. */
  case class MediaRow(mediaId: Long, kind: String, bytes: Array[Byte], meta: Map[String, String])

  /** Decoded features (what a real decoder would emit). */
  case class MediaFeatures(
      mediaId: Long,
      kind: String,
      sizeBytes: Long,
      contentHash: String,
      width: Int, // STUB: derived, not decoded
      height: Int, // STUB: derived, not decoded
      durationMs: Long, // STUB: derived, not decoded
      embedding: Seq[Double])

  val BatchSize = 64 // batch shape of the vectorized-UDF analog
  val EmbeddingDim = 16

  /** STUB decode: deterministic pseudo-decode from the payload bytes.
    * A real implementation calls the codec per batch here (batching
    * amortizes model/codec init exactly like pandas-UDF batches).
    */
  def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.grouped(BatchSize).flatMap { batch =>
      // per-batch init would happen HERE (codec/model handle)
      batch.map { r =>
        val h = Ids.md5Hex(r.bytes.map("%02x".format(_)).mkString)
        val h31 = Ids.hash31(h)
        MediaFeatures(
          r.mediaId, r.kind, r.bytes.length.toLong, h,
          width = (h31 % 1920).toInt + 1,
          height = (h31 % 1080).toInt + 1,
          durationMs = if (r.kind == "image") 0L else h31 % 600000L,
          embedding = (0 until EmbeddingDim).map(d =>
            ((Ids.hash31(s"$h:$d") % 2001L) - 1000L) / 1000.0))
      }
    }

  /** Feature extraction over a media table: repartition for parallel decode
    * (codec work is CPU-bound — spread it), then batched per-partition
    * decode.
    */
  def extractFeatures(media: Dataset[MediaRow], partitions: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.repartition(partitions).mapPartitions(decodeStub)
  }

  /** STUB resize: a real implementation transforms the payload; the stub
    * tags the metadata and passes bytes through (shape-preserving).
    */
  def resizeStub(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map(r => r.copy(meta = r.meta + ("resized" -> s"${w}x$h")))
  }

  /** STUB frame sampling for video rows: emits `n` pseudo-frames per video
    * as image rows (a real impl decodes frames; the fan-out shape — one
    * row to n rows — is the real part).
    */
  def sampleFramesStub(media: Dataset[MediaRow], n: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      if (r.kind != "video") Seq(r)
      else (0 until n).map(i => r.copy(
        mediaId = r.mediaId * 1000 + i,
        kind = "image",
        meta = r.meta + ("frame" -> i.toString, "parent" -> r.mediaId.toString)))
    }
  }
}
