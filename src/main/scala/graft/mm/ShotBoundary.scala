package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.mm.Multimodal.MediaRow

/** Shot-boundary detection over the real Y4M decode path — the
  * video-level operator a training-data pipeline needs before frame
  * sampling: sampling WITHIN shots (not blindly every N frames) is what
  * keeps a clip's frames diverse. The detector is the classic
  * sum-of-absolute-luma-differences cut detector (Zhang/Kankanhalli/
  * Smoliar 1993's pairwise pixel comparison family), kept integer-exact:
  * a cut is a consecutive-frame pair whose SAD exceeds
  * `threshold × n_pixels` — an integer cross-multiply, no float mean.
  *
  * Scale: one flatMap over clips (decode = byte walking for Y4M), each
  * clip emitting nFrames−1 bounded rows; no shuffle at all until the
  * caller aggregates. Compressed codecs aren't in the JDK — undecodable
  * payloads drop out, surfacing codec regressions as row-count drift
  * (the q51 property).
  */
object ShotBoundary {

  /** One row per consecutive-frame pair: (media_id, frame, diff_sum,
    * n_pixels) with `frame` the LATER frame's index and `diff_sum` the
    * integer sum of absolute luma deltas.
    */
  def frameDeltas(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      if (r.kind != "video") Seq.empty[(Long, Long, Long, Long)]
      else Multimodal.decodeY4m(r.bytes) match {
        case Some(v) =>
          (1 until v.frames.length).map { f =>
            val a = v.frames(f - 1)
            val b = v.frames(f)
            var s = 0L
            var i = 0
            while (i < a.length) {
              s += math.abs((b(i) & 0xff) - (a(i) & 0xff))
              i += 1
            }
            (r.mediaId, f.toLong, s, a.length.toLong)
          }
        case None => Seq.empty[(Long, Long, Long, Long)]
      }
    }.toDF("media_id", "frame", "diff_sum", "n_pixels")
  }

  /** Cut frames at mean abs delta ≥ threshold (integer cross-multiply). */
  def boundaries(media: Dataset[MediaRow], threshold: Long): DataFrame =
    frameDeltas(media)
      .filter(col("diff_sum") >= col("n_pixels") * threshold)
      .select(col("media_id"), col("frame"), col("diff_sum"), col("n_pixels"))
}
