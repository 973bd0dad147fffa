package graft.mm

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.mm.Multimodal.MediaRow

/** Perceptual AUDIO fingerprint for near-dup detection over the real WAV
  * decode path — the audio sibling of [[PerceptualHash]]'s image dHash,
  * and the multimodal-depth piece the r11 verdict sketched (task 8):
  * re-encodes, gain riding, and resampling that preserve the ENERGY
  * ENVELOPE map to nearby fingerprints; different material differs in
  * many bits. The shape is the published energy-delta family
  * (Haitsma-Kalker 2002 / Chromaprint's coarse band-energy bits), kept
  * integer-exact so the gate oracle can replay it closed-form.
  *
  * Construction: decode signed 16-bit PCM (the [[Multimodal.decodeWav]]
  * codec contract), split samples into [[Frames]] equal-share frames on
  * the same `cell = t·Frames/n` integer mapping the decode embedding
  * uses, take per-frame INTEGER absolute-amplitude sums E_f (exact — no
  * float ladder), and emit bit f = [E_{f+1} > E_f], f ∈ [0, Frames−2] —
  * a 31-bit envelope-gradient hash in a plain signed long.
  *
  * Scale: fingerprinting is a per-row map (mapPartitions batch, like the
  * decode). Near-dup pairing at Hamming ≤ d NEVER enumerates clip pairs:
  * the 31 bits split into 4 bands (8/8/8/7); by pigeonhole any pair
  * within Hamming ≤ 3 agrees on at least one full band, so the banded
  * equi-join (band value = shuffle key, the SimHash/q20 discipline)
  * produces a complete candidate set that exact `bit_count(xor)` then
  * verifies.
  */
object AudioFingerprint {

  val Frames = 32
  val Bands = 4 // 8 + 8 + 8 + 7 bits; lossless for Hamming <= 3

  /** Per-frame integer abs-amplitude sums from a 16-bit PCM WAV payload
    * (all channels folded in, like decodeWav's sumAbs); None when the
    * payload isn't PCM-16 or is empty.
    */
  def frameEnergies(bytes: Array[Byte]): Option[Array[Long]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16 || fmt.getFrameSize <= 0) None
        else {
          val data = in.readAllBytes()
          val frameBytes = fmt.getFrameSize
          val nFrames = data.length / frameBytes
          val ch = fmt.getChannels
          val big = fmt.isBigEndian
          if (nFrames == 0) None
          else {
            val e = new Array[Long](Frames)
            var f = 0
            while (f < nFrames) {
              val cell = (f.toLong * Frames / nFrames).toInt
              var c = 0
              while (c < ch) {
                val off = f * frameBytes + c * 2
                val s =
                  if (big) ((data(off) << 8) | (data(off + 1) & 0xff)).toShort
                  else ((data(off + 1) << 8) | (data(off) & 0xff)).toShort
                e(cell) += math.abs(s.toLong)
                c += 1
              }
              f += 1
            }
            Some(e)
          }
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The 31-bit envelope-gradient fingerprint; None when undecodable. */
  def fingerprint(bytes: Array[Byte]): Option[Long] =
    frameEnergies(bytes).map { e =>
      var fp = 0L
      var f = 0
      while (f < Frames - 1) {
        if (e(f + 1) > e(f)) fp |= 1L << f
        f += 1
      }
      fp
    }

  /** Per-clip fingerprints: (media_id, fp). Undecodable payloads drop
    * out — row counts surface codec regressions (the q51 property).
    */
  def fingerprints(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap(r =>
        fingerprint(r.bytes).map(fp => (r.mediaId, fp))))
      .toDF("media_id", "fp")
  }

  /** Near-dup clip pairs at Hamming ≤ maxHamming (≤ 3 for completeness
    * under the 4-band split): banded candidate join + exact popcount
    * verify. Output: (clip_a, clip_b, hamming), one row per pair.
    */
  def nearDupPairs(media: Dataset[MediaRow], maxHamming: Int): DataFrame = {
    require(maxHamming <= Bands - 1,
      s"the $Bands-band split is only complete for Hamming <= ${Bands - 1}")
    val fp = fingerprints(media)
    val bandCols = (0 until Bands).map { b =>
      val width = if (b == Bands - 1) 7 else 8
      struct(lit(b).as("b"),
        shiftright(col("fp"), b * 8).bitwiseAND(lit((1 << width) - 1)).as("v"))
    }
    val bands = fp.select(col("media_id"), col("fp"),
        explode(array(bandCols: _*)).as("bd"))
      .select(col("media_id"), col("fp"), col("bd.b").as("b"), col("bd.v").as("v"))
    val a = bands.select(col("b"), col("v"),
      col("media_id").as("clip_a"), col("fp").as("fp_a"))
    val bSide = bands.select(col("b"), col("v"),
      col("media_id").as("clip_b"), col("fp").as("fp_b"))
    a.join(bSide, Seq("b", "v"))
      .filter(col("clip_a") < col("clip_b"))
      .select(col("clip_a"), col("clip_b"), col("fp_a"), col("fp_b")).distinct()
      .withColumn("hamming",
        expr("bit_count(fp_a ^ fp_b)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("clip_a"), col("clip_b"), col("hamming"))
  }
}
