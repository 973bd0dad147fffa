package graft.mm

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.mm.Multimodal.MediaRow

/** Perceptual difference-hash (dHash, Krawetz's published gradient-hash
  * method) for image near-dup detection: sample a fixed grid of luma
  * values, emit one bit per horizontal neighbor comparison. Re-encodes,
  * resizes, and palette shifts that preserve the luminance GRADIENT
  * structure map to the same hash; visually different images differ in
  * many bits.
  *
  * This variant samples an 8×8 nearest-neighbor grid (integer index
  * arithmetic only — no resample filter, so the hash is closed-form
  * replayable from a generator formula, the q51 oracle property) and
  * emits 8 rows × 7 comparisons = a 56-bit hash, kept under 2⁶³ so both
  * engines hold it in a plain signed 64-bit integer.
  *
  * Scale: the decode+hash is a per-row map (mapPartitions batch); the
  * cluster step is an exact groupBy on the hash — near-dup banding at
  * Hamming distance ≤ d uses the same 4-band trick as SimHash (split the
  * 56 bits into d+1 bands; equal in at least one band → candidate).
  */
object PerceptualHash {

  /** Luma at integer grid point via BT.601 integer weights (exact). */
  private def luma(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xff
    val g = (rgb >> 8) & 0xff
    val b = rgb & 0xff
    (299 * r + 587 * g + 114 * b) / 1000
  }

  /** 56-bit difference hash over the 8×8 nearest-neighbor sample grid.
    * Bit (y·7 + x) is set iff luma(xᵢ) > luma(xᵢ₊₁) at sampled columns
    * xᵢ = x·(w−1)/7 (integer division), rows yᵢ = y·(h−1)/7.
    */
  def dHash56(img: BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val g = Array.ofDim[Int](8, 8)
    var y = 0
    while (y < 8) {
      val yi = if (h == 1) 0 else y * (h - 1) / 7
      var x = 0
      while (x < 8) {
        val xi = if (w == 1) 0 else x * (w - 1) / 7
        g(y)(x) = luma(img.getRGB(xi, yi))
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var bit = 0
    y = 0
    while (y < 8) {
      var x = 0
      while (x < 7) {
        if (g(y)(x) > g(y)(x + 1)) hash |= 1L << bit
        bit += 1
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Decode bytes to a raster with the real JDK codec (None: not an
    * image `javax.imageio` can read).
    */
  def readImage(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Per-image hashes: (media_id, hash). Undecodable payloads drop out —
    * downstream row counts surface codec regressions (the q51 property).
    */
  def hashes(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap(r =>
        readImage(r.bytes).map(img => (r.mediaId, dHash56(img)))))
      .toDF("media_id", "hash")
  }

  /** Exact perceptual-dup clusters: one row per distinct hash. */
  def imageClusters(media: Dataset[MediaRow]): DataFrame =
    hashes(media)
      .groupBy(col("hash"))
      .agg(count(lit(1)).as("n_images"), min(col("media_id")).as("min_id"))
}
