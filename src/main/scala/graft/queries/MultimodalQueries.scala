package graft.queries

import java.awt.image.BufferedImage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.mm.Multimodal
import graft.mm.Multimodal.MediaRow

/** Multimodal decode gate. q51 generates deterministic synthetic PNGs in
  * the executors (solid fills and horizontal gradients with closed-form
  * pixel statistics), runs them through the REAL `javax.imageio` decode in
  * [[Multimodal.extractFeatures]], and reports exact integer per-channel
  * pixel sums. The DuckDB oracle recomputes those sums from the generation
  * formula alone — the two can only agree if the PNG encode→decode round
  * trip read the actual pixels (the gate filters on `decoded`, so a codec
  * fallback to the stub drops rows and fails the row-count compare).
  */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  val NumImages = 64

  /** Deterministic test raster i: solid (even i) or horizontal gradient
    * (odd i), dimensions 8..31 so every 4×4 embedding cell is populated.
    */
  def syntheticImage(i: Long): MediaRow = {
    val w = 8 + (i % 24).toInt
    val h = 8 + ((i * 3) % 24).toInt
    val cr = ((i * 5) % 256).toInt
    val cg = ((i * 11) % 256).toInt
    val cb = ((i * 17) % 256).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = if (i % 2 == 0) cr else x * 255 / (w - 1)
        val g = if (i % 2 == 0) cg else 255 - x * 255 / (w - 1)
        img.setRGB(x, y, (r << 16) | (g << 8) | cb)
        x += 1
      }
      y += 1
    }
    MediaRow(i, "image", Multimodal.encodePng(img), Map("gen" -> "synthetic"))
  }

  val NumClips = 64

  /** Deterministic test clip i: 16-bit mono PCM at 8 kHz, 800..2400 samples
    * of the integer sawtooth `((t * (i+1)) mod 2048) - 1024` — every sample
    * value (and so the absolute-amplitude sum) is closed-form replayable.
    */
  def syntheticWav(i: Long): MediaRow = {
    val n = 800 + (i % 5).toInt * 400
    val samples = Array.tabulate[Short](n)(t => (((t.toLong * (i + 1)) % 2048L) - 1024L).toShort)
    MediaRow(i, "audio", Multimodal.encodeWav(samples, 8000), Map("gen" -> "synthetic"))
  }

  val NumVideos = 16
  val FramesSampled = 4

  /** Deterministic test clip v: `6 + (v % 5)` frames of w×h luma where
    * pixel (x, y) of frame f is `(v*31 + f*17 + x*3 + y*5) mod 256` —
    * closed-form replayable per sampled frame.
    */
  def syntheticY4m(v: Long): MediaRow = {
    val w = 12 + (v % 16).toInt
    val h = 8 + ((v * 3) % 16).toInt
    val nf = 6 + (v % 5).toInt
    val frames = (0 until nf).map { f =>
      Array.tabulate[Byte](w * h) { p =>
        val x = p % w; val y = p / w
        ((v * 31 + f * 17 + x * 3 + y * 5) % 256).toByte
      }
    }
    MediaRow(v, "video", Multimodal.encodeY4m(w, h, 25, frames), Map("gen" -> "synthetic"))
  }

  def defs: Map[String, Q] = Map(
    // END-TO-END multimodal ingestion: WebDataset tar shards carrying
    // real PNGs + captions -> tar parse -> sample grouping -> REAL
    // ImageIO decode -> per-sample channel sums. Composes q63's container
    // layer with q51's codec layer; the oracle is q51's closed form keyed
    // through the shard layout (image i = shard*8 + sample).
    "q64_wds_decode" -> ((s, _) => {
      import s.implicits._
      import graft.ingest.TarWebDataset
      val shards = s.range(NumImages / 8).map { sh =>
        val entries = (0 until 8).flatMap { k =>
          val img = syntheticImage(sh * 8 + k)
          Seq(
            TarWebDataset.TarEntry(f"$k%04d.png", img.bytes),
            TarWebDataset.TarEntry(f"$k%04d.txt",
              s"caption ${sh * 8 + k}".getBytes("UTF-8")))
        }
        (sh, TarWebDataset.encodeTar(entries))
      }
      val media = shards.flatMap { case (sh, tar) =>
        TarWebDataset.groupSamples(TarWebDataset.parseTar(tar)).map { sample =>
          Multimodal.MediaRow(sh * 8 + sample.key.toLong, "image",
            sample.parts("png"), Map("caption" -> new String(sample.parts("txt"), "UTF-8")))
        }
      }
      Multimodal.extractFeatures(media, 8).toDF()
        .filter(col("decoded"))
        .select(
          col("mediaId").cast("long").as("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("sumR").as("sum_r"),
          col("sumG").as("sum_g"),
          col("sumB").as("sum_b"))
        .orderBy(col("media_id"))
    }),

    // Real Y4M container parse + frame sampling + real ImageIO decode of
    // the sampled frames: each video yields FramesSampled grayscale PNGs
    // whose luma sum the oracle recomputes from the generator formula (and
    // the frame-index formula floor(j*nf/4)). Agreement requires BOTH
    // decodes to have read actual bytes; `decoded` filters out any stub
    // fallback, failing the row-count compare.
    "q54_video_frames" -> ((s, _) => {
      import s.implicits._
      val media = s.range(NumVideos).map(v => syntheticY4m(v.longValue))
      val frames = Multimodal.sampleFrames(media, FramesSampled)
      Multimodal.extractFeatures(frames, 8).toDF()
        .filter(col("decoded"))
        .select(
          floor(col("mediaId") / 1000).cast("long").as("video_id"),
          (col("mediaId") % 1000).cast("long").as("frame_j"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("sumR").as("sum_y"))
        .orderBy(col("video_id"), col("frame_j"))
    }),

    // Real JDK javax.sound.sampled decode over generated WAVs; exact
    // absolute-sample sums. Same gate design as q51: the oracle replays the
    // generator formula, so agreement requires the WAV encode→decode round
    // trip to have read the actual PCM samples (filter on `decoded` makes a
    // stub fallback drop rows and fail the row-count compare).
    "q52_audio_decode" -> ((s, _) => {
      import s.implicits._
      val media = s.range(NumClips).map(i => syntheticWav(i.longValue))
      Multimodal.extractFeatures(media, 8).toDF()
        .filter(col("decoded"))
        .select(
          col("mediaId").cast("long").as("media_id"),
          col("sampleRate").cast("long").as("sample_rate"),
          col("channels").cast("long").as("channels"),
          col("durationMs").as("duration_ms"),
          col("sumAbs").as("sum_abs"))
        .orderBy(col("media_id"))
    }),

    // Real JDK-ImageIO decode over generated PNGs; exact channel sums.
    "q51_image_decode" -> ((s, _) => {
      import s.implicits._
      val media = s.range(NumImages).map(i => syntheticImage(i.longValue))
      Multimodal.extractFeatures(media, 8).toDF()
        .filter(col("decoded")) // stub fallback must NOT count as decoded
        .select(
          col("mediaId").cast("long").as("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("sumR").as("sum_r"),
          col("sumG").as("sum_g"),
          col("sumB").as("sum_b"))
        .orderBy(col("media_id"))
    }),

    // Perceptual-dup clustering over REAL decoded rasters: three visual
    // families (solid / descending gradient / parity stripes) whose
    // 56-bit dHash is closed-form from the generator (solids → 0,
    // gradients → all-ones, stripes → the sampled-parity bit pattern as
    // a function of width alone). The oracle re-derives every hash from
    // the formula — agreement proves the PNG decode + integer grid
    // sampling read actual pixels.
    "q181_image_phash" -> ((s, _) => {
      import s.implicits._
      val media = s.range(NumImages).map(i => syntheticPhashImage(i.longValue))
      graft.mm.PerceptualHash.imageClusters(media)
        .orderBy(col("hash"))
    }),

    // Perceptual AUDIO near-dup (r12 depth wave): energy-envelope
    // fingerprints over the REAL WAV decode, 4-band Hamming candidate
    // join — never clip×clip. The oracle recomputes every fingerprint
    // closed-form from the generator AND brute-forces all pairs, so a
    // hash-match proves both the decode→energy→bits pipeline and the
    // band split's no-false-negative guarantee (pigeonhole: ≤3 differing
    // bits across 4 bands leaves one band intact) on real data.
    "q305_audio_fingerprint" -> ((s, _) => {
      import s.implicits._
      val media = s.range(NumClips).map(i => syntheticFpWav(i.longValue))
      graft.mm.AudioFingerprint.nearDupPairs(media, 3)
        .orderBy(col("clip_a"), col("clip_b"))
    }),

    // Shot-boundary detection (r12 depth wave): integer SAD cut detector
    // over the REAL Y4M decode. Clips carry 4-frame shots (the luma
    // formula jumps by 97 at shot starts, drifts by 3 within) — the
    // oracle replays every per-pixel wraparound delta closed-form, so a
    // hash-match proves the container parse handed the detector the
    // exact planes.
    "q307_shot_boundaries" -> ((s, _) => {
      import s.implicits._
      val media = s.range(NumShotClips).map(v => syntheticShotY4m(v.longValue))
      graft.mm.ShotBoundary.boundaries(media, 50)
        .orderBy(col("media_id"), col("frame"))
    })
  )

  val NumShotClips = 16

  /** Deterministic shot-structured clip for q307: `6 + (v mod 5)` frames
    * of w×h luma, pixel (x, y) of frame f =
    * (v·31 + ⌊f/4⌋·97 + f·3 + x·3 + y·5) mod 256 — shots of 4 frames;
    * within a shot consecutive frames differ by 3 per pixel (mod wrap),
    * across a boundary by 100 (mod wrap), so threshold 50 separates them
    * exactly.
    */
  def syntheticShotY4m(v: Long): MediaRow = {
    val w = 12 + (v % 16).toInt
    val h = 8 + ((v * 3) % 16).toInt
    val nf = 6 + (v % 5).toInt
    val frames = (0 until nf).map { f =>
      Array.tabulate[Byte](w * h) { p =>
        val x = p % w; val y = p / w
        ((v * 31 + (f / 4) * 97 + f * 3 + x * 3 + y * 5) % 256).toByte
      }
    }
    MediaRow(v, "video", Multimodal.encodeY4m(w, h, 25, frames), Map("gen" -> "shot"))
  }

  /** Deterministic modulated clip for q305: sample(t) =
    * (((t·(i+1)) mod 512) − 256) · (1 + ((⌊t·32/n⌋·(i mod 7 + 3)) mod 5)),
    * n = 800 + (i mod 5)·400 — an integer sawtooth under a 5-step
    * per-frame gain envelope. Per-frame abs sums are closed-form
    * integers, and clips sharing (i mod 5, i mod 7) — e.g. i and i+35 —
    * share the exact envelope STEP pattern, so their fingerprints
    * coincide: guaranteed near-dup mass for the banded join to find.
    */
  def syntheticFpWav(i: Long): MediaRow = {
    val n = 800 + (i % 5).toInt * 400
    val samples = Array.tabulate[Short](n) { t =>
      val base = ((t.toLong * (i + 1)) % 512L) - 256L
      val scale = 1L + ((t.toLong * 32L / n) * (i % 7L + 3L)) % 5L
      (base * scale).toShort
    }
    MediaRow(i, "audio", Multimodal.encodeWav(samples, 8000), Map("gen" -> "fp"))
  }

  /** Deterministic raster for the q181 perceptual-hash gate, family
    * i mod 3: solid color (dHash 0), descending gray gradient (all 56
    * bits), or x-parity stripes (bits = sampled-column parity pattern,
    * a pure function of width).
    */
  def syntheticPhashImage(i: Long): MediaRow = {
    val w = 8 + (i % 24).toInt
    val h = 8 + ((i * 3) % 24).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = (i % 3) match {
          case 0 =>
            (((i * 5) % 256).toInt << 16) | (((i * 11) % 256).toInt << 8) |
              ((i * 17) % 256).toInt
          case 1 =>
            val s = 255 - x * 255 / (w - 1)
            (s << 16) | (s << 8) | s
          case _ =>
            val s = if (x % 2 == 0) 255 else 0
            (s << 16) | (s << 8) | s
        }
        img.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    MediaRow(i, "image", Multimodal.encodePng(img), Map("gen" -> "phash"))
  }

  def oracles: Map[String, String] = Map(
    // q305: per-frame integer abs-energy sums replayed from the generator
    // formula (frame f = (t*32)//n, the decode's cell mapping), bits from
    // adjacent-frame comparisons, then BRUTE-FORCE all 2016 pairs — the
    // Spark side only ever joins banded candidates, so a hash-match
    // proves completeness.
    "q305_audio_fingerprint" ->
      s"""WITH clips AS (
         |  SELECT i, 800 + (i % 5) * 400 AS n
         |  FROM generate_series(0, ${NumClips - 1}) AS t(i)
         |), samp AS (
         |  SELECT i, n, unnest(generate_series(0, n - 1)) AS t FROM clips
         |), en AS (
         |  SELECT i, (t * 32) // n AS f,
         |         sum(abs((((t * (i + 1)) % 512) - 256)
         |             * (1 + (((t * 32) // n) * (i % 7 + 3)) % 5))) AS e
         |  FROM samp GROUP BY i, (t * 32) // n
         |), fp AS (
         |  SELECT e1.i,
         |         sum(CASE WHEN e2.e > e1.e THEN 1::BIGINT << e1.f ELSE 0 END) AS fp
         |  FROM en e1 JOIN en e2 ON e1.i = e2.i AND e2.f = e1.f + 1
         |  GROUP BY e1.i
         |)
         |SELECT CAST(a.i AS BIGINT) AS clip_a, CAST(b.i AS BIGINT) AS clip_b,
         |       CAST(bit_count(xor(a.fp::BIGINT, b.fp::BIGINT)) AS BIGINT) AS hamming
         |FROM fp a JOIN fp b ON a.i < b.i
         |WHERE bit_count(xor(a.fp::BIGINT, b.fp::BIGINT)) <= 3
         |ORDER BY clip_a, clip_b""".stripMargin,

    // q307: per-pixel wraparound deltas replayed from the luma formula;
    // the threshold is the integer cross-multiply the Spark side uses.
    "q307_shot_boundaries" ->
      s"""WITH clips AS (
         |  SELECT v, 12 + (v % 16) AS w, 8 + ((v * 3) % 16) AS h, 6 + (v % 5) AS nf
         |  FROM generate_series(0, ${NumShotClips - 1}) t(v)
         |), fr AS (
         |  SELECT v, w, h, unnest(generate_series(1, nf - 1)) AS f FROM clips
         |), px AS (
         |  SELECT v, f, w, h, unnest(generate_series(0, w * h - 1)) AS p FROM fr
         |), d AS (
         |  SELECT v, f, w * h AS npx,
         |    sum(abs(
         |      ((v * 31 + (f // 4) * 97 + f * 3 + (p % w) * 3 + (p // w) * 5) % 256)
         |      - ((v * 31 + ((f - 1) // 4) * 97 + (f - 1) * 3 + (p % w) * 3 + (p // w) * 5) % 256)
         |    )) AS diff_sum
         |  FROM px GROUP BY v, f, w * h
         |)
         |SELECT CAST(v AS BIGINT) AS media_id, CAST(f AS BIGINT) AS frame,
         |       CAST(diff_sum AS BIGINT) AS diff_sum, CAST(npx AS BIGINT) AS n_pixels
         |FROM d WHERE diff_sum >= 50 * npx
         |ORDER BY media_id, frame""".stripMargin,

    // every hash restated from the generator formula: solids are flat
    // (no gradient bits), gradients strictly descend at every sampled
    // column (all 8x7 bits), stripes depend only on the parity of the
    // nearest-neighbor sampled columns x*(w-1)//7. The row pattern
    // repeats identically across the 8 sample rows, so the 56-bit hash
    // is rowPattern * sum(128^y) = B * 567382630219905.
    "q181_image_phash" ->
      """WITH img AS (SELECT unnest(generate_series(0, 63)) AS i),
        |f AS (SELECT i, i % 3 AS fam, 8 + (i % 24) AS w FROM img),
        |sb AS (
        |  SELECT f.i,
        |         sum(CASE WHEN ((x * (w - 1)) // 7) % 2 = 0
        |                   AND (((x + 1) * (w - 1)) // 7) % 2 = 1
        |                  THEN 1 << x ELSE 0 END) AS b
        |  FROM f, (SELECT unnest(generate_series(0, 6)) AS x) xs
        |  WHERE fam = 2 GROUP BY f.i
        |), h AS (
        |  SELECT i, CASE WHEN fam = 0 THEN 0
        |                 WHEN fam = 1 THEN 72057594037927935
        |                 ELSE (SELECT b FROM sb WHERE sb.i = f.i) * 567382630219905
        |            END AS hash
        |  FROM f
        |)
        |SELECT CAST(hash AS BIGINT) AS hash,
        |       CAST(count(*) AS BIGINT) AS n_images,
        |       CAST(min(i) AS BIGINT) AS min_id
        |FROM h GROUP BY hash ORDER BY hash""".stripMargin,

    // q51's closed form: the tar/grouping layer must hand the codec the
    // exact PNG bytes for these sums to come out right.
    "q64_wds_decode" ->
      s"""WITH dims AS (
         |  SELECT i, 8 + (i % 24) AS w, 8 + ((i * 3) % 24) AS h,
         |         (i * 5) % 256 AS cr, (i * 11) % 256 AS cg, (i * 17) % 256 AS cb
         |  FROM generate_series(0, ${NumImages - 1}) t(i)
         |), ramp AS (
         |  SELECT i, w, h, cr, cg, cb,
         |         h * list_sum(list_transform(generate_series(0, w - 1),
         |                                     x -> (x * 255) // (w - 1))) AS grad_r
         |  FROM dims
         |)
         |SELECT CAST(i AS BIGINT) AS media_id,
         |       CAST(w AS BIGINT) AS width,
         |       CAST(h AS BIGINT) AS height,
         |       CAST(CASE WHEN i % 2 = 0 THEN w * h * cr ELSE grad_r END AS BIGINT) AS sum_r,
         |       CAST(CASE WHEN i % 2 = 0 THEN w * h * cg ELSE w * h * 255 - grad_r END AS BIGINT) AS sum_g,
         |       CAST(w * h * cb AS BIGINT) AS sum_b
         |FROM ramp ORDER BY media_id""".stripMargin,

    // Closed-form replay of the luma generator over each sampled frame:
    // frame index fi = (j*nf)//4, pixel (x,y) = (v*31+fi*17+3x+5y) mod 256.
    "q54_video_frames" ->
      s"""WITH vids AS (
         |  SELECT v, 12 + (v % 16) AS w, 8 + ((v * 3) % 16) AS h, 6 + (v % 5) AS nf
         |  FROM generate_series(0, ${NumVideos - 1}) t(v)
         |), fr AS (
         |  SELECT vids.*, j, (j * nf) // ${FramesSampled} AS fi
         |  FROM vids, generate_series(0, ${FramesSampled - 1}) s(j)
         |), px AS (
         |  SELECT fr.v, fr.j, fr.w, fr.h,
         |         sum((fr.v * 31 + fr.fi * 17 + xs.x * 3 + ys.y * 5) % 256) AS sum_y
         |  FROM fr, generate_series(0, 26) xs(x), generate_series(0, 22) ys(y)
         |  WHERE xs.x < fr.w AND ys.y < fr.h
         |  GROUP BY fr.v, fr.j, fr.w, fr.h
         |)
         |SELECT CAST(v AS BIGINT) AS video_id, CAST(j AS BIGINT) AS frame_j,
         |       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
         |       CAST(sum_y AS BIGINT) AS sum_y
         |FROM px ORDER BY video_id, frame_j""".stripMargin,

    // Closed-form replay of the sawtooth generator: sum of
    // |((t*(i+1)) mod 2048) - 1024| over the clip's samples; duration is
    // integer frames*1000/rate exactly as the decoder computes it.
    "q52_audio_decode" ->
      s"""WITH clips AS (
         |  SELECT i, 800 + (i % 5) * 400 AS n
         |  FROM generate_series(0, ${NumClips - 1}) AS t(i)
         |)
         |SELECT CAST(i AS BIGINT) AS media_id,
         |       CAST(8000 AS BIGINT) AS sample_rate,
         |       CAST(1 AS BIGINT) AS channels,
         |       CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
         |       CAST(list_sum(list_transform(generate_series(0, n - 1),
         |                t -> abs(((t * (i + 1)) % 2048) - 1024))) AS BIGINT) AS sum_abs
         |FROM clips ORDER BY media_id""".stripMargin,
    // Closed-form replay of the generator: solid images sum to w*h*channel;
    // the gradient row sums its per-x integer ramp once and scales by h.
    "q51_image_decode" ->
      s"""WITH dims AS (
         |  SELECT i, 8 + (i % 24) AS w, 8 + ((i * 3) % 24) AS h,
         |         (i * 5) % 256 AS cr, (i * 11) % 256 AS cg, (i * 17) % 256 AS cb
         |  FROM generate_series(0, ${NumImages - 1}) AS t(i)
         |), ramp AS (
         |  SELECT i, w, h, cr, cg, cb,
         |         h * list_sum(list_transform(generate_series(0, w - 1),
         |                                     x -> (x * 255) // (w - 1))) AS grad_r
         |  FROM dims
         |)
         |SELECT CAST(i AS BIGINT) AS media_id,
         |       CAST(w AS BIGINT) AS width,
         |       CAST(h AS BIGINT) AS height,
         |       CAST(CASE WHEN i % 2 = 0 THEN w * h * cr ELSE grad_r END AS BIGINT) AS sum_r,
         |       CAST(CASE WHEN i % 2 = 0 THEN w * h * cg ELSE w * h * 255 - grad_r END AS BIGINT) AS sum_g,
         |       CAST(w * h * cb AS BIGINT) AS sum_b
         |FROM ramp ORDER BY media_id""".stripMargin
  )
}
