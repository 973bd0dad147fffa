package graft.mm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import scala.util.control.NonFatal

import org.apache.spark.sql.Dataset
import graft.core.Ids

/** Multimodal column plumbing for a training-data pipeline: media as
  * opaque `binary` columns + typed metadata, with decode / feature-extract
  * / resize / frame-sample as batched per-partition stages (the Scala
  * analog of `mapInPandas` batches).
  *
  * The IMAGE leg is real: the JDK's own `javax.imageio` decodes
  * PNG/JPEG/GIF/BMP with zero extra dependencies, so image rows get actual
  * width/height, exact per-channel pixel sums, and a 4×4-grid mean-luminance
  * embedding, and `resizeImages` re-encodes a genuinely resampled payload.
  * The AUDIO leg is real for RIFF/WAVE PCM: `javax.sound.sampled` (also
  * JDK-only) reads sample rate, channels, and the raw 16-bit samples, so
  * WAV rows get actual duration, an exact integer sum of absolute sample
  * values, and a windowed mean-amplitude embedding. Compressed audio
  * (MP3/OGG) and video codecs are NOT in the JDK, so those fall back to
  * the deterministic stub — swapping in a real codec changes only the
  * per-row body inside [[decodeBatch]]; the pipeline shape (batched
  * iterator in, rows out) stays identical.
  */
object Multimodal {

  /** A media row: opaque payload + typed envelope. */
  case class MediaRow(mediaId: Long, kind: String, bytes: Array[Byte], meta: Map[String, String])

  /** Decoded features. For `decoded = true` (images the JDK codec read)
    * width/height/channel sums/embedding come from real pixels; otherwise
    * they are the deterministic stub derivation.
    */
  case class MediaFeatures(
      mediaId: Long,
      kind: String,
      sizeBytes: Long,
      contentHash: String,
      width: Int,
      height: Int,
      durationMs: Long,
      sumR: Long, // exact per-channel pixel sums (0 when stubbed)
      sumG: Long,
      sumB: Long,
      sampleRate: Int, // audio: frames/sec (0 for images / stubbed rows)
      channels: Int, // audio: channel count (0 for images / stubbed rows)
      sumAbs: Long, // audio: exact sum of |16-bit sample| over all channels
      embedding: Seq[Double],
      decoded: Boolean)

  val BatchSize = 64 // batch shape of the vectorized-UDF analog
  val GridDim = 4 // embedding = GridDim × GridDim mean-luminance cells
  val EmbeddingDim: Int = GridDim * GridDim

  // ImageIO's default scratch cache is a temp FILE per decode — in-memory
  // payloads must stay in memory on a 1000-executor cluster
  ImageIO.setUseCache(false)

  /** Decode one image payload with the JDK codec. Returns None when the
    * bytes aren't a format `javax.imageio` can read (caller falls back to
    * the stub). `getRGB` converts any internal raster layout to packed
    * sRGB, so channel extraction is format-independent.
    */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Long, Long, Long, Seq[Double])] =
    try {
      Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        var sumR = 0L; var sumG = 0L; var sumB = 0L
        val cellLum = new Array[Double](EmbeddingDim)
        val cellN = new Array[Long](EmbeddingDim)
        var y = 0
        while (y < h) {
          val cy = y * GridDim / h
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            sumR += r; sumG += g; sumB += b
            val cell = cy * GridDim + x * GridDim / w
            cellLum(cell) += (r + g + b) / (3.0 * 255.0)
            cellN(cell) += 1
            x += 1
          }
          y += 1
        }
        val emb = (0 until EmbeddingDim).map(i => if (cellN(i) == 0) 0.0 else cellLum(i) / cellN(i))
        (w, h, sumR, sumG, sumB, emb)
      }
    } catch { case NonFatal(_) => None }

  /** Decode one WAV payload with the JDK's `javax.sound.sampled`. Handles
    * signed 16-bit PCM (either endianness, any channel count) — the format
    * `encodeWav` writes and the overwhelmingly common WAV layout. Returns
    * (sampleRate, channels, durationMs, sumAbs, embedding); None for
    * non-WAV bytes or other sample layouts (caller falls back to the stub).
    * PCM is lossless, so encode→decode round trips are bit-exact — the same
    * property that makes the image gate's closed-form oracle possible.
    */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Long, Long, Seq[Double])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
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
            var sumAbs = 0L
            val cellSum = new Array[Double](EmbeddingDim)
            val cellN = new Array[Long](EmbeddingDim)
            var f = 0
            while (f < nFrames) {
              val cell = (f.toLong * EmbeddingDim / nFrames).toInt
              var c = 0
              while (c < ch) {
                val off = f * frameBytes + c * 2
                val s =
                  if (big) ((data(off) << 8) | (data(off + 1) & 0xff)).toShort
                  else ((data(off + 1) << 8) | (data(off) & 0xff)).toShort
                sumAbs += math.abs(s.toLong)
                cellSum(cell) += math.abs(s / 32768.0)
                cellN(cell) += 1
                c += 1
              }
              f += 1
            }
            val rate = fmt.getSampleRate.toInt
            val emb = (0 until EmbeddingDim).map(i => if (cellN(i) == 0) 0.0 else cellSum(i) / cellN(i))
            Some((rate, ch, nFrames.toLong * 1000L / rate, sumAbs, emb))
          }
        }
      } finally in.close()
    } catch { case NonFatal(_) => None }

  /** Encode signed 16-bit mono PCM samples as a RIFF/WAVE payload
    * (little-endian — the canonical WAV layout; deterministic bytes).
    */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(data), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** STUB features: deterministic pseudo-decode from the payload bytes —
    * the fallback for kinds the JDK has no codec for (compressed audio,
    * video) and for undecodable image/WAV bytes.
    */
  private def stubFeatures(r: MediaRow): MediaFeatures = {
    val h = Ids.md5Hex(r.bytes.map("%02x".format(_)).mkString)
    val h31 = Ids.hash31(h)
    MediaFeatures(
      r.mediaId, r.kind, r.bytes.length.toLong, h,
      width = (h31 % 1920).toInt + 1,
      height = (h31 % 1080).toInt + 1,
      durationMs = if (r.kind == "image") 0L else h31 % 600000L,
      sumR = 0L, sumG = 0L, sumB = 0L,
      sampleRate = 0, channels = 0, sumAbs = 0L,
      embedding = (0 until EmbeddingDim).map(d =>
        ((Ids.hash31(s"$h:$d") % 2001L) - 1000L) / 1000.0),
      decoded = false)
  }

  /** Batched decode: real JDK codec for image rows, stub otherwise. The
    * `grouped(BatchSize)` seam is where a real audio/video codec (or a
    * batched embedding model) would amortize its per-batch init.
    */
  def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.grouped(BatchSize).flatMap { batch =>
      // per-batch init would happen HERE (codec/model handle)
      batch.map { r =>
        val stub = stubFeatures(r)
        r.kind match {
          case "image" => decodeImage(r.bytes) match {
            case Some((w, h, sr, sg, sb, emb)) =>
              stub.copy(width = w, height = h, durationMs = 0L,
                sumR = sr, sumG = sg, sumB = sb, embedding = emb, decoded = true)
            case None => stub
          }
          case "audio" => decodeWav(r.bytes) match {
            case Some((rate, ch, durMs, sumAbs, emb)) =>
              stub.copy(width = 0, height = 0, durationMs = durMs,
                sampleRate = rate, channels = ch, sumAbs = sumAbs,
                embedding = emb, decoded = true)
            case None => stub
          }
          case _ => stub
        }
      }
    }

  /** Feature extraction over a media table: repartition for parallel decode
    * (codec work is CPU-bound — spread it), then batched per-partition
    * decode.
    */
  def extractFeatures(media: Dataset[MediaRow], partitions: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.repartition(partitions).mapPartitions(decodeBatch)
  }

  /** Encode a raster to PNG bytes (lossless — decode(encode(img)) returns
    * identical pixels, which is what makes closed-form oracles possible).
    */
  def encodePng(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real image resize: deterministic nearest-neighbor resample (a hand
    * raster walk, not the AWT rendering pipeline, so the output bytes are
    * platform-independent), re-encoded as PNG. Non-image rows and
    * undecodable payloads pass through untouched except for the meta tag —
    * same contract the stub had.
    */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val tagged = r.copy(meta = r.meta + ("resized" -> s"${w}x$h"))
      if (r.kind != "image") tagged
      else
        (try Option(ImageIO.read(new ByteArrayInputStream(r.bytes)))
         catch { case NonFatal(_) => None }) match {
          case Some(src) =>
            val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              val sy = y * src.getHeight / h
              var x = 0
              while (x < w) {
                dst.setRGB(x, y, src.getRGB(x * src.getWidth / w, sy))
                x += 1
              }
              y += 1
            }
            tagged.copy(bytes = encodePng(dst))
          case _ => tagged
        }
    }
  }

  /** A parsed YUV4MPEG2 clip: only the luma (Y) planes are retained —
    * chroma is skipped during parse, which is all frame-sampling needs.
    */
  case class Y4mVideo(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                      frames: IndexedSeq[Array[Byte]])

  /** Encode luma planes as an uncompressed YUV4MPEG2 (Y4M) clip with C444
    * chroma fixed at the neutral value 128 (grayscale). Y4M is a plain
    * byte-oriented container — header line, then `FRAME\n` + raw planes per
    * frame — so encode→decode round trips are bit-exact, the same property
    * the PNG/WAV gates rely on for closed-form oracles.
    */
  def encodeY4m(w: Int, h: Int, fps: Int, yPlanes: Seq[Array[Byte]]): Array[Byte] = {
    require(yPlanes.forall(_.length == w * h), s"each Y plane must be $w*$h bytes")
    val out = new ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F$fps:1 Ip A1:1 C444\n".getBytes("US-ASCII"))
    val chroma = Array.fill[Byte](w * h)(128.toByte)
    yPlanes.foreach { y =>
      out.write("FRAME\n".getBytes("US-ASCII"))
      out.write(y); out.write(chroma); out.write(chroma)
    }
    out.toByteArray
  }

  /** Parse a YUV4MPEG2 payload (C444 / C422 / C420 family / Cmono) with
    * pure byte walking — Y4M is uncompressed, so "decoding" is container
    * parsing, no codec required. Returns None for anything that is not a
    * well-formed Y4M stream (caller falls back to the stub fan-out).
    */
  def decodeY4m(bytes: Array[Byte]): Option[Y4mVideo] =
    try {
      val nl = bytes.indexOf('\n'.toByte)
      if (nl <= 0) None
      else {
        val tokens = new String(bytes, 0, nl, "US-ASCII").split(' ')
        if (tokens.head != "YUV4MPEG2") None
        else {
          var w = -1; var h = -1; var fn = 25; var fd = 1; var cs = "420"
          tokens.tail.foreach { t =>
            if (t.nonEmpty) t.charAt(0) match {
              case 'W' => w = t.substring(1).toInt
              case 'H' => h = t.substring(1).toInt
              case 'F' =>
                val p = t.substring(1).split(':')
                fn = p(0).toInt; fd = if (p.length > 1) p(1).toInt else 1
              case 'C' => cs = t.substring(1)
              case _ => () // Ip/A/X params — irrelevant to plane layout
            }
          }
          val chromaSize =
            if (cs == "mono") 0
            else if (cs.startsWith("444")) w * h
            else if (cs.startsWith("422")) (w / 2) * h
            else if (cs.startsWith("420") || cs.startsWith("411")) (w / 2) * (h / 2)
            else -1
          if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0 || chromaSize < 0) None
          else {
            val frames = IndexedSeq.newBuilder[Array[Byte]]
            var pos = nl + 1
            var ok = true
            while (ok && pos < bytes.length) {
              // each frame starts with a "FRAME[ params]\n" marker line
              var eol = pos
              while (eol < bytes.length && bytes(eol) != '\n') eol += 1
              val marker = new String(bytes, pos, eol - pos, "US-ASCII")
              val end = eol + 1 + w * h + 2 * chromaSize
              if (!marker.startsWith("FRAME") || end > bytes.length) ok = false
              else {
                frames += java.util.Arrays.copyOfRange(bytes, eol + 1, eol + 1 + w * h)
                pos = end
              }
            }
            val fs = frames.result()
            if (ok && fs.nonEmpty) Some(Y4mVideo(w, h, fn, fd, fs)) else None
          }
        }
      }
    } catch { case NonFatal(_) => None }

  /** Frame sampling for video rows: `n` evenly spaced frames per clip
    * (index `floor(j * nFrames / n)`), each emitted as a grayscale PNG
    * image row that flows into the real image leg ([[decodeBatch]]). The
    * VIDEO decode is real for Y4M payloads (uncompressed container — pure
    * byte parsing, zero deps); compressed codecs are not in the JDK, so
    * undecodable payloads keep the stub fan-out shape (pseudo-frame rows
    * carrying the parent bytes, which the image decoder then rejects).
    */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      if (r.kind != "video") Seq(r)
      else decodeY4m(r.bytes) match {
        case Some(v) =>
          (0 until n).map { j =>
            val fi = (j.toLong * v.frames.length / n).toInt
            val plane = v.frames(fi)
            val img = new BufferedImage(v.width, v.height, BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < v.height) {
              var x = 0
              while (x < v.width) {
                val lum = plane(y * v.width + x) & 0xff
                img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
                x += 1
              }
              y += 1
            }
            r.copy(mediaId = r.mediaId * 1000 + j, kind = "image",
              bytes = encodePng(img),
              meta = r.meta ++ Seq("frame" -> j.toString, "frameIdx" -> fi.toString,
                "parent" -> r.mediaId.toString, "src" -> "y4m"))
          }
        case None =>
          (0 until n).map(i => r.copy(
            mediaId = r.mediaId * 1000 + i,
            kind = "image",
            meta = r.meta ++ Seq("frame" -> i.toString, "parent" -> r.mediaId.toString)))
      }
    }
  }
}
