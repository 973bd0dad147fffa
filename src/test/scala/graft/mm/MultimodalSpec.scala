package graft.mm

import java.awt.image.BufferedImage

import graft.SparkSpec
import graft.mm.Multimodal.MediaRow
import graft.queries.MultimodalQueries

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** 3×2 PNG with known pixels: rows of (red, green, blue) / (white, black, gray). */
  private def knownPng: Array[Byte] = {
    val img = new BufferedImage(3, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00); img.setRGB(2, 0, 0x0000ff)
    img.setRGB(0, 1, 0xffffff); img.setRGB(1, 1, 0x000000); img.setRGB(2, 1, 0x808080)
    Multimodal.encodePng(img)
  }

  private def media = Seq(
    MediaRow(1L, "image", knownPng, Map("src" -> "cam0")),
    MediaRow(2L, "video", Array[Byte](9, 9, 9), Map("src" -> "cam1")),
    MediaRow(3L, "audio", Array[Byte](5), Map.empty[String, String]),
    MediaRow(4L, "image", Array[Byte](1, 2, 3), Map.empty[String, String]) // not an image
  ).toDS

  test("real decode: actual dimensions and exact channel sums from a known PNG") {
    val f = Multimodal.extractFeatures(media, 2).collect().sortBy(_.mediaId)
    val img = f.find(_.mediaId == 1L).get
    assert(img.decoded)
    assert(img.width == 3 && img.height == 2)
    // sums over the six known pixels
    assert(img.sumR == 255L + 255 + 0x80)
    assert(img.sumG == 255L + 255 + 0x80)
    assert(img.sumB == 255L + 255 + 0x80)
    assert(img.durationMs == 0L)
    assert(img.embedding.length == Multimodal.EmbeddingDim)
    // 3×2 < 4×4 grid: populated cells carry real luminance in [0,1], the
    // pixel-less cells are exactly 0
    assert(img.embedding.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("decode fallback: non-image kinds and undecodable image bytes take the stub") {
    val f = Multimodal.extractFeatures(media, 2).collect().sortBy(_.mediaId)
    val (video, audio, bogus) = (f(1), f(2), f(3))
    assert(!video.decoded && !audio.decoded && !bogus.decoded)
    assert(Seq(video, audio, bogus).forall(m => m.sumR == 0L && m.sumG == 0L && m.sumB == 0L))
    assert(video.durationMs > 0L) // stubbed duration for time-based media
    // determinism across partitionings
    val f2 = Multimodal.extractFeatures(media, 3).collect().sortBy(_.mediaId)
    assert(f.map(_.contentHash).toSeq == f2.map(_.contentHash).toSeq)
  }

  test("resizeImages: real nearest-neighbor resample, re-decodable payload") {
    val out = Multimodal.resizeImages(media, 6, 4).collect().sortBy(_.mediaId)
    assert(out.forall(_.meta.get("resized").contains("6x4")))
    val resized = out.find(_.mediaId == 1L).get
    val dec = Multimodal.decodeImage(resized.bytes).get
    assert(dec._1 == 6 && dec._2 == 4)
    // nearest-neighbor doubling of a 3×2 source duplicates each pixel 2×2:
    // channel sums scale exactly by 4
    assert(dec._3 == (255L + 255 + 0x80) * 4)
    // non-image payloads pass through untouched
    assert(out.find(_.mediaId == 2L).get.bytes.toSeq == Seq[Byte](9, 9, 9))
  }

  test("synthetic gate images: decode matches the closed-form generator") {
    // mirrors q51's oracle arithmetic for one solid and one gradient image
    val solid = MultimodalQueries.syntheticImage(2L) // w=10, h=14, solid
    val s = Multimodal.decodeImage(solid.bytes).get
    assert(s._1 == 10 && s._2 == 14)
    assert(s._3 == 10L * 14 * ((2 * 5) % 256))
    assert(s._4 == 10L * 14 * ((2 * 11) % 256))
    assert(s._5 == 10L * 14 * ((2 * 17) % 256))
    val grad = MultimodalQueries.syntheticImage(3L) // w=11, h=17, gradient
    val g = Multimodal.decodeImage(grad.bytes).get
    val rampSum = (0 until 11).map(x => x * 255 / 10).sum.toLong * 17
    assert(g._3 == rampSum)
    assert(g._4 == 11L * 17 * 255 - rampSum)
  }

  test("real WAV decode: rate, channels, duration, exact |sample| sum round-trip") {
    val samples = Array.tabulate[Short](1600)(t => (((t * 7) % 2048) - 1024).toShort)
    val wav = Multimodal.encodeWav(samples, 8000)
    val (rate, ch, durMs, sumAbs, emb) = Multimodal.decodeWav(wav).get
    assert(rate == 8000 && ch == 1)
    assert(durMs == 200L) // 1600 frames at 8 kHz
    assert(sumAbs == samples.map(s => math.abs(s.toLong)).sum)
    assert(emb.length == Multimodal.EmbeddingDim)
    assert(emb.forall(v => v >= 0.0 && v <= 1.0))
    // through the batched pipeline: audio rows now decode for real
    val rows = Seq(MediaRow(9L, "audio", wav, Map.empty[String, String])).toDS
    val f = Multimodal.extractFeatures(rows, 1).collect().head
    assert(f.decoded && f.sampleRate == 8000 && f.channels == 1 && f.sumAbs == sumAbs)
    assert(f.width == 0 && f.height == 0) // no raster fields on audio
  }

  test("synthetic gate clips: decode matches the closed-form generator") {
    val clip = MultimodalQueries.syntheticWav(3L) // n = 2000, factor i+1 = 4
    val (rate, ch, durMs, sumAbs, _) = Multimodal.decodeWav(clip.bytes).get
    assert(rate == 8000 && ch == 1)
    assert(durMs == 2000L * 1000 / 8000)
    val expect = (0 until 2000).map(t => math.abs(((t.toLong * 4) % 2048) - 1024)).sum
    assert(sumAbs == expect)
  }

  test("frame sampling fans out video rows only (stub fallback for non-Y4M)") {
    val out = Multimodal.sampleFrames(media, 4).collect()
    assert(out.length == 3 + 4) // image + audio + bogus pass through, video -> 4 frames
    val frames = out.filter(_.meta.contains("frame"))
    assert(frames.length == 4)
    assert(frames.forall(_.kind == "image"))
    assert(frames.forall(_.meta("parent") == "2"))
    assert(frames.forall(!_.meta.contains("src") || frames.head.meta("src") == "cam1"))
  }

  test("Y4M encode -> decode round trip is bit-exact on the luma planes") {
    val planes = (0 until 5).map(f => Array.tabulate[Byte](12 * 8)(p => (f * 40 + p).toByte))
    val clip = Multimodal.encodeY4m(12, 8, 25, planes)
    val v = Multimodal.decodeY4m(clip).get
    assert(v.width == 12 && v.height == 8 && v.fpsNum == 25 && v.fpsDen == 1)
    assert(v.frames.length == 5)
    (0 until 5).foreach(f => assert(v.frames(f).toSeq == planes(f).toSeq))
    // malformed payloads are rejected, not mis-parsed
    assert(Multimodal.decodeY4m("not a video".getBytes).isEmpty)
    assert(Multimodal.decodeY4m(clip.take(clip.length - 3)).isEmpty) // truncated frame
  }

  test("Y4M decode handles C420 and mono chroma layouts") {
    // hand-built C420: 4x2 luma + two 2x1 chroma planes per frame
    val y = Array.tabulate[Byte](8)(i => (i * 10).toByte)
    val c420 = "YUV4MPEG2 W4 H2 F30:1 C420jpeg\nFRAME\n".getBytes("US-ASCII") ++
      y ++ Array[Byte](1, 2) ++ Array[Byte](3, 4)
    val v = Multimodal.decodeY4m(c420).get
    assert(v.width == 4 && v.height == 2 && v.fpsNum == 30 && v.frames.length == 1)
    assert(v.frames.head.toSeq == y.toSeq)
    val mono = "YUV4MPEG2 W4 H2 F1:1 Cmono\nFRAME\nFRAME\n".getBytes("US-ASCII")
    // mono: zero chroma bytes; two frames of 8 luma bytes required — absent => reject
    assert(Multimodal.decodeY4m(mono).isEmpty)
  }

  test("real frame sampling: sampled Y4M frames decode as PNGs with exact luma sums") {
    val clip = MultimodalQueries.syntheticY4m(5L) // w=17, h=23, nf=6
    val ds = Seq(clip).toDS
    val frames = Multimodal.sampleFrames(ds, 4).collect().sortBy(_.mediaId)
    assert(frames.length == 4)
    assert(frames.forall(f => f.kind == "image" && f.meta("src") == "y4m"))
    // frame indices are floor(j * 6 / 4) = 0, 1, 3, 4
    assert(frames.map(_.meta("frameIdx")).toSeq == Seq("0", "1", "3", "4"))
    // each sampled frame is a REAL PNG whose channel sums equal the
    // generator's luma sum for that frame (grayscale => r = g = b = Y)
    frames.foreach { fr =>
      val fi = fr.meta("frameIdx").toInt
      val (w, h, sr, sg, sb, _) = Multimodal.decodeImage(fr.bytes).get
      assert(w == 17 && h == 23)
      val expect = (for { y <- 0 until 23; x <- 0 until 17 }
        yield (5L * 31 + fi * 17 + x * 3 + y * 5) % 256).sum
      assert(sr == expect && sg == expect && sb == expect)
    }
  }
}
