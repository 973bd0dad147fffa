package graft.mm

import java.awt.image.BufferedImage

import graft.SparkSpec
import graft.mm.Multimodal.MediaRow
import org.apache.spark.sql.functions._

class PerceptualHashSpec extends SparkSpec {

  private def fill(w: Int, h: Int)(px: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    img
  }

  test("solid images hash to 0 regardless of color") {
    assert(PerceptualHash.dHash56(fill(16, 16)((_, _) => 0x3366cc)) == 0L)
    assert(PerceptualHash.dHash56(fill(9, 31)((_, _) => 0xff0000)) == 0L)
  }

  test("a strictly decreasing luma gradient sets all 56 bits") {
    // luma = 255 - x*8 over w=16: strictly decreasing at every sampled col
    val img = fill(16, 8) { (x, _) => val v = 255 - x * 8; (v << 16) | (v << 8) | v }
    assert(PerceptualHash.dHash56(img) == (1L << 56) - 1)
  }

  test("hash survives PNG encode→decode and nearest-neighbor upscale") {
    val img = fill(16, 16) { (x, _) => val v = 255 - x * 8; (v << 16) | (v << 8) | v }
    val png = Multimodal.encodePng(img)
    val decoded = PerceptualHash.readImage(png).get
    assert(PerceptualHash.dHash56(decoded) == PerceptualHash.dHash56(img))
    // 2x nearest-neighbor upscale keeps the gradient structure → same hash
    val up = fill(32, 32) { (x, y) => img.getRGB(x / 2, y / 2) }
    assert(PerceptualHash.dHash56(up) == PerceptualHash.dHash56(img))
  }

  test("clusters group perceptual dups across different solid colors") {
    val spark0 = spark
    import spark0.implicits._
    val rows = (0L until 6L).map { i =>
      val img =
        if (i % 2 == 0) fill(12 + i.toInt, 10)((_, _) => 0x101010 * (i.toInt + 1))
        else fill(16, 12) { (x, _) => val v = 255 - x * 15; (v << 16) | (v << 8) | v }
      MediaRow(i, "image", Multimodal.encodePng(img), Map.empty)
    }
    val media = spark.createDataset(rows)
    val r = PerceptualHash.imageClusters(media).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) == 3L)               // the three solids
    assert(r((1L << 56) - 1) == 3L)   // the three gradients
  }

  test("non-image bytes drop out instead of erroring") {
    val spark0 = spark
    import spark0.implicits._
    val media = spark.createDataset(Seq(
      MediaRow(1L, "image", Array[Byte](1, 2, 3), Map.empty)))
    assert(PerceptualHash.hashes(media).count() == 0L)
  }
}
