package graft.mm

import graft.SparkSpec
import graft.mm.Multimodal.MediaRow

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    MediaRow(1L, "image", Array[Byte](1, 2, 3, 4), Map("src" -> "cam0")),
    MediaRow(2L, "video", Array[Byte](9, 9, 9), Map("src" -> "cam1")),
    MediaRow(3L, "audio", Array[Byte](5), Map.empty[String, String])
  ).toDS

  test("extractFeatures: schema, determinism, batch shape") {
    val f1 = Multimodal.extractFeatures(media, 2).collect().sortBy(_.mediaId)
    val f2 = Multimodal.extractFeatures(media, 3).collect().sortBy(_.mediaId)
    assert(f1.map(_.contentHash).toSeq == f2.map(_.contentHash).toSeq) // partitioning-invariant
    assert(f1.forall(_.embedding.length == Multimodal.EmbeddingDim))
    assert(f1.forall(f => f.width >= 1 && f.height >= 1))
    val img = f1.find(_.mediaId == 1L).get
    assert(img.durationMs == 0L) // images have no duration
    assert(img.sizeBytes == 4L)
  }

  test("resize stub preserves rows and tags metadata") {
    val out = Multimodal.resizeStub(media, 224, 224).collect()
    assert(out.length == 3)
    assert(out.forall(_.meta.get("resized").contains("224x224")))
  }

  test("frame sampling fans out video rows only") {
    val out = Multimodal.sampleFramesStub(media, 4).collect()
    assert(out.length == 2 + 4) // image + audio pass through, video -> 4 frames
    val frames = out.filter(_.meta.contains("frame"))
    assert(frames.length == 4)
    assert(frames.forall(_.kind == "image"))
    assert(frames.forall(_.meta("parent") == "2"))
  }
}
