package graft.mm

import graft.SparkSpec
import graft.mm.Multimodal.MediaRow
import graft.queries.MultimodalQueries

class ShotBoundarySpec extends SparkSpec {
  import spark.implicits._

  test("SAD deltas are exact on a hand-built two-frame clip") {
    // 4×2 luma: frame0 all 10, frame1 all 17 → SAD = 8 * 7 = 56
    val f0 = Array.fill[Byte](8)(10)
    val f1 = Array.fill[Byte](8)(17)
    val clip = MediaRow(1L, "video", Multimodal.encodeY4m(4, 2, 25, Seq(f0, f1)), Map.empty)
    val got = ShotBoundary.frameDeltas(Seq(clip).toDS()).as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 1L, 56L, 8L)))
  }

  test("wraparound deltas use unsigned luma (255→2 is |2-255|=253, not 3)") {
    val f0 = Array.fill[Byte](8)(255.toByte)
    val f1 = Array.fill[Byte](8)(2)
    val clip = MediaRow(2L, "video", Multimodal.encodeY4m(4, 2, 25, Seq(f0, f1)), Map.empty)
    val got = ShotBoundary.frameDeltas(Seq(clip).toDS()).as[(Long, Long, Long, Long)].collect()
    assert(got.head._3 == 253L * 8)
  }

  test("the q307 generator yields boundaries exactly at shot starts (f % 4 == 0)") {
    val media = spark.range(MultimodalQueries.NumShotClips)
      .map(v => MultimodalQueries.syntheticShotY4m(v.longValue))
    val cuts = ShotBoundary.boundaries(media, 50)
      .select("media_id", "frame").as[(Long, Long)].collect()
    assert(cuts.nonEmpty)
    assert(cuts.forall { case (_, f) => f % 4 == 0 })
    // clip 4 has nf = 6 + 4 = 10 frames → boundaries at 4 and 8
    assert(cuts.filter(_._1 == 4L).map(_._2).sorted.toSeq == Seq(4L, 8L))
  }

  test("non-video and undecodable rows drop out") {
    val media = Seq(
      MediaRow(1L, "audio", Array[Byte](1, 2, 3), Map.empty),
      MediaRow(2L, "video", Array[Byte](9, 9, 9), Map.empty)).toDS()
    assert(ShotBoundary.frameDeltas(media).count() == 0L)
  }
}
