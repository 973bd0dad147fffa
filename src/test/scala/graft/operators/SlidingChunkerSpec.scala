package graft.operators

import graft.SparkSpec

class SlidingChunkerSpec extends SparkSpec {
  import spark.implicits._

  test("windows overlap by window-stride, cover every token, and clamp the tail") {
    // 7 tokens, window 4, stride 2 → chunks at 0..3, 2..5, 4..6 (nc = 1+ceil(3/2) = 3)
    val docs = Seq((1L, "a1 b2 c3 d4 e5 f6 g7")).toDF("doc_id", "text")
    val out = SlidingChunker.chunks(docs, "doc_id", "text", window = 4, stride = 2)
      .orderBy("chunk_idx")
      .select("chunk_idx", "n_toks").as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 4L), (1L, 4L), (2L, 3L)))
  }

  test("short docs yield one full-coverage chunk; empty docs yield none") {
    val docs = Seq((1L, "aa bb"), (2L, "")).toDF("doc_id", "text")
    val out = SlidingChunker.chunks(docs, "doc_id", "text", 20, 15)
      .select("doc_id", "chunk_idx", "n_toks").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 0L, 2L)))
  }

  test("identical content in different docs produces identical chunk digests") {
    val docs = Seq((1L, "the same ten words here"), (2L, "the same ten words here"))
      .toDF("doc_id", "text")
    val dg = SlidingChunker.chunks(docs, "doc_id", "text", 5, 5)
      .select("digest").as[String].collect().toSeq
    assert(dg.distinct.size == 1 && dg.size == 2)
  }

  test("stride above window is rejected (tokens would be skipped)") {
    val docs = Seq((1L, "x y")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      SlidingChunker.chunks(docs, "doc_id", "text", window = 4, stride = 5)
    }
  }
}
