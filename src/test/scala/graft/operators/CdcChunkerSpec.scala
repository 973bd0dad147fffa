package graft.operators

import graft.SparkSpec

class CdcChunkerSpec extends SparkSpec {

  private def randomish(n: Int): String = {
    // deterministic pseudo-random text (no RNG in tests)
    val sb = new StringBuilder
    var x = 12345L
    (0 until n).foreach { _ =>
      x = (x * 1103515245L + 12345L) & 0x7fffffffL
      sb.append(('a' + (x % 26)).toChar)
    }
    sb.toString
  }

  test("shift stability: a prefix insert changes only the leading boundaries") {
    val text = randomish(4000)
    val edited = "Z" + text
    val cutsA = CdcChunker.cutPositions(text).toSet
    val cutsB = CdcChunker.cutPositions(edited).map(_ - 1).toSet // re-align
    // after the hash window re-synchronizes past the edit, every boundary
    // agrees: the overlap must dominate both cut sets
    val shared = (cutsA & cutsB).size.toDouble
    assert(shared / cutsA.size > 0.9 && shared / cutsB.size > 0.9,
      s"cut sets diverged: ${cutsA.size} vs ${cutsB.size}, shared $shared")
    // whereas FIXED-offset chunking would share no boundary at all
  }

  test("expected chunk length tracks the divisor and lengths partition the text") {
    val text = randomish(20000)
    val lens = CdcChunker.chunkLengths(text)
    assert(lens.sum == text.length)
    val mean = lens.sum.toDouble / lens.size
    assert(mean > CdcChunker.Divisor / 3.0 && mean < CdcChunker.Divisor * 3.0,
      s"mean chunk $mean far from divisor ${CdcChunker.Divisor}")
  }

  test("min/max bounds: no chunk under min (except the tail) or over max") {
    val text = randomish(8000)
    val lens = CdcChunker.chunkLengths(text, minLen = 32, maxLen = 128)
    assert(lens.sum == text.length)
    assert(lens.dropRight(1).forall(l => l >= 32 && l <= 128), s"bounds violated: $lens")
    assert(lens.last <= 128)
    // a pathological constant string never matches the hash rule -> the
    // max bound alone must chunk it
    val flat = "a" * 1000
    val flatLens = CdcChunker.chunkLengths(flat, minLen = 32, maxLen = 128)
    assert(flatLens.sum == 1000 && flatLens.forall(_ <= 128))
  }

  test("stats DataFrame matches the local computation") {
    import spark.implicits._
    val docs = Seq((1L, randomish(500)), (2L, "short")).toDF("doc_id", "text")
    val out = CdcChunker.stats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val cuts1 = CdcChunker.cutPositions(randomish(500))
    assert(out(1L)._1 == cuts1.size + 1)
    assert(out(2L) == ((1L, 5L, 0L))) // under the window: one chunk, no cut
  }
}
