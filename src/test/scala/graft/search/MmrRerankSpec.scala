package graft.search

import graft.SparkSpec

class MmrRerankSpec extends SparkSpec {
  import spark.implicits._

  // probe 0 along (1,0); candidates: two near-duplicates hugging the
  // probe direction and one orthogonal-ish diversifier.
  private def vecs = Seq(
    (0L, Seq(1.0f, 0.0f)),
    (1L, Seq(0.99f, 0.1f)),  // rel ~0.995
    (2L, Seq(0.98f, 0.11f)), // rel ~0.994, near-dup of 1
    (3L, Seq(0.5f, 0.8f))    // rel ~0.53, diverse
  ).toDF("vec_id", "embedding")

  test("plain relevance would pick the near-dup second; MMR promotes the diverse candidate") {
    // at λ=0.3 the redundancy penalty dominates: 2's sim-to-1 of ~0.9999
    // outweighs its relevance edge over 3 (sim(3,1) ~ 0.61)
    val picks = MmrRerank.rerank(vecs, "vec_id", "embedding",
      probeId = 0L, candK = 3, k = 3, lambda = 0.3)
      .orderBy("pick").collect().map(_.getLong(1)).toSeq
    assert(picks.head == 1L, "first pick is pure relevance")
    assert(picks(1) == 3L, "diverse 3 wins slot 2 over near-dup 2")
    assert(picks(2) == 2L)
  }

  test("lambda = 1 reduces MMR to plain top-k relevance order") {
    val picks = MmrRerank.rerank(vecs, "vec_id", "embedding",
      probeId = 0L, candK = 3, k = 3, lambda = 1.0)
      .orderBy("pick").collect().map(_.getLong(1)).toSeq
    assert(picks == Seq(1L, 2L, 3L))
  }

  test("k beyond the candidate count stops at the page size; probe never appears") {
    val out = MmrRerank.rerank(vecs, "vec_id", "embedding",
      probeId = 0L, candK = 10, k = 10, lambda = 0.7)
      .collect()
    assert(out.length == 3)
    assert(!out.map(_.getLong(1)).contains(0L))
  }

  test("greedy tolerates duplicate candidate ids: picks stay distinct, no crash past the distinct count") {
    val dup = Seq(
      (1L, Array(1.0, 0.0), 1.0), (1L, Array(1.0, 0.0), 0.9),
      (2L, Array(0.0, 1.0), 0.8))
    val picks = MmrRerank.greedy(dup, k = 3, lambda = 0.7)
    assert(picks.map(_._2) == Seq(1L, 2L))
  }

  test("scores are monotonically non-increasing across picks under fixed lambda") {
    val scores = MmrRerank.rerank(vecs, "vec_id", "embedding",
      probeId = 0L, candK = 3, k = 3, lambda = 1.0)
      .orderBy("pick").collect().map(_.getDouble(2)).toSeq
    assert(scores == scores.sorted.reverse)
  }
}
