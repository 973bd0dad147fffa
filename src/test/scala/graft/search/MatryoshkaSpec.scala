package graft.search

import graft.SparkSpec

class MatryoshkaSpec extends SparkSpec {
  import spark.implicits._

  // 4-dim vectors whose information lives entirely in the first 2 dims:
  // truncation to d=2 must be lossless for ranking.
  private def frontLoaded = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
    (2L, Seq(0.1f, 0.9f, 0.0f, 0.0f)),
    (3L, Seq(0.5f, 0.5f, 0.0f, 0.0f)),
    (4L, Seq(0.0f, 1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("zero tail: prefix tiers keep full energy and full overlap") {
    val rows = Matryoshka.fidelity(frontLoaded, "vec_id", "embedding",
      probeIds = Seq(0L), dims = Seq(2, 4), k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(rows(2L) === ((1.0, 3.0, 3L)), "tail is zero → d=2 is lossless")
    assert(rows(4L) === ((1.0, 3.0, 3L)), "full dim trivially overlaps itself")
  }

  test("information in the tail degrades both energy and overlap") {
    // neighbors of the probe are decided ONLY by the last 2 dims
    val tailLoaded = Seq(
      (0L, Seq(0.5f, 0.5f, 1.0f, 0.0f)),
      (1L, Seq(0.5f, 0.5f, 0.99f, 0.01f)), // closest at full dim
      (2L, Seq(0.5f, 0.5f, 0.0f, 1.0f)),   // farthest at full dim
      (3L, Seq(0.5f, 0.5f, 0.9f, 0.1f)),
      (4L, Seq(0.5f, 0.5f, 0.1f, 0.9f))
    ).toDF("vec_id", "embedding")
    val rows = Matryoshka.fidelity(tailLoaded, "vec_id", "embedding",
      probeIds = Seq(0L), dims = Seq(2, 4), k = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(rows(2L)._1 < 0.8, "half the mass lives past d=2")
    // at d=2 every vector ties (identical prefixes) → top-2 is by vec_id
    // (1, 2); the full-dim top-2 is (1, 3) → overlap 1 of 2
    assert(rows(2L)._2 == 1.0)
    assert(rows(4L)._2 == 2.0)
  }

  test("a tier with ZERO overlap reports 0, not k (zero-overlap rows must not drop out)") {
    // probe 0: at d=2 the two a-vectors win (prefix-heavy); at full dim
    // the two b-vectors win (tail-heavy) → top-1 sets are disjoint
    val flip = Seq(
      (0L, Seq(1.0f, 0.0f, 1.0f, 0.0f)),
      (1L, Seq(1.0f, 0.0f, 0.0f, 30.0f)),  // best prefix, terrible full
      (2L, Seq(0.2f, 0.9f, 1.0f, 0.0f)),   // terrible prefix, best full
      (3L, Seq(0.1f, 1.0f, 0.1f, 5.0f))
    ).toDF("vec_id", "embedding")
    val rows = Matryoshka.fidelity(flip, "vec_id", "embedding",
      probeIds = Seq(0L), dims = Seq(2, 4), k = 1)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(rows(2L) === ((0.0, 0L)), "disjoint top-1 sets must report overlap 0")
  }

  test("the probe itself is excluded from its own neighbor list") {
    // k=5 but only 4 NON-probe vectors exist: if the probe leaked into
    // its own candidate set the overlap would be 5, excluded it is 4
    val rows = Matryoshka.fidelity(frontLoaded, "vec_id", "embedding",
      probeIds = Seq(0L), dims = Seq(2, 4), k = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rows(2L) == 4.0)
  }
}
