package graft.search

import graft.SparkSpec

class EmbedOutliersSpec extends SparkSpec {
  import spark.implicits._

  test("a vector pointing away from its group's centroid is quarantined") {
    val pts = Seq(
      (1L, 0L, Seq(1.0, 0.1)),
      (2L, 0L, Seq(0.9, 0.0)),
      (3L, 0L, Seq(1.0, -0.1)),
      (4L, 0L, Seq(-1.0, 0.0)), // anti-correlated with label 0's centroid
      (5L, 1L, Seq(0.0, 1.0)),
      (6L, 1L, Seq(0.1, 0.9))
    ).toDF("vec_id", "label", "embedding")
    val out = EmbedOutliers.outliers(pts, "vec_id", "label", "embedding", 0.0).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(4L))
    assert(out.head.getLong(1) == 0L)
    assert(out.head.getDouble(2) < 0.0)
  }

  test("threshold is strict: a point exactly on the boundary survives") {
    // label centroid is (1, 0); point 2 is orthogonal → cos exactly 0.0
    val pts = Seq(
      (1L, 0L, Seq(1.0, 0.0)),
      (2L, 0L, Seq(0.0, 1.0)),
      (3L, 0L, Seq(2.0, -1.0))
    ).toDF("vec_id", "label", "embedding")
    // centroid = (1, 0): contributions (1+0+2)/3 = 1, (0+1-1)/3 = 0;
    // cos is 1.0 / 0.0 / 0.894 — nothing strictly under 0, the orthogonal
    // point sits exactly ON the boundary and must survive
    val out = EmbedOutliers.outliers(pts, "vec_id", "label", "embedding", 0.0)
      .collect().map(_.getLong(0)).toSet
    assert(out.isEmpty)
  }
}
