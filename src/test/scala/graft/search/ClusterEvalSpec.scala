package graft.search

import graft.SparkSpec

class ClusterEvalSpec extends SparkSpec {
  import spark.implicits._

  test("perfect clustering: purity 1 everywhere, NMI 1") {
    val assigned = Seq(
      (1L, "a"), (1L, "a"), (1L, "a"),
      (2L, "b"), (2L, "b")
    ).toDF("cluster", "label")
    val rows = ClusterEval.purityReport(assigned, "cluster", "label").collect()
    assert(rows.forall(_.getDouble(4) == 1.0))
    assert(rows.forall(_.getDouble(5) == 1.0))
  }

  test("label-independent clustering: NMI 0, purity = majority share") {
    // both clusters see the same 50/50 label mix → knowing the cluster
    // tells you nothing about the label
    val assigned = Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b")
    ).toDF("cluster", "label")
    val rows = ClusterEval.purityReport(assigned, "cluster", "label").collect()
    assert(rows.forall(_.getDouble(5) == 0.0), "independent → zero NMI")
    assert(rows.forall(_.getDouble(4) == 0.5))
  }

  test("majority label wins with deterministic tie-break, counts roll up") {
    val assigned = Seq(
      (1L, "x"), (1L, "x"), (1L, "y"),
      (2L, "y"), (2L, "z") // tie in cluster 2 → lexicographically first
    ).toDF("cluster", "label")
    val rows = ClusterEval.purityReport(assigned, "cluster", "label")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4))).toMap
    assert(rows(1L) === ((3L, "x", 2L, 0.666667)))
    assert(rows(2L) === ((2L, "y", 1L, 0.5)))
  }

  test("degenerate partitions report NMI 0, not NULL 0/0") {
    val oneCluster = Seq((1L, "a"), (1L, "b"), (1L, "a")).toDF("cluster", "label")
    val r1 = ClusterEval.purityReport(oneCluster, "cluster", "label").collect().head
    assert(!r1.isNullAt(5) && r1.getDouble(5) == 0.0)
    val oneLabel = Seq((1L, "a"), (2L, "a")).toDF("cluster", "label")
    val r2 = ClusterEval.purityReport(oneLabel, "cluster", "label").collect().head
    assert(!r2.isNullAt(5) && r2.getDouble(5) == 0.0)
  }

  test("a split class costs NMI but not purity") {
    // clusters are pure (purity 1) but class 'a' is split across two
    // clusters → NMI strictly between 0 and 1
    val assigned = Seq(
      (1L, "a"), (1L, "a"), (2L, "a"), (2L, "a"), (3L, "b"), (3L, "b")
    ).toDF("cluster", "label")
    val rows = ClusterEval.purityReport(assigned, "cluster", "label").collect()
    assert(rows.forall(_.getDouble(4) == 1.0))
    val nmi = rows.head.getDouble(5)
    assert(nmi > 0.0 && nmi < 1.0, s"nmi $nmi")
  }
}
