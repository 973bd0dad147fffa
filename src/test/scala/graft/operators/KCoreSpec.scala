package graft.operators

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  test("triangle with a pendant: 2-core drops the pendant, keeps the triangle") {
    // a-b-c triangle, plus d hanging off a.
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"))
      .toDF("src", "dst")
    val core = KCore.peel(edges, "src", "dst", k = 2, rounds = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(core.keySet == Set("a", "b", "c"))
    // after the pendant peels, every core node has exactly its 2 triangle
    // neighbors left
    assert(core.values.forall(_ == 2L))
  }

  test("chain cascades out entirely under k=2") {
    val edges = (0 until 10).map(i => (s"n$i", s"n${i + 1}")).toDF("src", "dst")
    assert(KCore.peel(edges, "src", "dst", k = 2, rounds = 12).isEmpty)
  }

  test("peeling cascades: removing the shell can drop a node that started above k") {
    // hub h has degree 3, but all its neighbors are degree-1 leaves: one
    // round peels the leaves, the next peels h. A pure degree filter
    // (1 round) would keep h.
    val star = Seq(("h", "l1"), ("h", "l2"), ("h", "l3")).toDF("src", "dst")
    val oneRound = KCore.peel(star, "src", "dst", k = 2, rounds = 1)
    assert(oneRound.isEmpty) // edges to peeled leaves vanish with them
    val clique = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
      ("a", "c"), ("b", "d")).toDF("src", "dst")
    // K4 is a 3-core: survives any number of rounds at k=3
    val k4 = KCore.peel(clique, "src", "dst", k = 3, rounds = 6)
    assert(k4.count() == 4 &&
      k4.collect().forall(_.getLong(1) == 3L))
  }

  test("self-loops and duplicate/reverse edges don't inflate degree") {
    val edges = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("a", "b"))
      .toDF("src", "dst")
    // simple graph is a single a-b edge: nobody reaches degree 2
    assert(KCore.peel(edges, "src", "dst", k = 2, rounds = 3).isEmpty)
    val one = KCore.peel(edges, "src", "dst", k = 1, rounds = 3)
    assert(one.count() == 2 && one.collect().forall(_.getLong(1) == 1L))
  }
}
