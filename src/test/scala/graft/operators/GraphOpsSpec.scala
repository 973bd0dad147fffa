package graft.operators

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bfs: nearest-seed depth, cycles terminate, unreachable excluded") {
    // a -> b -> c -> a (cycle), c -> d, e isolated, z -> a (not reachable FROM a)
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("z", "a"))
      .toDF("src", "dst")
    val out = GraphOps.bfs(edges, "src", "dst", Seq("a").toDF("node"), maxDepth = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L)) // no e, no z
  }

  test("pageRank: hand-computed 3-node ranks; sink gets no out-contribution") {
    // a -> b, a -> c, b -> c  (c is a sink: contributes nothing back)
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val out = GraphOps.pageRank(edges, "src", "dst", iterations = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // iter1: a=0.15, b=0.15+0.85*(1/2)=0.575, c=0.15+0.85*(1/2+1)=1.425
    // iter2: a=0.15, b=0.15+0.85*(0.15/2)=0.21375,
    //        c=0.15+0.85*(0.15/2 + 0.575) = 0.7025
    assert(math.abs(out("a") - 0.15) < 1e-12)
    assert(math.abs(out("b") - 0.21375) < 1e-12)
    assert(math.abs(out("c") - 0.7025) < 1e-12)
  }

  test("pageRank: mass conserved when no node dangles; every rank >= 1-d") {
    // ring guarantees an out-edge per node (no dangling mass loss); extras
    // add random in-degree skew, seeded for determinism
    val n = 30
    val rnd = new scala.util.Random(7)
    val ring = (0 until n).map(i => (s"v$i", s"v${(i + 1) % n}"))
    val extra = (0 until 40).map(_ => (s"v${rnd.nextInt(n)}", s"v${rnd.nextInt(n)}"))
    val edges = (ring ++ extra).toDF("src", "dst")
    val out = GraphOps.pageRank(edges, "src", "dst", iterations = 4).collect()
    assert(out.length == n)
    out.foreach(r => assert(r.getDouble(1) >= 0.15 - 1e-12))
    // with zero dangling nodes the update preserves total mass: sum = n
    assert(math.abs(out.map(_.getDouble(1)).sum - n) < 1e-9)
    // deterministic: identical ranks on a re-run
    val again = GraphOps.pageRank(edges, "src", "dst", iterations = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    out.foreach(r => assert(again(r.getString(0)) == r.getDouble(1)))
  }

  test("pageRank: a symmetric cycle stays uniform at rank 1.0") {
    val cycle = Seq(("x", "y"), ("y", "z"), ("z", "x")).toDF("src", "dst")
    val out = GraphOps.pageRank(cycle, "src", "dst", iterations = 5)
      .collect().map(r => r.getDouble(1))
    assert(out.length == 3 && out.forall(r => math.abs(r - 1.0) < 1e-12))
  }

  test("bfs: multi-source takes the minimum depth; maxDepth bounds the walk") {
    val chain = Seq(("n1", "n2"), ("n2", "n3"), ("n3", "n4"), ("n5", "n3"))
      .toDF("src", "dst")
    val out = GraphOps.bfs(chain, "src", "dst", Seq("n1", "n5").toDF("node"), maxDepth = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // n3 is 2 hops from n1 but 1 from n5 -> depth 1; n4 at depth 2 via n5
    assert(out == Map("n1" -> 0L, "n5" -> 0L, "n2" -> 1L, "n3" -> 1L, "n4" -> 2L))
  }

  test("label propagation: majority wins, ties break to the smaller label, seeds stay fixed") {
    // node 3 neighbors two 'a' seeds (1, 2) and one 'b' seed (4) -> 'a';
    // node 5 reaches a label only via node 3's round-1 result (round 2);
    // node 6 neighbors one 'a' (1) and one 'b' (4) seed -> tie -> 'a';
    // seed 4 keeps 'b' even though its neighbors vote 'a'
    val edges = Seq((1L, 3L), (2L, 3L), (4L, 3L), (3L, 5L), (1L, 6L), (4L, 6L))
      .toDF("src", "dst")
    val seeds = Seq((1L, "a"), (2L, "a"), (4L, "b")).toDF("node", "lbl")
    val out = GraphOps.labelPropagate(edges, "src", "dst", seeds, "node", "lbl", 2)
      .collect().map(r => r.getLong(0) -> (Option(r.getString(1)), r.getBoolean(2))).toMap
    assert(out(3L) == ((Some("a"), false)))
    assert(out(5L) == ((Some("a"), false))) // reached only in round 2
    assert(out(6L) == ((Some("a"), false))) // 1-1 tie -> lexicographically smaller
    assert(out(4L) == ((Some("b"), true)))  // seed immutable
    // one round only: node 5 still unlabeled
    val r1 = GraphOps.labelPropagate(edges, "src", "dst", seeds, "node", "lbl", 1)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(r1(5L).isEmpty)
  }

  test("personalized PageRank: mass stays seed-rooted and reduces to the biased surfer") {
    import spark.implicits._
    // chain 1→2→3 plus an isolated cycle 4↔5: nothing walks from the seed
    // to the cycle, so with seed {1} the cycle's rank must be exactly 0
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L), (5L, 4L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val r = GraphOps.personalizedPageRank(edges, "src", "dst", seeds, 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(4L) == 0.0 && r(5L) == 0.0)
    assert(r(1L) > 0.0 && r(2L) > 0.0 && r(3L) > 0.0)
    // the seed keeps its teleport share every round; downstream decays
    assert(r(1L) > r(3L))
    // an isolated seed (no edges at all) still holds teleport mass and
    // appears in the output rather than silently vanishing
    val iso = GraphOps.personalizedPageRank(edges, "src", "dst",
      Seq(99L).toDF("node"), 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(iso(99L) > 0.0, s"isolated seed lost its mass: $iso")
    assert(iso.filterKeys(_ != 99L).values.forall(_ == 0.0))
    // seeding EVERY node must reproduce the uniform-teleport recurrence
    val all = Seq(1L, 2L, 3L, 4L, 5L).toDF("node")
    val ppr = GraphOps.personalizedPageRank(edges, "src", "dst", all, 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val pr = GraphOps.pageRank(edges, "src", "dst", 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(ppr.keySet == pr.keySet)
    ppr.keySet.foreach(k => assert(math.abs(ppr(k) - pr(k)) < 1e-12, s"node $k"))
  }

  test("triangles: K4 has 4, a square has 0, duplicate/reversed edges don't double-count") {
    import spark.implicits._
    def count(es: Seq[(Long, Long)]): (Long, Long, Long) = {
      val r = GraphOps.triangles(es.toDF("src", "dst"), "src", "dst").collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // complete graph on 4 nodes: C(4,3) = 4 triangles
    val k4 = for (i <- 1L to 4L; j <- 1L to 4L if i < j) yield (i, j)
    assert(count(k4) == ((4L, 6L, 4L)))
    // 4-cycle: no triangles
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) == ((4L, 4L, 0L)))
    // one triangle given messily: dup edge, reversed edge, self-loop
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 1L), (2L, 2L))
    assert(count(messy) == ((3L, 3L, 1L)))
  }
}
