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

  test("bfs: multi-source takes the minimum depth; maxDepth bounds the walk") {
    val chain = Seq(("n1", "n2"), ("n2", "n3"), ("n3", "n4"), ("n5", "n3"))
      .toDF("src", "dst")
    val out = GraphOps.bfs(chain, "src", "dst", Seq("n1", "n5").toDF("node"), maxDepth = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // n3 is 2 hops from n1 but 1 from n5 -> depth 1; n4 at depth 2 via n5
    assert(out == Map("n1" -> 0L, "n5" -> 0L, "n2" -> 1L, "n3" -> 1L, "n4" -> 2L))
  }
}
