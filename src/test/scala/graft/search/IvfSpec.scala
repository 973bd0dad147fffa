package graft.search

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.index.EmbedBatching

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private def emb = (0L until 40L).map { i =>
    // 4 well-separated directions + small deterministic wiggle
    val base = (i % 4).toInt
    val v = Array.fill(8)(0.001 * ((i * 13 % 7).toDouble - 3))
    v(base) = 1.0
    (i, v)
  }.toDF("id", "v")

  test("assignment puts each vector in its nearest seeded centroid cluster") {
    val cents = IvfAnn.centroids(emb, "id", "v", 4)
    assert(cents.count() == 4)
    val assigned = IvfAnn.assign(emb, "id", "v", cents).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster")).toMap
    assert(assigned.size == 40)
    // vectors 0..3 are the centroids themselves
    (0L until 4L).foreach(i => assert(assigned(i) == i))
    // direction grouping: id 4 points in direction 0 -> cluster 0
    assert(assigned(4L) == 0L)
    assert(assigned(5L) == 1L)
  }

  test("probed search finds the exact top-k when the right cluster is probed") {
    val query = Array(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0).toSeq
    val ivf = IvfAnn.topK(emb, "id", "v", query, 5, numClusters = 4, nprobe = 1)
      .collect().map(_.getAs[Long]("id")).toSet
    val exact = KnnSearch.topK(emb, "id", "v", query, 5)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(ivf == exact) // direction-0 cluster contains all direction-0 vectors
  }

  test("token-budget batching: budget respected, singletons allowed over budget") {
    val texts = Seq("a" * 40, "b" * 40, "c" * 40, "d" * 1000, "e" * 4)
    val batches = EmbedBatching.batchByTokenBudget(texts.iterator, tokenBudget = 25).toSeq
    // 40 chars ~ 10 tokens: first batch fits two, then one, then the
    // oversized singleton, then the tail
    assert(batches.map(_.length).sum == texts.length)
    assert(batches.forall(_.nonEmpty))
    assert(batches.exists(b => b.length == 1 && b.head.startsWith("d"))) // oversized alone
    batches.foreach { b =>
      if (b.length > 1)
        assert(b.map(EmbedBatching.estimateTokens).sum <= 25)
    }
    // order preserved
    assert(batches.flatten == texts)
  }

  test("maxItems caps batch size") {
    val texts = Seq.fill(10)("xx")
    val batches = EmbedBatching.batchByTokenBudget(texts.iterator, 1000L, maxItems = 3).toSeq
    assert(batches.map(_.length) == Seq(3, 3, 3, 1))
  }
}
