package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.dedup.DupClusters
import graft.search.KMeans

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("splits: labels partition the corpus, are deterministic, and roughly proportional") {
    val ids = (1L to 1000L).toDF("id")
    val labeled = ids.withColumn("split", Splits.splitLabel(col("id"), 80, 10))
    val counts = labeled.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 1000L)
    assert(counts("train") > 700 && counts("train") < 900) // ~80%
    assert(counts("val") > 50 && counts("val") < 150)      // ~10%
    assert(counts("test") > 50 && counts("test") < 150)
    // deterministic: second evaluation identical
    val again = ids.withColumn("split", Splits.splitLabel(col("id"), 80, 10))
    assert(labeled.except(again).count() == 0 && again.except(labeled).count() == 0)
    // sampled() uses a different salt than the split bucket: membership is
    // not just "the first decile of the split hash"
    val s = ids.withColumn("in_sample", Splits.sampled(col("id"), 10))
      .filter(col("in_sample")).count()
    assert(s > 50 && s < 150)
  }

  test("aresKey: weight-proportional selection, deterministic, keys in (0, 1)") {
    // 200 unit-weight items vs one 10000-weight item: across 25 salts the
    // heavy item must win the top spot nearly always (p_miss < 2% per salt)
    val df = ((1 to 200).map(i => (i.toLong, 1L)) :+ (999L, 10000L)).toDF("id", "w")
    val wins = (0 until 25).count { s =>
      val top = df.select(col("id"), Splits.aresKey(col("id"), col("w"), s":s$s").as("k"))
        .orderBy(col("k").desc).limit(1).collect().head.getLong(0)
      top == 999L
    }
    assert(wins >= 22, s"heavy item won only $wins/25")
    // deterministic + bounded
    val keys = df.select(Splits.aresKey(col("id"), col("w")).as("k")).collect().map(_.getDouble(0))
    assert(keys.forall(k => k > 0.0 && k < 1.0))
    val again = df.select(Splits.aresKey(col("id"), col("w")).as("k")).collect().map(_.getDouble(0))
    assert(keys.toSeq == again.toSeq)
  }

  test("trigram repetition: repeated text scores high, varied text low, short text zero") {
    val docs = Seq(
      (1L, "alpha beta gamma " * 20),                          // one trigram family repeated
      (2L, (1 to 60).map(i => s"word$i").mkString(" ")),       // all-distinct trigrams
      (3L, "tiny doc")                                         // under 3 tokens -> 0.0
    ).toDF("id", "text")
    val rep = docs.select(col("id"), TextOps.trigramRepetition("text").as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rep(1L) > 0.9)
    assert(rep(2L) == 0.0)
    assert(rep(3L) == 0.0)
    // the JIT twin used on hot paths is bit-identical to the column form
    docs.collect().foreach { r =>
      assert(TextOps.trigramRepetitionScala(r.getString(1)) == rep(r.getLong(0)))
    }
  }

  test("dup clusters: min-label fixpoint over a chain and a disjoint pair") {
    // chain 1-2-3-4 (diameter 3 forces multiple propagation rounds) + pair 10-11
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val comp = DupClusters.components(edges, "a", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("kmeans: separable clusters recovered; centroids deterministic across fits") {
    // two tight blobs in 4-d; seeds (two lowest ids) land one in each blob
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 0.1, 0.0)), (3L, Seq(0.9, 0.1, 0.0, 0.0)), (5L, Seq(1.1, 0.0, 0.0, 0.1)),
      (2L, Seq(0.0, 1.0, 0.0, 0.1)), (4L, Seq(0.1, 0.9, 0.0, 0.0)), (6L, Seq(0.0, 1.1, 0.1, 0.0))
    ).toDF("vec_id", "embedding")
    val cents = KMeans.fit(vecs, "vec_id", "embedding", 2, 2)
    val byCluster = KMeans.assignments(vecs, "vec_id", "embedding", cents).collect()
      .map(r => r.getAs[Long]("vid") -> r.getAs[Long]("cluster")).toMap
    assert(byCluster(1L) == 1L && byCluster(3L) == 1L && byCluster(5L) == 1L)
    assert(byCluster(2L) == 2L && byCluster(4L) == 2L && byCluster(6L) == 2L)
    // determinism: refit returns bit-identical centroids
    val cents2 = KMeans.fit(vecs, "vec_id", "embedding", 2, 2)
    val a = cents.orderBy("cluster").collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val b = cents2.orderBy("cluster").collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(a.sameElements(b))
    // centroid components carry the 6dp rounding contract
    assert(a.forall(_._2.forall(x => (math.round(x * 1e6) / 1e6) == x)))
  }

  test("cluster representatives: max score wins, ties break to the smallest id") {
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L), (10L, 9L))
      .toDF("node", "cluster_id")
    val scores = Seq((1L, 5L), (2L, 9L), (3L, 9L), (9L, 4L), (10L, 4L))
      .toDF("doc_id", "n_chars")
    val reps = DupClusters.representatives(clusters, "node", "cluster_id",
      scores, "doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(reps(1L) == ((2L, 9L, 3L)))  // 2 and 3 tie at 9 -> smaller id 2
    assert(reps(9L) == ((9L, 4L, 2L)))  // tie at 4 -> id 9
  }
}
