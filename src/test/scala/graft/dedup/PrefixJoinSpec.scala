package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  // brute-force the same semantics to check the prefix filter exactly
  private def brute(docs: org.apache.spark.sql.DataFrame, t: Double) = {
    val g = Decontamination.docGrams(docs, "doc_id", "text", 3)
    val sz = g.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    g.as("a").join(g.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("ni"))
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .filter(col("ni") / (col("na") + col("nb") - col("ni")) >= t)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("no false negatives: prefix candidates recover every brute-force pair") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (1L, base),
      (2L, base + " extra"),                           // ~0.75 jaccard vs 1
      (3L, "alpha beta gamma " + "x y z w v u t s r"), // low overlap
      (4L, "totally different words with nothing shared here at all ok"),
      (5L, base.replace("zeta", "zzz"))                // high overlap vs 1
    ).toDF("doc_id", "text")
    val got = PrefixJoin.similarPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute(docs, 0.5), s"got $got expected ${brute(docs, 0.5)}")
    assert(got.contains((1L, 2L)))
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("jaccard values are exact set ratios") {
    // doc 2's gram set strictly contains doc 1's
    val docs = Seq(
      (1L, "a1 a2 a3 a4 a5"),
      (2L, "a1 a2 a3 a4 a5 a6")
    ).toDF("doc_id", "text")
    val row = PrefixJoin.similarPairs(docs, "doc_id", "text", 3, 0.5).collect().head
    // sets: doc1 has 3 trigrams, doc2 has 4, intersection 3 -> 3/4
    assert(row.getLong(2) == 3L && row.getDouble(3) == 0.75)
  }
}
