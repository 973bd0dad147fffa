package graft.functions

import graft.SparkSpec

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  test("winnow core: rightmost tie, position dedup, short-sequence fallback") {
    // windows of 4 over [5,3,3,9,1]: [5,3,3,9]→pos 2 (rightmost 3), [3,3,9,1]→pos 4
    assert(Winnowing.winnow(Array(5L, 3L, 3L, 9L, 1L), 4).toSeq == Seq(2, 4))
    // constant sequence: every window selects its rightmost element
    assert(Winnowing.winnow(Array(7L, 7L, 7L, 7L, 7L), 4).toSeq == Seq(3, 4))
    // shorter than one window: single global (rightmost) min
    assert(Winnowing.winnow(Array(4L, 2L, 2L), 4).toSeq == Seq(2))
    assert(Winnowing.winnow(Array.empty[Long], 4).isEmpty)
  }

  test("exact duplicates produce identical sketch summaries") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "zz")  // one short token -> zero grams
    ).toDF("doc_id", "text")
    val m = Winnowing.sketches(docs, "doc_id", "text", 3, 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m(1L) == m(2L))
    assert(m(1L)._1 == 8L) // 10 tokens -> 8 trigrams
    assert(m(1L)._2 >= 1L && m(1L)._2 <= 5L) // 5 windows select 1..5 positions
    assert(m(3L) == ((0L, 0L, 0L)))
  }

  test("shared fragments: a copied span pairs the docs; the df cap silences boilerplate") {
    val span = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (1L, s"first document begins here $span and then trails off elsewhere"),
      (2L, s"$span opens the second document before unrelated content continues after"),
      (3L, "third document shares nothing with any of the others at all today")
    ).toDF("doc_id", "text")
    val pairs = Winnowing.sharedFragments(docs, "doc_id", "text", 3, 4, 2, 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    // with maxDf = 1 every shared hash is "boilerplate" and no pair survives
    val capped = Winnowing.sharedFragments(docs, "doc_id", "text", 3, 4, 1, 1)
    assert(capped.count() == 0)
  }

  test("guarantee: docs sharing a >= n+w-1 token run share a sketch hash") {
    val shared = "one two three four five six" // 6 tokens = n + w - 1
    val docs = Seq(
      (1L, s"unrelated prefix words here $shared and a suffix tail"),
      (2L, s"$shared completely different continuation text follows now")
    ).toDF("doc_id", "text")
    val sk = Winnowing.sketchHashes(docs, "doc_id", "text", 3, 4)
    val common = sk.filter($"doc_id" === 1L).select("hash")
      .intersect(sk.filter($"doc_id" === 2L).select("hash"))
    assert(common.count() >= 1)
  }
}
