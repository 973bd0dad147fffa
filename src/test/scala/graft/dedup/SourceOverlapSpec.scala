package graft.dedup

import graft.SparkSpec

class SourceOverlapSpec extends SparkSpec {
  import spark.implicits._

  test("containment is directed: a copied excerpt scores high for the copier, low for the origin") {
    // origin has 12 tokens (8 5-gram windows); copier reproduces the
    // first 6 tokens (2 windows) plus its own tail
    val docs = Seq(
      ("orig", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
      ("copy", "w1 w2 w3 w4 w5 w6 c1 c2 c3 c4")
    ).toDF("source", "text")
    val rows = SourceOverlap.containment(docs, "source", "text", 5, 10, 25)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // shared windows: [w1..w5], [w2..w6] → 2. orig has 8 grams, copy 6.
    assert(rows(("copy", "orig")) === ((2L, 0.333333)))
    assert(rows(("orig", "copy")) === ((2L, 0.25)))
  }

  test("hub cap drops grams shared by more than maxSources sources") {
    val chrome = "nav home about contact footer"
    val docs = Seq(
      ("s1", s"$chrome a1 a2 a3 a4 a5"),
      ("s2", s"$chrome b1 b2 b3 b4 b5"),
      ("s3", s"$chrome c1 c2 c3 c4 c5")
    ).toDF("source", "text")
    // with maxSources=2 the 3-source chrome gram is dropped → no pair
    // shares anything
    val capped = SourceOverlap.containment(docs, "source", "text", 5, 2, 25)
    assert(capped.count() == 0)
    // with maxSources=10 the chrome gram connects every ordered pair
    val open = SourceOverlap.containment(docs, "source", "text", 5, 10, 25)
    assert(open.count() == 6)
  }

  test("identical sources contain each other fully") {
    val docs = Seq(
      ("a", "t1 t2 t3 t4 t5 t6"),
      ("b", "t1 t2 t3 t4 t5 t6")
    ).toDF("source", "text")
    val rows = SourceOverlap.containment(docs, "source", "text", 5, 10, 25)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(rows(("a", "b")) == 1.0 && rows(("b", "a")) == 1.0)
  }
}
