package graft.functions

import graft.SparkSpec

class BpeTokenizerSpec extends SparkSpec {
  import spark.implicits._

  test("fit learns the hand-computable merge sequence and stops when no pairs remain") {
    // words: aaab x3, aab x2
    // round 1: (a,a) has weight 3*2 + 2*1 = 8 -> merge "aa"
    // round 2: (aa,a)=3 ties (a,b)=3 -> lexicographic -> (a,b)
    // round 3: (aa,ab)=3 beats (aa,b)=2
    // round 4: only (aa,b)=2 remains; then every word is a single symbol
    val docs = Seq("aaab aaab aab", "aaab aab").toDF("text")
    val merges = BpeTokenizer.fit(docs, "text", 5)
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "ab"), ("aa", "b")))
  }

  test("encode applies merges in rank order; token counts reflect the learned vocab") {
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"), ("aa", "b"))
    assert(BpeTokenizer.encodeWord("aaab", merges) == List("aaab"))
    assert(BpeTokenizer.encodeWord("aab", merges) == List("aab"))
    assert(BpeTokenizer.encodeWord("xy", merges) == List("x", "y"))
    val counts = BpeTokenizer.tokenCounts(
      Seq((1L, "aaab aab xy")).toDF("doc_id", "text"), "doc_id", "text", merges)
      .collect().head
    assert(counts.getLong(1) == 3L) // pre-tokens
    assert(counts.getLong(2) == 4L) // aaab=1, aab=1, xy=2
  }

  test("merged count never exceeds the character count and never undercuts pre-tokens") {
    val docs = Seq((1L, "the quick brown fox"), (2L, "jumps over the lazy dog 123!"))
      .toDF("doc_id", "text")
    val merges = BpeTokenizer.fit(docs, "text", 6)
    val rows = BpeTokenizer.tokenCounts(docs, "doc_id", "text", merges).collect()
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1)) // >= one token per pre-token
    }
    // more merges can only shrink or keep the count
    val rows0 = BpeTokenizer.tokenCounts(docs, "doc_id", "text", Nil).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    rows.foreach(r => assert(r.getLong(2) <= rows0(r.getLong(0))))
  }
}
