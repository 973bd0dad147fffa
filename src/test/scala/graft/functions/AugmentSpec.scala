package graft.functions

import graft.SparkSpec

class AugmentSpec extends SparkSpec {
  import spark.implicits._

  test("fim: the three pieces reassemble the original text exactly") {
    val docs = Seq((7L, "abcdefghijklmnopqrstuvwxyz0123456789"))
      .toDF("doc_id", "text")
    val r = Augment.fim(docs, "doc_id", "text").collect().head
    val fim = r.getAs[String]("fim")
    val pre = fim.substring("<PRE>".length, fim.indexOf("<SUF>"))
    val suf = fim.substring(fim.indexOf("<SUF>") + 5, fim.indexOf("<MID>"))
    val mid = fim.substring(fim.indexOf("<MID>") + 5)
    assert(pre + mid + suf == "abcdefghijklmnopqrstuvwxyz0123456789")
    // pivots land in the middle/last thirds -> every piece is non-empty
    assert(pre.nonEmpty && mid.nonEmpty && suf.nonEmpty)
  }

  test("fim: deterministic per id, different ids split differently") {
    val docs = (0L until 20L).map(i => (i, "a" * 30 + "b" * 30)).toDF("doc_id", "text")
    val sp = Augment.fim(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("sp1"), r.getAs[Long]("sp2"))).toMap
    val again = Augment.fim(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("sp1"), r.getAs[Long]("sp2"))).toMap
    assert(sp == again, "same ids must split identically")
    assert(sp.values.toSet.size > 1, "distinct ids should produce varied pivots")
    // structural bounds: third+1 <= sp1 <= 2*third < sp2 <= len+1-ish
    sp.values.foreach { case (s1, s2) =>
      assert(s1 >= 21 && s1 <= 40 && s2 >= 41 && s2 <= 60, s"($s1,$s2)")
    }
  }

  test("fim: degenerate short text still yields a well-formed row") {
    val docs = Seq((3L, "xy")).toDF("doc_id", "text")
    val r = Augment.fim(docs, "doc_id", "text").collect().head
    val fim = r.getAs[String]("fim")
    assert(fim.startsWith("<PRE>") && fim.contains("<SUF>") && fim.contains("<MID>"))
    // reassembly may duplicate nothing: pieces partition [1, len]
    val pre = fim.substring(5, fim.indexOf("<SUF>"))
    val suf = fim.substring(fim.indexOf("<SUF>") + 5, fim.indexOf("<MID>"))
    val mid = fim.substring(fim.indexOf("<MID>") + 5)
    assert(pre + mid + suf == "xy")
  }
}
