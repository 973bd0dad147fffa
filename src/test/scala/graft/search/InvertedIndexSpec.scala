package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  test("postings: df band filters, lists sort ascending, occurrences dedup per doc") {
    val terms = Seq(
      (3L, "apple"), (1L, "apple"), (2L, "apple"), (1L, "apple"), // df 3, dup occurrence
      (1L, "rare"),                                               // df 1 — below band
      (1L, "stop"), (2L, "stop"), (3L, "stop"), (4L, "stop"), (5L, "stop") // df 5 — above band
    ).toDF("doc_id", "w")
    val out = InvertedIndex.postings(terms, "doc_id", "w", 2, 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq(("apple", 3L, "1,2,3")))
  }

  test("phraseTerms: sliding word n-grams over the engine tokenizer") {
    val docs = Seq((7L, "Alpha beta GAMMA delta")).toDF("doc_id", "text")
    val grams = InvertedIndex.phraseTerms(docs, "doc_id", "text", 3)
      .collect().map(_.getString(1)).sorted
    assert(grams.toSeq == Seq("alpha beta gamma", "beta gamma delta"))
    // a doc shorter than n yields nothing rather than a partial gram
    val short = InvertedIndex.phraseTerms(Seq((1L, "one two")).toDF("doc_id", "text"), "doc_id", "text", 3)
    assert(short.count() == 0)
  }

  test("longest posting list never exceeds maxDf") {
    val terms = (1 to 200).flatMap(d => Seq((d.toLong, "common"), (d.toLong, s"uniq_$d")))
      .toDF("doc_id", "w")
    val out = InvertedIndex.postings(terms, "doc_id", "w", 1, 30)
    val maxLen = out.select(max(size(split(col("postings"), ",")))).collect().head.getInt(0)
    assert(maxLen <= 30)
  }
}
