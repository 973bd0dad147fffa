package graft.functions

import graft.SparkSpec

class ReadabilitySpec extends SparkSpec {
  import spark.implicits._

  test("counts words, sentences, and vowel-group syllables") {
    val df = Seq((1L, "The cat sat. The dog ran!")).toDF("id", "text")
    val r = Readability.score(df, "text").collect().head
    assert(r.getAs[Long]("n_words") == 6L)
    assert(r.getAs[Long]("n_sentences") == 2L)
    // e|a|a|e|o|a = 6 vowel groups
    assert(r.getAs[Long]("n_syllables") == 6L)
    // flesch = 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert(math.abs(r.getAs[Double]("flesch") - 119.19) < 1e-9)
  }

  test("harder text scores lower ease and higher grade") {
    val df = Seq(
      (1L, "I see a cat. It is fun. We go now."),
      (2L, "Nevertheless, institutional accountability necessitates comprehensive organizational transparency throughout bureaucratic administrations.")
    ).toDF("id", "text")
    val rows = Readability.score(df, "text")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("flesch"), r.getAs[Double]("fk_grade"))).toMap
    assert(rows(1L)._1 > rows(2L)._1, "simple text must read easier")
    assert(rows(1L)._2 < rows(2L)._2, "simple text must grade lower")
  }

  test("degenerate rows: empty text and no sentence punctuation stay NULL-safe") {
    val df = Seq((1L, ""), (2L, "no punctuation here")).toDF("id", "text")
    val rows = Readability.score(df, "text").collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(rows(1L).isNullAt(rows(1L).fieldIndex("flesch")))
    // a fragment without terminal punctuation still counts as 1 sentence
    assert(rows(2L).getAs[Long]("n_sentences") == 1L)
    assert(!rows(2L).isNullAt(rows(2L).fieldIndex("flesch")))
  }
}
