package graft

import org.apache.spark.sql.functions._

/** Adversarial-input sweep: operators must survive nulls, empties,
  * surrogate-pair unicode, and malformed semi-structured fields without
  * throwing — on 100 TB of crawl data every one of these WILL occur,
  * and ANSI mode upgrades silent garbage into job-killing exceptions
  * (e.g. `cast('' AS BIGINT)`).
  */
class EdgeInputSpec extends SparkSpec {
  import spark.implicits._

  private val nastyTexts = Seq[(java.lang.Long, String)](
    (1L, null),
    (2L, ""),
    (3L, " "),
    (4L, "a"),
    (5L, "😀😀 emoji only 🎉"),
    (6L, "no.sentences.or spaces.here"),
    (7L, "x" * 10000),
    (8L, "tabs\tand\nnewlines\r\nand \u0000 controls"))

  private def docs = nastyTexts.toDF("doc_id", "text")

  test("readability survives nulls, empties, and emoji") {
    val out = graft.functions.Readability.score(docs, "text").collect()
    assert(out.length == nastyTexts.length)
  }

  test("fim transform survives nulls and 1-char docs") {
    val out = graft.functions.Augment.fim(docs.filter(col("text").isNotNull),
      "doc_id", "text").collect()
    assert(out.length == nastyTexts.length - 1)
  }

  test("token dropout survives the sweep") {
    val out = graft.functions.Augment.tokenDropout(
      docs.filter(col("text").isNotNull), "doc_id", "text", 10).collect()
    assert(out.nonEmpty)
  }

  test("textrank survives a corpus of junk (possibly returning nothing)") {
    val out = graft.operators.TextRank.keywords(docs, "text", 10).collect()
    assert(out.length >= 0) // just: no throw
  }

  test("kneser-ney survives a corpus of junk") {
    val out = graft.functions.KneserNey.bigramProbs(docs, "text", 10).collect()
    assert(out.length >= 0)
  }

  test("malformed props JSON yields null items, not an ANSI cast error") {
    val ev = Seq(
      (1L, 1L, "{\"k\": 7}"),
      (2L, 2L, "not json at all"),
      (3L, 3L, ""),
      (4L, 4L, "{\"k\": }"),
      (5L, 5L, "{\"k\":42}") // compact serialization, no space after colon
    ).toDF("user_id", "event_id", "props")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("event_id") * 1000000L).as("ts"), col("props"))
      .withColumn("item", graft.core.Tables.extractLongProp(col("props"), "k"))
    // the extraction itself must not throw under ANSI...
    val items = ev.select(col("item")).collect().map(r =>
      if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0)))
    assert(items.toSeq == Seq(7L, null, null, null, 42L))
    // ...and the downstream basket operators must tolerate the nulls
    val pairs = graft.operators.Covisitation.topPairs(ev, "user_id", "ts",
      "event_id", "item", gapSec = 1800L, k = 10).collect()
    assert(pairs.length >= 0)
  }

  test("jaro-winkler expression survives nulls and emoji") {
    val out = Seq((null: String, "abc"), ("", ""), ("😀", "😀x"))
      .toDF("a", "b")
      .select(org.apache.spark.sql.graftx.JaroWinklerSim.asColumn(col("a"), col("b")).as("j"))
      .collect()
    assert(out.head.isNullAt(0)) // null in, null out
  }
}
