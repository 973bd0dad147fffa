package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String) =
    Seq(Tuple1(text)).toDF("text").select(c).head()

  test("token counting: whitespace vs bpe-ish") {
    assert(one(TextOps.wsTokenCount(col("text")), "hello world  again").getInt(0) == 3)
    // "don't stop" -> [don]['][t][stop] = 4 bpe-ish, 2 ws
    assert(one(TextOps.bpeishTokenCount(col("text")), "don't stop").getInt(0) == 4)
    assert(one(TextOps.wsTokenCount(col("text")), "don't stop").getInt(0) == 2)
    // digit runs split from letters: "abc123 x" -> [abc][123][x]
    assert(one(TextOps.bpeishTokenCount(col("text")), "abc123 x").getInt(0) == 3)
  }

  test("quality metrics") {
    assert(math.abs(one(TextOps.avgWordLen(col("text")), "ab abcd").getDouble(0) - 3.0) < 1e-12)
    assert(math.abs(one(TextOps.stopwordRatio(col("text"), Seq("the", "a")), "the big a cat")
      .getDouble(0) - 0.5) < 1e-12)
    assert(math.abs(one(TextOps.punctRatio(col("text")), "ab!?").getDouble(0) - 0.5) < 1e-12)
    assert(one(TextOps.punctRatio(col("text")), "").getDouble(0) == 0.0)
  }

  test("language guess: profile argmax with lexicographic tie-break") {
    assert(one(TextOps.langGuess(col("text")), "the cat and the dog is here").getString(0) == "en")
    assert(one(TextOps.langGuess(col("text")), "der hund und die katze ist").getString(0) == "de")
    assert(one(TextOps.langGuess(col("text")), "le chat et la table est").getString(0) == "fr")
    // no stopwords at all -> no signal -> unknown
    assert(one(TextOps.langGuess(col("text")), "xyzzy plugh").getString(0) == "unknown")
  }

  test("unigram LM score: rarer tokens score lower; hand-computed mean logprob") {
    // corpus: doc1 = "aa aa bb", doc2 = "aa zz"
    // unigrams: aa=3, bb=1, zz=1, total=5
    val docs = Seq((1L, "aa aa bb"), (2L, "aa zz")).toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"),
      explode(graft.search.Bm25.tokens(col("text"))).as("w"))
    val uni = toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val tot = uni.agg(sum(col("cnt")).as("n"))
    val out = toks.join(uni, Seq("w")).crossJoin(tot)
      .groupBy(col("doc_id"))
      .agg(avg(log(col("cnt") / col("n"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val d1 = (2 * math.log(3.0 / 5) + math.log(1.0 / 5)) / 3
    val d2 = (math.log(3.0 / 5) + math.log(1.0 / 5)) / 2
    assert(math.abs(out(1L) - d1) < 1e-12)
    assert(math.abs(out(2L) - d2) < 1e-12)
    assert(out(2L) < out(1L)) // the zz-heavy doc is more OOD
  }

  test("fingerprint: order-sensitive, deterministic, stable") {
    val fp1 = one(TextOps.fingerprint("text"), "alpha beta gamma").getLong(0)
    val fp2 = one(TextOps.fingerprint("text"), "gamma beta alpha").getLong(0)
    val fp1b = one(TextOps.fingerprint("text"), "alpha beta gamma").getLong(0)
    assert(fp1 == fp1b)
    assert(fp1 != fp2) // order matters
    assert(fp1 >= 0 && fp1 < TextOps.FpMod)
    assert(one(TextOps.fingerprint("text"), "").getLong(0) == 0L)
  }
}
