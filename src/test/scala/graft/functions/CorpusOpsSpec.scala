package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("url normalization: case, www, default port, tracking, slash, fragment") {
    val cases = Seq(
      // messy -> expected canonical
      ("HTTPS://WWW.Example.COM:443/Path/Sub/?utm_source=a&q=1#frag",
        "https://example.com/Path/Sub?q=1"),
      ("http://example.com:80/", "http://example.com"),
      ("http://example.com:8080/x", "http://example.com:8080/x"), // non-default port kept
      ("https://example.com/a?ref=zz&fbclid=123&gclid=4", "https://example.com/a"),
      ("https://example.com", "https://example.com"),
      ("https://www.example.com/a?b=2&utm_medium=m&c=3", "https://example.com/a?b=2&c=3")
    )
    val out = cases.map(_._1).toDF("url")
      .select(UrlOps.normalized(col("url")).as("n")).as[String].collect()
    out.zip(cases.map(_._2)).foreach { case (got, want) => assert(got == want) }
  }

  test("url host: lowercased, www-stripped") {
    val h = Seq("HTTPS://WWW.Example.COM:443/x").toDF("url")
      .select(UrlOps.host(col("url"))).as[String].head()
    assert(h == "example.com")
  }

  test("exact quantiles match the inverse-CDF definition, per key") {
    // key a: 1..10 -> p05 = ceil(0.5)-1 = idx 0 -> 1; p50 = idx ceil(5)-1=4 -> 5;
    //   p95 = idx ceil(9.5)-1 = 9 -> 10 (the quantile_disc distinguishing case)
    // key b: duplicates collapse into the distribution correctly
    val rows = (1 to 10).map(v => ("a", v.toLong)) ++
      Seq(("b", 10L), ("b", 10L), ("b", 10L), ("b", 40L))
    val out = Quantiles.exactQuantiles(rows.toDF("k", "v"), "k", "v",
      Seq("p05" -> 0.05, "p50" -> 0.5, "p95" -> 0.95))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("a") == ((1L, 5L, 10L)))
    assert(out("b") == ((10L, 10L, 40L))) // idx 0, idx ceil(2)-1=1, idx ceil(3.8)-1=3
  }

  test("text normalization: NFC + control strip + whitespace collapse") {
    // decomposed accent (o + U+0301) and a BEL control in the input
    val messy = "  Wo\u0301rd\u0007\t two  \r\n\r\n\r\n\r\n last  "
    val out = Seq(messy).toDF("t").select(TextNorm.clean(col("t"))).as[String].head()
    assert(out == "W\u00f3rd two\n\nlast") // composed single-codepoint accent
    // structure preserved: single newlines and paragraph breaks survive
    val kept = Seq("a\nb\n\nc").toDF("t")
      .select(TextNorm.cleanWhitespace(col("t"))).as[String].head()
    assert(kept == "a\nb\n\nc")
    // idempotent: cleaning clean text changes nothing
    val twice = Seq(out).toDF("t").select(TextNorm.clean(col("t"))).as[String].head()
    assert(twice == out)
  }

  test("dedupLines keeps first occurrences in order; custom separator; idempotent") {
    val page = "nav\nbody one\nnav\nbody two\nnav\nfooter\nfooter"
    val out = Seq(page).toDF("t").select(TextNorm.dedupLines(col("t"))).as[String].head()
    assert(out == "nav\nbody one\nbody two\nfooter")
    val again = Seq(out).toDF("t").select(TextNorm.dedupLines(col("t"))).as[String].head()
    assert(again == out)
    // separator is quoted literally (a '.' separator must not go regex-wild)
    val dotted = Seq("a.b.a.c").toDF("t")
      .select(TextNorm.dedupLines(col("t"), ".")).as[String].head()
    assert(dotted == "a.b.c")
    // single line, no separator: unchanged
    val one = Seq("solo").toDF("t").select(TextNorm.dedupLines(col("t"))).as[String].head()
    assert(one == "solo")
  }

  test("rollup stats: one pass yields leaf, per-source and grand-total rows") {
    val docs = Seq(("s0", "en", 10L), ("s0", "en", 20L), ("s0", "de", 5L), ("s1", "en", 7L))
      .toDF("source", "lang", "n_chars")
    val out = docs.rollup(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("c"))
      .select(coalesce(col("source"), lit("ALL")).as("source"),
        coalesce(col("lang"), lit("ALL")).as("lang"), col("n"), col("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(("s0", "en")) == (2L, 30L))
    assert(out(("s0", "ALL")) == (3L, 35L))
    assert(out(("s1", "ALL")) == (1L, 7L))
    assert(out(("ALL", "ALL")) == (4L, 42L))
  }

  test("bpe pair counts: adjacent two-char windows inside tokens only") {
    val df = Seq("ab abc!xy").toDF("text")
    val pairs = df
      .select(explode(graft.search.Bm25.tokens(col("text"))).as("w"))
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // tokens: "ab", "abc", "xy" (len>1); pairs: ab(×2), bc, xy — never b↔x across the '!'
    assert(pairs == Map("ab" -> 2L, "bc" -> 1L, "xy" -> 1L))
  }

  test("compaction bins: running-sum-before packing, per-partition restart") {
    import org.apache.spark.sql.expressions.Window
    val files = Seq(("a", 1L, 60L), ("a", 2L, 50L), ("a", 3L, 10L), ("b", 4L, 250L))
      .toDF("source", "doc_id", "n_chars")
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bins = files
      .withColumn("bin", floor(coalesce(sum(col("n_chars")).over(w), lit(0L)) / lit(100)))
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // source a, target 100: before = 0, 60, 110 -> bins 0, 0, 1; b restarts at 0
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
  }

  test("weighted keep is deterministic and tracks the target fraction") {
    val df = (0L until 4000L).toDF("id")
    val kept = df.filter(Splits.weightedKeep(col("id"), lit(2500))).count()
    // 25% target; hash is uniform-ish, allow generous tolerance
    assert(kept > 800 && kept < 1200, s"kept=$kept of 4000 at 25%")
    val kept2 = df.filter(Splits.weightedKeep(col("id"), lit(2500))).count()
    assert(kept == kept2) // no RNG: identical on re-run
    assert(df.filter(Splits.weightedKeep(col("id"), lit(10000))).count() == 4000)
    assert(df.filter(Splits.weightedKeep(col("id"), lit(0))).count() == 0)
  }
}
