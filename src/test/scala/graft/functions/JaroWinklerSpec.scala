package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.{JaroWinklerImpl, JaroWinklerSim}

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  test("kernel matches the published worked examples") {
    // Winkler's canonical pairs
    assert(math.abs(JaroWinklerImpl.compute("martha", "marhta") - 0.961111) < 1e-6)
    assert(math.abs(JaroWinklerImpl.compute("dixon", "dicksonx") - 0.813333) < 1e-6)
    assert(math.abs(JaroWinklerImpl.compute("duane", "dwayne") - 0.84) < 1e-6)
    assert(JaroWinklerImpl.compute("abc", "abc") == 1.0)
    assert(JaroWinklerImpl.compute("", "abc") == 0.0)
    assert(JaroWinklerImpl.compute("cat", "dog") == 0.0)
    // adjacent transposition outside the match window: no matches at all
    assert(JaroWinklerImpl.compute("ab", "ba") == 0.0)
  }

  test("prefix boost only fires above the 0.7 jaro threshold") {
    // shared 2-char prefix but low jaro (2 matches of 8/18 chars):
    // raw jaro = (2/8 + 2/18 + 1)/3 ≈ 0.453704 — the boost must NOT
    // have been added (boosted would be ≈ 0.563)
    val lowJaro = JaroWinklerImpl.compute("abcdefgh", "abzzzzzzzzzzzzzzzz")
    assert(math.abs(lowJaro - (2.0 / 8 + 2.0 / 18 + 1.0) / 3) < 1e-9)
    // high-jaro pair with a 4-char shared prefix scores above its
    // unprefixed rotation (same chars, boost gone)
    assert(JaroWinklerImpl.compute("prefixed", "prefixes") >
      JaroWinklerImpl.compute("edprefix", "esprefix"))
  }

  test("expression evaluates inside codegen and matches the kernel") {
    val pairs = Seq(("martha", "marhta"), ("small ring", "small case"),
      ("red widget", "red widgets"), ("", ""), ("x", "y"))
    val df = pairs.toDF("a", "b")
      .select(col("a"), col("b"), JaroWinklerSim.asColumn(col("a"), col("b")).as("jw"))
    df.collect().foreach { r =>
      val expected = JaroWinklerImpl.compute(r.getString(0), r.getString(1))
      assert(r.getDouble(2) == expected, s"${r.getString(0)}/${r.getString(1)}")
    }
  }

  test("symmetry and range on fuzzed-ish inputs") {
    val words = Seq("alpha", "alphabet", "alpine", "beta", "betamax", "b",
      "", "gamma", "gamm", "gam", "delta", "dleta", "adelt")
    for (a <- words; b <- words) {
      val ab = JaroWinklerImpl.compute(a, b)
      val ba = JaroWinklerImpl.compute(b, a)
      assert(math.abs(ab - ba) < 1e-12, s"asymmetric: $a/$b $ab vs $ba")
      assert(ab >= 0.0 && ab <= 1.0, s"out of range: $a/$b -> $ab")
      if (a == b && a.nonEmpty) assert(ab == 1.0)
    }
  }
}
