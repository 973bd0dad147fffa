package graft.functions

import graft.SparkSpec

class BenfordSpec extends SparkSpec {
  import spark.implicits._

  test("first digit is extracted from the integer rendering, not float log10") {
    val df = Seq(("g", 1.0), ("g", 9.99), ("g", 1000.0), ("g", 999.9999),
      ("g", 123456.78)).toDF("grp", "v")
    val rows = Benford.digitAudit(df, "grp", "v").collect()
      .map(r => r.getAs[Int]("digit") -> r.getAs[Long]("obs")).toMap
    // 1.0 -> 1, 9.99 -> 9, 1000.0 -> 1, 999.9999 floors to 999 -> 9, 123456 -> 1
    assert(rows.filter(_._2 > 0) == Map(1 -> 3L, 9 -> 2L))
    // the dense grid always carries all 9 digits
    assert(rows.keySet == (1 to 9).toSet)
  }

  test("values below 1 are excluded; groups are independent") {
    val df = Seq(("a", 0.5), ("a", 0.0), ("a", 25.0), ("b", 31.0))
      .toDF("grp", "v")
    val rows = Benford.digitAudit(df, "grp", "v").collect()
      .filter(_.getAs[Long]("obs") > 0)
    assert(rows.length == 2)
    val byGrp = rows.map(r => (r.getString(0), r.getAs[Int]("digit"))).toSet
    assert(byGrp == Set(("a", 2), ("b", 3)))
    // single-digit group: observed share is exactly 1
    assert(rows.forall(_.getAs[Double]("share_obs") == 1.0))
  }

  test("unobserved digits still contribute their expected mass to chi-square") {
    // prices capped below 9000: digit 9 never occurs, but its (0-np)^2/np
    // = np term must appear — a truncated distribution is exactly what
    // the audit exists to flag
    val df = (1 to 800).map(i => ("t", (i % 8 + 1) * 1000.0)).toDF("grp", "v")
    val rows = Benford.digitAudit(df, "grp", "v").collect()
    assert(rows.length == 9, s"expected all 9 digits, got ${rows.length}")
    val nine = rows.find(_.getAs[Int]("digit") == 9).get
    assert(nine.getAs[Long]("obs") == 0L)
    // chi2_part for the structural zero = n * log10(1 + 1/9)
    val expected = 800.0 * math.log10(1.0 + 1.0 / 9)
    assert(math.abs(nine.getAs[Double]("chi2_part") - expected) < 1e-3,
      s"zero-digit part ${nine.getAs[Double]("chi2_part")} vs $expected")
  }

  test("a Benford-distributed sample yields a small chi-square; uniform digits a large one") {
    // build counts proportional to Benford by repeating values
    val benford = (1 to 9).flatMap { d =>
      val n = math.round(1000 * math.log10(1.0 + 1.0 / d)).toInt
      Seq.fill(n)(("b", d * 10.0 + 1))
    }
    val uniform = (1 to 9).flatMap(d => Seq.fill(111)(("u", d * 10.0 + 1)))
    val out = Benford.digitAudit((benford ++ uniform).toDF("grp", "v"), "grp", "v")
    val chi = out.collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getAs[Double]("chi2_part")).sum).toMap
    assert(chi("b") < 1.0, s"near-Benford chi2 ${chi("b")}")
    // uniform digits: chi2 >> critical value (15.5 at 8 df, 5%)
    assert(chi("u") > 100.0, s"uniform chi2 ${chi("u")}")
  }
}
