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
    assert(rows == Map(1 -> 3L, 9 -> 2L))
  }

  test("values below 1 are excluded; groups are independent") {
    val df = Seq(("a", 0.5), ("a", 0.0), ("a", 25.0), ("b", 31.0))
      .toDF("grp", "v")
    val rows = Benford.digitAudit(df, "grp", "v").collect()
    assert(rows.length == 2)
    val byGrp = rows.map(r => (r.getString(0), r.getAs[Int]("digit"))).toSet
    assert(byGrp == Set(("a", 2), ("b", 3)))
    // single-digit group: observed share is exactly 1
    assert(rows.forall(_.getAs[Double]("share_obs") == 1.0))
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
