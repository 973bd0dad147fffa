package graft.operators

import graft.SparkSpec

class RankTestsSpec extends SparkSpec {
  import spark.implicits._

  private def mw(rows: Seq[(Int, Double)]) =
    RankTests.mannWhitney(rows.toDF("g", "v"), "g", "v").collect().head

  test("identical distributions: U centers at n0*n1/2, z near 0, effect 0.5") {
    val rows = (1 to 100).map(i => (i % 2, (i / 2).toDouble))
    val r = mw(rows)
    assert(r.getAs[Long]("n0") == 50L && r.getAs[Long]("n1") == 50L)
    assert(math.abs(r.getAs[Double]("effect") - 0.5) < 0.05)
    assert(math.abs(r.getAs[Double]("z")) < 1.0)
  }

  test("complete separation: effect 1.0 and a large positive z") {
    // group 1 strictly above group 0
    val rows = (1 to 40).map(i => (0, i.toDouble)) ++
      (1 to 40).map(i => (1, 1000.0 + i))
    val r = mw(rows)
    assert(r.getAs[Double]("effect") == 1.0)
    assert(r.getAs[Double]("z") > 5.0)
    // U1 = n0*n1 exactly at full separation
    assert(r.getAs[Double]("u1") == 1600.0)
  }

  test("ties get midranks: all-equal values give effect 0.5 exactly") {
    val rows = (1 to 30).map(i => (i % 2, 7.0))
    val r = mw(rows)
    assert(r.getAs[Double]("effect") == 0.5)
    // rank sum of group 1: 15 values at midrank 15.5
    assert(r.getAs[Double]("rank_sum_1") == 15 * 15.5)
  }

  test("direction: shifting group 1 down flips the z sign") {
    val up = mw((1 to 60).map(i => (i % 2, if (i % 2 == 1) 10.0 + i else i.toDouble)))
    val dn = mw((1 to 60).map(i => (i % 2, if (i % 2 == 1) i.toDouble - 10.0 else i.toDouble)))
    assert(up.getAs[Double]("z") > 0)
    assert(dn.getAs[Double]("z") < 0)
  }

  private def tau(rows: Seq[(String, Long, Long)]): Map[String, org.apache.spark.sql.Row] =
    RankTests.kendallTauB(rows.toDF("g", "xb", "yb"), "g")
      .collect().map(r => r.getString(0) -> r).toMap

  test("kendall tau-b: perfect monotone = +1, perfect reversal = -1") {
    val r = tau(
      (1L to 10L).map(i => ("up", i, i * 3)) ++
        (1L to 10L).map(i => ("down", i, 100 - i)))
    assert(r("up").getAs[Double]("tau_b") == 1.0)
    assert(r("down").getAs[Double]("tau_b") == -1.0)
    assert(r("up").getAs[Long]("concordant") == 45 &&
      r("up").getAs[Long]("discordant") == 0)
  }

  test("kendall tau-b: textbook tied example") {
    // x = (1,1,2,3), y = (1,2,2,3): C=4, D=0, n0=6, n1=1 (x-pair), n2=1
    // (y-pair) -> tau_b = 4/sqrt(25) = 0.8
    val r = tau(Seq(("g", 1L, 1L), ("g", 1L, 2L), ("g", 2L, 2L), ("g", 3L, 3L)))
    assert(r("g").getAs[Long]("concordant") == 4)
    assert(r("g").getAs[Long]("discordant") == 0)
    assert(r("g").getAs[Double]("tau_b") == 0.8)
  }

  test("kendall tau-b: degenerate all-tied axis yields NULL, not an error") {
    val r = tau(Seq(("g", 1L, 1L), ("g", 1L, 2L), ("g", 1L, 3L)))
    assert(r("g").isNullAt(r("g").fieldIndex("tau_b")))
  }

  private def rho(rows: Seq[(String, Long, Long)]) =
    RankTests.spearman(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap

  test("spearman: perfect monotone (even nonlinear) is rho=1; reversal is -1") {
    val up = (1L to 20L).map(i => ("u", i, i * i)) // nonlinear but monotone
    val dn = (1L to 20L).map(i => ("d", i, 100L - i))
    val r = rho(up ++ dn)
    assert(r("u").getAs[Double]("rho") == 1.0)
    assert(r("d").getAs[Double]("rho") == -1.0)
  }

  test("spearman: tied values use midranks (textbook value)") {
    // x: 1,2,3,4 ; y: 10,10,20,30 -> y midranks 1.5,1.5,3,4
    // rho = Pearson((1,2,3,4),(1.5,1.5,3,4)) = 0.9487 (2.25/sqrt(5*1.125*... )
    val r = rho(Seq(("g", 1L, 10L), ("g", 2L, 10L), ("g", 3L, 20L), ("g", 4L, 30L)))
    val v = r("g").getAs[Double]("rho")
    assert(math.abs(v - 0.948683) < 1e-6, s"got $v")
  }

  test("spearman: all-tied axis yields NULL, not an ANSI error") {
    val r = rho(Seq(("g", 1L, 5L), ("g", 2L, 5L), ("g", 3L, 5L)))
    assert(r("g").isNullAt(r("g").fieldIndex("rho")))
  }

  test("ordinal association: perfect concordance maxes every statistic") {
    val d = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L))
    val r = RankTests.ordinalAssociation(d.toDF("g", "xb", "yb"), "g")
      .collect().head
    assert(r.getAs[Long]("concordant") == 3L)
    assert(r.getAs[Long]("discordant") == 0L)
    assert(r.getAs[Double]("gamma") == 1.0)
    assert(r.getAs[Double]("somers_dyx") == 1.0)
    assert(r.getAs[Double]("somers_dxy") == 1.0)
    // tau_c = 2m(C-D)/(n²(m-1)) = 2·3·3/(9·2) = 1
    assert(r.getAs[Double]("tau_c") == 1.0)
  }

  test("ordinal association: balanced 2x2 grid zeroes to +0.0, not -0.0") {
    val d = Seq(("g", 1L, 1L), ("g", 1L, 2L), ("g", 2L, 1L), ("g", 2L, 2L))
    val r = RankTests.ordinalAssociation(d.toDF("g", "xb", "yb"), "g")
      .collect().head
    assert(r.getAs[Long]("concordant") == 1L)
    assert(r.getAs[Long]("discordant") == 1L)
    for (c <- Seq("gamma", "somers_dyx", "somers_dxy", "tau_c")) {
      val v = r.getAs[Double](c)
      assert(v == 0.0)
      assert(java.lang.Double.doubleToRawLongBits(v) == 0L,
        s"$c must be +0.0, not -0.0")
    }
  }

  test("chatterjee xi: perfect monotone dependence hits (n-2)/(n+1)") {
    val up = (1L to 10L).map(i => ("g", i, i, i))
    val dn = (1L to 10L).map(i => ("h", i, -i, i))
    val rows = RankTests.chatterjeeXi(
      (up ++ dn).toDF("g", "x", "y", "tb"), "g", "x", "y", "tb")
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("xi")).toMap
    // ξ_max for n=10 is (n−2)/(n+1) = 8/11; ξ ignores direction
    val expected = BigDecimal(1.0 - 10.0 * 9 / 330)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows("g") == expected)
    assert(rows("h") == expected)
  }

  test("chatterjee xi: constant y has no dependence question -> NULL") {
    val d = (1L to 6L).map(i => ("g", i, 5L, i))
    val r = RankTests.chatterjeeXi(d.toDF("g", "x", "y", "tb"),
      "g", "x", "y", "tb").collect().head
    assert(r.isNullAt(r.fieldIndex("xi")))
  }

  test("chatterjee xi: deterministic under the tie-break column") {
    // many tied x values — the tb ordering pins the walk
    val d = (1L to 40L).map(i => ("g", i % 5, (i * 7) % 11, i))
    val runs = (1 to 3).map { p =>
      RankTests.chatterjeeXi(d.toDF("g", "x", "y", "tb").repartition(p * 3),
        "g", "x", "y", "tb").collect().map(_.toSeq).toSeq
    }
    assert(runs.distinct.size == 1)
  }

  test("ordinal association: all-tied x axis NULLs somers_dyx only") {
    // xb constant: n0 = n1 → D_{Y|X} undefined; γ undefined too (C+D=0)
    val d = Seq(("g", 1L, 1L), ("g", 1L, 2L), ("g", 1L, 3L))
    val r = RankTests.ordinalAssociation(d.toDF("g", "xb", "yb"), "g")
      .collect().head
    assert(r.isNullAt(r.fieldIndex("somers_dyx")))
    assert(r.isNullAt(r.fieldIndex("gamma")))
    assert(r.isNullAt(r.fieldIndex("tau_c"))) // rx = 1 → m = 1
    assert(r.getAs[Double]("somers_dxy") == 0.0)
  }
}
