package graft.operators

import graft.SparkSpec

class ContingencySpec extends SparkSpec {
  import spark.implicits._

  test("independent margins give chi2 = 0 exactly") {
    // perfectly proportional 2x2: (a,0)=10 (a,1)=20 (b,0)=30 (b,1)=60
    val rows = Seq.fill(10)(("a", 0)) ++ Seq.fill(20)(("a", 1)) ++
      Seq.fill(30)(("b", 0)) ++ Seq.fill(60)(("b", 1))
    val r = Contingency.chiSquare(rows.toDF("r", "c"), "r", "c").collect().head
    assert(r.getAs[Double]("chi2") == 0.0)
    assert(r.getAs[Double]("cramers_v") == 0.0)
    assert(r.getAs[Long]("dof") == 1L)
    assert(r.getAs[Long]("n") == 120L)
  }

  test("perfect association maxes Cramér's V at 1") {
    val rows = Seq.fill(25)(("a", 0)) ++ Seq.fill(25)(("b", 1))
    val r = Contingency.chiSquare(rows.toDF("r", "c"), "r", "c").collect().head
    assert(r.getAs[Double]("cramers_v") == 1.0)
    // 2x2 full separation: chi2 = N
    assert(r.getAs[Double]("chi2") == 50.0)
  }

  test("hand-computed 2x2: chi2 matches the textbook formula") {
    // cells: 10, 20 / 20, 10 -> chi2 = N(ad-bc)^2 / (r1 r2 c1 c2)
    val rows = Seq.fill(10)(("x", 0)) ++ Seq.fill(20)(("x", 1)) ++
      Seq.fill(20)(("y", 0)) ++ Seq.fill(10)(("y", 1))
    val r = Contingency.chiSquare(rows.toDF("r", "c"), "r", "c").collect().head
    val expected = 60.0 * math.pow(10 * 10 - 20 * 20, 2) / (30.0 * 30 * 30 * 30)
    assert(math.abs(r.getAs[Double]("chi2") - expected) < 1e-4)
  }

  test("degenerate single-column table yields NULL statistics, zero dof") {
    val rows = Seq.fill(10)(("a", 1)) ++ Seq.fill(5)(("b", 1))
    val r = Contingency.chiSquare(rows.toDF("r", "c"), "r", "c").collect().head
    assert(r.getAs[Long]("dof") == 0L)
    assert(r.isNullAt(r.fieldIndex("cramers_v")))
    // chi2 must be NULL too — a "0.0" would read as tested-and-passed
    assert(r.isNullAt(r.fieldIndex("chi2")))
  }

  test("Mantel-Haenszel recovers a common odds ratio across unbalanced strata") {
    // both strata have true OR = 6 (a·d/(b·c)) with very different sizes
    def stratum(s: Long, scale: Int) =
      Seq.fill(30 * scale)((s, 1L, 1L)) ++ Seq.fill(10 * scale)((s, 1L, 0L)) ++
        Seq.fill(20 * scale)((s, 0L, 1L)) ++ Seq.fill(40 * scale)((s, 0L, 0L))
    val df = (stratum(1L, 1) ++ stratum(2L, 5)).toDF("st", "x", "y")
    val rows = Contingency.mantelHaenszel(df, "st", "x", "y").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Double]("or_stratum") == 6.0)
      assert(r.getAs[Double]("or_mh") == 6.0)
    }
  }

  test("MH handles a zero-denominator stratum set with NULL, not an error") {
    // b = 0 everywhere → pooled denominator 0 → NULL pooled OR
    val df = Seq((1L, 1L, 1L), (1L, 0L, 0L), (1L, 0L, 1L)).toDF("st", "x", "y")
    val r = Contingency.mantelHaenszel(df, "st", "x", "y").collect().head
    assert(r.isNullAt(r.fieldIndex("or_mh")))
    assert(r.isNullAt(r.fieldIndex("or_stratum")))
  }

  test("fisher exact: the tea-tasting 2x2 gives p = 34/70") {
    // margins 4/4 of 8, a_obs = 3: P(a) = C(4,a)C(4,4-a)/C(8,4) over a in
    // 0..4 = (1,16,36,16,1)/70; two-sided tail {0,1,3,4} = 34/70
    val rows = Seq.fill(3)((1L, 1L)) ++ Seq.fill(1)((1L, 0L)) ++
      Seq.fill(1)((0L, 1L)) ++ Seq.fill(3)((0L, 0L))
    val r = Contingency.fisherExact(rows.toDF("x", "y"), "x", "y")
      .collect().head
    assert(r.getAs[Long]("n") == 8L && r.getAs[Long]("a") == 3L)
    assert(r.getAs[Double]("p_two_sided") == 0.485714)
    assert(r.getAs[Double]("odds_ratio") == 9.0)
  }

  test("fisher exact: extreme table p equals its own point mass; zero cell → NULL OR") {
    // a_obs = hi = 4 (complete separation on the small margin):
    // two-sided tail = P(4) + P(0) = 2/70
    val rows = Seq.fill(4)((1L, 1L)) ++ Seq.fill(4)((0L, 0L))
    val r = Contingency.fisherExact(rows.toDF("x", "y"), "x", "y")
      .collect().head
    assert(r.getAs[Double]("p_two_sided") == 0.028571)
    assert(r.isNullAt(r.fieldIndex("odds_ratio")))
  }

  test("e-value: textbook RR = 2 gives E = 2 + sqrt(2)") {
    // exposed: 20/100 hit; unexposed: 10/100 → RR = 2
    val rows = Seq.fill(20)((1L, 1L)) ++ Seq.fill(80)((1L, 0L)) ++
      Seq.fill(10)((0L, 1L)) ++ Seq.fill(90)((0L, 0L))
    val r = Contingency.eValue(rows.toDF("x", "y"), "x", "y").collect().head
    assert(r.getAs[Double]("rr") == 2.0)
    assert(r.getAs[Double]("e_value") ==
      BigDecimal(2.0 + math.sqrt(2.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // CI crosses 1 here → the bound-side E collapses to 1
    assert(r.getAs[Double]("rr_lo") < 1.0)
    assert(r.getAs[Double]("e_value_ci") == 1.0)
  }

  test("e-value: protective RR mirrors through 1/RR; empty cells NULL") {
    val rows = Seq.fill(10)((1L, 1L)) ++ Seq.fill(90)((1L, 0L)) ++
      Seq.fill(20)((0L, 1L)) ++ Seq.fill(80)((0L, 0L))
    val r = Contingency.eValue(rows.toDF("x", "y"), "x", "y").collect().head
    assert(r.getAs[Double]("rr") == 0.5)
    // RR* = 2 → same E as the harmful direction
    assert(r.getAs[Double]("e_value") ==
      BigDecimal(2.0 + math.sqrt(2.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val zero = Seq.fill(5)((1L, 0L)) ++ Seq.fill(5)((0L, 1L))
    val rz = Contingency.eValue(zero.toDF("x", "y"), "x", "y").collect().head
    assert(rz.isNullAt(rz.fieldIndex("e_value")))
  }

  test("fisher exact: independent-ish table is replay-stable across partitionings") {
    val rows = (1L to 200L).map(i => (i % 3 min 1, (i * 7) % 5 min 1))
    val runs = (1 to 3).map { i =>
      Contingency.fisherExact(rows.toDF("x", "y").repartition(i * 3), "x", "y")
        .collect().head.toSeq
    }
    assert(runs.distinct.size == 1)
  }
}
