package graft.operators

import graft.SparkSpec

class KSampleSpec extends SparkSpec {
  import spark.implicits._

  test("mood median: fully separated groups max the chi2 at N") {
    // a: 1..5, b: 11..15 → global type-7 median 8; full separation
    val d = ((1L to 5L).map(("a", _)) ++ (11L to 15L).map(("b", _)))
      .toDF("g", "v")
    val r = KSample.moodMedian(d, "g", "v").collect().head
    assert(r.getAs[Long]("groups") == 2L)
    assert(r.getAs[Double]("median") == 8.0)
    assert(r.getAs[Double]("chi2") == 10.0) // = N for a separated 2×2
    assert(r.getAs[Double]("cramers_v") == 1.0)
    assert(r.getAs[Long]("dof") == 1L)
  }

  test("mood median: identical groups give chi2 = 0") {
    val d = ((1L to 4L).map(("a", _)) ++ (1L to 4L).map(("b", _)))
      .toDF("g", "v")
    val r = KSample.moodMedian(d, "g", "v").collect().head
    assert(r.getAs[Double]("chi2") == 0.0)
  }

  test("cramer-von mises: hand-computed separated samples, T = 0.85") {
    // side0 = 1..5, side1 = 11..15: Σ t·gap² = 25·55 + 750 = 2125;
    // T = 2125/(10²·5·5) = 0.85 > 0.461 → reject
    val d = ((1L to 5L).map((0L, _)) ++ (11L to 15L).map((1L, _)))
      .toDF("side", "v")
    val r = KSample.cramerVonMises(d, "side", "v").collect().head
    assert(r.getAs[Long]("n1") == 5L && r.getAs[Long]("n2") == 5L)
    assert(r.getAs[Double]("t_cvm") == 0.85)
    assert(r.getAs[Boolean]("reject"))
  }

  test("hodges-lehmann: median of the 9 pairwise differences") {
    // 0:{1,2,3}, 1:{11,12,13} → diffs sorted 8,9,9,10,10,10,11,11,12
    val d = (Seq(1L, 2L, 3L).map((0L, _)) ++ Seq(11L, 12L, 13L).map((1L, _)))
      .toDF("side", "v")
    val r = KSample.hodgesLehmann(d, "side", "v").collect().head
    assert(r.getAs[Long]("n_pairs") == 9L)
    assert(r.getAs[Double]("hl_shift") == 10.0)
  }

  test("hodges-lehmann: even pair count averages the middle pair; zero pins") {
    val d = Seq((0L, 0L), (1L, 1L), (1L, 2L)).toDF("side", "v")
    val r = KSample.hodgesLehmann(d, "side", "v").collect().head
    assert(r.getAs[Double]("hl_shift") == 1.5)
    val sym = Seq((0L, 1L), (0L, 2L), (1L, 1L), (1L, 2L)).toDF("side", "v")
    val rs = KSample.hodgesLehmann(sym, "side", "v").collect().head
    val z = rs.getAs[Double]("hl_shift")
    assert(z == 0.0)
    assert(java.lang.Double.doubleToRawLongBits(z) == 0L, "shift must be +0.0")
  }

  test("vargha-delaney: separation gives A = 1, identity gives 0.5") {
    val sep = Seq((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L)).toDF("side", "v")
    val r = KSample.varghaDelaney(sep, "side", "v").collect().head
    assert(r.getAs[Double]("a12") == 1.0)
    assert(r.getAs[String]("magnitude") == "large")
    val same = Seq((0L, 1L), (0L, 2L), (1L, 1L), (1L, 2L)).toDF("side", "v")
    val r2 = KSample.varghaDelaney(same, "side", "v").collect().head
    assert(r2.getAs[Double]("a12") == 0.5)
    assert(r2.getAs[String]("magnitude") == "negligible")
  }

  test("ansari-bradley: hand-computed extremes-vs-middle, even N") {
    // side0 = {1,4} (the extremes), side1 = {2,3}: scores 1,2,2,1
    // AB = 2, E = 3, Var = 1/3 → z = -sqrt(3)
    val d = Seq((0L, 1L), (0L, 4L), (1L, 2L), (1L, 3L)).toDF("side", "v")
    val r = KSample.ansariBradley(d, "side", "v").collect().head
    assert(r.getAs[Double]("ab") == 2.0)
    assert(r.getAs[Double]("e_ab") == 3.0)
    assert(r.getAs[Double]("z") ==
      BigDecimal(-1.0 / math.sqrt(1.0 / 3))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // middle-heavy sample flips the sign
    val m = Seq((1L, 1L), (1L, 4L), (0L, 2L), (0L, 3L)).toDF("side", "v")
    val rm = KSample.ansariBradley(m, "side", "v").collect().head
    assert(rm.getAs[Double]("ab") == 4.0)
  }

  test("ansari-bradley: ties share mean scores; odd-N branch; zero pins") {
    // tie: side0 = {1,2}, side1 = {2,3} → scores 1, 2(mean), 2(mean), 1
    val t = Seq((0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L)).toDF("side", "v")
    val rt = KSample.ansariBradley(t, "side", "v").collect().head
    assert(rt.getAs[Double]("ab") == 3.0)
    val z = rt.getAs[Double]("z")
    assert(z == 0.0)
    assert(java.lang.Double.doubleToRawLongBits(z) == 0L, "z must be +0.0")
    // odd N: side0 = {1,3}, side1 = {2} → AB = 2, E = 8/3
    val o = Seq((0L, 1L), (0L, 3L), (1L, 2L)).toDF("side", "v")
    val ro = KSample.ansariBradley(o, "side", "v").collect().head
    assert(ro.getAs[Double]("ab") == 2.0)
    assert(ro.getAs[Double]("e_ab") == 2.666667)
  }

  test("cramer-von mises: identical samples give T = 0, no reject") {
    val d = ((1L to 4L).map((0L, _)) ++ (1L to 4L).map((1L, _)))
      .toDF("side", "v")
    val r = KSample.cramerVonMises(d, "side", "v").collect().head
    assert(r.getAs[Double]("t_cvm") == 0.0)
    assert(!r.getAs[Boolean]("reject"))
  }

  test("KS: identical samples give D = 0; disjoint samples give D = 1") {
    val same = (1L to 50L).flatMap(v => Seq((0L, v), (1L, v)))
    val r0 = KSample.ksTwoSample(same.toDF("side", "v"), "side", "v").collect().head
    assert(r0.getAs[Long]("d_num") == 0L)
    assert(r0.getAs[Double]("ks_d") == 0.0)
    assert(!r0.getAs[Boolean]("reject"))

    val disjoint = (1L to 30L).map(v => (0L, v)) ++ (100L to 129L).map(v => (1L, v))
    val r1 = KSample.ksTwoSample(disjoint.toDF("side", "v"), "side", "v").collect().head
    assert(r1.getAs[Double]("ks_d") == 1.0)
    assert(r1.getAs[Boolean]("reject"))
  }

  test("KS matches the hand EDF sup on a small case") {
    // side0: 1,2,3,4  side1: 3,4,5,6 → sup |F0-F1| = 0.5 at v=2..2 region
    val d = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L),
      (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L))
    val r = KSample.ksTwoSample(d.toDF("side", "v"), "side", "v").collect().head
    assert(r.getAs[Double]("ks_d") == 0.5)
  }

  test("Kruskal-Wallis: identical groups give H near 0; shifted groups a large H") {
    val same = (1L to 40L).flatMap(v => Seq(("a", v), ("b", v), ("c", v)))
    val h0 = KSample.kruskalWallis(same.toDF("g", "v"), "g", "v")
      .collect().head.getAs[Double]("h_tie_corrected")
    assert(math.abs(h0) < 1e-6, s"h=$h0")

    val shifted = (1L to 40L).map(v => ("a", v)) ++
      (101L to 140L).map(v => ("b", v)) ++ (201L to 240L).map(v => ("c", v))
    val h1 = KSample.kruskalWallis(shifted.toDF("g", "v"), "g", "v").collect().head
    assert(h1.getAs[Double]("h") > 100.0) // ≈ N-1 for fully separated groups
    assert(h1.getAs[Long]("n") == 120L && h1.getAs[Long]("groups") == 3L)
  }

  test("ANOVA F: textbook two-group case equals the squared t") {
    // groups {1,2,3}, {5,6,7}: F = t² = 24 exactly
    val d = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 5L), ("b", 6L), ("b", 7L))
    val r = KSample.anovaF(d.toDF("g", "v"), "g", "v").collect().head
    assert(r.getAs[Double]("f_stat") == 24.0)
    assert(r.getAs[Double]("eta_sq") == 0.857143) // 24/28
  }

  test("Brown-Forsythe: equal spreads give W near 0; unequal spreads a large W") {
    val equal = (1L to 20L).flatMap(v => Seq(("a", v), ("b", v + 100L)))
    val w0 = KSample.brownForsythe(equal.toDF("g", "v"), "g", "v")
      .collect().head.getAs[Double]("w_stat")
    assert(math.abs(w0) < 1e-6, s"w=$w0")

    val unequal = (1L to 20L).map(v => ("a", 50L + (v % 2))) ++ // tight
      (1L to 20L).map(v => ("b", v * 10L)) // wide
    val w1 = KSample.brownForsythe(unequal.toDF("g", "v"), "g", "v")
      .collect().head.getAs[Double]("w_stat")
    assert(w1 > 10.0, s"w=$w1")
  }

  test("all four statistics are replay-stable across partitionings") {
    val d = (1L to 200L).map(v => (s"g${v % 5}", (v * 7919L) % 97L))
    val runs = (1 to 3).map { i =>
      val df = d.toDF("g", "v").repartition(1 + i * 3)
      (KSample.ksTwoSample(df.selectExpr("CASE WHEN g = 'g0' THEN 0 ELSE 1 END AS s", "v"), "s", "v").collect().toSeq,
        KSample.kruskalWallis(df, "g", "v").collect().toSeq,
        KSample.brownForsythe(df, "g", "v").collect().toSeq,
        KSample.anovaF(df, "g", "v").collect().toSeq)
    }
    assert(runs.distinct.size == 1)
  }
}
