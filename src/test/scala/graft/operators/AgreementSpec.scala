package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AgreementSpec extends SparkSpec {
  import spark.implicits._

  test("mcnemar: b=15, c=5 gives chi2=5 and the A-S two-sided p") {
    // 20 both-ok, 15 a-only, 5 b-only, 10 both-wrong
    val rows = Seq.fill(20)((true, true)) ++ Seq.fill(15)((true, false)) ++
      Seq.fill(5)((false, true)) ++ Seq.fill(10)((false, false))
    val r = Agreement.mcnemar(rows.toDF("a", "b"), col("a"), col("b"))
      .collect().head
    assert(r.getAs[Long]("n") == 50L)
    assert(r.getAs[Long]("a_only") == 15L && r.getAs[Long]("b_only") == 5L)
    assert(r.getAs[Double]("chi2") == 5.0)
    // chi2(1) upper tail at 5.0 is 0.02535; A-S error < 7.5e-8
    assert(math.abs(r.getAs[Double]("p") - 0.025347) < 1e-4, r.getAs[Double]("p"))
  }

  test("mcnemar: no discordant pairs degenerates to chi2=0, p=1") {
    val rows = Seq.fill(30)((true, true)) ++ Seq.fill(10)((false, false))
    val r = Agreement.mcnemar(rows.toDF("a", "b"), col("a"), col("b"))
      .collect().head
    assert(r.getAs[Double]("chi2") == 0.0 && r.getAs[Double]("p") == 1.0)
  }

  test("cohen kappa: perfect agreement is 1, independence is ~0") {
    val perfect = Seq.fill(25)((true, true)) ++ Seq.fill(25)((false, false))
    val r1 = Agreement.cohenKappa(perfect.toDF("a", "b"), col("a"), col("b"))
      .collect().head
    assert(r1.getAs[Double]("kappa") == 1.0)
    // 2x2 independence: cells exactly proportional to the marginals
    val indep = Seq.fill(16)((true, true)) ++ Seq.fill(4)((true, false)) ++
      Seq.fill(64)((false, true)) ++ Seq.fill(16)((false, false))
    val r2 = Agreement.cohenKappa(indep.toDF("a", "b"), col("a"), col("b"))
      .collect().head
    assert(r2.getAs[Double]("kappa") == 0.0, r2.getAs[Double]("kappa"))
  }

  test("fleiss kappa: unanimous raters give 1; hand-checked mixed case") {
    // 10 items, 3 raters, all unanimous (6 en, 4 other)
    val unanimous =
      (1 to 6).flatMap(i => Seq((i.toLong, "en", 3L), (i.toLong, "other", 0L))) ++
        (7 to 10).flatMap(i => Seq((i.toLong, "en", 0L), (i.toLong, "other", 3L)))
    val r1 = Agreement.fleissKappa(unanimous.toDF("item", "category", "cnt"),
      "item", "category", "cnt", 3L).collect().head
    assert(r1.getAs[Double]("p_bar") == 1.0)
    assert(r1.getAs[Double]("kappa") == 1.0)
    // 2 items split 2-1: P̄ = (Σn²−nr)/(nr(r−1)) = (10−6)/12 = 1/3
    val mixed = Seq((1L, "en", 2L), (1L, "other", 1L),
      (2L, "en", 1L), (2L, "other", 2L))
    val r2 = Agreement.fleissKappa(mixed.toDF("item", "category", "cnt"),
      "item", "category", "cnt", 3L).collect().head
    assert(math.abs(r2.getAs[Double]("p_bar") - 1.0 / 3) < 1e-6)
    // c_en = c_other = 3 -> P̄e = (9+9)/36 = 0.5; κ = (1/3−1/2)/(1/2) = −1/3
    assert(math.abs(r2.getAs[Double]("kappa") + 1.0 / 3) < 1e-5)
  }

  test("cochran q: hand-computed 4 subjects x 3 conditions") {
    // rows R = (2,1,3,1), cols T = (3,3,1):
    // Q = (k-1)(k·ΣT² - (ΣT)²)/(k·ΣR - ΣR²) = 2(57-49)/(21-15) = 8/3
    val d = Seq(
      ("u1", "a", 1L), ("u1", "b", 1L), ("u1", "c", 0L),
      ("u2", "a", 1L), ("u2", "b", 0L), ("u2", "c", 0L),
      ("u3", "a", 1L), ("u3", "b", 1L), ("u3", "c", 1L),
      ("u4", "a", 0L), ("u4", "b", 1L), ("u4", "c", 0L))
    val r = Agreement.cochranQ(d.toDF("u", "c", "h"), "u", "c", "h")
      .collect().head
    assert(r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("n_subjects") == 4L)
    assert(r.getAs[Long]("dof") == 2L)
    assert(r.getAs[Double]("q_stat") == 2.666667)
  }

  test("krippendorff alpha: hand-computed with VARIABLE raters per item") {
    // i1 (m=3): a,a,b ; i2 (m=2): b,b
    // do_num = (2·1 + 1·2)/2 = 2 ; n_tot = 5, n_a = 2, n_b = 3
    // de_num = 2·3 + 3·2 = 12 ; α = 1 − 2·4/12 = 1/3
    val counts = Seq(
      ("i1", "a", 2L), ("i1", "b", 1L),
      ("i2", "b", 2L))
    val r = Agreement.krippendorffAlpha(counts.toDF("item", "cat", "cnt"),
      "item", "cat", "cnt").collect().head
    assert(r.getAs[Long]("n_items") == 2L)
    assert(r.getAs[Long]("n_tot") == 5L)
    assert(r.getAs[Double]("alpha") == 0.333333)
  }

  test("krippendorff alpha: perfect agreement = 1; unanimity category → NULL") {
    val perfect = Seq(("i1", "a", 2L), ("i2", "b", 2L))
    val r1 = Agreement.krippendorffAlpha(perfect.toDF("item", "cat", "cnt"),
      "item", "cat", "cnt").collect().head
    assert(r1.getAs[Double]("alpha") == 1.0)
    val unanimous = Seq(("i1", "a", 2L), ("i2", "a", 3L))
    val r2 = Agreement.krippendorffAlpha(unanimous.toDF("item", "cat", "cnt"),
      "item", "cat", "cnt").collect().head
    assert(r2.isNullAt(r2.fieldIndex("alpha")))
  }

  test("krippendorff alpha: single-rater items drop out as unpairable") {
    val counts = Seq(
      ("i1", "a", 2L), ("i2", "b", 2L), // pairable, perfect
      ("i3", "a", 1L)) // one rater — must not affect anything
    val r = Agreement.krippendorffAlpha(counts.toDF("item", "cat", "cnt"),
      "item", "cat", "cnt").collect().head
    assert(r.getAs[Long]("n_items") == 2L)
    assert(r.getAs[Long]("n_tot") == 4L)
    assert(r.getAs[Double]("alpha") == 1.0)
  }

  test("cochran q: all-constant subjects yield NULL, not a divide error") {
    val d = Seq(
      ("u1", "a", 1L), ("u1", "b", 1L),
      ("u2", "a", 0L), ("u2", "b", 0L))
    val r = Agreement.cochranQ(d.toDF("u", "c", "h"), "u", "c", "h")
      .collect().head
    assert(r.isNullAt(r.fieldIndex("q_stat")))
  }
}
