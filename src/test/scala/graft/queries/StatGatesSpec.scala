package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Statistical-invariant checks over the r9 stats/sketch gates (q210-
  * q213) at sf0.001 — the oracle proves cross-engine equality; these
  * prove the STATISTICS behave: bounds hold, estimates track exact
  * values, intervals contain their point estimates.
  */
class StatGatesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def rows(q: String) = SparkEntry.queries(q)(spark, dir).collect()

  test("q210: tau_b stays in [-1, 1] and the pair ledger adds up") {
    val rs = rows("q210_kendall_tau")
    assert(rs.nonEmpty)
    rs.foreach { r =>
      val t = r.getAs[Double]("tau_b")
      assert(t >= -1.0 && t <= 1.0, s"tau_b $t out of range")
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("concordant") + r.getAs[Long]("discordant")
        <= n * (n - 1) / 2)
    }
  }

  test("q211: HLL overlap estimates track the exact Jaccard") {
    val rs = rows("q211_hll_overlap")
    assert(rs.nonEmpty)
    rs.foreach { r =>
      val exactJ = r.getAs[Long]("n_exact_inter").toDouble /
        r.getAs[Long]("n_exact_union")
      val estJ = r.getAs[Double]("jaccard_est")
      // m=16 registers is a coarse sketch — the bound is loose but real;
      // a broken union/inclusion-exclusion lands far outside it
      assert(math.abs(estJ - exactJ) <= 0.35,
        f"pair ${r.getString(0)}/${r.getString(1)}: est $estJ%.3f vs exact $exactJ%.3f")
      assert(r.getAs[Double]("est_union") > 0)
    }
  }

  test("q212: Wilson intervals contain their point estimates, z is finite") {
    val r = rows("q212_prop_ztest").head
    assert(r.getAs[Double]("lo0") < r.getAs[Double]("p0"))
    assert(r.getAs[Double]("p0") < r.getAs[Double]("hi0"))
    assert(r.getAs[Double]("lo1") < r.getAs[Double]("p1"))
    assert(r.getAs[Double]("p1") < r.getAs[Double]("hi1"))
    assert(!r.isNullAt(r.fieldIndex("z")) && !r.getAs[Double]("z").isNaN)
    // Wilson never leaves [0, 1] — the property that beats the Wald CI
    Seq("lo0", "lo1").foreach(c => assert(r.getAs[Double](c) >= 0.0))
    Seq("hi0", "hi1").foreach(c => assert(r.getAs[Double](c) <= 1.0))
  }

  test("q213: JSD is bounded by ln 2 and nonnegative") {
    val rs = rows("q213_js_divergence")
    assert(rs.nonEmpty)
    rs.foreach { r =>
      val j = r.getAs[Double]("jsd")
      assert(j >= 0.0 && j <= math.log(2.0) + 1e-9,
        s"jsd $j outside [0, ln 2]")
      // both columns are independently 6dp-rounded -> up to ~1.5e-6 slack
      assert(math.abs(r.getAs[Double]("jsd_bits") - j / math.log(2.0)) < 2e-6)
    }
  }
}
