package graft.core

import graft.SparkSpec
import graft.operators.{Contingency, Inequality, KSample, RobustLocation}
import org.apache.spark.sql.functions._

/** The bounded-grid caller contract, enforced (VERDICT r11 task 4): a
  * continuous / high-cardinality column fed to the distinct-value-grid
  * family must FAIL FAST with a clear message, not silently build a
  * corpus-sized single-partition sort.
  */
class GridGuardSpec extends SparkSpec {
  import spark.implicits._

  // 70k distinct longs — above MaxGrid (65 536); the shape a caller gets
  // by passing e.g. raw microsecond timestamps or un-binned byte sizes
  private def hiCard = spark.range(70000L)
    .select((col("id") % 2).as("side"), col("id").as("v"))

  private def expectGuard(body: => Any): String = {
    val e = intercept[IllegalArgumentException](body)
    assert(e.getMessage.contains("bounded-grid contract")
      || e.getMessage.contains("distinct values"),
      s"guard message should explain the contract: ${e.getMessage}")
    e.getMessage
  }

  test("ksTwoSample rejects a >MaxGrid value grid with a binning hint") {
    val msg = expectGuard(KSample.ksTwoSample(hiCard, "side", "v"))
    assert(msg.contains("ksTwoSample") && msg.contains("Bin"))
  }

  test("kruskalWallis / cramerVonMises / varghaDelaney / ansariBradley reject too") {
    expectGuard(KSample.kruskalWallis(hiCard.withColumnRenamed("side", "g"), "g", "v"))
    expectGuard(KSample.cramerVonMises(hiCard, "side", "v"))
    expectGuard(KSample.varghaDelaney(hiCard, "side", "v"))
    expectGuard(KSample.ansariBradley(hiCard, "side", "v"))
  }

  test("anovaF / brownForsythe reject a >MaxGrid GROUP grid") {
    // 70k distinct groups — e.g. grouping by document id instead of source
    val g = spark.range(70000L).select(col("id").as("g"), (col("id") % 7).as("v"))
    expectGuard(KSample.anovaF(g, "g", "v"))
    expectGuard(KSample.brownForsythe(g, "g", "v"))
  }

  test("hodgesLehmann rejects when ONE side exceeds MaxPairSide (4096)") {
    // side 1 is small; side 0 carries 5k distinct values — the pair grid
    // would be fine by MaxGrid but the cross-join side cap still fires
    val d = spark.range(5000L)
      .select(lit(0L).as("side"), col("id").as("v"))
      .union(Seq((1L, 1L), (1L, 2L)).toDF("side", "v"))
    val msg = expectGuard(KSample.hodgesLehmann(d, "side", "v"))
    assert(msg.contains("hodgesLehmann"))
  }

  test("hodgesLehmann under the cap still computes (boundary sanity)") {
    val d = spark.range(100L).select((col("id") % 2).as("side"),
      (col("id") % 50).as("v"))
    assert(KSample.hodgesLehmann(d, "side", "v").count() == 1L)
  }

  test("RobustLocation.panel and Inequality.panel reject a >MaxGrid (g,v) grid") {
    val d = spark.range(70000L).select(lit("s1").as("g"), col("id").as("v"))
    expectGuard(RobustLocation.panel(d, "g", "v", 5))
    expectGuard(Inequality.panel(d.filter(col("v") > 0), "g", "v"))
  }

  test("fisherExact raises in-plan when the support width exceeds MaxGrid") {
    // margins r1 = c1 = 70k on n = 140k: support = [0, 70000], width > MaxGrid.
    // The guard is in-plan (raise_error) so it fires at EXECUTION —
    // intercept the Spark runtime error and check the message survived.
    val d = spark.range(140000L).select(
      (col("id") < 70000L).cast("long").as("x"),
      (col("id") % 2).as("y"))
    val e = intercept[Throwable] {
      Contingency.fisherExact(d, "x", "y").collect()
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: chain(x.getCause))
    assert(chain(e).exists(m => m != null && m.contains("bounded-grid contract")),
      s"expected the fisherExact guard message, got: ${chain(e).mkString(" | ")}")
  }

  test("the green-gate regime passes untouched: small value grid computes") {
    val d = spark.range(10000L).select((col("id") % 2).as("side"),
      (col("id") % 97).as("v"))
    assert(KSample.ksTwoSample(d, "side", "v").count() == 1L)
    assert(KSample.cramerVonMises(d, "side", "v").count() == 1L)
    val f = spark.range(200L).select((col("id") % 2).as("x"), (col("id") % 3 === 0).cast("long").as("y"))
    assert(Contingency.fisherExact(f, "x", "y").count() == 1L)
  }
}
