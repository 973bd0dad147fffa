package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CupedJackknifeSpec extends SparkSpec {
  import spark.implicits._

  test("cuped: y = x exactly gives theta 1 and full variance reduction") {
    val rows = (1L to 50L).map(i => (i, i))
    val r = Cuped.adjustmentStats(rows.toDF("x", "y"), "x", "y").collect().head
    assert(r.getAs[Double]("theta") == 1.0)
    assert(r.getAs[Double]("rho2") == 1.0)
  }

  test("cuped: independent covariate gives rho2 ~ 0, constant x gives NULL") {
    val indep = (1L to 100L).map(i => (i % 4, (i * 37) % 11))
    val r1 = Cuped.adjustmentStats(indep.toDF("x", "y"), "x", "y").collect().head
    assert(math.abs(r1.getAs[Double]("rho2")) < 0.05)
    val const = (1L to 10L).map(i => (7L, i))
    val r2 = Cuped.adjustmentStats(const.toDF("x", "y"), "x", "y").collect().head
    assert(r2.isNullAt(r2.fieldIndex("theta")))
    assert(r2.isNullAt(r2.fieldIndex("rho2")))
  }

  test("cuped: known slope recovers theta = cov/var") {
    // y = 3x + deterministic residual
    val rows = (1L to 40L).map(i => (i, 3 * i + (i % 5)))
    val r = Cuped.adjustmentStats(rows.toDF("x", "y"), "x", "y").collect().head
    assert(math.abs(r.getAs[Double]("theta") - 3.0) < 0.05)
    assert(r.getAs[Double]("rho2") > 0.99)
  }

  test("jackknife: a skewing group shows the largest influence") {
    // groups a/b balanced 50% hit; group c all-hit drags theta up
    val rows = (1 to 40).map(i => ("a", i % 2 == 0)) ++
      (1 to 40).map(i => ("b", i % 2 == 1)) ++
      (1 to 20).map(_ => ("c", true))
    val out = Jackknife.deleteOneGroup(rows.toDF("g", "hit"), "g", col("hit"))
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Double]("theta_del"), r.getAs[Double]("influence"))).toMap
    // theta = 60/100; dropping c -> 40/80 = 0.5
    assert(out("c")._1 == 0.5)
    assert(out("c")._2 == 0.1)
    assert(math.abs(out("a")._2) < math.abs(out("c")._2))
  }

  test("jackknife: single group degenerates to NULL delete-one estimate") {
    val rows = (1 to 10).map(i => ("only", i % 2 == 0))
    val r = Jackknife.deleteOneGroup(rows.toDF("g", "hit"), "g", col("hit"))
      .collect().head
    assert(r.isNullAt(r.fieldIndex("theta_del")))
  }
}
