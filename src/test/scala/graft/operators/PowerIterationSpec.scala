package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PowerIterationSpec extends SparkSpec {
  import spark.implicits._

  test("recovers a planted dominant direction in 3 steps") {
    // vectors = t * u + small noise, u = (3,4)/5: covariance is (up to
    // noise) λ·uuᵀ, whose leading eigenvector is u itself
    val u = Array(0.6, 0.8)
    val data = (1 to 200).map { i =>
      val t = (i % 21 - 10).toDouble // mean-zero spread
      val n1 = ((i * 7) % 5 - 2) * 0.01
      val n2 = ((i * 11) % 5 - 2) * 0.01
      Tuple1(Array((t * u(0) + n1).toFloat, (t * u(1) + n2).toFloat))
    }
    val df = data.toDF("embedding")
    val out = PowerIteration.leadingComponent(spark, df, "embedding", iters = 3)
      .collect()
    assert(out.length == 2)
    val v = out.sortBy(_.getLong(0)).map(r => r.getDouble(r.fieldIndex("v")))
    assert(math.abs(v(0) - 0.6) < 0.01 && math.abs(v(1) - 0.8) < 0.01,
      s"got ${v.toSeq}")
    // unit norm and a positive dominant eigenvalue
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-6)
    assert(out.head.getDouble(out.head.fieldIndex("lambda")) > 1.0)
  }

  test("sign convention: dim-1 component is non-negative") {
    val data = (1 to 100).map { i =>
      val t = (i % 11 - 5).toDouble
      Tuple1(Array((-t).toFloat, (t * 0.5).toFloat))
    }
    val out = PowerIteration.leadingComponent(spark, data.toDF("embedding"), "embedding")
      .orderBy("dim").collect()
    assert(out.head.getDouble(out.head.fieldIndex("v")) >= 0.0)
  }
}
