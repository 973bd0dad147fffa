package graft.operators

import graft.SparkSpec

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  private def df(n: Int, f: Int => Double) =
    (1 to n).map(i => ("g", i.toLong, f(i))).toDF("grp", "id", "v")

  test("CI brackets the mean and is ordered lo <= mean <= hi") {
    val r = Bootstrap.meanCi(df(500, i => (i % 10).toDouble), "grp", "id", "v")
      .collect().head
    val (n, mean, lo, hi) = (r.getAs[Long]("n"), r.getAs[Double]("mean_v"),
      r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(n == 500L)
    assert(lo <= mean && mean <= hi, s"$lo <= $mean <= $hi")
    assert(hi > lo, "nondegenerate data must give a nondegenerate interval")
  }

  test("replicas are deterministic: identical CI across runs") {
    val d = df(300, i => math.sin(i.toDouble) * 10)
    val a = Bootstrap.meanCi(d, "grp", "id", "v").collect().head
    val b = Bootstrap.meanCi(d, "grp", "id", "v").collect().head
    assert(a == b)
  }

  test("a constant column yields a zero-width interval at the constant") {
    val r = Bootstrap.meanCi(df(200, _ => 7.5), "grp", "id", "v")
      .collect().head
    assert(r.getAs[Double]("mean_v") == 7.5)
    assert(r.getAs[Double]("ci_lo") == 7.5 && r.getAs[Double]("ci_hi") == 7.5)
  }

  test("more spread in the data widens the interval") {
    val tight = Bootstrap.meanCi(df(400, i => 50.0 + (i % 3)), "grp", "id", "v")
      .collect().head
    val wide = Bootstrap.meanCi(df(400, i => ((i % 2) * 100).toDouble), "grp", "id", "v")
      .collect().head
    def width(r: org.apache.spark.sql.Row) =
      r.getAs[Double]("ci_hi") - r.getAs[Double]("ci_lo")
    assert(width(wide) > width(tight), s"${width(wide)} vs ${width(tight)}")
  }
}
