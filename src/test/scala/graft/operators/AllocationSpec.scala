package graft.operators

import graft.SparkSpec

class AllocationSpec extends SparkSpec {
  import spark.implicits._

  test("allocations sum exactly to the budget and follow N_h*S_h") {
    // stratum a: large and variable; b: large but constant; c: small
    val rows =
      (1 to 40).map(i => ("a", (i * 97) % 1000)) ++
        (1 to 40).map(_ => ("b", 500)) ++
        (1 to 5).map(i => ("c", i * 3))
    val out = Allocation.neyman(rows.toDF("g", "v"), "g", "v", 100L)
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Long]("n_alloc")).toMap
    assert(out.values.sum == 100L)
    // constant stratum has zero sd -> zero weight -> zero allocation
    assert(out("b") == 0L)
    assert(out("a") > out("c"))
  }

  test("largest-remainder rounding: floors plus the remainder ranks") {
    // three equal strata -> equal thirds of 100: 33/33/33 + 1 leftover
    // to the best remainder (ties broken by key name: 'a' wins)
    val rows = (1 to 30).flatMap(i =>
      Seq(("a", i * 10), ("b", i * 10), ("c", i * 10)))
    val out = Allocation.neyman(rows.toDF("g", "v"), "g", "v", 100L)
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Long]("n_alloc")).toMap
    assert(out.values.sum == 100L)
    assert(out == Map("a" -> 34L, "b" -> 33L, "c" -> 33L), out.toString)
  }
}
