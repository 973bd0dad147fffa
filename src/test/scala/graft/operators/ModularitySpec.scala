package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ModularitySpec extends SparkSpec {
  import spark.implicits._

  test("two disjoint triangles, perfect partition: Q = 1/2") {
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L)).toDF("a", "b")
    val comm = Seq((1L, "x"), (2L, "x"), (3L, "x"),
      (4L, "y"), (5L, "y"), (6L, "y")).toDF("node", "c")
    val r = Modularity.partitionQuality(pairs, "a", "b", comm, "node", "c")
      .collect().head
    assert(r.getAs[Long]("m") == 6L && r.getAs[Long]("e_in") == 6L)
    assert(r.getAs[Long]("n_comm") == 2L)
    // d_c = 6 each -> D2 = 72; Q = 6/6 - 72/144 = 0.5
    assert(r.getAs[Double]("q") == 0.5)
  }

  test("everything in one community scores zero") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val comm = Seq(1L, 2L, 3L, 4L).map(_ -> "all").toDF("node", "c")
    val r = Modularity.partitionQuality(pairs, "a", "b", comm, "node", "c")
      .collect().head
    // e_in/m = 1 and D2 = (2m)^2 -> Q = 1 - 1 = 0
    assert(r.getAs[Double]("q") == 0.0)
  }

  test("cutting a dense community in half scores below the true partition") {
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("a", "b")
    val good = Seq((1L, "x"), (2L, "x"), (3L, "x"),
      (4L, "y"), (5L, "y"), (6L, "y")).toDF("node", "c")
    val bad = Seq((1L, "x"), (2L, "y"), (3L, "x"),
      (4L, "y"), (5L, "x"), (6L, "y")).toDF("node", "c")
    val qGood = Modularity.partitionQuality(pairs, "a", "b", good, "node", "c")
      .collect().head.getAs[Double]("q")
    val qBad = Modularity.partitionQuality(pairs, "a", "b", bad, "node", "c")
      .collect().head.getAs[Double]("q")
    assert(qGood > qBad)
  }
}
