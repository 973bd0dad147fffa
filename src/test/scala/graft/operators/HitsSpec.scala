package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HitsSpec extends SparkSpec {
  import spark.implicits._

  test("star graph: the hub is the spoke-pointer, the center is the authority") {
    // a,b,c all point at z; z points nowhere.
    val edges = Seq(("a", "z"), ("b", "z"), ("c", "z")).toDF("src", "dst")
    val rows = Hits.run(edges, 3).collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // z is the unique authority (all auth mass), carries no hub score.
    assert(rows("z")._2 == 1000000L && rows("z")._1 == 0L)
    // a,b,c split hub mass into equal integer thirds; no auth.
    Seq("a", "b", "c").foreach { p =>
      assert(rows(p)._1 == 333333L, s"hub($p) = ${rows(p)._1}")
      assert(rows(p)._2 == 0L)
    }
  }

  test("mass conservation: auth and hub each renormalize to ~1e6 ppm (floor-division loss < |V|)") {
    val edges = (0 until 20).flatMap { i =>
      Seq((s"p$i", s"p${(i + 1) % 20}"), (s"p$i", s"p${(i + 7) % 20}"))
    }.toDF("src", "dst")
    val agg = Hits.run(edges, 4)
      .agg(sum("hub_ppm").as("h"), sum("auth_ppm").as("a")).collect().head
    val (h, a) = (agg.getLong(0), agg.getLong(1))
    assert(h <= 1000000L && h > 1000000L - 20, s"hub mass $h")
    assert(a <= 1000000L && a > 1000000L - 20, s"auth mass $a")
  }

  test("mutual reinforcement separates a good hub from a weak one") {
    // hub1 points at BOTH authorities (x and y, each also endorsed by a
    // second page); hub2 points only at x plus a dead-end nobody else
    // endorses. hub1 must out-rank hub2.
    val edges = Seq(
      ("hub1", "x"), ("hub1", "y"),
      ("hub2", "x"), ("hub2", "dead"),
      ("e1", "x"), ("e2", "y")
    ).toDF("src", "dst")
    val rows = Hits.run(edges, 5).collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("hub1")._1 > rows("hub2")._1)
    // x is endorsed by 3 hubs, y by 2 — x carries more authority.
    assert(rows("x")._2 > rows("y")._2)
    // every node appears exactly once, including the dead end with no
    // out-edges
    assert(rows.size == 7)
  }

  test("iteration count is respected and deterministic across runs") {
    // asymmetric graph (varying in/out degrees) so scores keep moving
    // between rounds — iters=1 and iters=5 must differ, proving the
    // iteration knob actually drives the computation
    val edges = Seq(
      ("h1", "x"), ("h1", "y"), ("h1", "z"),
      ("h2", "x"), ("h3", "y"), ("x", "y")
    ).toDF("src", "dst")
    val one = Hits.run(edges, 1).orderBy("page").collect().toSeq
    val five = Hits.run(edges, 5).orderBy("page").collect().toSeq
    assert(one != five, "scores must evolve past the first iteration")
    // and each iteration count is deterministic across runs
    val fiveAgain = Hits.run(edges, 5).orderBy("page").collect().toSeq
    assert(five == fiveAgain)
  }
}
