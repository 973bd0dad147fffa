package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MarkovAttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "event_id", "event_type")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("event_id") * 1000000L).as("ts"), col("event_type"))

  private def trans(rows: (Long, Long, String)*) =
    MarkovAttribution.transitions(ev(rows: _*), "user_id", "ts", "event_id",
      "event_type", "purchase")

  test("journeys truncate at first conversion and tail into NULL otherwise") {
    val t = trans(
      (1L, 1L, "view"), (1L, 2L, "purchase"), (1L, 3L, "view"), // post-conv dropped
      (2L, 4L, "view"), (2L, 5L, "click")                       // unconverted
    ).collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(t == Map(
      ("START", "view") -> 2L,
      ("view", "CONV") -> 1L,
      ("view", "click") -> 1L,
      ("click", "NULL") -> 1L))
  }

  test("a mandatory gateway channel carries full removal effect") {
    // every conversion passes through click; view journeys also exist
    val rows = (1L to 4L).flatMap { u =>
      Seq((u, u * 10, "view"), (u, u * 10 + 1, "click"), (u, u * 10 + 2, "purchase"))
    } ++ Seq((9L, 90L, "view"))
    val out = MarkovAttribution.removalEffects(spark, trans(rows: _*))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("removal_effect")).toMap
    // removing click kills every conversion path
    assert(out("click") == 1.0)
    // removing view also kills them here (all paths start with view)
    assert(out("view") == 1.0)
  }

  test("an off-path channel has zero removal effect") {
    val rows = Seq(
      (1L, 1L, "view"), (1L, 2L, "purchase"),
      (2L, 3L, "view"), (2L, 4L, "purchase"),
      (3L, 5L, "click"))  // click never reaches conversion
    val out = MarkovAttribution.removalEffects(spark, trans(rows: _*))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("p_conv"), r.getAs[Double]("removal_effect"))).toMap
    assert(out("click")._2 == 0.0)
    assert(out("view")._2 == 1.0)
    // base conversion: 2 of 3 journeys convert in one hop
    assert(math.abs(out("view")._1 - 2.0 / 3.0) < 1e-6)
  }

  test("removal effects are deterministic across runs") {
    val rows = (1L to 30L).flatMap { u =>
      val path: Seq[String] = u % 3 match {
        case 0 => Seq("view", "click", "purchase")
        case 1 => Seq("view", "view", "error")
        case _ => Seq("signup", "click", "view", "purchase")
      }
      path.zipWithIndex.map { case (t, i) => (u, u * 100 + i, t) }
    }
    val a = MarkovAttribution.removalEffects(spark, trans(rows: _*)).collect().toSeq
    val b = MarkovAttribution.removalEffects(spark, trans(rows: _*)).collect().toSeq
    assert(a == b)
  }
}
