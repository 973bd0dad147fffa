package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SeasonalDecomposeSpec extends SparkSpec {
  import spark.implicits._

  private def eventsAt(rows: Seq[(String, Long, Int)]) =
    rows.flatMap { case (k, day, n) => (1 to n).map(_ => (k, day)) }
      .toDF("k", "day")
      .select(col("k"), timestamp_micros(col("day") * 86400000000L).as("ts"))

  test("flat series decomposes to zero seasonal deviation everywhere") {
    val rows = (0L until 28L).map(d => ("a", d, 5))
    val out = SeasonalDecompose.weekday(eventsAt(rows), "k", "ts").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Double]("seasonal_dev") == 0.0))
    assert(out.forall(_.getAs[Double]("mean_x") == 5.0))
  }

  test("a weekly spike shows up on its weekday, compensated on the others") {
    // 3 on most days, 10 every day ≡ 0 (mod 7)
    val rows = (0L until 28L).map(d => ("a", d, if (d % 7 == 0) 10 else 3))
    val out = SeasonalDecompose.weekday(eventsAt(rows), "k", "ts")
      .collect().map(r => r.getAs[Long]("dow") -> r.getAs[Double]("seasonal_dev")).toMap
    // week total = 10 + 6*3 = 28; dev(spike day) = (7*10 - 28)/7 = 6
    assert(out(0L) == 6.0)
    // other weekdays each carry (7*3 - 28)/7 = -1
    (1L to 6L).foreach(d => assert(out(d) == -1.0, s"dow $d: ${out(d)}"))
  }

  test("incomplete windows at the edges and around gaps are excluded") {
    // 10 consecutive days: only days 3..6 have full 7-day windows
    val rows = (0L until 10L).map(d => ("a", d, 2))
    val out = SeasonalDecompose.weekday(eventsAt(rows), "k", "ts")
      .agg(sum("n_days")).collect().head.getLong(0)
    assert(out == 4L)
    // a hole in the middle kills the windows that straddle it
    val holey = (0L until 20L).filter(_ != 10L).map(d => ("a", d, 2))
    val out2 = SeasonalDecompose.weekday(eventsAt(holey), "k", "ts")
      .agg(sum("n_days")).collect().head.getLong(0)
    // full windows: centers 3..6 and 14..16 (center 7..13 windows touch the hole)
    assert(out2 == 7L, s"got $out2")
  }
}
