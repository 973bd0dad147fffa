package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class InfoGainSpec extends SparkSpec {
  import spark.implicits._

  test("a perfect predictor gains the full label entropy; noise gains zero") {
    val rows = (1 to 100).map { i =>
      val y = i % 2 == 0
      (y, y, i % 4 < 2) // f1 = label exactly; f2 = independent of label
    }
    val out = InfoGain.binaryGain(rows.toDF("y", "f1", "f2"),
      Seq("perfect" -> col("f1"), "noise" -> col("f2")), col("y"))
      .collect().map(r => r.getAs[String]("feature") ->
        (r.getAs[Double]("h_label"), r.getAs[Double]("info_gain"))).toMap
    // balanced binary label: H = ln 2
    assert(math.abs(out("perfect")._1 - math.log(2.0)) < 1e-6)
    assert(math.abs(out("perfect")._2 - math.log(2.0)) < 1e-6)
    assert(out("noise")._2 == 0.0, out("noise").toString)
  }

  test("hand-checked asymmetric split") {
    // f true: 8 pos / 2 neg; f false: 2 pos / 8 neg
    val rows = Seq.fill(8)((true, true)) ++ Seq.fill(2)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(8)((false, false))
    val r = InfoGain.binaryGain(rows.toDF("f", "y"),
      Seq("f" -> col("f")), col("y")).collect().head
    val h = math.log(2.0)
    val hc = -(0.8 * math.log(0.8) + 0.2 * math.log(0.2))
    assert(math.abs(r.getAs[Double]("info_gain") - (h - hc)) < 1e-5)
  }
}
