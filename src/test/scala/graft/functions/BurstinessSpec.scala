package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BurstinessSpec extends SparkSpec {
  import spark.implicits._

  private def report(rows: Seq[(Long, String)], topK: Int = 20) =
    Burstiness.report(rows.toDF("id", "text"), "id",
      split(col("text"), " "), topK)
      .collect().map(r => r.getString(0) -> r).toMap

  test("uniform term has VMR near zero-excess; bursty term exceeds it") {
    // 4 docs; "flat" once each (S=4, Q=4, D=4): VMR = 4/4 - 4/4 = 0? No:
    // VMR = Q/S - S/D = 1 - 1 = 0 → variance of constant-1-per-doc with
    // no zeros is 0. "burst" 4 times in one doc: S=4, Q=16, D=4 →
    // VMR = 16/4 - 4/4 = 3.
    val rows = Seq(
      (1L, "flat burst burst burst burst"),
      (2L, "flat x"), (3L, "flat y"), (4L, "flat z"))
    val m = report(rows)
    assert(m("flat").getDouble(m("flat").fieldIndex("vmr")) == 0.0)
    assert(m("burst").getDouble(m("burst").fieldIndex("vmr")) == 3.0)
  }

  test("df counts documents, total counts occurrences, mean includes zeros") {
    val rows = Seq((1L, "w w w"), (2L, "w"), (3L, "other"))
    val m = report(rows)
    val w = m("w")
    assert(w.getLong(w.fieldIndex("total")) == 4L)
    assert(w.getLong(w.fieldIndex("df")) == 2L)
    assert(w.getDouble(w.fieldIndex("mean")) == math.round(4.0 / 3.0 * 1e6) / 1e6.toDouble)
  }

  test("topK bounds the report by total with token tiebreak") {
    val rows = Seq((1L, "a a b b c"))
    val m = report(rows, topK = 2)
    assert(m.keySet == Set("a", "b"))
  }
}
