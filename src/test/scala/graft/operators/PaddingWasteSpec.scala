package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PaddingWasteSpec extends SparkSpec {
  import spark.implicits._

  private def report(lens: Int*) = {
    val docs = lens.toSeq.map(n => (1 to n).map(_ => "w").mkString(" "))
      .toDF("text")
    PaddingWaste.report(docs, split(col("text"), " "))
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("sequences bucket to the next multiple of the width") {
    val m = report(10, 64, 65)
    assert(m.keySet == Set(64L, 128L))
    assert(m(64L).getLong(m(64L).fieldIndex("n_seqs")) == 2L)
  }

  test("waste is padded volume minus real tokens") {
    val m = report(10, 20)
    val b = m(64L)
    assert(b.getLong(b.fieldIndex("n_real")) == 30L)
    assert(b.getLong(b.fieldIndex("n_padded")) == 128L)
    assert(b.getDouble(b.fieldIndex("waste_frac")) ==
      math.round((128.0 - 30.0) / 128.0 * 1e6) / 1e6.toDouble)
  }

  test("overlong sequences truncate to maxLen and report the overflow") {
    val m = report(600)
    val b = m(512L)
    assert(b.getLong(b.fieldIndex("n_real")) == 512L)
    assert(b.getLong(b.fieldIndex("n_truncated")) == 88L)
    assert(b.getDouble(b.fieldIndex("waste_frac")) == 0.0)
  }
}
