package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifierEvalSpec extends SparkSpec {
  import spark.implicits._

  private def eval(pairs: (String, String)*) =
    ClassifierEval.perClass(pairs.toSeq.toDF("actual", "pred"), "actual", "pred")
      .collect().map(r => r.getString(0) -> r).toMap

  test("precision, recall, and harmonic-identity F1") {
    // en: 2 actual, model predicts en 3 times, 2 correct
    val m = eval(("en", "en"), ("en", "en"), ("de", "en"), ("de", "de"))
    val en = m("en")
    assert(en.getLong(en.fieldIndex("tp")) == 2L)
    assert(en.getDouble(en.fieldIndex("precision")) == math.round(2.0 / 3.0 * 1e6) / 1e6)
    assert(en.getDouble(en.fieldIndex("recall")) == 1.0)
    // F1 = 2*2/(3+2) = 0.8
    assert(en.getDouble(en.fieldIndex("f1")) == 0.8)
  }

  test("a predicted-only class appears with null recall") {
    val m = eval(("en", "unknown"), ("en", "en"))
    val u = m("unknown")
    assert(u.getLong(u.fieldIndex("n_actual")) == 0L)
    assert(u.getDouble(u.fieldIndex("precision")) == 0.0)
    assert(u.isNullAt(u.fieldIndex("recall")))
  }

  test("a never-predicted class appears with null precision") {
    val m = eval(("rare", "en"), ("en", "en"))
    val rare = m("rare")
    assert(rare.getLong(rare.fieldIndex("n_pred")) == 0L)
    assert(rare.isNullAt(rare.fieldIndex("precision")))
    assert(rare.getDouble(rare.fieldIndex("recall")) == 0.0)
    assert(rare.getDouble(rare.fieldIndex("f1")) == 0.0)
  }
}
