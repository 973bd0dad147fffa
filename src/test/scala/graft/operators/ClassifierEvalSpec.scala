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

  test("average precision: perfect ranker hits AP = 1, best F1 = 1") {
    val d = Seq((3L, 1L), (3L, 1L), (2L, 0L), (1L, 0L)).toDF("score", "y")
    val r = ClassifierEval.averagePrecision(d, "score", "y").collect().head
    assert(r.getAs[Double]("ap") == 1.0)
    assert(r.getAs[Double]("best_f1") == 1.0)
    assert(r.getAs[Long]("best_f1_score") == 3L)
  }

  test("average precision: inverted ranker pays in AP; F1 peaks at recall-all") {
    // positives carry the LOWEST score → AP = prevalence at the bottom cut
    val d = Seq((1L, 1L), (1L, 1L), (2L, 0L), (3L, 0L)).toDF("score", "y")
    val r = ClassifierEval.averagePrecision(d, "score", "y").collect().head
    assert(r.getAs[Double]("ap") == 0.5)
    assert(r.getAs[Double]("best_f1") == 0.666667) // 2·2/(4+2)
    assert(r.getAs[Long]("best_f1_score") == 1L)
  }

  test("average precision: no positives is NULL, not a divide error") {
    val d = Seq((1L, 0L), (2L, 0L)).toDF("score", "y")
    val r = ClassifierEval.averagePrecision(d, "score", "y").collect().head
    assert(r.isNullAt(r.fieldIndex("ap")))
    assert(r.getAs[Long]("n_pos") == 0L)
  }
}
