package graft.dedup

import graft.SparkSpec
import graft.functions.Splits
import org.apache.spark.sql.functions._

class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  // the split is hash-determined, so pick a train and an eval id FROM the
  // actual labels rather than assuming which bucket an id lands in
  private def pickIds(n: Int): (Long, Long, Long) = {
    val labels = (1L to n.toLong).toDF("doc_id")
      .select(col("doc_id"), Splits.splitLabel(col("doc_id"), 80, 10).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val train = labels.collectFirst { case (id, "train") => id }.get
    val evals = labels.collect { case (id, s) if s != "train" => id }
    (train, evals(0), evals(1))
  }

  test("a verbatim half-inclusion scores containment 1.0; disjoint docs pair with nobody") {
    val (trainId, evalId, otherEval) = pickIds(60)
    val trainWords = (1 to 20).map(i => s"tw$i").mkString(" ")
    val docs = (1L to 60L).map { id =>
      val text =
        if (id == trainId) trainWords
        else if (id == evalId) (1 to 10).map(i => s"tw$i").mkString(" ") // prefix of train doc
        else (1 to 12).map(i => s"u${id}w$i").mkString(" ")              // globally unique words
      (id, text)
    }.toDF("doc_id", "text")
    val pairs = Decontamination.containmentPairs(docs, "doc_id", "text",
      n = 5, trainPct = 80, valPct = 10, maxDf = 50, minContainment = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(pairs.toSeq == Seq((evalId, trainId, 1.0)), s"got ${pairs.toSeq}")
    assert(!pairs.exists(_._1 == otherEval))
  }

  test("the train-df cap drops boilerplate grams and can only LOWER a score") {
    val (trainId, evalId, _) = pickIds(60)
    // every train doc carries the same boilerplate sentence; the eval doc
    // is ONLY that sentence, so with a tight cap no pair survives
    val boiler = (1 to 8).map(i => s"bp$i").mkString(" ")
    val docs = (1L to 60L).map { id =>
      val text = if (id == evalId) boiler else boiler + " " + (1 to 6).map(i => s"u${id}w$i").mkString(" ")
      (id, text)
    }.toDF("doc_id", "text")
    val strict = Decontamination.containmentPairs(docs, "doc_id", "text", 5, 80, 10,
      maxDf = 3, minContainment = 0.2)
    assert(strict.count() == 0)
    val loose = Decontamination.containmentPairs(docs, "doc_id", "text", 5, 80, 10,
      maxDf = 60, minContainment = 0.2)
    // without the cap the boilerplate pairs the eval doc with every train doc
    assert(loose.filter(col("eval_id") === evalId).count() > 10)
  }
}
