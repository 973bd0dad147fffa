package graft.operators

import graft.SparkSpec
import TokenBucket._

class TokenBucketSpec extends SparkSpec {
  import spark.implicits._

  private def run(data: Seq[(String, Long, Long)], cap: Long = 5L, r: Long = 1L) =
    TokenBucket.admitDs(
      spark.createDataset(data.map(t => Tick(t._1, t._2, t._3))), cap, r)
      .collect().sortBy(x => (x.key, x.t))

  test("hand-checked fold: burst sheds, idle gap refills to the cap") {
    // t=1: 3 arrive against a full bucket of 5 -> admit 3, 2 left
    // t=2: 4 arrive, refill +1 -> 3 tokens -> admit 3, shed 1
    // t=10: refill +8 clamps at 5 -> admit 2, 3 left
    val out = run(Seq(("k", 1L, 3L), ("k", 2L, 4L), ("k", 10L, 2L)))
    assert(out.map(_.admitted).toSeq == Seq(3L, 3L, 2L))
    assert(out.map(_.rejected).toSeq == Seq(0L, 1L, 0L))
    assert(out.map(_.tokensAfter).toSeq == Seq(2L, 0L, 3L))
  }

  test("sustained overload admits exactly the refill rate after the cap drains") {
    val out = run((1L to 20L).map(("k", _, 10L)))
    // first tick spends the full bucket; every later tick admits the +1 refill
    assert(out.head.admitted == 5L)
    assert(out.tail.forall(_.admitted == 1L), out.map(_.admitted).mkString(","))
    assert(out.map(_.rejected).sum == 20 * 10 - 5 - 19)
  }

  test("keys are isolated buckets") {
    val out = run(Seq(("a", 1L, 100L), ("b", 1L, 1L)))
    assert(out.find(_.key == "a").get.admitted == 5L)
    assert(out.find(_.key == "b").get.admitted == 1L)
    assert(out.find(_.key == "b").get.tokensAfter == 4L)
  }
}
