package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SequencePackingSpec extends SparkSpec {
  import spark.implicits._

  test("assign: per-shard id-ordered cumsum quotient; oversized doc shifts successors") {
    // shard 0 (ids 0,2,4,6): tokens 6,6,25,6 with budget 10 →
    //   before = 0,6,12,37 → seq 0,0,1,3 (the 25-token doc spans 1..3)
    // shard 1 (ids 1,3): tokens 10,1 → before 0,10 → seq 0,1 (exact-fit
    //   budget closes the sequence)
    val docs = Seq((0L, 6L), (1L, 10L), (2L, 6L), (3L, 1L), (4L, 25L), (6L, 6L))
      .toDF("id", "toks")
    val out = SequencePacking.assign(docs, "id", "toks", budget = 10L, nShards = 2)
      .select(col("id"), col("shard"), col("seq_id")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(0L) == (0L, 0L))
    assert(out(2L) == (0L, 0L))
    assert(out(4L) == (0L, 1L))
    assert(out(6L) == (0L, 3L))
    assert(out(1L) == (1L, 0L))
    assert(out(3L) == (1L, 1L))
  }

  test("packStats: fill ratio per (shard, seq); >1 only via an oversized doc") {
    val docs = Seq((0L, 6L), (2L, 6L), (4L, 25L)).toDF("id", "toks")
    val assigned = SequencePacking.assign(docs, "id", "toks", 10L, 1)
    val stats = SequencePacking.packStats(assigned, "toks", 10L)
      .collect().map(r => r.getAs[Long]("seq_id") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens"), r.getAs[Double]("fill_ratio"))).toMap
    assert(stats(0L) == (2L, 12L, 1.2)) // two 6s: second starts at 6 < 10
    assert(stats(1L) == (1L, 25L, 2.5)) // oversized doc alone
  }
}
