package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardedExportSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 2000L).map(i => (i, s"doc $i", i % 97 + 10)).toDF("id", "text", "sz")

  test("shuffled: whole shards per partition, sorted by (ord, id) within") {
    val out = ShardedExport.shuffled(docs, "id", 8)
      .withColumn("pid", spark_partition_id())
    val rows = out.select("shard", "ord", "id", "pid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.length == 2000)
    // co-location: every row of a shard lands in ONE partition
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      assert(rs.map(_._4).distinct.length == 1, s"shard $shard split across partitions")
    }
    // within-partition order: (ord, id) ascending in collect order
    rows.groupBy(_._4).foreach { case (_, rs) =>
      val keys = rs.map(r => (r._2, r._3)).toSeq
      assert(keys == keys.sorted, "partition not sorted by (ord, id)")
    }
  }

  test("shuffled is deterministic and order decorrelates from input order") {
    val a = ShardedExport.shuffled(docs, "id", 8).select("id").as[Long].collect().toSeq
    val b = ShardedExport.shuffled(docs.orderBy(rand(42)), "id", 8)
      .select("id").as[Long].collect().toSeq
    // same rows, same shard/sort keys -> same within-partition sequences
    // regardless of input order (collect concatenates partitions in order)
    assert(a == b)
    assert(a != (0L until 2000L).toSeq) // and it actually shuffled
  }

  test("epochShuffled: same rows every epoch, different permutation per epoch") {
    def layout(epoch: Int) = ShardedExport.epochShuffled(docs, "id", 8, epoch)
      .select("id", "shard", "ord").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (e0, e1, e0again) = (layout(0), layout(1), layout(0))
    // coverage identical: every doc present in both epochs, none added
    assert(e0.keySet == docs.select("id").collect().map(_.getLong(0)).toSet)
    assert(e0.keySet == e1.keySet)
    // deterministic per epoch
    assert(e0 == e0again)
    // and genuinely different between epochs: most docs move shard or order
    val moved = e0.count { case (id, sl) => e1(id) != sl }
    assert(moved > e0.size / 2, s"only $moved of ${e0.size} changed between epochs")
  }

  test("shardStats: balanced shards, stats consistent with the assignment") {
    val stats = ShardedExport.shardStats(docs, "id", "sz", 8).collect()
    assert(stats.length == 8)
    val counts = stats.map(_.getAs[Long]("n_rows"))
    assert(counts.sum == 2000)
    // uniform hash: no shard more than 2x the ideal 250
    assert(counts.forall(c => c > 125 && c < 500), counts.mkString(","))
    assert(stats.map(_.getAs[Long]("total_size")).sum ==
      docs.agg(sum("sz")).as[Long].head())
  }
}
