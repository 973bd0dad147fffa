package graft.search

import graft.SparkSpec
import graft.core.Tables

/** Recall gate for the approximate search paths: IVF (q30/q46 machinery)
  * and sign-bit LSH (q17 machinery) are measured against the exact cosine
  * top-10 (q13) on the driver's sf0.1 embeddings (2000 vectors), over 3
  * probe queries. Approximate rankings have no SQL-expressible oracle, so
  * this spec is the regression gate for the probe-count/band-count knobs:
  * a knob change that quietly guts recall fails here.
  *
  * Measured (deterministic data + deterministic KMeans → exact repeatable):
  *   IVF  nprobe=2/8 cells: mean 0.567   nprobe=4: 0.833   nprobe=8: 1.000
  *   LSH  nBits=8 (q17 recipe): 0.233    nBits=4: 0.600
  *   PQ   8 subspaces x 4 codes (q98 recipe), reconstructed search: 0.200
  * The synthetic embeddings are near-uniform — the hardest case for
  * locality hashing (real text embeddings cluster, raising recall at the
  * same knobs) — so the floors below are the measured values minus a hair,
  * documented in README ("ANN recall").
  */
class RecallSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.1"
  private val K = 10
  private val queryIds = Seq(0L, 700L, 1500L)

  private def withData(f: (org.apache.spark.sql.DataFrame, Seq[(Seq[Double], Set[Long])]) => Unit): Unit = {
    assume(new java.io.File(sfDir).isDirectory)
    val emb = Tables.embeddings(spark, sfDir).cache()
    val exact = queryIds.map { qid =>
      val q = KnnSearch.vectorOf(emb, "vec_id", "embedding", qid)
      q -> KnnSearch.topK(emb, "vec_id", "embedding", q, K)
        .collect().map(_.getAs[Long]("vec_id")).toSet
    }
    try f(emb, exact) finally emb.unpersist()
  }

  test("IVF: nprobe=4 clears the 0.8 floor; q46 recipe (nprobe=2) holds 0.5; all-cells = exact") {
    withData { (emb, exact) =>
      val cents = KMeans.fit(emb, "vec_id", "embedding", 8, 2).cache()
      def recalls(np: Int): Seq[Double] = exact.map { case (q, ex) =>
        val ivf = IvfAnn.topKWith(emb, "vec_id", "embedding", cents, q, K, nprobe = np)
          .collect().map(_.getAs[Long]("vec_id")).toSet
        (ivf & ex).size.toDouble / ex.size
      }
      val r2 = recalls(2); val r4 = recalls(4); val r8 = recalls(8)
      info(f"recall@10 mean: nprobe=2 ${r2.sum / 3}%.3f, nprobe=4 ${r4.sum / 3}%.3f, nprobe=8 ${r8.sum / 3}%.3f")
      // probing every cell degenerates to exact search — a structural identity
      assert(r8.forall(_ == 1.0), s"nprobe=all must reproduce the exact top-k, got $r8")
      assert(r4.sum / 3 >= 0.8, s"nprobe=4 mean recall ${r4.sum / 3} under 0.8 floor")
      assert(r2.sum / 3 >= 0.5, s"q46-recipe (nprobe=2) mean recall ${r2.sum / 3} under 0.5 floor")
      // more probes never hurt recall
      r2.lazyZip(r4).lazyZip(r8).foreach((a, b, c) => assert(a <= b && b <= c))
      cents.unpersist()
    }
  }

  test("IVF-PQ composition: coarse prune + PQ-reconstructed scoring beats PQ-alone's floor and degrades gracefully vs plain IVF") {
    import org.apache.spark.sql.functions._
    withData { (emb, exact) =>
      // the faiss architecture end-to-end: k-means coarse cells prune the
      // scan (partition pruning at scale), PQ codes score inside the
      // probed cells (asymmetric search via reconstruction — ranking-
      // equivalent to ADC with the same codebook)
      val cents = KMeans.fit(emb, "vec_id", "embedding", 8, 2).cache()
      val (codes, pqCents) = ProductQuant.fit(emb, "vec_id", "embedding", 8, 4, 2)
      val recon = codes.join(pqCents, Seq("s", "cluster"))
        .groupBy(col("vid"))
        .agg(expr("flatten(transform(array_sort(collect_list(struct(s, cent))), t -> t.cent))")
          .as("embedding"))
        .select(col("vid").as("vec_id"), col("embedding"))
      // carry each vector's coarse cell onto its reconstruction
      val cells = IvfAnn.assign(emb, "vec_id", "embedding", cents)
        .select(col("vec_id"), col("cluster"))
      val reconCelled = recon.join(cells, Seq("vec_id")).cache()
      assert(reconCelled.count() == emb.count())
      def recallAt(np: Int): Double = exact.map { case (q, ex) =>
        val probed = cents.withColumn("qcos",
            graft.functions.VectorOps.cosine(col("centroid"), graft.functions.VectorOps.vecLit(q)))
          .orderBy(col("qcos").desc, col("cluster").asc).limit(np).select("cluster")
        val got = KnnSearch.topK(
            reconCelled.join(broadcast(probed), Seq("cluster"), "left_semi"),
            "vec_id", "embedding", q, K)
          .collect().map(_.getAs[Long]("vec_id")).toSet
        (got & ex).size.toDouble / ex.size
      }.sum / exact.size
      val rAll = recallAt(8); val r4 = recallAt(4)
      info(f"IVF-PQ recall@10 mean: nprobe=4 $r4%.3f, nprobe=8 $rAll%.3f")
      // probing every cell reduces to PQ-alone search — same 0.15 floor
      assert(rAll >= 0.15, s"IVF-PQ all-cells recall $rAll under the PQ floor")
      // pruning can only remove candidates: composed recall ≤ PQ-alone
      assert(r4 <= rAll + 1e-9)
      cents.unpersist(); reconCelled.unpersist()
    }
  }

  test("int8 quantized index: recall@10 >= 0.9 vs the float index") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorQuant
    withData { (emb, exact) =>
      // quantize the whole index once (what a stored int8 index would hold)
      val qIndex = emb
        .withColumn("_s", VectorQuant.scaleOf(col("embedding")))
        .withColumn("embedding", VectorQuant.quantizedAsFloat(col("embedding"), col("_s")))
        .drop("_s").cache()
      val rs = exact.map { case (q, ex) =>
        // the query vector is quantized too: symmetric int8-vs-int8 search
        val scale = q.map(math.abs).max
        val qq = if (scale == 0) q else q.map(v => math.floor(v / scale * 127.0 + 0.5))
        val got = KnnSearch.topK(qIndex, "vec_id", "embedding", qq, K)
          .collect().map(_.getAs[Long]("vec_id")).toSet
        (got & ex).size.toDouble / ex.size
      }
      info(f"int8 recall@10 mean: ${rs.sum / 3}%.3f")
      assert(rs.sum / 3 >= 0.9, s"int8 mean recall ${rs.sum / 3} under 0.9 floor")
      qIndex.unpersist()
    }
  }

  test("PQ (q98 recipe, 8 subspaces x 4 codes): reconstructed search holds its measured recall floor") {
    import org.apache.spark.sql.functions._
    withData { (emb, exact) =>
      val (codes, cents) = ProductQuant.fit(emb, "vec_id", "embedding", 8, 4, 2)
      // asymmetric search via reconstruction: each vector is replaced by
      // the concatenation of its code centroids, then searched exactly —
      // equivalent ranking to ADC with the same codebook
      val recon = codes.join(cents, Seq("s", "cluster"))
        .groupBy(col("vid"))
        .agg(expr("flatten(transform(array_sort(collect_list(struct(s, cent))), t -> t.cent))")
          .as("embedding"))
        .select(col("vid").as("vec_id"), col("embedding"))
        .cache()
      assert(recon.count() == emb.count(), "reconstruction must cover every vector")
      val rs = exact.map { case (q, ex) =>
        val got = KnnSearch.topK(recon, "vec_id", "embedding", q, K)
          .collect().map(_.getAs[Long]("vec_id")).toSet
        (got & ex).size.toDouble / ex.size
      }
      info(f"PQ recall@10 mean: ${rs.sum / 3}%.3f")
      // 2-bit-per-subspace codes on near-uniform synthetic vectors are the
      // coarsest quantization in the engine; measured 0.200 — the floor is
      // that minus a hair (the q17/q30 discipline) so a seeding or
      // argmin-tie-break regression fails loudly here
      assert(rs.sum / 3 >= 0.15, s"PQ mean recall ${rs.sum / 3} under 0.15 floor")
      recon.unpersist()
    }
  }

  test("hard negatives: below the ceiling, ranked, and never the probe itself") {
    withData { (emb, _) =>
      import org.apache.spark.sql.functions._
      val ceiling = 0.95
      val probes = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))
      val negs = emb.crossJoin(broadcast(probes))
        .filter(col("vec_id") =!= col("probe_id"))
        .withColumn("cos",
          org.apache.spark.sql.graftx.CosineSimilarity.asColumn(col("embedding"), col("pv")))
        .filter(col("cos") < ceiling)
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .collect()
      assert(negs.length == 9) // 3 probes × 3 negatives
      negs.foreach { r =>
        assert(r.getAs[Long]("vec_id") != r.getAs[Long]("probe_id"))
        assert(r.getAs[Double]("cos") < ceiling)
      }
      // within a probe, ranks follow descending cosine
      negs.groupBy(_.getAs[Long]("probe_id")).foreach { case (_, rs) =>
        val byRank = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("cos"))
        assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
      }
    }
  }

  test("LSH: 4-bit buckets hold 0.55; q17 recipe (8-bit) holds its measured 0.2 floor") {
    withData { (emb, exact) =>
      def recalls(nb: Int): Seq[Double] = exact.map { case (q, ex) =>
        val lsh = LshAnn.topK(emb, "vec_id", "embedding", q, K, nBits = nb)
          .collect().map(_.getAs[Long]("vec_id")).toSet
        (lsh & ex).size.toDouble / ex.size
      }
      val r4 = recalls(4); val r8 = recalls(8)
      info(f"recall@10 mean: nBits=4 ${r4.sum / 3}%.3f, nBits=8 ${r8.sum / 3}%.3f")
      assert(r4.sum / 3 >= 0.55, s"nBits=4 mean recall ${r4.sum / 3} under 0.55 floor")
      assert(r8.sum / 3 >= 0.2, s"q17-recipe (nBits=8) mean recall ${r8.sum / 3} under 0.2 floor")
      // coarser buckets scan more candidates — recall must not decrease
      assert(r4.sum >= r8.sum)
    }
  }
}
