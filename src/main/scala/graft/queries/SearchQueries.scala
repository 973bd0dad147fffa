package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.search.{Bm25, Hybrid, IvfAnn, KnnSearch, LshAnn, Snippets}

/** Search-stack operators (SURVEY.md §2.3/§2.4) over the driver testdata:
  * `embeddings` stands in for the dense chunk vectors, `documents` for the
  * chunk text corpus; ids are shared (vec_id ≡ doc_id).
  */
object SearchQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Fixed hybrid-search query: terms present in the synthetic corpus. */
  val QueryTerms: Seq[String] = Seq("spark", "join", "stream", "window")

  private def queryVec(s: SparkSession, dir: String): Seq[Double] =
    KnnSearch.vectorOf(Tables.embeddings(s, dir), "vec_id", "embedding", 0L)

  def defs: Map[String, Q] = Map(
    // Matryoshka (MRL) truncation-fidelity audit: per dim-prefix tier,
    // corpus energy retention and top-10 overlap vs full-dim retrieval
    // for 5 fixed probes. Probes broadcast (constant fan-out); ranking
    // windows are (probe, tier)-sized, never the corpus.
    "q151_matryoshka" -> ((s, dir) =>
      graft.search.Matryoshka.fidelity(Tables.embeddings(s, dir),
        "vec_id", "embedding", probeIds = Seq(0L, 1L, 2L, 3L, 4L),
        dims = Seq(8, 16, 32, 64), k = 10)),

    // MMR diversified re-rank of the top-20 cosine page (λ=0.7, 5 picks):
    // corpus work is one TakeOrdered; the greedy loop runs on the bounded
    // collected page. The oracle replays all 5 picks via unrolled steps.
    "q155_mmr" -> ((s, dir) =>
      graft.search.MmrRerank.rerank(Tables.embeddings(s, dir),
        "vec_id", "embedding", probeId = 0L, candK = 20, k = 5, lambda = 0.7)),

    // Per-dimension embedding health: mean/std/extremes and exact-zero
    // counts per coordinate — the dead-dim / scale-drift monitor an
    // embedding pipeline runs per batch. Posexplode → ONE partial-agg
    // groupBy on the 64-value dim key.
    "q157_dim_stats" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .select(posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
        .groupBy((col("pos") + 1).cast("long").as("dim"))
        .agg(round(avg(col("x")), 6).as("mean"),
          round(stddev_pop(col("x")), 6).as("std"),
          round(min(col("x")), 6).as("min_x"),
          round(max(col("x")), 6).as("max_x"),
          sum(when(col("x") === 0.0, 1L).otherwise(0L)).as("n_zero"))
        .orderBy(col("dim"))),

    // Margin-based bitext mining (Artetxe & Schwenk ratio margin):
    // mutual-best pairs between the even/odd vec_id halves, hub-normalized
    // by top-2 neighborhood means. The target side broadcasts; ranking
    // windows partition per sentence id. Scale path: IVF-bucket both
    // sides first (q30), same margin math per bucket.
    "q168_bitext_mine" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.search.BitextMine.mine(
          emb.filter(col("vec_id") % 2 === 0),
          emb.filter(col("vec_id") % 2 === 1),
          "vec_id", "embedding", k = 2, marginThreshold = 1.0)
        .orderBy(col("margin").desc, col("src_id")).limit(50)
    }),

    // §2.4 dense top-k: codegen'd cosine + TakeOrderedAndProject.
    "q13_knn_cosine" -> ((s, dir) =>
      KnnSearch.topK(Tables.embeddings(s, dir), "vec_id", "embedding",
          queryVec(s, dir), 10)
        .select(col("vec_id"), round(col("score"), 6).as("score"))),

    // §2.3 BM25 corpus fit → the (term, df, idf) model table.
    "q14_bm25_fit" -> ((s, dir) =>
      Bm25.fit(Tables.documents(s, dir), "doc_id", "text")
        .select(col("term"), col("df"), round(col("idf"), 6).as("idf"))),

    // §2.4 sparse/keyword top-k: explode-join-agg BM25 scorer.
    "q15_bm25_search" -> ((s, dir) =>
      Bm25.search(Tables.documents(s, dir), "doc_id", "text", QueryTerms, 20)
        .select(col("doc_id"), round(col("score"), 6).as("score"))),

    // Embedding-space monitoring: per-label centroid norm + cosine
    // dispersion (mean / worst member-to-centroid similarity) — the drift
    // report an embedding pipeline tracks per batch. Element-wise means
    // via posexplode + partial agg (one shuffle of dim×labels partials);
    // the tiny centroid table broadcasts back onto one scan.
    "q81_centroid_drift" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("label").cast("long").as("label"),
          col("embedding").cast("array<double>").as("v"))
      val cents = e.select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("label"), col("pos")).agg(avg(col("x")).as("m"))
        .groupBy(col("label"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)")
          .as("cent"))
      e.join(broadcast(cents), Seq("label"))
        .withColumn("cs", graft.functions.VectorOps.cosine(col("v"), col("cent")))
        .withColumn("cn", sqrt(expr("aggregate(cent, 0d, (a, x) -> a + x * x)")))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          round(max(col("cn")), 6).as("centroid_norm"),
          round(avg(col("cs")), 6).as("avg_cos"),
          round(min(col("cs")), 6).as("min_cos"))
        .orderBy(col("label"))
    }),

    // Embedding outlier quarantine: points anti-correlated (cos < 0) with
    // their own label centroid — q81's point-level companion. Broadcast
    // centroid join; the only big-table shuffle is the dim-keyed mean.
    "q85_embed_outlier" -> ((s, dir) =>
      graft.search.EmbedOutliers.outliers(
        Tables.embeddings(s, dir), "vec_id", "label", "embedding", 0.0)
        .orderBy(col("id"))),

    // Retrieval-quality eval: MRR and precision@10 of the exact kNN path
    // against same-label relevance, per probe — the regression metric a
    // search engine publishes. Reuses the q13 ranking contract
    // (score desc, id asc), self-hit excluded.
    // Rank-biased overlap (Webber et al. 2010, p=0.9, truncated at 10)
    // between the EXACT cosine ranking and the int8-QUANTIZED ranking,
    // per probe — the rank-agreement form of ANN quality (q94 measures
    // relevance; this measures how much the compressed index changes the
    // ordering itself). The quantized side's dot products are exact
    // integer sums (|q| ≤ 127), so that ranking is order-independent
    // bit-for-bit; the exact side reuses the proven q13/q94 contract.
    // All per-probe tables are ≤ 20 rows before the bounded depth grid.
    "q140_rbo" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.VectorQuant
      val emb = Tables.embeddings(s, dir)
      val qemb = emb
        .withColumn("_scale", VectorQuant.scaleOf(col("embedding")))
        .withColumn("qv", VectorQuant.quantizedAsFloat(col("embedding"), col("_scale")))
        .select(col("vec_id"), col("qv"))
      Seq(0L, 100L, 300L).map { pid =>
        val q = graft.search.KnnSearch.vectorOf(emb, "vec_id", "embedding", pid)
        val s0 = q.map(math.abs).max
        // same float-max + double-promotion arithmetic as the corpus side
        val qq = if (s0 == 0.0) q.map(_ => 0.0)
          else q.map(v => math.floor(v / s0 * 127.0 + 0.5))
        val w = Window.orderBy(col("score").desc, col("vec_id").asc)
        val ra = graft.search.KnnSearch
          .topK(emb.filter(col("vec_id") =!= pid), "vec_id", "embedding", q, 10)
          .withColumn("ra", row_number().over(w)).select(col("vec_id"), col("ra"))
        val rb = graft.search.KnnSearch
          .topK(qemb.filter(col("vec_id") =!= pid), "vec_id", "qv", qq, 10)
          .withColumn("rb", row_number().over(w)).select(col("vec_id"), col("rb"))
        val depths = s.range(1, 11).select(col("id").cast("int").as("d"))
        ra.join(rb, Seq("vec_id"), "full")
          .crossJoin(broadcast(depths)) // ≤ 20 ids × 10 depths
          .groupBy(col("d"))
          .agg(count(when(col("ra") <= col("d") && col("rb") <= col("d"), 1)).as("cnt"))
          .agg(round(sum(pow(lit(0.9), col("d") - 1) * col("cnt") / col("d")) * 0.1, 6)
            .as("rbo"),
            max(when(col("d") === 10, col("cnt"))).as("overlap10"))
          .select(lit(pid).as("probe"), col("rbo"), col("overlap10"))
      }.reduce(_ unionByName _).orderBy(col("probe"))
    }),

    "q94_search_eval" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, dir)
      Seq(0L, 100L, 300L).map { pid =>
        val q = graft.search.KnnSearch.vectorOf(emb, "vec_id", "embedding", pid)
        val pLabel = emb.filter(col("vec_id") === pid)
          .select(col("label").cast("long")).head().getLong(0)
        val w = Window.orderBy(col("score").desc, col("vec_id").asc)
        graft.search.KnnSearch.topK(
            emb.filter(col("vec_id") =!= pid), "vec_id", "embedding", q, 10)
          .join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
          .withColumn("rank", row_number().over(w)) // 10 rows — window is fine
          .agg(
            max(when(col("label") === pLabel, round(lit(1.0) / col("rank"), 6)))
              .as("_rr"),
            (count(when(col("label") === pLabel, 1)) / 10.0).as("p_at_10"))
          .select(lit(pid).as("probe"),
            coalesce(col("_rr"), lit(0.0)).as("rr"), col("p_at_10"))
      }.reduce(_ unionByName _).orderBy(col("probe"))
    }),

    // nDCG@10 with binary same-label relevance over the q94 probes — the
    // graded-order retrieval metric (Järvelin & Kekäläinen 2002)
    // completing the MRR/precision eval family. Both DCG and the ideal
    // DCG fold as ordered 10-row window cumsums (total order → the float
    // fold is deterministic on both engines); ln(2) is a shared literal.
    "q270_ndcg" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, dir)
      val ln2 = lit(0.6931471805599453)
      Seq(0L, 100L, 300L).map { pid =>
        val q = graft.search.KnnSearch.vectorOf(emb, "vec_id", "embedding", pid)
        val pLabel = emb.filter(col("vec_id") === pid)
          .select(col("label").cast("long")).head().getLong(0)
        val w = Window.orderBy(col("score").desc, col("vec_id").asc)
        val iw = Window.orderBy(col("rel").desc, col("rank").asc)
        val dw = Window.orderBy(col("rank"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ew = Window.orderBy(col("irank"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        graft.search.KnnSearch.topK(
            emb.filter(col("vec_id") =!= pid), "vec_id", "embedding", q, 10)
          .join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
          .withColumn("rank", row_number().over(w)) // 10 rows — window is fine
          .withColumn("rel", when(col("label") === pLabel, 1L).otherwise(0L))
          .withColumn("irank", row_number().over(iw))
          .withColumn("dcum",
            sum(col("rel").cast("double") / (log(col("rank") + 1) / ln2)).over(dw))
          .withColumn("icum",
            sum(col("rel").cast("double") / (log(col("irank") + 1) / ln2)).over(ew))
          .agg(sum(col("rel")).as("hits"),
            max(col("dcum")).as("dcg_raw"), max(col("icum")).as("idcg_raw"))
          .select(lit(pid).as("probe"), col("hits"),
            round(col("dcg_raw"), 6).as("dcg"),
            round(col("idcg_raw"), 6).as("idcg"),
            when(col("idcg_raw") > 0, round(col("dcg_raw") / col("idcg_raw"), 6))
              .otherwise(lit(0.0)).as("ndcg"))
      }.reduce(_ unionByName _).orderBy(col("probe"))
    }),

    // Product quantization: 8 subspaces × k=4 L2-Lloyd codebooks (2
    // iterations, 6dp centroid contract). Output = per-subspace code
    // histogram + first centroid component as the fit witness.
    "q98_product_quant" -> ((s, dir) => {
      val (codes, cents) = graft.search.ProductQuant.fit(
        Tables.embeddings(s, dir), "vec_id", "embedding", 8, 4, 2)
      codes.groupBy(col("s"), col("cluster")).agg(count(lit(1)).as("n_points"))
        .join(cents.select(col("s"), col("cluster"),
          element_at(col("cent"), 1).as("c0")), Seq("s", "cluster"))
        .select(col("s").cast("long").as("s"), col("cluster"),
          col("n_points"), col("c0"))
        .orderBy(col("s"), col("cluster"))
    }),

    // Johnson–Lindenstrauss sign projection 64→16 (hash-derived matrix,
    // no RNG); first 4 output components as the per-row witness.
    "q90_random_projection" -> ((s, dir) =>
      graft.functions.RandomProjection.project(
        Tables.embeddings(s, dir), "vec_id", "embedding", 64, 16)
        .select(col("id").as("vec_id"),
          round(element_at(col("y"), 1), 6).as("y1"),
          round(element_at(col("y"), 2), 6).as("y2"),
          round(element_at(col("y"), 3), 6).as("y3"),
          round(element_at(col("y"), 4), 6).as("y4"))
        .orderBy(col("vec_id"))),

    // Result snippets: the display window between ranking and the user —
    // BM25 top-10, each with the first query-term hit position and the
    // fixed-width token window around it (codegen HOFs riding the same
    // scan as scoring; ship a window, not the document).
    "q75_snippets" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Bm25.search(docs, "doc_id", "text", QueryTerms, 10)
        .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
        .select(col("doc_id"), round(col("score"), 6).as("score"),
          Snippets.firstMatchPos(col("text"), QueryTerms).cast("long").as("match_pos"),
          Snippets.extract(col("text"), QueryTerms).as("snippet"))
        .orderBy(col("doc_id"))
    }),

    // §2.4 hybrid RRF fusion of dense + sparse rankings.
    "q16_hybrid_rrf" -> ((s, dir) => {
      val fetch = Hybrid.fetchSize(10)
      val dense = KnnSearch.topK(Tables.embeddings(s, dir), "vec_id", "embedding",
          queryVec(s, dir), fetch)
        .withColumnRenamed("vec_id", "id")
      val sparse = Bm25.search(Tables.documents(s, dir), "doc_id", "text", QueryTerms, fetch)
        .withColumnRenamed("doc_id", "id")
      Hybrid.rrf(dense, sparse, "id", 10)
        .select(col("id"), round(col("rrf_score"), 6).as("rrf_score"),
          col("rank_dense").cast("long").as("rank_dense"),
          col("rank_sparse").cast("long").as("rank_sparse"))
    }),

    // §7.4 scale path: sign-bit LSH bucket ANN with Hamming-1 probing.
    "q17_ann_lsh" -> ((s, dir) =>
      LshAnn.topK(Tables.embeddings(s, dir), "vec_id", "embedding",
          queryVec(s, dir), 5, nBits = 8)
        .select(col("vec_id"), col("bucket"), round(col("score"), 6).as("score"))),

    // §7.4 IVF partition-pruned ANN: 16 seeded centroids, probe 4.
    "q30_ann_ivf" -> ((s, dir) =>
      IvfAnn.topK(Tables.embeddings(s, dir), "vec_id", "embedding",
          queryVec(s, dir), 5, numClusters = 16, nprobe = 4)
        .select(col("vec_id"), col("cluster"), round(col("score"), 6).as("score"))),

    // §7.4 production IVF: centroids from a deterministic KMeans fit
    // (k=8, 2 Lloyd iterations — the q37 recipe), probe 2. Same probe
    // machinery as q30, better-balanced cells; the oracle replays the fit
    // unrolled in SQL and then probes it.
    "q46_ann_ivf_kmeans" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cents = graft.search.KMeans.fit(emb, "vec_id", "embedding", 8, 2)
      IvfAnn.topKWith(emb, "vec_id", "embedding", cents, queryVec(s, dir), 5, nprobe = 2)
        .select(col("vec_id"), col("cluster"), round(col("score"), 6).as("score"))
    }),

    // Incremental IVF maintenance (r12 depth wave): fit on the base 75%
    // (vec_id % 4 != 0), land the other 25% as the arriving batch, fold
    // it into the per-cluster means WITHOUT re-running Lloyd, and report
    // per cluster the centroid drift and how many indexed vectors the
    // drift would re-home — the re-fit-due signal. Every pass is a
    // broadcast-k argmax; the oracle replays fit + fold + re-home in SQL.
    "q306_ivf_recluster" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.search.IvfRecluster.report(
        emb.filter(col("vec_id") % 4 =!= 0),
        emb.filter(col("vec_id") % 4 === 0),
        "vec_id", "embedding", 8, 2)
    }),

    // int8 max-abs quantization of the vector index (4x memory at 100 TB):
    // per-vector code sums + saturation counts, exactly replayed by the
    // oracle (float32 max, float->double promotion, floor(x+0.5) half-up
    // — `round` differs between engines, floor(x+0.5) doesn't).
    "q59_vector_quant" -> ((s, dir) => {
      import graft.functions.VectorQuant
      Tables.embeddings(s, dir)
        .withColumn("_scale", VectorQuant.scaleOf(col("embedding")))
        .withColumn("_q", VectorQuant.quantize(col("embedding"), col("_scale")))
        .select(
          col("vec_id"),
          aggregate(col("_q"), lit(0L), (acc, x) => acc + x).as("sum_q"),
          size(filter(col("_q"), x => abs(x) === 127)).cast("long").as("n_sat"),
          round(col("_scale").cast("double"), 6).as("scale"))
        .orderBy(col("vec_id"))
    }),

    // Inverted-index posting lists over trigram phrases, df-banded
    // [5, 50] BEFORE the collect (no list can exceed 50 entries — the
    // stopword-straggler guard, proven by the band itself). The oracle
    // rebuilds every posting string, so order and membership both check.
    "q102_inverted_index" -> ((s, dir) => {
      import graft.search.InvertedIndex
      val terms = InvertedIndex.phraseTerms(Tables.documents(s, dir), "doc_id", "text", 3)
      InvertedIndex.postings(terms, "doc_id", "w", 5, 50)
        .orderBy(col("w"))
    }),

    // Vector-column QA before indexing: per label, zero-norm / NaN /
    // out-of-range / dimension-drift counts and the norm envelope. The
    // per-row norm folds the array IN ORDER (Spark `aggregate` and
    // DuckDB `list_sum` are both sequential left folds — bit-identical),
    // so even the float norms replay exactly. One codegen map + one
    // partial-agg rollup; the validation every embedding ingest should
    // run and almost none do.
    "q123_vector_qa" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .withColumn("_d", col("embedding").cast("array<double>"))
        .withColumn("_n2", expr("aggregate(_d, 0D, (acc, x) -> acc + x * x)"))
        .withColumn("_bad", expr("exists(_d, x -> isnan(x) OR abs(x) > 1e6)"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("_n2") === 0, 1L).otherwise(0L)).as("n_zero"),
          sum(when(col("_bad"), 1L).otherwise(0L)).as("n_bad"),
          countDistinct(size(col("embedding"))).as("n_dims"),
          round(min(sqrt(col("_n2"))), 6).as("min_norm"),
          round(max(sqrt(col("_n2"))), 6).as("max_norm"))
        .orderBy(col("label"))),

    // Referential integrity between the doc corpus and its vector index:
    // matched / unvectored / orphaned counts from ONE full-outer join on
    // the id. The audit that catches a half-finished embedding backfill
    // before search quality quietly degrades.
    "q124_ref_integrity" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"))
      val v = Tables.embeddings(s, dir).select(col("vec_id"))
      d.join(v, d("doc_id") === v("vec_id"), "full_outer")
        .agg(count(col("doc_id")).as("n_docs"),
          count(col("vec_id")).as("n_vecs"),
          sum(when(col("doc_id").isNotNull && col("vec_id").isNotNull, 1L)
            .otherwise(0L)).as("n_matched"),
          sum(when(col("vec_id").isNull, 1L).otherwise(0L)).as("n_unvectored"),
          sum(when(col("doc_id").isNull, 1L).otherwise(0L)).as("n_orphan_vecs"))
    }),

    // The SCALE path for q168 made load-bearing (r8 verdict's one `weak`):
    // index the src side in its q30 IVF home cell, multi-probe the tgt
    // side into its 4 nearest cells, and run the Artetxe-Schwenk margin
    // mining PER CELL — the candidate product is an equi-join on the cell
    // key (one shuffle per side), never the corpus×corpus crossJoin.
    // nprobe dials recall vs candidate volume (FAISS-style);
    // BitextRecallSpec floors recall vs exact q168 at two probe depths.
    "q203_bitext_bucketed" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cents = IvfAnn.centroids(emb, "vec_id", "embedding", 16)
      graft.search.BitextMine.mineBucketed(
          IvfAnn.assign(emb.filter(col("vec_id") % 2 === 0),
            "vec_id", "embedding", cents),
          IvfAnn.assignProbed(emb.filter(col("vec_id") % 2 === 1),
            "vec_id", "embedding", cents, nprobe = 4),
          "vec_id", "embedding", "cluster", k = 2, marginThreshold = 1.0)
        .select(col("bucket").cast("long").as("bucket"), col("src_id"),
          col("tgt_id"), col("cos"), col("margin"))
        .orderBy(col("margin").desc, col("src_id"), col("tgt_id")).limit(50)
    })
  )

  private val bm25Cte =
    """toks AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                     x -> len(x) > 1) AS t
      |  FROM documents
      |), dt AS (
      |  SELECT doc_id, len(t) AS dl, u.term, count(*) AS tf
      |  FROM toks, unnest(t) AS u(term)
      |  GROUP BY doc_id, dl, u.term
      |), stats AS (
      |  SELECT count(*) AS n, avg(len(t)) AS avgdl FROM toks
      |), model AS (
      |  SELECT term, count(DISTINCT doc_id) AS df FROM dt GROUP BY term
      |)""".stripMargin

  private val sparseCte =
    s"""$bm25Cte, sparse AS (
       |  SELECT doc_id AS id,
       |         sum( ln((stats.n - df + 0.5) / (df + 0.5))
       |              * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / stats.avgdl)) ) AS score
       |  FROM dt JOIN model USING (term) CROSS JOIN stats
       |  WHERE term IN ('spark', 'join', 'stream', 'window')
       |  GROUP BY doc_id
       |  ORDER BY score DESC, id LIMIT 50
       |)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q157_dim_stats" ->
      """SELECT i AS dim, round(avg(v[i]), 6) AS mean,
        |       round(stddev_pop(v[i]), 6) AS std,
        |       round(min(v[i]), 6) AS min_x, round(max(v[i]), 6) AS max_x,
        |       CAST(count(CASE WHEN v[i] = 0 THEN 1 END) AS BIGINT) AS n_zero
        |FROM (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |     (SELECT unnest(generate_series(1, 64)) AS i) dims
        |GROUP BY i ORDER BY dim""".stripMargin,

    // the penalty weight is written (1 - 0.7), not 0.3: IEEE 1-0.7 and
    // the literal 0.3 are DIFFERENT doubles, and the Spark side computes
    // (1 - lambda)
    "q155_mmr" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |cand AS (
        |  SELECT vec_id, v, round(list_cosine_similarity(v, (SELECT qv FROM q)), 6) AS rel
        |  FROM e WHERE vec_id <> 0
        |  ORDER BY rel DESC, vec_id LIMIT 20
        |),
        |sim AS (
        |  SELECT a.vec_id AS ia, b.vec_id AS ib,
        |         round(list_cosine_similarity(a.v, b.v), 6) AS s
        |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
        |),
        |p1 AS (SELECT vec_id, 0.7 * rel AS score FROM cand
        |       ORDER BY score DESC, vec_id LIMIT 1),
        |p2 AS (
        |  SELECT c.vec_id, 0.7 * c.rel - (1 - 0.7) * (SELECT max(s) FROM sim
        |    WHERE ia = c.vec_id AND ib IN (SELECT vec_id FROM p1)) AS score
        |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM p1)
        |  ORDER BY score DESC, c.vec_id LIMIT 1
        |),
        |p3 AS (
        |  SELECT c.vec_id, 0.7 * c.rel - (1 - 0.7) * (SELECT max(s) FROM sim
        |    WHERE ia = c.vec_id AND ib IN (SELECT vec_id FROM p1 UNION ALL SELECT vec_id FROM p2)) AS score
        |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM p1 UNION ALL SELECT vec_id FROM p2)
        |  ORDER BY score DESC, c.vec_id LIMIT 1
        |),
        |p4 AS (
        |  SELECT c.vec_id, 0.7 * c.rel - (1 - 0.7) * (SELECT max(s) FROM sim
        |    WHERE ia = c.vec_id AND ib IN (SELECT vec_id FROM p1 UNION ALL SELECT vec_id FROM p2
        |                                   UNION ALL SELECT vec_id FROM p3)) AS score
        |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM p1 UNION ALL SELECT vec_id FROM p2
        |                                     UNION ALL SELECT vec_id FROM p3)
        |  ORDER BY score DESC, c.vec_id LIMIT 1
        |),
        |p5 AS (
        |  SELECT c.vec_id, 0.7 * c.rel - (1 - 0.7) * (SELECT max(s) FROM sim
        |    WHERE ia = c.vec_id AND ib IN (SELECT vec_id FROM p1 UNION ALL SELECT vec_id FROM p2
        |                                   UNION ALL SELECT vec_id FROM p3 UNION ALL SELECT vec_id FROM p4)) AS score
        |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM p1 UNION ALL SELECT vec_id FROM p2
        |                                     UNION ALL SELECT vec_id FROM p3 UNION ALL SELECT vec_id FROM p4)
        |  ORDER BY score DESC, c.vec_id LIMIT 1
        |)
        |SELECT 1 AS pick, vec_id, round(score, 6) AS mmr_score FROM p1
        |UNION ALL SELECT 2, vec_id, round(score, 6) FROM p2
        |UNION ALL SELECT 3, vec_id, round(score, 6) FROM p3
        |UNION ALL SELECT 4, vec_id, round(score, 6) FROM p4
        |UNION ALL SELECT 5, vec_id, round(score, 6) FROM p5
        |ORDER BY pick""".stripMargin,

    "q151_matryoshka" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |tiers AS (SELECT unnest([8, 16, 32, 64]) AS d),
        |energy AS (
        |  SELECT d, round(avg(sqrt(list_sum(list_transform(v[1:d], x -> x*x))
        |                    / list_sum(list_transform(v, x -> x*x)))), 6) AS avg_energy
        |  FROM e, tiers GROUP BY d
        |),
        |probes AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 5),
        |scored AS (
        |  SELECT e.vec_id, probe_id, d,
        |         round(list_cosine_similarity(v[1:d], pv[1:d]), 6) AS cos
        |  FROM e, probes, tiers WHERE e.vec_id <> probe_id
        |),
        |topk AS (
        |  SELECT probe_id, d, vec_id
        |  FROM (SELECT probe_id, d, vec_id,
        |               row_number() OVER (PARTITION BY probe_id, d ORDER BY cos DESC, vec_id) AS rn
        |        FROM scored)
        |  WHERE rn <= 10
        |),
        |ft AS (SELECT probe_id, vec_id FROM topk WHERE d = 64),
        |ov AS (
        |  SELECT t.probe_id, t.d,
        |         sum(CASE WHEN ft.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS ov
        |  FROM topk t LEFT JOIN ft ON t.probe_id = ft.probe_id AND t.vec_id = ft.vec_id
        |  WHERE t.d <> 64
        |  GROUP BY 1, 2
        |),
        |pt AS (SELECT d, round(avg(ov), 6) AS avg_overlap, min(ov) AS min_overlap
        |       FROM ov GROUP BY d)
        |SELECT CAST(energy.d AS BIGINT) AS dim, avg_energy,
        |       coalesce(pt.avg_overlap, 10.0) AS avg_overlap,
        |       CAST(coalesce(pt.min_overlap, 10) AS BIGINT) AS min_overlap
        |FROM energy LEFT JOIN pt USING (d) ORDER BY dim""".stripMargin,

    "q168_bitext_mine" ->
      """WITH a AS (SELECT vec_id AS src_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE vec_id % 2 = 0),
        |b AS (SELECT vec_id AS tgt_id, CAST(embedding AS DOUBLE[]) AS v
        |      FROM embeddings WHERE vec_id % 2 = 1),
        |pairs AS (
        |  SELECT src_id, tgt_id,
        |         round(list_cosine_similarity(a.v, b.v), 6) AS cos
        |  FROM a, b
        |), r AS (
        |  SELECT src_id, tgt_id, cos,
        |         row_number() OVER (PARTITION BY src_id ORDER BY cos DESC, tgt_id) AS rna,
        |         row_number() OVER (PARTITION BY tgt_id ORDER BY cos DESC, src_id) AS rnb
        |  FROM pairs
        |), ma AS (SELECT src_id, avg(cos) AS ma FROM r WHERE rna <= 2 GROUP BY src_id),
        |mb AS (SELECT tgt_id, avg(cos) AS mb FROM r WHERE rnb <= 2 GROUP BY tgt_id)
        |SELECT src_id, tgt_id, cos,
        |       round(cos / ((ma + mb) / 2), 6) AS margin
        |FROM r JOIN ma USING (src_id) JOIN mb USING (tgt_id)
        |WHERE rna = 1 AND rnb = 1 AND round(cos / ((ma + mb) / 2), 6) >= 1.0
        |ORDER BY margin DESC, src_id LIMIT 50""".stripMargin,

    "q13_knn_cosine" ->
      """WITH qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT v FROM qv)), 6) AS score
        |FROM embeddings
        |ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT v FROM qv)) DESC, vec_id
        |LIMIT 10""".stripMargin,

    "q14_bm25_fit" ->
      s"""WITH $bm25Cte
         |SELECT term, df,
         |       round(ln(((SELECT n FROM stats) - df + 0.5) / (df + 0.5)), 6) AS idf
         |FROM model""".stripMargin,

    "q15_bm25_search" ->
      s"""WITH $bm25Cte
         |SELECT doc_id,
         |       round(sum( ln((stats.n - df + 0.5) / (df + 0.5))
         |              * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / stats.avgdl)) ), 6) AS score
         |FROM dt JOIN model USING (term) CROSS JOIN stats
         |WHERE term IN ('spark', 'join', 'stream', 'window')
         |GROUP BY doc_id
         |ORDER BY sum( ln((stats.n - df + 0.5) / (df + 0.5))
         |              * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / stats.avgdl)) ) DESC, doc_id
         |LIMIT 20""".stripMargin,

    "q81_centroid_drift" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |m AS (SELECT label, i, avg(v[i]) AS m
        |      FROM e, generate_series(1, 64) g(i) GROUP BY label, i),
        |c AS (SELECT label, list(m ORDER BY i) AS cent FROM m GROUP BY label),
        |d AS (SELECT e.label, list_cosine_similarity(e.v, c.cent) AS cs,
        |             sqrt(list_sum(list_transform(c.cent, x -> x * x))) AS cn
        |      FROM e JOIN c USING (label))
        |SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n,
        |       round(max(cn), 6) AS centroid_norm,
        |       round(avg(cs), 6) AS avg_cos,
        |       round(min(cs), 6) AS min_cos
        |FROM d GROUP BY label ORDER BY label""".stripMargin,

    "q85_embed_outlier" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |m AS (SELECT label, i, avg(v[i]) AS m
        |      FROM e, generate_series(1, 64) g(i) GROUP BY label, i),
        |c AS (SELECT label, list(m ORDER BY i) AS cent FROM m GROUP BY label),
        |d AS (SELECT e.vec_id, e.label, list_cosine_similarity(e.v, c.cent) AS cs
        |      FROM e JOIN c USING (label))
        |SELECT vec_id AS id, CAST(label AS BIGINT) AS grp,
        |       round(cs, 6) AS cos_centroid
        |FROM d WHERE cs < 0.0 ORDER BY id""".stripMargin,

    "q140_rbo" -> {
      def block(pid: Long): String =
        s"""SELECT CAST($pid AS BIGINT) AS probe,
           |       round(sum(power(0.9, o.d - 1) * o.cnt / o.d) * 0.1, 6) AS rbo,
           |       CAST(max(CASE WHEN o.d = 10 THEN o.cnt END) AS BIGINT) AS overlap10
           |FROM (
           |  SELECT dd.d, count(CASE WHEN j.ra <= dd.d AND j.rb <= dd.d THEN 1 END) AS cnt
           |  FROM (SELECT unnest(generate_series(1, 10)) AS d) dd, (
           |    SELECT ra.vec_id AS va, rb.vec_id AS vb, ra.r AS ra, rb.r AS rb
           |    FROM (SELECT vec_id, row_number() OVER (
           |            ORDER BY list_cosine_similarity(v, (SELECT v FROM e WHERE vec_id = $pid)) DESC,
           |                     vec_id) AS r
           |          FROM e WHERE vec_id <> $pid QUALIFY r <= 10) ra
           |    FULL JOIN (SELECT vec_id, row_number() OVER (
           |            ORDER BY list_cosine_similarity(qv, (SELECT qv FROM qe WHERE vec_id = $pid)) DESC,
           |                     vec_id) AS r
           |          FROM qe WHERE vec_id <> $pid QUALIFY r <= 10) rb
           |    ON ra.vec_id = rb.vec_id
           |  ) j
           |  GROUP BY dd.d
           |) o""".stripMargin
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |qe AS (
         |  SELECT vec_id,
         |         CASE WHEN list_max(list_transform(embedding, y -> abs(y))) = 0 THEN
         |           list_transform(embedding, x -> CAST(0 AS DOUBLE))
         |         ELSE
         |           list_transform(embedding, x ->
         |             floor(CAST(x AS DOUBLE)
         |                   / CAST(list_max(list_transform(embedding, y -> abs(y))) AS DOUBLE)
         |                   * 127.0 + 0.5))
         |         END AS qv
         |  FROM embeddings)
         |${Seq(0L, 100L, 300L).map(block).mkString("\nUNION ALL\n")}
         |ORDER BY probe""".stripMargin
    },

    "q270_ndcg" -> {
      def block(pid: Long): String =
        s"""SELECT CAST($pid AS BIGINT) AS probe, CAST(sum(rel) AS BIGINT) AS hits,
           |       round(max(dcum), 6) AS dcg, round(max(icum), 6) AS idcg,
           |       CASE WHEN max(icum) > 0 THEN round(max(dcum) / max(icum), 6) ELSE 0.0 END AS ndcg
           |FROM (
           |  SELECT *,
           |         sum(CAST(rel AS DOUBLE) / (ln(rank + 1) / 0.6931471805599453))
           |           OVER (ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dcum,
           |         sum(CAST(rel AS DOUBLE) / (ln(irank + 1) / 0.6931471805599453))
           |           OVER (ORDER BY irank ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS icum
           |  FROM (
           |    SELECT *, row_number() OVER (ORDER BY rel DESC, rank) AS irank
           |    FROM (
           |      SELECT e.vec_id,
           |             CASE WHEN e.label = (SELECT label FROM e WHERE vec_id = $pid) THEN 1 ELSE 0 END AS rel,
           |             row_number() OVER (
           |               ORDER BY list_cosine_similarity(e.v, (SELECT v FROM e WHERE vec_id = $pid)) DESC,
           |                        e.vec_id) AS rank
           |      FROM e WHERE e.vec_id <> $pid
           |      ORDER BY list_cosine_similarity(e.v, (SELECT v FROM e WHERE vec_id = $pid)) DESC, e.vec_id
           |      LIMIT 10)))""".stripMargin
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
         |${Seq(0L, 100L, 300L).map(block).mkString("\nUNION ALL\n")}
         |ORDER BY probe""".stripMargin
    },

    "q94_search_eval" -> {
      def block(pid: Long): String =
        s"""SELECT CAST($pid AS BIGINT) AS probe,
           |       round(coalesce(max(CASE WHEN label = (SELECT label FROM e WHERE vec_id = $pid)
           |                                THEN 1.0 / rank END), 0), 6) AS rr,
           |       count(CASE WHEN label = (SELECT label FROM e WHERE vec_id = $pid)
           |                  THEN 1 END) / 10.0 AS p_at_10
           |FROM (
           |  SELECT e.vec_id, e.label,
           |         row_number() OVER (
           |           ORDER BY list_cosine_similarity(e.v, (SELECT v FROM e WHERE vec_id = $pid)) DESC,
           |                    e.vec_id) AS rank
           |  FROM e WHERE e.vec_id <> $pid
           |  ORDER BY list_cosine_similarity(e.v, (SELECT v FROM e WHERE vec_id = $pid)) DESC, e.vec_id
           |  LIMIT 10)""".stripMargin
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
         |${Seq(0L, 100L, 300L).map(block).mkString("\nUNION ALL\n")}
         |ORDER BY probe""".stripMargin
    },

    "q98_product_quant" -> {
      def dist(sv: String, cent: String): String =
        s"list_sum(list_transform(generate_series(1, 8), i -> ($sv[i] - $cent[i]) * ($sv[i] - $cent[i])))"
      def assignCte(name: String, centsCte: String, keepSv: Boolean): String =
        s"""$name AS (SELECT vid, s, ${if (keepSv) "sv, " else ""}cluster FROM (
           |  SELECT sub.vec_id AS vid, sub.s, sub.sv, c.cluster,
           |         row_number() OVER (PARTITION BY sub.vec_id, sub.s
           |           ORDER BY ${dist("sub.sv", "c.cent")} ASC, c.cluster ASC) AS rn
           |  FROM sub JOIN $centsCte c ON c.s = sub.s) WHERE rn = 1)""".stripMargin
      def meanCte(name: String, assignCteName: String): String =
        s"""$name AS (SELECT s, cluster, list(m ORDER BY i) AS cent FROM (
           |  SELECT s, cluster, i, round(avg(sv[i]), 6) AS m
           |  FROM $assignCteName, (SELECT unnest(generate_series(1, 8)) AS i) dims
           |  GROUP BY s, cluster, i) GROUP BY s, cluster)""".stripMargin
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |sub AS (SELECT vec_id, s, v[s*8+1 : s*8+8] AS sv
         |        FROM e, (SELECT unnest(generate_series(0, 7)) AS s) ss),
         |seed AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cluster
         |         FROM (SELECT DISTINCT vec_id FROM sub ORDER BY vec_id LIMIT 4)),
         |c0 AS (SELECT s, cluster, sv AS cent FROM sub JOIN seed USING (vec_id)),
         |${assignCte("a1", "c0", keepSv = true)},
         |${meanCte("c1", "a1")},
         |${assignCte("a2", "c1", keepSv = true)},
         |${meanCte("c2", "a2")},
         |${assignCte("a3", "c2", keepSv = false)}
         |SELECT CAST(a.s AS BIGINT) AS s, CAST(a.cluster AS BIGINT) AS cluster,
         |       CAST(count(*) AS BIGINT) AS n_points, max(c.cent[1]) AS c0
         |FROM a3 a JOIN c2 c ON c.s = a.s AND c.cluster = a.cluster
         |GROUP BY a.s, a.cluster ORDER BY s, cluster""".stripMargin
    },

    "q90_random_projection" -> {
      def comp(j: Int): String =
        s"""round(list_sum(list_transform(generate_series(1, 64), i -> v[i] *
           |  (CASE WHEN (CAST(('0x'||substr(md5('rp:'||i||':'||$j),1,15)) AS BIGINT)
           |              % 2147483647) % 2 = 0 THEN 1 ELSE -1 END))) * 0.25, 6) AS y$j""".stripMargin
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
         |SELECT vec_id,
         |${(1 to 4).map(comp).mkString(",\n")}
         |FROM e ORDER BY vec_id""".stripMargin
    },

    "q75_snippets" ->
      s"""WITH $bm25Cte,
         |top AS (
         |  SELECT doc_id,
         |         sum( ln((stats.n - df + 0.5) / (df + 0.5))
         |              * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / stats.avgdl)) ) AS score
         |  FROM dt JOIN model USING (term) CROSS JOIN stats
         |  WHERE term IN ('spark', 'join', 'stream', 'window')
         |  GROUP BY doc_id
         |  ORDER BY score DESC, doc_id LIMIT 10),
         |ps AS (
         |  SELECT t.doc_id, top.score, t.t,
         |         least(coalesce(nullif(list_position(t.t, 'spark'), 0), 1000000),
         |               coalesce(nullif(list_position(t.t, 'join'), 0), 1000000),
         |               coalesce(nullif(list_position(t.t, 'stream'), 0), 1000000),
         |               coalesce(nullif(list_position(t.t, 'window'), 0), 1000000)) AS pos
         |  FROM toks t JOIN top USING (doc_id))
         |SELECT doc_id, round(score, 6) AS score,
         |       CAST(pos AS BIGINT) AS match_pos,
         |       array_to_string(t[greatest(pos - 5, 1) : greatest(pos - 5, 1) + 10], ' ') AS snippet
         |FROM ps ORDER BY doc_id""".stripMargin,

    "q16_hybrid_rrf" ->
      s"""WITH qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0),
         |dense AS (
         |  SELECT vec_id AS id,
         |         list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT v FROM qv)) AS score
         |  FROM embeddings
         |  ORDER BY score DESC, id LIMIT 50
         |), $sparseCte,
         |dr AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank_dense FROM dense),
         |sr AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank_sparse FROM sparse)
         |SELECT coalesce(dr.id, sr.id) AS id,
         |       round(coalesce(0.5 / (60 + rank_dense), 0) + coalesce(0.5 / (60 + rank_sparse), 0), 6) AS rrf_score,
         |       rank_dense, rank_sparse
         |FROM dr FULL OUTER JOIN sr ON dr.id = sr.id
         |ORDER BY (coalesce(0.5 / (60 + rank_dense), 0) + coalesce(0.5 / (60 + rank_sparse), 0)) DESC,
         |         coalesce(dr.id, sr.id)
         |LIMIT 10""".stripMargin,

    "q17_ann_lsh" ->
      """WITH qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0),
        |qb AS (
        |  SELECT (CASE WHEN v[1] >= 0 THEN 1 ELSE 0 END) + (CASE WHEN v[2] >= 0 THEN 2 ELSE 0 END)
        |       + (CASE WHEN v[3] >= 0 THEN 4 ELSE 0 END) + (CASE WHEN v[4] >= 0 THEN 8 ELSE 0 END)
        |       + (CASE WHEN v[5] >= 0 THEN 16 ELSE 0 END) + (CASE WHEN v[6] >= 0 THEN 32 ELSE 0 END)
        |       + (CASE WHEN v[7] >= 0 THEN 64 ELSE 0 END) + (CASE WHEN v[8] >= 0 THEN 128 ELSE 0 END) AS b
        |  FROM qv
        |), bucketed AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
        |         (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END) + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
        |       + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END) + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END)
        |       + (CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END) + (CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END)
        |       + (CASE WHEN embedding[7] >= 0 THEN 64 ELSE 0 END) + (CASE WHEN embedding[8] >= 0 THEN 128 ELSE 0 END) AS bucket
        |  FROM embeddings
        |)
        |SELECT vec_id, bucket,
        |       round(list_cosine_similarity(e, (SELECT v FROM qv)), 6) AS score
        |FROM bucketed
        |WHERE bucket IN (SELECT xor((SELECT b FROM qb), p)
        |                 FROM (SELECT unnest([0, 1, 2, 4, 8, 16, 32, 64, 128]) AS p))
        |ORDER BY list_cosine_similarity(e, (SELECT v FROM qv)) DESC, vec_id
        |LIMIT 5""".stripMargin,

    "q30_ann_ivf" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cents AS (SELECT vec_id AS cluster, v AS centroid FROM e ORDER BY vec_id LIMIT 16),
        |qv AS (SELECT v FROM e WHERE vec_id = 0),
        |assigned AS (
        |  SELECT vec_id, cluster, v FROM (
        |    SELECT e.vec_id, c.cluster, e.v,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY list_cosine_similarity(e.v, c.centroid) DESC, c.cluster) AS rn
        |    FROM e CROSS JOIN cents c
        |  ) WHERE rn = 1
        |),
        |probed AS (
        |  SELECT cluster FROM cents
        |  ORDER BY list_cosine_similarity(centroid, (SELECT v FROM qv)) DESC, cluster
        |  LIMIT 4
        |)
        |SELECT vec_id, cluster,
        |       round(list_cosine_similarity(v, (SELECT v FROM qv)), 6) AS score
        |FROM assigned JOIN probed USING (cluster)
        |ORDER BY list_cosine_similarity(v, (SELECT v FROM qv)) DESC, vec_id
        |LIMIT 5""".stripMargin,

    // the q37 unrolled 2-iteration Lloyd fit (c0 -> a1 -> c1 -> a2 -> c2),
    // then the q30 probe against the FITTED centroids
    "q46_ann_ivf_kmeans" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |qv AS (SELECT v FROM e WHERE vec_id = 0),
        |c0 AS (SELECT vec_id AS cluster, v AS cent FROM e ORDER BY vec_id LIMIT 8),
        |a1 AS (SELECT vec_id, v, cluster FROM (
        |  SELECT e.vec_id, e.v, c.cluster,
        |         row_number() OVER (PARTITION BY e.vec_id
        |                            ORDER BY list_cosine_similarity(e.v, c.cent) DESC, c.cluster ASC) AS rn
        |  FROM e, c0 c) WHERE rn = 1),
        |c1 AS (SELECT cluster, list(m ORDER BY i) AS cent FROM (
        |  SELECT cluster, i, round(avg(v[i]), 6) AS m
        |  FROM a1, (SELECT unnest(generate_series(1, 64)) AS i) dims
        |  GROUP BY cluster, i) GROUP BY cluster),
        |a2 AS (SELECT vec_id, v, cluster FROM (
        |  SELECT e.vec_id, e.v, c.cluster,
        |         row_number() OVER (PARTITION BY e.vec_id
        |                            ORDER BY list_cosine_similarity(e.v, c.cent) DESC, c.cluster ASC) AS rn
        |  FROM e, c1 c) WHERE rn = 1),
        |c2 AS (SELECT cluster, list(m ORDER BY i) AS cent FROM (
        |  SELECT cluster, i, round(avg(v[i]), 6) AS m
        |  FROM a2, (SELECT unnest(generate_series(1, 64)) AS i) dims
        |  GROUP BY cluster, i) GROUP BY cluster),
        |a3 AS (SELECT vec_id, v, cluster FROM (
        |  SELECT e.vec_id, e.v, c.cluster,
        |         row_number() OVER (PARTITION BY e.vec_id
        |                            ORDER BY list_cosine_similarity(e.v, c.cent) DESC, c.cluster ASC) AS rn
        |  FROM e, c2 c) WHERE rn = 1),
        |probed AS (
        |  SELECT cluster FROM c2
        |  ORDER BY list_cosine_similarity(cent, (SELECT v FROM qv)) DESC, cluster
        |  LIMIT 2
        |)
        |SELECT vec_id, cluster,
        |       round(list_cosine_similarity(v, (SELECT v FROM qv)), 6) AS score
        |FROM a3 JOIN probed USING (cluster)
        |ORDER BY list_cosine_similarity(v, (SELECT v FROM qv)) DESC, vec_id
        |LIMIT 5""".stripMargin,

    // the q46 unrolled fit on the base 75%, then the incremental fold:
    // batch assignment, merged round(avg,6) means, drift, and the
    // re-home count — step for step what IvfRecluster.report computes
    "q306_ivf_recluster" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |eb AS (SELECT * FROM e WHERE vec_id % 4 <> 0),
        |et AS (SELECT * FROM e WHERE vec_id % 4 = 0),
        |c0 AS (SELECT vec_id AS cluster, v AS cent FROM eb ORDER BY vec_id LIMIT 8),
        |a1 AS (SELECT vec_id, v, cluster FROM (
        |  SELECT eb.vec_id, eb.v, c.cluster,
        |         row_number() OVER (PARTITION BY eb.vec_id
        |                            ORDER BY list_cosine_similarity(eb.v, c.cent) DESC, c.cluster ASC) AS rn
        |  FROM eb, c0 c) WHERE rn = 1),
        |c1 AS (SELECT cluster, list(m ORDER BY i) AS cent FROM (
        |  SELECT cluster, i, round(avg(v[i]), 6) AS m
        |  FROM a1, (SELECT unnest(generate_series(1, 64)) AS i) dims
        |  GROUP BY cluster, i) GROUP BY cluster),
        |a2 AS (SELECT vec_id, v, cluster FROM (
        |  SELECT eb.vec_id, eb.v, c.cluster,
        |         row_number() OVER (PARTITION BY eb.vec_id
        |                            ORDER BY list_cosine_similarity(eb.v, c.cent) DESC, c.cluster ASC) AS rn
        |  FROM eb, c1 c) WHERE rn = 1),
        |c2 AS (SELECT cluster, list(m ORDER BY i) AS cent FROM (
        |  SELECT cluster, i, round(avg(v[i]), 6) AS m
        |  FROM a2, (SELECT unnest(generate_series(1, 64)) AS i) dims
        |  GROUP BY cluster, i) GROUP BY cluster),
        |ab AS (SELECT vec_id, v, cluster FROM (
        |  SELECT eb.vec_id, eb.v, c.cluster,
        |         row_number() OVER (PARTITION BY eb.vec_id
        |                            ORDER BY list_cosine_similarity(eb.v, c.cent) DESC, c.cluster ASC) AS rn
        |  FROM eb, c2 c) WHERE rn = 1),
        |at AS (SELECT vec_id, v, cluster FROM (
        |  SELECT et.vec_id, et.v, c.cluster,
        |         row_number() OVER (PARTITION BY et.vec_id
        |                            ORDER BY list_cosine_similarity(et.v, c.cent) DESC, c.cluster ASC) AS rn
        |  FROM et, c2 c) WHERE rn = 1),
        |u AS (SELECT cluster, v FROM ab UNION ALL SELECT cluster, v FROM at),
        |cn AS (SELECT cluster, list(m ORDER BY i) AS cent FROM (
        |  SELECT cluster, i, round(avg(v[i]), 6) AS m
        |  FROM u, (SELECT unnest(generate_series(1, 64)) AS i) dims
        |  GROUP BY cluster, i) GROUP BY cluster),
        |rb AS (SELECT vec_id, cluster AS cluster_new FROM (
        |  SELECT eb.vec_id, c.cluster,
        |         row_number() OVER (PARTITION BY eb.vec_id
        |                            ORDER BY list_cosine_similarity(eb.v, c.cent) DESC, c.cluster ASC) AS rn
        |  FROM eb, cn c) WHERE rn = 1),
        |mv AS (SELECT ab.cluster, count(*) AS n_base,
        |              sum(CASE WHEN rb.cluster_new <> ab.cluster THEN 1 ELSE 0 END) AS n_moved
        |       FROM ab JOIN rb USING (vec_id) GROUP BY ab.cluster),
        |np AS (SELECT cluster, count(*) AS n_new FROM at GROUP BY cluster)
        |SELECT CAST(c2.cluster AS BIGINT) AS cluster,
        |       CAST(mv.n_base AS BIGINT) AS n_base,
        |       CAST(coalesce(np.n_new, 0) AS BIGINT) AS n_new,
        |       round(1 - list_cosine_similarity(c2.cent, cn.cent), 6) + 0.0 AS drift,
        |       CAST(mv.n_moved AS BIGINT) AS n_moved
        |FROM c2 JOIN cn USING (cluster) JOIN mv ON mv.cluster = c2.cluster
        |LEFT JOIN np ON np.cluster = c2.cluster
        |ORDER BY cluster""".stripMargin,

    // float32 max-abs scale, float->double promotion, floor(x+0.5): the
    // exact arithmetic the Spark side performs, step for step.
    "q59_vector_quant" ->
      """WITH q AS (
        |  SELECT vec_id,
        |         list_max(list_transform(embedding, x -> abs(x))) AS scale,
        |         CASE WHEN list_max(list_transform(embedding, x -> abs(x))) = 0 THEN
        |           list_transform(embedding, x -> CAST(0 AS INTEGER))
        |         ELSE
        |           list_transform(embedding, x ->
        |             CAST(floor(CAST(x AS DOUBLE)
        |                        / CAST(list_max(list_transform(embedding, y -> abs(y))) AS DOUBLE)
        |                        * 127.0 + 0.5) AS INTEGER))
        |         END AS qv
        |  FROM embeddings)
        |SELECT vec_id,
        |       CAST(list_sum(qv) AS BIGINT) AS sum_q,
        |       CAST(len(list_filter(qv, x -> abs(x) = 127)) AS BIGINT) AS n_sat,
        |       round(CAST(scale AS DOUBLE), 6) AS scale
        |FROM q ORDER BY vec_id""".stripMargin,

    "q102_inverted_index" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 1) AS toks
        |  FROM documents),
        |g AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS w
        |      FROM t, (SELECT unnest(generate_series(1, 2000)) AS i) s
        |      WHERE i <= len(toks) - 2),
        |f AS (SELECT w, count(*) AS df FROM g GROUP BY w)
        |SELECT w, CAST(f.df AS BIGINT) AS df,
        |       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        |FROM g JOIN f USING (w) WHERE f.df BETWEEN 5 AND 50
        |GROUP BY w, f.df ORDER BY w""".stripMargin,

    "q123_vector_qa" ->
      """WITH e AS (
        |  SELECT label,
        |         len(embedding) AS dims,
        |         list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n2,
        |         len(list_filter(embedding, x -> isnan(CAST(x AS DOUBLE)) OR abs(x) > 1e6)) > 0 AS bad
        |  FROM embeddings)
        |SELECT label, CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(*) FILTER (WHERE n2 = 0) AS BIGINT) AS n_zero,
        |       CAST(count(*) FILTER (WHERE bad) AS BIGINT) AS n_bad,
        |       CAST(count(DISTINCT dims) AS BIGINT) AS n_dims,
        |       round(min(sqrt(n2)), 6) AS min_norm,
        |       round(max(sqrt(n2)), 6) AS max_norm
        |FROM e GROUP BY label ORDER BY label""".stripMargin,

    "q124_ref_integrity" ->
      """SELECT CAST(count(d.doc_id) AS BIGINT) AS n_docs,
        |       CAST(count(e.vec_id) AS BIGINT) AS n_vecs,
        |       CAST(count(*) FILTER (WHERE d.doc_id IS NOT NULL AND e.vec_id IS NOT NULL) AS BIGINT) AS n_matched,
        |       CAST(count(*) FILTER (WHERE e.vec_id IS NULL) AS BIGINT) AS n_unvectored,
        |       CAST(count(*) FILTER (WHERE d.doc_id IS NULL) AS BIGINT) AS n_orphan_vecs
        |FROM documents d FULL OUTER JOIN embeddings e ON d.doc_id = e.vec_id""".stripMargin,

    // q30's seeded-centroid assignment (src: home cell rn=1; tgt:
    // multi-probe rn<=4), then q168's margin math scoped per cell —
    // windows and neighborhood means partition by (cluster, id).
    "q203_bitext_bucketed" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cents AS (SELECT vec_id AS cluster, v AS centroid FROM e ORDER BY vec_id LIMIT 16),
        |ranked AS (
        |  SELECT e.vec_id, c.cluster, e.v,
        |         row_number() OVER (PARTITION BY e.vec_id
        |           ORDER BY list_cosine_similarity(e.v, c.centroid) DESC, c.cluster) AS rn
        |  FROM e CROSS JOIN cents c
        |),
        |a AS (SELECT cluster, vec_id AS src_id, v FROM ranked WHERE rn = 1 AND vec_id % 2 = 0),
        |b AS (SELECT cluster, vec_id AS tgt_id, v FROM ranked WHERE rn <= 4 AND vec_id % 2 = 1),
        |pairs AS (
        |  SELECT a.cluster, src_id, tgt_id,
        |         round(list_cosine_similarity(a.v, b.v), 6) AS cos
        |  FROM a JOIN b USING (cluster)
        |), r AS (
        |  SELECT cluster, src_id, tgt_id, cos,
        |         row_number() OVER (PARTITION BY cluster, src_id ORDER BY cos DESC, tgt_id) AS rna,
        |         row_number() OVER (PARTITION BY cluster, tgt_id ORDER BY cos DESC, src_id) AS rnb
        |  FROM pairs
        |), ma AS (SELECT cluster, src_id, avg(cos) AS ma FROM r WHERE rna <= 2 GROUP BY cluster, src_id),
        |mb AS (SELECT cluster, tgt_id, avg(cos) AS mb FROM r WHERE rnb <= 2 GROUP BY cluster, tgt_id)
        |SELECT CAST(r.cluster AS BIGINT) AS bucket, src_id, tgt_id, cos,
        |       round(cos / ((ma + mb) / 2), 6) AS margin
        |FROM r JOIN ma USING (cluster, src_id) JOIN mb USING (cluster, tgt_id)
        |WHERE rna = 1 AND rnb = 1 AND round(cos / ((ma + mb) / 2), 6) >= 1.0
        |ORDER BY margin DESC, src_id, tgt_id LIMIT 50""".stripMargin
  )
}
