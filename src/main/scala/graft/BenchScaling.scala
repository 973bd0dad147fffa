package graft

import org.apache.spark.sql.SparkSession

/** Scaling-exponent audit: times the most expensive gates at successive
  * scale decades and reports the measured exponent
  * `ln(t_hi/t_lo) / ln(rows_hi/rows_lo)` against each query's DOCUMENTED
  * complexity ceiling — sf0.1 alone can hide O(n²) creep (q168's exact
  * miner benched fine while being quadratic; this audit is what catches
  * the next one).
  *
  * Decades: events/lineitem-backed gates run sf0.01 → sf0.1 → the
  * [[ScaleData]]-synthesized sf1 (three decades); documents/embeddings
  * gates run the genuine sf0.01 → sf0.1 decade (their tables grow 10×/4×
  * there; a replicated sf1 would manufacture cross-replica duplicates and
  * distort every dedup/ANN bucket — see ScaleData's header).
  *
  * Output: BENCH_scaling.json — per query, per decade: seconds (min of
  * 2 passes), table-growth factor, measured exponent, documented ceiling,
  * and a flag when measured > ceiling + 0.35 (sub-second samples carry
  * scheduling noise; the slack absorbs it).
  */
object BenchScaling {

  /** query -> (primary table, documented complexity-exponent ceiling,
    * events/relational? (true = may use the synthesized sf1)).
    */
  val Audit: Seq[(String, (String, Double, Boolean))] = Seq(
    // relational / events — linear shapes, three decades
    "q1_agg" -> (("lineitem", 1.0, true)),
    "q2_join_dim" -> (("lineitem", 1.0, true)),
    "q66_rollup_stats" -> (("lineitem", 1.0, true)),
    "q117_star_join" -> (("lineitem", 1.0, true)),
    "q161_local_supplier" -> (("lineitem", 1.0, true)),
    "q8_events_window" -> (("events", 1.0, true)),
    "q9_sessionize" -> (("events", 1.0, true)),
    "q33_salted_agg" -> (("events", 1.0, true)),
    "q47_asof_join" -> (("events", 1.0, true)),
    "q80_salted_join" -> (("events", 1.0, true)),
    "q146_session_funnel" -> (("events", 1.0, true)),
    "q164_funnel_latency" -> (("events", 1.0, true)),
    "q204_ewma_replay" -> (("events", 1.0, true)),
    "q205_dgim_replay" -> (("events", 1.0, true)),
    // documents — linear map/agg shapes
    "q92_bpe_tokens" -> (("documents", 1.0, false)),
    "q102_inverted_index" -> (("documents", 1.0, false)),
    "q105_lm_buckets" -> (("documents", 1.0, false)),
    "q108_hll_rollup" -> (("documents", 1.0, false)),
    "q133_boilerplate" -> (("documents", 1.0, false)),
    "q174_langid_eval" -> (("documents", 1.0, false)),
    "q153_source_overlap" -> (("documents", 1.0, false)), // df-band cap BEFORE pair join
    // documents — bucketed/banded pair joins: candidate volume grows with
    // bucket occupancy, documented ceiling 1.5
    "q21_ngram_jaccard" -> (("documents", 1.5, false)),
    "q36_dup_clusters" -> (("documents", 1.5, false)),
    "q86_minhash_calibration" -> (("documents", 1.5, false)),
    "q87_curation_funnel" -> (("documents", 1.5, false)),
    "q97_shared_fragments" -> (("documents", 1.5, false)),
    "q112_prefix_join" -> (("documents", 1.5, false)),
    "q132_split_leakage" -> (("documents", 1.5, false)),
    "q147_dup_spans" -> (("documents", 1.5, false)),
    "q91_label_prop" -> (("documents", 1.0, false)),
    "q126_hits" -> (("documents", 1.0, false)),
    "q184_textrank" -> (("documents", 1.0, false)),
    // embeddings
    "q89_cluster_rep" -> (("embeddings", 1.0, false)),
    "q98_product_quant" -> (("embeddings", 1.0, false)),
    "q156_cluster_purity" -> (("embeddings", 1.0, false)),
    "q168_bitext_mine" -> (("embeddings", 2.0, false)), // documented quadratic exact miner
    "q203_bitext_bucketed" -> (("embeddings", 2.0, false)) // per-cell product; cells don't multiply under fixed K
  )

  def main(args: Array[String]): Unit = {
    val sf1Dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // JIT warmup

    val dirs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1", sf1Dir)
    val haveSf1 = new java.io.File(s"$sf1Dir/lineitem.parquet").exists()

    def rows(dir: String, table: String): Long =
      spark.read.parquet(s"$dir/$table.parquet").count()

    def timeOne(name: String, dir: String): Double = {
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }

    val sb = new StringBuilder
    sb.append("{\"decades\":[")
    var first = true
    for ((name, (table, ceiling, relational)) <- Audit) {
      val useDirs = if (relational && haveSf1) dirs else dirs.take(2)
      val times = useDirs.map(d => d -> timeOne(name, d))
      val counts = useDirs.map(d => d -> rows(d, table)).toMap
      for (Seq((dLo, tLo), (dHi, tHi)) <- times.sliding(2)) {
        val growth = counts(dHi).toDouble / counts(dLo)
        val exp = math.log(tHi / tLo) / math.log(growth)
        val flag = exp > ceiling + 0.35
        if (!first) sb.append(",")
        first = false
        sb.append(
          f"""{"q":"$name","table":"$table","lo":"$dLo","hi":"$dHi","lo_sec":$tLo%.3f,"hi_sec":$tHi%.3f,"growth":$growth%.2f,"exponent":$exp%.3f,"ceiling":$ceiling%.1f,"flag":$flag}""")
        println(f"[scaling] $name%-24s $dLo%-24s -> $dHi%-24s growth=$growth%5.2f t=$tLo%6.2f->$tHi%6.2f exp=$exp%6.3f ceil=$ceiling%.1f ${if (flag) "FLAG" else ""}")
      }
    }
    sb.append("]}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_scaling.json"), sb.toString + "\n")
    spark.stop()
  }
}
