package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises one operator from SURVEY.md §2, expressed
  * over the driver testdata tables; `oracleSql` holds the DuckDB-equivalent
  * SQL. Column names are aliased identically on both sides (the driver's
  * compare sorts columns by name before hashing values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map[String, (SparkSession, String) => DataFrame](
    // §2.1/§2.4 baseline: partial-agg groupBy (map-side combine, single shuffle).
    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("cnt")
        )
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    })
  ) ++ graft.queries.RelationalQueries.defs ++ graft.queries.SearchQueries.defs ++
    graft.queries.DedupQueries.defs ++ graft.queries.TextQueries.defs ++
    graft.queries.EngineQueries.defs ++ graft.queries.ChatQueries.defs ++
    graft.queries.IndexBenchQueries.defs ++ graft.queries.PipelineQueries.defs ++
    graft.queries.TemporalQueries.defs ++ graft.queries.MultimodalQueries.defs ++
    graft.queries.CorpusQueries.defs ++ graft.queries.AnalyticsQueries.defs

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |       count(*) AS cnt
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) ++ graft.queries.RelationalQueries.oracles ++ graft.queries.SearchQueries.oracles ++
    graft.queries.DedupQueries.oracles ++ graft.queries.TextQueries.oracles ++
    graft.queries.EngineQueries.oracles ++ graft.queries.ChatQueries.oracles ++
    graft.queries.IndexBenchQueries.oracles ++
    graft.queries.PipelineQueries.oracles ++ graft.queries.TemporalQueries.oracles ++
    graft.queries.MultimodalQueries.oracles ++ graft.queries.CorpusQueries.oracles ++
    graft.queries.AnalyticsQueries.oracles
}
