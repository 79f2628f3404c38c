package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are organized per SURVEY §2 area under [[graft.queries]]; each map
  * key names the §2 operator(s) it covers. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.UpdateQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.AnnQueries.queries ++
      graft.queries.SurfaceQueries.queries ++
      graft.queries.GraphQueries.queries ++
      graft.queries.OpsQueries.queries ++
      graft.queries.AnalyticsQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.WebQueries.queries ++
      graft.queries.SearchQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracle ++
      graft.queries.UpdateQueries.oracle ++
      graft.queries.PipelineQueries.oracle ++
      graft.queries.TextQueries.oracle ++
      graft.queries.DedupQueries.oracle ++
      graft.queries.AnnQueries.oracle ++
      graft.queries.SurfaceQueries.oracle ++
      graft.queries.GraphQueries.oracle ++
      graft.queries.OpsQueries.oracle ++
      graft.queries.AnalyticsQueries.oracle ++
      graft.queries.CurationQueries.oracle ++
      graft.queries.WebQueries.oracle ++
      graft.queries.SearchQueries.oracle
}
