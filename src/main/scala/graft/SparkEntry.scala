package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 is exercised by at least one
  * entry in [[queries]]; entries with a DuckDB-runnable equivalent also
  * appear in [[oracleSql]] (the driver's correctness gate).
  */
object SparkEntry {

  /** All registered query definitions, grouped by module. */
  def allDefs: Seq[QueryDef] =
    graft.queries.CoreQueries.defs ++
    graft.queries.JoinQueries.defs ++
    graft.queries.OrderedQueries.defs ++
    graft.queries.ShapeQueries.defs ++
    graft.queries.TextQueries.defs ++
    graft.queries.EmbeddingQueries.defs ++
    graft.queries.StdlibQueries.defs ++
    graft.queries.IoQueries.defs ++
    graft.queries.ParseQueries.defs ++
    graft.queries.StatsQueries.defs ++
    graft.queries.AnalysisQueries.defs ++
    graft.queries.GeoQueries.defs ++
    graft.queries.OlapQueries.defs ++
    graft.queries.Olap2Queries.defs ++
    graft.queries.TemporalQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs.head.fn(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
