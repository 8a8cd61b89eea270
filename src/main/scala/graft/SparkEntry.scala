package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every registered query module; each module is a Seq[QDef]
  * pairing the Spark implementation with its DuckDB oracle SQL. */
object SparkEntry {

  private def modules: Seq[QDef] =
    graft.queries.RelationalQueries.all ++
      graft.queries.GraphQueries.all ++
      graft.queries.ErQueries.all ++
      graft.queries.ExtQueries.all ++
      graft.queries.TrainPrepQueries.all ++
      graft.queries.JoinQueries.all ++
      graft.queries.AnalyticsQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The matching-attribute-entities query (SURVEY.md §7.2, reference
    * `01_aml_network_analysis.py:52-68`). */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_shared_attr")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
