package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, CoreQueries, StreamingQueries, TpchQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the relational inventory (SURVEY §2.3
  * Q1–Q25, [[graft.queries.CoreQueries]]) and the north-star analytics
  * inventory (Q24–Q36, [[graft.queries.AnalyticsQueries]]). Every entry
  * with a SQL-expressible semantics also appears in [[oracleSql]] with
  * identical output column names.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shaped hash aggregation (SURVEY §2.3 Q13).
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q13_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ AnalyticsQueries.queries ++
      StreamingQueries.queries ++ TpchQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ AnalyticsQueries.oracles ++
      StreamingQueries.oracles ++ TpchQueries.oracles
}
