package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates query registries from every module; each module owns the
  * queries for the SURVEY.md §2 operators it implements, plus DuckDB
  * oracle SQL where the semantics are SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q3ShippingPriority(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Iterative.queries ++ ops.Events.queries ++
      ops.TextOps.queries ++ ops.ScrubOps.queries ++ ops.MiningOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracleSql ++ ops.Iterative.oracleSql ++ ops.Events.oracleSql ++
      ops.TextOps.oracleSql ++ ops.ScrubOps.oracleSql ++ ops.MiningOps.oracleSql
}
