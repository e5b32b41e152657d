package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry surface. The reference has no SQL layer (SURVEY.md §3.2)
  * — Spark's own parser/analyzer is the strict superset. This helper
  * registers the driver tables as temp views so users (and the query
  * corpus) can run plain ANSI SQL against the same catalog names the
  * DuckDB oracle uses, making Spark-vs-oracle parity a single shared
  * SQL string.
  */
object GraftSession {

  val TableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every driver table under its bare name. Idempotent. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    TableNames.foreach { n =>
      Tables.t(spark, dir, n).createOrReplaceTempView(n)
    }

  /** Run SQL against the registered tables. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(query)
  }
}
