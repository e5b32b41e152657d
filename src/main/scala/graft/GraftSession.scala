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

  private val registered = scala.collection.mutable.Set[(SparkSession, String, String)]()

  /** Register driver tables under their bare names. Memoized —
    * creating a DataFrame reads the parquet footer for its schema, so
    * re-registering all 10 tables per query would cost seconds. */
  def registerTables(spark: SparkSession, dir: String,
      tables: Seq[String] = TableNames): Unit = synchronized {
    tables.foreach { n =>
      if (registered.add((spark, dir, n)))
        Tables.t(spark, dir, n).createOrReplaceTempView(n)
    }
  }

  /** Run SQL against the registered tables (narrow `tables` to skip
    * schema reads for relations the query doesn't touch). */
  def sql(spark: SparkSession, dir: String, query: String,
      tables: Seq[String] = TableNames): DataFrame = {
    registerTables(spark, dir, tables)
    spark.sql(query)
  }
}
