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

  // Weak-keyed by session (so a closed session can be collected);
  // value maps table name -> the dir its temp view was built from.
  // Temp views are namespaced only by (session, table): memoizing on
  // (session, dir, table) would silently serve dirA's view after a
  // dirB registration (e.g. mixing scale factors in one session).
  private val registered =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, String]]()

  /** Register driver tables under their bare names. Memoized per
    * (session, table) — creating a DataFrame reads the parquet footer
    * for its schema, so re-registering all 10 tables per query would
    * cost seconds — and re-registered whenever `dir` differs from the
    * one the live view was built from. */
  def registerTables(spark: SparkSession, dir: String,
      tables: Seq[String] = TableNames): Unit = synchronized {
    val byTable = registered.computeIfAbsent(spark,
      _ => scala.collection.mutable.Map.empty[String, String])
    tables.foreach { n =>
      if (!byTable.get(n).contains(dir)) {
        Tables.t(spark, dir, n).createOrReplaceTempView(n)
        byTable(n) = dir
      }
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
