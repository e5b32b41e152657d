package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers for co-located joins (100 TB posture).
  *
  * Two fact tables bucketed+sorted on the same key join with ZERO
  * exchanges — the physical layout replaces the shuffle, which is the
  * difference between an hourly and a multi-hour join at 100 TB. The
  * reference's analogue is its ship-strategy FORWARD on pre-partitioned
  * channels ([U] ShipStrategyType.FORWARD; SURVEY.md §2.7/§4.1
  * "property reuse"); Spark's is bucketed catalog tables.
  * BucketingSpec proves the no-Exchange plan shape.
  */
object Bucketing {

  /** Persist a DataFrame as a bucketed, in-bucket-sorted catalog
    * table. Join keys must equal the bucket columns for exchange-free
    * joins; `buckets` should divide evenly into cluster cores. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** DROP TABLE IF EXISTS plus stale-directory cleanup: an in-memory
    * catalog forgets managed tables across sessions but their
    * warehouse directories survive, and a fresh session's saveAsTable
    * then dies with LOCATION_ALREADY_EXISTS. The manual path delete
    * runs ONLY when the catalog had no table of that name (the stale
    * case) — if the catalog knew the table, DROP TABLE already
    * handled its storage, and for an external table deliberately left
    * the data alone; deleting the warehouse path then could destroy
    * an external table's location or unrelated data that merely
    * shares the name (ADVICE r7 #1). */
  def resetManaged(spark: SparkSession, name: String): Unit = {
    val existed = spark.catalog.tableExists(name)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    if (!existed) {
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val path = new org.apache.hadoop.fs.Path(wh, name.toLowerCase)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) fs.delete(path, true)
    }
  }
}
