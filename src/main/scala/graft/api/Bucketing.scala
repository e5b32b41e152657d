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
}
