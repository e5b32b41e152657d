package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table access + oracle-exactness helpers shared by all query modules.
  *
  * Exactness discipline (SURVEY.md §5): every aggregate that the DuckDB
  * oracle re-computes must be bit-identical across engines. Sums of
  * doubles are order-dependent, so monetary aggregates are computed over
  * scaled integers (cents / 10^-4 / 10^-6 units) which sum exactly in any
  * order, then divided back to a double at the end — the final
  * integer→double conversion and division are IEEE-deterministic and
  * identical in Spark and DuckDB.
  */
object Tables {

  /** Load a driver testdata table: `$dir/$name.parquet`.
    *
    * events.ts has shipped as two physical types across driver testdata
    * generations, so the loader adapts to what is actually on disk and
    * always yields session-tz TIMESTAMP (all entry points pin UTC):
    *  - TIMESTAMP(NANOS), which Spark 4 refuses ([PARQUET_TYPE_ILLEGAL]):
    *    read as raw nanos (legacy conf) and convert with integer
    *    division — `ts div 1000` stays exact where a double division
    *    would lose precision at 1e18 magnitudes;
    *  - timestamp[us] without tz (current generation): Spark infers
    *    TIMESTAMP_NTZ; cast to TIMESTAMP, which under the UTC session tz
    *    matches DuckDB's epoch() of the same naive value exactly.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.schema(inferredSchema(spark, dir, name))
        .parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
    } else spark.read.schema(inferredSchema(spark, dir, name))
      .parquet(s"$dir/$name.parquet")

  /** Footer-inferred schema, memoized per (application, dir, table):
    * a bench/verify run builds each table's frame hundreds of times,
    * and every bare `spark.read.parquet` re-reads the footer on the
    * driver for schema inference (r17, guide §1 — this is the
    * catalog's job in a real deployment: schemas are known, scans
    * don't re-infer). A SCHEMA memo only — every action still reads
    * the data from parquet; results never cache here. Keyed on the
    * applicationId so a fresh session (or a test's own session)
    * re-infers.
    *
    * IMMUTABLE-INPUT assumption (ADVICE r17 #2): the driver testdata
    * tables never change within one application, so the memo has no
    * invalidation. A deployment that regenerates a table AT THE SAME
    * PATH with a different schema inside one Spark application would
    * read it with the stale schema — key the memo on a footer
    * fingerprint / file mtime before enabling in-app regeneration. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String), org.apache.spark.sql.types.StructType]
  private def inferredSchema(spark: SparkSession, dir: String,
      name: String): org.apache.spark.sql.types.StructType =
    schemaCache.computeIfAbsent(
      (spark.sparkContext.applicationId, dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet").schema)

  /** Exact sum of a fixed-point value with `scale` decimal digits:
    * round to scaled integer per row (exact: inputs are decimal-valued),
    * sum as long (exact), divide back (deterministic). The SQL twin is
    * `SUM(CAST(round(expr * 10^scale) AS BIGINT)) / 10^scale.0`.
    *
    * Cross-engine INTEGER-DIVISION warning for oracle authors: Spark's
    * `div` truncates toward zero, and DuckDB 1.0's `//` was MEASURED
    * to also truncate ((-7) // 2 = -3; PcaSpec pins the Spark side) —
    * but floor-vs-truncate semantics for `//` differ across DuckDB
    * versions/docs, so negative divisions remain a portability hazard.
    * Prefer provably non-negative operands (every relational query
    * here does); where a signed quotient is intrinsic (Pca's fixed-
    * point renormalization), both engines' truncation must be pinned
    * by a green oracle query, or ship the (sum, count) pair instead
    * of the quotient (see TextOps.qCentroids).
    */
  def exactSum(e: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    sum(round(e * lit(f)).cast("long")) / lit(f)
  }

  /** Exact average of a fixed-point value (exact integer sum / count). */
  def exactAvg(e: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    sum(round(e * lit(f)).cast("long")) / lit(f) / count(lit(1))
  }

  /** SQL twin of [[exactSum]] for the DuckDB oracle. */
  def sqlExactSum(expr: String, scale: Int): String = {
    val f = "1" + "0" * scale
    s"SUM(CAST(round(($expr) * $f) AS BIGINT)) / $f.0"
  }

  /** SQL twin of [[exactAvg]]. */
  def sqlExactAvg(expr: String, scale: Int): String = {
    val f = "1" + "0" * scale
    s"SUM(CAST(round(($expr) * $f) AS BIGINT)) / $f.0 / COUNT(1)"
  }
}
