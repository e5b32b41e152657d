package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the LATEST right
  * row whose timestamp is <= the left row's timestamp, within the
  * same key — the time-series lookup operator (price as of trade
  * time, last click before purchase). Spark has no native ASOF join;
  * the naive range-join formulation explodes to a per-row interval
  * probe (O(|L| x matches) with a full sort-merge under it).
  *
  * This implementation is the scalable union form: tag both sides,
  * union them (no join at all), ONE hash shuffle on the key, one
  * partition sort by (ts, side), and a running last_value(ignoreNulls)
  * window carries each right payload forward to the left rows that
  * follow it in time. Cost is a single exchange + sort over |L|+|R|
  * regardless of match fan-out — the same shape Catalyst plans for any
  * windowed aggregation, so it scales exactly like a groupBy.
  *
  * Equal timestamps: the right row sorts BEFORE the left row (side 0
  * < 1), so a right row at exactly t matches a left row at t —
  * DuckDB's `ASOF JOIN ... ON l.ts >= r.ts` semantics. Multiple right
  * rows on the same (key, ts) resolve to the last one in `tieBreak`
  * order (pass the payload itself, or a unique id, for a total
  * order).
  *
  * Left rows with no preceding right row keep NULL payloads (ASOF
  * LEFT JOIN semantics).
  */
object AsOf {

  /** @param key       equi-join key columns (present on both sides)
    * @param leftTs    left event-time column (any orderable type)
    * @param rightTs   right event-time column (same type domain)
    * @param payload   right columns to carry onto each left row
    * @param tieBreak  extra right-side ordering under equal (key, ts)
    * @return left rows (all columns) + the as-of right payload */
  def join(left: DataFrame, right: DataFrame, key: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    val reserved = (left.columns ++ right.columns).filter(c =>
      c == "__ts" || c == "__side" || c == "__p" || c.startsWith("__o_"))
    require(reserved.isEmpty,
      s"asof join reserves the __ts/__side/__p/__o_* column names; " +
        s"rename: ${reserved.mkString(", ")}")
    val rSchema = right.schema
    // The payload travels as ONE struct, not per-column windows: a struct
    // built from a right row is non-null even when every field in it is
    // NULL, so last(ignoreNulls) skips exactly the left rows' slots and
    // picks the matched right row ATOMICALLY. Per-column carries would
    // skip a genuinely-NULL payload value (returning a stale older value)
    // and could mix fields from different right rows — diverging from
    // ASOF semantics (the matched row's values, NULLs included).
    val pType = org.apache.spark.sql.types.StructType(
      payload.map(p => org.apache.spark.sql.types.StructField(p, rSchema(p).dataType)))
    // align the two sides for the union: left keeps its columns and
    // nulls the payload slot; right contributes key+ts+payload only
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(pType))
      .withColumns(tieBreak.map(t =>
        s"__o_$t" -> lit(null).cast(rSchema(t).dataType)).toMap)
    val leftOnly = left.columns.filterNot(key.contains).toSeq
    val rTagged = right
      .select(((key.map(col) :+ col(rightTs).as("__ts")) :+
        struct(payload.map(p => col(p).as(p)): _*).cast(pType).as("__p")) ++
        tieBreak.map(t => col(t).as(s"__o_$t")): _*)
      .withColumn("__side", lit(0))
      .withColumns(leftOnly.map(c =>
        c -> lit(null).cast(left.schema(c).dataType)).toMap)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("__ts") +: col("__side") +: tieBreak.map(t => col(s"__o_$t")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged.select(lTagged.columns.toIndexedSeq.map(col): _*))
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        payload.map(p => col("__p").getField(p).as(s"asof_$p")): _*)
  }
}
