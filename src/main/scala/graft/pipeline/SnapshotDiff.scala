package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the incremental-ingest primitive: given two
  * versions of a table (yesterday's crawl and today's), classify every
  * key as `added` / `removed` / `changed` / `same` by comparing a
  * content fingerprint, so downstream stages (dedup, scoring,
  * embedding) re-run only on `added`+`changed` instead of the full
  * corpus.
  *
  * 100 TB posture: ONE full-outer keyed shuffle join on the id — the
  * minimum information-theoretic cost of an unordered diff; the
  * fingerprint (a long) travels instead of the payload, so shuffle
  * volume is rows x ~16 bytes regardless of document size. With both
  * snapshots bucketed on the key (graft.api.Bucketing) the exchange
  * disappears entirely.
  */
object SnapshotDiff {

  /** Per-key status frame: (key, status) for every key present in
    * either snapshot. `fpCol` must be a deterministic content
    * fingerprint column (e.g. built with
    * [[graft.text.TextFunctions.fingerprint]]). CONTRACT: `keyCol`
    * is unique within each snapshot — on duplicate keys the
    * full-outer join would emit one row per cross-side pairing, not
    * one per key (run exact dedup first if the source can repeat
    * keys). */
  def diff(prev: DataFrame, next: DataFrame, keyCol: String,
      fpCol: String): DataFrame = {
    val a = prev.select(col(keyCol).as("key"), col(fpCol).as("fp_prev"))
    val b = next.select(col(keyCol).as("key"), col(fpCol).as("fp_next"))
    a.join(b, Seq("key"), "full_outer")
      .select(col("key"),
        when(col("fp_prev").isNull, lit("added"))
          .when(col("fp_next").isNull, lit("removed"))
          .when(col("fp_prev") === col("fp_next"), lit("same"))
          .otherwise(lit("changed")).as("status"))
  }

  /** SCD-style UPSERT — apply a delta to a corpus: delta rows replace
    * same-key corpus rows, new-key delta rows insert, untouched
    * corpus rows pass through (the companion WRITE primitive to
    * [[diff]]'s classify). Same unique-key contract as diff.
    *
    * 100 TB posture: one anti join of the corpus against the DELTA'S
    * KEYS (a one-column frame — broadcastable whenever the delta is a
    * day's crawl) plus a union — the corpus payload never shuffles
    * when the key frame broadcasts, and never travels twice. */
  def upsert(prev: DataFrame, next: DataFrame, keyCol: String): DataFrame =
    next.unionByName(
      prev.join(next.select(col(keyCol)), Seq(keyCol), "left_anti"))
}
