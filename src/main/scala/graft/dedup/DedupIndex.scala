package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistable MinHash-LSH index — the INCREMENTAL dedup shape: sign
  * the corpus once, write the band buckets as catalog tables, and
  * check each day's new documents against the index without
  * re-signing or re-shuffling the historical corpus.
  *
  * Storage layout (normalized, VERDICT r6 #2): TWO tables per index —
  * `<table>_bands(doc_id, band_idx, band_key)` bucketed on band_key
  * (the candidate-join side; ids only, ~3 longs per row) and
  * `<table>_sv(doc_id, sv)` bucketed on doc_id (each doc's distinct
  * shingle array stored exactly ONCE). The earlier single-table form
  * carried the full `sv` array on every (doc, band) row — 8× the
  * corpus's shingle footprint on disk and arrays riding through the
  * candidate shuffle — which is precisely what dies first at 100 TB.
  *
  * 100 TB posture: the bands table is bucketed on `band_key`, so the
  * delta's candidate join clusters on the stored layout instead of
  * exchanging the corpus; the candidate join and its distinct carry
  * ID PAIRS only; exact shingle arrays are fetched once per verified
  * candidate id from the doc-keyed sv table (the same verify shape as
  * [[Dedup.jaccardSimilarityJoin]]'s verifyPairs). The delta (a day's
  * crawl) is the only thing signed per run. Same signature/banding
  * arithmetic as [[Dedup]] (one codegen'd pass), so index-vs-delta
  * agrees bit-for-bit with what a monolithic
  * [[Dedup.minhashLshPairs]] over the union would find across the
  * index/delta boundary.
  */
object DedupIndex {

  /** Candidate-join side: (doc_id, band_idx, band_key), bucketed on
    * band_key. */
  def bandsTable(table: String): String = table + "_bands"

  /** Shingle-array side: (doc_id, sv), bucketed on doc_id — one row
    * per doc, arrays never duplicated per band. */
  def svTable(table: String): String = table + "_sv"

  /** Sign `docs` (doc_id, text) and persist the banded index under
    * `<table>_bands` / `<table>_sv`. One signing pass feeds both
    * tables (the signed frame is cached for the two writes, then
    * released). */
  def write(docs: DataFrame, table: String, buckets: Int = 16): Unit = {
    // an in-memory catalog forgets managed tables across sessions but
    // their warehouse directories survive — clear both, or a fresh
    // session's saveAsTable dies with LOCATION_ALREADY_EXISTS
    Seq(bandsTable(table), svTable(table))
      .foreach(n => resetManaged(docs.sparkSession, n))
    val signed = Dedup.signedBands(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      graft.api.Bucketing.writeBucketed(
        signed.select(col("doc_id"),
          posexplode(col("bands")).as(Seq("band_idx", "band_key"))),
        bandsTable(table), Seq("band_key"), buckets)
      graft.api.Bucketing.writeBucketed(
        signed.select(col("doc_id"), col("sv")),
        svTable(table), Seq("doc_id"), buckets)
    } finally signed.unpersist(blocking = true)
  }

  /** Drop both halves of a persisted index. */
  def drop(spark: SparkSession, table: String): Unit =
    Seq(bandsTable(table), svTable(table)).foreach(n =>
      resetManaged(spark, n))

  /** Shared stale-directory-safe reset (see
    * [[graft.api.Bucketing.resetManaged]] — ADVICE r7 #1). */
  private def resetManaged(spark: SparkSession, name: String): Unit =
    graft.api.Bucketing.resetManaged(spark, name)

  /** Flag documents of `newDocs` that are near-duplicates (verified
    * shingle Jaccard >= threshold) of any INDEXED document: returns
    * (doc_id, dup_of, common, na, nb) with `dup_of` the indexed id.
    * Only the delta is signed; candidates come from the band-bucket
    * join against the stored bands layout, the distinct runs over
    * bare (doc_id, dup_of) ID pairs, and both sides' shingle arrays
    * are fetched by id only for surviving candidates. Pairs WITHIN
    * the delta are the caller's choice via [[Dedup.minhashLshPairs]]
    * on `newDocs` — this operator answers "is it already in the
    * corpus". */
  def flagAgainst(spark: SparkSession, table: String, newDocs: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    val idxBands = spark.table(bandsTable(table))
    val idxSv = spark.table(svTable(table))
    // cached: the delta's bands feed the candidate join and its sv
    // arrays the verify join — one signing pass, two readers
    val delta = Dedup.signedBands(newDocs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = delta
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band_idx", "band_key")))
      .alias("d")
      .join(idxBands.alias("i"),
        col("d.band_idx") === col("i.band_idx") &&
          col("d.band_key") === col("i.band_key"))
      .select(col("d.doc_id").as("doc_id"), col("i.doc_id").as("dup_of"))
      .distinct()
    val pairs = cand
      .join(delta.select(col("doc_id"), col("sv").as("dsv")), Seq("doc_id"))
      .join(idxSv.select(col("doc_id").as("dup_of"), col("sv").as("isv")),
        Seq("dup_of"))
      .select(col("doc_id"), col("dup_of"),
        size(array_intersect(col("dsv"), col("isv"))).cast("long").as("common"),
        size(col("dsv")).cast("long").as("na"),
        size(col("isv")).cast("long").as("nb"))
      .filter(col("common").cast("double") /
        (col("na") + col("nb") - col("common")) >= threshold)
    graft.api.Materialize.releasing(pairs, Seq(delta))
  }
}
