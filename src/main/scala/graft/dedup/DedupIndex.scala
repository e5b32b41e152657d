package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistable MinHash-LSH index — the INCREMENTAL dedup shape: sign
  * the corpus once, write the band buckets as a catalog table, and
  * check each day's new documents against the index without
  * re-signing or re-shuffling the historical corpus.
  *
  * 100 TB posture: the index table is bucketed on `band_key`, so the
  * delta's candidate join clusters on the stored layout instead of
  * exchanging the corpus; the delta side (a day's crawl) is the only
  * thing signed per run. Exact shingle-value arrays ride along in the
  * index so candidate verification (true Jaccard) needs no second
  * lookup. Same signature/banding arithmetic as [[Dedup]] (one
  * codegen'd pass), so index-vs-delta agrees bit-for-bit with what a
  * monolithic [[Dedup.minhashLshPairs]] over the union would find
  * across the index/delta boundary.
  */
object DedupIndex {

  /** Sign `docs` (doc_id, text) and persist the banded index under
    * `table`, bucketed by band_key: one row per (doc, band). */
  def write(docs: DataFrame, table: String, buckets: Int = 16): Unit =
    graft.api.Bucketing.writeBucketed(
      Dedup.signedBands(docs).select(col("doc_id"), col("sv"),
        posexplode(col("bands")).as(Seq("band_idx", "band_key"))),
      table, Seq("band_key"), buckets)

  /** Flag documents of `newDocs` that are near-duplicates (verified
    * shingle Jaccard >= threshold) of any INDEXED document: returns
    * (doc_id, dup_of, common, na, nb) with `dup_of` the indexed id.
    * Only the delta is signed; candidates come from the band-bucket
    * join against the stored layout. Pairs WITHIN the delta are the
    * caller's choice via [[Dedup.minhashLshPairs]] on `newDocs` —
    * this operator answers "is it already in the corpus". */
  def flagAgainst(spark: SparkSession, table: String, newDocs: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    val idx = spark.table(table)
    val delta = Dedup.signedBands(newDocs)
      .select(col("doc_id"), col("sv"),
        posexplode(col("bands")).as(Seq("band_idx", "band_key")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = delta.alias("d")
      .join(idx.alias("i"),
        col("d.band_idx") === col("i.band_idx") &&
          col("d.band_key") === col("i.band_key"))
      .select(col("d.doc_id").as("doc_id"), col("d.sv").as("dsv"),
        col("i.doc_id").as("dup_of"), col("i.sv").as("isv"))
      .distinct()
    graft.api.Materialize.releasing(
      cand.select(col("doc_id"), col("dup_of"),
          size(array_intersect(col("dsv"), col("isv"))).cast("long").as("common"),
          size(col("dsv")).cast("long").as("na"),
          size(col("isv")).cast("long").as("nb"))
        .filter(col("common").cast("double") /
          (col("na") + col("nb") - col("common")) >= threshold),
      Seq(delta))
  }
}
