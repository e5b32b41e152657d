package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistable banded-Hamming fingerprint index — the incremental
  * serving shape of the perceptual near-dup family (image dHash,
  * audio energy hash, text SimHash fingerprints): index the corpus's
  * fingerprints once, check each crawl batch against the store
  * without re-hashing or re-shuffling history. The fingerprint twin
  * of [[DedupIndex]] with one deliberate storage difference: a
  * fingerprint is ONE long (not a shingle array), so it RIDES the
  * stored band rows — (id, fp, band_idx, band_key), 4 scalars —
  * and verification is an inline popcount on the candidate join,
  * no fetch-by-id side table. (DedupIndex's two-table normalization
  * exists to keep ARRAYS off the candidate shuffle; an 8-byte scalar
  * rides free.)
  *
  * 100 TB posture: the bands table is bucketed on band_key, so a
  * delta's candidate join clusters on the stored layout (zero
  * index-side exchange — the DedupIndex plan contract); the delta is
  * the only thing fingerprinted per run; extents grow LSM-style per
  * batch (idempotent partitions) and [[compact]] folds them. Band
  * arithmetic is [[Dedup.bandedHammingPairs]]'s, shared via the same
  * shift/mask construction, so index-vs-delta agrees bit-for-bit
  * with the monolithic pair join within the radius.
  */
object FingerprintIndex {

  /** The one stored table: (id, fp, band_idx, band_key) bucketed on
    * band_key.
    *
    * WHY NO HOT-BUCKET SIDECAR (deliberate divergence from
    * [[DedupIndex.hotTable]]): MinHash-LSH band keys live in a
    * ~2^63 value space, so an over-cap bucket is always DEGENERACY
    * (boilerplate) and a constant cap cleanly diverts it. A 56-bit
    * perceptual fingerprint at radius 7 has 7-BIT bands: occupancy is
    * n/128 per band on average — CORPUS-SIZE-driven, and any constant
    * cap would eventually drop everything (at sf0.1 the healthy gate
    * index already has buckets of 133). The scale lever here is
    * fingerprint WIDTH (measured in docs/SCALE.md: doubling band bits
    * cut candidates 136x), not a cap. The one true degeneracy —
    * millions of EXACT-identical fingerprints (the same logo file
    * re-crawled) — is handled upstream by exact dedup, or by storing
    * one representative id per distinct fp (a `distinct-on-fp` write;
    * changes witness attribution from all-copies to one-copy, the
    * usual trade). */
  def bandsTable(table: String): String = table + "_fbands"

  /** Extent directory of a growing fingerprint index. */
  def extentPath(growPath: String): String = growPath + "/fbands"

  /** Tombstone directory (forgotten ids) of a growing index. */
  def tombstonePath(growPath: String): String = growPath + "/tombstones"

  /** Right-to-be-forgotten for media (the image-RTBF twin of
    * [[DedupIndex.forget]]): ids land as an idempotent tombstone
    * batch; from the next [[flagAndAdmit]] on, a forgotten item no
    * longer WITNESSES duplicates (pairs anti-joined on dup_of —
    * O(pairs), never O(index)); [[compact]] removes its band rows
    * physically and clears the tombstones. Same caller contract as
    * DedupIndex, and equally self-enforcing: flagAndAdmit rejects a
    * batch whose ids intersect the tombstone set. Tombstones apply
    * retroactively on sink replay (privacy erasure must not resurrect
    * forgotten pairs). */
  def forget(spark: SparkSession, growPath: String, ids: DataFrame,
      batchId: Long): Unit = {
    // finish any interrupted tiered swap FIRST (review r13) — see
    // the flagAndAdmit-side comment
    graft.api.Lsm.recover(spark, graft.api.Lsm.stagingRoot(growPath))
    ids.select(col("id").cast("long").as("id"))
      .write.mode("overwrite")
      .parquet(s"${tombstonePath(growPath)}/batch_id=$batchId")
  }

  private def tombstonesFor(spark: SparkSession,
      growPath: String): Option[DataFrame] =
    if (dirExists(spark, tombstonePath(growPath)))
      Some(spark.read.schema("id LONG, batch_id LONG")
        .parquet(tombstonePath(growPath)).select(col("id")))
    else None

  private def bandRows(fps: DataFrame, idCol: String, fpCol: String,
      bits: Int, maxHamming: Int): DataFrame = {
    val bands = maxHamming + 1
    require(bits % bands == 0, s"bands=$bands must divide $bits")
    // Dedup.bandKeyArray IS the banding arithmetic — one definition
    // for the batch join, the monitor and this stored layout
    fps.select(col(idCol).cast("long").as("id"), col(fpCol).as("fp"),
      posexplode(Dedup.bandKeyArray(col(fpCol), bits, bands))
        .as(Seq("band_idx", "band_key")))
  }

  /** Persist the banded index over `fps` (idCol, fpCol). */
  def write(fps: DataFrame, idCol: String, fpCol: String, table: String,
      bits: Int, maxHamming: Int, buckets: Int = 16): Unit = {
    graft.api.Bucketing.resetManaged(fps.sparkSession, bandsTable(table))
    graft.api.Bucketing.writeBucketed(
      bandRows(fps, idCol, fpCol, bits, maxHamming),
      bandsTable(table), Seq("band_key"), buckets)
  }

  def drop(spark: SparkSession, table: String): Unit =
    graft.api.Bucketing.resetManaged(spark, bandsTable(table))

  /** Flag fingerprints of `newFps` within Hamming `maxHamming` of any
    * INDEXED fingerprint: (id, dup_of, hamming), dup_of the indexed
    * id. Candidates from the band join against the stored layout;
    * popcount verifies inline — set-exact within the radius. */
  def flagAgainst(spark: SparkSession, table: String, newFps: DataFrame,
      idCol: String, fpCol: String, bits: Int, maxHamming: Int): DataFrame =
    flagRows(bandRows(newFps, idCol, fpCol, bits, maxHamming),
      spark.table(bandsTable(table)), maxHamming)

  private def flagRows(delta: DataFrame, idx: DataFrame,
      maxHamming: Int, pairFilter: org.apache.spark.sql.Column = lit(true))
      : DataFrame =
    delta.alias("d")
      .join(idx.alias("i"),
        col("d.band_idx") === col("i.band_idx") &&
          col("d.band_key") === col("i.band_key"))
      .select(col("d.id").as("id"), col("i.id").as("dup_of"),
        bit_count(col("d.fp").bitwiseXOR(col("i.fp"))).cast("long").as("hamming"))
      .filter(pairFilter)
      .filter(col("hamming") <= maxHamming)
      .distinct()

  private val extSchema = "id LONG, fp LONG, band_idx INT, band_key LONG, batch_id LONG"

  private def dirExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** One micro-batch of the GROWING fingerprint dedup: flag `batch`
    * against base + prior extents + smaller-id batch members, write
    * flagged rows (id, dup_of, hamming) to the batch's sink
    * partition, admit survivors' band rows as the batch's extent.
    * All writes overwrite their own batch_id partition —
    * replay-idempotent. The per-batch cost is O(batch x bands) rows
    * joined against the bucketed base (no index exchange) plus the
    * admission-rate-bounded extents. */
  def flagAndAdmit(spark: SparkSession, table: String, growPath: String,
      batchFps: DataFrame, idCol: String, fpCol: String, bits: Int,
      maxHamming: Int, batchId: Long, sinkPath: String): Unit = {
    // finish any interrupted tiered swap FIRST (review r13): a
    // mutation landing between a crash and its recovery must not be
    // built on half-swapped state, and — with the plan's recorded
    // partition sets — can never be deleted by a later replay
    graft.api.Lsm.recover(spark, graft.api.Lsm.stagingRoot(growPath))
    val delta = bandRows(batchFps, idCol, fpCol, bits, maxHamming)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // forget contract guard (as DedupIndex): a tombstoned id
      // re-arriving as a NEW item would silently lose its
      // within-batch pairs — reject it, EXEMPTING only ids found in
      // THIS batch's own prior sink/extent partitions (= a
      // crash-replay of the batch that first carried the item; a
      // forget() in between is legal and the replay rewrites its sink
      // without the forgotten pairs). See DedupIndex.flagAndAdmit for
      // the full semantics and the rare mid-write-crash residual.
      val tombs = tombstonesFor(spark, growPath)
      tombs.foreach { ts =>
        val inBatch = delta.select(col("id")).distinct()
          .join(ts, Seq("id"), "left_semi")
        val none = delta.select(col("id")).limit(0)
        def partIds(dir: String, schema: String) =
          if (dirExists(spark, dir))
            spark.read.schema(schema).parquet(dir).select(col("id"))
          else none
        val ownPrior = partIds(s"$sinkPath/batch_id=$batchId",
            "id LONG, dup_of LONG, hamming LONG")
          .unionByName(partIds(s"${extentPath(growPath)}/batch_id=$batchId",
            "id LONG, fp LONG, band_idx INT, band_key LONG"))
        val reborn = inBatch.join(ownPrior, Seq("id"), "left_anti").count()
        require(reborn == 0L,
          s"flagAndAdmit batch $batchId contains $reborn id(s) tombstoned " +
            "in this index and not part of this batch's own prior output " +
            "(forget() ids must reference INDEXED items)")
      }
      val parts: Seq[DataFrame] =
        spark.table(bandsTable(table)) +:
          (if (dirExists(spark, extentPath(growPath)))
            Seq(spark.read.schema(extSchema).parquet(extentPath(growPath))
              .filter(col("batch_id") < lit(batchId)).drop("batch_id"))
          else Nil)
      val flagged0 = parts.map(p => flagRows(delta, p, maxHamming))
        .reduce(_ unionByName _)
        .unionByName(flagRows(delta, delta, maxHamming,
          pairFilter = col("dup_of") < col("id")))
      // forgotten items must not witness: pair-side anti-join
      // (O(pairs), never an index rescan)
      // eager localCheckpoint instead of persist+prime (r18, the
      // DedupIndex.flagAndAdmit rationale): one materialization job
      // (filling the delta cache through flagged's lineage), and the
      // truncated lineage stops Catalyst re-optimizing the deep flag
      // tree once per write below. Freed after the writes.
      val flagged = graft.api.Iterations.checkpoint(
        tombs.fold(flagged0)(ts =>
          flagged0.join(ts.select(col("id").as("dup_of")),
            Seq("dup_of"), "left_anti")))
      try {
        // sink and admission extent are independent consumers of the
        // checkpointed flag frame + band cache — overlapped (guide
        // §2.6, r18); both idempotent per-partition overwrites, and
        // the rebirth exemption above already unions both partitions'
        // ids
        graft.api.Overlap.run(
          () => flagged.select(col("id"), col("dup_of"), col("hamming"))
            .write.mode("overwrite").parquet(s"$sinkPath/batch_id=$batchId"),
          () => delta
            .join(flagged.select(col("id")).distinct(), Seq("id"), "left_anti")
            .write.mode("overwrite")
            .parquet(s"${extentPath(growPath)}/batch_id=$batchId"))
      } finally graft.api.Iterations.freeCheckpoint(flagged)
    } finally delta.unpersist(blocking = true)
  }

  /** Fold extents into the bucketed base, apply tombstones physically
    * (forgotten ids' band rows leave the index here), clear both
    * directories. */
  def compact(spark: SparkSession, table: String, growPath: String,
      buckets: Int = 16): Unit = {
    val hasExt = dirExists(spark, extentPath(growPath))
    val tombs = tombstonesFor(spark, growPath)
    if (!hasExt && tombs.isEmpty) return
    val staging = growPath + "/_compact_staging"
    val unioned =
      if (hasExt) spark.table(bandsTable(table))
        .unionByName(spark.read.schema(extSchema)
          .parquet(extentPath(growPath)).drop("batch_id"))
      else spark.table(bandsTable(table))
    tombs.fold(unioned)(ts => unioned.join(ts, Seq("id"), "left_anti"))
      .write.mode("overwrite").parquet(staging)
    graft.api.Bucketing.resetManaged(spark, bandsTable(table))
    graft.api.Bucketing.writeBucketed(spark.read.parquet(staging),
      bandsTable(table), Seq("band_key"), buckets)
    val root = new org.apache.hadoop.fs.Path(growPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(extentPath(growPath), tombstonePath(growPath), staging)
      .foreach(d => fs.delete(new org.apache.hadoop.fs.Path(d), true))
  }

  /** Size-tiered compaction (the [[graft.text.PostingsIndex
    * .compactTiered]] discipline — VERDICT r11 #4 extended to all LSM
    * families): below `maxExtentFraction` of the base's band-row
    * mass, the extents fold into ONE consolidated extent partition
    * (batch_id = [[graft.api.Lsm.ConsolidatedBatchId]]) with
    * extent-hitting tombstones applied physically; base-hitting
    * tombstones survive (still masked at flag time) and the bucketed
    * base is untouched — O(extent) write amplification. Above the
    * threshold delegates to [[compact]]. Same caller contract. */
  def compactTiered(spark: SparkSession, table: String, growPath: String,
      buckets: Int = 16, maxExtentFraction: Double = 0.2): Unit = {
    // AUTO-RECOVER first (r13): re-running compactTiered is the
    // natural operator response to a crash, but staging over a
    // HALF-SWAPPED index would consolidate inconsistent state — an
    // interrupted generation must finish before a new one stages
    // (no-op when there is nothing to recover)
    graft.api.Lsm.recover(spark, graft.api.Lsm.stagingRoot(growPath))
    val hasExt = dirExists(spark, extentPath(growPath))
    if (!hasExt) return compact(spark, table, growPath, buckets)
    val ext = spark.read.schema(extSchema)
      .parquet(extentPath(growPath)).drop("batch_id")
    // two independent metadata-count jobs — overlapped (guide §2.6)
    val counts = graft.api.Overlap.all(Seq(
      () => spark.table(bandsTable(table)).count(),
      () => ext.count()))
    val (baseN, extN) = (counts(0), counts(1))
    if (baseN <= 0 || extN.toDouble / baseN >= maxExtentFraction)
      return compact(spark, table, growPath, buckets)
    val staging = graft.api.Lsm.stagingRoot(growPath)
    val ts = tombstonesFor(spark, growPath)
    // staged consolidated extent and surviving-tombstone writes are
    // independent — overlapped; the survivor count rides the write as
    // an observed metric instead of a read-back count job (the
    // PostingsIndex.writeStatsRow pattern and deployment note)
    val remainingCnt = new java.util.concurrent.atomic.AtomicLong(0L)
    graft.api.Overlap.run(Seq(
      () => ts.fold(ext)(t => ext.join(t, Seq("id"), "left_anti"))
        .write.mode("overwrite").parquet(staging + "/fbands")) ++
      ts.toSeq.map { t => () =>
        val obs = org.apache.spark.sql.Observation()
        t.distinct()
          .join(ext.select(col("id")), Seq("id"), "left_anti")
          .observe(obs, org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"))
          .write.mode("overwrite").parquet(staging + "/tombstones")
        remainingCnt.set(obs.get("n").asInstanceOf[Long])
      }: _*)
    graft.api.Lsm.swapConsolidated(spark, staging,
      Seq(staging + "/fbands" -> extentPath(growPath)),
      if (remainingCnt.get > 0) Some(staging + "/tombstones") else None,
      tombstonePath(growPath))
  }
}
