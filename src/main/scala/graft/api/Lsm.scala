package graft.api

import org.apache.spark.sql.SparkSession

/** Shared machinery of the LSM index families' size-tiered
  * compactions (PostingsIndex, IvfIndex, DedupIndex,
  * FingerprintIndex). */
object Lsm {

  /** The extent batch_id the size-tiered compactors consolidate
    * into — negative so it can never collide with a caller-assigned
    * admission id (admission ids are expected non-negative; the
    * replay guards key on a batch's own partition, so reusing a live
    * admission id would alias a consolidation with a replay). */
  val ConsolidatedBatchId: Long = -1L

  /** Swap a staged consolidated generation into place — the shared
    * tail of every family's `compactTiered` (one implementation so
    * the ordering below is fixable once; review r12 #1/#7).
    *
    * `extentMoves` maps each staged consolidated dataset to its final
    * extent directory; `survivors` is the staged surviving-tombstone
    * dataset (None when the index had no tombstones or none survive);
    * `tombstoneDir` is the live tombstone directory.
    *
    * CRASH-WINDOW ORDERING (the reason this helper exists): the
    * privacy-grade failure is a window where the tombstone directory
    * is ABSENT while un-consolidated extents (or the untouched base)
    * still hold forgotten documents — a crash there silently
    * resurrects them. So:
    *
    *   1. Surviving tombstones land FIRST, ADDITIVELY, as the
    *      consolidated tombstone partition alongside the old ones —
    *      survivors ⊆ old, so the mask is a superset of the correct
    *      mask at every intermediate state (over-masking an id whose
    *      extent rows were already applied is a no-op: every masking
    *      anti-join and the DISTINCT'd stats corrections are
    *      duplicate- and stray-tolerant).
    *   2. Each extent directory swaps: old batch partitions deleted,
    *      consolidated partition renamed in — every delete/rename
    *      CHECKED (`require`), so a filesystem refusal fails loudly
    *      instead of leaving a silent half-swap.
    *   3. Old tombstone partitions are removed LAST, only after every
    *      extent swap committed — forgotten ids stay masked while any
    *      pre-consolidation extent rows can still exist.
    *
    * Residual (documented, not silent): a crash between one extent
    * dir's partition deletion and its rename leaves that component's
    * extents absent while siblings still carry theirs — results can
    * under-count admitted docs until recovery. Recovery is manual and
    * always possible: `stagingRoot` holds the complete consolidated
    * generation and is deleted only after the whole swap succeeds;
    * re-running the interrupted move finishes the job. Tombstone
    * masking is never lost in any window. */
  def swapConsolidated(spark: SparkSession, stagingRoot: String,
      extentMoves: Seq[(String, String)], survivors: Option[String],
      tombstoneDir: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(stagingRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    def rm(d: String): Unit =
      require(!fs.exists(p(d)) || fs.delete(p(d), true),
        s"tiered compaction: could not delete $d")
    def mv(from: String, to: String): Unit = {
      fs.mkdirs(p(to).getParent)
      require(fs.rename(p(from), p(to)),
        s"tiered compaction: could not rename $from -> $to")
    }
    def rmOldPartitions(dir: String): Unit =
      if (fs.exists(p(dir)))
        fs.listStatus(p(dir)).map(_.getPath)
          .filter { c =>
            c.getName.startsWith("batch_id=") &&
              c.getName != s"batch_id=$ConsolidatedBatchId"
          }
          .foreach(c => require(fs.delete(c, true),
            s"tiered compaction: could not delete $c"))
    // 1. survivors in, additively (mask superset from here on). A
    // previous consolidation's partition renames ASIDE first (still
    // readable — any batch_id=* partition is), never deleted before
    // the new survivors land; step 3's cleanup removes it. The aside
    // TARGET may itself survive from an interrupted earlier attempt
    // (ADVICE r12) — renaming onto an existing dir would fail or nest;
    // deleting the stale aside first is safe because its content is
    // redundant with the still-present old batch partitions (the mask
    // superset invariant never depends on the aside copy).
    survivors.foreach { s =>
      val cons = s"$tombstoneDir/batch_id=$ConsolidatedBatchId"
      if (fs.exists(p(cons))) {
        val aside = s"$tombstoneDir/batch_id=${ConsolidatedBatchId - 1}"
        rm(aside)
        mv(cons, aside)
      }
      mv(s, cons)
    }
    // 2. extent swaps, checked
    extentMoves.foreach { case (staged, finalDir) =>
      rmOldPartitions(finalDir)
      rm(s"$finalDir/batch_id=$ConsolidatedBatchId")
      mv(staged, s"$finalDir/batch_id=$ConsolidatedBatchId")
    }
    // 3. old tombstone partitions out, LAST; if nothing survived the
    // whole directory goes
    if (survivors.isDefined) rmOldPartitions(tombstoneDir)
    else rm(tombstoneDir)
    rm(stagingRoot)
  }
}
