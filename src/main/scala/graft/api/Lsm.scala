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
    *   2. Each extent directory swaps: the batch partitions the plan
    *      RECORDED at stage time deleted, consolidated partition
    *      renamed in — every delete/rename CHECKED (`require`), so a
    *      filesystem refusal fails loudly instead of leaving a
    *      silent half-swap.
    *   3. The recorded old tombstone partitions are removed LAST,
    *      only after every extent swap committed — forgotten ids
    *      stay masked while any pre-consolidation extent rows can
    *      still exist.
    *
    * CRASH RECOVERY (VERDICT r12 #4): before the first move, the
    * full swap plan — including, PER DIRECTORY, the exact batch
    * partitions this generation consumed (review r13: a replay must
    * never delete a batch that was admitted or forgotten AFTER the
    * crash; the recorded sets make deletion precise instead of
    * delete-everything) — is persisted ATOMICALLY (temp file +
    * rename, `end` terminator) as `_swap_plan.txt` INSIDE
    * `stagingRoot`; every move below is guarded by staged-side
    * existence, so the sequence is idempotent; and [[recover]]
    * replays it. A crash in ANY window therefore has a mechanical
    * finisher: `recover(spark, Lsm.stagingRoot(growPath))` completes
    * the interrupted generation (or no-ops if the swap never started
    * or already finished — the plan file lives and dies with the
    * staging root, which is deleted only after the whole swap
    * succeeds). Tombstone masking is never lost in any window. */
  def swapConsolidated(spark: SparkSession, stagingRoot: String,
      extentMoves: Seq[(String, String)], survivors: Option[String],
      tombstoneDir: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(stagingRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // record, per directory, the partitions that exist NOW — the
    // generation being consolidated. Replay deletes exactly these.
    def recorded(dir: String): Seq[String] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).map(_.getPath.getName)
        .filter(n => n.startsWith("batch_id=") &&
          n != s"batch_id=$ConsolidatedBatchId").toSeq.sorted
    }
    val moves = extentMoves.map { case (s, f) => (s, f, recorded(f)) }
    val tombRecorded = recorded(tombstoneDir)
    writePlan(fs, stagingRoot, moves, survivors, tombstoneDir, tombRecorded)
    performSwap(fs, stagingRoot, moves, survivors, tombstoneDir, tombRecorded)
  }

  /** Name of the persisted swap plan (underscore-prefixed: Spark's
    * readers ignore it if a listing ever sweeps the staging root). */
  val PlanFile = "_swap_plan.txt"

  /** Canonical staging root of a grow path — shared by every
    * family's compactTiered and by [[recover]] callers. */
  def stagingRoot(growPath: String): String = growPath + "/_tiered_staging"

  /** Test-only fault injection: called with a label after each
    * sub-step of the swap; a throwing failpoint simulates a crash in
    * exactly that window (LsmRecoverySpec). Production no-op. */
  private[graft] var failpoint: String => Unit = _ => ()

  /** Plan persistence is ATOMIC (review r13): written to a temp
    * name, fsync'd on close, then renamed over the final name, with
    * an `end` terminator line — a crash mid-write can never leave a
    * half-plan under [[PlanFile]], so [[recover]] either sees a
    * complete plan or (plan absent ⇒ no move ever ran) nothing. */
  private def writePlan(fs: org.apache.hadoop.fs.FileSystem,
      stagingRoot: String, moves: Seq[(String, String, Seq[String])],
      survivors: Option[String], tombstoneDir: String,
      tombRecorded: Seq[String]): Unit = {
    val body = (Seq("v2", tombstoneDir, survivors.getOrElse("-"),
      "T:" + tombRecorded.mkString(",")) ++
      moves.map { case (s, f, rec) => s"E:$s\t$f\t${rec.mkString(",")}" } ++
      Seq("end")).mkString("\n")
    val tmp = new org.apache.hadoop.fs.Path(stagingRoot, PlanFile + ".tmp")
    val fin = new org.apache.hadoop.fs.Path(stagingRoot, PlanFile)
    // A committed plan still present here is the ONLY replay record of
    // an interrupted earlier swap — silently deleting it would leave
    // that generation unfinishable (ADVICE r13). The family
    // compactTiered entry points recover() before restaging, so this
    // only trips a direct swapConsolidated caller that skipped
    // recovery; fail loudly instead of destroying the record.
    require(!fs.exists(fin),
      s"unreplayed swap plan present at $fin — run Lsm.recover($stagingRoot) first")
    fs.delete(tmp, false)
    val out = fs.create(tmp, true)
    try { out.write(body.getBytes("UTF-8")); out.hsync() }
    finally out.close()
    require(fs.rename(tmp, fin), s"could not commit swap plan $fin")
  }

  /** Replay an interrupted swap from the persisted plan. Returns
    * true if a plan was found and completed, false if there was
    * nothing to recover: no staging root / no committed plan —
    * either the compaction never reached the swap (a leftover
    * `.tmp` from a crash mid-plan-write is deleted here: the plan
    * commit precedes every move, so no move can have run), in which
    * case re-running compactTiered restages from scratch, or the
    * swap already finished and removed the root. Idempotent: safe
    * to call again after a crash DURING recovery. */
  def recover(spark: SparkSession, stagingRoot: String): Boolean = {
    val fs = new org.apache.hadoop.fs.Path(stagingRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val plan = new org.apache.hadoop.fs.Path(stagingRoot, PlanFile)
    fs.delete(new org.apache.hadoop.fs.Path(stagingRoot, PlanFile + ".tmp"), false)
    if (!fs.exists(plan)) return false
    val in = fs.open(plan)
    val body = try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      Iterator.continually(in.read(buf)).takeWhile(_ > 0)
        .foreach(n => bos.write(buf, 0, n))
      new String(bos.toByteArray, "UTF-8")
    } finally in.close()
    val lines = body.split("\n").toSeq
    require(lines.headOption.contains("v2") && lines.lastOption.contains("end"),
      s"unrecognized or torn swap plan in $stagingRoot " +
        s"(header=${lines.headOption}, terminator=${lines.lastOption}) — " +
        "plans are committed atomically, so this file was written by " +
        "something else; refusing to replay it")
    val tombstoneDir = lines(1)
    val survivors = Option(lines(2)).filter(_ != "-")
    def names(csv: String): Seq[String] =
      csv.split(",").toSeq.filter(_.nonEmpty)
    val tombRecorded = names(lines(3).stripPrefix("T:"))
    val moves = lines.drop(4).dropRight(1).filter(_.nonEmpty).map { l =>
      l.stripPrefix("E:").split("\t", -1) match {
        case Array(s, f, rec) => (s, f, names(rec))
        case Array(s, f)      => (s, f, Seq.empty[String])
      }
    }
    performSwap(fs, stagingRoot, moves, survivors, tombstoneDir, tombRecorded)
    true
  }

  /** The guarded, idempotent move sequence — shared by the live swap
    * and [[recover]]'s replay. Every step keys on the STAGED side's
    * existence: a step whose staged input is gone already completed
    * in a previous attempt and is skipped; deletions touch ONLY the
    * partitions the plan recorded (+ swap-internal names), so
    * batches admitted or forgotten between a crash and its recovery
    * survive the replay untouched (review r13). */
  private def performSwap(fs: org.apache.hadoop.fs.FileSystem,
      stagingRoot: String, moves: Seq[(String, String, Seq[String])],
      survivors: Option[String], tombstoneDir: String,
      tombRecorded: Seq[String]): Unit = {
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    def rm(d: String): Unit =
      require(!fs.exists(p(d)) || fs.delete(p(d), true),
        s"tiered compaction: could not delete $d")
    def mv(from: String, to: String): Unit = {
      fs.mkdirs(p(to).getParent)
      require(fs.rename(p(from), p(to)),
        s"tiered compaction: could not rename $from -> $to")
    }
    def rmRecorded(dir: String, rec: Seq[String]): Unit =
      rec.foreach(n => rm(s"$dir/$n"))
    // 1. survivors in, additively (mask superset from here on). A
    // previous consolidation's partition renames ASIDE first (still
    // readable — any batch_id=* partition is), never deleted before
    // the new survivors land; step 3's cleanup removes it. The aside
    // TARGET may itself survive from an interrupted earlier attempt
    // (ADVICE r12) — renaming onto an existing dir would fail or nest;
    // deleting the stale aside first is safe because its content is
    // redundant with the still-present old batch partitions (the mask
    // superset invariant never depends on the aside copy). On replay,
    // a missing staged-survivors dir means this step already
    // committed (the mv is the step's atom) — skip.
    val aside = s"$tombstoneDir/batch_id=${ConsolidatedBatchId - 1}"
    survivors.filter(s => fs.exists(p(s))).foreach { s =>
      val cons = s"$tombstoneDir/batch_id=$ConsolidatedBatchId"
      if (fs.exists(p(cons))) {
        rm(aside)
        mv(cons, aside)
        failpoint("survivors_aside")
      }
      mv(s, cons)
      failpoint("survivors_moved")
    }
    // 2. extent swaps, checked; staged-gone means this extent's swap
    // already committed in a previous attempt (the mv is last).
    // Deletions are the RECORDED partitions only — a batch admitted
    // after a crash is not part of this generation and must survive.
    moves.filter { case (staged, _, _) => fs.exists(p(staged)) }
      .foreach { case (staged, finalDir, rec) =>
        rmRecorded(finalDir, rec)
        rm(s"$finalDir/batch_id=$ConsolidatedBatchId")
        failpoint(s"extent_deleted:$finalDir")
        mv(staged, s"$finalDir/batch_id=$ConsolidatedBatchId")
        failpoint(s"extent_moved:$finalDir")
      }
    // 3. the recorded old tombstone partitions (and the swap-internal
    // aside) out, LAST; tombstones forgotten after a crash are not in
    // the recorded set and stay. If the directory is now empty —
    // nothing survived and nothing new arrived — it goes entirely
    // (the fresh-swap "no survivors" semantics).
    rmRecorded(tombstoneDir, tombRecorded)
    rm(aside)
    if (fs.exists(p(tombstoneDir)) &&
        fs.listStatus(p(tombstoneDir)).isEmpty)
      rm(tombstoneDir)
    failpoint("tombstones_cleaned")
    // 4. staging root (and the plan file with it) gone = swap done
    rm(stagingRoot)
  }
}
