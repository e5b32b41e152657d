package graft.api

import org.apache.spark.sql.DataFrame

/** Bounded-lifetime execution for operators that persist internal
  * frames (the dedup shingle projections, the triangle edge cache, the
  * unigram weight table). Their default contract is lazy: the internal
  * cache lives until the caller drops the returned frame or calls
  * `spark.catalog.clearCache()` — fine for a query runner that clears
  * between queries, but a long-lived library session would accumulate
  * dead cached frames (ADVICE r5).
  *
  * `releasing` is the opt-in fix: run the pipeline ONCE now, keep only
  * the (small) result, and synchronously release every internal cache
  * before returning. The result is held as a local checkpoint, whose
  * storage is freed automatically by Spark's context cleaner once the
  * caller drops the frame — nothing is left behind that outlives the
  * caller's own reference.
  */
object Materialize {

  /** Materialize `result` eagerly, then release `caches`.
    * Synchronous unpersist: by the time this returns, the internal
    * frames are gone from the block manager (spec-assertable). */
  def releasing(result: DataFrame, caches: Seq[DataFrame]): DataFrame = {
    val out = result.localCheckpoint(eager = true)
    caches.foreach(_.unpersist(blocking = true))
    // same audit stash as withTempRoot: the checkpoint hides the real
    // plan, and the plan audits want the pre-checkpoint shape
    stashAuditPlans(result)
    out
  }

  /** Stash the audit plan string BOUNDED: the fixpoint lifecycle
    * queries' stacked plans can render to heap-exhausting strings
    * (observed r15: OutOfMemoryError inside executedPlan.toString
    * during the full suite), so the string builds under a 16 MiB
    * spark.sql.maxPlanStringLength cap — Spark truncates with an
    * explicit marker, and ~200k lines is far beyond any node-bearing
    * region the plan audits grep. The analyzed-plan stash is the
    * tree itself (no string), unaffected. */
  private def stashAuditPlans(result: DataFrame): Unit = {
    val conf = result.sparkSession.conf
    val key = "spark.sql.maxPlanStringLength"
    val prev = conf.getOption(key)
    try {
      conf.set(key, (16 * 1024 * 1024).toString)
      lastAuditPlan = Some(result.queryExecution.executedPlan.toString)
    } finally prev match {
      case Some(v) => conf.set(key, v)
      case None => conf.unset(key)
    }
    lastAuditAnalyzed = Some(result.queryExecution.analyzed)
  }

  /** Run `body` against a fresh driver-local temp root (the
    * grow/sink directory of an index-lifecycle query), materialize
    * the (bounded) result eagerly, then recursively delete the root —
    * repeated bench/verify runs must not accumulate extent, tombstone
    * and sink data under java.io.tmpdir (ADVICE r11 #3). The
    * driver-local path is a fixture convenience for the gate queries
    * only: the index APIs themselves take Hadoop-FS paths, and a
    * deployment passes its own durable root directly. */
  def withTempRoot(prefix: String)(body: String => DataFrame): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory(prefix)
    try {
      val result = body(tmp.toString)
      val out = result.localCheckpoint(eager = true)
      // the checkpoint hides the real plan behind an ExistingRDD scan;
      // stash the executed (AQE-final — the eager checkpoint just ran
      // it) plan of the returned shape so PlanAuditSpec's suite-wide
      // audits keep covering lifecycle queries (review r12 #3)
      stashAuditPlans(result)
      out
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(tmp) // must be closed (open dir handles)
      val paths = try walk.iterator().asScala.toSeq finally walk.close()
      paths.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  /** The most recent [[withTempRoot]] body's executed plan — the
    * pre-checkpoint shape the plan audits inspect. Test-support only;
    * single-threaded audit runners read it right after invoking the
    * query. */
  @volatile private[graft] var lastAuditPlan: Option[String] = None

  /** Its analyzed-logical-plan sibling (the broadcast-hint audit
    * collects ResolvedHint nodes, which only exist pre-physical). */
  @volatile private[graft] var lastAuditAnalyzed
      : Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] = None
}
