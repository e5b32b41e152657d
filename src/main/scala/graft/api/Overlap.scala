package graft.api

/** Overlap INDEPENDENT Spark actions from a small thread pool (the
  * optimization guide's §2.6 "overlap independent jobs"): Spark's
  * scheduler happily runs several jobs at once inside one application
  * — actions are only sequential because driver code calls them
  * sequentially. The index lifecycles' per-step writes (e.g. a dedup
  * index's bands + sv + hot sidecar, all fed by one cached signing
  * pass) are data-independent, so submitting them together lets each
  * job's tasks back-fill executors freed by the others' straggler
  * tails, and removes the (jobs − 1) × per-job fixed cost (scheduling
  * + AQE stage materialization + commit protocol) from the step's
  * critical path. At cluster scale the same overlap hides the output
  * commit + straggler tail of each write behind its siblings' compute;
  * nothing here is local-mode-specific.
  *
  * Threading notes:
  *   - A FRESH pool per call, with threads created by the CALLING
  *     thread's factory: Spark's job-group/description/scheduler-pool
  *     properties are inheritable thread-locals captured at thread
  *     creation, so the spawned jobs carry the caller's context and
  *     nothing stale leaks between calls (pool threads are never
  *     reused across calls). Pool sizes here are 2-4 driver threads
  *     per lifecycle step — creation cost is microseconds against
  *     multi-100ms jobs.
  *   - Tasks sharing a persisted frame are safe: concurrent first
  *     access serializes per storage block inside the BlockManager
  *     (getOrElseUpdate's write-lock), so the cache materializes once.
  *   - ALL tasks run to completion before the first failure rethrows:
  *     the lifecycle writes are idempotent per-partition overwrites,
  *     so letting siblings finish keeps the crash-replay contracts
  *     exactly as they were under sequential execution (a crash could
  *     always leave any prefix of the writes committed; overlap only
  *     changes WHICH subsets are reachable, and every replay guard in
  *     the index families already keys on per-partition existence,
  *     not on write order).
  */
object Overlap {

  /** Run the thunks concurrently, return their results in order.
    * Degenerate cases run inline (no pool for 0/1 tasks). */
  def all[T](tasks: Seq[() => T]): Seq[T] = {
    if (tasks.size <= 1) return tasks.map(_.apply())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    try {
      val futs = tasks.map { t =>
        pool.submit(new java.util.concurrent.Callable[T] {
          override def call(): T = t()
        })
      }
      // settle ALL tasks first (idempotent-overwrite contract above),
      // then rethrow the first failure in submission order
      val results = futs.map { f =>
        try Right(f.get())
        catch {
          case e: java.util.concurrent.ExecutionException =>
            Left(Option(e.getCause).getOrElse(e))
          case e: InterruptedException => Left(e)
        }
      }
      results.collectFirst { case Left(e) => e }.foreach(throw _)
      results.collect { case Right(v) => v }
    } finally pool.shutdownNow()
  }

  /** Run independent side-effecting actions concurrently; returns when
    * every one has finished. */
  def run(tasks: (() => Unit)*): Unit = { all(tasks); () }

  /** Materialize a persisted frame ONCE before overlapped readers.
    * BlockManager's getOrElseUpdate races on the STORE side only — it
    * does not serialize partition compute — so several jobs hitting a
    * cold cache together each recompute the shared partitions ("Block
    * rdd_N_i already exists" warnings) and burn cores the overlap was
    * meant to free. One cheap action first fills the cache; the
    * overlapped jobs then read it. Wall-clock is strictly better than
    * serializing the first writer: prime + max(readers) vs prime +
    * first writer + max(rest). */
  def prime(df: org.apache.spark.sql.Dataset[_]): Unit = { df.count(); () }
}
