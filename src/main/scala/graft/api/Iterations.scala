package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Native-iteration parity (SURVEY.md §2.8) as driver-side loops.
  *
  * The reference runs iterations *inside* the dataflow
  * ([U] stratosphere-runtime/.../pact/runtime/iterative/task/
  * IterationHeadPactTask.java, with loop-invariant caching at the
  * iteration boundary and a superstep barrier). Spark has no native
  * loop operator, so the idiomatic equivalent is a driver `while` loop
  * over DataFrames with:
  *
  *   - `localCheckpoint()` (eager) on each superstep's outputs. This is
  *     load-bearing twice over: it materializes the state (the
  *     analogue of the reference's iteration-boundary cache) AND
  *     truncates lineage, keeping per-superstep planning cost O(1).
  *     Without it, Catalyst re-analyzes a plan that grows with every
  *     superstep — measured 53s/superstep by step 4 on a 1.2M-edge CC
  *     run vs <1s/superstep with truncation.
  *   - constraint propagation disabled inside the loop: constraint
  *     rewrite cost also grows with plan depth, and checkpointed plans
  *     carry origin constraints that break `Union.rewriteConstraints`
  *     (NoSuchElementException on stale attribute ids in Spark 4.1).
  *   - convergence via cheap actions on already-materialized state
  *     (`isEmpty` on the checkpointed workset = the reference's
  *     empty-workset termination).
  *
  * 100 TB posture: checkpointed state is stored partition-local on
  * executors (no driver collect); loop-invariant inputs are persisted
  * once by the caller (see Algorithms.connectedComponents) and every
  * per-step join against them reuses the cache.
  */
object Iterations {

  private[graft] def withIterationConf[A](spark: SparkSession)(f: => A): A = {
    val key = "spark.sql.constraintPropagation.enabled"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try f
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Bulk iteration ([U] BulkIterationBase): iterate `body` up to
    * `maxIterations` times, optionally stopping early when
    * `terminate(prev, next)` returns true (the reference's
    * termination-criterion dataset / convergence aggregator). */
  def bulk[T](init: Dataset[T], maxIterations: Int)(
      body: Dataset[T] => Dataset[T],
      terminate: (Dataset[T], Dataset[T]) => Boolean = (_: Dataset[T], _: Dataset[T]) => false)
      : Dataset[T] = withIterationConf(init.sparkSession) {
    var cur = init.localCheckpoint() // eager: materialize + truncate lineage
    var i = 0
    var done = false
    while (i < maxIterations && !done) {
      val next = body(cur).localCheckpoint()
      done = terminate(cur, next)
      cur = next
      i += 1
    }
    cur
  }

  /** Delta (workset) iteration ([U] DeltaIterationBase +
    * CompactingHashTable solution set): per step, `step(solution,
    * workset)` returns `(delta, nextWorkset)`; the solution set is
    * updated by key (delta rows replace same-key solution rows) and the
    * loop ends when the workset is empty or `maxIterations` is hit.
    *
    * The reference point-updates an in-memory hash table in O(|delta|);
    * Spark's immutable model rebuilds the solution as
    * `delta ∪ (solution ⟕̸ delta)` (anti-join keeps unchanged rows) —
    * O(|solution|) per step but fully distributed, which is the right
    * trade at cluster scale (documented gap, SURVEY.md §7.4).
    */
  def delta(initSolution: DataFrame, initWorkset: DataFrame, keys: Seq[String],
      maxIterations: Int)(
      step: (DataFrame, DataFrame) => (DataFrame, DataFrame)): DataFrame =
    withIterationConf(initSolution.sparkSession) {
      val keyCols = keys.map(col)
      var solution = initSolution.localCheckpoint()
      var workset = initWorkset.localCheckpoint()
      var i = 0
      var done = workset.isEmpty
      while (i < maxIterations && !done) {
        val (delta0, nextWorkset0) = step(solution, workset)
        val delta = delta0.localCheckpoint()
        // keep rows whose key is NOT in delta, then add the delta rows
        val nextSolution = solution
          .join(delta.select(keyCols: _*), keys, "left_anti")
          .unionByName(delta)
          .localCheckpoint()
        val nextWorkset =
          if (nextWorkset0 eq delta0) delta else nextWorkset0.localCheckpoint()
        done = nextWorkset.isEmpty
        solution = nextSolution
        workset = nextWorkset
        i += 1
      }
      solution
    }
}
