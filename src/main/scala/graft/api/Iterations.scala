package graft.api

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  /** Per-superstep iteration statistics — the reference's iteration
    * aggregator surface ([U] stratosphere-core/.../aggregators/
    * Aggregator + LongSumAggregator + ConvergenceCriterion, SURVEY.md
    * §2.10). `changed` is the workset size after the superstep (the
    * WorksetEmptyConvergenceCriterion input); `aggregates` holds
    * caller-registered aggregate expressions evaluated over the
    * superstep's delta. */
  final case class SuperstepStats(superstep: Int, changed: Long,
      aggregates: Map[String, Any] = Map.empty)

  /** Shuffle-partition count sized to iteration state: inside a loop
    * the state is usually tiny next to the session-wide default, and
    * superstep latency is dominated by (tasks × stages) scheduling
    * overhead, so partitions scale with rows (~1M rows/partition).
    * Floored at the cluster's parallelism — a small-state iteration
    * must still use every core — and capped so petabyte-scale row
    * counts can't request more partitions than a scheduler handles. */
  def statePartitions(spark: SparkSession, stateRows: Long): Int =
    math.min(200000,
      math.max(spark.sparkContext.defaultParallelism,
        (stateRows / 1000000L).toInt))

  /** Eagerly drop the storage blocks of a SUPERSEDED superstep
    * checkpoint. `localCheckpoint` blocks are only reclaimed by the
    * ContextCleaner after a driver GC notices the dead RDD — on a big
    * iteration the dead checkpoints pile up on-heap for many
    * supersteps and then all clean at once, measured as 50-90 s
    * driver stalls in the final supersteps of a 10M-vertex CC run
    * (docs/SCALE.md "iteration headroom", r9 — the real cause of the
    * convergence-"tail" skew). Caller contract: the frame must be
    * provably dead — its successor checkpoint is already materialized
    * and no lazy frame still references it (a truncated-lineage
    * checkpoint cannot recompute freed blocks). */
  private[graft] def freeCheckpoint(df: Dataset[_]): Unit =
    org.apache.spark.sql.graftbridge.Bridge.checkpointRdd(df)
      .foreach(_.unpersist(blocking = false))

  /** Superstep barrier: eager localCheckpoint whose statistics are the
    * MEASURED materialized size. Always use this (not bare
    * `localCheckpoint()`) inside iteration loops — the stock
    * checkpoint keeps the origin plan's size ESTIMATE, which the
    * size-only stats visitor multiplies through each superstep's
    * joins until the BigInt itself becomes the driver bottleneck
    * (Bridge.measuredLocalCheckpoint scaladoc; measured 60-110 s/
    * superstep at 10M vertices, r9). */
  private[graft] def checkpoint[T](ds: Dataset[T]): Dataset[T] =
    org.apache.spark.sql.graftbridge.Bridge.measuredLocalCheckpoint(ds)

  private[graft] def withIterationConf[A](spark: SparkSession,
      shufflePartitions: Int = -1)(f: => A): A = {
    // NOTE (r5 measurement): disabling AQE here looks like an obvious
    // latency win (skip per-exchange replanning) but measures ~1.6x
    // WORSE on q_connected_components (8.3-9.6s vs 5.2s warm): AQE's
    // runtime partition coalescing cuts tasks-per-stage far below the
    // static statePartitions floor, and at loop state sizes the task
    // count dominates. Keep AQE on inside iterations.
    val keys = Seq("spark.sql.constraintPropagation.enabled" -> "false") ++
      (if (shufflePartitions > 0)
        Seq("spark.sql.shuffle.partitions" -> shufflePartitions.toString)
      else Nil)
    val old = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Bulk iteration ([U] BulkIterationBase): iterate `body` up to
    * `maxIterations` times, optionally stopping early when
    * `terminate(prev, next)` returns true (the reference's
    * termination-criterion dataset / convergence aggregator).
    *
    * `checkpointEvery`: materialize + truncate lineage every k
    * supersteps instead of each. For a fixed-n loop with no custom
    * `terminate`, k = n folds the whole iteration into ONE Spark job
    * (no per-superstep materialization barrier); keep k small enough
    * that the composed plan stays shallow (k supersteps deep). With a
    * custom `terminate`, leave k = 1 — the termination action would
    * recompute the un-checkpointed chain every step.
    * `shufflePartitions`: scope the loop's shuffles to state size
    * (see [[statePartitions]]); -1 keeps the session default.
    *
    * Superstep metrics ([U] bulk iteration aggregators): `aggregators`
    * are aggregate Columns evaluated over each superstep's state;
    * `observer` receives a [[SuperstepStats]] per superstep (with
    * `changed = -1` — a bulk loop has no workset; register a metric
    * if you need a change count). Metric nodes stay in the composed
    * plan, so with a folded loop (checkpointEvery > 1) every
    * superstep's values still materialize at its batch's barrier job
    * and observers fire there, preserving the one-job fold. */
  def bulk[T](init: Dataset[T], maxIterations: Int, checkpointEvery: Int = 1,
      shufflePartitions: Int = -1,
      aggregators: Map[String, Column] = Map.empty,
      observer: SuperstepStats => Unit = null)(
      body: Dataset[T] => Dataset[T],
      terminate: (Dataset[T], Dataset[T]) => Boolean = (_: Dataset[T], _: Dataset[T]) => false)
      : Dataset[T] = withIterationConf(init.sparkSession, shufflePartitions) {
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    require(shufflePartitions == -1 || shufflePartitions > 0,
      s"shufflePartitions must be positive or -1 (session default), got $shufflePartitions")
    // aggregators feed the observer; without one their values would be
    // computed and silently dropped — make the misuse loud (same
    // contract as delta(), ADVICE r3 #2/#5)
    require(aggregators.isEmpty || observer != null,
      "bulk(): aggregators require an observer to consume them")
    val instrumented = observer != null
    val aggs = if (aggregators.nonEmpty) aggregators
      else Map("rows" -> count(lit(1))) // observe() needs >= 1 metric
    val aggNames = aggs.keys.toSeq
    val pending = scala.collection.mutable.ArrayBuffer
      .empty[(Int, org.apache.spark.sql.Observation)]
    var cur = checkpoint(init) // eager: materialize + truncate lineage
    // the previous BARRIER's checkpoint: freed as soon as its
    // successor barrier is materialized (see freeCheckpoint) — between
    // barriers, lazy supersteps still read it, so only barrier-to-
    // barrier frees are safe
    var lastCkpt: Dataset[T] = cur
    var i = 0
    var done = false
    while (i < maxIterations && !done) {
      val raw0 = body(cur)
      val raw = if (instrumented) {
        val obs = org.apache.spark.sql.Observation()
        pending += ((i + 1, obs))
        raw0.observe(obs, aggs(aggNames.head).as(aggNames.head),
          aggNames.tail.map(n => aggs(n).as(n)): _*)
      } else raw0
      val atBarrier = (i + 1) % checkpointEvery == 0 || i + 1 == maxIterations
      val next = if (atBarrier) checkpoint(raw) else raw
      if (atBarrier && instrumented) {
        // the barrier job just executed every pending superstep's
        // metric node; drain in superstep order
        pending.foreach { case (step, obs) =>
          val vals = obs.get
          observer(SuperstepStats(step, -1L,
            aggNames.map(n => n -> vals(n)).toMap))
        }
        pending.clear()
      }
      done = terminate(cur, next)
      if (atBarrier) { freeCheckpoint(lastCkpt); lastCkpt = next }
      cur = next
      i += 1
    }
    if (instrumented && pending.nonEmpty) {
      // a custom terminate stopped the loop between barriers: the
      // trailing supersteps' metric nodes never ran. Checkpoint once
      // more (also hands the caller materialized state) and drain, so
      // the observer sees EVERY superstep (ADVICE r3 #2).
      val trailing = checkpoint(cur)
      freeCheckpoint(lastCkpt)
      cur = trailing
      pending.foreach { case (step, obs) =>
        val vals = obs.get
        observer(SuperstepStats(step, -1L,
          aggNames.map(n => n -> vals(n)).toMap))
      }
      pending.clear()
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
    *
    * Superstep metrics ([U] iteration aggregators, SURVEY.md §2.10):
    * `aggregators` are aggregate Columns evaluated over each
    * superstep's delta; `observer` receives a [[SuperstepStats]] per
    * superstep; `convergence` is the reference's ConvergenceCriterion —
    * returning true ends the loop (in addition to the built-in
    * empty-workset termination). All three run on already-checkpointed
    * frames, and when none is supplied the loop only pays the original
    * `isEmpty` scan.
    */
  def delta(initSolution: DataFrame, initWorkset: DataFrame, keys: Seq[String],
      maxIterations: Int, shufflePartitions: Int = -1,
      aggregators: Map[String, Column] = Map.empty,
      observer: SuperstepStats => Unit = null,
      convergence: SuperstepStats => Boolean = null)(
      step: (DataFrame, DataFrame) => (DataFrame, DataFrame)): DataFrame =
    withIterationConf(initSolution.sparkSession, shufflePartitions) {
      require(shufflePartitions == -1 || shufflePartitions > 0,
        s"shufflePartitions must be positive or -1 (session default), got $shufflePartitions")
      // aggregator values are only visible through the observer or the
      // convergence criterion; without either, each superstep would pay
      // an extra .agg().head() job whose results are discarded — make
      // the misuse loud instead (ADVICE r3 #2/#5, mirrored in bulk())
      require(aggregators.isEmpty || observer != null || convergence != null,
        "delta(): aggregators require an observer or convergence criterion to consume them")
      val keyCols = keys.map(col)
      val instrumented = observer != null || convergence != null
      var solution = checkpoint(initSolution)
      var workset = checkpoint(initWorkset)
      var i = 0
      var done = workset.isEmpty
      while (i < maxIterations && !done) {
        val (delta0, nextWorkset0) = step(solution, workset)
        // the next-workset size rides the checkpoint job as an
        // observed metric, so neither the empty-workset termination
        // nor SuperstepStats.changed costs an extra action
        val sameFrame = nextWorkset0 eq delta0
        val obsW = org.apache.spark.sql.Observation()
        val wsCount = count(lit(1)).as("n")
        val delta = checkpoint(
          if (sameFrame) delta0.observe(obsW, wsCount) else delta0)
        // keep rows whose key is NOT in delta, then add the delta rows
        val nextSolution = checkpoint(solution
          .join(delta.select(keyCols: _*), keys, "left_anti")
          .unionByName(delta))
        val nextWorkset =
          if (sameFrame) delta
          else checkpoint(nextWorkset0.observe(obsW, wsCount))
        val changed = obsW.get("n").asInstanceOf[Long]
        if (instrumented) {
          val aggVals =
            if (aggregators.isEmpty) Map.empty[String, Any]
            else {
              val names = aggregators.keys.toSeq
              val row = delta
                .agg(aggregators(names.head).as(names.head),
                  names.tail.map(n => aggregators(n).as(n)): _*)
                .head()
              names.map(n => n -> row.get(row.fieldIndex(n))).toMap
            }
          val stats = SuperstepStats(i + 1, changed, aggVals)
          if (observer != null) observer(stats)
          done = stats.changed == 0 ||
            (convergence != null && convergence(stats))
        } else {
          done = changed == 0
        }
        // every successor checkpoint is materialized above — eagerly
        // free the superseded ones instead of leaving them for the
        // GC-triggered ContextCleaner (freeCheckpoint scaladoc). The
        // sameFrame delta IS the next workset, so it stays live.
        freeCheckpoint(solution)
        freeCheckpoint(workset)
        if (!sameFrame && !(delta eq nextWorkset)) freeCheckpoint(delta)
        solution = nextSolution
        workset = nextWorkset
        i += 1
      }
      solution
    }
}
