package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.Iterations

/** The reference's signature iterative workloads, Spark-first.
  *
  * ConnectedComponents and PageRank are the canonical delta/bulk
  * iteration examples ([U] stratosphere-examples/.../graph/
  * ConnectedComponents.java, PageRankBasic.java; iteration machinery
  * per SURVEY.md §2.8). KMeans is the canonical bulk iteration over
  * points + broadcast centers ([U] .../clustering/KMeans.java).
  *
  * Determinism note: PageRank aggregates per-node contributions as
  * scaled integers (1e12 units) so the result is independent of
  * summation order — required for the cross-engine oracle, and harmless
  * at scale (long sums are cheaper than doubles + exact).
  */
object Algorithms {

  /** Connected components by iterative min-label propagation over an
    * undirected edge set, as a delta iteration: the workset carries only
    * vertices whose component label changed last step, accelerated by
    * pointer jumping (each superstep also folds in comp^3, the label of
    * the label of the label — all transitively reachable, so the min
    * semantics are untouched while the covered radius roughly triples
    * per superstep: ~ceil(log3 d)+1 barriers instead of d, the delta
    * analogue of the public large-star/small-star & path-doubling CC
    * results). Superstep 0 is fused into one zero-exchange aggregation
    * over the pre-partitioned edge cache. r5 measured effect at sf0.1
    * local[32]: 8 barriers/6.7s warm -> 4 barriers/3.3s warm.
    *
    * edges: (src: long, dst: long) — treated as undirected.
    * returns: (vertex: long, component: long) = min vertex id reachable.
    */
  /** Driver-measured cap on the root-set broadcast: 4M single-long
    * rows ≈ 32 MB — comfortably executor-resident. Above it the
    * anti-join is skipped (a many-component graph has no root skew to
    * fix) and the plan is the round-8 one. */
  private[graft] val RootBroadcastBound = 4194304L

  /** Probe side of CC's pointer-jump join: non-rooted vertices, with
    * the convergence-tail root-set anti-join (r9, SCALE.md "iteration
    * headroom") applied when the previous barrier OBSERVED a root
    * count within [[RootBroadcastBound]]. Removes exactly the rows
    * whose jump target is already a root (no-op messages) BEFORE the
    * exchange, so the late-superstep skew collapse onto component
    * roots never rides the shuffle. Factored out of the loop so
    * PlanAuditSpec can pin the shape: broadcast LeftAnti on a
    * single-long-column roots frame, no extra exchange on the probe
    * side (VERDICT r9 #7 guard-rail). */
  private[graft] def rootPrunedProbe(solution: DataFrame,
      rootFilterEligible: Boolean, rootCount: Long): DataFrame = {
    val aBase = solution.alias("a")
      .filter(col("a.component") =!= col("a.vertex"))
    if (rootFilterEligible && rootCount >= 0 && rootCount <= RootBroadcastBound) {
      val roots = solution.filter(col("component") === col("vertex"))
        .select(col("vertex").as("rooted_v"))
      aBase.join(broadcast(roots),
        col("a.component") === col("rooted_v"), "left_anti")
    } else aBase
  }

  def connectedComponents(edges: DataFrame, maxIterations: Int = 50): DataFrame = {
    // loop-invariant edge set: persist once (the analogue of the
    // reference's iteration-boundary cache — recomputing it every
    // superstep dominated runtime 7:1), PRE-PARTITIONED on the join
    // key so no superstep ever re-shuffles the edges: the per-step
    // message join requires clustering on src, which the persisted
    // HashPartitioning(src, parts) already satisfies — only the (small)
    // workset side exchanges. Multi-edges are kept: the min-label
    // combine is idempotent, and the dedup shuffle costs more than the
    // duplicate messages save.
    // cache the raw edge frame before fanning out: count(), both
    // union branches, and the first superstep all consume it — without
    // this the caller's edge-derivation plan (often a windowed scan)
    // executes three times before the loop even starts.
    val e0 = edges.select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val eCount = e0.count()
    // loop shuffles sized to state, not to the session default: on
    // tiny-state supersteps the cost is tasks x stages scheduling, and
    // at scale ~1M rows/partition keeps partitions memory-sized.
    val parts = Iterations.statePartitions(edges.sparkSession, 2 * eCount)
    val und = e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(parts, col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    und.count() // materialize from e0's cache, then drop the raw cache
    e0.unpersist()

    // Fused delta iteration: the generic Iterations.delta contract
    // (delta frame -> anti-join+union solution rebuild) costs three
    // solution-sized passes per superstep; for keyed min-merge the
    // merge and the next workset both fall out of ONE left join, so
    // each superstep is a single shuffle-heavy job over one
    // checkpointed frame. Same fixpoint, ~2x per-superstep cost.
    // (The generic machinery remains the API-parity path — see
    // Iterations.delta, VertexCentric, GDataSet.iterateDelta.)
    Iterations.withIterationConf(edges.sparkSession, parts) {
      // superstep 0 fused into one aggregation: with both edge
      // directions present, comp0[v] = min(v, min neighbors) =
      // min over und rows of least(src, dst) grouped by src — and the
      // group key IS und's partitioning key, so this is a
      // zero-exchange aggregation straight off the edge cache. This
      // replaces the init frame (identity labels), its distinct-vertex
      // shuffle, AND the first join superstep with one cheap job.
      val obs0 = org.apache.spark.sql.Observation("cc_rooted_0")
      var solution = und
        .groupBy(col("src").as("vertex"))
        .agg(min(least(col("src"), col("dst"))).as("component"))
        // root count rides the checkpoint job (see rootCount below)
        .observe(obs0, count(when(col("component") === col("vertex"), true))
          .as("rooted"))
        .transform(Iterations.checkpoint)
      var workset = solution.filter(col("component") < col("vertex"))
      // Driver-measured root count (rows with component == vertex) from
      // the LAST barrier. Labels only decrease, so the root set shrinks
      // monotonically and the previous barrier's count upper-bounds the
      // current one — gating on it is conservative. Used to decide when
      // the root set is provably small enough to broadcast (below).
      var rootCount: Long = obs0.get("rooted").asInstanceOf[Long]
      // The root anti-join below trades ONE extra job per superstep
      // (the broadcast build scans the solution) for pruning the jump
      // probe's exchange. At gate-scale graphs the superstep cost is
      // barrier latency, not exchange volume (r4 verdict), so the
      // extra job is pure overhead (~+0.1 s x supersteps, measured
      // +1 s on q_connected_components at sf0.1); at the 10M-vertex
      // headroom scale the pruned exchange is ~|V| rows per late
      // superstep. Enable it only when the per-superstep exchange is
      // big enough to matter (>= 4M edge rows).
      val rootFilterEligible = 2 * eCount >= 4000000L
      // the checkpoint backing the CURRENT solution/workset frames;
      // freed as soon as the next superstep's checkpoint materializes
      // (Iterations.freeCheckpoint: dead checkpoint blocks otherwise
      // wait for a GC-triggered ContextCleaner pass — measured as the
      // 50-200 s "convergence tail" at 10M vertices, r9)
      var liveCkpt: DataFrame = solution
      var i = 1 // superstep 0 is the fused aggregation above
      var done = false
      // Supersteps per materialization barrier. The min-merge is
      // idempotent, so batching is semantically free, but measured
      // wall-time got WORSE at batchLen=2: the composed plan
      // references the previous superstep's aggregation twice
      // (solution + workset branches) and Spark re-executes the
      // common subplan, cancelling the saved barrier. Re-measured in
      // round 4 with the shared subplan persist()ed per inner step:
      // still slower (7-8.5s vs 6.7s warm) — the cache write of the
      // ~|V|+|E| merged frame costs more than the saved barrier.
      // A third shape (workset-free supersteps ending in an explicit
      // repartition so both consumers share one ReuseExchange subtree,
      // folded 2-4 per barrier) also measured worse (6.3-25s): losing
      // the shrinking workset re-inflates every superstep to |E|
      // messages. This formulation is the measured optimum of four;
      // r5 added pointer jumping on top (see below) and measured one
      // more loser: probing the jump against the shrinking workset
      // instead of the full solution (cheaper join) converges slower
      // (6 supersteps/5.9s vs 4/3.3s) — stale-label jumps matter.
      val batchLen = 1
      while (i < maxIterations && !done) {
        val tStep = System.nanoTime()
        var merged: DataFrame = null
        var b = 0
        while (b < batchLen && i + b < maxIterations) {
          // messages from changed vertices UNION the current solution,
          // folded by one min-aggregation: newComp = global min;
          // oldComp = min over solution rows only -> changed iff
          // newComp < oldComp. One shuffle join + one aggregation per
          // superstep (the left-join formulation costs a second join).
          val msgs = workset.alias("w")
            .join(und.alias("g"), col("w.vertex") === col("g.src"))
            .select(col("g.dst").as("vertex"), col("w.component").as("component"),
              lit(true).as("is_msg"))
          // pointer jumping: my label's label is reachable from me too
          // (labels are reachable vertices and reachability is
          // transitive), so fold the composed label into the same min.
          // Chaining two hops (comp^3) roughly triples the covered
          // radius per superstep — the fixpoint arrives in
          // ~ceil(log3 d) barriers instead of d, and each barrier is
          // what q_connected_components actually pays for (round-4
          // verdict: cost = supersteps x job latency, plan shape
          // exhausted). All join sides scan the checkpointed solution
          // (vertex-sized, no recompute); the a-side filter prunes
          // already-rooted vertices where the jump is a no-op.
          // b-side filtered to NON-ROOTED label targets (r8 headroom
          // run): if my label b is its own root, the one-hop jump
          // value b.component == b.vertex == my current component — an
          // exact no-op message. Dropping rooted b rows removes only
          // those no-ops (labels are monotone, so "rooted now" can
          // only later improve to a value the direct-message path
          // carries anyway)... and at convergence, when ~|V| rows
          // probe onto the few component roots (the measured 36s/80s
          // tail at 10M vertices, SCALE.md "iteration headroom"), the
          // jump join's build side shrinks toward empty instead of
          // concentrating. The SECOND hop must NOT filter: a rooted c
          // there still carries j1's one-hop improvement.
          // Convergence-tail skew fix (r9, SCALE.md "iteration
          // headroom"): as labels converge, a-side probe keys
          // (a.component) collapse onto the few component roots — at
          // the last supersteps ~|V| rows exchange onto #components
          // keys (measured 36s/80s final barriers at 10M vertices)
          // even though every one of those rows joins nothing (their
          // rooted target is filtered off the b side). Anti-join the
          // ROOT SET off the probe side BEFORE the exchange: removes
          // exactly those no-op rows, so j1's output is unchanged.
          // The anti join is broadcast ONLY under a driver-measured
          // bound: rootCount (observed on the previous barrier's job,
          // monotonically shrinking) must fit comfortably in an
          // executor (4M single-long rows ≈ 32 MB). Above the bound —
          // possible on a many-component graph, where the probe keys
          // are spread and there is no skew to fix — the filter is
          // skipped and the plan is the round-8 one.
          val aSide = rootPrunedProbe(solution, rootFilterEligible, rootCount)
          val j1 = aSide
            .join(solution.alias("b")
                .filter(col("b.component") =!= col("b.vertex")),
              col("a.component") === col("b.vertex"))
            .select(col("a.vertex").as("vertex"),
              col("b.component").as("component"))
          // labels are monotone (comp[x] <= x), so comp^3 <= comp^2:
          // only the deepest composition needs to be messaged
          val jumps = j1.alias("j")
            .join(solution.alias("c"), col("j.component") === col("c.vertex"))
            .select(col("j.vertex").as("vertex"),
              col("c.component").as("component"), lit(true).as("is_msg"))
          merged = solution
            .select(col("vertex"), col("component"), lit(false).as("is_msg"))
            .unionByName(msgs)
            .unionByName(jumps)
            .groupBy(col("vertex"))
            .agg(min(col("component")).as("new_comp"),
              min(when(!col("is_msg"), col("component"))).as("old_comp"))
          solution = merged.select(col("vertex"), col("new_comp").as("component"))
          workset = merged.filter(col("new_comp") < col("old_comp"))
            .select(col("vertex"), col("new_comp").as("component"))
          b += 1
        }
        // barrier: one job materializes the whole batch + truncates
        // lineage; the changed-count metric piggybacks on that same
        // job (Observation), so convergence costs no extra action
        val obs = org.apache.spark.sql.Observation(s"cc_changed_$i")
        val m = merged
          .observe(obs,
            count(when(col("new_comp") < col("old_comp"), true)).as("changed"),
            count(when(col("new_comp") === col("vertex"), true)).as("rooted"))
          .transform(Iterations.checkpoint)
        solution = m.select(col("vertex"), col("new_comp").as("component"))
        Iterations.freeCheckpoint(liveCkpt)
        liveCkpt = m
        done = obs.get("changed").asInstanceOf[Long] == 0L
        rootCount = obs.get("rooted").asInstanceOf[Long]
        if (sys.env.contains("GRAFT_ITER_TRACE"))
          println(f"cc superstep $i changed=${obs.get("changed")} " +
            f"rooted=$rootCount t=${(System.nanoTime() - tStep) / 1e9}%.2fs")
        workset = m.filter(col("new_comp") < col("old_comp"))
          .select(col("vertex"), col("new_comp").as("component"))
        i += b
      }
      und.unpersist() // solution is checkpointed; the edge cache is dead
      solution
    }
  }

  /** PageRank with `iterations` fixed supersteps (bulk iteration).
    * Contributions are summed exactly in 1e-12 units (see class doc).
    * edges are treated as directed; dangling mass is not redistributed
    * (matches the reference's simple PageRankBasic semantics).
    */
  def pageRank(edges: DataFrame, iterations: Int = 3, damping: Double = 0.85): DataFrame = {
    // cache the raw edge frame before fan-out: count, both vertex-set
    // branches, out-degrees, and the withDeg join all consume it
    val e = edges.select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val eCount = e.count()
    val vertices = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = vertices.count()
    val parts = Iterations.statePartitions(edges.sparkSession, eCount)
    // loop-invariant: edges with source out-degree, pre-partitioned on
    // the join key so no superstep re-shuffles the edge set (only the
    // vertex-sized rank frame exchanges per step). The out-degree rides
    // a window count over the SAME hash(src) exchange that pre-partitions
    // the cache — one shuffle total, where the groupBy+self-join
    // formulation cost two exchanges plus a join build over the full
    // edge set (measured 6.0s -> 3.8s warm on q_pagerank at sf0.1;
    // r5 re-check: the FIRST run after other work measures ~6.5s —
    // JIT/GC warmup, not plan shape — and settles at 3.7-3.8s from
    // the second back-to-back run on, which Bench's min-of-N records).
    val withDeg = e
      .repartition(parts, col("src"))
      .withColumn("outdeg", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val init = vertices.withColumn("rank", lit(1.0 / n))
    // fixed-n bulk loop, no termination action -> checkpoint only at
    // the end: all supersteps fold into ONE job instead of paying a
    // materialization barrier per step (VERDICT r1: the per-superstep
    // checkpoint+job overhead was 66% of q_pagerank's runtime).
    // cap the fold depth: one job for the default 3 supersteps, but a
    // deep fixed-n loop must still truncate lineage periodically or
    // per-superstep Catalyst analysis cost returns (and codegen
    // nesting can overflow the stack) — see Iterations.bulk doc.
    val result = Iterations.bulk(init, iterations,
      checkpointEvery = math.min(iterations, 8), shufflePartitions = parts) { ranks =>
      // one superstep = one aggregation + one left join back onto the
      // rank frame (not the vertices table — same rows, already
      // cached via the iteration checkpoint, saves a scan per step)
      val contribs = ranks.alias("r")
        .join(withDeg.alias("e"), col("r.id") === col("e.src"))
        .select(col("e.dst").as("id"),
          round(col("r.rank") / col("e.outdeg") * lit(1e12)).cast("long").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("csum"))
      // rank re-quantized to 1e-12 via single-arg round (identical
      // semantics in Spark and DuckDB, unlike round(x, 12)) so every
      // superstep is bit-reproducible cross-engine.
      ranks.alias("v").join(contribs.alias("m"), col("v.id") === col("m.id"), "left")
        .select(col("v.id").as("id"),
          (round((lit((1 - damping) / n) +
            lit(damping) * (coalesce(col("m.csum"), lit(0L)) / lit(1e12))) * lit(1e12))
            .cast("long") / lit(1e12)).as("rank"))
    }
    e.unpersist()
    vertices.unpersist()
    withDeg.unpersist()
    result
  }

  /** KMeans over fixed-dimension float-array points: `iterations` bulk
    * supersteps of assign + recompute, then a final assignment pass.
    * points: (id: long, features: array<float>).
    * returns: (id, cluster) final assignment.
    */
  def kMeans(points: DataFrame, k: Int, iterations: Int = 3): DataFrame = {
    val cents = kMeansCentroids(points, k, iterations)
    points.select(col("id"),
      graft.functions.NearestCell.nearestCell(col("features"), cents).as("cluster"))
  }

  /** Train KMeans and return the centroid matrix (row index = cluster
    * id; k x dim driver-side scalars — the IVF coarse quantizer and
    * the reference's broadcast-set KMeans centroids,
    * [U] stratosphere-examples/.../clustering/KMeans.java).
    *
    * Every arithmetic step is exact and order-independent, so the full
    * training trajectory is bit-reproducible in the DuckDB oracle
    * (Iterative.oracleSql q_kmeans):
    *   - seeding: the k lowest ids become clusters 0..k-1;
    *   - assignment: codegen'd NearestCellExpr argmin over quantized
    *     squared L2 (per-term round((v-c)^2 * 1e12) summed as longs,
    *     lowest cluster id on ties);
    *   - recompute: per-dimension sums of round(v * 1e12) as longs,
    *     centroid = (sum.toDouble / 1e12) / n (fixed IEEE expression
    *     on exact inputs); empty clusters keep their old centroid.
    * Only k*dim scalars ever cross the driver boundary per iteration.
    */
  def kMeansCentroids(points: DataFrame, k: Int,
      iterations: Int = 3): Array[Array[Double]] = {
    import graft.functions.NearestCell
    val pts = points.select(col("id"), col("features"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var centroids: Array[Array[Double]] = pts.orderBy(col("id")).limit(k).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val dim = centroids.head.length
    for (_ <- 1 to iterations) {
      val assigned = pts.withColumn("cluster",
        NearestCell.nearestCell(col("features"), centroids))
      val sums = assigned
        .select(col("cluster"), posexplode(col("features")).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(round(col("v").cast("double") * lit(1e12)).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val byCluster = sums.groupBy(_.getInt(0))
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        byCluster.get(c) match {
          case Some(rows) =>
            val vec = new Array[Double](dim)
            var n = 1L
            rows.foreach { r =>
              vec(r.getInt(1)) = r.getLong(2).toDouble / 1e12
              n = r.getLong(3)
            }
            vec.map(_ / n)
          case None => old
        }
      }
    }
    pts.unpersist()
    centroids
  }

  /** Single-source shortest paths over a ROOTED FOREST by
    * distance-summing pointer jumping — the SSSP analogue of
    * [[connectedComponents]]' barrier cut. Requires every non-root
    * vertex to have exactly one in-edge (parent); the path from the
    * source is then unique, and each jump step replaces every
    * vertex's known ancestor with that ancestor's own ancestor while
    * summing the two path segments, doubling the covered depth per
    * barrier: ceil(log2 depth) self-joins instead of depth
    * message-passing supersteps. The root self-loops with distance 0,
    * so converged rows are fixpoints and extra jumps are no-ops.
    * The general-graph (any topology, message-passing) form is
    * [[VertexCentric.shortestPathsVC]]; parity of the two is asserted
    * in AlgorithmsSpec. Measured on q_sssp at sf0.1 local[32]:
    * 6.3s (10 delta barriers) -> ~1s (2 folded bulk jobs).
    *
    * edges: (src, dst, weight) — dst ids must be unique (forest).
    * maxDepth: bound on edges along any root-to-vertex path.
    * returns: (vertex, distance); the source itself has distance 0. */
  def treeShortestPaths(edges: DataFrame, source: Long, maxDepth: Int): DataFrame = {
    val jumps = 32 - Integer.numberOfLeadingZeros(
      math.max(1, maxDepth) - 1) + 1 // ceil(log2) + 1 idempotent margin
    val init = edges
      .select(col("dst").as("v"), col("src").as("anc"), col("weight").as("d"))
      .unionByName(edges.sparkSession.range(1).select(
        lit(source).as("v"), lit(source).as("anc"), lit(0L).as("d")))
    // fold cap (r8 headroom run): the jump body references `st` more
    // than once (self-join + converged pass-through), so k
    // lazily-folded jumps recompute each branch multiplicatively
    // within the barrier job (within-job subtrees are not deduped —
    // the r6 wave-folding dead end, measured again in r8: the earlier
    // jumps/2 cadence meant 2^12 at depth 1e7 and effectively hung).
    // fold=2 (3 joins per 2 supersteps, half the barriers) is the
    // measured optimum at gate SF; DEEP runs (jumps > 6, i.e. depth >
    // 32) switch to fold=1 — at large state the join dominates barrier
    // latency, so fewer total joins (jumps x 1 vs 1.5x) wins (r8
    // projected ~1.5x from the 58 s/triple-join barriers at 10M;
    // r9 measured, SCALE.md).
    val foldCadence =
      if (jumps <= 6) math.min(2, math.max(1, jumps / 2)) else 1
    // Converged-row split (r9): a row whose ancestor chain reached the
    // source is a fixpoint (the source self-loops at d=0), so jumping
    // it is a no-op — worse, at the convergence tail those rows all
    // carry anc == source, and shuffling them exchanges ~|V| rows onto
    // ONE hot key (the SSSP analogue of CC's root-skew tail). Split
    // them out BEFORE the join: only still-walking rows probe (their
    // anc keys are spread mid-walk), converged rows pass through
    // narrow. The b side stays the full state — active rows finish
    // precisely by jumping onto a converged ancestor. As the active
    // set shrinks, AQE turns the probe join broadcast-sized on its
    // own; no hard hint needed.
    var lastActive = -1L
    var lastT = System.nanoTime()
    val state = Iterations.bulk(init, jumps, checkpointEvery = foldCadence,
        aggregators = Map("active" ->
          count(when(col("anc") =!= lit(source), true))),
        observer = stats => {
          lastActive = stats.aggregates("active").asInstanceOf[Long]
          if (sys.env.contains("GRAFT_ITER_TRACE")) {
            val now = System.nanoTime()
            println(f"sssp-tree jump ${stats.superstep} active=$lastActive " +
              f"t=${(now - lastT) / 1e9}%.2fs")
            lastT = now
          }
        }) ({ st =>
      val done = st.filter(col("anc") === lit(source))
      st.alias("a").filter(col("a.anc") =!= lit(source))
        .join(st.alias("b"), col("a.anc") === col("b.v"))
        .select(col("a.v").as("v"), col("b.anc").as("anc"),
          (col("a.d") + col("b.d")).as("d"))
        .unionByName(done)
    }, terminate = (_, _) => lastActive == 0L)
    // only CONVERGED rows (ancestor chain reached the source) are
    // returned: vertices whose chain didn't reach it within maxDepth
    // jumps — an underestimated maxDepth, or a tree rooted elsewhere
    // in a forest — are ABSENT (the standard unreached-vertex SSSP
    // contract), never present with a silently-partial distance
    val reached = state.filter(col("anc") === source)
    reached.select(col("v").as("vertex"), col("d").as("distance"))
  }

  /** Triangle enumeration over an undirected edge set normalized to
    * a < b ([U] stratosphere-examples/.../graph/EnumTrianglesBasic
    * .java): build length-2 paths by joining on the middle vertex,
    * then close them against the edge set. The a<b normalization
    * yields each triangle exactly once (x<y<z) with no post-dedup.
    * Two shuffle joins on vertex keys — the scalable formulation
    * (candidate volume is sum of per-vertex degree^2, not |E|^2). */
  def enumTriangles(edges: DataFrame, materialize: Boolean = false): DataFrame = {
    // persisted: all three join legs scan the edge set, and the
    // caller's edge derivation (often a self-join + distinct) would
    // otherwise execute three times (r5: q_triangles 0.74 -> ~0.5s).
    // Lifetime: until the caller drops the frame / clearCache(), or
    // pass materialize=true to run now and release the cache before
    // returning (graft.api.Materialize).
    val e = edges.select(col("a"), col("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tris = e.alias("e1")
      .join(e.alias("e2"), col("e1.b") === col("e2.a"))
      .join(e.alias("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    if (materialize) graft.api.Materialize.releasing(tris, Seq(e))
    else tris
  }

  /** k-core peeling trajectory: `rounds` synchronous peel steps, each
    * keeping only edges whose BOTH endpoints currently have degree
    * >= k (public k-core decomposition by iterated peeling; the
    * round-synchronous form is the BSP analogue). The round count is
    * part of the declared semantics — both this and the SQL oracle run
    * EXACTLY `rounds` steps, so results match even before the peel
    * fixpoints; once two consecutive rounds agree the trajectory has
    * converged and further rounds are no-ops (the standard unrolled-
    * oracle contract, same as connectedComponents' bounded chains).
    *
    * Per round: one degree aggregation + two semi joins on the
    * previous round's localCheckpoint (lineage stays flat, barriers =
    * rounds). Returns one row per round: (round, n_vertices,
    * sum_vertex, n_edge_rows) — count/sum over the surviving DISTINCT
    * vertices pins membership, edge-row count pins the peel order.
    *
    * edges: (src, dst) undirected, stored one direction; multi-edges
    * count toward degree (consistent with the CC/PageRank contract). */
  def kCoreTrajectory(edges: DataFrame, k: Int, rounds: Int,
      materialize: Boolean = false): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // ONE degree aggregation per round serves BOTH the next peel
    // filter and the round's trajectory stats (n_vertices = degree
    // rows, n_edge_rows = sum of degrees) — the naive form's extra
    // per-round distinct + edge-count scans measured q_kcore at 5.4s
    // warm sf0.1; this folding plus vertex-sized (not edge-sized)
    // checkpoints is the difference with ~1.5s. The edge frame is
    // re-derived per round from the cheap source scan instead of
    // checkpointed: each u_r is consumed once per round pair (deg_r
    // and the next peel), and caching 1.2M-row edge frames 4x cost
    // more than the recompute.
    def degrees(und: DataFrame): DataFrame =
      und.groupBy(col("src").as("v")).agg(count(lit(1)).as("n"))
    def statsOf(deg: DataFrame, r: Int): DataFrame =
      deg.agg(count(lit(1)).as("n_vertices"),
          coalesce(sum(col("v")), lit(0L)).as("sum_vertex"),
          coalesce(sum(col("n")), lit(0L)).as("n_edge_rows"))
        .select(lit(r.toLong).as("round"), col("n_vertices"),
          col("sum_vertex"), col("n_edge_rows"))
    val base = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var und = base
    var deg = degrees(und).localCheckpoint() // vertex-sized
    val perRound = (1 to rounds).map { r =>
      val keep = deg.filter(col("n") >= k).select(col("v"))
      und = und.alias("e")
        .join(keep.alias("ka"), col("e.src") === col("ka.v"), "left_semi")
        .alias("e2")
        .join(keep.alias("kb"), col("e2.dst") === col("kb.v"), "left_semi")
      // und itself is lazy lineage: without a barrier, round r's degree
      // job re-executes all r prior semi-joins over the cached base —
      // quadratic in rounds (ADVICE r6). Fold the lineage every 4th
      // round (but never on the last — rounds<=4, the measured-optimal
      // q_kcore shape, is unchanged) so deep peels stay linear while
      // shallow ones keep the cheaper rederive-from-base plan.
      if (r % 4 == 0 && r < rounds) und = und.localCheckpoint()
      deg = degrees(und).localCheckpoint() // also materializes the peel
      statsOf(deg, r)
    }
    val traj = perRound.reduce(_ unionByName _)
    // base-union cache lifetime: caller drop / clearCache(), or
    // materialize=true to run the (rounds-row) trajectory now and
    // release the edge cache synchronously — the library-caller
    // contract shared with the dedup/triangle/scoring operators
    if (materialize) graft.api.Materialize.releasing(traj, Seq(base))
    else traj
  }
}
