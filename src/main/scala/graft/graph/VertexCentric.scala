package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.api.Iterations

/** Pregel-style vertex-centric iteration, sugar over the delta
  * iteration — mirrors the reference's Spargel addon
  * ([U] stratosphere-addons/spargel/.../spargel/java/
  * VertexCentricIteration.java: MessagingFunction +
  * VertexUpdateFunction over a workset iteration).
  *
  * Model: vertices (id, value), directed edges (src, dst). Each
  * superstep, every *changed* vertex sends `msg(value)` along its
  * out-edges; messages per target are combined with `combine`;
  * `update(old, agg)` produces the new value; vertices whose value
  * changed form the next workset. Terminates when no vertex changes
  * or after `maxIterations` supersteps.
  *
  * Everything is Column-expressed so each superstep is one
  * codegen'd join+agg+join pipeline; the workset shrinks
  * monotonically for convergent programs (the reference's core
  * efficiency claim for delta iterations).
  */
object VertexCentric {

  /** @param msg         message expression over column "value" (sender's value)
    * @param combine     aggregate over column "msg" (e.g. c => min(c))
    * @param update      (oldValue, combinedMsg) => newValue; newValue != old marks change
    * @param observer    per-superstep stats callback ([U] Spargel's
    *                    iteration aggregators via IterationRuntimeContext)
    * @param convergence custom ConvergenceCriterion over the stats;
    *                    true ends the loop early
    */
  def run(vertices: DataFrame, edges: DataFrame, maxIterations: Int,
      observer: Iterations.SuperstepStats => Unit = null,
      convergence: Iterations.SuperstepStats => Boolean = null)(
      msg: Column => Column,
      combine: Column => Column,
      update: (Column, Column) => Column): DataFrame =
    runWeighted(vertices,
      edges.select(col("src"), col("dst")).withColumn("weight", lit(0L)),
      maxIterations, observer, convergence)(
      (value, _) => msg(value), combine, update)

  /** Weighted variant ([U] Spargel's SSSP example needs the edge
    * value): `msg` sees (senderValue, edgeWeight). Vertices with a
    * NULL value are "unreached" — they start OUTSIDE the workset and
    * send nothing until a message first gives them a value (change
    * detection is null-safe).
    *
    * MEASURED DEAD END (r6, don't retry): folding multiple relaxation
    * "waves" into one superstep barrier to cut barrier-job count.
    * Lazily composed waves re-reference each wave's delta ~3x, so the
    * unmaterialized chain re-executes combinatorially (~3^waves:
    * 74s vs 6.3s on q_sssp at sf0.1); lazy per-wave persist doesn't
    * save it because cache population doesn't dedupe branch
    * recomputation WITHIN the single barrier job (still 10s). When a
    * barrier cut matters, change the ALGORITHM (pointer jumping —
    * Algorithms.treeShortestPaths, connectedComponents), not the
    * superstep batching. */
  def runWeighted(vertices: DataFrame, edges: DataFrame, maxIterations: Int,
      observer: Iterations.SuperstepStats => Unit = null,
      convergence: Iterations.SuperstepStats => Boolean = null)(
      msg: (Column, Column) => Column,
      combine: Column => Column,
      update: (Column, Column) => Column): DataFrame = {
    // loop-invariant: cache the edge set across supersteps
    val e = edges.select(col("src"), col("dst"), col("weight"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val init = vertices.select(col("id"), col("value"))
    Iterations.delta(init, init.filter(col("value").isNotNull),
        Seq("id"), maxIterations,
        observer = observer, convergence = convergence) {
      (solution, workset) =>
        val msgs = workset.alias("w").join(e.alias("g"), col("w.id") === col("g.src"))
          .select(col("g.dst").as("id"),
            msg(col("w.value"), col("g.weight")).as("msg"))
          .groupBy(col("id"))
          .agg(combine(col("msg")).as("agg_msg"))
        val updated = solution.alias("s").join(msgs.alias("m"), col("s.id") === col("m.id"))
          .select(col("s.id").as("id"), col("s.value").as("value"),
            update(col("s.value"), col("m.agg_msg")).as("new_value"))
        val delta = updated.filter(!(col("new_value") <=> col("value")))
          .select(col("id"), col("new_value").as("value"))
        (delta, delta)
    }
  }

  /** Connected components via min-label propagation — the reference's
    * canonical Spargel example. Edges are made undirected here. */
  def connectedComponentsVC(edges: DataFrame, maxIterations: Int = 50): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val vertices = und.select(col("src").as("id")).distinct()
      .withColumn("value", col("id"))
    run(vertices, und, maxIterations)(
      msg = identity,
      combine = c => min(c),
      update = (old, m) => least(old, m))
      .withColumnRenamed("value", "component")
      .withColumnRenamed("id", "vertex")
  }

  /** Single-source shortest paths — the reference Spargel addon's
    * other canonical example ([U] stratosphere-addons/spargel
    * ShortestPaths: MinDistanceMessenger + VertexDistanceUpdater).
    * edges: (src, dst, weight >= 0), directed. Unreachable vertices
    * keep a NULL distance (they never enter the workset, so no
    * infinity sentinel arithmetic exists to overflow).
    * returns: (vertex, distance). */
  def shortestPathsVC(edges: DataFrame, source: Long,
      maxIterations: Int = 50,
      observer: Iterations.SuperstepStats => Unit = null): DataFrame = {
    val vertices = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
      .withColumn("value",
        when(col("id") === source, lit(0L)).otherwise(lit(null).cast("long")))
    runWeighted(vertices, edges, maxIterations, observer = observer)(
      msg = (dist, w) => dist + w,
      combine = c => min(c),
      update = (old, m) => least(old, m)) // least ignores NULL (unreached)
      .withColumnRenamed("value", "distance")
      .withColumnRenamed("id", "vertex")
  }
}
