package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden tests mirroring the reference's iteration ITCases
  * ([U] ConnectedComponentsITCase, DanglingPageRank, KMeansITCase):
  * small graphs with hand-checked fixpoints. */
class AlgorithmsSpec extends SparkSpec {

  import spark.implicits._

  // two components: {1,2,3,4} (path) and {5,6}; plus isolated-via-self 7-8 pair
  def edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (7L, 8L))
    .toDF("src", "dst")

  test("connectedComponents: min-label fixpoint on a 3-component graph") {
    val got = Algorithms.connectedComponents(edges, maxIterations = 20)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (5L, 5L), (6L, 5L), (7L, 7L), (8L, 7L)))
  }

  test("vertex-centric CC agrees with delta-iteration CC") {
    val a = Algorithms.connectedComponents(edges, 20)
      .as[(Long, Long)].collect().sorted.toSeq
    val b = VertexCentric.connectedComponentsVC(edges, 20)
      .select("vertex", "component")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }

  test("connectedComponents converges early (delta iteration terminates on empty workset)") {
    // a long path needs ~n supersteps; maxIterations larger than needed must still stop
    val path = (1L until 10L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Algorithms.connectedComponents(path, maxIterations = 50)
    assert(got.filter(col("component") === 1L).count() == 10)
  }

  test("superstep aggregators: observer sees per-superstep changed counts and convergence criterion stops the loop") {
    import graft.api.Iterations
    // path 1-2-3-4-5: label 1 reaches vertex 5 after 4 propagation steps
    val path = (1L until 5L).map(i => (i, i + 1)).toDF("src", "dst")
    val und = path.union(path.select(col("dst"), col("src")))
    val vertices = und.select(col("src").as("id")).distinct()
      .withColumn("value", col("id"))
    var seen = Vector.empty[Iterations.SuperstepStats]
    VertexCentric.run(vertices, und, maxIterations = 50,
      observer = s => seen :+= s)(
      msg = identity, combine = c => min(c), update = (old, m) => least(old, m))
    // supersteps run until the workset empties; changed counts shrink
    // monotonically to 0 and the superstep index increments from 1
    assert(seen.nonEmpty && seen.last.changed == 0)
    assert(seen.map(_.superstep) == (1 to seen.size))
    assert(seen.map(_.changed).sliding(2).forall(w => w.size < 2 || w(0) >= w(1)))

    // a ConvergenceCriterion (changed <= 2) must stop earlier than the
    // empty-workset fixpoint, and registered aggregators must evaluate
    var stopped = -1
    VertexCentric.run(vertices, und, maxIterations = 50,
      observer = s => stopped = s.superstep,
      convergence = s => s.changed <= 2)(
      msg = identity, combine = c => min(c), update = (old, m) => least(old, m))
    assert(stopped > 0 && stopped < seen.size)

    var aggSeen = Vector.empty[Long]
    Iterations.delta(vertices, vertices, Seq("id"), 50,
      aggregators = Map("n_changed" -> count(lit(1))),
      observer = s => aggSeen :+= s.aggregates("n_changed").asInstanceOf[Long]) {
      (solution, workset) =>
        val msgs = workset.alias("w").join(und.alias("g"), col("w.id") === col("g.src"))
          .select(col("g.dst").as("id"), col("w.value").as("msg"))
          .groupBy(col("id")).agg(min(col("msg")).as("m"))
        val delta = solution.alias("s").join(msgs, Seq("id"))
          .filter(col("m") < col("value"))
          .select(col("id"), col("m").as("value"))
        (delta, delta)
    }
    assert(aggSeen.nonEmpty && aggSeen.last == 0)
  }

  test("bulk iteration observer fires per superstep even inside a folded loop") {
    import graft.api.Iterations
    var seen = Vector.empty[Iterations.SuperstepStats]
    val init = spark.range(10).toDF("id")
    // 4 supersteps folded into 2 barrier jobs (checkpointEvery=2):
    // each step drops the highest id; metrics must still report per
    // superstep, in order
    val out = Iterations.bulk(init, 4, checkpointEvery = 2,
      aggregators = Map("n" -> count(lit(1)), "max_id" -> max(col("id"))),
      observer = s => seen :+= s) { df =>
      df.crossJoin(df.agg(max(col("id")).as("m")))
        .filter(col("id") < col("m")).select(col("id"))
    }
    assert(out.count() == 6)
    assert(seen.map(_.superstep) == (1 to 4))
    assert(seen.map(_.aggregates("n").asInstanceOf[Long]) == Seq(9L, 8L, 7L, 6L))
    assert(seen.map(_.aggregates("max_id").asInstanceOf[Long]) == Seq(8L, 7L, 6L, 5L))
  }

  test("bulk observer drains trailing supersteps when terminate stops between barriers") {
    import graft.api.Iterations
    var seen = Vector.empty[Iterations.SuperstepStats]
    var steps = 0
    val init = spark.range(10).toDF("id")
    // checkpointEvery=3 but a custom terminate stops after superstep 2:
    // steps 1-2 never hit a barrier, so their metrics must be drained
    // by the final checkpoint (ADVICE r3 #2)
    val out = Iterations.bulk(init, 9, checkpointEvery = 3,
      aggregators = Map("n" -> count(lit(1))),
      observer = s => seen :+= s)(
      body = df => df.select(col("id")),
      terminate = (_, _) => { steps += 1; steps >= 2 })
    assert(out.count() == 10)
    assert(seen.map(_.superstep) == (1 to 2))
    assert(seen.map(_.aggregates("n").asInstanceOf[Long]) == Seq(10L, 10L))
  }

  test("aggregators without a consumer are rejected loudly") {
    import graft.api.Iterations
    val init = spark.range(3).toDF("id")
    intercept[IllegalArgumentException] {
      Iterations.bulk(init, 2, aggregators = Map("n" -> count(lit(1))))(identity)
    }
    intercept[IllegalArgumentException] {
      Iterations.delta(init, init, Seq("id"), 2,
        aggregators = Map("n" -> count(lit(1)))) { (s, w) => (w, w) }
    }
  }

  test("iterations degrade gracefully on empty inputs") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Algorithms.connectedComponents(empty, 5).count() == 0)
    assert(VertexCentric.connectedComponentsVC(empty, 5).count() == 0)
  }

  test("vertex-centric SSSP: golden distances + unreachable stays NULL") {
    val e = Seq((1L, 2L, 4L), (1L, 3L, 1L), (3L, 2L, 2L), (2L, 4L, 5L),
      (3L, 4L, 8L), (5L, 1L, 3L)).toDF("src", "dst", "weight")
    val got = VertexCentric.shortestPathsVC(e, source = 1L)
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(1L -> Some(0L), 2L -> Some(3L), 3L -> Some(1L),
      4L -> Some(8L), 5L -> None))
    // agreement with a local Bellman-Ford model on a denser graph
    val edges2 = (for { a <- 0L to 7L; b <- 0L to 7L
      if a != b && (a * 31 + b) % 3 == 0 } yield (a, b, (a * 7 + b) % 9 + 1)).toSeq
    val got2 = VertexCentric.shortestPathsVC(
        edges2.toDF("src", "dst", "weight"), source = 0L)
      .as[(Long, Option[Long])].collect().toMap
    var dist = Map(0L -> 0L)
    var changed = true
    while (changed) {
      changed = false
      for ((a, b, w) <- edges2; da <- dist.get(a))
        if (dist.get(b).forall(_ > da + w)) { dist += b -> (da + w); changed = true }
    }
    val vertices = edges2.flatMap(e => Seq(e._1, e._2)).distinct
    assert(got2 == vertices.map(v => v -> dist.get(v)).toMap)
  }

  test("treeShortestPaths: parity with Spargel SSSP on a rooted forest") {
    // a forest shaped like the q_sssp graph: root 0 fans out to chain
    // heads, chains of varying depth, deterministic weights — the
    // jumping formulation must agree with the message-passing one
    // vertex-for-vertex (and with depth > 2^(jumps-1) corner depths)
    val chains = Seq(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L),
      Seq(10L), Seq(20L, 21L), Seq(30L, 31L, 32L, 33L, 34L))
    val e = chains.flatMap { c =>
      (0L +: c).sliding(2).map { case Seq(a, b) => (a, b, (a + b) % 7 + 1) }
    }.toDF("src", "dst", "weight")
    val viaJump = Algorithms.treeShortestPaths(e, source = 0L, maxDepth = 8)
      .as[(Long, Long)].collect().toMap
    val viaSpargel = VertexCentric.shortestPathsVC(e, source = 0L)
      .as[(Long, Option[Long])].collect().map { case (v, d) => (v, d.get) }.toMap
    assert(viaJump == viaSpargel)
    assert(viaJump(0L) == 0L && viaJump.size == chains.map(_.size).sum + 1)
  }

  test("connectedComponents: a 33-vertex chain collapses within the jump budget") {
    // diameter 32 needs ~4 jump-accelerated supersteps (radius ~3x per
    // step) — well inside maxIterations=8, where plain propagation
    // would need 32; the min label must still traverse end to end
    val chain = (1L until 33L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Algorithms.connectedComponents(chain, maxIterations = 8)
      .as[(Long, Long)].collect()
    assert(got.length == 33 && got.forall(_._2 == 1L))
    // and label direction is orientation-independent
    val rev = (1L until 33L).map(i => (i + 1, i)).toDF("src", "dst")
    assert(Algorithms.connectedComponents(rev, 8)
      .as[(Long, Long)].collect().forall(_._2 == 1L))
  }

  test("pageRank: ranks sum to <= 1 and high-in-degree node wins") {
    // star: everyone points at 1
    val star = Seq((2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L)).toDF("src", "dst")
    val pr = Algorithms.pageRank(star, iterations = 3)
      .as[(Long, Double)].collect().toMap
    assert(pr(1L) > pr(2L))
    // simple PageRank: dangling mass leaks (not redistributed), so the
    // sum only stays bounded above by 1
    assert(pr.values.forall(_ > 0) && pr.values.sum <= 1.0 + 1e-9)
    // determinism: second run identical
    val pr2 = Algorithms.pageRank(star, iterations = 3).as[(Long, Double)].collect().toMap
    assert(pr == pr2)
  }

  test("kMeans: separable 1-d-ish clusters recovered, deterministic") {
    val pts = (0 until 20).map { i =>
      val base = if (i % 2 == 0) 0.0f else 10.0f
      (i.toLong, Array(base + (i % 3) * 0.1f, base - (i % 3) * 0.1f))
    }.toDF("id", "features")
    val got = Algorithms.kMeans(pts, k = 2, iterations = 5)
      .as[(Long, Int)].collect().toMap
    val evens = (0 until 20 by 2).map(i => got(i.toLong)).toSet
    val odds = (1 until 20 by 2).map(i => got(i.toLong)).toSet
    assert(evens.size == 1 && odds.size == 1 && evens != odds)
  }

  test("kCoreTrajectory: pendant chain peels round by round, 2-core triangle survives") {
    // triangle 1-2-3 with pendant chain 3-4-5: round 1 drops 5 (deg 1),
    // round 2 drops the now-exposed 4, round 3 is the converged no-op
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = Algorithms.kCoreTrajectory(edges, k = 2, rounds = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 4L, 10L, 8L), // {1,2,3,4}, 4 undirected edges x2 rows
      (2L, 3L, 6L, 6L),  // triangle only
      (3L, 3L, 6L, 6L))) // fixpoint: further rounds are no-ops
  }
}
