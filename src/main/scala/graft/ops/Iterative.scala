package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.graph.Algorithms

/** Iterative-workload queries (SURVEY.md §2.8) over the driver tables.
  *
  * PageRank graph: the bipartite order–part graph from lineitem
  * (src = l_orderkey*2, dst = l_partkey*2+1 — disjoint id spaces).
  * Multi-edges are kept (one per lineitem row) so the SQL oracle can
  * mirror the exact same dataflow.
  *
  * CC graph: chains of each customer's orders (consecutive orderkeys
  * per o_custkey), broken into chunks of <= ChunkLen vertices. This
  * yields thousands of non-trivial components (sizes 1..ChunkLen)
  * whose min label must propagate up to ChunkLen-1 hops — a real
  * propagation test (the old order–part graph collapsed to ONE
  * component, VERDICT r2) — while bounding the diameter so the oracle
  * can unroll a fixed superstep count that provably covers
  * convergence at any scale factor.
  */
object Iterative {

  private def orderPartEdges(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select((col("l_orderkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))

  /** Chunk length for the CC chain graph: components have at most this
    * many vertices, so min-label propagation converges in at most
    * ChunkLen-1 supersteps regardless of scale factor. */
  val ChunkLen = 8

  /** Edges linking each customer's consecutive orders (by orderkey),
    * restarting every [[ChunkLen]] orders. */
  private def custChainEdges(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    t(spark, dir, "orders")
      .select(col("o_orderkey"), row_number().over(w).as("rn"),
        lead(col("o_orderkey"), 1).over(w).as("nxt"))
      .filter(col("nxt").isNotNull && (col("rn") % ChunkLen) =!= 0)
      .select(col("o_orderkey").as("src"), col("nxt").as("dst"))
  }

  /** Delta-iteration connected components ([U] ConnectedComponents.java).
    * Output: per-component vertex count (compact, deterministic). */
  def qConnectedComponents(spark: SparkSession, dir: String): DataFrame =
    Algorithms.connectedComponents(custChainEdges(spark, dir))
      .groupBy(col("component")).agg(count(lit(1)).as("n_vertices"))

  /** Bulk-iteration PageRank, 3 supersteps ([U] PageRankBasic.java). */
  def qPageRank(spark: SparkSession, dir: String): DataFrame =
    Algorithms.pageRank(orderPartEdges(spark, dir), iterations = 3)
      .orderBy(col("rank").desc, col("id")).limit(20)

  /** Undirected degree distribution of the order–part graph (the
    * first diagnostic anyone runs on a graph before choosing a
    * partitioning / skew strategy): two combiner groupBys over a
    * map-side union of both endpoint columns — no join, no sort.
    * Multi-edges kept, consistent with the CC/PageRank edge
    * contract. */
  def qDegreeHist(spark: SparkSession, dir: String): DataFrame = {
    val e = orderPartEdges(spark, dir)
    e.select(col("src").as("v")).unionByName(e.select(col("dst").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_vertices"))
  }

  /** Peel rounds for the k-core query: part of the declared semantics
    * (both engines run EXACTLY this many rounds — see
    * [[graft.graph.Algorithms.kCoreTrajectory]]). */
  val KCoreK = 3
  val KCoreRounds = 4

  /** Round-synchronous k-core peeling over the order–part graph:
    * per-round survivor counts/checksums. */
  def qKCore(spark: SparkSession, dir: String): DataFrame =
    Algorithms.kCoreTrajectory(orderPartEdges(spark, dir), KCoreK, KCoreRounds)

  /** Bulk-iteration KMeans over the embeddings table
    * ([U] .../clustering/KMeans.java). Output: cluster sizes. */
  def qKMeans(spark: SparkSession, dir: String): DataFrame =
    Algorithms.kMeans(
      t(spark, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("features")),
      k = KMeansK, iterations = KMeansIters)
      .groupBy(col("cluster")).agg(count(lit(1)).as("n_points"))

  val KMeansK = 8
  val KMeansIters = 3
  private[ops] val KMeansDim = 64

  // ---- reusable KMeans-trajectory SQL (shared with the IVF oracle in
  // TextOps): seed c0 = the k lowest vec_ids, then `iters` x (assign,
  // recompute). Distances and centroid updates replicate
  // Algorithms.kMeansCentroids' quantized arithmetic exactly, so the
  // whole trajectory is bit-reproducible cross-engine for ANY k.
  import graft.functions.NearestCell.sqlQuantTerm

  private[ops] def kmDist(emb: String, cent: String): String =
    s"""list_sum(list_transform(generate_series(1, $KMeansDim),
          i -> ${sqlQuantTerm(s"$emb[i]", s"$cent[i]")}))"""

  private[ops] def kmAssign(cPrev: String, out: String): String =
    s"""$out AS MATERIALIZED (
         SELECT p.vec_id, p.embedding, c.cid
         FROM pts p CROSS JOIN $cPrev c
         QUALIFY row_number() OVER (PARTITION BY p.vec_id
           ORDER BY ${kmDist("p.embedding", "c.cent")}, c.cid) = 1)"""

  private[ops] def kmRecompute(aPrev: String, cPrev: String, out: String): String =
    s"""${out}_sums AS (
         SELECT cid, i,
           SUM(CAST(round((embedding[i]) * 1e12) AS BIGINT)) AS s,
           COUNT(*) AS n
         FROM $aPrev, unnest(generate_series(1, $KMeansDim)) AS t(i)
         GROUP BY cid, i),
       ${out}_new AS (
         SELECT cid, list((CAST(s AS DOUBLE)/1e12)/n ORDER BY i) AS cent
         FROM ${out}_sums GROUP BY cid),
       $out AS MATERIALIZED (
         SELECT p.cid, COALESCE(nw.cent, p.cent) AS cent
         FROM $cPrev p LEFT JOIN ${out}_new nw ON p.cid = nw.cid)"""

  /** The full `WITH`-body prefix for a k-cluster trajectory: `pts`,
    * seed `c0`, and iteration CTEs up to `c$iters` (expects the
    * embeddings table; prefix is caller-composable with more CTEs). */
  private[ops] def kmTrajectoryCtes(k: Int, iters: Int,
      ptsWhere: String = ""): String = {
    val seed =
      s"""pts AS (SELECT vec_id, embedding FROM embeddings $ptsWhere),
         c0 AS (
           SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent
           FROM (SELECT vec_id, embedding FROM embeddings $ptsWhere
                 ORDER BY vec_id LIMIT $k))"""
    val iterCtes = (1 to iters).flatMap { it =>
      Seq(kmAssign(s"c${it - 1}", s"a$it"), kmRecompute(s"a$it", s"c${it - 1}", s"c$it"))
    }
    (seed +: iterCtes).mkString(",\n           ")
  }

  /** Virtual-source vertex id for [[qShortestPaths]]: orderkeys start
    * at 0, so the super-source sits below the id space. */
  val SsspSource = -1L

  /** Spargel single-source shortest paths ([U] stratosphere-addons/
    * spargel ShortestPaths) over the customer-chain graph: a virtual
    * super-source links to the head of every <= [[ChunkLen]]-vertex
    * chain, so ALL orders are reached within ChunkLen hops and the
    * oracle can unroll a fixed Bellman-Ford round count that provably
    * covers convergence at any scale factor. Weights are exact integer
    * arithmetic on the (non-negative) endpoint ids, so the converged
    * distances are bit-identical cross-engine. */
  def qShortestPaths(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    val ranked = t(spark, dir, "orders")
      .select(col("o_orderkey"), row_number().over(w).as("rn"),
        lead(col("o_orderkey"), 1).over(w).as("nxt"))
    val chain = ranked
      .filter(col("nxt").isNotNull && (col("rn") % ChunkLen) =!= 0)
      .select(col("o_orderkey").as("src"), col("nxt").as("dst"),
        ((col("o_orderkey") + col("nxt")) % 97 + 1).as("weight"))
    val fromSource = ranked.filter((col("rn") % ChunkLen) === 1)
      .select(lit(SsspSource).as("src"), col("o_orderkey").as("dst"),
        (col("o_orderkey") % 97 + 1).as("weight"))
    // the chain construction gives every vertex exactly one parent
    // (a rooted forest hung off the super-source), so the log-depth
    // pointer-jumping formulation applies: 2 folded jobs instead of
    // ~10 message-passing barriers. Parity with the general Spargel
    // form (shortestPathsVC) is asserted in AlgorithmsSpec.
    graft.graph.Algorithms.treeShortestPaths(
      chain.union(fromSource), SsspSource, maxDepth = ChunkLen)
  }

  /** Triangle count over the part co-occurrence graph of high-quantity
    * lineitems ([U] EnumTrianglesBasic.java as a production query):
    * parts are linked when an order contains both with quantity >= 40;
    * edges normalized a < b so each triangle counts once. */
  def qTriangles(spark: SparkSession, dir: String): DataFrame = {
    val op = t(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 40)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val edges = op.alias("x")
      .join(op.alias("y"), col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b"))
      .distinct()
    Algorithms.enumTriangles(edges)
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Transitive closure of the (directed) customer-chain graph by
    * path-doubling bulk iteration ([U] TransitiveClosureNaive.java —
    * upgraded to the doubling formulation: after k supersteps paths of
    * length <= 2^k are covered, so [[ChunkLen]]-bounded chains need
    * ceil(log2(ChunkLen)) supersteps, not ChunkLen). Output: reachable
    * pair count. */
  def qClosure(spark: SparkSession, dir: String): DataFrame = {
    val e = custChainEdges(spark, dir)
    val doublings = 32 - Integer.numberOfLeadingZeros(ChunkLen - 1) // ceil(log2)
    val closure = graft.api.Iterations.bulk(e, doublings) { c =>
      c.alias("p").join(c.alias("q"), col("p.dst") === col("q.src"))
        .select(col("p.src").as("src"), col("q.dst").as("dst"))
        .union(c).distinct()
    }
    closure.agg(count(lit(1)).as("n_pairs"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_connected_components" -> (qConnectedComponents _),
    "q_pagerank" -> (qPageRank _),
    "q_degree_hist" -> (qDegreeHist _),
    "q_kcore" -> (qKCore _),
    "q_kmeans" -> (qKMeans _),
    "q_triangles" -> (qTriangles _),
    "q_closure" -> (qClosure _),
    "q_sssp" -> (qShortestPaths _),
  )

  /** Unrolled fixed-superstep SQL oracles. Every step of every
    * iteration is exact, order-independent integer/quantized
    * arithmetic (see Algorithms.pageRank / kMeansCentroids /
    * connectedComponents), so these match the Spark loops bit-for-bit.
    * (The ANN queries' oracles live in TextOps and reuse
    * [[kmTrajectoryCtes]] for the IVF coarse quantizer.)
    */
  val oracleSql: Map[String, String] = {
    // ---- PageRank: 3 supersteps, 1e-12-quantized rank updates ------
    val off = s"CAST(${(1 - 0.85).toString} AS DOUBLE)/(SELECT n FROM nn)"
    def prStep(prev: String, out: String) =
      s"""$out AS (
           SELECT v.id,
             CAST(round(($off + 0.85*(COALESCE(s.csum,0)/1e12))*1e12) AS BIGINT)/1e12 AS rank
           FROM v LEFT JOIN (
             SELECT e.dst AS id,
               SUM(CAST(round(r.rank/d.outdeg*1e12) AS BIGINT)) AS csum
             FROM $prev r JOIN e ON r.id = e.src JOIN d ON e.src = d.src
             GROUP BY e.dst) s ON v.id = s.id)"""

    // ---- CC: min-label propagation, unrolled ChunkLen+1 supersteps
    // (components have <= ChunkLen vertices, so labels converge after
    // ChunkLen-1 propagation steps; extra steps are no-ops because the
    // min-merge is idempotent). Messages flow from ALL vertices each
    // step, which has the same per-step trajectory as Spark's
    // changed-only workset: a label unchanged since step t already
    // reached its neighbors at step t+1, so re-sending it never
    // lowers any min.
    // AS MATERIALIZED: each step references its predecessor twice, and
    // an inlined CTE chain re-evaluates 2^steps times (OOM'd DuckDB at
    // sf0.1); materializing makes the unroll linear.
    def ccStep(prev: String, out: String) =
      s"""$out AS MATERIALIZED (
           SELECT vertex, MIN(comp) AS comp FROM (
             SELECT vertex, comp FROM $prev
             UNION ALL
             SELECT und.dst AS vertex, s.comp FROM $prev s
             JOIN und ON s.vertex = und.src)
           GROUP BY vertex)"""
    val ccSteps = (1 to ChunkLen + 1).map(i => ccStep(s"s${i - 1}", s"s$i"))

    // ---- SSSP: unrolled Bellman-Ford. The graph is a forest hung off
    // the virtual super-source (unique path per vertex, <= ChunkLen
    // edges: 1 source hop + ChunkLen-1 chain hops), so round ChunkLen
    // is provably converged; one extra idempotent round for margin.
    // Pure integer arithmetic — no float summation order to diverge.
    def bfStep(prev: String, out: String) =
      s"""$out AS MATERIALIZED (
           SELECT vertex, MIN(dist) AS dist FROM (
             SELECT vertex, dist FROM $prev
             UNION ALL
             SELECT e.dst AS vertex, d.dist + e.w AS dist
             FROM $prev d JOIN e ON d.vertex = e.src)
           GROUP BY vertex)"""
    val bfSteps = (1 to ChunkLen + 1).map(i => bfStep(s"d${i - 1}", s"d$i"))

    val kcoreCtes = (1 to KCoreRounds).map { r =>
      s"""k$r AS (SELECT src AS v FROM u${r - 1} GROUP BY src HAVING COUNT(1) >= $KCoreK),
         u$r AS MATERIALIZED (SELECT e.src, e.dst FROM u${r - 1} e
           WHERE e.src IN (SELECT v FROM k$r) AND e.dst IN (SELECT v FROM k$r)),
         v$r AS (SELECT DISTINCT src AS v FROM u$r),
         t$r AS (SELECT CAST($r AS BIGINT) AS round,
           (SELECT COUNT(1) FROM v$r) AS n_vertices,
           (SELECT CAST(COALESCE(SUM(v), 0) AS BIGINT) FROM v$r) AS sum_vertex,
           (SELECT COUNT(1) FROM u$r) AS n_edge_rows)"""
    }

    Map(
      "q_degree_hist" ->
        """WITH e AS (SELECT l_orderkey*2 AS src, l_partkey*2+1 AS dst FROM lineitem),
           ve AS (SELECT src AS v FROM e UNION ALL SELECT dst FROM e),
           d AS (SELECT v, COUNT(1) AS degree FROM ve GROUP BY v)
           SELECT degree, COUNT(1) AS n_vertices FROM d GROUP BY degree""",
      "q_kcore" ->
        s"""WITH u0 AS MATERIALIZED (
             SELECT l_orderkey*2 AS src, l_partkey*2+1 AS dst FROM lineitem
             UNION ALL
             SELECT l_partkey*2+1, l_orderkey*2 FROM lineitem),
           ${kcoreCtes.mkString(",\n           ")}
           ${(1 to KCoreRounds).map(r => s"SELECT * FROM t$r")
              .mkString("\n           UNION ALL ")}""",
      "q_pagerank" ->
        s"""WITH e AS (SELECT l_orderkey*2 AS src, l_partkey*2+1 AS dst FROM lineitem),
           v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
           nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM v),
           d AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
           r0 AS (SELECT id, CAST(1.0 AS DOUBLE)/(SELECT n FROM nn) AS rank FROM v),
           ${prStep("r0", "r1")},
           ${prStep("r1", "r2")},
           ${prStep("r2", "r3")}
           SELECT id, rank FROM r3 ORDER BY rank DESC, id LIMIT 20""",
      "q_connected_components" ->
        s"""WITH ranked AS (
             SELECT o_orderkey,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn,
               lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS nxt
             FROM orders),
           ed AS (SELECT o_orderkey AS src, nxt AS dst FROM ranked
                  WHERE nxt IS NOT NULL AND rn % $ChunkLen <> 0),
           und AS MATERIALIZED (SELECT src, dst FROM ed UNION ALL SELECT dst, src FROM ed),
           s0 AS MATERIALIZED (SELECT DISTINCT src AS vertex, src AS comp FROM und),
           ${ccSteps.mkString(",\n           ")}
           SELECT comp AS component, COUNT(*) AS n_vertices
           FROM s${ChunkLen + 1} GROUP BY comp""",
      "q_sssp" ->
        s"""WITH ranked AS (
             SELECT o_orderkey,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn,
               lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS nxt
             FROM orders),
           e AS MATERIALIZED (
             SELECT o_orderkey AS src, nxt AS dst,
               (o_orderkey + nxt) % 97 + 1 AS w
             FROM ranked WHERE nxt IS NOT NULL AND rn % $ChunkLen <> 0
             UNION ALL
             SELECT CAST($SsspSource AS BIGINT) AS src, o_orderkey AS dst,
               o_orderkey % 97 + 1 AS w
             FROM ranked WHERE rn % $ChunkLen = 1),
           d0 AS MATERIALIZED (
             SELECT CAST($SsspSource AS BIGINT) AS vertex,
               CAST(0 AS BIGINT) AS dist),
           ${bfSteps.mkString(",\n           ")}
           SELECT vertex, dist AS distance FROM d${ChunkLen + 1}""",
      "q_closure" -> {
        val doublings = 32 - Integer.numberOfLeadingZeros(ChunkLen - 1)
        val steps = (1 to doublings).map { i =>
          s"""c$i AS MATERIALIZED (
               SELECT DISTINCT src, dst FROM (
                 SELECT p.src, q.dst FROM c${i - 1} p JOIN c${i - 1} q ON p.dst = q.src
                 UNION ALL SELECT src, dst FROM c${i - 1}))"""
        }
        s"""WITH ranked AS (
             SELECT o_orderkey,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn,
               lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS nxt
             FROM orders),
           c0 AS MATERIALIZED (
             SELECT o_orderkey AS src, nxt AS dst FROM ranked
             WHERE nxt IS NOT NULL AND rn % $ChunkLen <> 0),
           ${steps.mkString(",\n           ")}
           SELECT COUNT(1) AS n_pairs FROM c$doublings"""
      },
      "q_triangles" ->
        s"""WITH op AS (
             SELECT DISTINCT l_orderkey AS o, l_partkey AS p
             FROM lineitem WHERE l_quantity >= 40),
           ed AS MATERIALIZED (
             SELECT DISTINCT x.p AS a, y.p AS b
             FROM op x JOIN op y ON x.o = y.o AND x.p < y.p)
           SELECT COUNT(1) AS n_triangles
           FROM ed e1 JOIN ed e2 ON e1.b = e2.a
           JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b""",
      "q_kmeans" ->
        s"""WITH ${kmTrajectoryCtes(KMeansK, KMeansIters)},
           ${kmAssign(s"c$KMeansIters", "afinal")}
           SELECT cid AS cluster, COUNT(*) AS n_points FROM afinal GROUP BY cid""",
    )
  }
}
