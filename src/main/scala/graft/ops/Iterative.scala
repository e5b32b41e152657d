package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.graph.Algorithms

/** Iterative-workload queries (SURVEY.md §2.8) over the driver tables.
  *
  * Graph: the bipartite order–part graph from lineitem
  * (src = l_orderkey*2, dst = l_partkey*2+1 — disjoint id spaces).
  * Multi-edges are kept (one per lineitem row) so the SQL oracle can
  * mirror the exact same dataflow.
  */
object Iterative {

  private def orderPartEdges(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select((col("l_orderkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))

  /** Delta-iteration connected components ([U] ConnectedComponents.java).
    * Output: per-component vertex count (compact, deterministic). */
  def qConnectedComponents(spark: SparkSession, dir: String): DataFrame =
    Algorithms.connectedComponents(orderPartEdges(spark, dir))
      .groupBy(col("component")).agg(count(lit(1)).as("n_vertices"))

  /** Bulk-iteration PageRank, 3 supersteps ([U] PageRankBasic.java). */
  def qPageRank(spark: SparkSession, dir: String): DataFrame =
    Algorithms.pageRank(orderPartEdges(spark, dir), iterations = 3)
      .orderBy(col("rank").desc, col("id")).limit(20)

  /** Bulk-iteration KMeans over the embeddings table
    * ([U] .../clustering/KMeans.java). Output: cluster sizes. */
  def qKMeans(spark: SparkSession, dir: String): DataFrame =
    Algorithms.kMeans(
      t(spark, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("features")),
      k = 8, iterations = 3)
      .groupBy(col("cluster")).agg(count(lit(1)).as("n_points"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_connected_components" -> (qConnectedComponents _),
    "q_pagerank" -> (qPageRank _),
    "q_kmeans" -> (qKMeans _),
  )

  /** Unrolled 3-superstep PageRank in pure SQL. Every superstep
    * quantizes ranks to 1e-12 via exact integer sums (see
    * Algorithms.pageRank), so this matches the Spark loop bit-for-bit.
    * CC and KMeans have no tractable SQL oracle (recursive CTE label
    * propagation enumerates |component|^2 pairs; 64-dim centroid math
    * isn't oracle-SQL) → rows-only check + ScalaTest golden suites.
    */
  val oracleSql: Map[String, String] = {
    val off = s"CAST(${(1 - 0.85).toString} AS DOUBLE)/(SELECT n FROM nn)"
    def step(prev: String, out: String) =
      s"""$out AS (
           SELECT v.id,
             CAST(round(($off + 0.85*(COALESCE(s.csum,0)/1e12))*1e12) AS BIGINT)/1e12 AS rank
           FROM v LEFT JOIN (
             SELECT e.dst AS id,
               SUM(CAST(round(r.rank/d.outdeg*1e12) AS BIGINT)) AS csum
             FROM $prev r JOIN e ON r.id = e.src JOIN d ON e.src = d.src
             GROUP BY e.dst) s ON v.id = s.id)"""
    Map(
      "q_pagerank" ->
        s"""WITH e AS (SELECT l_orderkey*2 AS src, l_partkey*2+1 AS dst FROM lineitem),
           v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
           nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM v),
           d AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
           r0 AS (SELECT id, CAST(1.0 AS DOUBLE)/(SELECT n FROM nn) AS rank FROM v),
           ${step("r0", "r1")},
           ${step("r1", "r2")},
           ${step("r2", "r3")}
           SELECT id, rank FROM r3 ORDER BY rank DESC, id LIMIT 20""",
    )
  }
}
