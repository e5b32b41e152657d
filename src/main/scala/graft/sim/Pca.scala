package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed top-principal-direction extraction over an embedding
  * column via the classic two-pass shape:
  *
  *   1. ONE distributed pass folds the corpus into the dim x dim
  *      second-moment (Gram) matrix — map-side combined, the exchange
  *      carries only partitions x dim^2 rows (see TextOps.qEmbedGram,
  *      whose codegen'd GramFlat primitive this reuses);
  *   2. the power iteration runs DRIVER-side on the dim^2 longs
  *      (bounded: 4096 values at dim 64 — the k x dim collect rule of
  *      Algorithms.kMeans applies);
  *   3. ONE more distributed pass projects every vector onto the
  *      eigenvector, broadcast as a literal array.
  *
  * At 100 TB only the two corpus passes touch data; nothing about the
  * iteration grows with the corpus. This is the uncentered direction
  * (principal axis of the second moment); centering is driver-side
  * arithmetic on the same statistics (G - n * mu mu^T, mu from the
  * q_centroids sums) and deliberately out of this operator's scope.
  *
  * Exactness discipline: everything is FIXED-POINT INTEGER so the
  * DuckDB oracle replays it bit-for-bit (Tables.scala header):
  * elements quantize to 1e-6 units (the q_embed_gram convention), the
  * Gram matrix is rescaled to <= GramScale by one integer division,
  * and each iteration renormalizes v to max-abs = VScale by integer
  * division. All divisions TRUNCATE toward zero on both engines
  * (Spark `div`, DuckDB 1.0 `//`, Scala Long `/` — parity-pinned in
  * ScrubPcaSpec), and every intermediate is bounded away from 2^63:
  * |Gn| <= 1e6, |v| <= 1e5, |w| <= dim * 1e11 = 6.4e12 at dim 64,
  * |w * VScale| <= 6.4e17.
  */
object Pca {

  val Quant = 1000000L      // 1e-6-unit element quantization
  val GramScale = 1000000L  // rescaled Gram max-abs
  val VScale = 100000L      // eigenvector max-abs per iteration

  /** Quantized embedding elements (the q_embed_gram convention). */
  def xq(embedding: Column): Column =
    transform(embedding, x => round(x.cast("double") * Quant).cast("long"))

  def sqlXq(embExpr: String): String =
    s"list_transform($embExpr, x -> CAST(round(CAST(x AS DOUBLE) * $Quant) AS BIGINT))"

  /** Pass 1: exact integer Gram matrix rows (i, j, gram), 0-based. */
  def gram(emb: DataFrame): DataFrame =
    emb.select(xq(col("embedding")).as("v"))
      .select(size(col("v")).as("n"),
        posexplode(graft.functions.GramFlat.gramFlat(col("v"))).as(Seq("t", "p")))
      .groupBy(expr("CAST(t div n AS BIGINT)").as("i"),
        expr("CAST(t % n AS BIGINT)").as("j"))
      .agg(sum(col("p")).as("gram"))

  /** Driver-side fixed-point power iteration on the collected Gram
    * matrix: rescale G once, start from v0_i = VScale - i, and per
    * iteration compute w = Gn v then renormalize to max-abs = VScale.
    * The start vector is deliberately ASYMMETRIC: an all-equal start
    * is exactly orthogonal to the dominant eigenvector of any matrix
    * whose top component has mixed equal-magnitude signs (e.g.
    * [[2,-1],[-1,2]]), and exact arithmetic then never leaves the
    * orthogonal subspace — PcaSpec pins the case. Deterministic: same
    * integers in, same eigenvector out, on any engine that truncates
    * integer division toward zero. */
  def topEigenFixedPoint(gramRows: Array[(Int, Int, Long)], dim: Int,
      iters: Int = 8): Array[Long] = {
    val g = Array.ofDim[Long](dim, dim)
    gramRows.foreach { case (i, j, v) => g(i)(j) = v }
    val gmax = gramRows.map(r => math.abs(r._3)).max
    val div = gmax / GramScale + 1
    val gn = g.map(_.map(_ / div))
    var v = Array.tabulate(dim)(i => VScale - i)
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(dim) { i =>
        var s = 0L; var j = 0
        while (j < dim) { s += gn(i)(j) * v(j); j += 1 }
        s
      }
      val m = w.map(math.abs).max
      if (m == 0) return v
      v = w.map(x => x * VScale / m)
      it += 1
    }
    v
  }

  /** Full pipeline: gram -> collect (dim^2 longs) -> iterate ->
    * project. Output: per label, count + exact sum/min/max of the
    * integer projection p = sum_i xq_i * v_i (|p| <= dim * 1e11). */
  def projectTopComponent(spark: SparkSession, emb: DataFrame,
      iters: Int = 8): DataFrame = {
    val gramRows = gram(emb).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2)))
    val dim = gramRows.map(_._1).max + 1
    val v = topEigenFixedPoint(gramRows, dim, iters)
    val vLit = array(v.map(lit): _*)
    emb.select(col("label"),
        aggregate(zip_with(xq(col("embedding")), vLit, (x, y) => x * y),
          lit(0L), (acc, p) => acc + p).as("p"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("sum_proj"),
        min(col("p")).as("min_proj"), max(col("p")).as("max_proj"))
  }

  /** DuckDB twin: the same Gram + `iters` UNROLLED fixed-point
    * iterations as chained CTEs + the same projection — every step
    * integer-exact, so the oracle reproduces the eigenvector (and
    * hence the projections) bit-for-bit rather than approximately.
    * Every CTE is AS MATERIALIZED: DuckDB inlines CTEs by default,
    * and with each iteration referencing its predecessor twice (the
    * matvec + the max-abs scalar subquery) inlining re-expands the
    * whole chain exponentially — 8 iterations hang; materialized,
    * the oracle runs in under a second. */
  def sqlProjectTopComponent(iters: Int = 8): String = {
    val steps = (1 to iters).map { k =>
      val pv = if (k == 1) "v0" else s"v${k - 1}"
      s"""w$k AS MATERIALIZED (SELECT gn.i AS i, SUM(gn.g * $pv.v) AS w
            FROM gn JOIN $pv ON gn.j = $pv.i GROUP BY gn.i),
         v$k AS MATERIALIZED (SELECT i, (w * $VScale) // (SELECT MAX(ABS(w)) FROM w$k) AS v
            FROM w$k)"""
    }.mkString(",\n")
    s"""WITH xq AS MATERIALIZED (SELECT vec_id, label, ${sqlXq("embedding")} AS v FROM embeddings),
       g0 AS MATERIALIZED (SELECT a.i - 1 AS i, b.j - 1 AS j, SUM(xq.v[a.i] * xq.v[b.j]) AS g
              FROM xq, unnest(generate_series(1, len(xq.v))) AS a(i),
                   unnest(generate_series(1, len(xq.v))) AS b(j)
              GROUP BY 1, 2),
       gn AS MATERIALIZED (SELECT i, j, g // ((SELECT MAX(ABS(g)) FROM g0) // $GramScale + 1) AS g
              FROM g0),
       v0 AS MATERIALIZED (SELECT DISTINCT i, CAST($VScale - i AS BIGINT) AS v FROM g0),
       $steps,
       proj AS (SELECT xq.vec_id, xq.label, SUM(xq.v[vf.i + 1] * vf.v) AS p
                FROM xq, v$iters vf GROUP BY 1, 2)
       SELECT label, COUNT(1) AS n, CAST(SUM(p) AS BIGINT) AS sum_proj,
         CAST(MIN(p) AS BIGINT) AS min_proj, CAST(MAX(p) AS BIGINT) AS max_proj
       FROM proj GROUP BY label"""
  }
}
