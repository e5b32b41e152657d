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
      iters: Int = 8): Array[Long] =
    iterateRescaled(rescale(gramRows), dim, iters)

  /** Rescaled Gram rows (the gn step shared by driver and oracle):
    * entries bounded to +-GramScale by one exact integer division. */
  def rescale(gramRows: Array[(Int, Int, Long)]): Array[(Int, Int, Long)] = {
    val gmax = gramRows.map(r => math.abs(r._3)).max
    val div = gmax / GramScale + 1
    gramRows.map { case (i, j, g) => (i, j, g / div) }
  }

  /** Hotelling deflation in exact fixed-point arithmetic: remove the
    * dominant component v (max-abs VScale) from the RESCALED matrix
    * gn, so the next power iteration converges to the second
    * component. All intermediates provably bounded: w = gn v <=
    * dim * 1e11; the Rayleigh numerator uses v/10 (<= 1e4) so
    * sum((v_i/10) w_i) <= 64 * 1e4 * 6.4e12 = 4.1e18 < 2^63;
    * lambda = num / den <= ~dim * GramScale; the deflation term
    * (lambda v_i v_j) / (v.v) re-enters gn's +-1e6 range. Every
    * division truncates toward zero in both engines. */
  def deflate(gn: Array[(Int, Int, Long)], dim: Int,
      v: Array[Long]): Array[(Int, Int, Long)] = {
    val g = Array.ofDim[Long](dim, dim)
    gn.foreach { case (i, j, x) => g(i)(j) = x }
    val w = Array.tabulate(dim) { i =>
      var s = 0L; var j = 0
      while (j < dim) { s += g(i)(j) * v(j); j += 1 }
      s
    }
    val num = (0 until dim).map(i => (v(i) / 10) * w(i)).sum
    val den = (0 until dim).map(i => (v(i) / 10) * v(i)).sum
    val lambda = if (den == 0) 0L else num / den
    val q = v.map(x => x * x).sum
    gn.map { case (i, j, x) => (i, j, x - (lambda * v(i) * v(j)) / q) }
  }

  /** Power-iterate an ALREADY-RESCALED matrix (no second rescale —
    * deflated entries are already in range, and the oracle must
    * replay the exact same steps). Degenerate matvec (w == 0, e.g.
    * the second component of an exactly rank-1 Gram where deflation
    * annihilates w): the renormalizer divides by max(|w|, 1), so v
    * collapses to all-zero and stays there — the SAME step the SQL
    * twin's GREATEST(MAX(ABS(w)), 1) guard replays (ADVICE r8; an
    * early-return here would keep the previous vector while the
    * oracle divides by zero — engines diverged). */
  def iterateRescaled(gn: Array[(Int, Int, Long)], dim: Int,
      iters: Int): Array[Long] = {
    val g = Array.ofDim[Long](dim, dim)
    gn.foreach { case (i, j, x) => g(i)(j) = x }
    var v = Array.tabulate(dim)(i => VScale - i)
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(dim) { i =>
        var s = 0L; var j = 0
        while (j < dim) { s += g(i)(j) * v(j); j += 1 }
        s
      }
      val m = math.max(w.map(math.abs).max, 1L)
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

  /** Second principal direction: same two corpus passes, with the
    * dominant component removed by [[deflate]] between the driver-side
    * iterations. Output shape matches [[projectTopComponent]]. */
  def projectSecondComponent(spark: SparkSession, emb: DataFrame,
      iters: Int = 8): DataFrame = {
    val gramRows = gram(emb).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2)))
    val dim = gramRows.map(_._1).max + 1
    val gn = rescale(gramRows)
    val v1 = iterateRescaled(gn, dim, iters)
    val v2 = iterateRescaled(deflate(gn, dim, v1), dim, iters)
    val vLit = array(v2.map(lit): _*)
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
  /** One power-iteration CTE chain over matrix CTE `mat`, vectors
    * named `$p0..$p$iters` (each step MATERIALIZED — see
    * [[sqlProjectTopComponent]] note). */
  private def sqlIterChain(mat: String, p: String, iters: Int): String =
    (1 to iters).map { k =>
      val pv = s"$p${k - 1}"
      s"""${p}w$k AS MATERIALIZED (SELECT $mat.i AS i, SUM($mat.g * $pv.v) AS w
            FROM $mat JOIN $pv ON $mat.j = $pv.i GROUP BY $mat.i),
         $p$k AS MATERIALIZED (SELECT i, (w * $VScale) // (SELECT GREATEST(MAX(ABS(w)), 1) FROM ${p}w$k) AS v
            FROM ${p}w$k)"""
    }.mkString(",\n")

  private val sqlGramCtes: String =
    s"""xq AS MATERIALIZED (SELECT vec_id, label, ${sqlXq("embedding")} AS v FROM embeddings),
       g0 AS MATERIALIZED (SELECT a.i - 1 AS i, b.j - 1 AS j, SUM(xq.v[a.i] * xq.v[b.j]) AS g
              FROM xq, unnest(generate_series(1, len(xq.v))) AS a(i),
                   unnest(generate_series(1, len(xq.v))) AS b(j)
              GROUP BY 1, 2),
       gn AS MATERIALIZED (SELECT i, j, g // ((SELECT MAX(ABS(g)) FROM g0) // $GramScale + 1) AS g
              FROM g0),
       v0 AS MATERIALIZED (SELECT DISTINCT i, CAST($VScale - i AS BIGINT) AS v FROM g0)"""

  private def sqlProjOut(vec: String): String =
    s"""proj AS (SELECT xq.vec_id, xq.label, SUM(xq.v[vf.i + 1] * vf.v) AS p
                FROM xq, $vec vf GROUP BY 1, 2)
       SELECT label, COUNT(1) AS n, CAST(SUM(p) AS BIGINT) AS sum_proj,
         CAST(MIN(p) AS BIGINT) AS min_proj, CAST(MAX(p) AS BIGINT) AS max_proj
       FROM proj GROUP BY label"""

  def sqlProjectTopComponent(iters: Int = 8): String =
    s"""WITH $sqlGramCtes,
       ${sqlIterChain("gn", "v", iters)},
       ${sqlProjOut(s"v$iters")}"""

  /** Second-component twin: the v-chain, then the SAME fixed-point
    * deflation as [[deflate]] (Rayleigh lambda over v/10 to stay in
    * 2^63, outer-product term divided by v.v), then a u-chain over
    * the deflated matrix and the projection over its final vector. */
  def sqlProjectSecondComponent(iters: Int = 8): String = {
    val vf = s"v$iters"
    s"""WITH $sqlGramCtes,
       ${sqlIterChain("gn", "v", iters)},
       wd AS MATERIALIZED (SELECT gn.i AS i, SUM(gn.g * $vf.v) AS w
            FROM gn JOIN $vf ON gn.j = $vf.i GROUP BY gn.i),
       lam AS MATERIALIZED (SELECT
            (SELECT SUM(($vf.v // 10) * wd.w) FROM $vf JOIN wd ON $vf.i = wd.i)
            // (SELECT SUM((v // 10) * v) FROM $vf) AS l),
       qq AS MATERIALIZED (SELECT SUM(v * v) AS q FROM $vf),
       g2 AS MATERIALIZED (SELECT gn.i AS i, gn.j AS j,
            gn.g - ((SELECT l FROM lam) * va.v * vb.v) // (SELECT q FROM qq) AS g
            FROM gn JOIN $vf va ON gn.i = va.i JOIN $vf vb ON gn.j = vb.i),
       u0 AS MATERIALIZED (SELECT DISTINCT i, CAST($VScale - i AS BIGINT) AS v FROM g0),
       ${sqlIterChain("g2", "u", iters)},
       ${sqlProjOut(s"u$iters")}"""
  }
}
