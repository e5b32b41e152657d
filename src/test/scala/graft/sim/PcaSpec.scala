package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("integer division truncates toward zero identically across engines") {
    // the oracle contract: Spark `div`, DuckDB 1.0 `//`, and Scala
    // Long `/` all truncate toward zero (DuckDB 1.0 verified
    // (-7)//2 = -3 — it does NOT floor; Tables.scala documents the
    // same hazard for oracle authors)
    val r = spark.sql("SELECT -7 div 2 AS a, 7 div 2 AS b, -6 div 2 AS c").head
    assert(r.getLong(0) == -3L && r.getLong(1) == 3L && r.getLong(2) == -3L)
    assert(-7L / 2L == -3L)
  }

  test("topEigenFixedPoint finds the dominant axis of a diagonal matrix") {
    // diag(9, 1): dominant eigenvector is e0; fixed-point iteration
    // from all-VScale must converge with |v0| = VScale and v1 decayed
    // by (1/9) per iteration
    val gram = Array((0, 0, 9000000L), (1, 1, 1000000L))
    val v = Pca.topEigenFixedPoint(gram, dim = 2, iters = 8)
    assert(v(0) == Pca.VScale)
    assert(math.abs(v(1)) <= 1)
  }

  test("topEigenFixedPoint handles dominant directions with mixed signs") {
    // [[2, -1], [-1, 2]]: dominant eigenvector is (1, -1)/sqrt(2),
    // EXACTLY orthogonal to an all-equal start — only the asymmetric
    // v0 seed (coefficient ~1/VScale) reaches it, and the per-
    // iteration gain is (3/1), so full convergence takes ~30 rounds
    val gram = Array((0, 0, 2000000L), (0, 1, -1000000L),
      (1, 0, -1000000L), (1, 1, 2000000L))
    val v = Pca.topEigenFixedPoint(gram, dim = 2, iters = 30)
    assert(math.abs(v(0)) == Pca.VScale || math.abs(v(1)) == Pca.VScale)
    assert(math.abs(math.abs(v(0)) - math.abs(v(1))) <= 2)
    assert(v(0).sign != v(1).sign)
  }

  test("deflation yields the second eigenvector of a diagonal matrix") {
    // diag(9, 4, 1): v1 -> e0; after deflation the dominant direction
    // of the residual is e1
    val gram = Array((0, 0, 9000000L), (1, 1, 4000000L), (2, 2, 1000000L))
    val gn = Pca.rescale(gram)
    val v1 = Pca.iterateRescaled(gn, 3, 20)
    assert(v1(0) == Pca.VScale && math.abs(v1(1)) <= 2 && math.abs(v1(2)) <= 2)
    val v2 = Pca.iterateRescaled(Pca.deflate(gn, 3, v1), 3, 20)
    assert(math.abs(v2(1)) == Pca.VScale, v2.toSeq.toString)
    // residual first-component leakage after fixed-point deflation is
    // bounded by the truncation error, far below the true component
    assert(math.abs(v2(0)) < Pca.VScale / 100, v2.toSeq.toString)
    assert(math.abs(v2(2)) < Pca.VScale / 2, v2.toSeq.toString)
  }

  test("degenerate matvec collapses to the zero vector, same as the SQL guard") {
    // ADVICE r8: an exactly rank-1 Gram annihilates w under deflation.
    // Both engines must replay the SAME step — divide by
    // max(|w|max, 1), collapsing v to all-zero — not early-return the
    // previous vector (Scala) while the oracle divides by zero (SQL).
    val zero = Array.empty[(Int, Int, Long)] // the all-zero 2x2 matrix
    val v = Pca.iterateRescaled(zero, dim = 2, iters = 3)
    assert(v.toSeq == Seq(0L, 0L), v.toSeq.toString)
    // rank-1 outer-product Gram (of [1, 1]*GramScale): deflation
    // removes the only component exactly; the "second eigenvector"
    // is the zero vector on both engines, not a division error
    val rank1 = Array((0, 0, 1000000L), (0, 1, 1000000L),
      (1, 0, 1000000L), (1, 1, 1000000L))
    val gn = Pca.rescale(rank1)
    val v1 = Pca.iterateRescaled(gn, 2, 20)
    val v2 = Pca.iterateRescaled(Pca.deflate(gn, 2, v1), 2, 20)
    // truncation residue may leave tiny entries in the first step but
    // repeated division by the max collapses them; the invariant that
    // matters is NO exception and a bounded, near-zero result
    assert(v2.forall(x => math.abs(x) < Pca.VScale / 100), v2.toSeq.toString)
  }

  test("projectTopComponent recovers a planted dominant direction") {
    // vectors concentrated along e0 with small e1 noise: the top
    // component must align with e0, so per-label projections separate
    // labels by their e0 coefficient
    val emb = Seq(
      (1L, Array(1.0f, 0.01f), 0),
      (2L, Array(0.9f, -0.02f), 0),
      (3L, Array(-1.0f, 0.015f), 1),
      (4L, Array(-0.95f, 0.01f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Pca.projectTopComponent(spark, emb, iters = 12)
      .orderBy("label").collect()
    val p0 = out(0).getAs[Long]("sum_proj")
    val p1 = out(1).getAs[Long]("sum_proj")
    // same direction => opposite-sign projections of the two clusters
    assert(p0.sign != p1.sign && p0 != 0 && p1 != 0)
    // magnitude ~ |x| * Quant * VScale => at least 1e10 here
    assert(math.abs(p0) > 1e10.toLong && math.abs(p1) > 1e10.toLong)
  }

  test("projection arithmetic stays within documented bounds at dim 64") {
    // |Gn| <= GramScale, |v| <= VScale => |w| <= dim * GramScale * VScale
    // and |w * VScale| must stay under Long.MaxValue — the scaladoc
    // bound the implementation relies on
    val dim = 64L
    val wMax = dim * Pca.GramScale * Pca.VScale
    assert(wMax * Pca.VScale > 0 && wMax * Pca.VScale < Long.MaxValue)
  }
}
