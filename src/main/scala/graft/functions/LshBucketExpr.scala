package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Random-hyperplane LSH bucket id for a float vector — imperative
  * form of Similarity.lshBucketRef (parity-tested bit-for-bit; the
  * Column form builds a planes*dim-node expression tree). Runs as a
  * tight static-method loop inside whole-stage codegen (the corpus
  * side computes one bucket per vector on the full table scan).
  *
  * Determinism note: per-plane dot products are EXACT-QUANTIZED — each
  * term v[d]*w(p,d) (a float times an integer: exact in double) is
  * rounded half-away-from-zero to integer 1e-6 units and summed as
  * longs, so the sign decision is independent of summation order and
  * bit-reproducible in the DuckDB oracle (the raw-double accumulation
  * this replaces was order-dependent and kept q_knn_lsh un-oracled).
  * Term magnitudes are <= ~5e11 in 1e-6 units, so a 64-dim sum stays
  * far below both 2^63 and DuckDB's 2^53 double-exact range.
  */
case class LshBucketExpr(child: Expression, planes: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireFloatArray("lsh_bucket", child.dataType)

  override protected def nullSafeEval(input: Any): Any =
    LshBucketExpr.compute(input.asInstanceOf[ArrayData], planes, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.LshBucketExpr.compute($v, $planes, $dim);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object LshBucketExpr {

  /** The quantized sign-pattern bucket (see class doc). */
  def compute(v: ArrayData, planes: Int, dim: Int): Int = {
    val n = math.min(dim, v.numElements())
    var bucket = 0
    var p = 0
    while (p < planes) {
      var s = 0L
      var d = 0
      while (d < n) {
        val w = ((p * 8191L + d) * 2654435761L) % 1000003L - 501001L
        s += CosineSim.rs6(v.getFloat(d) * w.toDouble)
        d += 1
      }
      if (s >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  def lshBucketFast(vec: Column, planes: Int, dim: Int): Column =
    Bridge.column(LshBucketExpr(Bridge.expression(vec), planes, dim))
}
