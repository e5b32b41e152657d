package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Random-hyperplane LSH bucket id for a float vector — imperative
  * form of Similarity.lshBucketRef (parity-tested bit-for-bit; the
  * Column form builds a planes*dim-node expression tree).
  *
  * Determinism note: per-plane dot products accumulate left-to-right
  * (d = 0..dim-1), exactly like the Column formulation's reduceLeft
  * chain, so sign decisions are identical.
  */
case class LshBucketExpr(child: Expression, planes: Int, dim: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireFloatArray("lsh_bucket", child.dataType)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    var bucket = 0
    var p = 0
    while (p < planes) {
      var s = 0.0
      var d = 0
      while (d < n) {
        val w = ((p * 8191L + d) * 2654435761L) % 1000003L - 501001L
        s += v.getFloat(d) * w.toDouble
        d += 1
      }
      if (s >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object LshBucketExpr {
  def lshBucketFast(vec: Column, planes: Int, dim: Int): Column =
    Bridge.column(LshBucketExpr(Bridge.expression(vec), planes, dim))
}
