package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd flat outer product of a quantized vector with itself:
  * for `x: array<long>` of length n, returns the n²-element
  * `array<long>` with element t = x[t div n] * x[t mod n] — the
  * per-row contribution to an embedding Gram matrix
  * ([[graft.ops.TextOps.qEmbedGram]]). The hot loop allocates ONE
  * primitive array per row instead of the nested-transform
  * formulation's per-pair small arrays + structs with interpreted
  * lambdas (measured at the call site). FULL square rather than the
  * upper triangle: the (i, j) keys then recover from the flat
  * position with exact integer div/mod, where a triangular layout
  * would need a float sqrt inversion downstream (cross-engine
  * exactness risk); the 2x compute is primitive-loop cheap and the
  * exchange is dim²-bounded either way.
  *
  * Exactness: inputs are 1e-6-unit quantized longs (|x| <= 1e6 for
  * unit-norm embeddings), so each product is an exact <= 1e12 long.
  */
case class GramFlat(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"gram_flat requires array<bigint> input, got ${dt.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Long](n * n)
    var t = 0
    var i = 0
    while (i < n) {
      val xi = x.getLong(i)
      var j = 0
      while (j < n) {
        out(t) = xi * x.getLong(j)
        t += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val xi = ctx.freshName("xi")
      s"""
        int $n = $a.numElements();
        long[] $out = new long[$n * $n];
        int $t = 0;
        for (int $i = 0; $i < $n; $i++) {
          long $xi = $a.getLong($i);
          for (int $j = 0; $j < $n; $j++) {
            $out[$t++] = $xi * $a.getLong($j);
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramFlat {

  /** Column API (Spark 4 Column <-> catalyst Expression bridge). */
  def gramFlat(x: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(GramFlat(Bridge.expression(x)))
  }
}
