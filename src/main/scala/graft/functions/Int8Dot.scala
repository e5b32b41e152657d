package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, LongType}

/** Codegen'd integer dot product over two int8 code arrays
  * (`array<tinyint>`) — the hot loop of the quantized IVF scan
  * ([[graft.sim.IvfIndex.searchInt8]]).
  *
  * Same rationale as [[CosineSim]]: a higher-order
  * `aggregate(zip_with(...))` formulation runs interpreted per
  * element, while this is a tight primitive loop inside whole-stage
  * codegen. The arithmetic is EXACT — |code| <= 127 so a single term
  * is <= 16129 and a 2^44-element vector would be needed to overflow
  * the long accumulator; the result is trivially order-independent
  * and matches the DuckDB oracle's `list_sum(list_transform(...))`
  * bit-for-bit. The reference has no ANN layer; this extends the
  * engine's training-data-pipeline surface (SURVEY.md §7 phase 4).
  */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left.dataType, right.dataType).collectFirst {
      case dt if !dt.isInstanceOf[ArrayType] ||
        dt.asInstanceOf[ArrayType].elementType != ByteType =>
        TypeCheckResult.TypeCheckFailure(
          s"int8_dot requires array<tinyint> inputs, got ${dt.catalogString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $dot = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $dot += (long) $a.getByte($i) * (long) $b.getByte($i);
        }
        ${ev.value} = $dot;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Int8Dot {

  /** Column API (Spark 4 Column <-> catalyst Expression bridge). */
  def int8Dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(Int8Dot(Bridge.expression(a), Bridge.expression(b)))
  }
}
