package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd cosine similarity over two float-array columns — the one
  * place SURVEY.md §7.3 predicted a custom Expression pays off.
  *
  * Semantics are IDENTICAL to the HOF formulation in
  * graft.sim.Similarity (per-term float product widened to double,
  * quantized to integer 1e-12 units with half-away-from-zero rounding,
  * summed exactly as longs): the result is order-independent and
  * matches the DuckDB oracle bit-for-bit. The difference is execution:
  * higher-order functions run interpreted (per-element Catalyst eval),
  * while this generates a tight primitive loop inside whole-stage
  * codegen — ~10x on the brute-force KNN scan.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireFloatArrays("cosine_sim",
      Seq(left.dataType, right.dataType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i); val yi = y.getFloat(i)
      dot += CosineSim.rs((xi * yi).toDouble)
      na += CosineSim.rs((xi * xi).toDouble)
      nb += CosineSim.rs((yi * yi).toDouble)
      i += 1
    }
    (dot / 1e12) / (math.sqrt(na / 1e12) * math.sqrt(nb / 1e12))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $dot = 0L; long $na = 0L; long $nb = 0L;
        for (int $i = 0; $i < $n; $i++) {
          float $x = $a.getFloat($i);
          float $y = $b.getFloat($i);
          $dot += graft.functions.CosineSim.rs((double)($x * $y));
          $na += graft.functions.CosineSim.rs((double)($x * $x));
          $nb += graft.functions.CosineSim.rs((double)($y * $y));
        }
        ${ev.value} = ($dot / 1e12) /
          (java.lang.Math.sqrt($na / 1e12) * java.lang.Math.sqrt($nb / 1e12));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** Quantize to integer 1e-12 units, rounding half away from zero —
    * the same rule Spark's round() and DuckDB's round() apply to the
    * (never exactly-half) products of two floats. */
  def rs(d: Double): Long = {
    val s = d * 1e12
    if (s >= 0) math.floor(s + 0.5d).toLong else math.ceil(s - 0.5d).toLong
  }

  /** Same rule at integer 1e-6 units — for term magnitudes (e.g. the
    * LSH hyperplane products, up to ~5e5) where 1e-12 units would
    * overflow the long sum. */
  def rs6(d: Double): Long = {
    val s = d * 1e6
    if (s >= 0) math.floor(s + 0.5d).toLong else math.ceil(s - 0.5d).toLong
  }

  /** Column API (Spark 4 Column <-> catalyst Expression bridge). */
  def cosineSim(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))
  }
}
