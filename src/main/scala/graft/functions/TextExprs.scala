package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Imperative Catalyst expressions for the text-hash pipeline.
  *
  * Semantics are IDENTICAL to the Column/HOF formulations in
  * graft.text.TextFunctions (asserted bit-for-bit in TextExprsSpec, and
  * still oracle-checked against DuckDB) — only execution differs:
  * higher-order functions evaluate interpreted per element through
  * Catalyst's eval machinery; these run one tight JVM loop per row
  * (~5-10x on the document corpus). CodegenFallback is fine here: the
  * per-row loop dominates, not the row-boundary virtual call.
  */
object TextHash {

  val Mod = 1000000007L

  def wordVal(w: String): Long = {
    val first = if (w.isEmpty) 0 else w.charAt(0).toInt
    val last = if (w.isEmpty) 0 else w.charAt(w.length - 1).toInt
    first * 1024L + last * 32L + w.length
  }

  def tokens(text: UTF8String): Array[String] =
    text.toString.split(" ", -1)

  def fingerprint(text: UTF8String): Long = {
    val ws = tokens(text)
    var h = 0L
    var i = 0
    while (i < ws.length) { h = (h * 31 + wordVal(ws(i))) % Mod; i += 1 }
    h
  }

  /** Distinct 3-gram shingle strings, first-occurrence order
    * (= array_distinct over the transform order). */
  def shingles3(text: UTF8String): Array[UTF8String] = {
    val ws = tokens(text)
    if (ws.length < 3) return Array.empty
    val seen = new mutable.LinkedHashSet[String]
    var i = 0
    while (i + 2 < ws.length) {
      seen.add(ws(i) + " " + ws(i + 1) + " " + ws(i + 2)); i += 1
    }
    seen.iterator.map(UTF8String.fromString).toArray
  }

  /** Distinct 3-gram shingle rolling-hash values, first-occurrence
    * order. */
  def shingleVals3(text: UTF8String): Array[Long] = {
    val ws = tokens(text)
    if (ws.length < 3) return Array.empty
    val seen = new mutable.LinkedHashSet[Long]
    var i = 0
    while (i + 2 < ws.length) {
      var h = 0L
      var j = i
      while (j <= i + 2) { h = (h * 31 + wordVal(ws(j))) % Mod; j += 1 }
      seen.add(h); i += 1
    }
    seen.toArray
  }

  /** `bits`-bit SimHash over token hashes: bit b is set iff the sum of
    * (+1/-1) votes from each token hash's bit b is positive. One pass
    * over the tokens; the HOF formulation (Dedup.simhashRef) re-walks
    * the token-hash array once per bit. */
  def simhash(text: UTF8String, bits: Int): Long = {
    val ws = tokens(text)
    val votes = new Array[Int](bits)
    var i = 0
    while (i < ws.length) {
      val v = (wordVal(ws(i)) * 2654435761L) % Mod
      var b = 0
      while (b < bits) {
        votes(b) += ((v >> b) & 1L).toInt * 2 - 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) out |= 1L << b; b += 1 }
    out
  }
}

case class FingerprintExpr(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.requireString("text_fingerprint", child.dataType)
  override protected def nullSafeEval(input: Any): Any =
    TextHash.fingerprint(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class Shingles3Expr(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.requireString("shingles3", child.dataType)
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TextHash.shingles3(input.asInstanceOf[UTF8String]).asInstanceOf[Array[Any]])
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class ShingleVals3Expr(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.requireString("shingle_vals3", child.dataType)
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHash.shingleVals3(input.asInstanceOf[UTF8String]))
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** One-pass SimHash straight off the text column; stays inside
  * whole-stage codegen via the static-method doGenCode pattern
  * (same as MinHashSigExpr — no per-bit interpreted HOF passes). */
case class SimHashExpr(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.requireString("doc_simhash", child.dataType)
  override protected def nullSafeEval(input: Any): Any =
    TextHash.simhash(input.asInstanceOf[UTF8String], bits)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextHash.simhash($v, $bits);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TextExprs {
  def fingerprintFast(text: Column): Column =
    Bridge.column(FingerprintExpr(Bridge.expression(text)))
  def shingles3Fast(text: Column): Column =
    Bridge.column(Shingles3Expr(Bridge.expression(text)))
  def shingleVals3Fast(text: Column): Column =
    Bridge.column(ShingleVals3Expr(Bridge.expression(text)))
  def simhashFast(text: Column, bits: Int): Column =
    Bridge.column(SimHashExpr(Bridge.expression(text), bits))
}
