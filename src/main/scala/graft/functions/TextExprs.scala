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

  /** Per-window (n_tok, chunk_fp) pairs for [[graft.pipeline.Chunking]]
    * via PREFIX hashes (VERDICT r7 #5): P_0 = 0, P_{j+1} = (P_j·31 +
    * v_j) mod p, window [s, e) fp = (P_e − P_s·31^(e−s)) mod p — each
    * token is hashed ONCE regardless of window overlap, eliminating
    * the chunkSize/stride recompute factor of the slice-and-fold
    * formulation (1.33x at 64/48, unbounded as stride shrinks). The
    * residue is identical to the per-window fold: both equal
    * Σ v_i·31^(e−1−i) mod p, and the fold keeps values in [0, p), as
    * does the adjusted difference. No overflow: p < 2^30, so
    * P_s·pow < 2^60. Windows start at 0, stride, 2·stride, … while
    * < n_tokens (split("", -1) yields one empty token, so every doc
    * has ≥ 1 window — same as the sequence() formulation). */
  def chunkFps(text: UTF8String, chunkSize: Int, stride: Int): Array[Long] = {
    val ws = tokens(text)
    val n = ws.length
    val pref = new Array[Long](n + 1)
    var i = 0
    while (i < n) { pref(i + 1) = (pref(i) * 31 + wordVal(ws(i))) % Mod; i += 1 }
    val maxLen = math.min(chunkSize, n)
    val pow = new Array[Long](maxLen + 1)
    pow(0) = 1L
    i = 1
    while (i <= maxLen) { pow(i) = pow(i - 1) * 31 % Mod; i += 1 }
    val nWin = (n - 1) / stride + 1
    // flattened (n_tok, fp) pairs; the expression wraps them as structs
    val out = new Array[Long](nWin * 2)
    var w = 0
    while (w < nWin) {
      val s = w * stride
      val e = math.min(s + chunkSize, n)
      val fp = ((pref(e) - pref(s) * pow(e - s) % Mod) % Mod + Mod) % Mod
      out(w * 2) = e - s
      out(w * 2 + 1) = fp
      w += 1
    }
    out
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

/** Rolling-prefix-hash chunk fingerprints (see [[TextHash.chunkFps]]):
  * array<struct<n_tok, chunk_fp>>, one element per stride window.
  * CodegenFallback like FingerprintExpr — the per-row loop dominates. */
case class ChunkFpsExpr(child: Expression, chunkSize: Int, stride: Int)
    extends UnaryExpression with CodegenFallback {
  require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
    s"need 1 <= stride <= chunkSize, got stride=$stride size=$chunkSize")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("n_tok", LongType, nullable = false),
      StructField("chunk_fp", LongType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.requireString("chunk_fps", child.dataType)
  override protected def nullSafeEval(input: Any): Any = {
    val flat = TextHash.chunkFps(input.asInstanceOf[UTF8String], chunkSize, stride)
    val rows = new Array[Any](flat.length / 2)
    var i = 0
    while (i < rows.length) {
      rows(i) = org.apache.spark.sql.catalyst.InternalRow(flat(2 * i), flat(2 * i + 1))
      i += 1
    }
    new GenericArrayData(rows)
  }
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
  def chunkFpsFast(text: Column, chunkSize: Int, stride: Int): Column =
    Bridge.column(ChunkFpsExpr(Bridge.expression(text), chunkSize, stride))
}
