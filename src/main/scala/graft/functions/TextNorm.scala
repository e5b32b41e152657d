package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical-composition step every
  * text pipeline runs before hashing or deduping: visually identical
  * strings with different codepoint sequences ("e" + COMBINING ACUTE
  * vs precomposed "é") must hash identically, or every downstream
  * dedup/fingerprint/token operator silently treats them as distinct
  * documents. Spark has no NFC builtin; this wraps the JVM's
  * java.text.Normalizer (the same Unicode 15 normalization tables
  * DuckDB's nfc_normalize implements — NFC is a standard, so the
  * engines agree by construction, which is what makes the oracle
  * exact). Stays inside whole-stage codegen via the static-method
  * doGenCode pattern (MinHashSigExpr / SimHashExpr). */
object TextNorm {

  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString,
        java.text.Normalizer.Form.NFC))

  def nfcNormalize(c: Column): Column =
    Bridge.column(NfcNormalizeExpr(Bridge.expression(c)))
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.requireString("nfc_normalize", child.dataType)
  override protected def nullSafeEval(input: Any): Any =
    TextNorm.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextNorm.nfc($v);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
