package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-surface registration for the engine's custom expressions, so
  * raw-SQL users (GraftSession.sql / spark.sql) can call them like
  * built-ins:
  *
  *   SELECT cosine_sim(a.embedding, b.embedding) FROM ...
  *   SELECT doc_fingerprint(text), doc_simhash16(text) FROM documents
  *
  * Two registration paths:
  *   - [[GraftExtensions]] for cluster deploys:
  *     `spark.sql.extensions=graft.functions.GraftExtensions`
  *     (or `SparkSession.builder().withExtensions(new GraftExtensions)`)
  *   - [[GraftFunctions.register]] for an already-built session.
  */
object GraftFunctions {

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (es => CosineSim(es(0), es(1))),
    "doc_fingerprint" -> (es => FingerprintExpr(es.head)),
    "doc_shingles" -> (es => Shingles3Expr(es.head)),
    "doc_shingle_vals" -> (es => ShingleVals3Expr(es.head)),
    "lsh_bucket" -> (es => LshBucketExpr(es.head, 8, 64)),
    // the engine's standard 32-hash family (graft.dedup.Dedup.hashCoeffs)
    "minhash_sig" -> (es => MinHashSigExpr(es.head,
      graft.dedup.Dedup.hashCoeffs.flatMap(c => Seq(c._1, c._2)).toArray,
      graft.text.TextFunctions.HashMod)),
    "doc_simhash16" -> (es => SimHashExpr(es.head, 16)),
    // perceptual fingerprints (r11): dhash56(rgb, w, h[, roll]),
    // audio_hash56(samples array<smallint>)
    "dhash56" -> (es => DHashExpr(es(0), es(1), es(2),
      if (es.length > 3) es(3)
      else org.apache.spark.sql.catalyst.expressions.Literal(0))),
    "audio_hash56" -> (es => AudioHashExpr(es.head)),
    "int8_dot" -> (es => Int8Dot(es(0), es(1))),
  )

  /** Register into a live session's function registry. Idempotent. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (name, builder) =>
      e.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            "graft.functions", name),
          builder))
    }
}
