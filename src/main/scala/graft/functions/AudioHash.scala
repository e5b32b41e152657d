package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, ShortType}

/** 56-bit perceptual audio fingerprint over decoded PCM16 samples —
  * the audio member of the dedup fingerprint family (text SimHash,
  * image dHash, this): sign-of-energy-difference across 57 sampled
  * short windows, the time-domain simplification of the
  * Haitsma-Kalker acoustic-fingerprint shape (production deploys
  * replace window |sample| energy with per-band SPECTRAL energies —
  * more bits, same gradient-sign construction, same pair machinery
  * [[graft.dedup.Dedup.bandedHammingPairs]]).
  *
  * Arithmetic (exact integers, oracle-replayable):
  *   - 57 anchors at p_k = k*n/57; window energy e_k = Σ |s_i| over
  *     the [[Window]]=4 samples from p_k (SHORT windows on purpose —
  *     wide windows average toward the stream mean and the gradient
  *     bits collapse to correlated noise; measured on the gate
  *     fixture: 4-sample windows give variants Hamming 0-7 with the
  *     unrelated mass out at ~18+, wide 1/57-stream windows gave no
  *     usable gap);
  *   - bit k = 1 iff e_{k+1} > e_k  (56 bits, positive long).
  * Uniform-gain invariant (both sides scale), dither-robust (a few
  * perturbed samples rarely flip a window comparison).
  */
object AudioHash {

  /** Fingerprint width (57 windows, 56 consecutive-energy gradients). */
  val Bits = 56

  /** Samples per energy window. */
  val Window = 4

  /** The kernel — shared by interpreted eval and codegen (static
    * doGenCode pattern). Requires n >= 57*[[Window]] samples: the
    * last anchor sits at floor(56n/57) and its window must fit, i.e.
    * n - floor(56n/57) >= Window, guaranteed once n/57 >= Window
    * (n >= 228; the fixture floor is 500 — a real deployment pads or
    * skips sub-quarter-second clips). */
  def energyHash56(samples: Array[Short]): Long = {
    val n = samples.length
    require(n >= 57 * Window, s"energyHash56 needs >= ${57 * Window} samples, got $n")
    var fp = 0L
    var prev = -1L
    var k = 0
    while (k < 57) {
      val p = (k.toLong * n / 57).toInt
      var e = 0L
      var i = 0
      while (i < Window) {
        e += math.abs(samples(p + i).toLong)
        i += 1
      }
      if (k > 0 && e > prev) fp |= 1L << (k - 1)
      prev = e
      k += 1
    }
    fp
  }

  /** Column API over an `array<smallint>` PCM column. */
  def audioHash56(samples: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(AudioHashExpr(Bridge.expression(samples)))
  }
}

/** Codegen'd [[AudioHash.energyHash56]] — the per-window loop runs
  * inside whole-stage codegen via an ArrayData copy + static kernel
  * call (array<smallint> has no zero-copy primitive-array view, and
  * the copy is one short[] per row in the same stage). */
case class AudioHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(ShortType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"audio_hash56 requires array<smallint>, got ${dt.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    AudioHash.energyHash56(input.asInstanceOf[ArrayData].toShortArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.AudioHash.energyHash56($v.toShortArray());")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
