package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** 56-bit perceptual difference-hash (dHash) over a decoded top-down
  * row-major RGB raster — the image-side signature of the dedup
  * family (VERDICT r10 #2): two images that LOOK the same (re-encode,
  * mild noise, small pixel edits) hash within a few bits of each
  * other, while unrelated images land ~28 bits apart (binomial
  * around bits/2; measured floor on the gate fixture: 14).
  *
  * Arithmetic (all integer, oracle-replayable):
  *   - sample an 8x8 luma grid at x_i = i*w/8, y_j = j*h/8
  *     (nearest-pixel downsample — the standard fast dHash variant;
  *     a box-average resampler changes constants, not shape);
  *   - luma = r+g+b of the sampled pixel (monotone in brightness,
  *     which is all gradient comparisons need — no /3, no weights);
  *   - bit (j,i) = 1 iff luma(x_{i+1},y_j) > luma(x_i,y_j): 7
  *     horizontal gradients per row x 8 rows = 56 bits.
  *
  * 56 (not 64) bits on purpose: the fingerprint stays a POSITIVE
  * long, so band extraction is plain shift+mask with identical
  * arithmetic/logical shift semantics in Spark and DuckDB, and
  * radius-7 banding divides evenly (8 bands x 7 bits). Production
  * deploys that need a deeper band value space per band widen the
  * grid (16x16 -> 240-bit fingerprint as 4 longs) — same plan shape,
  * same pair machinery ([[graft.dedup.Dedup.bandedHammingPairs]]).
  */
object ImageHash {

  /** Fingerprint width (8 rows x 7 horizontal gradients). */
  val DHashBits = 56

  /** The kernel — shared verbatim by interpreted eval and codegen
    * (static-method doGenCode pattern, as TextHash). `rgb` must be a
    * top-down row-major RGB raster of exactly 3*w*h bytes (the
    * [[graft.multimodal.MediaCodec]] decode contract). `roll`
    * rotates the sampled pixel index by `roll` pixels (mod w*h) —
    * frame f of the synthetic video fixture is the still raster
    * scrolled by f pixels, so one kernel serves stills (roll 0) and
    * per-frame video fingerprints without re-materializing a rolled
    * raster per frame. */
  def dhash56(rgb: Array[Byte], w: Int, h: Int): Long =
    dhash56(rgb, w, h, 0)

  def dhash56(rgb: Array[Byte], w: Int, h: Int, roll: Int): Long = {
    // long arithmetic: this kernel is SQL-exposed (GraftFunctions
    // "dhash56"), so dims are caller-controlled and an int-wrapping
    // 3*w*h would defeat the bound check and then index negatively
    // (same hardening as MediaCodec's header parsers)
    require(w > 0 && h > 0 && w.toLong * h <= Int.MaxValue / 3 &&
        rgb.length >= 3 * w * h,
      s"dhash56: raster ${rgb.length} bytes < ${w}x${h}x3")
    val wh = w * h
    val r = ((roll % wh) + wh) % wh
    var fp = 0L
    var j = 0
    while (j < 8) {
      val y = j * h / 8
      var prev = -1
      var i = 0
      while (i < 8) {
        val m = (y * w + i * w / 8 + r) % wh
        val s = 3 * m
        val cur = (rgb(s) & 0xff) + (rgb(s + 1) & 0xff) + (rgb(s + 2) & 0xff)
        if (i > 0 && cur > prev) fp |= 1L << (j * 7 + (i - 1))
        prev = cur
        i += 1
      }
      j += 1
    }
    fp
  }

  /** Column API: `dHash56(rgb, width, height[, roll])` over decoded
    * rasters. */
  def dHash56(rgb: Column, width: Column, height: Column): Column =
    dHash56(rgb, width, height, org.apache.spark.sql.functions.lit(0))

  def dHash56(rgb: Column, width: Column, height: Column,
      roll: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(DHashExpr(Bridge.expression(rgb),
      Bridge.expression(width), Bridge.expression(height),
      Bridge.expression(roll)))
  }
}

/** Codegen'd [[ImageHash.dhash56]]: the per-row loop runs inside
  * whole-stage codegen via the static kernel call — no per-sample
  * interpreted HOF passes (same rationale as SimHashExpr). */
case class DHashExpr(rgb: Expression, imgW: Expression, imgH: Expression,
    roll: Expression) extends QuaternaryExpression {

  override def first: Expression = rgb
  override def second: Expression = imgW
  override def third: Expression = imgH
  override def fourth: Expression = roll

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (rgb.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"dhash56 requires a BINARY raster, got ${rgb.dataType.catalogString}")
    else if (imgW.dataType != IntegerType || imgH.dataType != IntegerType ||
        roll.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"dhash56 requires INT dims/roll, got ${imgW.dataType.catalogString}/" +
          s"${imgH.dataType.catalogString}/${roll.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(r: Any, w: Any, h: Any, rl: Any): Any =
    ImageHash.dhash56(r.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int], rl.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, w, h, rl) =>
      s"${ev.value} = graft.functions.ImageHash.dhash56($r, $w, $h, $rl);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(rgb = newFirst, imgW = newSecond, imgH = newThird, roll = newFourth)
}
