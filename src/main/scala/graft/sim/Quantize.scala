package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 vector quantization — the standard ANN compression
  * (scale = max|x|/127 per vector, elements snapped to [-127, 127]) —
  * expressed in EXACT integer arithmetic so the quantized codes and
  * the reconstruction error are engine-reproducible:
  *
  *   xq_i    = round(x_i · 1e6)                 (1e-6-unit longs)
  *   scale_q = max_i |xq_i|
  *   q_i     = sign(xq_i) · ⌊(|xq_i|·254 + scale_q) / (2·scale_q)⌋
  *             (= round(127·xq_i/scale_q), zero vector → all zeros)
  *   err_i   = |127·xq_i − q_i·scale_q|         (residual in 1e-6/127 units)
  *
  * Integer division rides `(a − a % b) / b` on the Spark side (exact:
  * the numerator is a multiple of b and both fit double's 2^53) and
  * `//` in the DuckDB twin — identical quotients because every
  * operand is non-negative.
  *
  * 100 TB posture: pure per-row expression work over the embedding
  * array — zero shuffle before the (small) per-label aggregate; the
  * same codes feed a real int8 ANN index build.
  */
object Quantize {

  private def intDiv(a: Column, b: Column): Column =
    ((a - (a % b)) / b).cast("long")

  private def lsign(v: Column): Column =
    when(v > 0, lit(1L)).when(v < 0, lit(-1L)).otherwise(lit(0L))

  /** 1e-6-unit long quantization of a float-array column (the `xq`
    * stage of the scheme above). */
  def xqCol(emb: Column): Column =
    transform(emb, x => round(x.cast("double") * lit(1000000L)).cast("long"))

  /** Per-vector scale: max |xq_i|. */
  def scaleCol(xq: Column): Column = array_max(transform(xq, v => abs(v)))

  /** One element's int8 code (exact round(127·xq/scale); zero vector
    * → 0). Identical arithmetic to [[int8Stats]]'s inline `q`. */
  def codeCol(v: Column, scale: Column): Column =
    when(scale === 0, lit(0L)).otherwise(
      lsign(v) * intDiv(abs(v) * 254 + scale, scale * 2))

  /** Attach `codes array<tinyint>` + `scale_q long` columns derived
    * from `embedding` — the storage form of the quantizer (codes are
    * 1 byte/element on disk and through the scan, an 8x cut over the
    * 1e-6-unit longs and 4x over the floats; that memory-bandwidth
    * cut is the point of an int8 ANN index). */
  def withInt8Codes(df: DataFrame): DataFrame =
    df.withColumn("_xq", xqCol(col("embedding")))
      .withColumn("scale_q", scaleCol(col("_xq")))
      .withColumn("codes",
        transform(col("_xq"), v => codeCol(v, col("scale_q"))).cast("array<tinyint>"))
      .drop("_xq")

  /** Per-label quantization audit: vector count, summed scales,
    * summed codes, summed absolute reconstruction residual. */
  def int8Stats(emb: DataFrame): DataFrame = {
    val xq = transform(col("embedding"),
      x => round(x.cast("double") * lit(1000000L)).cast("long"))
    def q(v: Column, scale: Column): Column =
      when(scale === 0, lit(0L)).otherwise(
        lsign(v) * intDiv(abs(v) * 254 + scale, scale * 2))
    emb
      .select(col("vec_id"), col("label"), xq.as("xq"))
      .withColumn("scale_q", array_max(transform(col("xq"), v => abs(v))))
      .withColumn("sum_q",
        aggregate(col("xq"), lit(0L), (acc, v) => acc + q(v, col("scale_q"))))
      .withColumn("sum_err",
        aggregate(col("xq"), lit(0L),
          (acc, v) => acc + abs(v * 127 - q(v, col("scale_q")) * col("scale_q"))))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("scale_q")).as("sum_scale"),
        sum(col("sum_q")).as("sum_codes"),
        sum(col("sum_err")).as("sum_err"))
  }

  /** SQL twin of [[int8Stats]] for the DuckDB oracle. */
  val sqlInt8Stats: String = {
    val xq = "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
    def q(v: String) =
      s"""CASE WHEN scale_q = 0 THEN 0
          ELSE (CASE WHEN $v > 0 THEN 1 WHEN $v < 0 THEN -1 ELSE 0 END)
               * ((abs($v) * 254 + scale_q) // (scale_q * 2)) END"""
    s"""WITH xqv AS (SELECT vec_id, label, $xq AS xq FROM embeddings),
       sc AS (SELECT vec_id, label, xq,
                list_max(list_transform(xq, v -> abs(v))) AS scale_q
              FROM xqv),
       per AS (SELECT label, scale_q,
                 COALESCE(list_sum(list_transform(xq, v -> ${q("v")})), 0) AS sum_q,
                 COALESCE(list_sum(list_transform(xq,
                   v -> abs(v * 127 - (${q("v")}) * scale_q))), 0) AS sum_err
               FROM sc)
       SELECT label, COUNT(1) AS n_vecs,
         CAST(SUM(scale_q) AS BIGINT) AS sum_scale,
         CAST(SUM(sum_q) AS BIGINT) AS sum_codes,
         CAST(SUM(sum_err) AS BIGINT) AS sum_err
       FROM per GROUP BY label"""
  }
}
