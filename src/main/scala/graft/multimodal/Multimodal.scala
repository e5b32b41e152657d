package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §7 phase 4): image/audio/
  * video payloads are opaque `binary` columns plus typed metadata;
  * decode / feature-extraction runs batched per partition.
  *
  * The actual codec step is STUBBED (this container has no image/
  * audio libraries): [[FakeCodec]] is a deterministic stand-in with
  * the same shape a real decoder would have — bytes in, fixed-width
  * feature vector + dimensions out. Everything around it (schema,
  * batch iteration, partition parallelism, downstream aggregation) is
  * real and tested; swapping in a real codec is a 1-function change.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("format", StringType),
    StructField("n_bytes", LongType)))

  /** Wrap any string column as a binary payload table (the test
    * corpus has no real media; documents.text stands in). */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      concat(lit("fmt"), pmod(col("doc_id"), lit(3))).as("format"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))

  /** STUB codec: deterministic pseudo-decode. A real implementation
    * would call the image/audio library here — per *batch* of rows,
    * matching the batched-UDF shape (open codec once per partition). */
  object FakeCodec {
    def open(): FakeCodec.type = this // real codec: allocate native ctx
    def decode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
      val w = 64 + (payload.length % 577)
      val h = 64 + ((payload.length * 31) % 433)
      val feat = Array.tabulate(8)(i =>
        (if (payload.isEmpty) 0f
         else payload(i % payload.length).toFloat / 127f))
      (w, h, feat)
    }
    def close(): Unit = () // real codec: free native ctx
  }

  case class DecodedMedia(media_id: Long, format: String, width: Int,
      height: Int, features: Array[Float])

  /** Batched decode over partitions: codec opened once per partition,
    * rows streamed through it — the Scala analogue of a batched
    * (mapInPandas-style) UDF, and where a real decoder would plug in. */
  def decodeFeatures(media: DataFrame): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.select("media_id", "format", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val codec = FakeCodec.open()
        val out = it.map { case (id, fmt, payload) =>
          val (w, h, feat) = codec.decode(payload)
          DecodedMedia(id, fmt, w, h, feat)
        }
        new Iterator[DecodedMedia] {
          def hasNext: Boolean = { val h = out.hasNext; if (!h) codec.close(); h }
          def next(): DecodedMedia = out.next()
        }
      }
  }

  /** Per-format stats over the decoded features — the downstream
    * aggregation a real pipeline would run. */
  def formatStats(media: DataFrame): DataFrame =
    decodeFeatures(media).toDF()
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n"),
        sum(col("width")).as("sum_width"),
        sum(col("height")).as("sum_height"),
        max(col("width")).as("max_width"))

  /** Fit-within-box resize arithmetic over decoded dimensions: scale
    * the longer side to `box`, preserve aspect ratio, floor to ints
    * (all-integer arithmetic — a real resampler consumes these target
    * dims; the DuckDB oracle replicates them exactly). */
  def resizedDims(media: DataFrame, box: Int = 224): DataFrame =
    decodeFeatures(media).toDF()
      .withColumn("rw",
        expr(s"(width * $box) div greatest(width, height)").cast("long"))
      .withColumn("rh",
        expr(s"(height * $box) div greatest(width, height)").cast("long"))

  /** Frame sampling for video-like payloads: a deterministic pseudo
    * frame count per payload, every `stride`-th index sampled — the
    * one-row-to-many-frames decode shape (explode keeps it narrow;
    * per-frame decode would batch per partition like [[FakeCodec]]). */
  def sampleFrames(media: DataFrame, stride: Int = 10): DataFrame =
    media
      .withColumn("n_frames", (col("n_bytes") % 241 + 8).cast("int"))
      .select(col("media_id"), col("format"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))
}
