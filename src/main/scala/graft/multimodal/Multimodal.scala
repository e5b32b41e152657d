package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §7 phase 4): image/audio/
  * video payloads are opaque `binary` columns plus typed metadata;
  * decode / feature-extraction runs batched per partition.
  *
  * The codec is [[MediaCodec]] — a real pure-JVM PNM/BMP
  * encoder+decoder (binary headers, bottom-up padded BMP rows), so
  * genuine image bytes flow through the batched-decode operator. The
  * fixture is synthesized from documents.text (this container ships
  * no media corpus): dims derive from text length so the SQL oracle
  * replicates the decoded metadata arithmetically, which makes the
  * header parse itself oracle-checked — a mis-parsed width would
  * hash-mismatch q_multimodal.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("format", StringType),
    StructField("n_bytes", LongType)))

  /** Build a real media table from a document table: each doc is
    * encoded as an actual PPM/BMP/PGM image (format cycles by id,
    * pixels are the doc's bytes cycled to fill the raster). Encoding
    * runs batched per partition like the decode path. */
  def asMediaTable(docs: DataFrame): DataFrame =
    mediaTableVia(docs, MediaCodec.encodeDoc)

  /** Shared encode-table builder (review r14 #5): one batched
    * per-partition encoding shape for every image-container leg, so
    * column names / n_bytes convention / batching can't drift
    * between them ([[variantsVia]] is its perturbed-variant
    * sibling). */
  private def mediaTableVia(docs: DataFrame,
      encode: (Long, Array[Byte]) => (String, Array[Byte]),
      spread: Boolean = false): DataFrame = {
    import docs.sparkSession.implicits._
    // spread=true before an ENTROPY-CODED leg (guide §2.5): a few-file
    // input caps the scan's task count, and the whole encode→decode
    // chain is narrow, so the codec work otherwise runs on that
    // handful of tasks no matter the core count (r18: those queries'
    // 8→32-core ratios sat at ~1.0 over a one-file fixture table).
    // Deliberately NOT applied to the raw-container legs (PPM/BMP/PGM
    // ≈ a header + memcpy per row): there the per-row work is far
    // below an exchange's cost and the A/B measured the spread as a
    // pure regression (q_image_dedup_index 1.25 → 2.43 s) while the
    // entropy codecs won 1.5-3x (q_png_decode 1.23 → 0.40 s,
    // q_webp_decode 2.46 → 0.89 s warm min-of-3). The split is a
    // property of the operator (per-row CPU vs one narrow exchange),
    // not of the fixture scale.
    val rows = docs.select(col("doc_id"), col("text")).as[(Long, String)]
    (if (spread) graft.api.Spread.forCompute(rows) else rows)
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val (fmt, payload) = encode(id, text.getBytes("UTF-8"))
          (id, payload, fmt, payload.length.toLong)
        }
      }
      .toDF("media_id", "payload", "format", "n_bytes")
  }

  /** PNG leg of the media fixture (r14): every doc encoded as an
    * 8-bit truecolor PNG of the SAME raster the ppm leg uses (text
    * bytes cycled, same dims arithmetic), row filters cycling
    * None/Sub/Up/Average/Paeth — so q_png_decode's closed-form pixel
    * checksums make the inflate + five-filter reconstruction itself
    * oracle-checkable. */
  def asPngTable(docs: DataFrame): DataFrame =
    mediaTableVia(docs, MediaCodec.encodeDocPng, spread = true)

  /** JPEG leg of the media fixture (r15): every doc encoded as a
    * REAL baseline grayscale JPEG of flat 8×8 blocks (values = text
    * bytes cycled; odd ids carry restart intervals), the one regime
    * where JPEG decode is bit-exact and therefore oracle-checkable in
    * closed form — see [[JpegCodec]]. */
  def asJpegTable(docs: DataFrame): DataFrame =
    mediaTableVia(docs, JpegCodec.encodeDocJpeg, spread = true)

  /** Progressive (SOF2) sibling of [[asJpegTable]] — same raster,
    * three-scan wire form (r15). */
  def asJpegProgressiveTable(docs: DataFrame): DataFrame =
    mediaTableVia(docs, JpegCodec.encodeDocJpegProgressive, spread = true)

  /** GIF leg of the media fixture (r16): every doc as a REAL
    * grayscale GIF of the PGM regime's raster (256-gray palette,
    * genuine LZW compression, odd ids interlaced) — lossless, so the
    * closed-form pixel checksums pin the LZW decode + deinterlace +
    * palette walk byte-exactly ([[GifCodec]]). */
  def asGifTable(docs: DataFrame): DataFrame =
    mediaTableVia(docs, GifCodec.encodeDocGif, spread = true)

  /** WebP-lossless leg (r17): the SAME gray raster in VP8L streams,
    * bands cycling palette / subtract-green / color-cache+LZ77 /
    * all-14-predictors so every transform family is gate-load-
    * bearing ([[WebpCodec]]). */
  def asWebpTable(docs: DataFrame): DataFrame =
    mediaTableVia(docs, WebpCodec.encodeDocWebp, spread = true)

  /** Wrap a per-partition decode stream so `close` fires when the
    * iterator drains — the one subtle pattern (close inside hasNext)
    * shared by every batched-codec operator here. */
  private def closingIterator[T](close: () => Unit, out: Iterator[T])
      : Iterator[T] = new Iterator[T] {
    def hasNext: Boolean = { val h = out.hasNext; if (!h) close(); h }
    def next(): T = out.next()
  }

  case class DecodedMedia(media_id: Long, format: String, width: Int,
      height: Int, features: Array[Float])

  /** Batched decode over partitions: codec opened once per partition,
    * rows streamed through it — the Scala analogue of a batched
    * (mapInPandas-style) UDF. Features are the first 8 decoded RGB
    * samples normalized to [0,1] (a stand-in for a real embedding
    * head; the dims are what the oracles check). */
  def decodeFeatures(media: DataFrame): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.select("media_id", "format", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val codec = MediaCodec.open()
        val out = it.map { case (id, fmt, payload) =>
          val img = codec.decode(payload)
          val feat = Array.tabulate(8)(i =>
            if (img.rgb.isEmpty) 0f else (img.rgb(i % img.rgb.length) & 0xff) / 255f)
          DecodedMedia(id, fmt, img.width, img.height, feat)
        }
        closingIterator(() => codec.close(), out)
      }
  }

  /** Originals plus deterministically PERTURBED re-encodes of every
    * `every`-th doc (media_id = doc_id + idOffset, same container
    * format/dims as the original): the perturbed-copy leg of the
    * image near-dup family (VERDICT r10 #2). The perturbation bumps
    * every 5th payload byte by +8 — visually a faint brightness
    * dither that leaves most dHash gradients intact (measured gate
    * spread: Hamming 0-7 vs original, noise floor 14 for unrelated
    * pairs), i.e. exactly the "same image, slightly different bytes"
    * case a perceptual dedup exists to catch and an exact/byte hash
    * misses. Text is ASCII (<128) so +8 never wraps — the SQL oracle
    * replays the bump without masking. */
  def asMediaTableWithVariants(docs: DataFrame, every: Int = 20,
      idOffset: Long = 10000000L): DataFrame =
    asMediaTable(docs).unionByName(mediaVariants(docs, every, idOffset))

  /** THE variant perturbation: +8 on every 5th byte — one definition
    * for the image AND audio variant legs, because the constant is
    * load-bearing for four SQL oracles (a tweak applied to one
    * modality but not the other would break oracle parity). ASCII
    * input never wraps; the mask keeps arbitrary bytes total. */
  private def perturbBytes(raw: Array[Byte]): Array[Byte] =
    Array.tabulate(raw.length)(i =>
      if (i % 5 == 0) ((raw(i) + 8) & 0xff).toByte else raw(i))

  /** Shared variant builder: every `every`-th doc re-encoded from its
    * perturbed bytes by `encode` (format/dims keyed by the ORIGINAL
    * doc id/length, so the variant is a same-container, same-size
    * near-copy), under media_id = doc_id + idOffset. */
  private def variantsVia(docs: DataFrame, every: Int, idOffset: Long,
      encode: (Long, Array[Byte]) => (String, Array[Byte])): DataFrame = {
    import docs.sparkSession.implicits._
    docs.filter(col("doc_id") % every === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val (fmt, payload) = encode(id, perturbBytes(text.getBytes("UTF-8")))
          (id + idOffset, payload, fmt, payload.length.toLong)
        }
      }
      .toDF("media_id", "payload", "format", "n_bytes")
  }

  /** Just the perturbed-variant leg of [[asMediaTableWithVariants]]
    * (consumers that index originals separately — e.g.
    * q_image_dedup_index's delta side — encode only the variants). */
  def mediaVariants(docs: DataFrame, every: Int = 20,
      idOffset: Long = 10000000L): DataFrame =
    variantsVia(docs, every, idOffset, MediaCodec.encodeDoc)

  case class DecodedRaster(media_id: Long, format: String,
      width: Int, height: Int, rgb: Array[Byte])

  /** Batched decode through to the full top-down row-major RGB raster
    * (same per-partition codec lifecycle as [[decodeFeatures]]) — the
    * input of raster-consuming expressions like the perceptual hash.
    * The raster column never crosses a shuffle in the operators built
    * on this: consumers project it down to scalars (fingerprint,
    * checksum) in the SAME stage. */
  def decodeRaster(media: DataFrame): Dataset[DecodedRaster] = {
    import media.sparkSession.implicits._
    media.select("media_id", "format", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val codec = MediaCodec.open()
        val out = it.map { case (id, fmt, payload) =>
          val img = codec.decode(payload)
          DecodedRaster(id, fmt, img.width, img.height, img.rgb)
        }
        closingIterator(() => codec.close(), out)
      }
  }

  /** Per-image 56-bit perceptual fingerprints
    * ([[graft.functions.ImageHash]] dHash over the decoded raster):
    * decode and hash run in ONE stage — the raster exists only inside
    * it; what comes out is (media_id, format, fp), 3 scalars/image. */
  def imageFingerprints(media: DataFrame): DataFrame =
    decodeRaster(media).toDF()
      .select(col("media_id"), col("format"),
        graft.functions.ImageHash.dHash56(col("rgb"), col("width"),
          col("height")).as("fp"))

  /** Image near-duplicate pairs: perceptual dHash fingerprints fed
    * through the SHARED banded-Hamming machinery
    * ([[graft.dedup.Dedup.bandedHammingPairs]] — same pigeonhole
    * band join as the text SimHash family). Returns (ma, mb,
    * hamming), ma < mb, set-exact within the radius.
    *
    * 100 TB posture: one long per image out of the decode stage (the
    * rasters never shuffle); the band join exchanges (id, long) pairs
    * only. At radius 7 the 56-bit fingerprint yields 7-bit bands —
    * fine at fixture scale, but the band value space (128) is the
    * quadratic-candidate lever at corpus scale: a production deploy
    * widens the grid (16x16 -> 240-bit fingerprint as 4 longs, 30-bit
    * bands at the same radius), identical plan shape. The fingerprint
    * frame is persisted across the self-join's two sides and released
    * via the standard materialize contract. */
  def imageNearDupPairs(media: DataFrame, maxHamming: Int = 7,
      materialize: Boolean = false): DataFrame = {
    val fps = imageFingerprints(media)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = graft.dedup.Dedup.bandedHammingPairs(fps, "media_id", "fp",
        graft.functions.ImageHash.DHashBits, maxHamming)
      .select(col("da").as("ma"), col("db").as("mb"), col("hamming"))
    if (materialize) graft.api.Materialize.releasing(pairs, Seq(fps))
    else pairs
  }

  case class DecodedPixels(media_id: Long, format: String,
      px_sum: Long, px_wsum: Long)

  /** Raster-payload checksums over the FULL decoded image (batched
    * per partition like [[decodeFeatures]]): `px_sum` is the plain
    * unsigned-byte sum of the top-down row-major RGB raster (pins
    * pixel VALUES), `px_wsum` the position-weighted sum
    * Σ (i+1)·rgb[i] (pins pixel ORDER — a bottom-up BMP row flip or a
    * BGR channel swap changes it even though the plain sum is
    * invariant). Together they make the raster walk itself
    * oracle-checkable, not just the header parse (VERDICT r6 #5):
    * the fixture's pixels are the doc's bytes cycled to fill the
    * raster, so the DuckDB oracle reproduces both sums with a
    * closed-form count of how often each text byte lands at which
    * positions. */
  def pixelChecksums(media: DataFrame): Dataset[DecodedPixels] = {
    import media.sparkSession.implicits._
    media.select("media_id", "format", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val codec = MediaCodec.open()
        val out = it.map { case (id, fmt, payload) =>
          val img = codec.decode(payload)
          var s = 0L; var ws = 0L; var i = 0
          while (i < img.rgb.length) {
            val v = (img.rgb(i) & 0xff).toLong
            s += v; ws += (i + 1L) * v
            i += 1
          }
          DecodedPixels(id, fmt, s, ws)
        }
        closingIterator(() => codec.close(), out)
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

  /** Build a real audio table from a document table: each doc encoded
    * as an actual 16-bit PCM mono WAV (rate cycles by id, samples are
    * the doc's bytes recentred to PCM16). */
  def asAudioTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val payload = AudioCodec.encodeDoc(id, text.getBytes("UTF-8"))
          (id, payload, "wav", payload.length.toLong)
        }
      }
      .toDF("media_id", "payload", "format", "n_bytes")
  }

  /** Per-FRAME perceptual fingerprints of a video-like media table —
    * the decode half of [[videoNearDupPairs]]. Frame count derives
    * from the DECODED raster size (as [[sampleFrames]]) and every
    * `stride`-th frame from `firstFrame` on is fingerprinted;
    * `firstFrame > 0` models a TRIMMED clip (the canonical video
    * near-dup case: the same footage minus its head). The fixture's
    * frame f is the still raster scrolled by f pixels (this container
    * ships no video codec — per the multimodal contract the per-frame
    * DECODE is the stubbed step while everything Spark-side is real:
    * batched decode, one-generator frame explode, codegen'd per-frame
    * dHash in the SAME stage, rasters never shuffled; a real
    * container's frame decoder slots into the mapPartitions pass
    * without touching the plan). */
  def videoFrameFingerprints(media: DataFrame, stride: Int = 10,
      firstFrame: Int = 0): DataFrame =
    decodeRaster(media).toDF()
      .withColumn("n_frames",
        ((col("width") * col("height")) % 241 + 8).cast("int"))
      .filter(col("n_frames") > firstFrame)
      .withColumn("frame_idx",
        explode(sequence(lit(firstFrame), col("n_frames") - 1, lit(stride))))
      .select(col("media_id"), col("frame_idx"),
        graft.functions.ImageHash.dHash56(col("rgb"), col("width"),
          col("height"), col("frame_idx")).as("fp"))

  /** Video near-duplicate pairs by FRAME-FINGERPRINT set similarity:
    * two videos pair when the Jaccard overlap of their distinct
    * per-frame fingerprints clears `threshold` — the keyframe-match
    * dedup that catches re-encodes, trims and short clips of the same
    * footage. Candidates come from a self-join on EXACT shared frame
    * fingerprints; verification is exact set arithmetic over the
    * collected fingerprint sets (bounded: sampled frames per video).
    * Output (ma, mb, common, na, nb), ma < mb, integer-exact with the
    * cross-multiplied threshold.
    *
    * 100 TB posture: per-frame fingerprints are 56-bit perceptual
    * hashes — near-uniform over real footage — so per-fingerprint
    * frequency ≈ true matches and the shared-key join IS the
    * scalable path (the same argument as content-defined-chunk dedup
    * joining on chunk hash; unlike text shingles there is no Zipf
    * head). The degenerate case is a shared intro/bumper frame
    * (station logo on every video): `hotFpCap` excludes fingerprints
    * appearing in more than cap videos from CANDIDATE generation
    * (verification still runs over full sets, so surviving pairs keep
    * exact counts); monitoring = a groupBy(fp) count, the
    * [[graft.dedup.Dedup.hammingBandOccupancy]] analogue. */
  def videoNearDupPairs(frames: DataFrame, threshold: Double = 0.5,
      materialize: Boolean = false,
      hotFpCap: Option[Int] = None): DataFrame = {
    val tq = math.round(threshold * 1000)
    val sets = frames.select(col("media_id"), col("fp")).distinct()
      .groupBy(col("media_id"))
      .agg(collect_set(col("fp")).as("fps"),
        count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ex0 = sets.select(col("media_id"), explode(col("fps")).as("fp"))
    val ex = hotFpCap.fold(ex0) { cap =>
      val hot = ex0.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .filter(col("df") > cap).select(col("fp"))
      ex0.join(hot, Seq("fp"), "left_anti")
    }
    val cand = ex.alias("a")
      .join(ex.alias("b"),
        col("a.fp") === col("b.fp") && col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("ma"), col("b.media_id").as("mb"))
      .distinct()
    val pairs = cand
      .join(sets.select(col("media_id").as("ma"), col("fps").as("fa"),
        col("n").as("na")), Seq("ma"))
      .join(sets.select(col("media_id").as("mb"), col("fps").as("fb"),
        col("n").as("nb")), Seq("mb"))
      .select(col("ma"), col("mb"),
        size(array_intersect(col("fa"), col("fb"))).cast("long").as("common"),
        col("na"), col("nb"))
      .filter(col("common") * lit(1000L) >=
        lit(tq) * (col("na") + col("nb") - col("common")))
    if (materialize) graft.api.Materialize.releasing(pairs, Seq(sets))
    else pairs
  }

  /** Originals plus deterministically perturbed re-encodes of every
    * `every`-th doc — the audio twin of [[asMediaTableWithVariants]]
    * (same +8-on-every-5th-byte dither BEFORE recentring to PCM16, so
    * the variant is the same stream with a faint level shift on a
    * sparse comb of samples; same rate/length as the original). */
  def asAudioTableWithVariants(docs: DataFrame, every: Int = 20,
      idOffset: Long = 10000000L): DataFrame =
    asAudioTable(docs).unionByName(
      variantsVia(docs, every, idOffset,
        (id, pert) => ("wav", AudioCodec.encodeDoc(id, pert))))

  case class DecodedPcm(media_id: Long, sample_rate: Int,
      samples: Array[Short])

  /** Batched WAV decode through to the raw PCM16 sample array (the
    * audio analogue of [[decodeRaster]]): consumers reduce the array
    * to scalars (fingerprint, stats) in the SAME stage — samples
    * never cross a shuffle in the operators built on this. */
  def decodePcm(audio: DataFrame): Dataset[DecodedPcm] = {
    import audio.sparkSession.implicits._
    audio.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codec = AudioCodec.open()
        val out = it.map { case (id, payload) =>
          val a = codec.decodeWav(payload)
          DecodedPcm(id, a.sampleRate, a.samples)
        }
        closingIterator(() => codec.close(), out)
      }
  }

  /** Per-clip 56-bit perceptual fingerprints
    * ([[graft.functions.AudioHash]] energy-gradient hash): decode and
    * hash run in one stage; out come (media_id, sample_rate, fp). */
  def audioFingerprints(audio: DataFrame): DataFrame =
    decodePcm(audio).toDF()
      .select(col("media_id"), col("sample_rate"),
        graft.functions.AudioHash.audioHash56(col("samples")).as("fp"))

  /** Audio near-duplicate pairs: perceptual energy-gradient
    * fingerprints through the SHARED banded-Hamming machinery — the
    * audio member of the near-dup family (same contract as
    * [[imageNearDupPairs]]: (ma, mb, hamming), ma < mb, set-exact
    * within the radius; same 100 TB posture — one long per clip out
    * of the decode stage, band join exchanges (id, long) only, wider
    * spectral fingerprints deepen the band space at scale). */
  def audioNearDupPairs(audio: DataFrame, maxHamming: Int = 7,
      materialize: Boolean = false): DataFrame = {
    val fps = audioFingerprints(audio)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = graft.dedup.Dedup.bandedHammingPairs(fps, "media_id", "fp",
        graft.functions.AudioHash.Bits, maxHamming)
      .select(col("da").as("ma"), col("db").as("mb"), col("hamming"))
    if (materialize) graft.api.Materialize.releasing(pairs, Seq(fps))
    else pairs
  }

  case class DecodedAudio(media_id: Long, sample_rate: Int,
      n_samples: Int, duration_ms: Long, peak: Int)

  /** Batched WAV decode over partitions (same shape as
    * [[decodeFeatures]]): real RIFF chunk walk per payload; peak is
    * max |sample| — an exact integer feature. */
  def decodeAudio(audio: DataFrame): Dataset[DecodedAudio] = {
    import audio.sparkSession.implicits._
    audio.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codec = AudioCodec.open()
        val out = it.map { case (id, payload) =>
          val a = codec.decodeWav(payload)
          var peak = 0
          var i = 0
          while (i < a.samples.length) {
            val v = math.abs(a.samples(i).toInt)
            if (v > peak) peak = v
            i += 1
          }
          DecodedAudio(id, a.sampleRate, a.nSamples, a.durationMs, peak)
        }
        closingIterator(() => codec.close(), out)
      }
  }

  /** Per-rate stream stats over decoded audio metadata. */
  def audioStats(audio: DataFrame): DataFrame =
    decodeAudio(audio).toDF()
      .groupBy(col("sample_rate"))
      .agg(count(lit(1)).as("n"),
        sum(col("duration_ms")).as("sum_duration_ms"),
        max(col("n_samples")).as("max_samples"))

  /** Frame sampling for video-like payloads: frame count derived from
    * the DECODED raster size (the analogue of reading a container's
    * stream metadata), every `stride`-th index sampled — the
    * one-row-to-many-frames decode shape (explode keeps it narrow;
    * per-frame decode would batch per partition like the still-image
    * path in [[decodeFeatures]]). */
  def sampleFrames(media: DataFrame, stride: Int = 10): DataFrame =
    decodeFeatures(media).toDF()
      .withColumn("n_frames", (col("width") * col("height")) % 241 + 8)
      .select(col("media_id"), col("format"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))
}
