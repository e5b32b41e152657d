package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("codec golden pixels: 2x2 PPM/BMP/PGM decode to known RGB") {
    val rgb = Array[Byte](
      10, 20, 30,   40, 50, 60,
      70, 80, 90,  100, 110, 120)
    val gray = Array[Byte](1, 2, 3, 4)
    val ppm = MediaCodec.decode(MediaCodec.encodePpm(2, 2, rgb))
    assert(ppm.width == 2 && ppm.height == 2 && ppm.rgb.sameElements(rgb))
    val bmp = MediaCodec.decode(MediaCodec.encodeBmp(2, 2, rgb))
    assert(bmp.width == 2 && bmp.height == 2 && bmp.rgb.sameElements(rgb))
    val pgm = MediaCodec.decode(MediaCodec.encodePgm(2, 2, gray))
    assert(pgm.width == 2 && pgm.height == 2 &&
      pgm.rgb.sameElements(gray.flatMap(g => Seq(g, g, g))))
    // BMP bytes really are the container format: magic + LE dims + pad
    val raw = MediaCodec.encodeBmp(2, 2, rgb)
    assert(raw(0) == 'B'.toByte && raw(1) == 'M'.toByte)
    assert(raw.length == 54 + 8 * 2) // rows of 2*3=6 bytes pad to 8
    // PNM comments are parsed per spec
    val commented = "P6\n# a comment\n2 2\n255\n".getBytes("US-ASCII") ++ rgb
    assert(MediaCodec.decode(commented).rgb.sameElements(rgb))
  }

  test("media table: payloads are real images that decode + re-encode byte-exactly") {
    val media = Multimodal.asMediaTable(docs.limit(60))
    assert(media.schema("payload").dataType.typeName == "binary")
    val rows = media.select("media_id", "format", "payload")
      .as[(Long, String, Array[Byte])].collect()
    assert(rows.map(_._2).distinct.sorted.toSeq == Seq("bmp", "pgm", "ppm"))
    rows.foreach { case (_, fmt, payload) =>
      val img = MediaCodec.decode(payload)
      val back = fmt match {
        case "ppm" => MediaCodec.encodePpm(img.width, img.height, img.rgb)
        case "bmp" => MediaCodec.encodeBmp(img.width, img.height, img.rgb)
        case "pgm" => MediaCodec.encodePgm(img.width, img.height,
          Array.tabulate(img.width * img.height)(i => img.rgb(i * 3)))
      }
      assert(back.sameElements(payload), s"$fmt round-trip diverged")
    }
  }

  test("png codec: round-trip through every filter type, gray leg, golden pixels") {
    // tall enough that rows hit all five filter types (encode cycles
    // y % 5), wide enough that left/upper-left predictors see real
    // neighbors; adversarial content (ramps + constants + noise-ish)
    val w = 7; val h = 11
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + (i * i) % 251) % 256).toByte)
    val png = MediaCodec.encodePng(w, h, rgb)
    // container really is PNG: signature + IHDR first
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte &&
      new String(png, 12, 4, "US-ASCII") == "IHDR")
    val img = MediaCodec.decode(png)
    assert(img.width == w && img.height == h && img.rgb.sameElements(rgb))
    // grayscale color type 0 decodes with replication (hand-built:
    // single None-filtered row so the fixture is independent of our
    // encoder)
    val grayRaw = Array[Byte](0, 5, 9) // filter None, two gray pixels
    val defl = new java.util.zip.Deflater()
    defl.setInput(grayRaw); defl.finish()
    val zb = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](256)
    while (!defl.finished()) zb.write(tmp, 0, defl.deflate(tmp))
    val crc = new java.util.zip.CRC32
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      crc.reset()
      val td = typ.getBytes("US-ASCII") ++ data
      crc.update(td)
      val v = crc.getValue.toInt
      Array[Byte]((data.length >>> 24).toByte, (data.length >>> 16).toByte,
        (data.length >>> 8).toByte, data.length.toByte) ++ td ++
        Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    }
    val grayPng = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n') ++
      chunk("IHDR", Array[Byte](0, 0, 0, 2, 0, 0, 0, 1, 8, 0, 0, 0, 0)) ++
      chunk("IDAT", zb.toByteArray) ++ chunk("IEND", Array.empty[Byte])
    val g = MediaCodec.decode(grayPng)
    assert(g.width == 2 && g.height == 1 &&
      g.rgb.sameElements(Array[Byte](5, 5, 5, 9, 9, 9)))
    // corrupted CRC must throw, not decode garbage
    val broken = png.clone()
    broken(png.length - 5) = (broken(png.length - 5) ^ 0x40).toByte
    intercept[IllegalArgumentException] { MediaCodec.decode(broken) }
    // hostile FDICT stream must THROW, not hang (review r14 #1): a
    // zlib stream deflated with a preset dictionary makes inflate()
    // return 0 with needsDictionary()==true forever unless the
    // decoder treats zero progress as a hard stop
    val fd = new java.util.zip.Deflater()
    fd.setDictionary(Array[Byte](1, 2, 3, 4))
    fd.setInput(Array[Byte](0, 5, 9)); fd.finish()
    val fz = new java.io.ByteArrayOutputStream()
    while (!fd.finished()) fz.write(tmp, 0, fd.deflate(tmp))
    val fdictPng = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n') ++
      chunk("IHDR", Array[Byte](0, 0, 0, 2, 0, 0, 0, 1, 8, 0, 0, 0, 0)) ++
      chunk("IDAT", fz.toByteArray) ++ chunk("IEND", Array.empty[Byte])
    intercept[IllegalArgumentException] { MediaCodec.decode(fdictPng) }
  }

  test("png decodes identically under javax.imageio (independent decoder parity)") {
    // our encoder must emit a CONFORMANT png, and our decoder must
    // agree with an implementation we didn't write — rules out a
    // self-consistent encode/decode bug pair
    val w = 9; val h = 13
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 131 + 17) % 256).toByte)
    val png = MediaCodec.encodePng(w, h, rgb)
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(bi != null, "javax.imageio could not parse our PNG")
    assert(bi.getWidth == w && bi.getHeight == h)
    val ours = MediaCodec.decode(png)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = bi.getRGB(x, y)
      val o = (y * w + x) * 3
      assert(((argb >> 16) & 0xff) == (ours.rgb(o) & 0xff) &&
        ((argb >> 8) & 0xff) == (ours.rgb(o + 1) & 0xff) &&
        (argb & 0xff) == (ours.rgb(o + 2) & 0xff),
        s"pixel ($x,$y) disagrees with ImageIO")
    }
  }

  test("png table: dHash parity with the BMP twin of the same raster") {
    // the perceptual-dedup family must run unchanged over PNG-decoded
    // rasters: same raster in a different container => identical fp
    val pngFp = Multimodal.imageFingerprints(
        Multimodal.asPngTable(docs.limit(40)))
      .select("media_id", "fp").as[(Long, Long)].collect().toMap
    val bmpRows = docs.limit(40).select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq.map { case (id, text) =>
        val b = text.getBytes("UTF-8")
        val (w, h) = MediaCodec.dims(b.length)
        val raster = Array.tabulate(w * h * 3)(i =>
          if (b.isEmpty) 0.toByte else b(i % b.length))
        (id, MediaCodec.encodeBmp(w, h, raster), "bmp", 0L)
      }
    val bmpFp = Multimodal.imageFingerprints(
        bmpRows.toDF("media_id", "payload", "format", "n_bytes"))
      .select("media_id", "fp").as[(Long, Long)].collect().toMap
    assert(pngFp.size == 40 && pngFp == bmpFp,
      "png fps must equal bmp fps of the same rasters")
  }

  test("wav codec: golden samples, chunk walk skips unknown chunks, round-trip") {
    val samples = Array[Short](0, 1000, -1000, 32767, -32768)
    val wav = AudioCodec.encodeWav(16000, samples)
    assert(new String(wav, 0, 4, "US-ASCII") == "RIFF" && wav.length == 44 + 10)
    val back = AudioCodec.decodeWav(wav)
    assert(back.sampleRate == 16000 && back.samples.sameElements(samples))
    assert(back.durationMs == 0L) // 5 samples @16kHz, floor ms
    // decode must WALK chunks: splice a fake 6-byte 'LIST' chunk
    // between fmt and data; a 44-byte-offset parser would misread it
    val head = wav.take(36)
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0, 1, 2, 3, 4, 5, 6)
    val spliced = head ++ listChunk ++ wav.drop(36)
    val walked = AudioCodec.decodeWav(spliced)
    assert(walked.sampleRate == 16000 && walked.samples.sameElements(samples))
    // non-PCM and truncated payloads fail loudly
    intercept[IllegalArgumentException] {
      AudioCodec.decodeWav("RIFFxxxxJUNK".getBytes("US-ASCII"))
    }
  }

  test("audio table: real WAV payloads decode with oracle-matching metadata") {
    val audio = Multimodal.asAudioTable(docs.limit(30))
    val decoded = Multimodal.decodeAudio(audio).collect()
    assert(decoded.length == 30)
    assert(decoded.forall(a => Seq(8000, 16000, 44100).contains(a.sample_rate)))
    assert(decoded.forall(a => a.n_samples >= 500 && a.n_samples < 4500))
    assert(decoded.forall(a =>
      a.duration_ms == a.n_samples.toLong * 1000L / a.sample_rate))
    assert(decoded.forall(a => a.peak >= 0 && a.peak <= 32768))
  }

  test("pixel checksums match a reference walk and are order-sensitive") {
    // reference model: decode each payload independently and fold the
    // raster with the same definition (plain + (i+1)-weighted sums)
    val media = Multimodal.asMediaTable(docs.limit(30))
    val got = Multimodal.pixelChecksums(media)
      .collect().map(d => d.media_id -> ((d.px_sum, d.px_wsum))).toMap
    val expect = media.select("media_id", "payload")
      .as[(Long, Array[Byte])].collect().map { case (id, payload) =>
        val rgb = MediaCodec.decode(payload).rgb
        val s = rgb.map(_ & 0xff).map(_.toLong).sum
        val ws = rgb.zipWithIndex.map { case (b, i) => (i + 1L) * (b & 0xff) }.sum
        id -> ((s, ws))
      }.toMap
    assert(got == expect)
    // the weighted sum pins pixel ORDER: a row-reversed raster (the
    // bottom-up-BMP bug shape) keeps px_sum but changes px_wsum
    val rgb = Array.tabulate(2 * 3 * 3)(i => (i * 7 + 1).toByte)
    val flipped = rgb.grouped(2 * 3).toSeq.reverse.flatten.toArray
    def wsum(a: Array[Byte]) =
      a.zipWithIndex.map { case (b, i) => (i + 1L) * (b & 0xff) }.sum
    assert(rgb.map(_ & 0xff).sum == flipped.map(_ & 0xff).sum)
    assert(wsum(rgb) != wsum(flipped))
  }

  test("batched decode produces fixed-width features with stable dims") {
    val media = Multimodal.asMediaTable(docs.limit(50))
    val decoded = Multimodal.decodeFeatures(media).collect()
    assert(decoded.length == 50)
    assert(decoded.forall(_.features.length == 8))
    assert(decoded.forall(d => d.width >= 8 && d.width <= 64 &&
      d.height >= 8 && d.height <= 50))
    assert(decoded.forall(d => d.features.forall(f => f >= 0f && f <= 1f)))
    // deterministic across runs
    val again = Multimodal.decodeFeatures(media).collect()
    assert(decoded.map(_.media_id).sorted.sameElements(again.map(_.media_id).sorted))
  }

  test("format stats aggregate over decoded metadata") {
    val stats = Multimodal.formatStats(Multimodal.asMediaTable(docs))
      .as[(String, Long, Long, Long, Int)].collect()
    assert(stats.map(_._1).sorted.toSeq == Seq("bmp", "pgm", "ppm"))
    assert(stats.map(_._2).sum == docs.count())
  }
}
