package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class JpegSpec extends AnyFunSuite {

  private def flatBlocks(values: Seq[Int]): Array[Array[Int]] =
    values.map { v =>
      val z = new Array[Int](64)
      z(0) = v - 128
      z
    }.toArray

  private def imageioDecode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "javax.imageio failed to decode the fixture")
    val w = img.getWidth; val h = img.getHeight
    // RAW raster samples, not getRGB: getRGB routes grayscale through
    // a linear-gray -> sRGB ColorSpace conversion (gamma), which
    // would mask/invent decoder differences
    val raster = img.getRaster
    val bands = raster.getNumBands
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val d = (y * w + x) * 3
        if (bands == 1) {
          val g = raster.getSample(x, y, 0).toByte
          rgb(d) = g; rgb(d + 1) = g; rgb(d + 2) = g
        } else {
          rgb(d) = raster.getSample(x, y, 0).toByte
          rgb(d + 1) = raster.getSample(x, y, 1).toByte
          rgb(d + 2) = raster.getSample(x, y, 2).toByte
        }
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }

  private def maxDelta(a: Array[Byte], b: Array[Byte]): Int = {
    assert(a.length == b.length)
    var m = 0; var i = 0
    while (i < a.length) {
      m = math.max(m, math.abs((a(i) & 0xff) - (b(i) & 0xff))); i += 1
    }
    m
  }

  test("flat-block fixture decodes BIT-EXACTLY (the gate regime)") {
    // DC quant step 8 divides the flat-block FDCT out exactly —
    // every decoded pixel equals its source byte
    val values = Seq(0, 1, 37, 128, 200, 255, 64, 99, 250, 5, 180, 42)
    val bytes = JpegCodec.encodeGrayCoeffs(4, 3, flatBlocks(values))
    val img = JpegCodec.decode(bytes)
    assert(img.width == 32 && img.height == 24)
    values.zipWithIndex.foreach { case (v, b) =>
      val bx = b % 4; val by = b / 4
      (0 until 8).foreach { y =>
        (0 until 8).foreach { x =>
          val d = ((by * 8 + y) * 32 + bx * 8 + x) * 3
          assert((img.rgb(d) & 0xff) == v, s"block $b pixel ($x,$y)")
          assert(img.rgb(d + 1) == img.rgb(d) && img.rgb(d + 2) == img.rgb(d))
        }
      }
    }
    // and javax.imageio (independent libjpeg-derived decoder) agrees
    // exactly in this regime too
    val (w, h, ref) = imageioDecode(bytes)
    assert(w == 32 && h == 24 && maxDelta(img.rgb, ref) == 0)
  }

  test("restart markers resync and reset the DC prediction") {
    val values = (0 until 30).map(i => (i * 37 + 11) % 256)
    val plain = JpegCodec.encodeGrayCoeffs(6, 5, flatBlocks(values))
    val rst = JpegCodec.encodeGrayCoeffs(6, 5, flatBlocks(values),
      restartInterval = 4)
    assert(!plain.sameElements(rst), "restart variant must differ on the wire")
    val a = JpegCodec.decode(plain); val b = JpegCodec.decode(rst)
    assert(a.rgb.sameElements(b.rgb), "same raster either way")
    // a decoder that failed to reset the DC prediction at RSTn would
    // shift every post-restart block; imageio confirms the wire form
    val (_, _, ref) = imageioDecode(rst)
    assert(maxDelta(b.rgb, ref) == 0)
  }

  test("AC coefficients: Huffman runs/ZRL/EOB and the IDCT vs javax.imageio") {
    // deterministic non-flat blocks exercising every AC shape: early
    // coefficients, a long zero run (ZRL), a high-index coefficient,
    // negative values, and a full-zero tail (EOB)
    var seed = 7L
    def next(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 40) % bound).toInt
    }
    val blocks = Array.tabulate(12) { _ =>
      val z = new Array[Int](64)
      z(0) = next(160) - 80
      z(1) = next(21) - 10
      z(2) = next(21) - 10
      z(5) = next(9) - 4
      z(20) = next(9) - 4
      z(40 + next(20)) = next(5) - 2 // forces a >16-zero run (ZRL)
      z
    }
    val bytes = JpegCodec.encodeGrayCoeffs(4, 3, blocks)
    val img = JpegCodec.decode(bytes)
    val (w, h, ref) = imageioDecode(bytes)
    assert(w == img.width && h == img.height)
    // IDCT rounding legitimately differs between implementations
    // (ours is double-precision, libjpeg's is fixed-point): bound 1
    val d = maxDelta(img.rgb, ref)
    assert(d <= 1, s"AC decode diverges from imageio by $d")
  }

  test("color 4:2:0 and 4:4:4 JPEGs (ImageIO-written) decode within tolerance") {
    // a SMOOTH gradient image: chroma varies slowly, so replication
    // vs libjpeg's triangle upsampling differ by at most a few codes
    val w = 64; val h = 48
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val r = (x * 255) / (w - 1)
        val g = (y * 255) / (h - 1)
        val b = ((x + y) * 255) / (w + h - 2)
        src.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
    }
    Seq(0.95f, 0.75f).foreach { quality =>
      val out = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality) // >=0.9 writes 4:4:4, below 4:2:0
      writer.write(null, new javax.imageio.IIOImage(src, null, null), p)
      writer.dispose(); ios.close()
      val bytes = out.toByteArray
      val img = JpegCodec.decode(bytes)
      assert(img.width == w && img.height == h)
      val (_, _, ref) = imageioDecode(bytes)
      // same FILE through both decoders: per-pixel differences are
      // IDCT rounding (±1) plus the chroma-upsampling ALGORITHM
      // (libjpeg interpolates a triangle filter, this decoder
      // replicates — both spec-conformant; T.81 leaves upsampling
      // implementation-defined). Pin both a tight mean and a small
      // per-pixel bound: a channel swap, block misplacement or wrong
      // level shift moves pixels by tens of codes, not single ones.
      val deltas = img.rgb.indices
        .map(i => math.abs((img.rgb(i) & 0xff) - (ref(i) & 0xff)))
      val d = deltas.max
      val mean = deltas.sum / deltas.length.toDouble
      val fracBig = deltas.count(_ > 3) / deltas.length.toDouble
      assert(d <= 8, s"color decode at q=$quality diverges by $d")
      assert(mean <= 1.5,
        f"color decode at q=$quality mean |delta| $mean%.3f too high")
      assert(fracBig <= 0.05,
        f"color decode at q=$quality has ${fracBig * 100}%.1f%% pixels off by >3")
    }
  }

  test("progressive flat fixture: three scans fold to the EXACT baseline raster (r15)") {
    val values = Seq(0, 1, 37, 128, 200, 255, 64, 99, 250, 5, 180, 42,
      7, 130, 251, 128, 127, 126)
    val base = JpegCodec.decode(
      JpegCodec.encodeGrayCoeffs(6, 3, flatBlocks(values)))
    val progBytes = JpegCodec.encodeGrayFlatProgressive(6, 3,
      values.map(_ - 128).toArray)
    val prog = JpegCodec.decode(progBytes)
    assert(prog.width == base.width && prog.height == base.height)
    assert(prog.rgb.sameElements(base.rgb),
      "DC first + refinement + EOBRUN must reproduce the baseline raster")
    // and the independent decoder agrees the progressive wire form is real
    val (w, h, ref) = imageioDecode(progBytes)
    assert(w == prog.width && h == prog.height && maxDelta(prog.rgb, ref) == 0)
  }

  test("ImageIO-written progressive gray (real AC refinement scans) decodes within ±1") {
    // the default progressive scan script uses successive
    // approximation (Ah/Al chains) — the AC-refinement correction walk
    // is load-bearing here, against an independent encoder AND decoder
    val w = 64; val h = 48
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var seed = 99L
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        seed = seed * 6364136223846793005L + 1442695040888963407L
        val v = ((x * 3 + y * 2) % 200 + ((seed >>> 40) % 56)).toInt
        src.getRaster.setSample(x, y, 0, v)
      }
    }
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    val prm = writer.getDefaultWriteParam
    prm.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    writer.write(null, new javax.imageio.IIOImage(src, null, null), prm)
    writer.dispose(); ios.close()
    val bytes = out.toByteArray
    // confirm the file really is SOF2
    val isProg = bytes.sliding(2).exists(s =>
      (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xc2)
    assert(isProg, "ImageIO did not write a progressive file")
    val img = JpegCodec.decode(bytes)
    val (w2, h2, ref) = imageioDecode(bytes)
    assert(w2 == img.width && h2 == img.height)
    val d = maxDelta(img.rgb, ref)
    assert(d <= 1, s"progressive gray decode diverges from imageio by $d")
  }

  test("ImageIO-written progressive color decodes within the color tolerance") {
    val w = 64; val h = 48
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val r = (x * 255) / (w - 1)
        val g = (y * 255) / (h - 1)
        val bl = ((x + y) * 255) / (w + h - 2)
        src.setRGB(x, y, (r << 16) | (g << 8) | bl)
      }
    }
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    val prm = writer.getDefaultWriteParam
    prm.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    prm.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    prm.setCompressionQuality(0.8f)
    writer.write(null, new javax.imageio.IIOImage(src, null, null), prm)
    writer.dispose(); ios.close()
    val bytes = out.toByteArray
    val img = JpegCodec.decode(bytes)
    val (_, _, ref) = imageioDecode(bytes)
    val deltas = img.rgb.indices
      .map(i => math.abs((img.rgb(i) & 0xff) - (ref(i) & 0xff)))
    assert(deltas.max <= 8 && deltas.sum.toDouble / deltas.length <= 1.5,
      s"progressive color max ${deltas.max} mean ${deltas.sum.toDouble / deltas.length}")
  }

  test("corrupt input fails loudly, never a garbage raster") {
    val good = JpegCodec.encodeGrayCoeffs(2, 2, flatBlocks(Seq(10, 20, 30, 40)))
    intercept[IllegalArgumentException] { // truncated mid-entropy
      JpegCodec.decode(java.util.Arrays.copyOfRange(good, 0, good.length - 6))
    }
    intercept[IllegalArgumentException] { // not a JPEG
      JpegCodec.decode("not a jpeg at all".getBytes("US-ASCII"))
    }
    // a DHT whose declared length passes the OUTER segment check but
    // truncates the fixed 17-byte table header (review r15 #2) — must
    // raise the module contract, not ArrayIndexOutOfBounds
    val truncDht = Array(0xff, 0xd8, 0xff, 0xc4, 0x00, 0x04, 0x00, 0x00)
      .map(_.toByte)
    val e2 = intercept[IllegalArgumentException] { JpegCodec.decode(truncDht) }
    assert(e2.getMessage.contains("truncated DHT"))
    // a header-only file (every scan stripped) must fail loudly, not
    // return an all-gray raster (review r15 #1)
    val sosStart = {
      var i = 2
      while (!((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda)) i += 1
      i
    }
    val headerOnly = java.util.Arrays.copyOfRange(good, 0, sosStart) ++
      Array(0xff, 0xd9).map(_.toByte)
    val eNoScan = intercept[IllegalArgumentException] {
      JpegCodec.decode(headerOnly)
    }
    assert(eNoScan.getMessage.contains("before any SOS"))
    def sofAt(bytes: Array[Byte]): Int = {
      var i = 2
      while (!((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc0)) i += 1
      i
    }
    val lossless = good.clone() // flip SOF0 -> SOF3 (lossless): unsupported mode
    lossless(sofAt(lossless) + 1) = 0xc3.toByte
    val e = intercept[IllegalArgumentException] { JpegCodec.decode(lossless) }
    assert(e.getMessage.contains("baseline/progressive only"))
    // SOF2 with a BASELINE full-band scan header is a malformed
    // progressive stream (DC scans are DC-only) — loud, not garbage
    val badProg = good.clone()
    badProg(sofAt(badProg) + 1) = 0xc2.toByte
    val e3 = intercept[IllegalArgumentException] { JpegCodec.decode(badProg) }
    assert(e3.getMessage.contains("DC-only"))
    // SOS Huffman table ids are 4-bit wire fields but only 4 slots
    // exist — a hostile td/ta > 3 must raise the module contract, not
    // ArrayIndexOutOfBounds (ADVICE r15 #1). SOS comp spec layout:
    // FFDA len ns [cid tdta]... → tdta byte is sosStart+6 for ns=1.
    val badTable = good.clone()
    badTable(sosStart + 6) = 0x44.toByte // td=4, ta=4
    val e4 = intercept[IllegalArgumentException] { JpegCodec.decode(badTable) }
    assert(e4.getMessage.contains("bad SOS Huffman table id"))
  }

  test("the media table carries real JPEG bytes and round numbers") {
    // encodeDocJpeg wires dims from text length and the restart
    // variant from id parity; both decoders agree on every fixture
    Seq((2L, "hello world this is a jpeg fixture"), (3L, "short"),
        (14L, "x" * 100)).foreach { case (id, text) =>
      val (fmt, bytes) = JpegCodec.encodeDocJpeg(id, text.getBytes("UTF-8"))
      assert(fmt == "jpeg")
      val (wb, hb) = JpegCodec.blockDims(text.length)
      val img = JpegCodec.decode(bytes)
      assert(img.width == wb * 8 && img.height == hb * 8)
      val (w2, h2, ref) = imageioDecode(bytes)
      assert(w2 == img.width && h2 == img.height && maxDelta(img.rgb, ref) == 0)
    }
  }
}
