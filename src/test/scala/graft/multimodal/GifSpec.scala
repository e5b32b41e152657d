package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class GifSpec extends AnyFunSuite {

  private def grayRaster(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(w * h)(i => ((i * 31 + seed * 7) % 256).toByte)

  private def imageioDecodeGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    require(img != null, "imageio failed to decode")
    val w = img.getWidth; val h = img.getHeight
    val px = Array.tabulate(w * h)(i =>
      img.getRGB(i % w, i / w) & 0xff) // gray: any channel
    (w, h, px)
  }

  test("encode/decode round trip, plain and interlaced") {
    Seq(false, true).foreach { il =>
      Seq((8, 8, 1), (17, 9, 2), (61, 43, 3), (64, 50, 4)).foreach {
        case (w, h, s) =>
          val gray = grayRaster(w, h, s)
          val img = GifCodec.decode(GifCodec.encodeGif(w, h, gray, il))
          assert(img.width == w && img.height == h)
          (0 until w * h).foreach { i =>
            val g = gray(i) & 0xff
            assert((img.rgb(3 * i) & 0xff) == g &&
              (img.rgb(3 * i + 1) & 0xff) == g &&
              (img.rgb(3 * i + 2) & 0xff) == g,
              s"pixel $i mismatch (interlaced=$il, ${w}x$h)")
          }
      }
    }
  }

  test("javax.imageio decodes our streams identically (independent decoder)") {
    Seq(false, true).foreach { il =>
      val (w, h) = (37, 23)
      val gray = grayRaster(w, h, 5)
      val bytes = GifCodec.encodeGif(w, h, gray, il)
      val (iw, ih, ref) = imageioDecodeGray(bytes)
      assert(iw == w && ih == h)
      (0 until w * h).foreach { i =>
        assert(ref(i) == (gray(i) & 0xff), s"imageio pixel $i (interlaced=$il)")
      }
    }
  }

  test("our decoder reads javax.imageio-written GIFs (independent encoder)") {
    val (w, h) = (29, 17)
    val gray = grayRaster(w, h, 6)
    // TYPE_BYTE_INDEXED with an explicit 256-gray palette: raster
    // values pass through the GIF writer verbatim (TYPE_BYTE_GRAY
    // would sRGB→linear-convert on setRGB and skew every value)
    val ramp = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    (0 until w * h).foreach { i =>
      img.getRaster.setSample(i % w, i / w, 0, gray(i) & 0xff)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val got = GifCodec.decode(bos.toByteArray)
    assert(got.width == w && got.height == h)
    (0 until w * h).foreach { i =>
      assert((got.rgb(3 * i) & 0xff) == (gray(i) & 0xff),
        s"pixel $i vs imageio-encoded")
    }
  }

  test("LZW survives constant rasters (KwKwK) and width growth past 511 codes") {
    // constant input maximizes run-length strings → the code==next
    // (KwKwK) special case fires early and often
    val flat = Array.fill(64 * 50)(42.toByte)
    val imgF = GifCodec.decode(GifCodec.encodeGif(64, 50, flat, false))
    assert(imgF.rgb.forall(b => (b & 0xff) == 42))
    // a long low-repetition raster drives the table past 512/1024
    // entries → 10- and 11-bit codes on both sides
    val big = Array.tabulate(64 * 50)(i => ((i * 131) ^ (i >> 3)).toByte)
    val imgB = GifCodec.decode(GifCodec.encodeGif(64, 50, big, false))
    (0 until big.length).foreach { i =>
      assert((imgB.rgb(3 * i) & 0xff) == (big(i) & 0xff), s"pixel $i")
    }
    // and the imageio cross-check on the same width-growing stream
    val (_, _, ref) = imageioDecodeGray(GifCodec.encodeGif(64, 50, big, false))
    (0 until big.length).foreach { i =>
      assert(ref(i) == (big(i) & 0xff), s"imageio pixel $i")
    }
  }

  test("corrupt input fails loudly, never a garbage raster") {
    val good = GifCodec.encodeGif(16, 16, grayRaster(16, 16, 7), false)
    intercept[IllegalArgumentException] { // not a GIF
      GifCodec.decode("definitely not a gif".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] { // truncated mid-stream
      GifCodec.decode(java.util.Arrays.copyOfRange(good, 0, good.length / 2))
    }
    // trailer with every image stripped: header + GCT + trailer only
    val headerOnly =
      java.util.Arrays.copyOfRange(good, 0, 13 + 768) ++ Array(0x3b.toByte)
    val e = intercept[IllegalArgumentException] { GifCodec.decode(headerOnly) }
    assert(e.getMessage.contains("before any image"))
    // a flipped byte inside the LZW data must not decode silently:
    // either a bad code, a raster over/underrun, or a changed pixel —
    // find a flip that throws (most do; assert at least this one)
    val lzwStart = 13 + 768 + 19 + 8 + 10 + 1 // header+gct+comment+gce+desc+mcs
    val bad = good.clone()
    bad(lzwStart + 3) = (bad(lzwStart + 3) ^ 0x7f).toByte
    val threw =
      try { GifCodec.decode(bad); false }
      catch { case _: IllegalArgumentException => true }
    // corrupt LZW usually breaks the code stream; when the flip lands
    // on a still-valid code the raster length check must still hold
    if (!threw) {
      val img = GifCodec.decode(bad)
      assert(img.rgb.length == 16 * 16 * 3, "raster length invariant")
    }
  }

  test("the doc fixture: dims arithmetic, interlace by parity, real magic") {
    Seq((2L, "hello gif fixture text"), (3L, "short"), (15L, "y" * 123))
      .foreach { case (id, text) =>
        val (fmt, bytes) = GifCodec.encodeDocGif(id, text.getBytes("UTF-8"))
        assert(fmt == "gif")
        assert(new String(bytes, 0, 6, "US-ASCII") == "GIF89a")
        val (w, h) = MediaCodec.dims(text.length)
        val img = MediaCodec.decode(bytes) // dispatched by magic
        assert(img.width == w && img.height == h)
        val tb = text.getBytes("UTF-8")
        (0 until w * h).foreach { i =>
          assert((img.rgb(3 * i) & 0xff) == (tb(i % tb.length) & 0xff),
            s"doc $id pixel $i")
        }
      }
  }
}
