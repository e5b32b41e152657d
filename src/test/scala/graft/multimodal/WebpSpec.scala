package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class WebpSpec extends AnyFunSuite {

  private def lcgBytes(n: Int, seed0: Long): Array[Byte] = {
    var seed = seed0
    Array.fill(n) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) & 0xff).toByte
    }
  }

  private def roundTrip(w: Int, h: Int, gray: Array[Byte], band: Int): Unit = {
    val img = WebpCodec.decode(WebpCodec.encodeWebp(w, h, gray, band))
    assert(img.width == w && img.height == h, s"band $band dims")
    var i = 0
    while (i < w * h) {
      assert(img.rgb(i * 3) == gray(i) && img.rgb(i * 3 + 1) == gray(i) &&
        img.rgb(i * 3 + 2) == gray(i),
        s"band $band pixel $i: want ${gray(i) & 0xff} got ${img.rgb(i * 3) & 0xff}")
      i += 1
    }
  }

  test("round trip: every band over odd dims and full-range rasters") {
    for {
      (w, h) <- Seq((1, 1), (3, 2), (17, 5), (16, 16), (33, 31), (64, 51))
      band <- 0 to 3
    } roundTrip(w, h, lcgBytes(w * h, w * 1000L + h * 10L + band), band)
  }

  test("uniform and two-valued rasters round trip on every band (r17 review #1)") {
    // a solid image tokenizes to {literal, run}: exactly two green
    // symbols, one >= 256 — the case that must take the NORMAL code
    // (the simple code spells symbols in 8 bits)
    for (band <- 0 to 3) {
      roundTrip(8, 8, Array.fill(64)(0.toByte), band)
      roundTrip(8, 8, Array.fill(64)(200.toByte), band)
      roundTrip(9, 5, Array.tabulate(45)(i => if (i % 9 < 4) 10 else 250)
        .map(_.toByte), band)
    }
  }

  test("palette bundling: 1/2/4-bit packing legs all reconstruct") {
    // 2 grays -> widthBits 3 (8 px per green byte), 4 -> 2, 16 -> 1
    for ((distinct, w, h) <- Seq((2, 19, 7), (4, 19, 7), (16, 19, 7), (100, 19, 7))) {
      val gray = lcgBytes(w * h, distinct.toLong)
        .map(b => ((b & 0x7fffffff) % distinct * (255 / distinct)).toByte)
      roundTrip(w, h, gray, band = 0)
    }
  }

  test("predictor band covers all 14 modes") {
    // 64x51 with 16x16 blocks = 16 blocks -> modes 0..13 all appear
    val w = 64
    val h = 51
    assert(((w + 15) / 16) * ((h + 15) / 16) >= 14)
    roundTrip(w, h, lcgBytes(w * h, 7L), band = 3)
  }

  // ---- hand-assembled streams (the spec-pinned details the encoder
  // does not emit: the plane-code table and the color transform) ----

  private final class BitW {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var n = 0
    def put(v: Int, nbits: Int): Unit = {
      var i = 0
      while (i < nbits) {
        cur |= ((v >>> i) & 1) << n
        n += 1
        if (n == 8) { buf += cur.toByte; cur = 0; n = 0 }
        i += 1
      }
    }
    /** One canonical code, MSB-first (the decoder's tree walk). */
    def code(c: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { put((c >>> i) & 1, 1); i -= 1 }
    }
    def toPayload: Array[Byte] = {
      if (n > 0) { buf += cur.toByte; cur = 0; n = 0 }
      val body = Array[Byte]('V', 'P', '8', 'L') ++
        le32(buf.length + 1) ++ Array(0x2f.toByte) ++ buf
      val padded = if (body.length % 2 == 1) body :+ 0.toByte else body
      Array[Byte]('R', 'I', 'F', 'F') ++ le32(4 + padded.length) ++
        Array[Byte]('W', 'E', 'B', 'P') ++ padded
    }
    private def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  }

  private def putSingle(bw: BitW, sym: Int): Unit = {
    bw.put(1, 1) // simple
    bw.put(0, 1) // one symbol
    if (sym < 2) { bw.put(0, 1); bw.put(sym, 1) }
    else { bw.put(1, 1); bw.put(sym, 8) }
  }

  test("plane-code back-reference: distance code (0,1) copies the row above") {
    // 2x2 image A B / A B via Lit(A), Lit(B), backref(len 2, plane
    // code 1 = (0,1) -> distance = xsize). A = (r10,g20,b30),
    // B = (r12,g40,b32). The green code is a NORMAL code over
    // {20, 40, 257} (the length-slot symbol exceeds the simple
    // code's 8-bit spelling), written via the code-length code with
    // 18-runs — so this also pins the cl machinery end to end.
    val bw = new BitW
    bw.put(1, 14); bw.put(1, 14) // w-1, h-1
    bw.put(0, 1); bw.put(0, 3) // alpha hint, version
    bw.put(0, 1) // no transforms
    bw.put(0, 1) // no color cache
    bw.put(0, 1) // no meta prefix image
    // green code: lengths 20->1, 40->2, 257->2 (canonical '0','10','11')
    bw.put(0, 1) // normal code
    bw.put(1, 4) // num_code_lengths = 5
    Seq(0, 2, 0, 1, 2).foreach(v => bw.put(v, 3)) // order 17,18,0,1,2
    bw.put(0, 1) // no max_symbol
    // cl codes (balanced over {1,2,18}): 1->'0', 2->'10', 18->'11'
    def cl1() = bw.code(0, 1)
    def cl2() = bw.code(2, 2)
    def cl18(rep: Int) = { bw.code(3, 2); bw.put(rep - 11, 7) }
    cl18(20); cl1() // zeros 0..19, then length 1 at symbol 20
    cl18(19); cl2() // zeros 21..39, then length 2 at symbol 40
    cl18(138); cl18(78); cl2() // zeros 41..256, then length 2 at 257
    cl18(22) // trailing zeros 258..279
    // red pair {10, 12}, blue pair {30, 32}, alpha single, dist single
    bw.put(1, 1); bw.put(1, 1); bw.put(1, 1); bw.put(10, 8); bw.put(12, 8)
    bw.put(1, 1); bw.put(1, 1); bw.put(1, 1); bw.put(30, 8); bw.put(32, 8)
    putSingle(bw, 255)
    putSingle(bw, 0)
    // Lit A: green '0', red bit0, blue bit0
    bw.code(0, 1); bw.put(0, 1); bw.put(0, 1)
    // Lit B: green '10', red bit1, blue bit1
    bw.code(2, 2); bw.put(1, 1); bw.put(1, 1)
    // backref: green '11' (symbol 257 = length slot 1 -> len 2, no
    // extra), distance code single -> 0 bits -> slot 0 -> value 1 ->
    // plane code (0,1) -> distance = xsize = 2
    bw.code(3, 2)
    val img = WebpCodec.decode(bw.toPayload)
    assert(img.width == 2 && img.height == 2)
    val px = (0 until 4).map(i =>
      (img.rgb(i * 3) & 0xff, img.rgb(i * 3 + 1) & 0xff, img.rgb(i * 3 + 2) & 0xff))
    assert(px == Seq((10, 20, 30), (12, 40, 32), (10, 20, 30), (12, 40, 32)),
      s"got $px")
  }

  test("color transform: channel mapping and signed deltas") {
    // 4x1, COLOR transform block bits 2 (one block), element
    // g2r=32 (BLUE channel of the element pixel), g2b=r2b=0.
    // Literal pixels (r_res=10,g=64) and (r_res=100,g=200):
    //   g=64  (int8 +64): r = 10 + (32*64  >> 5) = 74
    //   g=200 (int8 -56): r = (100 + (32*-56 >> 5)) & 0xff = 44
    val bw = new BitW
    bw.put(3, 14); bw.put(0, 14)
    bw.put(0, 1); bw.put(0, 3)
    bw.put(1, 1); bw.put(1, 2) // transform: COLOR
    bw.put(0, 3) // size_bits - 2 = 0 -> 4x4 blocks -> 1x1 element image
    // element sub-image: cache 0, five codes, all single-symbol
    bw.put(0, 1)
    putSingle(bw, 0) // green (g2b = 0)
    putSingle(bw, 0) // red (r2b = 0)
    putSingle(bw, 32) // blue (g2r = 32)
    putSingle(bw, 0) // alpha
    putSingle(bw, 0) // distance
    // (all codes 0-bit: the single element pixel costs no bits)
    bw.put(0, 1) // end of transforms
    // main image: no cache, no meta
    bw.put(0, 1); bw.put(0, 1)
    // green pair {64, 200}: simple 2-symbol code
    bw.put(1, 1); bw.put(1, 1); bw.put(1, 1); bw.put(64, 8); bw.put(200, 8)
    // red pair {10, 100}
    bw.put(1, 1); bw.put(1, 1); bw.put(1, 1); bw.put(10, 8); bw.put(100, 8)
    putSingle(bw, 0) // blue
    putSingle(bw, 255) // alpha
    putSingle(bw, 0) // distance
    // four literals: (g64,r10) x2 then (g200,r100) x2
    bw.put(0, 1); bw.put(0, 1) // pixel 0: green bit0, red bit0
    bw.put(0, 1); bw.put(0, 1)
    bw.put(1, 1); bw.put(1, 1)
    bw.put(1, 1); bw.put(1, 1)
    val img = WebpCodec.decode(bw.toPayload)
    assert(img.width == 4 && img.height == 1)
    val px = (0 until 4).map(i =>
      (img.rgb(i * 3) & 0xff, img.rgb(i * 3 + 1) & 0xff, img.rgb(i * 3 + 2) & 0xff))
    assert(px(0) == ((74, 64, 0)) && px(1) == ((74, 64, 0)), s"got $px")
    assert(px(2) == ((44, 200, 0)) && px(3) == ((44, 200, 0)), s"got $px")
  }

  test("duplicate transform and bad version fail loudly") {
    val dup = new BitW
    dup.put(0, 14); dup.put(0, 14)
    dup.put(0, 1); dup.put(0, 3)
    dup.put(1, 1); dup.put(2, 2) // subtract green
    dup.put(1, 1); dup.put(2, 2) // ... again
    val e = intercept[IllegalArgumentException] { WebpCodec.decode(dup.toPayload) }
    assert(e.getMessage.contains("duplicate transform"))
    val ver = new BitW
    ver.put(0, 14); ver.put(0, 14)
    ver.put(0, 1); ver.put(5, 3)
    val e2 = intercept[IllegalArgumentException] { WebpCodec.decode(ver.toPayload) }
    assert(e2.getMessage.contains("version"))
  }

  test("container negatives: magic, chunk type, signature, truncation") {
    val good = WebpCodec.encodeWebp(8, 8, lcgBytes(64, 1L), 2)
    intercept[IllegalArgumentException] {
      WebpCodec.decode("JUNKJUNKJUNKJUNKJUNKJUNK".getBytes("US-ASCII"))
    }
    val notWebp = good.clone(); notWebp(8) = 'X'
    intercept[IllegalArgumentException] { WebpCodec.decode(notWebp) }
    val vp8x = good.clone(); vp8x(15) = 'X' // VP8X: lossy/extended
    intercept[IllegalArgumentException] { WebpCodec.decode(vp8x) }
    val badSig = good.clone(); badSig(20) = 0x2e
    intercept[IllegalArgumentException] { WebpCodec.decode(badSig) }
  }

  test("truncated streams throw on every band, never emit a partial raster") {
    for (band <- 0 to 3) {
      val p = WebpCodec.encodeWebp(64, 51, lcgBytes(64 * 51, band + 9L), band)
      val cut = java.util.Arrays.copyOfRange(p, 0, (p.length * 3) / 5)
      // keep the container frame consistent with the shorter body so
      // the CHUNK guard is not what fires — the bit reader must
      intercept[IllegalArgumentException] { WebpCodec.decode(cut) }
    }
  }

  test("independent-codec parity: GIF and WebP decode one raster identically") {
    val text = "parity raster seed text for the shared gray regime".getBytes("UTF-8")
    val (_, gif) = GifCodec.encodeDocGif(4L, text)
    for (id <- 0L to 3L) {
      val (_, webp) = WebpCodec.encodeDocWebp(id, text)
      val a = GifCodec.decode(gif)
      val b = WebpCodec.decode(webp)
      assert(a.width == b.width && a.height == b.height)
      assert(java.util.Arrays.equals(a.rgb, b.rgb),
        s"band $id diverged from the GIF decode of the same raster")
    }
  }
}
