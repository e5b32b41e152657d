package graft.multimodal

/** Pure-JVM baseline JPEG codec (r15, VERDICT r14 missing #5 —
  * "decide JPEG": decided FOR a real decoder, the PNG discipline).
  * Crawl images are overwhelmingly JPEG; this module gives the
  * multimodal family a genuine ITU T.81 baseline path with zero new
  * dependencies:
  *
  *  - DECODER ([[decode]]): full baseline-sequential (SOF0) decode —
  *    marker walk, DQT/DHT/DRI/SOS parsing, canonical Huffman
  *    decoding (the spec's mincode/maxcode/valptr algorithm), 0xFF00
  *    byte-unstuffing, restart-marker resync with DC-prediction
  *    reset, dequantization, dezigzag, separable double-precision
  *    IDCT with round/clamp/level-shift, replication upsampling for
  *    subsampled chroma (4:4:4 / 4:2:2 / 4:2:0 — any factors where
  *    the max divides), and BT.601 YCbCr→RGB. 1- and 3-component
  *    frames; progressive (SOF2), arithmetic coding, 12-bit and
  *    hierarchical modes throw loudly. All header ints are
  *    attacker-controlled: size checks in long arithmetic (the
  *    BMP/PNG discipline).
  *
  *  - ENCODER ([[encodeGrayCoeffs]]): a grayscale baseline writer at
  *    the QUANTIZED-COEFFICIENT level (DC diff categories, AC
  *    run-length with ZRL/EOB, Annex-K standard Huffman tables, byte
  *    stuffing, optional restart intervals). Writing coefficients —
  *    not pixels — is what makes the GATE fixture exact: a flat 8×8
  *    block has only a DC coefficient, and with the DC quant step
  *    fixed at 8 the decoded block value is bit-exact
  *    `clamp(dc + 128)` (FDCT of a flat level-shifted block v−128 is
  *    F00 = 8·(v−128); dequant·IDCT divides the 8 back out with no
  *    fractional part) — so q_jpeg_decode's DuckDB oracle replays
  *    the decoded raster in closed form even though JPEG is lossy in
  *    general. The AC/IDCT paths are NOT exercised by the gate
  *    fixture; they are pinned by JpegSpec against javax.imageio
  *    (an independent libjpeg-derived decoder) within ±1/±2
  *    tolerance on crafted AC fixtures and ImageIO-written color
  *    files (IDCT and upsampling rounding legitimately differ by
  *    implementation; the spec documents the bound).
  */
object JpegCodec {

  // ---- public-spec constant tables ------------------------------------

  /** Zigzag index → natural (row-major) index. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K luminance DC table: code-length histogram + symbols. */
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array.tabulate(12)(identity)

  /** Annex K luminance AC table. */
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** The fixture quant table: every step 8, so the DC path divides
    * out exactly (see the object scaladoc). */
  private[multimodal] val FlatQuant: Array[Int] = Array.fill(64)(8)

  // ---- encoder ---------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var k = len - 1
      while (k >= 0) {
        acc = (acc << 1) | ((code >>> k) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        k -= 1
      }
    }
    /** Pad to a byte boundary with 1-bits (the spec's fill). */
    def align(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
  }

  /** Canonical code assignment from a (bits, vals) pair:
    * symbol → (code, length). */
  private def canonicalCodes(bits: Array[Int], vals: Array[Int])
      : Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        out += vals(k) -> ((code, l))
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    out.result()
  }

  private def category(v: Int): Int = {
    var s = 0
    var a = math.abs(v)
    while (a != 0) { s += 1; a >>= 1 }
    s
  }

  /** Encode a grayscale baseline JPEG from QUANTIZED coefficient
    * blocks (zigzag order, row-major block layout, wb×hb blocks of
    * 8×8 → a (8·wb)×(8·hb) image), with the given quant table
    * (natural order) and optional restart interval (MCUs). */
  def encodeGrayCoeffs(wb: Int, hb: Int, blocks: Array[Array[Int]],
      quant: Array[Int] = FlatQuant, restartInterval: Int = 0): Array[Byte] = {
    require(blocks.length == wb * hb, s"${blocks.length} blocks != $wb x $hb")
    require(quant.length == 64)
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xff)
    def marker(m: Int): Unit = { b(0xff); b(m) }
    def be16(v: Int): Unit = { b(v >>> 8); b(v) }
    marker(0xd8) // SOI
    marker(0xdb); be16(2 + 1 + 64); b(0x00) // DQT, 8-bit table 0
    (0 until 64).foreach(k => b(quant(Zigzag(k))))
    marker(0xc0); be16(2 + 6 + 3) // SOF0, 1 component
    b(8); be16(8 * hb); be16(8 * wb); b(1)
    b(1); b(0x11); b(0) // comp 1, h=v=1, quant table 0
    def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); be16(2 + 1 + 16 + vals.length); b(cls << 4)
      bits.foreach(b); vals.foreach(b)
    }
    dht(0, DcBits, DcVals)
    dht(1, AcBits, AcVals)
    if (restartInterval > 0) { marker(0xdd); be16(4); be16(restartInterval) }
    marker(0xda); be16(2 + 1 + 2 + 3) // SOS
    b(1); b(1); b(0x00); b(0); b(63); b(0)
    val dcCodes = canonicalCodes(DcBits, DcVals)
    val acCodes = canonicalCodes(AcBits, AcVals)
    val bw = new BitWriter(out)
    var pred = 0
    var rst = 0
    var i = 0
    while (i < blocks.length) {
      if (restartInterval > 0 && i > 0 && i % restartInterval == 0) {
        bw.align()
        marker(0xd0 + rst % 8)
        rst += 1
        pred = 0
      }
      val z = blocks(i)
      require(z.length == 64)
      // DC: category + offset bits of the diff
      val diff = z(0) - pred
      pred = z(0)
      val s = category(diff)
      val (dc, dl) = dcCodes(s)
      bw.put(dc, dl)
      if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      // AC: run-length over the zigzagged tail
      var k = 1
      var run = 0
      while (k < 64) {
        if (z(k) == 0) run += 1
        else {
          while (run >= 16) {
            val (zc, zl) = acCodes(0xf0); bw.put(zc, zl); run -= 16 // ZRL
          }
          val cs = category(z(k))
          val (ac, al) = acCodes((run << 4) | cs)
          bw.put(ac, al)
          bw.put(if (z(k) < 0) z(k) + (1 << cs) - 1 else z(k), cs)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (ec, el) = acCodes(0x00); bw.put(ec, el) } // EOB
      i += 1
    }
    bw.align()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Encode a grayscale PROGRESSIVE (SOF2) JPEG of flat blocks —
    * three scans: DC first at Al=1 (point-transformed diffs), DC
    * refinement (one raw bit per block), and an AC band scan that is
    * pure end-of-band runs (flat blocks have no AC), encoded with
    * real EOBn codes — so a decoder must buffer coefficients across
    * scans, apply the successive-approximation DC fold, and decode
    * EOBRUN to recover the SAME raster the baseline encoding of these
    * blocks yields (bit-exact: the DC-quant-8 regime). */
  def encodeGrayFlatProgressive(wb: Int, hb: Int, dcs: Array[Int],
      quant: Array[Int] = FlatQuant): Array[Byte] = {
    require(dcs.length == wb * hb, s"${dcs.length} DCs != $wb x $hb")
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xff)
    def marker(m: Int): Unit = { b(0xff); b(m) }
    def be16(v: Int): Unit = { b(v >>> 8); b(v) }
    marker(0xd8)
    marker(0xdb); be16(2 + 1 + 64); b(0x00)
    (0 until 64).foreach(k => b(quant(Zigzag(k))))
    marker(0xc2); be16(2 + 6 + 3) // SOF2 progressive
    b(8); be16(8 * hb); be16(8 * wb); b(1)
    b(1); b(0x11); b(0)
    def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); be16(2 + 1 + 16 + vals.length); b(cls << 4)
      bits.foreach(b); vals.foreach(b)
    }
    dht(0, DcBits, DcVals)
    val dcCodes = canonicalCodes(DcBits, DcVals)
    // the Annex-K AC table has NO EOBn symbols (baseline never uses
    // them) — the band scan needs its own table: the 15 EOBn symbols
    // (run r, size 0) at code length 4, redefined as AC table 0
    // before the scan (a DHT between scans legally replaces tables)
    val eobBits = Array(0, 0, 0, 15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val eobVals = Array.tabulate(15)(r => r << 4)
    val acCodes = canonicalCodes(eobBits, eobVals)
    def sos(ss: Int, se: Int, ah: Int, al: Int): Unit = {
      marker(0xda); be16(2 + 1 + 2 + 3)
      b(1); b(1); b(0x00); b(ss); b(se); b((ah << 4) | al)
    }
    // scan 1: DC first, Al=1 — diffs of the point-transformed values
    sos(0, 0, 0, 1)
    locally {
      val bw = new BitWriter(out)
      var pred = 0
      dcs.foreach { dc =>
        val v = dc >> 1 // arithmetic shift = the T.81 point transform
        val diff = v - pred
        pred = v
        val s = category(diff)
        val (c, l) = dcCodes(s)
        bw.put(c, l)
        if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      }
      bw.align()
    }
    // scan 2: DC refinement, Ah=1 Al=0 — the low bit, raw
    sos(0, 0, 1, 0)
    locally {
      val bw = new BitWriter(out)
      dcs.foreach(dc => bw.put(dc & 1, 1))
      bw.align()
    }
    // scan 3: AC band 1..63 — all zero, emitted as greedy EOBn runs
    dht(1, eobBits, eobVals)
    sos(1, 63, 0, 0)
    locally {
      val bw = new BitWriter(out)
      var remaining = dcs.length
      while (remaining > 0) {
        var r = 0
        while ((1 << (r + 1)) <= remaining && r < 14) r += 1
        val run = math.min(remaining, (1 << (r + 1)) - 1)
        val (c, l) = acCodes(r << 4) // EOBn symbol: size 0, run r
        bw.put(c, l)
        if (r > 0) bw.put(run - (1 << r), r)
        remaining -= run
      }
      bw.align()
    }
    marker(0xd9)
    out.toByteArray
  }

  /** The gate fixture: flat 8×8 blocks whose values are the doc's
    * text bytes cycled ([[MediaCodec.encodeDoc]] spirit) — block
    * (row-major index b) has every pixel equal to byte b mod len, so
    * the decoded raster has a closed form the oracle replays. Dims:
    * 1..7 × 1..6 blocks from the text length (non-square, every
    * count reachable). Odd doc ids add a restart interval of 3 so
    * the resync/DC-reset path is load-bearing in the gate. */
  def encodeDocJpeg(docId: Long, text: Array[Byte]): (String, Array[Byte]) = {
    val (wb, hb) = blockDims(text.length)
    val blocks = Array.tabulate(wb * hb) { bIdx =>
      val v = if (text.isEmpty) 0 else text(bIdx % text.length) & 0xff
      val z = new Array[Int](64)
      z(0) = v - 128 // DC quant step 8 divides out: decodes to exactly v
      z
    }
    ("jpeg", encodeGrayCoeffs(wb, hb, blocks,
      restartInterval = if (docId % 2 == 1) 3 else 0))
  }

  /** Fixture block dims from payload length (oracle-replicable). */
  def blockDims(textLen: Int): (Int, Int) =
    (1 + textLen % 7, 1 + (textLen * 31) % 6)

  /** The PROGRESSIVE gate fixture (r15): the SAME flat blocks as
    * [[encodeDocJpeg]] in the three-scan SOF2 wire form, so the
    * q_jpeg_decode closed-form oracle carries over verbatim — only a
    * decoder that buffers coefficients across scans, folds the DC
    * successive approximation, and decodes EOBRUN reproduces it. */
  def encodeDocJpegProgressive(docId: Long, text: Array[Byte])
      : (String, Array[Byte]) = {
    val (wb, hb) = blockDims(text.length)
    val dcs = Array.tabulate(wb * hb) { b =>
      (if (text.isEmpty) 0 else text(b % text.length) & 0xff) - 128
    }
    ("jpeg_prog", encodeGrayFlatProgressive(wb, hb, dcs))
  }

  // ---- decoder ---------------------------------------------------------

  private final class HuffTable(bits: Array[Int], val vals: Array[Int]) {
    // the T.81 F.2.2.3 decode tables
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = code - 1
        if (bits(l - 1) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
  }

  private final class BitReader(p: Array[Byte], private var pos: Int) {
    private var acc = 0
    private var n = 0

    /** Byte-aligned position of the next unread byte. */
    def bytePos: Int = pos

    def nextBit(): Int = {
      if (n == 0) {
        require(pos < p.length, "truncated JPEG entropy stream")
        var byte = p(pos) & 0xff
        pos += 1
        if (byte == 0xff) {
          require(pos < p.length, "truncated JPEG entropy stream")
          val m = p(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed 0xFF data byte
          else if (m >= 0xd0 && m <= 0xd7)
            throw new IllegalArgumentException(
              "unexpected JPEG restart marker inside an entropy segment")
          else throw new IllegalArgumentException(
            f"unexpected marker 0xff$m%02x inside JPEG entropy data")
        }
        acc = byte; n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }

    def bits(count: Int): Int = {
      var v = 0
      var i = 0
      while (i < count) { v = (v << 1) | nextBit(); i += 1 }
      v
    }

    def decodeSym(t: HuffTable): Int = {
      var code = nextBit()
      var l = 1
      while (!(t.maxCode(l) >= 0 && code <= t.maxCode(l))) {
        require(l < 16, "invalid JPEG Huffman code")
        code = (code << 1) | nextBit()
        l += 1
      }
      t.vals(t.valPtr(l) + code - t.minCode(l))
    }

    /** Consume a restart marker at a byte boundary. */
    def restart(expect: Int): Unit = {
      n = 0 // discard fill bits
      require(pos + 1 < p.length, "truncated JPEG at restart marker")
      require((p(pos) & 0xff) == 0xff && (p(pos + 1) & 0xff) == (0xd0 + expect),
        f"expected RST$expect%d marker at offset $pos")
      pos += 2
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  // separable IDCT basis: Cos(u)(x) = C(u)/2 * cos((2x+1)uπ/16)
  private val CosTable: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** In-place 8×8 IDCT of dequantized coefficients (natural order)
    * into spatial values (no level shift/clamp here). */
  private def idct(block: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows: over u
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += CosTable(u)(x) * block(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    val out = new Array[Double](64)
    var x = 0
    while (x < 8) { // columns: over v
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += CosTable(v)(yy) * tmp(v * 8 + x); v += 1 }
        out(yy * 8 + x) = s
        yy += 1
      }
      x += 1
    }
    out
  }

  private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var td = 0; var ta = 0
  }

  private def ceilDiv(a: Int, b: Int): Int = (a + b - 1) / b

  /** Decode a baseline (SOF0) or PROGRESSIVE (SOF2, r15) JPEG to
    * dims + top-down row-major RGB (grayscale replicated) — the
    * [[MediaCodec.Image]] contract. Progressive decode keeps one
    * QUANTIZED coefficient buffer per block for the whole frame and
    * folds each scan into it: DC first scans (point transform << Al,
    * diff-predicted), DC refinement (one raw bit per block OR-ed at
    * Al), AC first scans (per-component, run-length with shared
    * EOBRUN end-of-band runs), and AC successive-approximation
    * refinement (the T.81 G.1.2.3 correction-bit walk). IDCT runs
    * once at EOI over the assembled coefficients. */
  def decode(p: Array[Byte]): MediaCodec.Image = {
    require(p.length >= 4 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8,
      "bad JPEG SOI")
    val quant = new Array[Array[Int]](4)
    val huffDc = new Array[HuffTable](4)
    val huffAc = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var w = 0; var hImg = 0
    var progressive = false
    var restartInterval = 0
    var maxH = 1; var maxV = 1
    var mcusX = 0; var mcusY = 0
    // per comp: padded block-grid width (interleaved layout), the
    // comp's REAL block counts (non-interleaved scan order), and the
    // per-block QUANTIZED zigzag coefficient buffers
    var gridW: Array[Int] = null
    var compBW: Array[Int] = null
    var compBH: Array[Int] = null
    var coef: Array[Array[Array[Int]]] = null
    var pos = 2
    def be16(o: Int): Int = ((p(o) & 0xff) << 8) | (p(o + 1) & 0xff)

    /** One entropy-coded scan: decodes into the coefficient buffers,
      * returns the byte offset just past its entropy data. */
    def decodeScan(scanComps: Array[Int], ss: Int, se: Int, ah: Int,
        al: Int, startPos: Int): Int = {
      val br = new BitReader(p, startPos)
      val preds = new Array[Int](comps.length)
      var eobrun = 0
      val interleaved = scanComps.length > 1

      def decodeBlock(ci: Int, blk: Array[Int]): Unit = {
        val c = comps(ci)
        if (!progressive) {
          val dcT = huffDc(c.td); val acT = huffAc(c.ta)
          require(dcT != null && acT != null, "missing Huffman table")
          val s = br.decodeSym(dcT)
          require(s <= 11, s"bad DC category $s")
          preds(ci) += extend(br.bits(s), s)
          blk(0) = preds(ci)
          var k = 1
          var eob = false
          while (k < 64 && !eob) {
            val rs = br.decodeSym(acT)
            val r = rs >> 4; val sz = rs & 0x0f
            if (sz == 0) {
              if (r == 15) k += 16 // ZRL
              else eob = true
            } else {
              k += r
              require(k < 64, "JPEG AC run past block end")
              blk(k) = extend(br.bits(sz), sz)
              k += 1
            }
          }
        } else if (ss == 0 && ah == 0) { // DC first
          val dcT = huffDc(c.td)
          require(dcT != null, "missing Huffman table")
          val s = br.decodeSym(dcT)
          require(s <= 11, s"bad DC category $s")
          preds(ci) += extend(br.bits(s), s)
          blk(0) = preds(ci) << al
        } else if (ss == 0) { // DC refinement: one raw bit at Al
          if (br.nextBit() == 1) blk(0) |= 1 << al
        } else if (ah == 0) { // AC first scan
          val acT = huffAc(c.ta)
          require(acT != null, "missing Huffman table")
          if (eobrun > 0) eobrun -= 1
          else {
            var k = ss
            var stop = false
            while (k <= se && !stop) {
              val rs = br.decodeSym(acT)
              val r = rs >> 4; val sz = rs & 0x0f
              if (sz == 0) {
                if (r == 15) k += 16
                else {
                  eobrun = (1 << r) - 1 + (if (r > 0) br.bits(r) else 0)
                  stop = true
                }
              } else {
                k += r
                require(k <= se, "JPEG AC run past band end")
                blk(k) = extend(br.bits(sz), sz) << al
                k += 1
              }
            }
          }
        } else { // AC refinement — the T.81 G.1.2.3 correction walk
          val acT = huffAc(c.ta)
          require(acT != null, "missing Huffman table")
          val p1 = 1 << al; val m1 = -1 << al
          var k = ss
          if (eobrun == 0) {
            var stop = false
            while (k <= se && !stop) {
              val rs = br.decodeSym(acT)
              var r = rs >> 4; val sz = rs & 0x0f
              var newval = 0
              if (sz == 0) {
                if (r < 15) {
                  // NOTE the off-by-one trap: unlike the first-scan
                  // case, eobrun here keeps the FULL (1<<r)+bits value
                  // — the current block still consumes correction bits
                  // for its remaining nonzero history in the tail walk
                  // below, and only THEN does the run decrement
                  eobrun = (1 << r) + (if (r > 0) br.bits(r) else 0)
                  stop = true
                } // r == 15: ZRL — pass 16 zero-history coefficients
              } else {
                require(sz == 1, s"bad AC refinement size $sz")
                newval = if (br.nextBit() == 1) p1 else m1
              }
              if (!stop) {
                // advance over r zero-history positions; every nonzero
                // passed takes a correction bit
                var placed = false
                while (k <= se && !placed) {
                  if (blk(k) != 0) {
                    if (br.nextBit() == 1 && (blk(k) & p1) == 0)
                      blk(k) += (if (blk(k) >= 0) p1 else m1)
                  } else {
                    if (r == 0) {
                      if (newval != 0) blk(k) = newval
                      placed = true
                    } else r -= 1
                  }
                  k += 1
                }
              }
            }
          }
          if (eobrun > 0) {
            // end-of-band: the rest of THIS block still takes
            // correction bits on its nonzero history
            while (k <= se) {
              if (blk(k) != 0) {
                if (br.nextBit() == 1 && (blk(k) & p1) == 0)
                  blk(k) += (if (blk(k) >= 0) p1 else m1)
              }
              k += 1
            }
            eobrun -= 1
          }
        }
      }

      val nUnits =
        if (interleaved) mcusX * mcusY
        else compBW(scanComps(0)) * compBH(scanComps(0))
      var rst = 0
      var u = 0
      while (u < nUnits) {
        if (restartInterval > 0 && u > 0 && u % restartInterval == 0) {
          br.restart(rst % 8)
          rst += 1
          java.util.Arrays.fill(preds, 0)
          eobrun = 0
        }
        if (interleaved) {
          val my = u / mcusX; val mx = u % mcusX
          scanComps.foreach { ci =>
            val c = comps(ci)
            var bv = 0
            while (bv < c.v) {
              var bu = 0
              while (bu < c.h) {
                decodeBlock(ci,
                  coef(ci)((my * c.v + bv) * gridW(ci) + mx * c.h + bu))
                bu += 1
              }
              bv += 1
            }
          }
        } else {
          val ci = scanComps(0)
          val by = u / compBW(ci); val bx = u % compBW(ci)
          decodeBlock(ci, coef(ci)(by * gridW(ci) + bx))
        }
        u += 1
      }
      br.bytePos
    }

    var sawEoi = false
    var sawScan = false
    while (!sawEoi) {
      require(pos + 2 <= p.length, "truncated JPEG marker stream")
      require((p(pos) & 0xff) == 0xff, f"expected marker at offset $pos")
      // legal 0xFF fill bytes before a marker (T.81 B.1.1.2)
      while (pos + 2 <= p.length && (p(pos + 1) & 0xff) == 0xff) pos += 1
      require(pos + 2 <= p.length, "truncated JPEG marker stream")
      val m = p(pos + 1) & 0xff
      if (m == 0xd9) { sawEoi = true; pos += 2 }
      else if ((m >= 0xd0 && m <= 0xd7) || m == 0x01) {
        pos += 2 // standalone RSTn/TEM outside a scan: skip, no length
      }
      else {
      require(pos + 4 <= p.length, "truncated JPEG marker stream")
      val len = be16(pos + 2)
      require(len >= 2 && pos + 2L + len <= p.length, "truncated JPEG segment")
      val seg = pos + 4
      var nextPos = pos + 2 + len
      m match {
        case 0xdb => // DQT: one or more tables
          var o = seg
          while (o < pos + 2 + len) {
            val pq = (p(o) & 0xff) >> 4; val tq = p(o) & 0x0f
            require(pq == 0, "12-bit JPEG quant tables not supported")
            require(tq < 4, s"bad quant table id $tq")
            require(o + 65 <= pos + 2 + len, "truncated DQT")
            val t = new Array[Int](64)
            (0 until 64).foreach(k => t(Zigzag(k)) = p(o + 1 + k) & 0xff)
            quant(tq) = t
            o += 65
          }
        case 0xc4 => // DHT: one or more tables
          var o = seg
          while (o < pos + 2 + len) {
            // every fixed-size field bounds-checked against the
            // DECLARED segment length (review r15 #2: a truncated
            // segment must raise the module contract, not AIOOBE)
            require(o + 17 <= pos + 2 + len, "truncated DHT")
            val tc = (p(o) & 0xff) >> 4; val th = p(o) & 0x0f
            require(tc <= 1 && th < 4, s"bad Huffman table class/id $tc/$th")
            val bits = Array.tabulate(16)(i => p(o + 1 + i) & 0xff)
            val total = bits.sum
            require(o + 17 + total <= pos + 2 + len, "truncated DHT")
            val vals = Array.tabulate(total)(i => p(o + 17 + i) & 0xff)
            val t = new HuffTable(bits, vals)
            if (tc == 0) huffDc(th) = t else huffAc(th) = t
            o += 17 + total
          }
        case 0xc0 | 0xc2 => // SOF0 baseline / SOF2 progressive (r15)
          require(comps == null, "multiple JPEG frames not supported")
          progressive = m == 0xc2
          require(len >= 8, "truncated SOF")
          require(p(seg) == 8, "only 8-bit JPEG precision supported")
          hImg = be16(seg + 1); w = be16(seg + 3)
          val nc = p(seg + 5) & 0xff
          require(nc == 1 || nc == 3, s"unsupported JPEG component count $nc")
          require(len >= 8 + 3 * nc, "truncated SOF component specs")
          comps = Array.tabulate(nc) { i =>
            val o = seg + 6 + i * 3
            Component(p(o) & 0xff, (p(o + 1) & 0xff) >> 4, p(o + 1) & 0x0f,
              p(o + 2) & 0xff)
          }
          comps.foreach { c =>
            require(c.h >= 1 && c.h <= 4 && c.v >= 1 && c.v <= 4 && c.tq < 4,
              "bad JPEG sampling/quant spec")
          }
          require(w > 0 && hImg > 0 && w.toLong * hImg <= Int.MaxValue / 3,
            s"unsupported JPEG dims ${w}x$hImg")
          maxH = comps.map(_.h).max
          maxV = comps.map(_.v).max
          comps.foreach { c =>
            require(maxH % c.h == 0 && maxV % c.v == 0,
              s"unsupported JPEG sampling ${c.h}x${c.v} vs ${maxH}x$maxV")
          }
          mcusX = (w + 8 * maxH - 1) / (8 * maxH)
          mcusY = (hImg + 8 * maxV - 1) / (8 * maxV)
          gridW = comps.map(c => mcusX * c.h)
          compBW = comps.map(c => (ceilDiv(w * c.h, maxH) + 7) / 8)
          compBH = comps.map(c => (ceilDiv(hImg * c.v, maxV) + 7) / 8)
          comps.indices.foreach { i =>
            require(gridW(i).toLong * (mcusY.toLong * comps(i).v) * 64 <=
              Int.MaxValue, "unsupported JPEG plane size")
          }
          coef = comps.indices.map { i =>
            Array.fill(gridW(i) * mcusY * comps(i).v)(new Array[Int](64))
          }.toArray
        case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
            0xcd | 0xce | 0xcf =>
          throw new IllegalArgumentException(
            f"unsupported JPEG mode (SOF marker 0xff$m%02x — baseline/progressive only)")
        case 0xdd =>
          require(len >= 4, "truncated DRI")
          restartInterval = be16(seg)
        case 0xda =>
          require(comps != null, "JPEG SOS before SOF")
          require(len >= 3, "truncated SOS")
          val ns = p(seg) & 0xff
          require(ns >= 1 && ns <= comps.length, s"bad SOS component count $ns")
          require(len >= 6 + 2 * ns, "truncated SOS component specs")
          val scanComps = (0 until ns).map { i =>
            val cid = p(seg + 1 + i * 2) & 0xff
            val ci = comps.indexWhere(_.id == cid)
            require(ci >= 0, s"SOS references unknown component $cid")
            val td = (p(seg + 2 + i * 2) & 0xff) >> 4
            val ta = p(seg + 2 + i * 2) & 0x0f
            // td/ta are 4-bit wire fields (0..15) but only 4 table
            // slots exist — a hostile id must fail the contract, not
            // index out of bounds (ADVICE r15 #1)
            require(td <= 3 && ta <= 3, s"bad SOS Huffman table id $td/$ta")
            comps(ci).td = td
            comps(ci).ta = ta
            ci
          }.toArray
          val ss = p(seg + 1 + 2 * ns) & 0xff
          val se = p(seg + 2 + 2 * ns) & 0xff
          val ax = p(seg + 3 + 2 * ns) & 0xff
          val ah = ax >> 4; val al = ax & 0x0f
          if (!progressive) {
            require(ss == 0 && se == 63 && ah == 0 && al == 0,
              "bad baseline scan header")
            require(ns == comps.length, "partial baseline scans not supported")
          } else {
            require(se >= ss && se <= 63 && al <= 13, "bad progressive band")
            if (ss == 0) require(se == 0, "progressive DC scan must be DC-only")
            else require(ns == 1, "progressive AC scans are per-component")
          }
          nextPos = decodeScan(scanComps, ss, se, ah, al, pos + 2 + len)
          sawScan = true
        case _ => () // APPn / COM / others: skip
      }
      pos = nextPos
      }
    }
    require(comps != null, "JPEG EOI before SOF")
    // a header-only/scan-stripped file must fail loudly, never
    // return an all-gray raster (review r15 #1)
    require(sawScan, "JPEG EOI before any SOS scan")
    // dequantize + IDCT every block into per-component planes
    val planeW = comps.indices.map(i => gridW(i) * 8).toArray
    val planes = comps.indices.map(i =>
      new Array[Byte](gridW(i) * 8 * mcusY * comps(i).v * 8)).toArray
    var ci = 0
    while (ci < comps.length) {
      val q = quant(comps(ci).tq)
      require(q != null, s"missing quant table ${comps(ci).tq}")
      val blocks = coef(ci)
      val plane = planes(ci)
      val pw = planeW(ci)
      var bi = 0
      while (bi < blocks.length) {
        val blk = blocks(bi)
        val coeff = new Array[Double](64)
        var k = 0
        while (k < 64) {
          val n = Zigzag(k)
          coeff(n) = blk(k).toDouble * q(n)
          k += 1
        }
        val px = idct(coeff)
        val ox = (bi % gridW(ci)) * 8; val oy = (bi / gridW(ci)) * 8
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            plane((oy + yy) * pw + ox + xx) =
              clamp(math.round(px(yy * 8 + xx) + 128.0).toInt).toByte
            xx += 1
          }
          yy += 1
        }
        bi += 1
      }
      ci += 1
    }
    // assemble RGB with replication upsampling
    val rgb = new Array[Byte](w * hImg * 3)
    if (comps.length == 1) {
      val plane = planes(0); val pw = planeW(0)
      var y = 0
      while (y < hImg) {
        var x = 0
        while (x < w) {
          val g = plane(y * pw + x)
          val d = (y * w + x) * 3
          rgb(d) = g; rgb(d + 1) = g; rgb(d + 2) = g
          x += 1
        }
        y += 1
      }
    } else {
      var y = 0
      while (y < hImg) {
        var x = 0
        while (x < w) {
          def sample(ci: Int): Int = {
            val c = comps(ci)
            planes(ci)((y * c.v / maxV) * planeW(ci) + (x * c.h / maxH)) & 0xff
          }
          val yv = sample(0).toDouble
          val cb = sample(1) - 128.0
          val cr = sample(2) - 128.0
          val d = (y * w + x) * 3
          rgb(d) = clamp(math.round(yv + 1.402 * cr).toInt).toByte
          rgb(d + 1) = clamp(math.round(yv - 0.344136 * cb - 0.714136 * cr).toInt).toByte
          rgb(d + 2) = clamp(math.round(yv + 1.772 * cb).toInt).toByte
          x += 1
        }
        y += 1
      }
    }
    MediaCodec.Image(w, hImg, rgb)
  }
}
