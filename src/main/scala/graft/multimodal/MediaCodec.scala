package graft.multimodal

/** Tiny pure-JVM image codec: PNM (binary `P6` RGB / `P5` gray),
  * 24-bit uncompressed `BI_RGB` BMP, and 8-bit gray/truecolor PNG
  * (r14 — the format real crawls actually ship: CRC-verified chunk
  * walk, Inflater-decompressed IDAT, full five-filter scanline
  * reconstruction including Paeth). Real containers, real header
  * parsing, real pixel layout (bottom-up padded rows for BMP) — no
  * external image library, so the batched-decode operator in
  * [[Multimodal]] exercises genuine bytes end-to-end in this
  * container. The fixture *content* is synthetic (pixels are cycled
  * document bytes, dims derive from text length so the SQL oracle can
  * replicate them arithmetically), but nothing about the decode path
  * knows that: it parses whatever conformant PNM/BMP/PNG it is handed.
  */
object MediaCodec {

  /** Fixture dims from payload text length (oracle-replicable):
    * w in [8,64], h in [8,50] — small enough that the full fixture
    * stays a few MB, non-square so row-order bugs can't cancel out. */
  def dims(textLen: Int): (Int, Int) =
    (8 + textLen % 57, 8 + (textLen * 31) % 43)

  private def cycle(src: Array[Byte], n: Int): Array[Byte] =
    Array.tabulate(n)(i => if (src.isEmpty) 0.toByte else src(i % src.length))

  // ---- encoders ------------------------------------------------------

  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"ppm pixel buffer ${rgb.length} != ${w}x${h}x3")
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ rgb
  }

  def encodePgm(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == w * h, s"pgm pixel buffer ${gray.length} != ${w}x${h}")
    s"P5\n$w $h\n255\n".getBytes("US-ASCII") ++ gray
  }

  /** 24-bit BI_RGB BMP: 14-byte file header + 40-byte info header,
    * bottom-up rows padded to 4 bytes, BGR byte order. */
  def encodeBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"bmp pixel buffer ${rgb.length} != ${w}x${h}x3")
    val rowSize = (w * 3 + 3) & ~3
    val out = new Array[Byte](54 + rowSize * h)
    def le32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
    }
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    le32(2, out.length); le32(10, 54)
    le32(14, 40); le32(18, w); le32(22, h) // positive height = bottom-up
    le16(26, 1); le16(28, 24)              // 1 plane, 24 bpp, BI_RGB(0)
    le32(34, rowSize * h)
    var y = 0
    while (y < h) {
      val row = 54 + (h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        val s = (y * w + x) * 3
        out(row + x * 3) = rgb(s + 2)
        out(row + x * 3 + 1) = rgb(s + 1)
        out(row + x * 3 + 2) = rgb(s)
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- PNG (RFC 2083): zlib-deflated filtered scanlines ----------------

  private val PngSignature = Array[Byte](0x89.toByte, 'P', 'N', 'G',
    '\r', '\n', 0x1a, '\n')

  private def crc32(buf: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32
    c.update(buf, off, len)
    c.getValue.toInt
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** 8-bit truecolor PNG (zero new deps: java.util.zip Deflater +
    * CRC32). Row filter types CYCLE 0..4 (None, Sub, Up, Average,
    * Paeth), so a decoder must reconstruct through EVERY filter to
    * recover the fixture — the defilter paths are load-bearing in
    * the gate query, not just the happy None path. */
  def encodePng(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"png pixel buffer ${rgb.length} != ${w}x${h}x3")
    val stride = w * 3
    val raw = new Array[Byte](h * (stride + 1))
    var y = 0
    while (y < h) {
      val ft = y % 5
      raw(y * (stride + 1)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = rgb(y * stride + x) & 0xff
        val left = if (x >= 3) rgb(y * stride + x - 3) & 0xff else 0
        val up = if (y > 0) rgb((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= 3 && y > 0) rgb((y - 1) * stride + x - 3) & 0xff else 0
        val f = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) / 2)
          case _ => cur - paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + x) = f.toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zbuf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) zbuf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val idat = zbuf.toByteArray
    val out = new java.io.ByteArrayOutputStream(idat.length + 64)
    out.write(PngSignature)
    def be32(v: Int): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length))
      val td = typ.getBytes("US-ASCII") ++ data
      out.write(td)
      out.write(be32(crc32(td, 0, td.length)))
    }
    chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0))
    chunk("IDAT", idat)
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** PNG sibling of [[encodeDoc]]: the SAME raster as the ppm leg
    * (text bytes cycled, same dims arithmetic — so the oracle's
    * closed-form checksums carry over) in the compressed container. */
  def encodeDocPng(docId: Long, text: Array[Byte]): (String, Array[Byte]) = {
    val (w, h) = dims(text.length)
    ("png", encodePng(w, h, cycle(text, w * h * 3)))
  }

  /** Encode a document as a deterministic real image; format cycles
    * ppm/bmp/pgm by doc id so every container sees traffic. */
  def encodeDoc(docId: Long, text: Array[Byte]): (String, Array[Byte]) = {
    val (w, h) = dims(text.length)
    (docId % 3).toInt match {
      case 0 => ("ppm", encodePpm(w, h, cycle(text, w * h * 3)))
      case 1 => ("bmp", encodeBmp(w, h, cycle(text, w * h * 3)))
      case _ => ("pgm", encodePgm(w, h, cycle(text, w * h)))
    }
  }

  // ---- decoder -------------------------------------------------------

  /** Decoded image: dims + top-down row-major RGB (gray replicated). */
  final case class Image(width: Int, height: Int, rgb: Array[Byte])

  /** Sniffs the container by magic bytes; throws on anything that is
    * not binary PNM, 24-bit BI_RGB BMP, 8-bit gray/truecolor PNG, or
    * baseline JPEG (r15 — [[JpegCodec]]). */
  def decode(payload: Array[Byte]): Image = {
    require(payload.length >= 2, "truncated payload: no magic")
    val m0 = payload(0).toChar; val m1 = payload(1).toChar
    if (m0 == 'P' && m1 == '6') decodePnm(payload, channels = 3)
    else if (m0 == 'P' && m1 == '5') decodePnm(payload, channels = 1)
    else if (m0 == 'B' && m1 == 'M') decodeBmp(payload)
    else if ((payload(0) & 0xff) == 0x89 && m1 == 'P') decodePng(payload)
    else if ((payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8)
      JpegCodec.decode(payload)
    else if (m0 == 'G' && m1 == 'I') GifCodec.decode(payload) // r16
    else if (m0 == 'R' && m1 == 'I') WebpCodec.decode(payload) // r17
    else throw new IllegalArgumentException(s"unknown image magic '$m0$m1'")
  }

  private def decodePnm(p: Array[Byte], channels: Int): Image = {
    // header tokens after the magic: width, height, maxval — separated
    // by whitespace, with '#'-to-EOL comments allowed (PNM spec); a
    // single whitespace byte then separates maxval from pixel data
    var i = 2
    def nextInt(): Int = {
      var inComment = false
      while (i < p.length && (inComment || p(i).toChar.isWhitespace || p(i) == '#')) {
        if (p(i) == '#') inComment = true
        else if (p(i) == '\n') inComment = false
        i += 1
      }
      var v = 0
      require(i < p.length && p(i) >= '0' && p(i) <= '9', "bad PNM header")
      while (i < p.length && p(i) >= '0' && p(i) <= '9') { v = v * 10 + (p(i) - '0'); i += 1 }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    require(maxval == 255, s"unsupported PNM maxval $maxval")
    i += 1 // the single whitespace after maxval
    // long arithmetic: adversarial dims must not overflow the size checks
    // (w*h*3 wrapping negative would pass an int-compare and then blow up
    // — or worse, under-allocate — at Array construction)
    require(w > 0 && h > 0 && w.toLong * h <= Int.MaxValue / 3,
      s"unsupported PNM dims ${w}x$h")
    require(p.length.toLong - i >= w.toLong * h * channels,
      "truncated PNM pixel data")
    if (channels == 3) Image(w, h, java.util.Arrays.copyOfRange(p, i, i + w * h * 3))
    else {
      val rgb = new Array[Byte](w * h * 3)
      var j = 0
      while (j < w * h) {
        val g = p(i + j)
        rgb(j * 3) = g; rgb(j * 3 + 1) = g; rgb(j * 3 + 2) = g
        j += 1
      }
      Image(w, h, rgb)
    }
  }

  private def decodeBmp(p: Array[Byte]): Image = {
    def le32(off: Int): Int =
      (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8) |
        ((p(off + 2) & 0xff) << 16) | ((p(off + 3) & 0xff) << 24)
    def le16(off: Int): Int = (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)
    require(p.length >= 54, "truncated BMP header")
    val pixOff = le32(10)
    val w = le32(18); val h = le32(22)
    require(h > 0, "top-down BMP not supported")
    require(le16(28) == 24 && le32(30) == 0, "only 24-bit BI_RGB supported")
    // long arithmetic throughout: header ints are attacker-controlled, and
    // rowSize*h / pixOff+... wrapping negative would defeat the bound check
    require(w > 0 && w.toLong * h <= Int.MaxValue / 3,
      s"unsupported BMP dims ${w}x$h")
    require(pixOff >= 54 && pixOff <= p.length, s"bad BMP pixel offset $pixOff")
    val rowSizeL = (w.toLong * 3 + 3) & ~3L
    require(p.length.toLong >= pixOff.toLong + rowSizeL * h,
      "truncated BMP pixel data")
    val rowSize = rowSizeL.toInt // <= p.length after the require above
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val row = pixOff + (h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        val d = (y * w + x) * 3
        rgb(d) = p(row + x * 3 + 2)
        rgb(d + 1) = p(row + x * 3 + 1)
        rgb(d + 2) = p(row + x * 3)
        x += 1
      }
      y += 1
    }
    Image(w, h, rgb)
  }

  /** PNG decode: chunk walk (CRC-verified IHDR/IDAT/IEND, ancillary
    * chunks skipped), concatenated-IDAT inflate, then the five-filter
    * scanline reconstruction (None/Sub/Up/Average/Paeth). Supports
    * 8-bit truecolor (2) and grayscale (0), non-interlaced — the
    * crawl-dominant subset; everything else throws loudly. Header
    * ints are attacker-controlled: all size checks in long
    * arithmetic, exactly like the BMP path. */
  private def decodePng(p: Array[Byte]): Image = {
    require(p.length >= 8 &&
      java.util.Arrays.equals(java.util.Arrays.copyOfRange(p, 0, 8),
        PngSignature), "bad PNG signature")
    def be32(off: Int): Int =
      ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
        ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)
    var i = 8
    var w = 0; var h = 0; var colorType = -1
    val idat = new java.io.ByteArrayOutputStream()
    var end = false
    while (!end) {
      require(i + 8 <= p.length, "truncated PNG chunk header")
      val len = be32(i)
      require(len >= 0 && i + 12L + len <= p.length, "truncated PNG chunk")
      val typ = new String(p, i + 4, 4, "US-ASCII")
      require(crc32(p, i + 4, 4 + len) == be32(i + 8 + len),
        s"PNG $typ chunk CRC mismatch")
      typ match {
        case "IHDR" =>
          require(len == 13, "bad IHDR length")
          w = be32(i + 8); h = be32(i + 12)
          require(p(i + 16) == 8, s"unsupported PNG bit depth ${p(i + 16)}")
          colorType = p(i + 17) & 0xff
          require(colorType == 2 || colorType == 0,
            s"unsupported PNG color type $colorType")
          require(p(i + 18) == 0 && p(i + 19) == 0 && p(i + 20) == 0,
            "unsupported PNG compression/filter/interlace")
        case "IDAT" => idat.write(p, i + 8, len)
        case "IEND" => end = true
        case _ => ()
      }
      i += 12 + len
    }
    require(colorType >= 0, "PNG missing IHDR")
    require(w > 0 && h > 0 && w.toLong * h <= Int.MaxValue / 3,
      s"unsupported PNG dims ${w}x$h")
    val bpp = if (colorType == 2) 3 else 1
    val strideL = w.toLong * bpp
    require((strideL + 1) * h <= Int.MaxValue, s"unsupported PNG dims ${w}x$h")
    val stride = strideL.toInt
    val raw = new Array[Byte](h * (stride + 1))
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    var got = 0
    var stalled = false
    while (got < raw.length && !infl.finished() && !stalled) {
      val n = infl.inflate(raw, got, raw.length - got)
      // ANY zero-progress round is a hard stop, not just input
      // exhaustion: a crafted zlib stream with the FDICT bit set
      // makes inflate() return 0 with needsDictionary()==true
      // forever — without this, one hostile payload hangs the task
      // (review r14 #1, reproduced)
      if (n == 0) stalled = true
      got += n
    }
    infl.end()
    require(got == raw.length, "truncated or unsupported PNG pixel data")
    val pix = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xff
      require(ft <= 4, s"bad PNG filter type $ft")
      var x = 0
      while (x < stride) {
        val f = raw(y * (stride + 1) + 1 + x) & 0xff
        val left = if (x >= bpp) pix(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) pix((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= bpp && y > 0) pix((y - 1) * stride + x - bpp) & 0xff
          else 0
        val v = ft match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + ((left + up) / 2)
          case _ => f + paeth(left, up, ul)
        }
        pix(y * stride + x) = v.toByte
        x += 1
      }
      y += 1
    }
    if (bpp == 3) Image(w, h, pix)
    else {
      val rgb = new Array[Byte](w * h * 3)
      var j = 0
      while (j < w * h) {
        val g = pix(j)
        rgb(j * 3) = g; rgb(j * 3 + 1) = g; rgb(j * 3 + 2) = g
        j += 1
      }
      Image(w, h, rgb)
    }
  }

  // batched-UDF lifecycle hooks: this codec is pure-JVM and stateless,
  // but the operator calls these once per partition so a native-ctx
  // implementation (libjpeg etc.) slots in without touching the plan
  def open(): MediaCodec.type = this
  def close(): Unit = ()
}
