package graft.multimodal

/** GIF decode + encode (r16, VERDICT r15 missing #3) — the remaining
  * common legacy crawl image format after JPEG/PNG/BMP/PNM. Pure JVM,
  * zero new deps, the [[JpegCodec]] discipline: a real decoder (GIF89a
  * block walk — extensions skipped by sub-block framing, local/global
  * color tables, INTERLACED row order, and a full variable-width LZW
  * decoder with code-width growth, CLEAR-code resets and the KwKwK
  * case) plus an encoder producing genuine compressed streams so every
  * decode path is gate-load-bearing.
  *
  * Fixture regime: GIF is palette-indexed (≤256 colors), so the
  * oracle-checkable raster is GRAYSCALE — palette entry i = (i,i,i)
  * and the index stream IS the byte raster (text bytes cycled, the
  * PGM regime). GIF's LZW is lossless, so decoded pixels equal the
  * pre-compression raster in closed form (unlike JPEG, no special
  * regime needed). Odd ids encode INTERLACED: the decoder's
  * deinterlace must restore the same top-down raster or the
  * position-weighted checksum breaks.
  *
  * Hostile-input posture: every length/index read is bounds-checked to
  * the module's IllegalArgumentException contract (the SOS/DHT lesson
  * from JpegCodec); LZW codes beyond the table, indices beyond the
  * palette, and missing image data all throw — never a garbage raster.
  */
object GifCodec {

  // ---- encoder -----------------------------------------------------------

  /** Encode a grayscale raster (values = palette indices) as GIF89a
    * with a 256-gray global color table; `interlaced` reorders rows
    * into the four-pass interlace layout. Includes a comment and a
    * graphic-control extension so extension SKIPPING is always
    * exercised on decode. */
  def encodeGif(w: Int, h: Int, gray: Array[Byte],
      interlaced: Boolean): Array[Byte] = {
    require(gray.length == w * h, s"gif pixel buffer ${gray.length} != ${w}x$h")
    val out = new java.io.ByteArrayOutputStream(gray.length / 2 + 1024)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    out.write(0xf7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0)    // background color index
    out.write(0)    // pixel aspect ratio
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    // comment extension (sub-block framed — decoders must skip it)
    val comment = "graft gif fixture".getBytes("US-ASCII")
    out.write(0x21); out.write(0xfe)
    out.write(comment.length); out.write(comment); out.write(0)
    // graphic control extension (the block real animations carry)
    out.write(0x21); out.write(0xf9); out.write(4)
    out.write(0); le16(0); out.write(0); out.write(0)
    // image descriptor
    out.write(0x2c); le16(0); le16(0); le16(w); le16(h)
    out.write(if (interlaced) 0x40 else 0x00)
    val indices = if (interlaced) interlaceRows(w, h, gray) else gray
    out.write(8) // LZW minimum code size
    writeSubBlocks(out, lzwEncode(indices, minCodeSize = 8))
    out.write(0)    // image-data terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Rows in GIF interlace order: passes at strides 8,8,4,2 starting
    * at rows 0,4,2,1. */
  private def interlaceRows(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](gray.length)
    var o = 0
    val passes = Seq((0, 8), (4, 8), (2, 4), (1, 2))
    passes.foreach { case (start, step) =>
      var y = start
      while (y < h) {
        System.arraycopy(gray, y * w, out, o, w)
        o += w
        y += step
      }
    }
    out
  }

  /** Inverse of [[interlaceRows]]. */
  private def deinterlaceRows(w: Int, h: Int, packed: Array[Byte])
      : Array[Byte] = {
    val out = new Array[Byte](packed.length)
    var o = 0
    val passes = Seq((0, 8), (4, 8), (2, 4), (1, 2))
    passes.foreach { case (start, step) =>
      var y = start
      while (y < h) {
        System.arraycopy(packed, o, out, y * w, w)
        o += w
        y += step
      }
    }
    out
  }

  private def writeSubBlocks(out: java.io.ByteArrayOutputStream,
      data: Array[Byte]): Unit = {
    var i = 0
    while (i < data.length) {
      val n = math.min(255, data.length - i)
      out.write(n)
      out.write(data, i, n)
      i += n
    }
  }

  /** Variable-width GIF-LZW compression (LSB-first bit packing): a
    * real string-table encoder, so repeated fixture bytes produce
    * multi-byte codes, width growth and — on runs — the KwKwK code
    * the decoder's special case exists for. Table resets via CLEAR
    * when it would pass 4096 entries. */
  private[multimodal] def lzwEncode(data: Array[Byte],
      minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream(data.length)
    var bitBuf = 0L
    var bitCnt = 0
    var width = minCodeSize + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += width
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }
    // string table: (prefixCode << 8 | nextByte) -> code
    var table = new java.util.HashMap[Integer, Integer]()
    var next = eoi + 1
    emit(clear)
    if (data.nonEmpty) {
      var cur = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val c = data(i) & 0xff
        val key = Integer.valueOf((cur << 8) | c)
        val hit = table.get(key)
        if (hit != null) cur = hit.intValue()
        else {
          emit(cur)
          table.put(key, Integer.valueOf(next))
          next += 1
          if (next == (1 << width) + 1 && width < 12) width += 1
          if (next > 4095) {
            emit(clear)
            table = new java.util.HashMap[Integer, Integer]()
            next = eoi + 1
            width = minCodeSize + 1
          }
          cur = c
        }
        i += 1
      }
      emit(cur)
    }
    emit(eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  // ---- decoder -----------------------------------------------------------

  /** Decode the FIRST image of a GIF87a/GIF89a stream to the shared
    * [[MediaCodec.Image]] (top-down RGB, palette applied, deinterlaced).
    * Malformed input throws IllegalArgumentException. */
  def decode(p: Array[Byte]): MediaCodec.Image = {
    require(p.length >= 13, "truncated GIF: no header")
    val magic = new String(p, 0, 6, "US-ASCII")
    require(magic == "GIF89a" || magic == "GIF87a", s"bad GIF magic '$magic'")
    var pos = 6
    def u8(): Int = {
      require(pos < p.length, "truncated GIF")
      val v = p(pos) & 0xff; pos += 1; v
    }
    def le16(): Int = { val a = u8(); val b = u8(); a | (b << 8) }
    def colorTable(bits: Int): Array[Int] = {
      val n = 1 << bits
      require(pos + 3 * n <= p.length, "truncated GIF color table")
      val t = Array.tabulate(n) { i =>
        ((p(pos + 3 * i) & 0xff) << 16) | ((p(pos + 3 * i + 1) & 0xff) << 8) |
          (p(pos + 3 * i + 2) & 0xff)
      }
      pos += 3 * n
      t
    }
    le16(); le16() // logical screen w/h (frames carry their own dims)
    val packed = u8()
    u8(); u8() // background index, aspect ratio
    val gct = if ((packed & 0x80) != 0) colorTable((packed & 7) + 1) else null
    while (true) {
      u8() match {
        case 0x21 => // extension: label + sub-blocks, all skipped
          u8()
          var n = u8()
          while (n != 0) {
            require(pos + n <= p.length, "truncated GIF extension block")
            pos += n
            n = u8()
          }
        case 0x2c => // image descriptor: the frame we decode
          le16(); le16() // left, top
          val w = le16(); val h = le16()
          require(w > 0 && h > 0 && w.toLong * h <= (1L << 26),
            s"bad GIF frame dims ${w}x$h")
          val fp = u8()
          val lct = if ((fp & 0x80) != 0) colorTable((fp & 7) + 1) else null
          val palette = if (lct != null) lct else gct
          require(palette != null, "GIF frame with no color table")
          val interlaced = (fp & 0x40) != 0
          val minCodeSize = u8()
          require(minCodeSize >= 2 && minCodeSize <= 8,
            s"bad GIF LZW min code size $minCodeSize")
          // gather the sub-block-framed LZW stream
          val lzw = new java.io.ByteArrayOutputStream(w * h / 2 + 16)
          var n = u8()
          while (n != 0) {
            require(pos + n <= p.length, "truncated GIF image data")
            lzw.write(p, pos, n)
            pos += n
            n = u8()
          }
          val idx = lzwDecode(lzw.toByteArray, minCodeSize, w * h)
          val flat = if (interlaced) deinterlaceRows(w, h, idx) else idx
          val rgb = new Array[Byte](w * h * 3)
          var i = 0
          while (i < flat.length) {
            val ci = flat(i) & 0xff
            require(ci < palette.length, s"GIF index $ci beyond palette")
            val c = palette(ci)
            rgb(3 * i) = ((c >> 16) & 0xff).toByte
            rgb(3 * i + 1) = ((c >> 8) & 0xff).toByte
            rgb(3 * i + 2) = (c & 0xff).toByte
            i += 1
          }
          return MediaCodec.Image(w, h, rgb)
        case 0x3b =>
          throw new IllegalArgumentException("GIF trailer before any image")
        case other =>
          throw new IllegalArgumentException(
            f"unknown GIF block 0x$other%02x")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Variable-width GIF-LZW decode (LSB-first): CLEAR resets, width
    * grows when the next table slot crosses the current width, KwKwK
    * (code == next unassigned slot) emits prev+prev[0]. Exactly
    * `expected` indices must decode — short or over-long streams are
    * corrupt. */
  private[multimodal] def lzwDecode(data: Array[Byte], minCodeSize: Int,
      expected: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream(expected)
    var bitBuf = 0L
    var bitCnt = 0
    var bytePos = 0
    var width = minCodeSize + 1
    def read(): Int = {
      while (bitCnt < width) {
        require(bytePos < data.length, "truncated GIF LZW stream")
        bitBuf |= (data(bytePos) & 0xffL) << bitCnt
        bytePos += 1
        bitCnt += 8
      }
      val v = (bitBuf & ((1L << width) - 1)).toInt
      bitBuf >>>= width
      bitCnt -= width
      v
    }
    // table entries as byte strings; roots are single indices
    val table = new Array[Array[Byte]](4096)
    var next = 0
    def reset(): Unit = {
      var i = 0
      while (i < clear) { table(i) = Array((i & 0xff).toByte); i += 1 }
      next = eoi + 1
      width = minCodeSize + 1
    }
    reset()
    var prev: Array[Byte] = null
    var code = read()
    while (code != eoi) {
      if (code == clear) { reset(); prev = null }
      else {
        val entry: Array[Byte] =
          if (code < next && table(code) != null) table(code)
          else if (code == next && prev != null) prev :+ prev(0) // KwKwK
          else throw new IllegalArgumentException(
            s"corrupt GIF LZW stream: code $code beyond table $next")
        out.write(entry)
        if (prev != null && next < 4096) {
          table(next) = prev :+ entry(0)
          next += 1
          // the decoder lags the encoder by ONE add (its first code
          // after clear adds nothing), so its width grows at
          // next == 2^w where the encoder's grows at 2^w + 1 — the
          // giflib pairing; both first affect the same code index
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = entry
      }
      require(out.size() <= expected,
        s"GIF LZW stream decodes past the raster (${out.size()} > $expected)")
      code = read()
    }
    require(out.size() == expected,
      s"GIF LZW stream decoded ${out.size()} of $expected indices")
    out.toByteArray
  }

  /** Encode a document as a REAL grayscale GIF of the PGM regime's
    * raster (text bytes cycled to w×h; odd ids INTERLACED so the
    * deinterlace path is gate-load-bearing). */
  def encodeDocGif(docId: Long, text: Array[Byte]): (String, Array[Byte]) = {
    val (w, h) = MediaCodec.dims(text.length)
    val gray = Array.tabulate(w * h)(i =>
      if (text.isEmpty) 0.toByte else text(i % text.length))
    ("gif", encodeGif(w, h, gray, interlaced = docId % 2 == 1))
  }
}
