package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def recOf(id: Long, payload: String): String =
    Seq((id, payload)).toDF("doc_id", "payload")
      .select(Warc.warcify(col("doc_id"), col("payload")).as("rec"))
      .as[String].head()

  test("synthesized records are structurally conformant WARC/1.0") {
    (0L to 7L).foreach { id =>
      val rec = recOf(id, s"<p>payload $id</p>")
      assert(rec.startsWith("WARC/1.0\r\n"), s"id=$id bad version line")
      assert(rec.contains("\r\nWARC-Type: response\r\n"))
      val blank = rec.indexOf("\r\n\r\n")
      assert(blank > 0, s"id=$id missing header terminator")
      // every header line before the blank is Name: value
      rec.substring(0, blank).split("\r\n").drop(1).foreach { l =>
        assert(l.matches("[A-Za-z-]+: .+"), s"id=$id bad header line '$l'")
      }
      assert(rec.endsWith("\r\n\r\n"), s"id=$id missing record terminator")
    }
  }

  test("parser recovers uri and body by declared length across all layouts") {
    val payloads = (0L to 7L).map(id => (id, s"<p>pay load $id &amp; more</p>"))
    val got = payloads.toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload"),
        Warc.warcify(col("doc_id"), col("payload")).as("rec"))
      .select(col("doc_id"), col("payload"),
        Warc.targetUri(col("rec")).as("uri"),
        Warc.bodyOf(col("rec")).as("body"),
        Warc.bodyOk(col("rec")).as("ok"))
      .as[(Long, String, String, String, Boolean)].collect()
    got.foreach { case (id, payload, uri, body, ok) =>
      assert(uri == s"http://src${id % 20}.example/doc/$id")
      assert(body == payload, s"id=$id body slice diverged")
      assert(ok, s"id=$id body_ok false")
    }
  }

  test("body framing is length-based: a body containing CRLFCRLF survives") {
    // terminator-scanning parsers truncate here; length framing must not
    val payload = "first part\r\n\r\nsecond part"
    val rec = recOf(3L, payload)
    val out = Seq(rec).toDF("rec")
      .select(Warc.bodyOf(col("rec")).as("b"), Warc.bodyOk(col("rec")).as("ok"))
      .as[(String, Boolean)].head()
    assert(out._1 == payload && out._2)
  }

  test("warc.gz source: per-record gzip members split and parse back exactly") {
    // the CommonCrawl file layout — one gzip member per record,
    // members concatenated; Java's GZIPInputStream silently
    // auto-chains members, so the splitter's hand framing is the
    // thing under test
    val payloads = (0L until 9L).map(id => (id, s"<p>record $id body</p>"))
    val recs = payloads.map { case (id, p) => recOf(id, p) }
    val dir = java.nio.file.Files.createTempDirectory("warcgz")
    try {
      val f = dir.resolve("segment-00000.warc.gz")
      val fos = new java.io.FileOutputStream(f.toFile)
      recs.foreach { r =>
        val gz = new java.util.zip.GZIPOutputStream(fos)
        gz.write(r.getBytes("UTF-8")); gz.finish() // member per record
      }
      fos.close()
      val got = Warc.readWarcGz(spark, dir.toString)
        .select(col("member"), col("rec"))
        .as[(Long, String)].collect().sortBy(_._1)
      assert(got.length == 9)
      got.foreach { case (i, rec) => assert(rec == recs(i.toInt)) }
      // and the members flow through the parser end-to-end
      val bodies = Warc.readWarcGz(spark, dir.toString)
        .select(Warc.bodyOf(col("rec")).as("b"), Warc.bodyOk(col("rec")).as("ok"))
        .as[(String, Boolean)].collect()
      assert(bodies.forall(_._2) &&
        bodies.map(_._1).sorted.sameElements(payloads.map(_._2).sorted))
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      val paths = try walk.iterator().asScala.toSeq finally walk.close()
      paths.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("gzip member splitter handles FNAME-flagged headers and rejects corruption") {
    // hand-built member with FNAME (GZIPOutputStream never emits one)
    val body = "WARC/1.0\r\ncustom\r\n\r\nx\r\n\r\n".getBytes("UTF-8")
    val defl = new java.util.zip.Deflater(-1, true)
    defl.setInput(body); defl.finish()
    val zb = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](256)
    while (!defl.finished()) zb.write(tmp, 0, defl.deflate(tmp))
    val crc = new java.util.zip.CRC32; crc.update(body)
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val member = Array[Byte](0x1f, 0x8b.toByte, 8, 8, 0, 0, 0, 0, 0, 0) ++
      "seg.warc".getBytes("ISO-8859-1") ++ Array[Byte](0) ++
      zb.toByteArray ++
      le32(crc.getValue) ++ le32(body.length.toLong)
    val got = Warc.splitGzipMembers(member ++ member)
    assert(got == Seq(new String(body, "UTF-8"), new String(body, "UTF-8")))
    // flipped CRC byte must throw, not emit a wrong record
    val bad = (member ++ member).clone()
    bad(member.length - 6) = (bad(member.length - 6) ^ 0x1).toByte
    intercept[IllegalArgumentException] { Warc.splitGzipMembers(bad) }
  }

  test("a member truncated inside an optional header field throws the module contract") {
    // ADVICE r14 #3: the old array walker indexed FNAME/FCOMMENT
    // without bounds checks — a member cut mid-field must raise
    // IllegalArgumentException, never ArrayIndexOutOfBounds
    val header = Array[Byte](0x1f, 0x8b.toByte, 8, 8, 0, 0, 0, 0, 0, 0) ++
      "seg".getBytes("ISO-8859-1") // FNAME flagged, no NUL terminator, then EOF
    val e = intercept[IllegalArgumentException] {
      Warc.splitGzipMembers(header)
    }
    assert(e.getMessage.contains("truncated gzip member"))
    // and truncation inside FEXTRA's declared length likewise
    val fextra = Array[Byte](0x1f, 0x8b.toByte, 8, 4, 0, 0, 0, 0, 0, 0,
      20, 0, 1, 2) // XLEN=20 but only 2 payload bytes present
    val e2 = intercept[IllegalArgumentException] {
      Warc.splitGzipMembers(fextra)
    }
    assert(e2.getMessage.contains("truncated gzip member"))
  }

  test("the streaming walker emits records lazily, not after a whole-file scan") {
    // the scale contract of readWarcGz: the first record must be
    // available BEFORE the stream has been read past (roughly) its
    // own member — proven with a counting stream over many members
    // members carry an incompressible (LCG) filler so the file is
    // MUCH larger than the walker's 256 KiB buffer — a whole-file
    // pre-read would be visible in the counter
    var seed = 12345L
    val filler = Array.fill(200 * 1024) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (33 + ((seed >>> 33) % 94)).toByte // printable ASCII
    }
    val rec = recOf(0L, "<p>lazy body</p>") + new String(filler, "US-ASCII")
    val one = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(rec.getBytes("UTF-8")); gz.finish(); gz.close()
      bos.toByteArray
    }
    assert(one.length > 128 * 1024, "filler must defeat deflate")
    val file = Array.fill(16)(one).flatten.toArray
    var readUpTo = 0L
    val counting = new java.io.InputStream {
      private var i = 0
      override def read(): Int =
        if (i >= file.length) -1 else { readUpTo = i + 1; i += 1; file(i - 1) & 0xff }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        if (i >= file.length) return -1
        val n = math.min(len, file.length - i)
        System.arraycopy(file, i, b, off, n)
        i += n; readUpTo = i
        n
      }
    }
    val it = Warc.gzipMemberIterator(counting)
    val first = it.next()
    assert(new String(first, "UTF-8") == rec)
    // emitting record 1 of 16 must not have consumed more than that
    // member plus one read buffer of lookahead
    assert(readUpTo <= one.length + 256L * 1024,
      s"walker read $readUpTo of ${file.length} bytes before the first record")
    assert(it.size == 15) // and the rest still stream out complete
  }

  test("payload decodes per the declared HTTP charset, UTF-8 fallback (r15)") {
    // an ISO-8859-1 body: 0xE9 is é in latin-1 and an ILLEGAL UTF-8
    // byte — only charset-aware decode recovers it
    val payload = "café crème".getBytes("ISO-8859-1")
    def warcRecord(http: Array[Byte]): Array[Byte] = {
      val head = ("WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Target-URI: http://src0.example/doc/0\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes("US-ASCII")
      head ++ http ++ "\r\n\r\n".getBytes("US-ASCII")
    }
    val declared = warcRecord(
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=iso-8859-1\r\n\r\n")
        .getBytes("US-ASCII") ++ payload)
    val undeclared = warcRecord(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n".getBytes("US-ASCII") ++
        "café".getBytes("UTF-8")) // UTF-8 bytes, no charset param
    val dir = java.nio.file.Files.createTempDirectory("warccs")
    try {
      val fos = new java.io.FileOutputStream(
        dir.resolve("seg.warc.gz").toFile)
      Seq(declared, undeclared).foreach { r =>
        val gz = new java.util.zip.GZIPOutputStream(fos)
        gz.write(r); gz.finish()
      }
      fos.close()
      val got = Warc.readWarcGz(spark, dir.toString)
        .select(col("member"),
          Warc.httpCharset(Warc.bodyOf(col("rec"))).as("cs"),
          Warc.httpPayload(Warc.bodyOf(col("rec"))).as("p"),
          Warc.bodyOk(col("rec")).as("ok"))
        .as[(Long, Option[String], String, Boolean)].collect().sortBy(_._1)
      assert(got(0)._2.contains("iso-8859-1"))
      assert(got(0)._3 == "café crème", "declared charset must decode")
      assert(got(0)._4, "octet Content-Length == char length for latin-1")
      // UTF-8 fallback decodes the é; the char-domain body slice runs
      // one char long because the WARC Content-Length counts OCTETS
      // (the module's documented multi-byte framing note — a binary
      // deployment slices bytes and doesn't see this)
      assert(got(1)._2.isEmpty && got(1)._3.startsWith("café"),
        "UTF-8 fallback")
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      val paths = try walk.iterator().asScala.toSeq finally walk.close()
      paths.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("HTTP envelope strip: status/content-type/charset columns + payload (r15)") {
    val ids = (0L to 5L)
    val rows = ids.map(id => (id, s"<p>page $id</p>")).toDF("doc_id", "payload")
      .select(col("doc_id"),
        Warc.warcify(col("doc_id"),
          Warc.httpWrap(col("doc_id"), col("payload"))).as("rec"))
      .select(col("doc_id"), Warc.bodyOf(col("rec")).as("body"))
      .select(col("doc_id"),
        Warc.httpStatus(col("body")).as("status"),
        Warc.httpContentType(col("body")).as("ct"),
        Warc.httpCharset(col("body")).as("cs"),
        Warc.httpPayload(col("body")).as("p"))
      .as[(Long, Option[Int], Option[String], Option[String], String)]
      .collect().sortBy(_._1)
    rows.foreach { case (id, status, ct, cs, p) =>
      (id % 3) match {
        case 0 =>
          assert(status.contains(200) && ct.contains("text/html") &&
            cs.contains("utf-8"), s"id=$id")
        case 1 =>
          assert(status.contains(404) && ct.contains("text/html") &&
            cs.isEmpty, s"id=$id — no Content-Length, framing is the blank line")
        case _ =>
          assert(status.isEmpty && ct.isEmpty && cs.isEmpty,
            s"id=$id — envelope-less record must surface nulls")
      }
      assert(p == s"<p>page $id</p>", s"id=$id payload strip diverged")
    }
  }

  test("HTTP payload containing CRLFCRLF survives the envelope split") {
    // the strip splits at the FIRST blank line only — a payload that
    // itself contains one must stay intact
    val payload = "before\r\n\r\nafter"
    val body = s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n$payload"
    val out = Seq(body).toDF("body")
      .select(Warc.httpStatus(col("body")).as("s"),
        Warc.httpPayload(col("body")).as("p"))
      .as[(Int, String)].head()
    assert(out._1 == 200 && out._2 == payload)
  }

  test("warcType selects record kinds; request twins are conformant records (r15)") {
    val rows = Seq((7L, "<p>seven</p>")).toDF("doc_id", "payload")
      .select(
        Warc.warcify(col("doc_id"), col("payload")).as("resp"),
        Warc.requestify(col("doc_id"), Warc.fixtureUri(col("doc_id"))).as("req"))
      .select(Warc.warcType(col("resp")).as("tresp"),
        Warc.warcType(col("req")).as("treq"),
        Warc.targetUri(col("req")).as("requri"),
        Warc.bodyOk(col("req")).as("reqok"))
      .as[(String, String, String, Boolean)].head()
    assert(rows._1 == "response" && rows._2 == "request")
    assert(rows._3 == "http://src7.example/doc/7", "request carries the same URI")
    assert(rows._4, "request body frames by its declared length")
    // a record with no type header surfaces null, never a guess
    val none = Seq("WARC/1.0\r\nX: y\r\n\r\n").toDF("rec")
      .select(Warc.warcType(col("rec"))).as[Option[String]].head()
    assert(none.isEmpty)
  }

  test("writeGzMembers round-trips through the member walker (writer/reader symmetry)") {
    // the shared segment writer (review r15 #3): hand-framed RFC-1952
    // members over ONE reused Deflater — the reader must recover every
    // record bit-for-bit, CRC/ISIZE included
    val recs = (0 until 40).map(i => s"record $i " + ("x" * (i * 7)))
    val bos = new java.io.ByteArrayOutputStream()
    Warc.writeGzMembers(bos, recs.iterator.map(_.getBytes("UTF-8")))
    assert(Warc.splitGzipMembers(bos.toByteArray) == recs)
    // and a JDK GZIPInputStream agrees the stream is valid gzip
    val gz = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val all = new String(gz.readAllBytes(), "UTF-8")
    assert(all == recs.mkString(""))
  }

  test("encoded wire payloads decode: chunked, gzip, deflate, stacked (r16)") {
    // ASCII page for the band loop: the IDENTITY band keeps the r15
    // octet-domain framing (the documented multi-byte caveat); the
    // transform bands' char-domain rewrite is pinned separately below
    val page = "<p>body with cafe text</p>" * 8
    (0L to 11L).foreach { id =>
      val rec = Warc.warcifyBytes(id,
        Warc.encodeHttpBand(id, page.getBytes("UTF-8")))
      val dec = Warc.decodeRecord(rec)
      assert(dec.contains("cafe text"), s"band ${id % 5} lost the payload")
      // the decoded record frames exactly: bodyOf slices by the
      // REWRITTEN Content-Length and the payload strip recovers the
      // original page byte-for-byte
      val (p, ok, enc, ch) = Seq(dec).toDF("rec")
        .select(Warc.httpPayload(Warc.bodyOf(col("rec"))).as("p"),
          Warc.bodyOk(col("rec")).as("ok"),
          Warc.httpContentEncoding(Warc.bodyOf(col("rec"))).as("enc"),
          Warc.httpChunked(Warc.bodyOf(col("rec"))).as("ch"))
        .as[(String, Boolean, Option[String], Boolean)].head()
      assert(p == page, s"band ${id % 6} payload mismatch")
      assert(ok, s"band ${id % 6} must pass body_ok after the length rewrite")
      // wire-form metadata preserved verbatim
      val band = (id % 6).toInt
      assert(enc == (band match {
        case 1 | 4 => Some("gzip"); case 2 => Some("deflate")
        case 5 => Some("zstd"); case _ => None
      }), s"band $band encoding column")
      assert(ch == (band == 3 || band == 4), s"band $band chunked column")
    }
    // a TRANSFORMED multi-byte payload frames exactly: the decode
    // layer rewrites the WARC Content-Length in the char domain, so
    // gzip'd UTF-8 text passes body_ok where an identity multi-byte
    // record hits the documented octet/char caveat
    val utf8Page = "<p>body with café crème</p>" * 4
    val rec = Warc.warcifyBytes(1L,
      Warc.encodeHttpBand(1L, utf8Page.getBytes("UTF-8"))) // band 1: gzip
    val (p2, ok2) = Seq(Warc.decodeRecord(rec)).toDF("rec")
      .select(Warc.httpPayload(Warc.bodyOf(col("rec"))).as("p"),
        Warc.bodyOk(col("rec")).as("ok"))
      .as[(String, Boolean)].head()
    assert(p2 == utf8Page && ok2,
      "char-domain length rewrite must frame multi-byte decoded payloads")
  }

  test("undecodable encodings pass through; chunked+identity de-chunks (review r16 #1/#4)") {
    // Content-Encoding this layer does not decode (br) passes through
    // UNDECODED with the header preserved as the filter signal
    val fakeBr = "not really brotli but opaque bytes"
    val brRec = Warc.warcifyBytes(3L,
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        "Content-Encoding: br\r\n\r\n").getBytes("US-ASCII") ++
        fakeBr.getBytes("US-ASCII"))
    val (pBr, ceBr) = Seq(Warc.decodeRecord(brRec)).toDF("rec")
      .select(Warc.httpPayload(Warc.bodyOf(col("rec"))).as("p"),
        Warc.httpContentEncoding(Warc.bodyOf(col("rec"))).as("ce"))
      .as[(String, Option[String])].head()
    assert(pBr == fakeBr && ceBr.contains("br"),
      "unsupported encodings must pass through with the signal column")
    // chunked + Content-Encoding: identity must DE-CHUNK (not crash,
    // not skip): the framing transform is independent of the encoding
    val idPayload = "identity payload body that is chunk framed"
    val idRec = Warc.warcifyBytes(4L,
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        "Content-Encoding: identity\r\nTransfer-Encoding: chunked\r\n\r\n")
        .getBytes("US-ASCII") ++
        Warc.chunkifyBytes(idPayload.getBytes("US-ASCII"), 10))
    val (pId, okId, chId) = Seq(Warc.decodeRecord(idRec)).toDF("rec")
      .select(Warc.httpPayload(Warc.bodyOf(col("rec"))).as("p"),
        Warc.bodyOk(col("rec")).as("ok"),
        Warc.httpChunked(Warc.bodyOf(col("rec"))).as("ch"))
      .as[(String, Boolean, Boolean)].head()
    assert(pId == idPayload && okId && chId,
      "chunked+identity must de-chunk with the length rewrite")
  }

  test("member walker hasNext stays false after exhaustion (review r16 #2)") {
    val bos = new java.io.ByteArrayOutputStream()
    Warc.writeGzMembers(bos, Iterator("one".getBytes, "two".getBytes))
    val it = Warc.gzipMemberIterator(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    assert(it.hasNext); it.next(); assert(it.hasNext); it.next()
    // the Iterator contract: hasNext is idempotent once exhausted —
    // a stale buffer bound must not resurrect consumed bytes
    assert(!it.hasNext && !it.hasNext && !it.hasNext)
  }

  test("chunked framing: extensions skipped, trailers skipped, negatives throw") {
    val data = ("0123456789" * 37).getBytes("US-ASCII")
    assert(Warc.dechunk(Warc.chunkifyBytes(data, 100)).sameElements(data))
    assert(Warc.dechunk(Warc.chunkifyBytes(data, 7)).sameElements(data))
    // chunk extension after the size + a trailer header after the 0-chunk
    val fancy = ("a;ext=1\r\n0123456789\r\n" + "0\r\nX-Trailer: v\r\n\r\n")
      .getBytes("US-ASCII")
    assert(new String(Warc.dechunk(fancy), "US-ASCII") == "0123456789")
    val good = Warc.chunkifyBytes(data, 64)
    intercept[IllegalArgumentException] { // cut mid-chunk
      Warc.dechunk(java.util.Arrays.copyOfRange(good, 0, good.length / 2))
    }
    intercept[IllegalArgumentException] { // garbage size line
      Warc.dechunk("zz\r\nabc\r\n0\r\n\r\n".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] { // missing terminal 0-chunk
      Warc.dechunk("3\r\nabc\r\n".getBytes("US-ASCII"))
    }
  }

  test("content-encoding inflate: corrupt streams throw, raw-deflate fallback works") {
    val data = ("payload " * 50).getBytes("UTF-8")
    assert(Warc.inflatePayload(Warc.gzipBytes(data), "gzip").sameElements(data))
    assert(Warc.inflatePayload(Warc.zlibBytes(data), "deflate").sameElements(data))
    assert(Warc.inflatePayload(Warc.zstdBytes(data), "zstd").sameElements(data))
    intercept[IllegalArgumentException] { // corrupt zstd frame
      Warc.inflatePayload("not a zstd frame at all".getBytes, "zstd")
    }
    // the broken-server case: raw deflate sent under 'deflate'
    val raw = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      try {
        d.setInput(data); d.finish()
        val out = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
        out.toByteArray
      } finally d.end()
    }
    assert(Warc.inflatePayload(raw, "deflate").sameElements(data))
    val badGz = Warc.gzipBytes(data)
    badGz(badGz.length / 2) = (badGz(badGz.length / 2) ^ 0x55).toByte
    intercept[IllegalArgumentException] { Warc.inflatePayload(badGz, "gzip") }
    intercept[IllegalArgumentException] {
      Warc.inflatePayload("not deflate at all!!".getBytes, "deflate")
    }
    intercept[IllegalArgumentException] {
      Warc.inflatePayload(data, "br") // unsupported encoding is loud
    }
    // a record DECLARING gzip but carrying garbage must fail the
    // record loudly, never emit silently-mangled text
    val lying = Warc.warcifyBytes(7L,
      ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n").getBytes("US-ASCII")
        ++ "this is not gzip".getBytes("US-ASCII"))
    intercept[IllegalArgumentException] { Warc.decodeRecord(lying) }
  }

  test("charset parameter match is same-line only (ADVICE r15 #4)") {
    // a Content-Type header ending in ';' followed by a DIFFERENT
    // header line starting with 'charset=' — \s in the old pattern
    // matched across the CRLF and misattributed that token; the
    // parameter whitespace is now [ \t] so the match must fail and
    // the payload decode fall back to UTF-8
    val payload = "café".getBytes("UTF-8")
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html;\r\n" +
      "charset=iso-8859-1: not-a-charset-header\r\n\r\n")
      .getBytes("US-ASCII") ++ payload
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("US-ASCII") ++
      http ++ "\r\n\r\n".getBytes("US-ASCII")
    // JVM-side decode: UTF-8 fallback keeps the é intact (an
    // iso-8859-1 misread would mangle the two UTF-8 bytes)
    assert(Warc.decodeRecord(rec).contains("café"))
    // Column-side: httpCharset must be null for the split header
    val cs = Seq(new String(rec, "UTF-8")).toDF("rec")
      .select(Warc.httpCharset(Warc.bodyOf(col("rec"))).as("cs"))
      .as[Option[String]].head()
    assert(cs.isEmpty, s"cross-line charset must not match, got $cs")
    // and a legitimate same-line parameter still matches
    val ok = Seq("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\nx")
      .toDF("body").select(Warc.httpCharset(col("body")).as("cs"))
      .as[Option[String]].head()
    assert(ok.contains("utf-8"))
  }

  test("a 0-byte read never truncates the member walk (ADVICE r15 #2)") {
    // an InputStream may legally return 0 bytes without being at EOF;
    // the walker must keep reading, not declare end-of-segment
    val recs = (0 until 5).map(i => s"rec $i")
    val bos = new java.io.ByteArrayOutputStream()
    Warc.writeGzMembers(bos, recs.iterator.map(_.getBytes("UTF-8")))
    val inner = new java.io.ByteArrayInputStream(bos.toByteArray)
    val teasing = new java.io.InputStream {
      private var flip = true
      override def read(): Int = inner.read()
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        flip = !flip
        if (flip) 0 else inner.read(b, off, math.min(len, 7))
      }
    }
    val got = Warc.gzipMemberIterator(teasing)
      .map(new String(_, "UTF-8")).toVector
    assert(got == recs, s"0-byte reads truncated the walk: $got")
  }

  test("a syntactically illegal charset name falls back to UTF-8, never throws") {
    // review r15 #1: Charset.isSupported THROWS on names like '-8859-1'
    // (the token regex admits a leading '-'); one garbage header must
    // not kill the task
    val payload = "plain body".getBytes("US-ASCII")
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=-8859-1\r\n\r\n")
      .getBytes("US-ASCII") ++ payload
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("US-ASCII") ++
      http ++ "\r\n\r\n".getBytes("US-ASCII")
    val decoded = Warc.decodeRecord(rec)
    assert(decoded.endsWith("plain body\r\n\r\n"))
  }

  // ---- r17 charset sniff (header > BOM > meta > UTF-8) -------------------

  private def csRecord(http: Array[Byte]): Array[Byte] =
    ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://src0.example/doc/0\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("US-ASCII") ++
      http ++ "\r\n\r\n".getBytes("US-ASCII")

  private def csHttp(ct: String, body: Array[Byte]): Array[Byte] =
    (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII") ++ body

  private def payloadAndOk(recBytes: Array[Byte]): (String, Boolean) =
    Seq(Warc.decodeRecord(recBytes)).toDF("rec")
      .select(Warc.httpPayload(Warc.bodyOf(col("rec"))).as("p"),
        Warc.bodyOk(col("rec")).as("ok"))
      .as[(String, Boolean)].head()

  test("meta prescan decodes a header-less latin-1 page; length rewrite frames it (r17)") {
    val body = ("<meta charset=\"iso-8859-1\"><p>café crème</p>")
      .getBytes("ISO-8859-1") // 0xE9/0xE8: ILLEGAL UTF-8 bytes
    val (p, ok) = payloadAndOk(csRecord(csHttp("text/html", body)))
    assert(p == "<meta charset=\"iso-8859-1\"><p>café crème</p>")
    assert(ok, "identity multi-byte decode must rewrite the WARC length")
    // the http-equiv spelling resolves through the same pattern
    val body2 = ("<meta http-equiv=\"Content-Type\" content=\"text/html; " +
      "charset=iso-8859-1\"><p>café</p>").getBytes("ISO-8859-1")
    val (p2, ok2) = payloadAndOk(csRecord(csHttp("text/html", body2)))
    assert(p2.endsWith("<p>café</p>") && ok2)
  }

  test("BOM beats meta and is stripped; header beats BOM and keeps it (r17)") {
    val utf8Body = "<meta charset=\"iso-8859-1\"><p>café</p>".getBytes("UTF-8")
    val bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
    // no header charset: the BOM decides UTF-8 over the lying meta,
    // and the decoded payload starts at the meta (BOM stripped)
    val (p, ok) = payloadAndOk(csRecord(csHttp("text/html", bom ++ utf8Body)))
    assert(p == "<meta charset=\"iso-8859-1\"><p>café</p>" && ok)
    // header charset present: it wins, and the BOM is CONTENT under
    // the header's framing (the pinned priority order)
    val (p2, ok2) = payloadAndOk(csRecord(
      csHttp("text/html; charset=utf-8", bom ++ utf8Body)))
    assert(p2 == "\uFEFF<meta charset=\"iso-8859-1\"><p>café</p>" && ok2)
  }

  test("header lies, meta truth: the header wins with deterministic mojibake (r17)") {
    val body = "<meta charset=\"utf-8\"><p>café</p>".getBytes("UTF-8")
    val (p, ok) = payloadAndOk(csRecord(
      csHttp("text/html; charset=iso-8859-1", body)))
    assert(p == "<meta charset=\"utf-8\"><p>cafÃ©</p>" && ok)
  }

  test("UTF-16LE BOM routes through the framed decode (r17)") {
    val text = "<p>wide café</p>"
    val (p, ok) = payloadAndOk(csRecord(
      csHttp("text/html", ("\uFEFF" + text).getBytes("UTF-16LE"))))
    assert(p == text && ok,
      "UTF-16 payload must decode whole and reframe by the rewritten length")
    val (pBe, okBe) = payloadAndOk(csRecord(
      csHttp("text/html", ("\uFEFF" + text).getBytes("UTF-16BE"))))
    assert(pBe == text && okBe)
  }

  test("meta sniff negatives: beyond 1024 bytes, illegal names, wide claims (r17)") {
    // a meta past the 1024-byte prescan window is ignored -> UTF-8
    val far = ("x" * 1100) + "<meta charset=\"iso-8859-1\">café"
    val (p, _) = payloadAndOk(csRecord(csHttp("text/html",
      far.getBytes("UTF-8"))))
    assert(p.endsWith("café"), "UTF-8 default must apply (meta out of window)")
    // an illegal meta name falls back to UTF-8, never throws
    val bad = "<meta charset=\"-8859-1\"><p>café</p>"
    val (p2, _) = payloadAndOk(csRecord(csHttp("text/html",
      bad.getBytes("UTF-8"))))
    assert(p2 == bad)
    // a meta claiming UTF-16 is self-refuting (readable as ASCII) and
    // maps to UTF-8, the WHATWG rule
    val wide = "<meta charset=\"utf-16le\"><p>café</p>"
    val (p3, _) = payloadAndOk(csRecord(csHttp("text/html",
      wide.getBytes("UTF-8"))))
    assert(p3 == wide)
  }

  test("a length-lying identity record with non-ASCII bytes decodes whole, never throws (r17)") {
    // review #5: the framed routing for multi-byte identity payloads
    // must not turn a malformed WARC length into a task-killing
    // throw — the r15 whole-rest decode (and body_ok=false) is the
    // contract for broken framing; only ENCODED payloads fail loudly
    val payload = "café body".getBytes("UTF-8")
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n")
      .getBytes("US-ASCII") ++ payload
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      s"Content-Length: ${http.length + 999}\r\n\r\n").getBytes("US-ASCII") ++
      http ++ "\r\n\r\n".getBytes("US-ASCII")
    val decoded = Warc.decodeRecord(rec)
    assert(decoded.contains("café body"), "whole-rest decode must survive")
    val ok = Seq(decoded).toDF("rec")
      .select(Warc.bodyOk(col("rec")).as("ok")).as[Boolean].head()
    assert(!ok, "the lying length still fails body_ok")
    // an ENCODED payload with the same lie fails loudly (r16 contract)
    val gz = Warc.gzipBytes(payload)
    val httpGz = ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n")
      .getBytes("US-ASCII") ++ gz
    val recGz = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      s"Content-Length: ${httpGz.length + 999}\r\n\r\n").getBytes("US-ASCII") ++
      httpGz ++ "\r\n\r\n".getBytes("US-ASCII")
    intercept[IllegalArgumentException] { Warc.decodeRecord(recGz) }
  }

  test("every charsetBand leg decodes to the marked page (r17)") {
    val page = "<p>band page body</p>"
    (0L to 11L).foreach { id =>
      val rec = Warc.warcifyBytes(id, Warc.charsetBand(id, page))
      val (p, ok) = payloadAndOk(rec)
      val band = (id % 6).toInt
      val expected = band match {
        case 1 | 2 => "<meta charset=\"iso-8859-1\">" + page + Warc.CharsetMarker
        case 3 => ("<meta charset=\"utf-8\">" + page + Warc.CharsetMarker)
          .replace("é", "Ã©")
        case _ => page + Warc.CharsetMarker
      }
      assert(p == expected, s"band $band payload")
      assert(ok, s"band $band must pass body_ok after the length rewrite")
    }
  }

  test("a truncated record fails body_ok instead of passing silently") {
    val rec = recOf(5L, "<p>full payload body</p>")
    val truncated = rec.substring(0, rec.length - 12)
    val ok = Seq(truncated).toDF("rec")
      .select(Warc.bodyOk(col("rec"))).as[Boolean].head()
    assert(!ok)
  }

  test("a record cut before the header terminator parses to null, never a garbage slice") {
    // review r14 #1: with no CRLFCRLF, a naive locate()+4 slice reads
    // bytes of the version line and can even satisfy a small declared
    // length — the parser must return null body and bodyOk=false
    val rec = recOf(1L, "x") // declared Content-Length: 1
    val headless = rec.substring(0, rec.indexOf("\r\n\r\n"))
    val out = Seq(headless).toDF("rec")
      .select(Warc.bodyOf(col("rec")).as("b"), Warc.bodyOk(col("rec")).as("ok"),
        Warc.targetUri(col("rec")).as("u"))
      .as[(Option[String], Boolean, Option[String])].head()
    assert(out._1.isEmpty && !out._2)
    // with no terminator there is no header BLOCK — every field of a
    // malformed record is null, nothing parses on a guess
    assert(out._3.isEmpty)
  }

  test("header values inside the BODY never reach the parser (block scoping)") {
    // review r14 #2: a WARC response body is an HTTP message that can
    // carry its own Content-Length — with the envelope header intact
    // the parse must use the envelope's value, and with header-block
    // scoping the body line can never be consulted at all
    val payload = "HTTP/1.1 200 OK\r\nContent-Length: 3\r\n\r\nabcdef"
    val rec = recOf(2L, payload)
    val out = Seq(rec).toDF("rec")
      .select(Warc.contentLength(col("rec")).as("n"),
        Warc.bodyOf(col("rec")).as("b"), Warc.bodyOk(col("rec")).as("ok"))
      .as[(Long, String, Boolean)].head()
    assert(out._1 == payload.length.toLong, "must frame with the ENVELOPE length")
    assert(out._2 == payload && out._3)
  }
}
