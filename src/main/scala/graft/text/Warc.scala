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

  /** Synthesize a WARC/1.0 response record around a payload. Four
    * layout variants by id band: canonical order, an extra
    * WARC-IP-Address header, Content-Length BEFORE the URI header,
    * and an extra WARC-Concurrent-To header. */
  private[graft] def warcify(docId: Column, payload: Column): Column = {
    val idStr = docId.cast("string")
    val uri = concat(lit("http://src"), (docId % 20).cast("string"),
      lit(".example/doc/"), idStr)
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
    * stream is inherently sequential), via Spark's binaryFile
    * source — one task per file, records streamed out of one
    * counting InputStream per task, never the whole file decoded
    * into a single buffer. Member boundaries come from the gzip
    * framing itself (GZIPInputStream stops at each member's
    * trailer), not from scanning record text — the only correct
    * split for arbitrary bodies. */
  def readWarcGz(spark: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        splitGzipMembers(bytes).zipWithIndex.map { case (rec, i) =>
          (path, i.toLong, rec)
        }
      }
      .toDF("path", "member", "rec")
  }

  /** Split a byte array of CONCATENATED gzip members into one
    * decoded string per member. Java's GZIPInputStream silently
    * auto-chains concatenated members into one stream, so member
    * framing is done by hand: parse each member's gzip header
    * (RFC 1952 — magic, CM=8, FLG-driven optional fields), inflate
    * the deflate body with a raw `Inflater(nowrap)`, and advance by
    * `getBytesRead` + the 8-byte CRC32/ISIZE trailer. Malformed
    * input throws — a crawl reader must fail the file, not emit a
    * silent partial split. */
  private[graft] def splitGzipMembers(bytes: Array[Byte]): Seq[String] = {
    val out = Seq.newBuilder[String]
    var pos = 0
    while (pos < bytes.length) {
      require(pos + 10 <= bytes.length &&
        (bytes(pos) & 0xff) == 0x1f && (bytes(pos + 1) & 0xff) == 0x8b,
        s"bad gzip member magic at offset $pos")
      require(bytes(pos + 2) == 8, "unsupported gzip compression method")
      val flg = bytes(pos + 3) & 0xff
      var i = pos + 10
      if ((flg & 4) != 0) { // FEXTRA: 2-byte LE length + payload
        val xlen = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
        i += 2 + xlen
      }
      if ((flg & 8) != 0) { while (bytes(i) != 0) i += 1; i += 1 } // FNAME
      if ((flg & 16) != 0) { while (bytes(i) != 0) i += 1; i += 1 } // FCOMMENT
      if ((flg & 2) != 0) i += 2 // FHCRC
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(bytes, i, bytes.length - i)
      val body = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        require(n > 0 || inf.finished(), s"truncated gzip member at $pos")
        body.write(buf, 0, n)
      }
      val consumed = inf.getBytesRead.toInt
      inf.end()
      // CRC32 + ISIZE trailer verification (RFC 1952)
      require(i + consumed + 8 <= bytes.length,
        s"truncated gzip trailer at offset ${i + consumed}")
      val data = body.toByteArray
      val crc = new java.util.zip.CRC32
      crc.update(data)
      def le32(off: Int): Long =
        (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
          ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
      require(le32(i + consumed) == crc.getValue,
        s"gzip member CRC mismatch at offset $pos")
      require(le32(i + consumed + 4) == (data.length & 0xffffffffL),
        s"gzip member ISIZE mismatch at offset $pos")
      out += new String(data, "UTF-8")
      pos = i + consumed + 8
    }
    out.result()
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
}
