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
