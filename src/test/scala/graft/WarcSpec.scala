package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Warc, WarcSource}

/** WARC ingestion: authored archives (plain + multi-member gzip, the
  * Common Crawl layout) parse to one row per text capture, request
  * records and non-text payloads skipped, html tag-stripped.
  */
class WarcSpec extends AnyFunSuite with SparkTestBase {

  private def record(warcType: String, url: String, payload: Array[Byte],
                     extra: String = ""): Array[Byte] = {
    val head = s"WARC/1.0\r\nWARC-Type: $warcType\r\nWARC-Target-URI: $url\r\n" +
      s"WARC-Date: 2026-01-02T03:04:05Z\r\n$extra" +
      s"Content-Length: ${payload.length}\r\n\r\n"
    val bos = new ByteArrayOutputStream()
    bos.write(head.getBytes(StandardCharsets.ISO_8859_1))
    bos.write(payload)
    bos.write("\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1))
    bos.toByteArray
  }

  private def httpHtml(html: String): Array[Byte] =
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" + html)
      .getBytes(StandardCharsets.UTF_8)

  private val warcBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(record("request", "http://a.example/page",
      "GET /page HTTP/1.1\r\nHost: a.example\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1)))
    bos.write(record("response", "http://a.example/page",
      httpHtml("<html><h1>Title</h1><p>Body &amp; text.</p></html>")))
    bos.write(record("response", "http://a.example/logo.png",
      "HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\nPNGDATA".getBytes(StandardCharsets.ISO_8859_1)))
    bos.write(record("conversion", "http://b.example/doc",
      "already extracted text".getBytes(StandardCharsets.UTF_8),
      extra = "Content-Type: text/plain\r\n"))
    bos.toByteArray
  }

  test("parseCaptures: responses + conversions kept, requests and binaries skipped") {
    val caps = Warc.parseCaptures(warcBytes).toSeq
    assert(caps.map(_.url) == Seq("http://a.example/page", "http://b.example/doc"))
    assert(caps(0).text == "Title\nBody & text.")
    assert(caps(0).mime == "text/html" && caps(0).captureTime == "2026-01-02T03:04:05Z")
    assert(caps(1).text == "already extracted text" && caps(1).mime == "text/plain")
  }

  test("multi-member gzip (the Common Crawl .warc.gz layout) decodes identically") {
    // one gzip member per record, concatenated — JDK GZIPInputStream reads
    // members sequentially
    val bos = new ByteArrayOutputStream()
    Seq(
      record("response", "http://a.example/page",
        httpHtml("<p>gzipped page</p>")),
      record("conversion", "http://b.example/doc",
        "plain capture".getBytes(StandardCharsets.UTF_8),
        extra = "Content-Type: text/plain\r\n")
    ).foreach { rec =>
      val g = new GZIPOutputStream(bos); g.write(rec); g.finish()
    }
    val caps = Warc.parseCaptures(bos.toByteArray).toSeq
    assert(caps.map(_.text) == Seq("gzipped page", "plain capture"))
  }

  test("distributed scan: one row per capture; WarcSource emits the canonical frame") {
    val dir = tempDir("graft-warc")
    Files.write(dir.resolve("crawl-00000.warc"), warcBytes)
    val df = Warc.readCaptures(spark, dir.toString)
    assert(df.columns.toSeq == Seq("url", "capture_time", "mime", "content", "source"))
    assert(df.count() == 2)

    val docs = WarcSource(dir.toString).load(spark).collect()
    assert(docs.length == 2)
    val byUrl = docs.map(r => r.getAs[String]("source") -> r).toMap
    assert(byUrl("http://a.example/page").getAs[String]("content") == "Title\nBody & text.")
    val meta = byUrl("http://b.example/doc").getAs[Map[String, String]]("metadata")
    assert(meta("mime") == "text/plain" && meta("archive").endsWith("crawl-00000.warc"))
    assert(docs.forall(_.getAs[String]("fingerprint").length == 64))
  }

  test("truncated / malformed archive parses best-effort without failing") {
    val truncated = java.util.Arrays.copyOf(warcBytes, warcBytes.length / 2)
    assert(Warc.parseCaptures(truncated).toSeq.size <= 2) // no throw
    assert(Warc.parseCaptures("not a warc at all".getBytes(StandardCharsets.UTF_8)).toSeq.isEmpty)
    // negative Content-Length ends iteration instead of hanging or throwing
    val neg = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: -1000\r\n\r\n" +
      "garbage").getBytes(StandardCharsets.ISO_8859_1)
    assert(Warc.parseCaptures(neg).toSeq.isEmpty)
    // corrupt gzip tail: the valid leading member still parses
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(record("conversion", "http://b.example/doc",
      "survives".getBytes(StandardCharsets.UTF_8), extra = "Content-Type: text/plain\r\n"))
    g.finish()
    bos.write(Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3)) // truncated second member
    assert(Warc.parseCaptures(bos.toByteArray).toSeq.map(_.text) == Seq("survives"))
  }

  test("oversized records stream past in bounded memory; iteration continues") {
    val bos = new ByteArrayOutputStream()
    bos.write(record("response", "http://big.example/video",
      Array.fill[Byte](2048)('x'))) // over the 1 KiB cap below
    bos.write(record("conversion", "http://b.example/doc",
      "after the giant".getBytes(StandardCharsets.UTF_8),
      extra = "Content-Type: text/plain\r\n"))
    val caps = Warc.parseCaptures(bos.toByteArray, maxRecordBytes = 1024).toSeq
    assert(caps.map(_.text) == Seq("after the giant"))
  }

  test("chunked transfer-encoding bodies are de-chunked") {
    val html = "<p>chunked body text</p>"
    val chunked = f"${html.length}%x\r\n$html\r\n0\r\n\r\n"
    val payload = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n" + chunked).getBytes(StandardCharsets.UTF_8)
    val caps = Warc.parseCaptures(record("response", "http://c.example/x", payload)).toSeq
    assert(caps.map(_.text) == Seq("chunked body text"))
  }

  test("corrupt chunk-size lines (negative / int-overflowing) fall back to the raw body") {
    // negative size: '-5' parses but must not reach out.write
    val neg = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n-5\r\n<p>x</p>\r\n0\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8)
    val negCaps = Warc.parseCaptures(record("response", "http://c.example/neg", neg)).toSeq
    assert(negCaps.size == 1) // no throw; raw body carried through
    // overflowing size: lineEnd + 2 + size wraps Int; Long math must catch it
    val huge = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n7ffffff0\r\nbody\r\n0\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8)
    val hugeCaps = Warc.parseCaptures(record("response", "http://c.example/huge", huge)).toSeq
    assert(hugeCaps.size == 1)
  }

  test("factory binds warc configs with the glob and record-cap knobs") {
    val src = Factory.source(graft.config.ComponentConfig("warc",
      Map("directory" -> "/data/crawl", "max_record_mb" -> 64)))
    assert(src == WarcSource("/data/crawl", "*.warc*", 64 * 1024 * 1024))
    // >= 2048 MiB would overflow Int multiplication: must clamp, not wrap
    val big = Factory.source(graft.config.ComponentConfig("warc",
      Map("directory" -> "/data/crawl", "max_record_mb" -> 4096)))
    assert(big == WarcSource("/data/crawl", "*.warc*", Int.MaxValue))
    assertThrows[graft.config.GraftConfigException](
      Factory.source(graft.config.ComponentConfig("warc", Map.empty)))
    // zero/negative caps would silently skip every record: reject at config
    assertThrows[graft.config.GraftConfigException](
      Factory.source(graft.config.ComponentConfig("warc",
        Map("directory" -> "/data/crawl", "max_record_mb" -> 0))))
  }
}
