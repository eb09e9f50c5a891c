package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{JdbcSource, JsonlSource, LocalFileSource, ObjectStoreSource, WebSource}

/** Sources S1–S5 against real local infrastructure: temp directories,
  * file:// object-store uris, an in-memory Derby database, and a JDK
  * HttpServer (reference behaviors from `yamlpipe/components/sources.py`).
  */
class SourcesSpec extends AnyFunSuite with SparkTestBase {

  test("S1 local_files: one doc per file, empty files skipped, html stripped") {
    val dir = tempDir("graft-local")
    Files.writeString(dir.resolve("a.txt"), "hello world")
    Files.writeString(dir.resolve("b.html"), "<html><p>first</p>\n<p>second</p></html>")
    Files.writeString(dir.resolve("empty.txt"), "   ")
    val out = LocalFileSource(dir.toString).load(spark).collect()
    assert(out.length == 2)
    val byName = out.map(r => (r.getAs[String]("source"), r.getAs[String]("content"))).toMap
    assert(byName.keys.exists(_.endsWith("a.txt")))
    assert(byName.find(_._1.endsWith("a.txt")).get._2 == "hello world")
    assert(byName.find(_._1.endsWith("b.html")).get._2 == "first\nsecond")
    assert(out.forall(_.getAs[String]("fingerprint").length == 64))
  }

  test("S1 local_files: encrypted legacy .doc surfaces extract_note = " +
      "encrypted; clean files carry no note") {
    val dir = tempDir("graft-local-enc")
    // An RC4/CryptoAPI-encrypted Word 97 container: FIB fEncrypted bit
    // 0x0100 set, body past the FIB is ciphertext — planted printable
    // bytes stand in for the runs real ciphertext happens to contain
    // (a fully opaque file scrapes to empty and drops under the
    // reference's empty-skip contract, like any other empty doc).
    val wd = new Array[Byte](1024)
    def u16(o: Int, v: Int): Unit = {
      wd(o) = (v & 0xFF).toByte; wd(o + 1) = ((v >> 8) & 0xFF).toByte
    }
    u16(0, 0xA5EC); u16(2, 0x00C1); u16(0x0A, 0x0200 | 0x0100)
    val junk = "ciphertext-looking run".getBytes(StandardCharsets.ISO_8859_1)
    System.arraycopy(junk, 0, wd, 512, junk.length)
    Files.write(dir.resolve("enc.doc"),
      graft.functions.LegacyOfficeFixtures.cfb("WordDocument" -> wd))
    Files.write(dir.resolve("clean.doc"),
      graft.functions.LegacyOfficeFixtures.word97Doc("Walked text."))
    Files.writeString(dir.resolve("plain.txt"), "plain text")
    val out = LocalFileSource(dir.toString).load(spark).collect()
    val metaOf = out.map(r => (r.getAs[String]("source"),
      r.getAs[Map[String, String]]("metadata"))).toMap
    assert(metaOf.find(_._1.endsWith("enc.doc")).get._2
      .get("extract_note").contains("encrypted"))
    assert(metaOf.find(_._1.endsWith("clean.doc")).get._2.isEmpty)
    assert(metaOf.find(_._1.endsWith("plain.txt")).get._2.isEmpty)
  }

  test("jsonl: one doc per line, id/meta fields, blank+malformed lines skipped") {
    val dir = tempDir("graft-jsonl")
    Files.writeString(dir.resolve("c.jsonl"),
      """{"text":"alpha doc","id":"d1","lang":"en"}
        |
        |{"text":"beta \"quoted\" doc","id":"d2"}
        |not json at all
        |{"text":"   ","id":"blank"}
        |{"id":"no-text"}
        |""".stripMargin)
    Files.writeString(dir.resolve("skip.txt"), """{"text":"wrong ext"}""")
    val out = JsonlSource(dir.toString, idField = Some("id"),
      metaFields = Seq("lang")).load(spark).collect()
    assert(out.length == 2) // blank text, missing text, malformed all dropped
    val bySrc = out.map(r => r.getAs[String]("source") ->
      ((r.getAs[String]("content"), r.getAs[Map[String, String]]("metadata")))).toMap
    val d1 = bySrc.find(_._1.endsWith("c.jsonl#d1")).get._2
    assert(d1 == (("alpha doc", Map("lang" -> "en"))))
    val d2 = bySrc.find(_._1.endsWith("c.jsonl#d2")).get._2
    assert(d2 == (("beta \"quoted\" doc", Map.empty[String, String])))
    assert(out.forall(_.getAs[String]("fingerprint").length == 64))
  }

  test("jsonl strict mode raises a named error on a malformed line") {
    val dir = tempDir("graft-jsonl-strict")
    Files.writeString(dir.resolve("bad.jsonl"),
      "{\"text\":\"ok\"}\n{broken\n")
    val e = intercept[Exception] {
      JsonlSource(dir.toString, strict = true).load(spark).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("graft.JsonlSource: malformed")))
  }

  test("jsonl without idField falls back to a stable content-hash id") {
    val dir = tempDir("graft-jsonl-noid")
    Files.writeString(dir.resolve("x.jsonl"), "{\"text\":\"payload\"}\n")
    val a = JsonlSource(dir.toString).load(spark).collect()(0).getAs[String]("source")
    val b = JsonlSource(dir.toString).load(spark).collect()(0).getAs[String]("source")
    assert(a == b && a.matches(".*x\\.jsonl#[0-9a-f]{12}$"))
  }

  test("S1 glob filter restricts files") {
    val dir = tempDir("graft-glob")
    Files.writeString(dir.resolve("a.txt"), "keep")
    Files.writeString(dir.resolve("b.md"), "skip")
    val out = LocalFileSource(dir.toString, glob = "*.txt").load(spark).collect()
    assert(out.length == 1 && out(0).getAs[String]("content") == "keep")
  }

  test("S1 test_connection raises on a missing directory") {
    assertThrows[IllegalStateException](
      LocalFileSource("/nonexistent-graft-dir").testConnection(spark))
    val dir = tempDir("graft-ok")
    LocalFileSource(dir.toString).testConnection(spark) // no throw
  }

  test("S3 object_store: uri source + etag-style fingerprint without content read") {
    val dir = tempDir("graft-obj")
    Files.writeString(dir.resolve("k1.txt"), "object one")
    val uri = "file://" + dir.toString
    val out = ObjectStoreSource(uri).load(spark).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("source").startsWith("file:"))
    assert(out(0).getAs[Map[String, String]]("metadata").contains("etag"))
    // same (size, mtime) -> same fingerprint; changed content -> changed size -> new fp
    val fp1 = out(0).getAs[String]("fingerprint")
    Files.writeString(dir.resolve("k1.txt"), "object one CHANGED")
    val fp2 = ObjectStoreSource(uri).load(spark).collect()(0).getAs[String]("fingerprint")
    assert(fp1 != fp2)
  }

  test("S4 jdbc: first column = content, rest promoted to metadata, source = dsn") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE articles (body VARCHAR(200), author VARCHAR(50), ts TIMESTAMP)")
    st.execute("INSERT INTO articles VALUES ('first article', 'ann', TIMESTAMP('2024-01-01 00:00:00'))")
    st.execute("INSERT INTO articles VALUES ('second article', 'bob', TIMESTAMP('2024-06-01 00:00:00'))")
    st.close(); conn.close()

    val src = JdbcSource(url, "SELECT body, author, ts FROM articles")
    val out = src.load(spark).collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[String]("content")).toSet == Set("first article", "second article"))
    val meta = out.find(_.getAs[String]("content") == "first article").get
      .getAs[Map[String, String]]("metadata")
    assert(meta("author") == "ann")
    assert(out.forall(_.getAs[String]("source") == "jdbc:derby:memory:graftdb"))
  }

  test("S4 jdbc watermark: predicate composed into the pushed-down query") {
    val url = "jdbc:derby:memory:graftdb"
    val wm = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    val src = JdbcSource(url, "SELECT body, author, ts FROM articles",
      timestampColumn = Some("ts"), watermark = Some(wm))
    assert(src.effectiveQuery.contains("ts > '2024-03-01"))
    val out = src.load(spark).collect()
    assert(out.length == 1 && out(0).getAs[String]("content") == "second article")
  }

  test("S4 jdbc watermark: injection-shaped timestamp column is rejected") {
    val wm = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    for (bad <- Seq("ts > '' OR 1=1 --", "ts; DROP TABLE articles", "ts)", "1ts", "a.b")) {
      val src = JdbcSource("jdbc:derby:memory:graftdb", "SELECT body FROM articles",
        timestampColumn = Some(bad), watermark = Some(wm))
      assertThrows[IllegalArgumentException](src.effectiveQuery)
    }
    // plain identifiers still compose
    val ok = JdbcSource("jdbc:derby:memory:graftdb", "SELECT body FROM articles",
      timestampColumn = Some("updated_at_2"), watermark = Some(wm))
    assert(ok.effectiveQuery.contains("updated_at_2 > '2024-03-01"))
  }

  test("S1 corrupt legacy OLE2 files fail loudly; a real .doc scrapes text") {
    val dir = tempDir("graft-ole2")
    Files.writeString(dir.resolve("ok.txt"), "plain is fine")
    // truncated OLE2 (magic prefix only) — must fail loudly, not mis-decode
    Files.write(dir.resolve("broken.doc"),
      Array[Byte](0xD0.toByte, 0xCF.toByte, 0x11, 0xE0.toByte))
    val e = intercept[Exception](LocalFileSource(dir.toString).load(spark).collect())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    val msgs = chain(e).flatMap(t => Option(t.getMessage))
    assert(msgs.exists(m => m.contains("graft.DocumentExtract") && m.contains("doc")),
      s"expected a named per-format error, got: ${msgs.take(3)}")
    // a structurally valid .doc extracts non-empty text through the scan
    Files.delete(dir.resolve("broken.doc"))
    Files.write(dir.resolve("report.doc"), DocumentExtractSpec.cfbFixture(
      "WordDocument", "Quarterly results improved across all regions."))
    val out = LocalFileSource(dir.toString).load(spark).collect()
    val doc = out.find(_.getAs[String]("source").endsWith("report.doc"))
    assert(doc.exists(_.getAs[String]("content")
      .contains("Quarterly results improved across all regions.")))
  }

  test("T3 wiring: withRunWatermark binds the state watermark into a JDBC source") {
    val src = JdbcSource("jdbc:derby:memory:graftdb",
      "SELECT body, author, ts FROM articles", timestampColumn = Some("ts"))
    val wm = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    val bound = src.withRunWatermark(Some(wm)).asInstanceOf[JdbcSource]
    assert(bound.effectiveQuery.contains("ts > '2024-03-01"))
    // no timestamp column configured -> watermark ignored (full scan)
    val noTs = JdbcSource("jdbc:derby:memory:graftdb", "SELECT body FROM articles")
    assert(noTs.withRunWatermark(Some(wm)).asInstanceOf[JdbcSource].effectiveQuery ==
      "SELECT body FROM articles")
    // non-JDBC sources: no-op passthrough
    val lf = LocalFileSource("/tmp")
    assert(lf.withRunWatermark(Some(wm)) eq lf)
  }

  test("S2 web: fetch + tag strip + line normalize; stateless fingerprint") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val html = "<html><body>\n <h1>Title</h1>\n\n <script>junk()</script>\n <p>body &amp; soul</p>\n</body></html>"
    server.createContext("/page", (ex: com.sun.net.httpserver.HttpExchange) => {
      val bytes = html.getBytes("UTF-8")
      ex.sendResponseHeaders(200, if (ex.getRequestMethod == "HEAD") -1 else bytes.length)
      if (ex.getRequestMethod != "HEAD") ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/page"
      val src = WebSource(url)
      src.testConnection(spark) // HEAD probe
      val out = src.load(spark).collect()
      assert(out.length == 1)
      assert(out(0).getAs[String]("content") == "Title\nbody & soul")
      assert(out(0).getAs[String]("source") == url)
      assert(out(0).getAs[String]("fingerprint") == null)
    } finally server.stop(0)
  }

  test("csv: header skipped, quoted fields round-trip, id/meta, blank text dropped") {
    val dir = tempDir("graft-csv")
    Files.writeString(dir.resolve("c.csv"),
      """text,id,lang
        |alpha doc,d1,en
        |"beta, with ""quotes"" and
        |a newline",d2,
        |   ,blank,en
        |""".stripMargin)
    Files.writeString(dir.resolve("skip.txt"), "text,id,lang\nwrong ext,x,en\n")
    val out = graft.sources.CsvSource(dir.toString, idField = Some("id"),
      metaFields = Seq("lang"), multiLine = true).load(spark).collect()
    assert(out.length == 2) // blank text dropped, skip.txt not globbed
    val bySrc = out.map(r => r.getAs[String]("source") ->
      ((r.getAs[String]("content"), r.getAs[Map[String, String]]("metadata")))).toMap
    val d1 = bySrc.find(_._1.endsWith("c.csv#d1")).get._2
    assert(d1 == (("alpha doc", Map("lang" -> "en"))))
    val d2 = bySrc.find(_._1.endsWith("c.csv#d2")).get._2
    assert(d2 == (("beta, with \"quotes\" and\na newline", Map.empty[String, String])))
    assert(out.forall(_.getAs[String]("fingerprint").length == 64))
  }

  test("csv: TSV delimiter and headerless positional parse") {
    val dir = tempDir("graft-tsv")
    Files.writeString(dir.resolve("t.tsv"), "tab doc\td9\n")
    val out = graft.sources.CsvSource(dir.toString, glob = "*.tsv",
      idField = Some("id"), header = false, delimiter = "\t")
      .load(spark).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("content") == "tab doc")
    assert(out(0).getAs[String]("source").endsWith("t.tsv#d9"))
  }

  test("csv strict parseLines raises a named error on a malformed line") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val lines = Seq("\"unclosed quote,oops").toDF("value")
      .select(col("value"), lit("mem").as("__file"))
    val e = intercept[Exception] {
      graft.sources.CsvSource.parseLines(lines, "text", Some("id"), Nil,
        ",", strict = true).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("graft.CsvSource: malformed")))
  }

  test("columnar source: parquet corpus with pushed predicate, cast meta, blank drop") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = tempDir("graft-colsrc")
    Seq((1L, "alpha doc", "en", 7), (2L, "  ", "fr", 8), (3L, "beta doc", "de", 9))
      .toDF("doc_id", "body", "lang", "score")
      .write.mode("overwrite").parquet(dir.toString)
    val src = graft.sources.ColumnarSource(dir.toString, textField = "body",
      idField = Some("doc_id"), metaFields = Seq("lang", "score"),
      where = Some("doc_id <> 3"))
    val out = src.load(spark).collect()
    assert(out.length == 1) // blank row 2 dropped, row 3 filtered
    assert(out(0).getAs[String]("content") == "alpha doc")
    assert(out(0).getAs[String]("source").endsWith("#1"))
    assert(out(0).getAs[Map[String, String]]("metadata") ==
      Map("lang" -> "en", "score" -> "7")) // non-string meta cast
    // the predicate reaches the scan
    val plan = src.load(spark).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("doc_id"), plan.take(400))
    src.testConnection(spark)
    intercept[IllegalStateException](
      graft.sources.ColumnarSource(dir.toString + "-missing").testConnection(spark))
    intercept[IllegalArgumentException](
      graft.sources.ColumnarSource(dir.toString, format = "avro"))
  }

  test("csv without idField falls back to a stable row-digest id") {
    val dir = tempDir("graft-csv-noid")
    Files.writeString(dir.resolve("x.csv"), "text\npayload\n")
    val a = graft.sources.CsvSource(dir.toString).load(spark)
      .collect()(0).getAs[String]("source")
    val b = graft.sources.CsvSource(dir.toString).load(spark)
      .collect()(0).getAs[String]("source")
    assert(a == b && a.matches(".*x\\.csv#[0-9a-f]{12}$"))
  }
}
