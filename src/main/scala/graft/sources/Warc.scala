package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) web-archive ingestion — the Common Crawl container, the
  * de-facto source format for web-scale training corpora. No reference
  * counterpart (the reference fetches ONE url); this is a scale-path
  * extension: crawl dumps are what a 100 TB pipeline actually ingests.
  *
  * Output: one row per captured page —
  * `url, capture_time, mime, content (tag-stripped text), source`.
  *
  * Scale stance: files scan through Spark's distributed binaryFile reader
  * (one task per file, files up to the reader's 2 GiB limit); records
  * DECOMPRESS AND PARSE STREAMING, one record at a time, through a
  * `flatMap` iterator — peak task memory is the compressed file bytes the
  * scan already holds plus ONE record (per-record cap, default 256 MiB;
  * oversized records — giant media captures — stream past in bounded
  * memory and are dropped), never the inflated archive. Common Crawl's
  * multi-member `.warc.gz` (one gzip member per record) decodes through
  * the JDK's multi-member GZIPInputStream. Malformed input — truncated
  * archive, corrupt gzip tail, negative Content-Length — ends that FILE's
  * iteration best-effort (like real-world WARC tooling); it does not fail
  * the task. Chunked HTTP bodies are de-chunked.
  */
object Warc {

  /** One parsed capture. */
  final case class Capture(url: String, captureTime: String, mime: String, text: String)

  private def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b

  /** Streaming record iterator over one (possibly gzipped) WARC file:
    * decompresses and parses ONE record at a time; any read/format error
    * ends the iteration with the captures parsed so far.
    */
  def parseCaptures(raw: Array[Byte],
                    maxRecordBytes: Int = 256 * 1024 * 1024): Iterator[Capture] = {
    val in: InputStream =
      try {
        val base = new ByteArrayInputStream(raw)
        if (isGzip(raw)) new BufferedInputStream(new java.util.zip.GZIPInputStream(base), 65536)
        else new BufferedInputStream(base, 65536)
      } catch { case scala.util.control.NonFatal(_) => InputStream.nullInputStream() }

    // Early-terminated tasks (limit, take) abandon the iterator before it
    // reaches EOF — close the stream (native Inflater memory) at task end
    // regardless. No-op outside a task (driver-side tests).
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ =>
        try in.close() catch { case scala.util.control.NonFatal(_) => () }))

    new Iterator[Capture] {
      private var nextCapture: Capture = _
      private var done = false

      /** Read one ISO-8859-1 line (terminated by \n, \r stripped); null at EOF. */
      private def readLine(): String = {
        val sb = new java.lang.StringBuilder(96)
        var b = in.read()
        if (b < 0) return null
        while (b >= 0 && b != '\n') {
          if (b != '\r') sb.append(b.toChar)
          b = in.read()
        }
        sb.toString
      }

      private def readFully(len: Int): Array[Byte] = {
        val buf = new Array[Byte](len)
        var off = 0
        while (off < len) {
          val m = in.read(buf, off, len - off)
          if (m < 0) throw new EOFException(s"truncated record: $off of $len bytes")
          off += m
        }
        buf
      }

      /** Consume `len` bytes without materializing them (oversized records:
        * bounded 64 KiB scratch, decompression streams through it).
        */
      private def skipFully(len: Long): Unit = {
        val scratch = new Array[Byte](65536)
        var left = len
        while (left > 0) {
          val m = in.read(scratch, 0, math.min(left, scratch.length.toLong).toInt)
          if (m < 0) throw new EOFException(s"truncated record: $left of $len bytes left")
          left -= m
        }
      }

      /** End this file's iteration and release the stream promptly — the
        * gzip Inflater holds NATIVE memory that otherwise waits for GC.
        */
      private def finish(): Unit = {
        done = true
        try in.close() catch { case scala.util.control.NonFatal(_) => () }
      }

      private def advance(): Unit = {
        nextCapture = null
        try {
          while (nextCapture == null && !done) {
            // scan to the next record header
            var line = readLine()
            while (line != null && !line.startsWith("WARC/")) line = readLine()
            if (line == null) { finish() }
            else {
              val headers = scala.collection.mutable.Map.empty[String, String]
              var h = readLine()
              while (h != null && h.nonEmpty) {
                val c = h.indexOf(':')
                if (c > 0) headers(h.take(c).trim.toLowerCase(java.util.Locale.ROOT)) = h.drop(c + 1).trim
                h = readLine()
              }
              val warcType = headers.getOrElse("warc-type", "")
              val isCapture = warcType == "response" || warcType == "conversion"
              headers.get("content-length").flatMap(_.toLongOption) match {
                case None => finish()                          // mandatory per spec
                case Some(len) if len < 0 => finish()          // corrupt; refuse to guess
                case Some(len) if len > maxRecordBytes || !isCapture =>
                  // skip without materializing: request/metadata/warcinfo
                  // records the pipeline drops, and oversized records
                  // (giant media captures — almost certainly non-text) —
                  // stream past in bounded memory instead of allocating or
                  // failing the task
                  skipFully(len)
                case Some(len) =>
                  nextCapture = captureOf(headers.toMap, readFully(len.toInt)).orNull
              }
            }
          }
        } catch {
          // best-effort: truncated/corrupt input ends THIS file's iteration
          case _: EOFException | _: java.util.zip.ZipException => finish()
        }
      }

      advance()
      override def hasNext: Boolean = nextCapture != null
      override def next(): Capture = {
        val c = nextCapture; advance(); c
      }
    }
  }

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val nb = needle.getBytes(StandardCharsets.ISO_8859_1)
    var i = math.max(0, from)
    val limit = hay.length - nb.length
    while (i <= limit) {
      var j = 0
      while (j < nb.length && hay(i + j) == nb(j)) j += 1
      if (j == nb.length) return i
      i += 1
    }
    -1
  }

  /** De-chunk a Transfer-Encoding: chunked HTTP body; returns the input
    * unchanged if it does not parse as chunks (best-effort).
    */
  private[sources] def dechunk(body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length)
    var i = 0
    try {
      while (i < body.length) {
        val lineEnd = indexOf(body, "\r\n", i)
        if (lineEnd < 0) return body
        val sizeStr = new String(body, i, lineEnd - i, StandardCharsets.ISO_8859_1)
          .split(';').head.trim // chunk extensions ignored
        // Long math: a negative or huge size must not pass the bounds check
        // via Int overflow — corrupt sizes return the input unchanged.
        val size = java.lang.Long.parseLong(sizeStr, 16)
        if (size == 0) return out.toByteArray
        if (size < 0 || lineEnd + 2L + size > body.length) return body
        out.write(body, lineEnd + 2, size.toInt)
        i = lineEnd + 2 + size.toInt + 2 // skip chunk CRLF
      }
      out.toByteArray
    } catch { case _: NumberFormatException => body }
  }

  /** Build a capture from one response/conversion record: skip the HTTP
    * envelope if present, de-chunk, tag-strip html, keep only text-mime
    * payloads.
    */
  private def captureOf(headers: Map[String, String], payload: Array[Byte]): Option[Capture] = {
    val url = headers.getOrElse("warc-target-uri", "")
    val ts = headers.getOrElse("warc-date", "")
    // response records carry an HTTP envelope; conversion records are bare.
    val isHttp = payload.length >= 5 &&
      new String(payload, 0, 5, StandardCharsets.ISO_8859_1).startsWith("HTTP/")
    val (mime, body) =
      if (isHttp) {
        val hEnd = indexOf(payload, "\r\n\r\n", 0)
        if (hEnd < 0) return None
        val httpHead = new String(payload, 0, hEnd, StandardCharsets.ISO_8859_1)
        val ct = "(?im)^content-type:\\s*([^;\\r\\n]+)".r
          .findFirstMatchIn(httpHead).map(_.group(1).trim.toLowerCase(java.util.Locale.ROOT))
          .getOrElse("application/octet-stream")
        val chunked = "(?im)^transfer-encoding:\\s*chunked".r.findFirstIn(httpHead).isDefined
        val rawBody = java.util.Arrays.copyOfRange(payload, hEnd + 4, payload.length)
        (ct, if (chunked) dechunk(rawBody) else rawBody)
      } else {
        (headers.getOrElse("content-type", "text/plain")
          .split(';').head.trim.toLowerCase(java.util.Locale.ROOT), payload)
      }
    if (!mime.startsWith("text/")) None
    else {
      val raw = new String(body, StandardCharsets.UTF_8)
      val text =
        if (mime.startsWith("text/html")) {
          val blocks = raw.replaceAll("(?is)<(script|style)[^>]*>.*?</\\1>", " ")
            .replaceAll("(?i)</(?:p|h[1-6]|div|li|tr|blockquote)>|<br\\s*/?>", "\n")
          graft.functions.DocumentExtract.decodeEntities(
              blocks.replaceAll("<[^>]*>", "")).linesIterator
            .map(_.trim).filter(_.nonEmpty).mkString("\n")
        } else raw.trim
      if (text.isEmpty) None else Some(Capture(url, ts, mime, text))
    }
  }

  /** Distributed scan: one row per text capture across every `.warc` /
    * `.warc.gz` under `path`. `flatMap` consumes the per-file record
    * iterator lazily — captures stream into rows, they are never all
    * materialized per file.
    */
  def readCaptures(spark: SparkSession, path: String,
                   glob: String = "*.warc*",
                   maxRecordBytes: Int = 256 * 1024 * 1024): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        parseCaptures(bytes, maxRecordBytes).map(c => (c.url, c.captureTime, c.mime, c.text, p))
      }
      .toDF("url", "capture_time", "mime", "content", "source")
  }
}

/** S1-family source over WARC archives: canonical document frame, one
  * document per captured page (`source` = the capture url — the identity
  * downstream dedup/sinks key on, not the archive file).
  */
final case class WarcSource(directory: String, glob: String = "*.warc*",
                            maxRecordBytes: Int = 256 * 1024 * 1024) extends GraftSource {

  override def load(spark: SparkSession): DataFrame =
    GraftSource.canonical(Warc.readCaptures(spark, directory, glob, maxRecordBytes).select(
      col("content"),
      col("url").as("source"),
      sha2(col("content"), 256).as("fingerprint"),
      map(lit("capture_time"), col("capture_time"), lit("mime"), col("mime"),
        lit("archive"), col("source"))
        .cast("map<string,string>").as("metadata")))

  override def testConnection(spark: SparkSession): Unit = {
    val p = new org.apache.hadoop.fs.Path(directory)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      throw new IllegalStateException(s"warc path does not exist: $directory")
  }
}
