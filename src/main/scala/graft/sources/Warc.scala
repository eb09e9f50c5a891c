package graft.sources

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (ISO 28500) web-archive ingestion — the Common Crawl container, the
  * de-facto source format for web-scale training corpora. No reference
  * counterpart (the reference fetches ONE url); this is a scale-path
  * extension: crawl dumps are what a 100 TB pipeline actually ingests.
  *
  * Output: one row per captured page —
  * `url, capture_time, mime, content (tag-stripped text), source`.
  *
  * Scale stance: files scan through Spark's distributed binaryFile reader
  * (one task per file); records within a file stream through an iterator
  * over the byte array — the per-record payloads are sliced lazily, never
  * all materialized at once beyond the file bytes the scan already holds.
  * Whole-file and per-record gzip members both decode (Common Crawl's
  * `.warc.gz` is a multi-member stream, one member per record — JDK
  * GZIPInputStream consumes members sequentially). A corrupt record ends
  * that FILE's iteration (best-effort, like real-world WARC tooling), it
  * does not fail the task.
  */
object Warc {

  /** One parsed capture. */
  final case class Capture(url: String, captureTime: String, mime: String, text: String)

  private def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b

  private def gunzipAll(bytes: Array[Byte], maxBytes: Int): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream(math.min(maxBytes, bytes.length * 4))
    val buf = new Array[Byte](65536)
    try {
      var m = in.read(buf)
      while (m >= 0) {
        if (out.size() + m > maxBytes)
          throw new IllegalArgumentException(
            s"graft.Warc: archive inflates past $maxBytes bytes (decompression bomb?)")
        out.write(buf, 0, m)
        m = in.read(buf)
      }
    } finally in.close()
    out.toByteArray
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

  /** Parse all response/conversion captures of one (possibly gzipped) WARC
    * file. Best-effort: returns the captures parsed before the first
    * malformed record.
    */
  def parseCaptures(raw: Array[Byte],
                    maxInflatedBytes: Int = 1 << 30): Seq[Capture] = {
    val bytes = if (isGzip(raw)) gunzipAll(raw, maxInflatedBytes) else raw
    val out = mutable.ArrayBuffer.empty[Capture]
    var pos = indexOf(bytes, "WARC/", 0)
    var ok = pos >= 0
    while (ok) {
      // WARC header block ends at the first blank line.
      val headEnd = indexOf(bytes, "\r\n\r\n", pos)
      if (headEnd < 0) ok = false
      else {
        val head = new String(bytes, pos, headEnd - pos, StandardCharsets.ISO_8859_1)
        val headers = head.linesIterator.flatMap { l =>
          val c = l.indexOf(':')
          if (c <= 0) None
          else Some(l.take(c).trim.toLowerCase(java.util.Locale.ROOT) -> l.drop(c + 1).trim)
        }.toMap
        headers.get("content-length").flatMap(_.toLongOption) match {
          case None => ok = false // mandatory per spec; refuse to guess
          case Some(len) if headEnd + 4 + len > bytes.length => ok = false
          case Some(len) =>
            val bodyStart = headEnd + 4
            val warcType = headers.getOrElse("warc-type", "")
            if (warcType == "response" || warcType == "conversion") {
              val payload = java.util.Arrays.copyOfRange(bytes, bodyStart, bodyStart + len.toInt)
              captureOf(headers, payload).foreach(out += _)
            }
            pos = indexOf(bytes, "WARC/", bodyStart + len.toInt)
            ok = pos >= 0
        }
      }
    }
    out.toSeq
  }

  /** Build a capture from one response/conversion record: skip the HTTP
    * envelope if present, tag-strip html, keep only text-mime payloads.
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
        (ct, java.util.Arrays.copyOfRange(payload, hEnd + 4, payload.length))
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

  private val captureSchema = StructType(Seq(
    StructField("url", StringType),
    StructField("capture_time", StringType),
    StructField("mime", StringType),
    StructField("content", StringType)))

  /** Distributed scan: one row per text capture across every `.warc` /
    * `.warc.gz` under `path`.
    */
  def readCaptures(spark: SparkSession, path: String,
                   glob: String = "*.warc*"): DataFrame = {
    val parse = udf((bytes: Array[Byte]) =>
      parseCaptures(bytes).map(c => (c.url, c.captureTime, c.mime, c.text)))
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(col("path"), explode(parse(col("content"))).as("c"))
      .select(
        col("c._1").as("url"),
        col("c._2").as("capture_time"),
        col("c._3").as("mime"),
        col("c._4").as("content"),
        col("path").as("source"))
  }
}

/** S1-family source over WARC archives: canonical document frame, one
  * document per captured page (`source` = the capture url — the identity
  * downstream dedup/sinks key on, not the archive file).
  */
final case class WarcSource(directory: String, glob: String = "*.warc*") extends GraftSource {

  override def load(spark: SparkSession): DataFrame =
    GraftSource.canonical(Warc.readCaptures(spark, directory, glob).select(
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
