package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document sources (SURVEY §2.1, reference `yamlpipe/components/sources.py`).
  *
  * Every source produces the canonical document frame:
  * {{{
  *   content     string            -- extracted text
  *   source      string            -- path / url / uri / dsn (consulted by
  *                                    name everywhere downstream: sinks
  *                                    delete-by-source, eval expected_source)
  *   fingerprint string (nullable) -- change-detection hash (sha256 of
  *                                    content; null = not change-tracked)
  *   metadata    map<string,string>-- open-ended promoted metadata
  * }}}
  *
  * Scale stance: file/object sources read through Spark's distributed
  * binaryFile/text readers (one task per file split — never a driver loop);
  * the web source is inherently a driver-side fetch of ONE url (the
  * reference's semantics, `sources.py:118-159`); the JDBC source reads
  * through Spark's JDBC partitioned reader with the incremental watermark
  * composed into the pushed-down query.
  */
trait GraftSource {
  /** Load all (or, with `sinceState`, changed) documents. */
  def load(spark: SparkSession): DataFrame

  /** Cheap health probe; throws on failure (reference `test_connection`,
    * `sources.py:109-115,152-159,224-234,302-308`).
    */
  def testConnection(spark: SparkSession): Unit

  /** Bind the pipeline's run watermark (the reference consults
    * `last_run_timestamp` inside `load_data`, `sources.py:266-272`). Only
    * watermark-capable sources (JDBC) use it; everything else is a no-op.
    */
  def withRunWatermark(wm: Option[java.sql.Timestamp]): GraftSource = this
}

object GraftSource {
  /** Empty metadata column of the canonical type. */
  private[sources] def emptyMeta =
    map().cast("map<string,string>")

  /** Canonicalize: content/source/fingerprint/metadata, empty docs dropped
    * (reference skips whitespace-only documents, `sources.py:94-96`).
    */
  private[sources] def canonical(df: DataFrame): DataFrame =
    df.filter(TextFunctions.nonBlank(col("content")))
      .select(col("content"), col("source"), col("fingerprint"), col("metadata"))
}

/** Extension registry for text extraction — the explicit form of the
  * reference's `unstructured.partition` format dispatch
  * (`sources.py:92-93`). Text formats extract natively inside the
  * distributed scan; DOCUMENT formats (pdf/docx/pptx/xlsx/odt/epub/rtf,
  * plus best-effort OLE2 scrapes of legacy doc/ppt/xls) extract through
  * the JDK-only [[graft.functions.DocumentExtract]] parsers — a corrupt
  * or non-matching container still FAILS LOUDLY with a named error
  * instead of silently mis-decoding its bytes as UTF-8; extensions not in
  * the registry decode as plain text (the reference's sniffing fallback).
  */
object TextExtractors {
  sealed trait Handling
  /** Decode bytes as UTF-8 text verbatim. */
  case object Plain extends Handling
  /** Strip tags + per-line normalize. */
  case object Html extends Handling
  /** Parse the container via [[graft.functions.DocumentExtract]]. */
  case object Document extends Handling
  /** Needs a real parser that is not available offline — fails loudly. */
  case object Unsupported extends Handling

  val registry: Map[String, Handling] = Map(
    "txt" -> Plain, "text" -> Plain, "md" -> Plain, "markdown" -> Plain,
    "log" -> Plain, "csv" -> Plain, "tsv" -> Plain, "json" -> Plain,
    "jsonl" -> Plain, "xml" -> Plain, "yaml" -> Plain, "yml" -> Plain,
    "html" -> Html, "htm" -> Html,
    "pdf" -> Document, "docx" -> Document, "pptx" -> Document,
    "xlsx" -> Document, "epub" -> Document, "rtf" -> Document,
    // macro-enabled (m) / template (t) OOXML: same zip layout
    "docm" -> Document, "dotx" -> Document, "dotm" -> Document,
    "pptm" -> Document, "potx" -> Document, "potm" -> Document,
    "xlsm" -> Document, "xltx" -> Document, "xltm" -> Document,
    "odt" -> Document, "ods" -> Document, "odp" -> Document,
    "ott" -> Document, "ots" -> Document, "otp" -> Document,
    "odg" -> Document,
    "eml" -> Document, "mbox" -> Document,
    "ipynb" -> Document, "srt" -> Document, "vtt" -> Document,
    "tex" -> Document, "latex" -> Document,
    "doc" -> Document, "ppt" -> Document, "xls" -> Document,
    // Containers-of-documents fail LOUDLY here instead of mis-decoding
    // their bytes as UTF-8: route them through [[ArchiveSource]] (the
    // named error says so). 7z/rar have no offline decoder at all.
    "zip" -> Unsupported, "tar" -> Unsupported, "gz" -> Unsupported,
    "tgz" -> Unsupported, "bz2" -> Unsupported, "xz" -> Unsupported,
    "zst" -> Unsupported, "lz4" -> Unsupported, "sz" -> Unsupported,
    "snappy" -> Unsupported, "7z" -> Unsupported, "rar" -> Unsupported)

  private[sources] def extsOf(h: Handling): Seq[String] =
    registry.collect { case (ext, `h`) => ext }.toSeq

  /** The no-offline-decoder extension list, for sources that need to SKIP
    * such members rather than hit [[extractColumn]]'s loud error (the
    * archive source's nested-member case).
    */
  private[sources] val unsupportedExts: Seq[String] = extsOf(Unsupported)

  /** The registry as one dispatching Column over (path, raw bytes) — shared
    * by every file-shaped source so local dirs and object stores extract
    * identically. One [[graft.functions.DocumentExtract]] UDF call per FILE
    * for container formats; everything else stays a codegen'd expression.
    */
  private[sources] def extractColumn(pathCol: org.apache.spark.sql.Column,
                                     bytesCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val text = decode(bytesCol, "UTF-8")
    val ext = lower(regexp_extract(pathCol, "\\.([A-Za-z0-9]+)$", 1))
    val extractDoc = udf(graft.functions.DocumentExtract.extract _)
    when(ext.isin(extsOf(Unsupported): _*),
        raise_error(concat(
          lit("graft.TextExtractors: no offline text extractor for format '"), ext,
          lit("' ("), pathCol,
          lit("); route archives through the 'archive' source, binaries " +
            "through Multimodal.readBinaryDir, or add a TextExtractors entry"))))
      .when(ext.isin(extsOf(Document): _*), extractDoc(ext, pathCol, bytesCol))
      .when(ext.isin(extsOf(Html): _*),
        TextFunctions.normalizeLines(TextFunctions.stripHtml(text)))
      .otherwise(text)
  }

  /** Per-file extraction note (null = clean): the legacy-OLE2
    * fallback-reason contract ([[graft.functions.DocumentExtract
    * .extractNote]] — "encrypted" / "pre-97" / "damaged") as a Column,
    * so S1 can report scraped-not-walked files by CLASS. Non-legacy
    * extensions never invoke the UDF (the `when` guard keeps the probe
    * off every other file's path).
    */
  private[sources] def extractNoteColumn(pathCol: org.apache.spark.sql.Column,
                                         bytesCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val ext = lower(regexp_extract(pathCol, "\\.([A-Za-z0-9]+)$", 1))
    val note = udf(graft.functions.DocumentExtract.extractNote _)
    when(ext.isin("doc", "ppt", "xls"), note(ext, pathCol, bytesCol))
      .otherwise(lit(null).cast("string"))
  }
}

/** S1 — local directory scan (`sources.py:52-115`): glob files, extract
  * text per extension, one document per file, `source` = absolute path,
  * fingerprint = sha256 of the content. Unlike the reference (driver-side
  * `unstructured.partition` per file), extraction runs inside the
  * distributed binaryFile scan. Format dispatch is the explicit
  * [[TextExtractors.registry]]: document containers parse through
  * [[graft.functions.DocumentExtract]] (one UDF call per FILE — byte-level
  * zip/deflate parsing has no Column equivalent, and per-file granularity
  * keeps it off any per-row hot path); formats with no offline parser
  * raise a named error per file (route real binaries through
  * `Multimodal.readBinaryDir`).
  */
final case class LocalFileSource(directory: String, glob: String = "*") extends GraftSource {

  override def load(spark: SparkSession): DataFrame = {
    val raw = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(directory)
    GraftSource.canonical(raw.select(
      TextExtractors.extractColumn(col("path"), col("content")).as("content"),
      col("path").as("source"),
      // Fingerprint over the RAW bytes: identical for text formats'
      // round-trippable UTF-8, and well-defined (no lossy decode) for
      // binary document containers.
      sha2(col("content"), 256).as("fingerprint"),
      // Legacy-OLE2 fallback reason surfaces per file: an encrypted or
      // pre-97 .doc that degraded to the printable-run scrape carries
      // metadata["extract_note"] = "encrypted" / "pre-97" / "damaged",
      // so a crawl can count (and re-route) those classes separately.
      map_filter(
        map(lit("extract_note"),
          TextExtractors.extractNoteColumn(col("path"), col("content"))),
        (_, v) => v.isNotNull).cast("map<string,string>").as("metadata")))
  }

  override def testConnection(spark: SparkSession): Unit = {
    val p = new org.apache.hadoop.fs.Path(directory)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p) || !fs.getFileStatus(p).isDirectory)
      throw new IllegalStateException(s"directory does not exist: $directory")
  }
}

/** JSONL corpus source — one JSON document per line, the de-facto LLM
  * training-data interchange layout (The Pile / RedPajama / Dolma style).
  * Not in the reference's registry (its file source is one-document-per-
  * FILE, `sources.py:52-115`); this is a training-data-pipeline extension.
  *
  * Reads through Spark's distributed splittable line reader (scales with
  * file count x line ranges, never a driver loop) and parses with
  * `from_json` — codegen'd, no UDF. `textField` becomes the content;
  * `idField` (when set, falling back to a content hash) suffixes the file
  * path into a stable per-document `source`; `metaFields` are carried into
  * the metadata map (null-valued fields omitted). Documents with missing/
  * blank text are dropped by the canonical contract.
  *
  * Malformed lines: `strict = true` raises a named error identifying file
  * and line prefix (one bad line fails the job loudly); default skips them
  * (the crawl-scale posture, same as [[WarcSource]]'s oversized-record
  * skip). Blank lines are always ignored.
  */
final case class JsonlSource(directory: String, glob: String = "*.jsonl",
                             textField: String = "text",
                             idField: Option[String] = None,
                             metaFields: Seq[String] = Nil,
                             strict: Boolean = false) extends GraftSource {

  override def load(spark: SparkSession): DataFrame = {
    val raw = spark.read.option("pathGlobFilter", glob).text(directory)
    JsonlSource.parseLines(
      raw.select(col("value"), input_file_name().as("__file")),
      textField, idField, metaFields, strict)
  }

  override def testConnection(spark: SparkSession): Unit = {
    val p = new org.apache.hadoop.fs.Path(directory)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p) || !fs.getFileStatus(p).isDirectory)
      throw new IllegalStateException(s"directory does not exist: $directory")
  }
}

object JsonlSource {
  /** The parse half of the source, over any `(value, __file)` line frame —
    * pure Column expressions, shared by `load` and the hermetic gate.
    */
  private[graft] def parseLines(lines: DataFrame, textField: String,
                                idField: Option[String],
                                metaFields: Seq[String],
                                strict: Boolean): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val fields = (Seq(textField) ++ idField ++ metaFields).distinct
    // PERMISSIVE from_json yields a struct of nulls for malformed input
    // (never a null struct) — malformed detection needs the corrupt-record
    // column.
    val Corrupt = "__corrupt"
    val schema = StructType(
      fields.map(f => StructField(f, StringType)) :+ StructField(Corrupt, StringType))
    val parsed = lines
      .filter(TextFunctions.nonBlank(col("value")))
      .select(col("value"), col("__file"),
        from_json(col("value"), schema,
          Map("columnNameOfCorruptRecord" -> Corrupt)).as("__j"))
    val checked =
      if (strict)
        parsed.withColumn("__j",
          when(col("__j").getField(Corrupt).isNotNull, raise_error(concat(
            lit("graft.JsonlSource: malformed JSONL line in "), col("__file"),
            lit(": "), substring(col("value"), 1, 80))))
            .otherwise(col("__j")))
      else parsed.filter(col("__j").getField(Corrupt).isNull)
    val content = col("__j").getField(textField)
    val docId = idField match {
      case Some(f) => coalesce(col("__j").getField(f),
        substring(sha2(col("value"), 256), 1, 12))
      case None => substring(sha2(col("value"), 256), 1, 12)
    }
    val meta =
      if (metaFields.isEmpty) GraftSource.emptyMeta
      else map_filter(
        map(metaFields.flatMap(f =>
          Seq(lit(f), col("__j").getField(f))): _*),
        (_, v) => v.isNotNull).cast("map<string,string>")
    GraftSource.canonical(checked.select(
      content.as("content"),
      concat(col("__file"), lit("#"), docId).as("source"),
      sha2(content, 256).as("fingerprint"),
      meta.as("metadata")))
  }
}

/** Scale-path extension beside [[JsonlSource]]: CSV/TSV corpora — the other
  * ubiquitous tabular text interchange (reference capability:
  * `unstructured.partition` accepts csv, `sources.py:92-93`). Columns are
  * POSITIONAL against the declared field order `(textField, idField?,
  * metaFields...)`; `header = true` skips a leading header row per file.
  *
  * `load` goes through Spark's native distributed CSV reader; `strict =
  * true` maps to FAILFAST, default drops malformed rows (DROPMALFORMED),
  * mirroring the JSONL posture. Default parsing is line-splittable (input
  * splits parallelize within a file — the crawl-scale posture); corpora
  * with NEWLINES INSIDE QUOTED FIELDS need `multiLine = true`, which
  * parses whole files (parallelism across files only — Spark's own
  * trade-off, not ours). [[CsvSource.parseLines]] is the hermetic
  * single-line variant (same parser via `from_csv`) powering the
  * `csv_parse` gate.
  */
final case class CsvSource(directory: String, glob: String = "*.csv",
                           textField: String = "text",
                           idField: Option[String] = None,
                           metaFields: Seq[String] = Nil,
                           header: Boolean = true,
                           delimiter: String = ",",
                           multiLine: Boolean = false,
                           strict: Boolean = false) extends GraftSource {

  override def load(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val fields = (Seq(textField) ++ idField ++ metaFields).distinct
    val schema = StructType(fields.map(f => StructField(f, StringType)))
    val raw = spark.read.schema(schema)
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("multiLine", multiLine.toString)
      // RFC 4180 doubled-quote escaping ("" inside a quoted field), not
      // Spark's backslash default — real CSV corpora are RFC-shaped.
      .option("escape", "\"")
      .option("mode", if (strict) "FAILFAST" else "DROPMALFORMED")
      .option("pathGlobFilter", glob)
      .csv(directory)
      .select(col("*"), input_file_name().as("__file"))
    CsvSource.canonicalize(raw, textField, idField, metaFields, delimiter)
  }

  override def testConnection(spark: SparkSession): Unit = {
    val p = new org.apache.hadoop.fs.Path(directory)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p) || !fs.getFileStatus(p).isDirectory)
      throw new IllegalStateException(s"directory does not exist: $directory")
  }
}

object CsvSource {
  /** Single-line parse half over any `(value, __file)` frame — `from_csv`
    * with the positional schema, PERMISSIVE + corrupt-record detection,
    * shared semantics with `load`'s native reader. Blank lines ignored.
    */
  private[graft] def parseLines(lines: DataFrame, textField: String,
                                idField: Option[String],
                                metaFields: Seq[String],
                                delimiter: String,
                                strict: Boolean): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val fields = (Seq(textField) ++ idField ++ metaFields).distinct
    val Corrupt = "__corrupt"
    val schema = StructType(
      fields.map(f => StructField(f, StringType)) :+ StructField(Corrupt, StringType))
    val parsed = lines
      .filter(TextFunctions.nonBlank(col("value")))
      .select(col("__file"),
        from_csv(col("value"), schema,
          Map("sep" -> delimiter, "escape" -> "\"", "mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> Corrupt)).as("__j"))
    val checked =
      if (strict)
        parsed.withColumn("__j",
          when(col("__j").getField(Corrupt).isNotNull, raise_error(concat(
            lit("graft.CsvSource: malformed CSV line in "), col("__file"),
            lit(": "), substring(col("__j").getField(Corrupt), 1, 80))))
            .otherwise(col("__j")))
      else parsed.filter(col("__j").getField(Corrupt).isNull)
    canonicalize(
      checked.select(
        (fields.map(f => col("__j").getField(f).as(f)) :+ col("__file")): _*),
      textField, idField, metaFields, delimiter)
  }

  /** Shared canonical projection over a parsed `(fields..., __file)` frame. */
  private def canonicalize(parsed: DataFrame, textField: String,
                           idField: Option[String], metaFields: Seq[String],
                           delimiter: String): DataFrame = {
    val fields = (Seq(textField) ++ idField ++ metaFields).distinct
    val content = col(textField)
    val rowDigest = sha2(
      concat_ws(delimiter, fields.map(f => coalesce(col(f), lit(""))): _*), 256)
    val docId = idField match {
      case Some(f) => coalesce(col(f), substring(rowDigest, 1, 12))
      case None => substring(rowDigest, 1, 12)
    }
    val meta =
      if (metaFields.isEmpty) GraftSource.emptyMeta
      else map_filter(
        map(metaFields.flatMap(f => Seq(lit(f), col(f))): _*),
        (_, v) => v.isNotNull).cast("map<string,string>")
    GraftSource.canonical(parsed.select(
      content.as("content"),
      concat(col("__file"), lit("#"), docId).as("source"),
      sha2(content, 256).as("fingerprint"),
      meta.as("metadata")))
  }
}

/** Scale-path extension beside [[JsonlSource]]/[[CsvSource]]: a columnar
  * corpus already materialized as parquet/ORC tables (the usual handoff
  * format BETWEEN pipeline stages at 100 TB — schema'd, splittable,
  * predicate-pushdown-capable). Named columns rather than positions;
  * non-string id/meta columns are cast to string for the canonical
  * metadata map. `where` pushes an optional SQL predicate INTO the scan
  * (partition pruning / PushedFilters — the reason this source exists
  * instead of "just read it yourself").
  */
final case class ColumnarSource(path: String, format: String = "parquet",
                                textField: String = "text",
                                idField: Option[String] = None,
                                metaFields: Seq[String] = Nil,
                                where: Option[String] = None) extends GraftSource {
  require(Seq("parquet", "orc").contains(format),
    s"unsupported columnar format '$format' (expected parquet or orc)")

  override def load(spark: SparkSession): DataFrame = {
    val raw0 = spark.read.format(format).load(path)
    val raw = where.fold(raw0)(raw0.filter)
    val content = col(textField).cast("string")
    val docId = idField match {
      case Some(f) => col(f).cast("string")
      case None => substring(sha2(content.cast("binary"), 256), 1, 12)
    }
    val meta =
      if (metaFields.isEmpty) GraftSource.emptyMeta
      else map_filter(
        map(metaFields.flatMap(f => Seq(lit(f), col(f).cast("string"))): _*),
        (_, v) => v.isNotNull).cast("map<string,string>")
    GraftSource.canonical(raw.select(
      content.as("content"),
      concat(lit(path), lit("#"), docId).as("source"),
      sha2(content.cast("binary"), 256).as("fingerprint"),
      meta.as("metadata")))
  }

  override def testConnection(spark: SparkSession): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      throw new IllegalStateException(s"path does not exist: $path")
  }
}

/** S2 — single-URL web source (`sources.py:118-159`): driver-side HTTP GET
  * with a desktop UA and 10s timeout, HTML tag strip, per-line normalize.
  * Stateless — no change detection (`sources.py:149-150`), so fingerprint
  * is null.
  */
final case class WebSource(url: String,
                           timeoutSeconds: Int = 10,
                           headTimeoutSeconds: Int = 5) extends GraftSource {

  private val UserAgent =
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0 Safari/537.36"

  private def request(method: String, timeoutS: Int): java.net.http.HttpResponse[String] = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutS))
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(timeoutS))
      .header("User-Agent", UserAgent)
      .method(method, java.net.http.HttpRequest.BodyPublishers.noBody())
      .build()
    client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
  }

  override def load(spark: SparkSession): DataFrame = {
    val resp = request("GET", timeoutSeconds)
    if (resp.statusCode() >= 400)
      throw new IllegalStateException(s"GET $url -> HTTP ${resp.statusCode()}")
    import spark.implicits._
    val raw = Seq((resp.body(), url)).toDF("html", "source")
    GraftSource.canonical(raw.select(
      TextFunctions.normalizeLines(TextFunctions.stripHtml(col("html"))).as("content"),
      col("source"),
      lit(null).cast("string").as("fingerprint"),
      GraftSource.emptyMeta.as("metadata")))
  }

  override def testConnection(spark: SparkSession): Unit = {
    val resp = request("HEAD", headTimeoutSeconds)
    if (resp.statusCode() >= 400)
      throw new IllegalStateException(s"HEAD $url -> HTTP ${resp.statusCode()}")
  }
}

/** S3 — object-store scan (`sources.py:162-234`): list objects under a
  * prefix, read changed ones, `source` = the full object uri. Expressed
  * over the Hadoop FileSystem API, so the same code serves s3a://, file://,
  * hdfs://, abfs:// — the scheme picks the connector. The reference's ETag
  * change detection becomes a fingerprint of (length, modification time) —
  * the same cheap no-read-needed semantics an ETag gives — exposed in
  * `metadata("etag")` too. Content extraction shares
  * [[TextExtractors.extractColumn]] with the local source (the reference
  * UTF-8-decodes only, `sources.py:200-203` — a bucket of pdfs would be
  * mojibake; the registry dispatch strictly dominates).
  */
final case class ObjectStoreSource(uriPrefix: String, glob: String = "*") extends GraftSource {

  override def load(spark: SparkSession): DataFrame = {
    val raw = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(uriPrefix)
    GraftSource.canonical(raw.select(
      TextExtractors.extractColumn(col("path"), col("content")).as("content"),
      col("path").as("source"),
      // ETag-equivalent: identity of (size, mtime) — no content read needed
      // to test for change, mirroring `sources.py:184-188`.
      sha2(concat_ws(":", col("length"), col("modificationTime").cast("long")), 256)
        .as("fingerprint"),
      map(lit("etag"),
        concat_ws(":", col("length"), col("modificationTime").cast("long")))
        .cast("map<string,string>").as("metadata")))
  }

  override def testConnection(spark: SparkSession): Unit = {
    val p = new org.apache.hadoop.fs.Path(uriPrefix)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      throw new IllegalStateException(s"object-store prefix does not exist: $uriPrefix")
  }
}

/** S4 — JDBC query source (`sources.py:237-308`). Contract preserved:
  *  - a configured SQL query is executed server-side;
  *  - incremental watermark: when `watermark` is set and `timestampColumn`
  *    configured, `<tsCol> > <watermark>` is composed INTO the pushed-down
  *    query (the reference string-concats it, `sources.py:266-272`; we
  *    compose a parenthesized subquery — same predicate, injection-safe);
  *  - FIRST column of the result = content, remaining columns promoted to
  *    metadata (`sources.py:284-288`);
  *  - `source` is overwritten with a dsn-style identifier
  *    (`sources.py:289-291`).
  */
final case class JdbcSource(jdbcUrl: String,
                            query: String,
                            timestampColumn: Option[String] = None,
                            watermark: Option[java.sql.Timestamp] = None,
                            properties: Map[String, String] = Map.empty) extends GraftSource {

  private def dsn: String = {
    // jdbc:derby:memory:db;... -> keep scheme+path, drop credentials
    jdbcUrl.split(';').head
  }

  override def withRunWatermark(wm: Option[java.sql.Timestamp]): GraftSource =
    if (timestampColumn.isDefined && wm.isDefined) copy(watermark = wm) else this

  private[graft] def effectiveQuery: String = (timestampColumn, watermark) match {
    case (Some(tsCol), Some(wm)) =>
      // Identifier allowlist: the column name is config-provided, so a
      // hostile/typo'd value must not splice SQL into the pushed-down query.
      // The watermark side is safe by construction (java.sql.Timestamp
      // renders digits, '-', ':', '.', ' ' only).
      require(tsCol.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"timestampColumn must be a plain SQL identifier, got: '$tsCol'")
      s"SELECT * FROM ($query) graft_q WHERE $tsCol > '${wm.toString}'"
    case _ => query
  }

  override def load(spark: SparkSession): DataFrame = {
    val props = new java.util.Properties()
    properties.foreach { case (k, v) => props.setProperty(k, v) }
    val df = spark.read.jdbc(jdbcUrl, s"(${effectiveQuery}) graft_src", props)
    val cols = df.columns
    require(cols.nonEmpty, "JDBC query returned no columns")
    val contentCol = cols.head
    val metaCols = cols.tail
    // Lowercase metadata keys: JDBC engines disagree on identifier case
    // (Derby uppercases, Postgres lowercases); the reference sees Postgres'
    // lowercase names.
    val metaEntries = metaCols.flatMap(c =>
      Seq(lit(c.toLowerCase(java.util.Locale.ROOT)), col(c).cast("string")))
    val meta = if (metaEntries.isEmpty) GraftSource.emptyMeta
               else map(metaEntries.toIndexedSeq: _*).cast("map<string,string>")
    GraftSource.canonical(df.select(
      col(contentCol).cast("string").as("content"),
      lit(dsn).as("source"),
      sha2(col(contentCol).cast("string"), 256).as("fingerprint"),
      meta.as("metadata")))
  }

  override def testConnection(spark: SparkSession): Unit = {
    val conn = java.sql.DriverManager.getConnection(jdbcUrl,
      properties.getOrElse("user", ""), properties.getOrElse("password", ""))
    try { val st = conn.createStatement(); try st.execute("SELECT 1 FROM (VALUES (1)) t(x)") finally st.close() }
    finally conn.close()
  }
}
