package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, ZipEntry, ZipInputStream}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Archive expansion for crawl-scale ingest: a single input FILE that is
  * itself a container of many documents (`.tar`, `.tar.gz`/`.tgz`, `.zip`,
  * single-member `.gz`) expands into its leaf entries, recursing into
  * nested archives with `outer!inner` entry naming.
  *
  * The reference ingests one document per file (`sources.py:52-115`); at
  * 100 TB the corpus usually ARRIVES as archives (site dumps, code
  * tarballs, batch exports), so expansion is a first-class S1 capability
  * here: it runs inside the distributed binaryFile scan — one flatMap per
  * archive file, entries fan out as ordinary rows that the existing
  * [[TextExtractors]] registry then dispatches by entry extension.
  *
  * Zero-dependency walkers, matching the repo's codec discipline
  * (SCALE.md "LZW EarlyChange" lesson — every format here is pinned in
  * `ArchiveExpandSpec` against an independent implementation or a
  * hand-packed golden byte layout, not only the in-repo fixture writer):
  *
  *  - tar: POSIX ustar 512-byte headers — name (0,100), octal size
  *    (124,12), checksum (148,8) VALIDATED (header summed with the
  *    checksum field as spaces), typeflag (156), prefix (345,155) joined
  *    with `/`, plus the GNU `L` long-name extension (data block carries
  *    the next entry's path) and pax `x` extended-header `path=` records
  *    (POSIX.1-2001). Pax `g` globals and non-file typeflags are skipped
  *    as data (their size field honored). End = two consecutive zero
  *    blocks or end-of-bytes.
  *  - gzip: JDK Inflater via multi-member [[GZIPInputStream]] (the
  *    `.warc.gz` convention — see [[Warc]]); a corrupt tail fails loudly.
  *  - bzip2 / xz / zstd: commons-compress decompressors (already on
  *    Spark's classpath backing the Hadoop/Parquet codecs) — `.tar.bz2`
  *    (Wikipedia dumps), `.tar.xz` (source drops), `.tar.zst` (modern
  *    crawl corpora), multi-member/multi-frame included.
  *  - zip: JDK [[ZipInputStream]] stream walk (no central directory
  *    required, mirrors [[graft.functions.DocumentExtract]]'s container
  *    reader).
  *
  * Every byte produced across one archive's WHOLE expansion (including
  * nested members) counts against a single decompression-bomb budget
  * ([[MaxExpandedBytes]]); entry fan-out is capped by [[MaxEntries]] and
  * nesting by `maxDepth` — a crafted 42.zip-style bomb fails loudly per
  * FILE instead of OOMing the executor.
  */
object ArchiveExpand {

  /** Total decompressed bytes allowed across one archive's full (nested)
    * expansion. (var so the spec can exercise the guard cheaply.)
    */
  private[graft] var MaxExpandedBytes: Long = 256L * 1024 * 1024

  /** Leaf-entry fan-out cap across one archive's full expansion. */
  private[graft] var MaxEntries: Int = 100000

  /** Compressed-container suffix → (codec, strip length). gzip decodes
    * through the JDK; bzip2/xz/zstd through commons-compress (already on
    * Spark's classpath — it backs Hadoop/Parquet codecs), covering the
    * wild dump formats: Wikipedia ships `.bz2`, kernel/source drops
    * `.tar.xz`, modern crawl corpora `.zst`.
    */
  private val Codecs: Seq[(String, String)] = Seq(
    ".gz" -> "gzip", ".bz2" -> "bzip2", ".xz" -> "xz", ".zst" -> "zstd",
    // the Hadoop-ecosystem block codecs, FRAMED container flavors
    // (`.lz4` = lz4frame CLI output, `.sz`/`.snappy` = framed snappy)
    ".lz4" -> "lz4", ".sz" -> "snappy", ".snappy" -> "snappy")
  private val TarShorthand: Map[String, String] = Map(
    ".tgz" -> "gzip", ".tbz2" -> "bzip2", ".tbz" -> "bzip2",
    ".txz" -> "xz", ".tzst" -> "zstd")

  /** Is `name` an archive this object can expand? */
  def isArchive(name: String): Boolean = {
    val n = name.toLowerCase(java.util.Locale.ROOT)
    n.endsWith(".tar") || n.endsWith(".zip") ||
      Codecs.exists { case (suf, _) => n.endsWith(suf) } ||
      TarShorthand.keys.exists(n.endsWith)
  }

  /** Expand one archive file into its leaf entries, recursing into nested
    * archives up to `maxDepth` containers deep. Entry names of nested
    * members are `outer!inner` (the JDK jar-URL convention). Non-archive
    * payloads pass through as single leaves; a non-archive `name` returns
    * the input itself as its only leaf.
    */
  def expand(name: String, bytes: Array[Byte], maxDepth: Int = 3): Seq[(String, Array[Byte])] = {
    val budget = new Budget(MaxExpandedBytes, MaxEntries, name)
    expandInto(name, bytes, maxDepth, budget)
  }

  /** Shared bomb budget threaded through one archive's whole expansion. */
  private final class Budget(var bytesLeft: Long, var entriesLeft: Int, val root: String) {
    def charge(n: Long, at: String): Unit = {
      bytesLeft -= n
      if (bytesLeft < 0)
        throw new IllegalArgumentException(
          s"graft.ArchiveExpand: '$root' expands past $MaxExpandedBytes bytes at '$at' (decompression bomb?)")
    }
    def leaf(at: String): Unit = {
      entriesLeft -= 1
      if (entriesLeft < 0)
        throw new IllegalArgumentException(
          s"graft.ArchiveExpand: '$root' exceeds $MaxEntries entries at '$at'")
    }
  }

  private def expandInto(name: String, bytes: Array[Byte], depth: Int,
                         budget: Budget): Seq[(String, Array[Byte])] = {
    val n = name.toLowerCase(java.util.Locale.ROOT)
    def nested(entries: Seq[(String, Array[Byte])]): Seq[(String, Array[Byte])] =
      entries.flatMap { case (en, eb) =>
        if (depth > 1 && isArchive(en))
          expandInto(en, eb, depth - 1, budget).map { case (in, ib) => (s"$en!$in", ib) }
        else { budget.leaf(en); Seq(en -> eb) }
      }
    val compressedTar = Codecs.collectFirst {
      case (suf, codec) if n.endsWith(".tar" + suf) => codec
    }.orElse(TarShorthand.collectFirst { case (suf, codec) if n.endsWith(suf) => codec })
    val singleMember = Codecs.collectFirst {
      case (suf, codec) if n.endsWith(suf) => (suf, codec)
    }
    if (compressedTar.isDefined)
      // decompress() already charged every produced byte — charging each
      // entry again in tarEntries would double-bill the budget per
      // compression layer (a legit ~130 MB .tar.gz tripping the 256 MB cap)
      nested(tarEntries(decompress(compressedTar.get, bytes, budget, name),
        budget, name, chargeData = false))
    else if (n.endsWith(".tar")) nested(tarEntries(bytes, budget, name))
    else if (n.endsWith(".zip")) nested(zipEntriesBytes(bytes, budget, name))
    else if (singleMember.isDefined) {
      // single-member convention: foo.txt.gz -> leaf "foo.txt"
      val (suf, codec) = singleMember.get
      val inner = name.substring(0, name.length - suf.length)
      val stripped = inner.substring(inner.lastIndexOf('/') + 1)
      nested(Seq(stripped -> decompress(codec, bytes, budget, name)))
    } else { budget.leaf(name); Seq(name -> bytes) }
  }

  // ------------------------------------------------------------ codecs

  /** Decompress one (possibly multi-member/multi-frame) compressed stream,
    * charging the shared bomb budget. Truncated or corrupt input fails
    * loudly with the file and codec named. Constructors run inside the
    * guard — they read (and can reject) the member header.
    */
  /** One reusable native decompression context per thread (guide §4.5 —
    * the streaming zstd reader allocates a fresh native dctx + buffers per
    * stream, which the per-row round-trip gates pay per ROW; task threads
    * are pooled, so contexts are bounded by the thread count).
    */
  private val zstdDctx = new ThreadLocal[com.github.luben.zstd.ZstdDecompressCtx] {
    override def initialValue(): com.github.luben.zstd.ZstdDecompressCtx =
      new com.github.luben.zstd.ZstdDecompressCtx()
  }

  private[graft] def decompress(codec: String, bytes: Array[Byte], budget: Budget,
                                at: String): Array[Byte] = {
    var in: java.io.InputStream = null
    try {
      if (codec == "zstd") {
        // Single-frame fast path: when the input is exactly one frame with
        // a declared content size, decompress through the reused per-thread
        // context — one native call, no stream machinery. The budget is
        // charged BEFORE allocating (a frame declaring a bomb-sized content
        // fails in charge(), and a frame that LIES small fails inside
        // ZSTD_decompress when the output exceeds the declared buffer).
        // Multi-frame or unknown-content-size inputs take the streaming
        // path below, which handles them member by member.
        val content = com.github.luben.zstd.Zstd.getFrameContentSize(bytes)
        if (content > 0 && content <= Int.MaxValue &&
            com.github.luben.zstd.Zstd.findFrameCompressedSize(bytes) == bytes.length) {
          budget.charge(content, at)
          return zstdDctx.get().decompress(bytes, content.toInt)
        }
      }
      val base = new ByteArrayInputStream(bytes)
      in = codec match {
        case "gzip"  => new GZIPInputStream(base, 65536)
        case "bzip2" =>
          new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(base, true)
        case "xz" =>
          new org.apache.commons.compress.compressors.xz.XZCompressorInputStream(base, true)
        case "zstd" =>
          new org.apache.commons.compress.compressors.zstandard.ZstdCompressorInputStream(base)
        case "lz4" =>
          new org.apache.commons.compress.compressors.lz4.FramedLZ4CompressorInputStream(base, true)
        case "snappy" =>
          new org.apache.commons.compress.compressors.snappy.FramedSnappyCompressorInputStream(base)
        case other =>
          throw new IllegalArgumentException(s"graft.ArchiveExpand: unknown codec '$other'")
      }
      val out = new ByteArrayOutputStream(math.min(bytes.length * 4L, 1 << 20).toInt)
      val chunk = new Array[Byte](65536)
      var m = in.read(chunk)
      while (m >= 0) {
        budget.charge(m, at)
        out.write(chunk, 0, m)
        m = in.read(chunk)
      }
      out.toByteArray
    } catch {
      case e: IllegalArgumentException
          if e.getMessage != null && e.getMessage.startsWith("graft.ArchiveExpand") =>
        throw e
      case scala.util.control.NonFatal(e) =>
        throw new IllegalArgumentException(
          s"graft.ArchiveExpand: corrupt $codec stream in '$at': ${e.getMessage}")
    } finally if (in != null) in.close()
  }

  // ------------------------------------------------------------------- tar

  private val Block = 512

  /** Walk a ustar/pax stream into (path, bytes) for regular-file entries.
    * Header checksums are validated; GNU `L` long-name data and pax `x`
    * extended-header `path=` records (POSIX.1-2001 — what bsdtar and
    * `tar --format=posix` write for >100-byte names) override the
    * following entry's path; pax `g` globals and non-file typeflags are
    * skipped (their data blocks honored). A header that is neither
    * all-zero nor checksum-valid fails loudly — tar has no magic strong
    * enough to resynchronize on.
    */
  private[graft] def tarEntries(bytes: Array[Byte], budget: Budget, at: String,
                                chargeData: Boolean = true): Seq[(String, Array[Byte])] = {
    val out = mutable.ArrayBuffer.empty[(String, Array[Byte])]
    var off = 0
    var pendingLongName: String = null
    var zeroRun = 0
    while (off + Block <= bytes.length && zeroRun < 2) {
      val hdr = java.util.Arrays.copyOfRange(bytes, off, off + Block)
      if (hdr.forall(_ == 0)) { zeroRun += 1; off += Block }
      else {
        zeroRun = 0
        val stored = octal(hdr, 148, 8, at)
        var sum = 0L
        var i = 0
        while (i < Block) {
          sum += (if (i >= 148 && i < 156) 32 else hdr(i) & 0xFF)
          i += 1
        }
        if (sum != stored)
          throw new IllegalArgumentException(
            s"graft.ArchiveExpand: tar header checksum mismatch at offset $off in '$at' (stored $stored, computed $sum)")
        val size = octal(hdr, 124, 12, at)
        if (size < 0 || off + Block + size > bytes.length)
          throw new IllegalArgumentException(
            s"graft.ArchiveExpand: truncated tar entry at offset $off in '$at' (size $size)")
        val typeflag = hdr(156).toChar
        val dataEnd = off + Block + size.toInt
        def data(): Array[Byte] = {
          if (chargeData) budget.charge(size, at)
          java.util.Arrays.copyOfRange(bytes, off + Block, dataEnd)
        }
        typeflag match {
          case 'L' => // GNU long name: data is the NUL-terminated next path
            pendingLongName = cstr(data(), 0, size.toInt)
          case 'x' => // pax extended header: a path record overrides next name
            paxRecords(data(), at).get("path").foreach(pendingLongName = _)
          case '0' | '\u0000' =>
            val name =
              if (pendingLongName != null) { val p = pendingLongName; pendingLongName = null; p }
              else {
                val base = cstr(hdr, 0, 100)
                val prefix = cstr(hdr, 345, 155)
                if (prefix.isEmpty) base else s"$prefix/$base"
              }
            out += name -> data()
          case _ => // dir/link/global-pax/etc: skip, honoring the data length
            pendingLongName = null
        }
        off = dataEnd + (if (size % Block == 0) 0 else (Block - (size % Block)).toInt)
      }
    }
    out.toSeq
  }

  /** Parse pax extended-header records: `<len> <key>=<value>\n` repeated,
    * `len` the DECIMAL byte length of the whole record (length digits,
    * space, key, '=', value, newline), values UTF-8.
    */
  private def paxRecords(data: Array[Byte], at: String): Map[String, String] = {
    val out = mutable.Map.empty[String, String]
    var off = 0
    while (off < data.length) {
      var p = off
      var len = 0
      while (p < data.length && data(p) != ' ') {
        val c = data(p) & 0xFF
        if (c < '0' || c > '9')
          throw new IllegalArgumentException(
            s"graft.ArchiveExpand: bad pax record length in '$at'")
        len = len * 10 + (c - '0')
        p += 1
      }
      if (p >= data.length || len <= 0 || off + len > data.length ||
          data(off + len - 1) != '\n')
        throw new IllegalArgumentException(
          s"graft.ArchiveExpand: malformed pax record in '$at'")
      val body = new String(data, p + 1, off + len - 1 - (p + 1), StandardCharsets.UTF_8)
      val eq = body.indexOf('=')
      if (eq > 0) out += body.take(eq) -> body.drop(eq + 1)
      off += len
    }
    out.toMap
  }

  private def octal(hdr: Array[Byte], off: Int, len: Int, at: String): Long = {
    var v = 0L
    var i = off
    val end = off + len
    var seen = false
    while (i < end) {
      val c = hdr(i) & 0xFF
      if (c >= '0' && c <= '7') { v = v * 8 + (c - '0'); seen = true }
      else if (c == 0 || c == ' ') { /* terminator / pad */ }
      else throw new IllegalArgumentException(
        s"graft.ArchiveExpand: bad octal field in tar header of '$at'")
      i += 1
    }
    if (!seen) throw new IllegalArgumentException(
      s"graft.ArchiveExpand: empty octal field in tar header of '$at'")
    v
  }

  private def cstr(bytes: Array[Byte], off: Int, len: Int): String = {
    var end = off
    val cap = off + len
    while (end < cap && bytes(end) != 0) end += 1
    new String(bytes, off, end - off, StandardCharsets.UTF_8)
  }

  // ------------------------------------------------------------------- zip

  /** Stream-walk a zip into raw (name, bytes) for file entries. */
  private[graft] def zipEntriesBytes(bytes: Array[Byte], budget: Budget, at: String): Seq[(String, Array[Byte])] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = mutable.ArrayBuffer.empty[(String, Array[Byte])]
    try {
      var e: ZipEntry = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val buf = new ByteArrayOutputStream()
          val chunk = new Array[Byte](65536)
          var m = zin.read(chunk)
          while (m >= 0) {
            budget.charge(m, at)
            buf.write(chunk, 0, m)
            m = zin.read(chunk)
          }
          out += e.getName -> buf.toByteArray
        }
        e = zin.getNextEntry
      }
    } catch {
      case e: java.util.zip.ZipException =>
        throw new IllegalArgumentException(
          s"graft.ArchiveExpand: corrupt zip stream in '$at': ${e.getMessage}")
      // ZipInputStream surfaces malformed entry-name encodings as a RAW
      // IllegalArgumentException — rename it; never mask our own guards
      case e: IllegalArgumentException
          if e.getMessage == null || !e.getMessage.startsWith("graft.ArchiveExpand") =>
        throw new IllegalArgumentException(
          s"graft.ArchiveExpand: corrupt zip stream in '$at': ${e.getMessage}")
    } finally zin.close()
    out.toSeq
  }
}

/** S1 extension — archive-of-documents ingestion: each `.tar` / `.tar.gz` /
  * `.tgz` / `.zip` / `.gz` file under `directory` expands (inside the
  * distributed binaryFile scan, one flatMap per archive) into its leaf
  * entries, each then dispatched through the same [[TextExtractors]]
  * registry as a standalone file would be. `source` is
  * `<archive-path>!<entry-path>` (nested members chain further `!`
  * segments), so sink delete-by-source and change detection stay
  * per-DOCUMENT, not per-archive; `fingerprint` hashes the ENTRY's raw
  * bytes — re-packing the same members into a new archive does not
  * re-ingest them.
  *
  * No reference counterpart (its file source is one-document-per-file,
  * `sources.py:52-115`); at crawl scale corpora arrive as archives, and
  * expanding them in-scan keeps the fan-out distributed — the alternative
  * (pre-exploding archives onto the filesystem) doubles the I/O and
  * serializes on the unpacking host.
  */
final case class ArchiveSource(directory: String,
                               glob: String = ArchiveSource.DefaultGlob,
                               maxDepth: Int = 3) extends GraftSource {
  require(maxDepth >= 1, s"archive: max_depth must be >= 1, got $maxDepth")

  override def load(spark: SparkSession): DataFrame = {
    val raw = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(directory)
    val expandU = udf((path: String, bytes: Array[Byte]) => {
      val base = path.substring(path.lastIndexOf('/') + 1)
      ArchiveExpand.expand(base, bytes, maxDepth)
    })
    val entries = raw
      .select(col("path"), explode(expandU(col("path"), col("content"))).as("e"))
      .select(col("path"), col("e._1").as("entry"), col("e._2").as("bytes"))
      // A leaf that is ITSELF an unexpandable container (nested past
      // max_depth, or a format with no offline decoder — 7z/rar) must
      // SKIP, not abort: extractColumn's loud raise_error is right for a
      // standalone mislabeled file, but here it would fail the whole
      // corpus ingest over one stray member. Dropped members re-ingest
      // by re-running with a higher max_depth.
      .filter(!lower(regexp_extract(col("entry"), "\\.([A-Za-z0-9]+)$", 1))
        .isin(TextExtractors.unsupportedExts: _*))
    GraftSource.canonical(entries.select(
      TextExtractors.extractColumn(col("entry"), col("bytes")).as("content"),
      concat(col("path"), lit("!"), col("entry")).as("source"),
      sha2(col("bytes"), 256).as("fingerprint"),
      map_filter(
        map(lit("extract_note"),
          TextExtractors.extractNoteColumn(col("entry"), col("bytes"))),
        (_, v) => v.isNotNull).cast("map<string,string>").as("metadata")))
  }

  override def testConnection(spark: SparkSession): Unit = {
    val p = new org.apache.hadoop.fs.Path(directory)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p) || !fs.getFileStatus(p).isDirectory)
      throw new IllegalStateException(s"directory does not exist: $directory")
  }
}

object ArchiveSource {
  val DefaultGlob: String =
    "*.{tar,tar.gz,tgz,tar.bz2,tbz2,tbz,tar.xz,txz,tar.zst,tzst,zip,gz,bz2,xz,zst,lz4,sz,snappy,tar.lz4,tar.sz}"
}
