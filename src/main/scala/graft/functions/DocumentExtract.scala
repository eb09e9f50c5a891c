package graft.functions

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{Inflater, ZipEntry, ZipInputStream}

import scala.collection.mutable

/** Offline document-format text extraction — the JVM-native counterpart of
  * the reference's `unstructured.partition` dispatch
  * (`yamlpipe/components/sources.py:92-93`), built ONLY on the JDK
  * (`java.util.zip`) so it works with zero extra dependencies:
  *
  *  - docx / pptx / xlsx (OOXML) and odt (ODF): zip containers of XML —
  *    unzip the payload part(s) and walk the text runs;
  *  - epub: zip of XHTML chapters — tag-strip each;
  *  - rtf: single-pass control-word walker (destinations skipped,
  *    `\par`/`\line`/`\tab`/`\'hh`/`\uN` handled);
  *  - pdf: content-stream text operators (`Tj`/`'`/`"`/`TJ`) with
  *    FlateDecode inflation, PLUS a ToUnicode CMap interpreter
  *    ([[pdfFontCmaps]]/[[parseCmap]]): subset fonts (Identity-H two-byte
  *    glyph codes — most modern machine-generated PDFs) decode exactly
  *    through their font's own bfchar/bfrange tables, tracked per `Tf`.
  *    Scanned (image-only) PDFs still extract nothing — mirroring the
  *    reference's behavior, the empty result is dropped by the
  *    empty-document skip (`sources.py:94-96`).
  *
  * Paragraph-level elements are joined with `"\n\n"` exactly as the
  * reference joins partition elements (`sources.py:92-93`).
  *
  * Scale stance: called once per FILE inside the distributed binaryFile
  * scan (a UDF is justified here — byte-level container parsing has no
  * Column-expression equivalent, and the per-file granularity keeps it off
  * any per-row hot path).
  */
object DocumentExtract {

  /** Extension → extractor dispatch. Throws `IllegalArgumentException` with
    * a named message on a corrupt container; unknown extensions are the
    * caller's responsibility (see `TextExtractors.registry`).
    */
  def extract(ext: String, path: String, bytes: Array[Byte]): String = {
    if (bytes == null) return null
    try {
      ext match {
        // macro-enabled (m) and template (t) OOXML variants are the SAME
        // zip layout — only the content-types part differs
        case "docx" | "docm" | "dotx" | "dotm" => docx(bytes)
        case "pptx" | "pptm" | "potx" | "potm" => pptx(bytes)
        case "xlsx" | "xlsm" | "xltx" | "xltm" => xlsx(bytes)
        // ODF templates (ott/ots/otp) and drawings share content.xml
        case "odt" | "ott"   => odt(bytes)
        case "ods" | "ots"   => ods(bytes)
        case "odp" | "otp" | "odg" => odp(bytes)
        case "epub"          => epub(bytes)
        case "rtf"           => rtf(new String(bytes, StandardCharsets.ISO_8859_1))
        case "pdf"           => pdf(bytes)
        case "eml"           => eml(new String(bytes, StandardCharsets.ISO_8859_1))
        case "mbox"          => mbox(new String(bytes, StandardCharsets.ISO_8859_1))
        case "ipynb"         => TextualFormats.ipynb(bytes)
        case "srt"           => TextualFormats.srt(new String(bytes, StandardCharsets.UTF_8))
        case "vtt"           => TextualFormats.vtt(new String(bytes, StandardCharsets.UTF_8))
        case "tex" | "latex" => TextualFormats.tex(new String(bytes, StandardCharsets.UTF_8))
        case "doc" | "ppt" | "xls" => ole2BestEffort(ext, bytes)
        case other =>
          throw new IllegalArgumentException(s"no extractor registered for '$other'")
      }
    } catch {
      case e: IllegalArgumentException if e.getMessage != null && e.getMessage.startsWith("graft.DocumentExtract") => throw e
      case scala.util.control.NonFatal(e) =>
        throw new IllegalArgumentException(
          s"graft.DocumentExtract: failed to extract '$ext' text from $path: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }
  }

  /** Magic-byte + container sniffing for MISLABELED files — crawl dumps
    * systematically serve one format under another's extension (a `.pdf`
    * link returning docx bytes, an exported `.doc` that is really RTF).
    * Returns the extension-name of the DETECTED format, or None when the
    * content carries no recognizable signature (plain text). Zip and OLE2
    * containers sniff one level deep (entry names / directory streams) to
    * name the concrete Office flavor.
    */
  def sniff(bytes: Array[Byte]): Option[String] = {
    if (bytes == null || bytes.length < 4) return None
    def sig(s: Int*) = s.indices.forall(i => bytes(i) == s(i).toByte)
    lazy val head = new String(bytes, 0, math.min(bytes.length, 512),
      StandardCharsets.ISO_8859_1)
    if (sig(0x25, 0x50, 0x44, 0x46)) Some("pdf") // %PDF
    else if (bytes.length >= 8 &&
      sig(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)) sniffOle2(bytes)
    else if (sig(0x50, 0x4B, 0x03, 0x04)) sniffZip(bytes)
    else if (sig(0x1F, 0x8B)) Some("gz") // loud downstream: route to archives
    else if (head.startsWith("{\\rtf")) Some("rtf")
    else if (head.startsWith("WARC/")) Some("warc")
    // "From " alone is prose, not a signature — require the RFC 4155
    // envelope shape (sender token + an asctime-style hh:mm:ss) before
    // overriding a declared extension
    else if (head.startsWith("From ") && head.takeWhile(_ != '\n')
      .matches("From \\S+ .*\\d{2}:\\d{2}:\\d{2}.*")) Some("mbox")
    // UTF-8 BOM reads as EF BB BF under the ISO_8859_1 head decode
    else if (head.startsWith("WEBVTT") ||
      head.startsWith("\u00ef\u00bb\u00bfWEBVTT")) Some("vtt")
    else if (head.dropWhile(_.isWhitespace).startsWith("{") &&
      (head.contains("\"cells\"") || head.contains("\"worksheets\""))) Some("ipynb")
    else None
  }

  /** Zip flavor by entry names / the `mimetype` member (epub + ODF store
    * their MIME first and uncompressed).
    */
  private def sniffZip(bytes: Array[Byte]): Option[String] = {
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var mime: String = null
    val z = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      var e = z.getNextEntry
      var n = 0
      while (e != null && n < 64) {
        names += e.getName
        if (e.getName == "mimetype" && mime == null) {
          val buf = new Array[Byte](128)
          val m = z.read(buf)
          if (m > 0) mime = new String(buf, 0, m, StandardCharsets.ISO_8859_1).trim
        }
        n += 1
        e = z.getNextEntry
      }
    } catch { case scala.util.control.NonFatal(_) => () } // truncated: use what we saw
    finally z.close()
    val m = Option(mime).getOrElse("")
    if (m.contains("epub")) Some("epub")
    else if (m.contains("opendocument.text")) Some("odt")
    else if (m.contains("opendocument.spreadsheet")) Some("ods")
    else if (m.contains("opendocument.presentation")) Some("odp")
    else if (names.exists(_.startsWith("word/"))) Some("docx")
    else if (names.exists(_.startsWith("ppt/"))) Some("pptx")
    else if (names.exists(_.startsWith("xl/"))) Some("xlsx")
    else if (names.contains("META-INF/container.xml")) Some("epub")
    else if (names.contains("content.xml")) Some("odt")
    else None // generic zip: the archive source's business, not ours
  }

  /** OLE2 flavor by directory stream names. */
  private def sniffOle2(bytes: Array[Byte]): Option[String] =
    try {
      val names = ole2Streams(bytes).map(_._1).toSet
      if (names.contains("WordDocument")) Some("doc")
      else if (names.contains("PowerPoint Document")) Some("ppt")
      else if (names.contains("Workbook") || names.contains("Book")) Some("xls")
      else Some("doc") // unknown flavor: the scrape fallback still applies
    } catch { case scala.util.control.NonFatal(_) => Some("doc") }

  /** Extract honoring CONTENT over a mislabeled extension: when the sniff
    * names a concrete format, it wins over `declaredExt`; signature-less
    * content (plain text and friends) falls back to the declared dispatch.
    */
  def extractAuto(declaredExt: String, path: String, bytes: Array[Byte]): String =
    extract(sniff(bytes).getOrElse(declaredExt), path, bytes)

  // ---------------------------------------------------------------- zip/XML

  /** Decompression bomb guard: a crafted container (zip bomb, deflate bomb)
    * must fail loudly per file instead of OOMing the executor — 256 MiB of
    * decompressed XML ACROSS ALL KEPT ENTRIES of one file is far beyond any
    * legitimate document; a multi-entry archive whose entries each stay
    * under a per-entry cap would otherwise still accumulate unbounded.
    * (var so the spec can exercise the guard without a 256 MiB fixture.)
    */
  private[graft] var MaxInflatedBytes: Int = 256 * 1024 * 1024

  /** Read selected entries of a zip container into (name → UTF-8 string);
    * the decompressed TOTAL across entries is capped by [[MaxInflatedBytes]].
    */
  private def zipEntries(bytes: Array[Byte])(keep: String => Boolean): Seq[(String, String)] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = mutable.ArrayBuffer.empty[(String, String)]
    var totalInflated = 0L
    try {
      var e: ZipEntry = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory && keep(e.getName)) {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](65536)
          var m = zin.read(chunk)
          while (m >= 0) {
            totalInflated += m
            if (totalInflated > MaxInflatedBytes)
              throw new IllegalArgumentException(
                s"graft.DocumentExtract: container inflates past $MaxInflatedBytes bytes at entry '${e.getName}' (decompression bomb?)")
            buf.write(chunk, 0, m)
            m = zin.read(chunk)
          }
          out += e.getName -> new String(buf.toByteArray, StandardCharsets.UTF_8)
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.toSeq
  }

  private def zipEntry(bytes: Array[Byte], name: String): String =
    zipEntries(bytes)(_ == name).headOption.map(_._2)
      .getOrElse(throw new IllegalArgumentException(s"container missing entry '$name'"))

  /** Decode the five XML named entities plus numeric character references. */
  private[graft] def decodeEntities(s: String): String = {
    if (!s.contains('&')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val end = s.indexOf(';', i + 1)
        if (end > i && end - i <= 10) {
          s.substring(i + 1, end) match {
            case "amp"  => sb += '&';  i = end + 1
            case "lt"   => sb += '<';  i = end + 1
            case "gt"   => sb += '>';  i = end + 1
            case "quot" => sb += '"';  i = end + 1
            case "apos" => sb += '\''; i = end + 1
            case num if num.startsWith("#") =>
              val cp = try {
                if (num.startsWith("#x") || num.startsWith("#X")) Integer.parseInt(num.drop(2), 16)
                else Integer.parseInt(num.drop(1))
              } catch { case _: NumberFormatException => -1 }
              if (cp >= 0) { sb.appendAll(Character.toChars(cp)); i = end + 1 }
              else { sb += c; i += 1 }
            case _ => sb += c; i += 1
          }
        } else { sb += c; i += 1 }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  private def stripTags(xml: String): String =
    decodeEntities(xml.replaceAll("<[^>]*>", ""))

  /** Natural sort key for `slide10.xml` vs `slide2.xml`. */
  private def naturalKey(name: String): (String, Long) = {
    val m = "(\\d+)".r.findFirstIn(name)
    (name.replaceAll("\\d+", ""), m.map(_.toLong).getOrElse(0L))
  }

  /** Split on a paragraph end tag, render each paragraph's runs in document
    * order (so breaks/tabs interleave correctly with text), join non-empty
    * paragraphs with the reference's element separator.
    */
  private def ooxmlParagraphs(xml: String, paraEnd: String,
                              runRe: scala.util.matching.Regex,
                              render: scala.util.matching.Regex.Match => String): String =
    xml.split(java.util.regex.Pattern.quote(paraEnd)).iterator
      .map(p => runRe.findAllMatchIn(p).map(render).mkString)
      .map(_.trim).filter(_.nonEmpty).mkString("\n\n")

  // ------------------------------------------------------------------ docx

  /** Word: paragraphs are `<w:p>`, text runs `<w:t>`, explicit breaks
    * `<w:br/>`/`<w:cr/>`, tabs `<w:tab/>`. Runs are walked in order so
    * breaks and tabs interleave correctly with text.
    */
  private[functions] def docx(bytes: Array[Byte]): String = {
    val xml = zipEntry(bytes, "word/document.xml")
    ooxmlParagraphs(xml, "</w:p>",
      "(?s)<w:t(?:\\s[^>]*)?>(.*?)</w:t>|<w:(?:br|cr)\\s*/?>|<w:tab\\s*/?>".r,
      m => if (m.group(1) != null) decodeEntities(m.group(1))
           else if (m.matched.contains("tab")) "\t" else "\n")
  }

  // ------------------------------------------------------------------ pptx

  /** PowerPoint: one element per slide (slides in natural order), text runs
    * `<a:t>`, paragraphs `<a:p>` become lines within the slide.
    */
  private[functions] def pptx(bytes: Array[Byte]): String = {
    val slides = zipEntries(bytes)(n => n.startsWith("ppt/slides/slide") && n.endsWith(".xml"))
      .sortBy(e => naturalKey(e._1))
    val texts = slides.map { case (_, xml) =>
      xml.split("</a:p>").iterator
        .map(p => "(?s)<a:t(?:\\s[^>]*)?>(.*?)</a:t>".r
          .findAllMatchIn(p).map(m => decodeEntities(m.group(1))).mkString)
        .map(_.trim).filter(_.nonEmpty).mkString("\n")
    }.filter(_.nonEmpty)
    texts.mkString("\n\n")
  }

  // ------------------------------------------------------------------ xlsx

  /** Excel: resolve shared-string cells (`t="s"`) through
    * `xl/sharedStrings.xml`, keep inline strings and literal values;
    * cells tab-joined per row, rows newline-joined, sheets (natural order)
    * are the `"\n\n"`-joined elements.
    */
  private[functions] def xlsx(bytes: Array[Byte]): String = {
    val parts = zipEntries(bytes)(n =>
      n == "xl/sharedStrings.xml" || (n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml")))
    val shared: IndexedSeq[String] =
      parts.find(_._1 == "xl/sharedStrings.xml").map { case (_, xml) =>
        "(?s)<si(?:\\s[^>]*)?>(.*?)</si>".r.findAllMatchIn(xml).map { si =>
          "(?s)<t(?:\\s[^>]*)?>(.*?)</t>".r.findAllMatchIn(si.group(1))
            .map(m => decodeEntities(m.group(1))).mkString
        }.toIndexedSeq
      }.getOrElse(IndexedSeq.empty)
    // Excel stores only non-empty (or styled) cells and addresses them by
    // the r="A1" reference: both self-closed styled cells AND wholly
    // omitted cells must yield empty fields at their column positions, or
    // later columns silently shift left.
    val cellRe = "(?s)<c(\\s[^>/]*)?(?:/>|>(.*?)</c>)".r
    val refRe = "r=\"([A-Z]+)[0-9]+\"".r
    val vRe = "(?s)<v(?:\\s[^>]*)?>(.*?)</v>".r
    val tRe = "(?s)<t(?:\\s[^>]*)?>(.*?)</t>".r
    def colIndex(letters: String): Int =
      letters.foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1
    val sheets = parts.filter(_._1 != "xl/sharedStrings.xml").sortBy(e => naturalKey(e._1))
    val texts = sheets.map { case (_, xml) =>
      "(?s)<row(?:\\s[^>]*)?>(.*?)</row>".r.findAllMatchIn(xml).map { row =>
        val cells = mutable.ArrayBuffer.empty[String]
        cellRe.findAllMatchIn(row.group(1)).foreach { c =>
          val attrs = Option(c.group(1)).getOrElse("")
          val body = Option(c.group(2)).getOrElse("")
          val idx = refRe.findFirstMatchIn(attrs).map(m => colIndex(m.group(1)))
            .getOrElse(cells.length)
          while (cells.length < idx) cells += ""
          val value =
            if (attrs.contains("t=\"s\"")) {
              vRe.findFirstMatchIn(body).map(_.group(1).trim.toInt)
                .filter(shared.indices.contains).map(shared).getOrElse("")
            } else if (attrs.contains("t=\"inlineStr\"")) {
              tRe.findAllMatchIn(body).map(m => decodeEntities(m.group(1))).mkString
            } else vRe.findFirstMatchIn(body).map(m => decodeEntities(m.group(1))).getOrElse("")
          if (idx < cells.length) cells(idx) = value else cells += value
        }
        cells.mkString("\t")
        // trailing-only trim: leading tabs ARE the empty leading columns
      }.map(_.replaceAll("\\s+$", "")).filter(_.nonEmpty).mkString("\n")
    }.filter(_.nonEmpty)
    texts.mkString("\n\n")
  }

  // ------------------------------------------------------------------- odt

  /** OpenDocument text: paragraphs `<text:p>` and headings `<text:h>` in
    * `content.xml`; nested spans tag-stripped.
    */
  private[functions] def odt(bytes: Array[Byte]): String =
    odfParagraphs(zipEntry(bytes, "content.xml")).mkString("\n\n")

  /** ODF spreadsheet (.ods): content.xml table walk — cell text (text:p
    * paragraphs newline-joined) tab-joined per row, honoring
    * `table:number-columns-repeated` for column positions (capped — real
    * writers pad trailing empties by the thousand) with trailing empty
    * cells trimmed; rows newline-joined, tables `"\n\n"`-joined (the xlsx
    * conventions). Merged-cell placeholders (`covered-table-cell`) hold
    * their positions.
    */
  private[functions] def ods(bytes: Array[Byte]): String = {
    val xml = zipEntry(bytes, "content.xml")
    val tableRe = "(?s)<table:table(?:\\s[^>]*)?>(.*?)</table:table>".r
    val rowRe = "(?s)<table:table-row(?:\\s[^>]*)?>(.*?)</table:table-row>".r
    val cellRe = ("(?s)<table:(?:covered-)?table-cell((?:\\s[^>]*?)?)" +
      "(?:/>|>(.*?)</table:(?:covered-)?table-cell>)").r
    val repRe = "table:number-columns-repeated=\"(\\d+)\"".r
    tableRe.findAllMatchIn(xml).map { tm =>
      rowRe.findAllMatchIn(tm.group(1)).map { rm =>
        val cells = mutable.ArrayBuffer.empty[String]
        cellRe.findAllMatchIn(rm.group(1)).foreach { cm =>
          val attrs = Option(cm.group(1)).getOrElse("")
          val body = Option(cm.group(2)).getOrElse("")
          val rep = repRe.findFirstMatchIn(attrs).map(_.group(1).toInt).getOrElse(1)
          val text = odfParagraphs(body).mkString("\n")
          var i = 0
          while (i < math.min(rep, 1000)) { cells += text; i += 1 }
        }
        while (cells.nonEmpty && cells.last.isEmpty) cells.remove(cells.length - 1)
        cells.mkString("\t")
      }.filter(_.nonEmpty).mkString("\n")
    }.filter(_.nonEmpty).mkString("\n\n")
  }

  /** ODF presentation (.odp): per draw:page paragraphs newline-joined,
    * pages `"\n\n"`-joined (the pptx conventions).
    */
  private[functions] def odp(bytes: Array[Byte]): String = {
    val xml = zipEntry(bytes, "content.xml")
    "(?s)<draw:page(?:\\s[^>]*)?>(.*?)</draw:page>".r.findAllMatchIn(xml)
      .map(pg => odfParagraphs(pg.group(1)).mkString("\n"))
      .filter(_.nonEmpty).mkString("\n\n")
  }

  /** text:p / text:h contents with ODF tab/line-break elements mapped
    * back to characters, tag-stripped, trimmed, empties dropped — the
    * shared paragraph walk of the odt/ods/odp extractors.
    */
  private def odfParagraphs(xml: String): Seq[String] =
    "(?s)<text:(?:p|h)(?:\\s[^>]*)?>(.*?)</text:(?:p|h)>".r
      .findAllMatchIn(xml)
      .map(m => stripTags(
        m.group(1).replaceAll("<text:tab\\s*/?>", "\t")
                  .replaceAll("<text:line-break\\s*/?>", "\n")))
      .map(_.trim).filter(_.nonEmpty).toSeq

  // ------------------------------------------------------------------ epub

  /** EPUB: zip of XHTML chapters — tag-strip each (scripts/styles removed),
    * chapters in natural order are the joined elements.
    */
  private[functions] def epub(bytes: Array[Byte]): String = {
    val chapters = zipEntries(bytes)(n =>
      n.endsWith(".xhtml") || n.endsWith(".html") || n.endsWith(".htm"))
      .sortBy(e => naturalKey(e._1))
    chapters.map { case (_, html) =>
      val noScript = html.replaceAll("(?is)<(script|style)[^>]*>.*?</\\1>", " ")
      val blocks = noScript.replaceAll("(?i)</(?:p|h[1-6]|div|li|tr|blockquote)>|<br\\s*/?>", "\n")
      stripTags(blocks).linesIterator.map(_.trim).filter(_.nonEmpty).mkString("\n")
    }.filter(_.nonEmpty).mkString("\n\n")
  }

  // ------------------------------------------------------------------- rtf

  /** RTF: single-pass walker. Skipped destinations (`{\*...}`, fonttbl,
    * colortbl, stylesheet, info, pict, themedata) produce no text;
    * `\par`/`\line` → newline, `\tab` → tab, `\'hh` → cp1252-ish byte,
    * `\uN` → code point (with its fallback character consumed).
    */
  private[functions] def rtf(s: String): String = {
    val sb = new StringBuilder
    val skipDests = Set("fonttbl", "colortbl", "stylesheet", "info", "pict",
      "themedata", "colorschememapping", "latentstyles", "datastore", "header", "footer")
    var i = 0
    var skipDepth = -1  // brace depth at which a skipped destination started
    var depth = 0
    var ucSkip = 1      // fallback chars per \uN escape (RTF default)
    var ucStack = List.empty[Int] // \uc is group-scoped: saved on {, restored on }
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      c match {
        case '{' => depth += 1; i += 1
          ucStack = ucSkip :: ucStack
          // peek for \* destination
          if (skipDepth < 0 && i < n && s.charAt(i) == '\\' && i + 1 < n && s.charAt(i + 1) == '*')
            skipDepth = depth
        case '}' =>
          if (skipDepth >= 0 && depth == skipDepth) skipDepth = -1
          ucSkip = ucStack.headOption.getOrElse(1); ucStack = ucStack.drop(1)
          depth -= 1; i += 1
        case '\\' if i + 1 < n =>
          val nc = s.charAt(i + 1)
          if (nc == '\\' || nc == '{' || nc == '}') { if (skipDepth < 0) sb += nc; i += 2 }
          else if (nc == '\'') {
            if (i + 3 < n) {
              // hex digits are case-insensitive in RTF; emit nothing (never
              // a garbage char) when a writer produced a malformed escape
              val hi = Character.digit(s.charAt(i + 2), 16)
              val lo = Character.digit(s.charAt(i + 3), 16)
              if (skipDepth < 0 && hi >= 0 && lo >= 0) sb += (hi * 16 + lo).toChar
              i += 4
            } else i = n
          } else if (nc == '~') { if (skipDepth < 0) sb += ' '; i += 2 }
          else {
            // control word: letters then optional signed digits then optional space
            var j = i + 1
            while (j < n && s.charAt(j).isLetter) j += 1
            val word = s.substring(i + 1, j)
            var k = j
            if (k < n && (s.charAt(k) == '-' || s.charAt(k).isDigit)) {
              k += 1
              while (k < n && s.charAt(k).isDigit) k += 1
            }
            val param = s.substring(j, k)
            if (k < n && s.charAt(k) == ' ') k += 1
            if (skipDepth < 0 && skipDests.contains(word) && depth > 0) skipDepth = depth
            else if (skipDepth < 0) word match {
              case "par" | "line" | "row" => sb += '\n'
              case "tab" | "cell"         => sb += '\t'
              case "uc" =>
                // \ucN declares how many ANSI fallback items follow each
                // \uN escape (0 for modern writers, 1 default, 2+ for DBCS).
                ucSkip = try math.max(0, param.toInt) catch { case _: Exception => 1 }
              case "u" =>
                try sb.appendAll(Character.toChars(((param.toInt % 65536) + 65536) % 65536))
                catch { case _: Exception => () }
                // Consume exactly ucSkip fallback items after the unicode
                // control word. Word writes each as a hex escape (u8217
                // followed by hex-escape 92), others as a plain char; an
                // unconsumed fallback leaks into the text as a duplicate
                // character, an over-consumed one (under \uc0) eats real
                // text.
                var skip = ucSkip
                while (skip > 0) {
                  if (k + 3 < n && s.charAt(k) == '\\' && s.charAt(k + 1) == '\'') { k += 4; skip -= 1 }
                  else if (k < n && s.charAt(k) != '\\' && s.charAt(k) != '{' && s.charAt(k) != '}') { k += 1; skip -= 1 }
                  else skip = 0
                }
              case _ => ()
            }
            i = k
          }
        case '\r' | '\n' => i += 1  // raw newlines are not document text in RTF
        case ch => if (skipDepth < 0) sb += ch; i += 1
      }
    }
    sb.toString.linesIterator.map(_.replaceAll("\\s+$", "")).mkString("\n").trim
  }

  // ------------------------------------------------------------------- eml

  /** RFC 822 / MIME email: `Subject` header + the preferred body text
    * (text/plain over tag-stripped text/html), multipart walked
    * recursively, quoted-printable and base64 transfer encodings decoded,
    * part charset honored. Common-case parser (the ISO-8859-1 round-trip
    * preserves raw bytes so charset decode is exact), not a full MIME
    * stack.
    */
  /** mbox (RFC 4155) mail archive: split on `From ` envelope lines,
    * reverse the mboxrd body quoting (`^>+From ` loses one `>` — the
    * convention qmail/mutt write, which also round-trips mboxo input),
    * parse each message through the full [[eml]] stack. Input with no
    * envelope line at all is treated as ONE bare message (the de-facto
    * behavior of mail tools on a single exported message).
    */
  private[functions] def mbox(raw: String): String =
    mboxMessages(raw).map(eml).filter(_.nonEmpty).mkString("\n\n")

  /** Split an mbox byte-per-char string into its messages (envelope lines
    * dropped, mboxrd quoting reversed). Boundary detection is exact in
    * ISO-8859-1 space: `From ` is pure ASCII and UTF-8 continuation bytes
    * can never alias it.
    */
  private[graft] def mboxMessages(raw: String): Seq[String] = {
    val lines = raw.replace("\r\n", "\n").split("\n", -1)
    val msgs = mutable.ArrayBuffer.empty[StringBuilder]
    def quotedFrom(l: String): Boolean = {
      var i = 0
      while (i < l.length && l.charAt(i) == '>') i += 1
      i > 0 && l.startsWith("From ", i)
    }
    lines.foreach { line =>
      if (line.startsWith("From ")) msgs += new StringBuilder
      else if (msgs.nonEmpty) {
        val un = if (quotedFrom(line)) line.substring(1) else line
        msgs.last.append(un).append('\n')
      }
    }
    if (msgs.isEmpty) Seq(raw) else msgs.map(_.toString).toSeq
  }

  private[functions] def eml(raw: String): String = {
    val (headers, body) = splitHeaders(raw)
    val subject = headers.get("subject").map(decodeEncodedWords).getOrElse("")
    val text = emlBody(headers, body)
    Seq(subject.trim, text.trim).filter(_.nonEmpty).mkString("\n\n")
  }

  /** Split at the first blank line; unfold continuation lines; lowercase
    * header names (last occurrence wins — sufficient here).
    */
  private def splitHeaders(raw: String): (Map[String, String], String) = {
    val norm = raw.replace("\r\n", "\n")
    // A leading blank line means EMPTY headers (legal for MIME parts,
    // RFC 2046): everything after it is body.
    if (norm.startsWith("\n")) return (Map.empty, norm.drop(1))
    val cut = norm.indexOf("\n\n")
    val (head, body) = if (cut < 0) (norm, "") else (norm.take(cut), norm.drop(cut + 2))
    val unfolded = head.replaceAll("\n[ \t]+", " ")
    val headers = unfolded.linesIterator.flatMap { line =>
      val c = line.indexOf(':')
      if (c <= 0) None
      else Some(line.take(c).trim.toLowerCase(java.util.Locale.ROOT) -> line.drop(c + 1).trim)
    }.toMap
    (headers, body)
  }

  /** RFC 2047 encoded-words in headers: =?charset?B|Q?...?= (whitespace
    * between ADJACENT encoded words is not content and is dropped, §6.2).
    */
  private[functions] def decodeEncodedWords(raw: String): String = {
    val s = raw.replaceAll("(\\?=)\\s+(=\\?)", "$1$2")
    "=\\?([^?]+)\\?([BbQq])\\?([^?]*)\\?=".r.replaceAllIn(s, m => {
      val charset = try java.nio.charset.Charset.forName(m.group(1))
                    catch { case _: Exception => StandardCharsets.UTF_8 }
      val payload = m.group(3)
      val bytes =
        if (m.group(2).equalsIgnoreCase("B"))
          try java.util.Base64.getMimeDecoder.decode(payload)
          catch { case _: Exception => payload.getBytes(charset) }
        else decodeQuotedPrintable(payload.replace('_', ' ')).getBytes(StandardCharsets.ISO_8859_1)
      scala.util.matching.Regex.quoteReplacement(new String(bytes, charset))
    })
  }

  private def decodeQuotedPrintable(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=' && i + 1 < s.length && s.charAt(i + 1) == '\n') i += 2 // soft break
      else if (c == '=' && i + 2 < s.length &&
               Character.digit(s.charAt(i + 1), 16) >= 0 && Character.digit(s.charAt(i + 2), 16) >= 0) {
        sb += (Character.digit(s.charAt(i + 1), 16) * 16 + Character.digit(s.charAt(i + 2), 16)).toChar
        i += 3
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  private def headerParam(value: String, name: String): Option[String] =
    s"""(?i)$name="?([^";]+)"?""".r.findFirstMatchIn(value).map(_.group(1).trim)

  /** Decode one (possibly multipart) body to text. text/plain wins over
    * text/html (stripped); multipart recurses into parts.
    */
  private def emlBody(headers: Map[String, String], body: String,
                      depth: Int = 0): String = {
    val ctype = headers.getOrElse("content-type", "text/plain")
    val lower = ctype.toLowerCase(java.util.Locale.ROOT)
    if (depth > 8) "" // crafted deep multipart nesting must not blow the stack
    else if (lower.startsWith("multipart/")) {
      headerParam(ctype, "boundary") match {
        case None => ""
        case Some(b) =>
          // RFC 2046: delimiters only count at line start
          val parts = body.split("(?m)^" + java.util.regex.Pattern.quote("--" + b))
            .drop(1).takeWhile(p => !p.startsWith("--"))
            .map(p => splitHeaders(p.stripPrefix("\n")))
          def texts(pred: String => Boolean) = parts.flatMap { case (h, bd) =>
            val ct = h.getOrElse("content-type", "text/plain").toLowerCase(java.util.Locale.ROOT)
            if (ct.startsWith("multipart/")) Some(emlBody(h, bd, depth + 1)).filter(_.nonEmpty)
            else if (pred(ct)) Some(emlBody(h, bd, depth + 1)).filter(_.nonEmpty)
            else None
          }
          val plains = texts(_.startsWith("text/plain"))
          val any = if (plains.nonEmpty) plains else texts(_.startsWith("text/"))
          any.mkString("\n\n")
      }
    } else if (lower.startsWith("text/")) {
      val decodedBytes = headers.getOrElse("content-transfer-encoding", "").toLowerCase(java.util.Locale.ROOT) match {
        case "base64" =>
          try java.util.Base64.getMimeDecoder.decode(body.filterNot(_.isWhitespace))
          catch { case _: Exception => body.getBytes(StandardCharsets.ISO_8859_1) }
        case "quoted-printable" =>
          decodeQuotedPrintable(body).getBytes(StandardCharsets.ISO_8859_1)
        case _ => body.getBytes(StandardCharsets.ISO_8859_1)
      }
      val charset = headerParam(ctype, "charset")
        .flatMap(c => try Some(java.nio.charset.Charset.forName(c)) catch { case _: Exception => None })
        .getOrElse(StandardCharsets.UTF_8)
      val text = new String(decodedBytes, charset)
      if (lower.startsWith("text/html")) {
        val blocks = text.replaceAll("(?is)<(script|style)[^>]*>.*?</\\1>", " ")
          .replaceAll("(?i)</(?:p|h[1-6]|div|li|tr|blockquote)>|<br\\s*/?>", "\n")
        stripTags(blocks).linesIterator.map(_.trim).filter(_.nonEmpty).mkString("\n")
      } else text.trim
    } else ""
  }

  // ------------------------------------------------------------------- pdf

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

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsDictionary()) {
        val m = inf.inflate(buf)
        if (m == 0 && inf.needsInput()) return out.toByteArray // truncated; keep what we have
        if (out.size() + m > MaxInflatedBytes)
          throw new IllegalArgumentException(
            s"graft.DocumentExtract: pdf stream inflates past $MaxInflatedBytes bytes (decompression bomb?)")
        out.write(buf, 0, m)
      }
      out.toByteArray
    } finally inf.end()
  }

  /** ASCII85Decode (ISO 32000 §7.4.3): 5 chars in `!`..`u` → 4 bytes
    * base-85 big-endian; `z` = four zero bytes; whitespace skipped;
    * `~` ends the data (the optional `<~` prologue is consumed). A
    * partial final group of n chars decodes to n-1 bytes (pad with `u`).
    */
  private[graft] def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(16, data.length * 4 / 5))
    val grp = new Array[Int](5)
    var n = 0
    // The optional `<~` prologue may sit behind leading whitespace (a
    // writer that puts it on its own line) — skip that first, or the `<`
    // would be consumed as a data char and `~` would terminate the stream.
    var i = 0
    while (i < data.length &&
        " \t\r\n\f".indexOf((data(i) & 0xFF).toChar) >= 0) i += 1
    if (i + 1 < data.length && data(i) == '<' && data(i + 1) == '~') i += 2
    var done = false
    while (i < data.length && !done) {
      val c = data(i) & 0xFF
      if (c == '~') done = true
      else if (c == 'z' && n == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
      else if (c >= '!' && c <= 'u') {
        grp(n) = c - '!'; n += 1
        if (n == 5) {
          var v = 0L; var j = 0
          while (j < 5) { v = v * 85 + grp(j); j += 1 }
          out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
          out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
          n = 0
        }
      } // anything else (whitespace, stray bytes) is skipped
      i += 1
    }
    if (n >= 2) {
      var v = 0L; var j = 0
      while (j < 5) { v = v * 85 + (if (j < n) grp(j) else 84); j += 1 }
      val bs = Array[Byte](((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      out.write(bs, 0, n - 1)
    }
    out.toByteArray
  }

  /** LZWDecode (ISO 32000 §7.4.4, the TIFF variant): MSB-first variable
    * width codes starting at 9 bits, 256 = clear-table, 257 = EOD, width
    * grows to 12 with EarlyChange=1 (the default — the width bump happens
    * one code BEFORE the table boundary because the writer has already
    * assigned the code the reader is about to learn). The table grows to
    * the full 4096 entries and freezes until a clear code arrives.
    * [[LegacyOfficeFixtures.lzwEncode]] is the symmetric writer that
    * round-trip gates pin this against; `DocumentExtractSpec`'s
    * pdf.js-convention reference decoder pins BOTH against the ecosystem
    * convention (bump at next-code 511/1023/2047).
    */
  /** EarlyChange=1 code width for an LZW table of `size` entries: bump
    * when the NEXT code to be assigned (`size`, plus the one-early
    * EarlyChange allowance) no longer fits w bits — i.e. reads go 9→10
    * bits once the table holds 511 entries, 10→11 at 1023, 11→12 at
    * 2047 (the pdf.js / libtiff convention). Shared (via symmetric
    * re-implementation) with `LegacyOfficeFixtures.lzwEncode`, which
    * simulates the DECODER's table size — that is what keeps the width
    * of the final code and the EOD marker in sync (the decoder grows its
    * table one code later than the encoder, so near a boundary the
    * trailing codes differ in width between the two tables' views).
    */
  private def lzwWidthFor(size: Int): Int = {
    var w = 9
    while (w < 12 && size + 1 > (1 << w) - 1) w += 1
    w
  }

  private[graft] def lzwDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 3))
    var dict = mutable.ArrayBuffer.empty[Array[Byte]]
    def resetDict(): Unit = {
      dict = mutable.ArrayBuffer.tabulate(256)(i => Array(i.toByte))
      dict += null; dict += null // 256 = clear, 257 = EOD placeholders
    }
    resetDict()
    var prev: Array[Byte] = null
    var bitBuf = 0L
    var bitCnt = 0
    var i = 0
    var eod = false
    while (!eod) {
      val width = lzwWidthFor(dict.length) // EarlyChange=1, resets on clear
      while (bitCnt < width && i < data.length) {
        bitBuf = (bitBuf << 8) | (data(i) & 0xFF); bitCnt += 8; i += 1
      }
      if (bitCnt < width) eod = true // ran out of bits: implicit EOD
      else {
        val code = ((bitBuf >> (bitCnt - width)) & ((1 << width) - 1)).toInt
        bitCnt -= width
        if (code == 256) { resetDict(); prev = null }
        else if (code == 257) eod = true
        else {
          val entry =
            if (code < dict.length && dict(code) != null) dict(code)
            else if (code == dict.length && prev != null) prev :+ prev(0)
            else throw new IllegalArgumentException(
              "graft.DocumentExtract: corrupt LZW stream (code out of table)")
          if (out.size() + entry.length > MaxInflatedBytes)
            throw new IllegalArgumentException(
              s"graft.DocumentExtract: LZW stream inflates past $MaxInflatedBytes bytes")
          out.write(entry, 0, entry.length)
          if (prev != null && dict.length < 4096) dict += (prev :+ entry(0))
          prev = entry
        }
      }
    }
    out.toByteArray
  }

  /** Parse the `/Filter` entry of the dict text preceding a stream: a
    * single name or an array of names applied in order. The window is
    * first scoped to the LAST `N G obj` header it contains so a previous
    * object's dict can't leak its filter in. Fallback: a window that cut
    * the `/Filter` key but still shows `/FlateDecode` keeps the historic
    * contains() behavior.
    */
  /** Scope a lookback window to the LAST `N G obj` header it contains, so
    * a previous object's dict (its `/Filter`, its `/Type /ObjStm`) can't
    * leak into decisions about the current stream.
    */
  private def scopeToLastObj(dict: String): String = {
    val objHdr = """\d+\s+\d+\s+obj\b""".r
    objHdr.findAllMatchIn(dict).toSeq.lastOption
      .map(m => dict.substring(m.end)).getOrElse(dict)
  }

  private[graft] def pdfFilters(dict: String): Seq[String] = {
    val scoped = scopeToLastObj(dict)
    val fi = scoped.lastIndexOf("/Filter")
    val named: Seq[String] =
      if (fi < 0) Nil
      else {
        var i = fi + "/Filter".length
        while (i < scoped.length && scoped.charAt(i).isWhitespace) i += 1
        val nameRe = """/([A-Za-z0-9]+)""".r
        if (i < scoped.length && scoped.charAt(i) == '[') {
          val end = scoped.indexOf(']', i)
          val seg = if (end < 0) scoped.substring(i) else scoped.substring(i, end)
          nameRe.findAllMatchIn(seg).map(_.group(1)).toSeq
        } else if (i < scoped.length && scoped.charAt(i) == '/')
          nameRe.findFirstMatchIn(scoped.substring(i)).map(_.group(1)).toSeq
        else Nil // indirect-ref /Filter value: not resolvable from the window
      }
    if (named.isEmpty && scoped.contains("/FlateDecode")) Seq("FlateDecode") else named
  }

  /** RunLengthDecode (ISO 32000 §7.4.5): a length byte 0–127 copies the
    * next length+1 bytes literally, 129–255 repeats the next byte
    * 257−length times, 128 is EOD. Truncated runs fail loudly (the
    * corrupt-container contract), and output is bomb-guarded like the
    * other decoders.
    */
  private[graft] def runLengthDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 2))
    var i = 0
    var eod = false
    while (!eod && i < data.length) {
      val l = data(i) & 0xFF; i += 1
      if (l == 128) eod = true
      else if (l < 128) {
        if (i + l + 1 > data.length) throw new IllegalArgumentException(
          "graft.DocumentExtract: truncated RunLength literal run")
        out.write(data, i, l + 1); i += l + 1
      } else {
        if (i >= data.length) throw new IllegalArgumentException(
          "graft.DocumentExtract: truncated RunLength repeat run")
        val b = data(i) & 0xFF; i += 1
        var n = 257 - l
        while (n > 0) { out.write(b); n -= 1 }
      }
      if (out.size > MaxInflatedBytes) throw new IllegalArgumentException(
        s"graft.DocumentExtract: RunLength stream inflates past $MaxInflatedBytes bytes")
    }
    out.toByteArray
  }

  /** Undo PNG row prediction (ISO 32000 §7.4.4.4, Predictor ≥ 10; the
    * layout real xref/object streams use): each encoded row is one
    * filter-tag byte (0 None / 1 Sub / 2 Up / 3 Average / 4 Paeth)
    * followed by `ceil(colors·bpc·columns/8)` predicted bytes, each
    * reconstructed against the previous byte-per-pixel within the row
    * and the decoded previous row. A short final row decodes as far as
    * the data goes (writers pad or end exactly).
    */
  private[graft] def pngUnpredict(data: Array[Byte], colors: Int, bpc: Int,
                                  columns: Int): Array[Byte] = {
    require(colors >= 1 && bpc >= 1 && columns >= 1,
      "graft.DocumentExtract: bad PNG predictor parameters")
    val bpp = math.max(1, (colors * bpc + 7) / 8)
    val rowLen = (colors * bpc * columns + 7) / 8
    val out = new java.io.ByteArrayOutputStream(data.length)
    val prev = new Array[Byte](rowLen)
    var i = 0
    while (i < data.length) {
      val ft = data(i) & 0xFF; i += 1
      val n = math.min(rowLen, data.length - i)
      val row = new Array[Byte](n)
      System.arraycopy(data, i, row, 0, n); i += n
      var j = 0
      while (j < n) {
        val a = if (j >= bpp) row(j - bpp) & 0xFF else 0
        val b = prev(j) & 0xFF
        val c = if (j >= bpp) prev(j - bpp) & 0xFF else 0
        val x = row(j) & 0xFF
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + ((a + b) >> 1)
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case other => throw new IllegalArgumentException(
            s"graft.DocumentExtract: unknown PNG predictor row filter $other")
        }
        row(j) = (v & 0xFF).toByte
        j += 1
      }
      out.write(row, 0, n)
      if (n == rowLen) System.arraycopy(row, 0, prev, 0, rowLen)
    }
    out.toByteArray
  }

  /** Undo TIFF horizontal differencing (Predictor 2) at 8 bits per
    * component: within each row, every byte adds its same-component
    * predecessor. Other bit depths fail loudly rather than emit garbage.
    */
  private[graft] def tiffUnpredict(data: Array[Byte], colors: Int, bpc: Int,
                                   columns: Int): Array[Byte] = {
    require(bpc == 8, "graft.DocumentExtract: TIFF predictor supported at " +
      "8 bits per component only")
    val rowLen = colors * columns
    val out = data.clone()
    var r = 0
    while (r < out.length) {
      val end = math.min(out.length, r + rowLen)
      var j = r + colors
      while (j < end) {
        out(j) = ((out(j) + out(j - colors)) & 0xFF).toByte; j += 1
      }
      r += rowLen
    }
    out
  }

  /** Parse `/DecodeParms` (or its `/DP` abbreviation) from the dict text
    * into per-filter `(Predictor, Colors, BitsPerComponent, Columns)`
    * tuples aligned with [[pdfFilters]]' positions — a single dict pairs
    * with a single filter, the array form pairs by index with `null`
    * holes. Indirect-ref values are unresolvable from the window and
    * read as absent (same rule as `/Filter`).
    */
  private[graft] def pdfDecodeParms(dict: String)
      : Seq[Option[(Int, Int, Int, Int)]] = {
    val scoped = scopeToLastObj(dict)
    val key = """/(?:DecodeParms|DP)(?![A-Za-z])""".r
    val at = key.findAllMatchIn(scoped).toSeq.lastOption match {
      case Some(m) => m.end
      case None    => return Seq.empty
    }
    var i = at
    while (i < scoped.length && scoped.charAt(i).isWhitespace) i += 1
    def parseDict(from: Int): (Option[(Int, Int, Int, Int)], Int) = {
      val end = scoped.indexOf(">>", from)
      if (end < 0) (None, scoped.length)
      else {
        val seg = scoped.substring(from, end)
        def num(k: String, d: Int): Int =
          s"/$k\\s+(\\d+)".r.findFirstMatchIn(seg)
            .map(_.group(1).toInt).getOrElse(d)
        (Some((num("Predictor", 1), num("Colors", 1),
          num("BitsPerComponent", 8), num("Columns", 1))), end + 2)
      }
    }
    if (i < scoped.length && scoped.charAt(i) == '[') {
      val close = scoped.indexOf(']', i)
      val limit = if (close < 0) scoped.length else close
      val items = mutable.ArrayBuffer.empty[Option[(Int, Int, Int, Int)]]
      var j = i + 1
      while (j < limit) {
        if (scoped.startsWith("null", j)) { items += None; j += 4 }
        else if (scoped.startsWith("<<", j)) {
          val (p, nj) = parseDict(j); items += p; j = nj
        } else j += 1
      }
      items.toSeq
    } else if (scoped.startsWith("<<", i)) Seq(parseDict(i)._1)
    else Seq.empty
  }

  /** Apply a stream's declared filter chain in order (Flate, LZW,
    * ASCII85, RunLength), each followed by its `/DecodeParms` predictor
    * when declared — PNG row predictors (10–15) and TIFF horizontal
    * differencing (2), the layouts real xref/object streams carry.
    * Unknown filters (DCTDecode, JBIG2Decode, …) pass the data through
    * untouched — they are image codecs, never text-bearing.
    */
  private[functions] def decodePdfStream(dict: String, data: Array[Byte]): Array[Byte] = {
    val filters = pdfFilters(dict)
    val parms = pdfDecodeParms(dict)
    filters.zipWithIndex.foldLeft(data) { case (d, (f, idx)) =>
      val decoded = f match {
        case "FlateDecode" | "Fl"     => inflate(d)
        case "ASCII85Decode" | "A85"  => ascii85Decode(d)
        case "LZWDecode" | "LZW"      => lzwDecode(d)
        case "RunLengthDecode" | "RL" => runLengthDecode(d)
        case _                        => d
      }
      val compressed = f == "FlateDecode" || f == "Fl" ||
        f == "LZWDecode" || f == "LZW"
      parms.lift(idx).flatten match {
        case Some((p, colors, bpc, cols)) if compressed && p >= 10 =>
          pngUnpredict(decoded, colors, bpc, cols)
        case Some((2, colors, bpc, cols)) if compressed =>
          tiffUnpredict(decoded, colors, bpc, cols)
        case _ => decoded
      }
    }
  }

  /** PDF: parse the ToUnicode CMaps first ([[pdfFontCmaps]]), then walk
    * `stream…endstream` segments, decode each through its declared filter
    * chain ([[decodePdfStream]]: Flate, LZW, ASCII85 — chained filters in
    * order), and run a text-operator scan over streams that contain
    * `BT`: literal `(…)` and hex `<…>` strings are buffered and emitted
    * on `Tj`/`'`/`"`/`TJ` — decoded through the CURRENT font's CMap when
    * one exists (`/Name size Tf` tracks the font), raw cp-per-byte
    * otherwise; `Td`/`TD`/`T*`/`ET` emit line breaks. Structural streams
    * (`/ObjStm` object streams, `/XRef` cross-reference streams) are
    * skipped here — their decoded bytes are table data that could contain
    * `BT` by coincidence; [[pdfFontCmaps]] reads the object streams.
    */
  private[functions] def pdf(bytes: Array[Byte]): String = {
    val cmaps = pdfFontCmaps(bytes)
    val out = new StringBuilder
    var i = 0
    var more = true
    while (more) {
      val s = indexOf(bytes, "stream", i)
      if (s < 0) more = false
      else {
        var ds = s + "stream".length
        if (ds < bytes.length && bytes(ds) == '\r') ds += 1
        if (ds < bytes.length && bytes(ds) == '\n') ds += 1
        val e = indexOf(bytes, "endstream", ds)
        if (e < 0) more = false
        else {
          val winStart = math.max(0, s - 800)
          val dict = scopeToLastObj(
            new String(bytes, winStart, s - winStart, StandardCharsets.ISO_8859_1))
          // Anchored to the /Type key so phantom "/ObjStm" text inside an
          // unscoped window (a >800-byte dict) can't misclassify a
          // content stream as structural.
          val structural =
            """/Type\s*/(ObjStm|XRef)\b""".r.findFirstIn(dict).isDefined
          val data =
            if (structural) Array.emptyByteArray
            else try decodePdfStream(dict, bytes.slice(ds, e))
            catch { case scala.util.control.NonFatal(_) => Array.emptyByteArray }
          val content = new String(data, StandardCharsets.ISO_8859_1)
          if (content.contains("BT")) {
            val text = pdfTextOps(content, cmaps)
            if (text.nonEmpty) {
              if (out.nonEmpty) out.append('\n')
              out.append(text)
            }
          }
          i = e + "endstream".length
        }
      }
    }
    out.toString.trim
  }

  /** One parsed ToUnicode CMap: the declared codespace ranges — each
    * `(widthBytes, lo, hi)` — plus `(widthBytes, code) → text` (a code may
    * map to several chars — ligatures). Mixed-width CMaps (a 1-byte and a
    * 2-byte range in one ToUnicode — legal per ISO 32000 §9.7.6.2) decode
    * correctly: [[decode]] matches each position against the ranges,
    * shortest declared width first, so codes of either width group
    * independently instead of one global width mis-slicing the other's.
    */
  private[graft] final case class PdfCmap(
      ranges: Seq[(Int, Int, Int)], map: Map[(Int, Int), String]) {
    private val widths: Seq[Int] = ranges.map(_._1).distinct.sorted

    /** Decode a raw string (each char = one BYTE, ISO-8859-1-preserved)
      * through the codespace ranges. Out-of-codespace bytes consume the
      * smallest declared width and drop; unmapped in-codespace codes drop
      * — the CMap is the font's own statement of its text semantics.
      */
    def decode(raw: String): String = {
      val sb = new StringBuilder
      var i = 0
      val n = raw.length
      while (i < n) {
        var w = 0
        var code = 0
        val it = widths.iterator
        while (w == 0 && it.hasNext) {
          val cand = it.next()
          if (i + cand <= n) {
            var c = 0
            var j = 0
            while (j < cand) { c = (c << 8) | (raw.charAt(i + j) & 0xFF); j += 1 }
            if (ranges.exists(r => r._1 == cand && c >= r._2 && c <= r._3)) {
              w = cand; code = c
            }
          }
        }
        if (w == 0) i += math.min(n - i, widths.headOption.getOrElse(1))
        else {
          map.get((w, code)).foreach(sb ++= _)
          i += w
        }
      }
      sb.toString
    }
  }

  /** Build font-resource-name → ToUnicode CMap for a whole PDF: scan the
    * `N 0 obj … endobj` table, splice in objects packed inside
    * `/Type /ObjStm` object streams (PDF ≥ 1.5 generators put font and
    * resource dicts there, where the raw scan can't see them — decode the
    * stream, read the `/First`-byte header of `num offset` pairs, slice
    * each contained object out), collect `/Font << /Fx N 0 R … >>`
    * resource entries (direct or one indirect hop), follow each font's
    * `/ToUnicode N 0 R` to its CMap stream (decoded through the full
    * declared filter chain — Flate, LZW, ASCII85), and parse it
    * ([[parseCmap]]). Subset fonts (Identity-H two-byte codes) are what
    * this exists for — without the CMap their glyph ids decode to
    * garbage, WITH it the extraction is exact. Xref-stream-only files
    * need no extra work: the object scan never reads the xref table.
    * Resource names are collected globally (machine-generated PDFs name
    * fonts consistently; a per-page name collision would need full
    * page-tree resolution — documented best-effort). Failures are
    * isolated per object stream and per font: one corrupt font or ObjStm
    * falls back alone while the rest keep their CMaps.
    */
  private[graft] def pdfFontCmaps(bytes: Array[Byte]): Map[String, PdfCmap] =
    try {
      val full = new String(bytes, StandardCharsets.ISO_8859_1)
      val objRe = """(?s)(\d+)\s+\d+\s+obj\b(.*?)endobj""".r
      val topObjs: Map[Int, String] = objRe.findAllMatchIn(full)
        .map(m => m.group(1).toInt -> m.group(2)).toMap
      def objStream(body: String): Option[String] = {
        val s = body.indexOf("stream")
        if (s < 0) None
        else {
          var ds = s + "stream".length
          if (ds < body.length && body.charAt(ds) == '\r') ds += 1
          if (ds < body.length && body.charAt(ds) == '\n') ds += 1
          val e = body.indexOf("endstream", ds)
          if (e < 0) None
          else {
            val raw = body.substring(ds, e)
            Some(new String(
              decodePdfStream(body.take(s), raw.getBytes(StandardCharsets.ISO_8859_1)),
              StandardCharsets.ISO_8859_1))
          }
        }
      }
      val objStmTypeRe = """/Type\s*/ObjStm\b""".r
      val spliced: Map[Int, String] = topObjs.valuesIterator
        .filter(b => objStmTypeRe.findFirstIn(b).isDefined).flatMap { body =>
          try {
            objStream(body).iterator.flatMap { dec =>
              val first = """/First\s+(\d+)""".r.findFirstMatchIn(body)
                .map(_.group(1).toInt).getOrElse(0)
              if (first <= 0 || first > dec.length) Iterator.empty
              else {
                val nums = dec.substring(0, first).trim.split("""\s+""")
                  .iterator.filter(_.nonEmpty)
                  .flatMap(s => scala.util.Try(s.toInt).toOption).toArray
                val pairs = nums.grouped(2)
                  .collect { case Array(a, b) => (a, b) }.toArray
                pairs.indices.iterator.flatMap { k =>
                  val (num, off) = pairs(k)
                  val start = first + off
                  val end =
                    if (k + 1 < pairs.length) first + pairs(k + 1)._2
                    else dec.length
                  if (start >= 0 && start <= end && end <= dec.length)
                    Iterator.single(num -> dec.substring(start, end))
                  else Iterator.empty
                }
              }
            }
          } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
        }.toMap
      val objs = spliced ++ topObjs // a top-level definition wins on collision
      val scanText =
        if (spliced.isEmpty) full
        else full + "\n" + spliced.valuesIterator.mkString("\n")
      val entryRe = """/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R""".r
      val fontDictRe = """(?s)/Font\s*<<(.*?)>>""".r
      val fontRefRe = """/Font\s+(\d+)\s+\d+\s+R""".r
      val entries =
        fontDictRe.findAllMatchIn(scanText).flatMap(m =>
          entryRe.findAllMatchIn(m.group(1))) ++
        fontRefRe.findAllMatchIn(scanText).flatMap(m =>
          objs.get(m.group(1).toInt).iterator
            .flatMap(entryRe.findAllMatchIn(_)))
      val toUniRe = """/ToUnicode\s+(\d+)\s+\d+\s+R""".r
      entries.flatMap { e =>
        try {
          for {
            fontBody <- objs.get(e.group(2).toInt)
            uni <- toUniRe.findFirstMatchIn(fontBody)
            cmapBody <- objs.get(uni.group(1).toInt)
            cmapText <- objStream(cmapBody)
            cmap <- parseCmap(cmapText)
          } yield e.group(1) -> cmap
        } catch { case scala.util.control.NonFatal(_) => None }
      }.toMap
    } catch { case scala.util.control.NonFatal(_) => Map.empty }

  /** Parse a ToUnicode CMap (ISO 32000 §9.10.3 / Adobe CMap syntax):
    * `begincodespacerange` declares the code widths — EVERY `<lo> <hi>`
    * pair becomes a `(widthBytes, lo, hi)` range, so mixed-width CMaps
    * keep both widths — `beginbfchar` lists `<src> <dst>` pairs,
    * `beginbfrange` lists `<lo> <hi> <dstStart>` runs (last code unit
    * increments) or `<lo> <hi> [<dst>…]` arrays; each mapping is keyed by
    * its OWN source width (the hex digit count), so a 1-byte `<41>` and a
    * 2-byte `<0041>` stay distinct codes. A width seen in a mapping but
    * missing from the declared codespace gets a synthesized full-coverage
    * range (real-world CMaps sometimes omit the declaration).
    * Destinations are UTF-16BE. None when nothing parses (an empty map
    * would silently drop all text — worse than the byte fallback).
    */
  private[graft] def parseCmap(text: String): Option[PdfCmap] = {
    // Manual UTF-16BE unit decode: a CharsetDecoder would replace LONE
    // surrogate halves with U+FFFD, but per-unit CMap targets are
    // legitimately lone halves that reassemble into astral chars when
    // consecutive codes concatenate at show time.
    def hexStr(h: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i + 4 <= h.length) {
        sb.append(Integer.parseInt(h.substring(i, i + 4), 16).toChar)
        i += 4
      }
      if (i < h.length) sb.append(Integer.parseInt(h.substring(i), 16).toChar)
      sb.toString
    }
    val m = mutable.HashMap.empty[(Int, Int), String]
    val ranges = mutable.ArrayBuffer.empty[(Int, Int, Int)]
    val hexRe = """<([0-9A-Fa-f]+)>""".r
    for (blk <- """(?s)begincodespacerange(.*?)endcodespacerange""".r
        .findAllMatchIn(text)) {
      val hs = hexRe.findAllMatchIn(blk.group(1)).map(_.group(1)).toSeq
      hs.grouped(2).foreach {
        case Seq(lo, hi) if lo.length == hi.length && lo.length >= 2 =>
          ranges += ((lo.length / 2,
            Integer.parseInt(lo, 16), Integer.parseInt(hi, 16)))
        case _ => ()
      }
    }
    for (blk <- """(?s)beginbfchar(.*?)endbfchar""".r.findAllMatchIn(text)) {
      val hs = hexRe.findAllMatchIn(blk.group(1)).map(_.group(1)).toSeq
      hs.grouped(2).foreach {
        case Seq(src, dst) =>
          m((src.length / 2, Integer.parseInt(src, 16))) = hexStr(dst)
        case _ => ()
      }
    }
    for (blk <- """(?s)beginbfrange(.*?)endbfrange""".r.findAllMatchIn(text)) {
      // Tokens in order: either <lo> <hi> <dst> or <lo> <hi> [ <d> … ].
      val tokRe = """<([0-9A-Fa-f]+)>|(\[)|(\])""".r
      val toks = tokRe.findAllMatchIn(blk.group(1)).toSeq
      var i = 0
      while (i + 1 < toks.length) {
        (Option(toks(i).group(1)), Option(toks(i + 1).group(1))) match {
          case (Some(lo), Some(hi)) =>
            val loI = Integer.parseInt(lo, 16)
            val hiI = math.min(Integer.parseInt(hi, 16), loI + 65535)
            val w = lo.length / 2
            if (i + 2 < toks.length && toks(i + 2).group(2) != null) {
              // array form: one dst per code until the closing bracket
              var j = i + 3
              var code = loI
              while (j < toks.length && toks(j).group(1) != null) {
                if (code <= hiI) { m((w, code)) = hexStr(toks(j).group(1)); code += 1 }
                j += 1
              }
              i = if (j < toks.length) j + 1 else j // skip the ']'
            } else if (i + 2 < toks.length && toks(i + 2).group(1) != null) {
              // run form: increment the LAST UTF-16 code unit of dstStart
              val dst = hexStr(toks(i + 2).group(1))
              var code = loI
              while (code <= hiI) {
                m((w, code)) =
                  if (dst.isEmpty) ""
                  else dst.dropRight(1) +
                    (dst.last + (code - loI)).toChar
                code += 1
              }
              i += 3
            } else i += 3
          case _ => i += 1
        }
      }
    }
    val declared = ranges.map(_._1).toSet
    val keyed: Map[(Int, Int), String] =
      if (ranges.isEmpty) {
        // No codespacerange declared at all: synthesize full coverage per
        // seen mapping width (real-world CMaps sometimes omit the block).
        for (w <- m.keysIterator.map(_._1).toSet if w >= 1 && w <= 4)
          ranges += ((w, 0, (1 << math.min(30, 8 * w)) - 1))
        m.toMap
      } else if (declared.size == 1) {
        // ONE declared width W: re-key sloppy undeclared-width mappings
        // (a `<41>` bfchar under a <0000> <FFFF> codespace — common
        // generator output) to W, the historic single-width decoder's
        // behavior. Synthesizing a 1-byte range instead would SHADOW the
        // declared wider range (shortest-width-first matching) and make
        // every declared-width mapping unreachable. Declared-width
        // mappings always win a re-key collision: a sloppy `<41>` must
        // never overwrite a genuine `<0041>` for the same code point.
        val w = declared.head
        val exact = m.iterator.filter(_._1._1 == w).toMap
        val rekeyed = m.iterator.collect {
          case ((pw, code), v) if pw != w && !exact.contains((w, code)) =>
            ((w, code), v)
        }.toMap
        exact ++ rekeyed
      } else m.toMap // genuine mixed-width: trust the declaration as-is
    if (keyed.isEmpty || ranges.isEmpty) None
    else Some(PdfCmap(ranges.toSeq, keyed))
  }

  /** Scan a decoded content stream for text-showing operators; `/Name …
    * Tf` switches the active CMap when the font has one.
    */
  private[functions] def pdfTextOps(
      cs: String, cmaps: Map[String, PdfCmap] = Map.empty): String = {
    val out = new StringBuilder
    val pending = mutable.ArrayBuffer.empty[String]
    var lastName: String = null
    var cur: Option[PdfCmap] = None
    def decode(raw: String): String = cur match {
      case None     => raw
      case Some(cm) => cm.decode(raw) // codespace-range grouping, per-width
    }
    def flushPending(): Unit = { pending.foreach(p => out ++= decode(p)); pending.clear() }
    def newline(): Unit =
      if (out.nonEmpty && out.last != '\n') out += '\n'
    var i = 0
    val n = cs.length
    while (i < n) {
      cs.charAt(i) match {
        case '(' =>
          val (str, ni) = pdfLiteralString(cs, i)
          pending += str; i = ni
        case '/' =>
          var j = i + 1
          while (j < n && !" \t\r\n/<>[]()%".contains(cs.charAt(j))) j += 1
          lastName = cs.substring(i + 1, j)
          i = j
        case '<' if i + 1 < n && cs.charAt(i + 1) != '<' =>
          val end = cs.indexOf('>', i + 1)
          if (end < 0) i = n
          else {
            val hex = cs.substring(i + 1, end).filter(c => Character.digit(c, 16) >= 0)
            val padded = if (hex.length % 2 == 1) hex + "0" else hex
            pending += padded.grouped(2).map(h => Integer.parseInt(h, 16).toChar).mkString
            i = end + 1
          }
        case c if c.isLetter || c == '\'' || c == '"' || c == '*' =>
          var j = i
          while (j < n && (cs.charAt(j).isLetterOrDigit || cs.charAt(j) == '\'' || cs.charAt(j) == '"' || cs.charAt(j) == '*')) j += 1
          cs.substring(i, j) match {
            case "Tj" | "TJ"      => flushPending()
            case "'" | "\""       => newline(); flushPending()
            case "Td" | "TD" | "T*" | "ET" => pending.clear(); newline()
            case "Tf"             =>
              pending.clear()
              cur = Option(lastName).flatMap(cmaps.get)
            case _                => pending.clear()
          }
          i = j
        case _ => i += 1
      }
    }
    out.toString.trim
  }

  /** Parse a PDF literal string starting at `(`; returns (text, next index).
    * Handles the escape set of ISO 32000 §7.3.4.2 including octal and
    * balanced nested parens.
    */
  private def pdfLiteralString(cs: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = start + 1
    var depth = 1
    val n = cs.length
    while (i < n && depth > 0) {
      cs.charAt(i) match {
        case '\\' if i + 1 < n =>
          cs.charAt(i + 1) match {
            case 'n' => sb += '\n'; i += 2
            case 'r' => sb += '\r'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'b' => sb += '\b'; i += 2
            case 'f' => sb += '\f'; i += 2
            case '(' => sb += '('; i += 2
            case ')' => sb += ')'; i += 2
            case '\\' => sb += '\\'; i += 2
            case '\n' => i += 2  // line continuation
            case '\r' => i += (if (i + 2 < n && cs.charAt(i + 2) == '\n') 3 else 2)
            case d if d >= '0' && d <= '7' =>
              var j = i + 1; var v = 0
              while (j < n && j < i + 4 && cs.charAt(j) >= '0' && cs.charAt(j) <= '7') {
                v = v * 8 + (cs.charAt(j) - '0'); j += 1
              }
              sb += v.toChar; i = j
            case other => sb += other; i += 2
          }
        case '(' => depth += 1; sb += '('; i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb += ')'
          i += 1
        case c => sb += c; i += 1
      }
    }
    (sb.toString, i)
  }

  // ------------------------------------------------------------- OLE2 / CFB

  /** Legacy binary Office text extraction (.doc/.ppt/.xls) — OLE2 Compound
    * File Binary containers ([MS-CFB]). The reference parses these via
    * `unstructured.partition` (`yamlpipe/components/sources.py:92-93`);
    * here the REAL format walk runs first for each family — Word 97
    * piece table ([[word97Text]]), PowerPoint record tree ([[pptText]]),
    * BIFF8 SST/LabelSst ([[biff8Text]]) — and a printable-run scrape of
    * the main document stream remains as the fallback for pre-97,
    * encrypted, or damaged files (old crawls carry those, and a
    * best-effort scrape beats a loud failure for corpus building; style
    * and font names survive the scrape, the dominant payload is body
    * text).
    */
  private[functions] def ole2BestEffort(ext: String, bytes: Array[Byte]): String = {
    val streams = ole2Streams(bytes)
    // Real Word 97 walk first ([MS-DOC]): FIB -> Clx in the 0Table/1Table
    // stream -> PlcPcd piece table -> per-piece cp1252/UTF-16LE decode.
    // Falls back to the printable-run scrape when the FIB is absent or
    // malformed (pre-97 files, encrypted docs, truncated containers).
    val real = ext match {
      case "doc" =>
        streams.find(_._1 == "WordDocument").map(_._2).flatMap { wd =>
          val tableName =
            if (wd.length > 0x0B && (u16At(wd, 0x0A) & 0x0200) != 0) "1Table"
            else "0Table"
          word97Text(wd, streams.find(_._1 == tableName).map(_._2))
            .orElse(word6Text(wd)) // pre-97 (Word 6.0/95) contiguous text
        }
      case "ppt" =>
        streams.find(_._1 == "PowerPoint Document").map(_._2).flatMap(pptText)
      case "xls" =>
        streams.find(s => s._1 == "Workbook" || s._1 == "Book").map(_._2)
          .flatMap(d => biff8Text(d).orElse(biff5Text(d))) // pre-97 inline strings
      case _ => None
    }
    if (real.isDefined) return real.get
    val preferred = ext match {
      case "doc" => streams.filter(_._1 == "WordDocument")
      case "ppt" => streams.filter(_._1 == "PowerPoint Document")
      case "xls" => streams.filter(s => s._1 == "Workbook" || s._1 == "Book")
      case _     => Nil
    }
    // Unknown layout -> scrape every user stream (names starting with a
    // control char are OLE plumbing: CompObj, SummaryInformation).
    val picked =
      if (preferred.nonEmpty) preferred
      else streams.filter(s => s._1.nonEmpty && s._1.charAt(0) >= ' ')
    picked.flatMap(s => printableRuns(s._2)).mkString("\n")
  }

  /** BIFF8 FilePass probe (record 0x002F in the Workbook globals
    * substream, [MS-XLS] 2.4.117): present iff the workbook's records
    * are encrypted. Stops at the first EOF record (0x000A) — FilePass
    * sits in the globals right after BOF; later substreams can't carry
    * one. Tolerant of a truncated tail (the caller decides "damaged").
    */
  private def biff8HasFilePass(data: Array[Byte]): Boolean = {
    var p = 0
    while (p + 4 <= data.length) {
      val t = u16At(data, p); val len = u16At(data, p + 2)
      if (t == 0x002F) return true
      if (t == 0x000A) return false
      if (p + 4 + len > data.length) return false
      p += 4 + len
    }
    false
  }

  /** Per-file fallback-reason contract for the legacy OLE2 formats: when
    * the REAL format walk cannot run and [[ole2BestEffort]] degrades to
    * the printable-run scrape, name WHY — so a crawl operator can route
    * encrypted files to a decryption step instead of lumping them with
    * plain old or broken ones. Returns null when the real walk succeeds
    * (and for non-OLE2 extensions); throws the same named error as
    * [[extract]] on a corrupt container (the note shares the
    * extraction's failure contract). Reasons:
    *
    *  - `"encrypted"` — an `EncryptionInfo` stream in the container
    *    (Office CryptoAPI / standard / agile encryption, [MS-OFFCRYPTO]
    *    2.3), the Word FIB's fEncrypted bit 0x0100, or a BIFF8 FilePass
    *    record.
    *  - `"pre-97"` — a Word 6.0/95 FIB (wIdent 0xA5DC) the contiguous
    *    walk declined BY DESIGN: fast-saved (complex bit 0x0004) or a
    *    DBCS East-Asian code page.
    *  - `"damaged"` — the main stream is missing or structurally
    *    unreadable for any other reason.
    */
  def extractNote(ext: String, path: String, bytes: Array[Byte]): String = {
    if (bytes == null) return null
    if (ext != "doc" && ext != "ppt" && ext != "xls") return null
    try {
      val streams = ole2Streams(bytes)
      def stream(n: String) = streams.find(_._1 == n).map(_._2)
      if (streams.exists(_._1 == "EncryptionInfo")) return "encrypted"
      ext match {
        case "doc" =>
          stream("WordDocument") match {
            case None => "damaged"
            case Some(wd) if wd.length < 0x20 => "damaged"
            case Some(wd) =>
              val ident = u16At(wd, 0)
              val flags = u16At(wd, 0x0A)
              if ((flags & 0x0100) != 0) "encrypted"
              else if (ident == 0xA5EC) {
                val tbl = if ((flags & 0x0200) != 0) "1Table" else "0Table"
                if (word97Text(wd, stream(tbl)).isDefined) null else "damaged"
              } else if (ident == 0xA5DC) {
                if (word6Text(wd).isDefined) null
                else {
                  val lang = u16At(wd, 6) & 0x3FF
                  val declinedByDesign = (flags & 0x0004) != 0 ||
                    lang == 0x04 || lang == 0x11 || lang == 0x12
                  if (declinedByDesign) "pre-97" else "damaged"
                }
              } else "damaged"
          }
        case "ppt" =>
          stream("PowerPoint Document") match {
            // PowerPoint 4.0/95 stores its deck in a "PP40" stream (no
            // public record spec — stays on the scrape, named pre-97)
            case None =>
              if (streams.exists(_._1 == "PP40")) "pre-97" else "damaged"
            case Some(d) => if (pptText(d).isDefined) null else "damaged"
          }
        case _ => // xls
          streams.find(x => x._1 == "Workbook" || x._1 == "Book").map(_._2) match {
            case None => "damaged"
            case Some(d) =>
              if (biff8HasFilePass(d)) "encrypted"
              else if (biff8Text(d).isDefined || biff5Text(d).isDefined) null
              else if (d.length >= 4 &&
                  Seq(0x0009, 0x0209, 0x0409).contains(u16At(d, 0)))
                "pre-97" // BIFF2/3/4 per-sheet files (Excel 2-4)
              else "damaged"
          }
      }
    } catch {
      case e: IllegalArgumentException if e.getMessage != null &&
          e.getMessage.startsWith("graft.DocumentExtract") => throw e
      case scala.util.control.NonFatal(e) =>
        throw new IllegalArgumentException(
          s"graft.DocumentExtract: failed to probe '$ext' container $path: " +
            s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }
  }

  /** Real Word 97 text extraction ([MS-DOC]): walk the variable-length FIB
    * in the WordDocument stream to FibRgFcLcb97's fcClx/lcbClx (pair 33),
    * read the Clx from the table stream (skipping any leading Prc grpprl
    * entries), then replay the Pcdt's PlcPcd piece table — each Pcd's
    * FcCompressed selects cp1252 bytes at fc/2 (bit 30 set) or UTF-16LE at
    * fc (clear), with piece lengths from consecutive CPs. The reference
    * gets the same walk from `unstructured.partition`
    * (`yamlpipe/components/sources.py:92-93`). Returns None on ANY
    * structural problem (pre-97 FIB, encrypted/truncated file,
    * out-of-bounds offsets) so the caller degrades to the printable-run
    * scrape instead of throwing — the fuzz contract (string or
    * IllegalArgumentException, never anything else) holds by construction.
    */
  private[functions] def word97Text(
      wd: Array[Byte], tableOpt: Option[Array[Byte]]): Option[String] = {
    if (wd.length < 0x22 || u16At(wd, 0) != 0xA5EC) return None
    // fEncrypted (FIB flag 0x0100): everything past the FIB base is RC4/
    // CryptoAPI ciphertext — fcClx would point into it and the walk could
    // "succeed" on garbage. Bail to the scrape; extractNote names the file.
    if ((u16At(wd, 0x0A) & 0x0100) != 0) return None
    // Variable FIB: base(32 B) | csw, FibRgW | cslw, FibRgLw | cbRgFcLcb,
    // FibRgFcLcbBlob.
    var o = 0x20
    o += 2 + u16At(wd, o) * 2
    if (o + 2 > wd.length) return None
    o += 2 + u16At(wd, o) * 4
    if (o + 2 > wd.length) return None
    val cbRgFcLcb = u16At(wd, o)
    o += 2
    if (cbRgFcLcb < 34 || o + 34 * 8 > wd.length) return None
    val fcClx = i32At(wd, o + 33 * 8)
    val lcbClx = i32At(wd, o + 33 * 8 + 4)
    val tbl = tableOpt.getOrElse(return None)
    if (fcClx < 0 || lcbClx <= 0 || fcClx.toLong + lcbClx > tbl.length)
      return None
    // Clx: zero or more Prc (clxt=0x01, cb: u16, grpprl bytes), then the
    // Pcdt (clxt=0x02, lcb: u32, PlcPcd).
    var p = fcClx
    val end = fcClx + lcbClx
    while (p < end && (tbl(p) & 0xFF) == 0x01) {
      if (p + 3 > end) return None
      p += 3 + u16At(tbl, p + 1)
    }
    if (p + 5 > end || (tbl(p) & 0xFF) != 0x02) return None
    val lcbPlc = i32At(tbl, p + 1)
    val plc = p + 5
    // PlcPcd: n+1 CPs (4 B each) then n Pcds (8 B each) -> lcb = 4 + 12n.
    if (lcbPlc < 16 || (lcbPlc - 4) % 12 != 0 || plc.toLong + lcbPlc > end)
      return None
    val n = (lcbPlc - 4) / 12
    val pcd0 = plc + (n + 1) * 4
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      val len = i32At(tbl, plc + (i + 1) * 4) - i32At(tbl, plc + i * 4)
      val fcRaw = i32At(tbl, pcd0 + i * 8 + 2)
      val fc = fcRaw & 0x3FFFFFFF
      if (len < 0 || sb.length.toLong + len > MaxInflatedBytes) return None
      if ((fcRaw & 0x40000000) != 0) { // fCompressed: cp1252 bytes at fc/2
        val off = fc / 2
        if (off.toLong + len > wd.length) return None
        var j = 0
        while (j < len) { sb.append(cp1252Char(wd(off + j) & 0xFF)); j += 1 }
      } else {
        if (fc.toLong + len * 2L > wd.length) return None
        sb.append(new String(wd, fc, len * 2, StandardCharsets.UTF_16LE))
      }
      i += 1
    }
    // Word stores paragraph marks as CR and table cell/row marks as 0x07.
    val text = sb.toString.replace('\r', '\n').replace('\u0007', '\n').trim
    if (text.nonEmpty) Some(text) else None
  }

  /** Real Word 6.0/95 text extraction (wIdent 0xA5DC, nFib 100..0x00C0 —
    * the pre-97 class the r14 verdict listed as scrape-only): in a
    * NON-complex (not fast-saved) document the body text is one
    * contiguous cp1252 byte run in the WordDocument stream from the
    * FIB's fcMin (offset 24) to fcMac (offset 28) — no piece table to
    * walk. Complex (fFlags bit 0x0004, fast-saved — the piece table lives
    * in the same stream with a different FIB layout) and encrypted (bit
    * 0x0100) files return None and keep the documented printable-run
    * scrape; so do DBCS East-Asian saves, EXPLICITLY: the FIB's `lid`
    * language id (offset 6) with a zh/ja/ko primary language marks a
    * double-byte code page, where a cp1252 per-byte decode would emit
    * mojibake — worse than the scrape those files got before this walk.
    * Same paragraph-mark canonicalization as [[word97Text]].
    */
  private[functions] def word6Text(wd: Array[Byte]): Option[String] = {
    if (wd.length < 0x20 || u16At(wd, 0) != 0xA5DC) return None
    val nFib = u16At(wd, 2)
    if (nFib < 100 || nFib >= 0x00C1) return None
    val primaryLang = u16At(wd, 6) & 0x3FF
    if (primaryLang == 0x04 || primaryLang == 0x11 || primaryLang == 0x12)
      return None // zh / ja / ko: DBCS code page, not cp1252
    val flags = u16At(wd, 0x0A)
    if ((flags & 0x0004) != 0 || (flags & 0x0100) != 0) return None
    val fcMin = i32At(wd, 24)
    val fcMac = i32At(wd, 28)
    if (fcMin < 0 || fcMac < fcMin || fcMac > wd.length) return None
    val sb = new java.lang.StringBuilder(fcMac - fcMin)
    var j = fcMin
    while (j < fcMac) { sb.append(cp1252Char(wd(j) & 0xFF)); j += 1 }
    val text = sb.toString.replace('\r', '\n').replace('\u0007', '\n').trim
    if (text.nonEmpty) Some(text) else None
  }

  /** Real PowerPoint 97 text extraction ([MS-PPT]): the PowerPoint Document
    * stream is a tree of records — 8-byte headers (recVerAndInstance u16,
    * recType u16, recLen u32) where recVer == 0xF marks a container whose
    * payload is nested records. Slide/shape text lives in TextCharsAtom
    * (0x0FA0, UTF-16LE) and TextBytesAtom (0x0FA8, cp1252) leaves; the walk
    * collects them in stream order. PPT uses CR for paragraph marks and VT
    * (0x0B) for soft line breaks — both normalize to '\n'. Returns None
    * when the record tree is malformed (records must tile their container
    * exactly) or carries no text atom, degrading to the printable-run
    * scrape — the fuzz contract holds by construction.
    */
  private[functions] def pptText(data: Array[Byte]): Option[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    def walk(start: Int, limit: Int, depth: Int): Boolean = {
      if (depth > 32) return false
      var p = start
      while (p + 8 <= limit) {
        val verInst = u16At(data, p)
        val recType = u16At(data, p + 2)
        val len = i32At(data, p + 4)
        val body = p + 8
        if (len < 0 || body.toLong + len > limit) return false
        if ((verInst & 0xF) == 0xF) {
          if (!walk(body, body + len, depth + 1)) return false
        } else if (recType == 0x0FA0) { // TextCharsAtom: UTF-16LE
          if (len % 2 != 0) return false
          out += new String(data, body, len, StandardCharsets.UTF_16LE)
        } else if (recType == 0x0FA8) { // TextBytesAtom: cp1252
          val sb = new java.lang.StringBuilder(len)
          var j = 0
          while (j < len) { sb.append(cp1252Char(data(body + j) & 0xFF)); j += 1 }
          out += sb.toString
        }
        p = body + len
      }
      p == limit
    }
    if (!walk(0, data.length, 0) || out.isEmpty) return None
    val text = out.map(_.replace('\r', '\n').replace('\u000B', '\n').trim)
      .filter(_.nonEmpty).mkString("\n\n")
    if (text.nonEmpty) Some(text) else None
  }

  /** Real BIFF8 .xls text extraction ([MS-XLS]): the Workbook stream is a
    * flat sequence of records (type u16, size u16, payload). Cell text
    * lives in the SST (0x00FC) — cstTotal, cstUnique, then cstUnique
    * XLUnicodeRichExtendedStrings, possibly split across Continue (0x003C)
    * records; when CHARACTER data spans a Continue boundary a fresh flags
    * byte (fHighByte may change mid-string) opens the continuation, while
    * fixed-size fields and rich/ext payloads never re-insert one. LabelSst
    * cells (0x00FD) then reference SST entries by index — when present,
    * text is emitted in CELL order (duplicates preserved); an SST with no
    * LabelSst cells dumps its unique strings in table order. Returns None
    * on any structural problem or when no text record exists, degrading to
    * the printable-run scrape.
    */
  private[functions] def biff8Text(data: Array[Byte]): Option[String] = {
    // Record index: (type, payloadStart, payloadLen) in stream order.
    val recs = mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var p = 0
    while (p + 4 <= data.length) {
      val t = u16At(data, p); val len = u16At(data, p + 2)
      if (p + 4 + len > data.length) return None
      recs += ((t, p + 4, len))
      p += 4 + len
    }
    if (p != data.length || recs.isEmpty) return None
    val sstAt = recs.indexWhere(_._1 == 0x00FC)
    if (sstAt < 0) return None
    // Logical reader over the SST record + its trailing Continue records.
    val parts = (recs(sstAt) +: recs.drop(sstAt + 1).takeWhile(_._1 == 0x003C))
      .map { case (_, s, l) => (s, l) }.toIndexedSeq
    var part = 0; var off = 0
    def remainingInPart: Int = parts(part)._2 - off
    def atEnd: Boolean = part >= parts.length ||
      (part == parts.length - 1 && remainingInPart == 0)
    // Fixed-size fields never span a Continue boundary ([MS-XLS] 2.1.4).
    def fixed(nBytes: Int): Int = {
      while (part < parts.length && remainingInPart == 0) { part += 1; off = 0 }
      if (part >= parts.length || remainingInPart < nBytes)
        return -1
      val at = parts(part)._1 + off
      off += nBytes
      nBytes match {
        case 1 => data(at) & 0xFF
        case 2 => u16At(data, at)
        case 4 => i32At(data, at)
      }
    }
    // Skip n bytes of non-character payload (rich runs / ext data): spans
    // Continue boundaries WITHOUT a re-inserted flags byte.
    def skip(n: Int): Boolean = {
      var left = n
      while (left > 0) {
        while (part < parts.length && remainingInPart == 0) { part += 1; off = 0 }
        if (part >= parts.length) return false
        val take = math.min(left, remainingInPart)
        off += take; left -= take
      }
      true
    }
    def readString(): String = {
      val cch = fixed(2); if (cch < 0) return null
      var flags = fixed(1); if (flags < 0) return null
      val cRun = if ((flags & 0x08) != 0) fixed(2) else 0
      val cbExt = if ((flags & 0x04) != 0) fixed(4) else 0
      if (cRun < 0 || cbExt < 0) return null
      val sb = new java.lang.StringBuilder(cch)
      var left = cch
      while (left > 0) {
        if (remainingInPart == 0) {
          // A continuation opened MID-CHARACTER-DATA restates the flags
          // byte (the writer may switch compression per segment). An
          // empty Continue here has nowhere to put it -> malformed.
          part += 1; off = 0
          if (part >= parts.length || parts(part)._2 < 1) return null
          flags = data(parts(part)._1) & 0xFF; off = 1
        }
        val wide = (flags & 0x01) != 0
        val width = if (wide) 2 else 1
        val avail = remainingInPart / width
        if (avail == 0) return null // split UTF-16 code unit
        val take = math.min(left, avail)
        val at = parts(part)._1 + off
        var j = 0
        while (j < take) {
          if (wide) sb.append(u16At(data, at + 2 * j).toChar)
          else sb.append(cp1252Char(data(at + j) & 0xFF))
          j += 1
        }
        off += take * width; left -= take
        if (left > 0 && remainingInPart > 0) return null // short read mid-part
      }
      if (!skip(4 * cRun) || !skip(cbExt)) return null
      sb.toString
    }
    val cstTotal = fixed(4) // informational (repeat count incl. duplicates)
    val cstUnique = fixed(4)
    if (cstTotal < 0 || cstUnique < 0 || cstUnique > data.length) return None
    val sst = new Array[String](cstUnique)
    var i = 0
    while (i < cstUnique) {
      val s = readString(); if (s == null) return None
      sst(i) = s; i += 1
    }
    if (!atEnd) return None // SST must consume its records exactly
    // Cell order when LabelSst records exist; SST table order otherwise.
    val cells = recs.collect {
      case (0x00FD, s, l) if l >= 10 => i32At(data, s + 6)
    }
    if (cells.exists(ix => ix < 0 || ix >= cstUnique)) return None
    val texts =
      (if (cells.nonEmpty) cells.map(sst) else sst.toSeq)
        .map(_.replace('\r', '\n').trim).filter(_.nonEmpty)
    if (texts.isEmpty) None else Some(texts.mkString("\n"))
  }

  /** Excel 5.0/95 (BIFF5) text: the pre-97 workbook layout keeps cell
    * strings INLINE — there is no SST — so text is the LABEL (0x0204) and
    * RSTRING (0x00D6) records' cp1252 payloads in stream order, with the
    * same per-cell normalization and join as [[biff8Text]]. Runs only
    * when the leading BOF declares vers 0x0500 ([MS-XLS] 2.4.21 BIFF5);
    * a FilePass record (0x002F) bails to the scrape so extractNote can
    * name the file "encrypted" rather than decode ciphertext.
    */
  private[functions] def biff5Text(data: Array[Byte]): Option[String] = {
    val recs = mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var p = 0
    while (p + 4 <= data.length) {
      val t = u16At(data, p); val len = u16At(data, p + 2)
      if (p + 4 + len > data.length) return None
      recs += ((t, p + 4, len))
      p += 4 + len
    }
    if (p != data.length || recs.isEmpty) return None
    val (t0, s0, l0) = recs.head
    if (t0 != 0x0809 || l0 < 2 || u16At(data, s0) != 0x0500) return None
    if (recs.exists(_._1 == 0x002F)) return None // FilePass: encrypted
    val texts = mutable.ArrayBuffer.empty[String]
    recs.foreach {
      case (0x0204 | 0x00D6, s, l) =>
        // rw(2) col(2) ixfe(2) cch(2) then cch cp1252 bytes; RSTRING
        // carries formatting runs AFTER the chars — ignored for text
        if (l < 8) return None
        val cch = u16At(data, s + 6)
        if (8 + cch > l) return None
        val sb = new java.lang.StringBuilder(cch)
        var j = 0
        while (j < cch) { sb.append(cp1252Char(data(s + 8 + j) & 0xFF)); j += 1 }
        texts += sb.toString
      case _ => ()
    }
    val cleaned = texts.map(_.replace('\r', '\n').trim).filter(_.nonEmpty)
    if (cleaned.isEmpty) None else Some(cleaned.mkString("\n"))
  }

  private def u16At(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def i32At(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  private val EndOfChain = 0xFFFFFFFE
  private val MaxChainSectors = 1 << 20 // 512 MiB of 512 B sectors — cycle guard

  /** Parse a CFB container into its (name, bytes) streams: header ->
    * DIFAT -> FAT -> directory; per-stream read follows the FAT chain, or
    * the mini-FAT chain inside the root's mini stream for streams under
    * the mini cutoff. Bounds- and cycle-guarded throughout (a truncated
    * or crafted file fails loudly per file, never loops or OOMs).
    */
  private[functions] def ole2Streams(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)
    if (bytes.length < 512 || !bytes.take(8).sameElements(magic))
      throw new IllegalArgumentException(
        "not an OLE2 compound file (bad magic)")
    val sectorSize = 1 << u16At(bytes, 30)
    val miniSize = 1 << u16At(bytes, 32)
    val miniCutoff = i32At(bytes, 56)
    require(sectorSize >= 128 && sectorSize <= 4096 && miniSize >= 16 && miniSize <= sectorSize,
      "implausible CFB sector sizes")
    // Header occupies 512 bytes; sector n starts at (n+1)*sectorSize for
    // both v3 (512 B) and v4 (4096 B) layouts.
    def sector(n: Int): Array[Byte] = {
      val off = (n.toLong + 1) * sectorSize
      if (n < 0 || off + sectorSize > bytes.length)
        throw new IllegalArgumentException(
          s"CFB sector $n out of bounds (truncated file?)")
      java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + sectorSize)
    }
    def ints(sec: Array[Byte]): Array[Int] =
      Array.tabulate(sec.length / 4)(i => i32At(sec, i * 4))
    // DIFAT: 109 header entries + chained DIFAT sectors (last int = next).
    val fatSectIds = mutable.ArrayBuffer.empty[Int]
    for (i <- 0 until 109) {
      val e = i32At(bytes, 76 + 4 * i)
      if (e >= 0) fatSectIds += e
    }
    var difat = i32At(bytes, 68)
    val difatSeen = mutable.HashSet.empty[Int]
    while (difat != EndOfChain && difat >= 0) {
      // Cycle guard like chain(): a self-referencing DIFAT sector would
      // otherwise re-append the same FAT ids until the id list (and then
      // the flattened FAT) OOMs — the one loop the chain() guard missed.
      if (!difatSeen.add(difat))
        throw new IllegalArgumentException("corrupt CFB DIFAT chain (cycle)")
      val es = ints(sector(difat))
      es.dropRight(1).foreach(e => if (e >= 0) fatSectIds += e)
      difat = es.last
    }
    val fat: Array[Int] = fatSectIds.toArray.flatMap(s => ints(sector(s)))
    def chain(start: Int, table: Array[Int]): Seq[Int] = {
      val out = mutable.ArrayBuffer.empty[Int]
      val seen = mutable.HashSet.empty[Int]
      var cur = start
      while (cur != EndOfChain && cur >= 0) {
        if (cur >= table.length || !seen.add(cur) || out.length >= MaxChainSectors)
          throw new IllegalArgumentException(
            "corrupt CFB allocation chain")
        out += cur
        cur = table(cur)
      }
      out.toSeq
    }
    val dirBytes: Array[Byte] = chain(i32At(bytes, 48), fat).toArray.flatMap(sector)
    final case class Entry(name: String, objType: Int, start: Int, size: Long)
    val entries = (0 until dirBytes.length / 128).map { i =>
      val o = i * 128
      val nameLen = u16At(dirBytes, o + 64) // bytes incl. UTF-16 terminator
      val name =
        if (nameLen < 2 || nameLen > 64) ""
        else new String(dirBytes, o, nameLen - 2, StandardCharsets.UTF_16LE)
      Entry(name, dirBytes(o + 66) & 0xFF, i32At(dirBytes, o + 116),
        i32At(dirBytes, o + 120) & 0xFFFFFFFFL)
    }
    val root = entries.find(_.objType == 5)
    // Mini stream: the root entry's own FAT chain; mini-FAT maps 64 B cells.
    lazy val miniStream: Array[Byte] = root match {
      case Some(r) if r.start != EndOfChain && r.start >= 0 =>
        chain(r.start, fat).toArray.flatMap(sector)
      case _ => Array.emptyByteArray
    }
    lazy val miniFat: Array[Int] = {
      val first = i32At(bytes, 60)
      if (first == EndOfChain || first < 0) Array.emptyIntArray
      else chain(first, fat).toArray.flatMap(s => ints(sector(s)))
    }
    def readStream(e: Entry): Array[Byte] = {
      val total = new java.io.ByteArrayOutputStream()
      if (e.size == 0) ()
      else if (e.size < miniCutoff) {
        chain(e.start, miniFat).foreach { m =>
          val off = m.toLong * miniSize
          if (off + miniSize > miniStream.length)
            throw new IllegalArgumentException(
              "CFB mini sector out of bounds")
          total.write(miniStream, off.toInt, miniSize)
        }
      } else chain(e.start, fat).foreach(s => total.write(sector(s)))
      val all = total.toByteArray
      if (all.length < e.size)
        throw new IllegalArgumentException(
          "CFB stream shorter than directory size")
      java.util.Arrays.copyOfRange(all, 0, e.size.toInt)
    }
    entries.filter(e => e.objType == 2 && e.size > 0 && e.size <= MaxInflatedBytes)
      .map(e => e.name -> readStream(e))
  }

  /** Printable-run extraction over raw stream bytes, in BOTH encodings the
    * legacy formats mix: cp1252 single-byte runs and UTF-16LE runs. The
    * UTF-16 acceptance set is Latin + common typographic punctuation ONLY
    * — a wider set (e.g. CJK) would re-admit cp1252 byte PAIRS as fake
    * ideographs, duplicating every 8-bit run as garbage. Conversely,
    * ASCII-in-UTF-16 shows the 8-bit scan interleaved NULs, so its runs
    * stay below `minRun`. Runs must contain a letter to drop length/offset
    * tables that happen to land in the printable byte range.
    */
  private[functions] def printableRuns(data: Array[Byte], minRun: Int = 5): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    def keep(sb: java.lang.StringBuilder): Unit = {
      if (sb.length >= minRun && (0 until sb.length).exists(i => Character.isLetter(sb.charAt(i))))
        out += sb.toString.trim
      sb.setLength(0)
    }
    def p8(b: Int): Boolean =
      (b >= 0x20 && b <= 0x7E) || b == 0x09 || (b >= 0xC0 && b <= 0xFF)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < data.length) {
      val b = data(i) & 0xFF
      if (p8(b)) sb.append(cp1252Char(b)) else keep(sb)
      i += 1
    }
    keep(sb)
    def p16(c: Int): Boolean =
      (c >= 0x20 && c <= 0x7E) || c == 0x09 || (c >= 0xA0 && c <= 0x24F) ||
        c == 0x2013 || c == 0x2014 || c == 0x2018 || c == 0x2019 ||
        c == 0x201C || c == 0x201D || c == 0x2026
    i = 0
    while (i + 1 < data.length) {
      val c = u16At(data, i)
      if (p16(c)) sb.append(c.toChar) else keep(sb)
      i += 2
    }
    keep(sb)
    out.toSeq
  }

  private def cp1252Char(b: Int): Char =
    if (b < 0x80 || b >= 0xA0) b.toChar
    else new String(Array(b.toByte), java.nio.charset.Charset.forName("windows-1252")).charAt(0)
}
