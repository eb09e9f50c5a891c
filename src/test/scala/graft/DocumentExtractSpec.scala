package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.{Deflater, ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DocumentExtract, LegacyOfficeFixtures}
import graft.sources.LocalFileSource

/** Offline document extraction (reference `sources.py:92-93` — the
  * `unstructured.partition` any-format dispatch). Fixtures are built
  * programmatically: OOXML/ODF/EPUB are just zip+XML, PDF is authored as a
  * minimal spec-conformant byte stream (raw and FlateDecode variants).
  */
class DocumentExtractSpec extends AnyFunSuite with SparkTestBase {

  private def zip(entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes(StandardCharsets.UTF_8))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  // ------------------------------------------------------------------ docx

  private val docxBytes = zip(
    "[Content_Types].xml" -> "<Types/>",
    "word/document.xml" ->
      """<?xml version="1.0"?><w:document xmlns:w="http://w"><w:body>
        |<w:p><w:r><w:t xml:space="preserve">Hello </w:t></w:r><w:r><w:t>World</w:t></w:r></w:p>
        |<w:p><w:r><w:t>Left</w:t></w:r><w:r><w:tab/><w:t>right &amp; entity</w:t></w:r></w:p>
        |<w:p><w:r><w:t>line one</w:t><w:br/><w:t>line two</w:t></w:r></w:p>
        |<w:p/>
        |</w:body></w:document>""".stripMargin)

  test("docx: runs, tabs, breaks, entities; paragraphs joined with \\n\\n") {
    assert(DocumentExtract.extract("docx", "t.docx", docxBytes) ==
      "Hello World\n\nLeft\tright & entity\n\nline one\nline two")
  }

  // ------------------------------------------------------------------ pptx

  test("pptx: slides in natural order, a:p lines within a slide") {
    val bytes = zip(
      "ppt/slides/slide2.xml" ->
        "<p:sld xmlns:a=\"http://a\"><a:p><a:r><a:t>second slide</a:t></a:r></a:p></p:sld>",
      "ppt/slides/slide10.xml" ->
        "<p:sld><a:p><a:r><a:t>tenth slide</a:t></a:r></a:p></p:sld>",
      "ppt/slides/slide1.xml" ->
        ("<p:sld><a:p><a:r><a:t>title </a:t></a:r><a:r><a:t>text</a:t></a:r></a:p>" +
         "<a:p><a:r><a:t>subtitle</a:t></a:r></a:p></p:sld>"))
    assert(DocumentExtract.extract("pptx", "t.pptx", bytes) ==
      "title text\nsubtitle\n\nsecond slide\n\ntenth slide")
  }

  // ------------------------------------------------------------------ xlsx

  test("xlsx: shared strings, inline strings, literal values; rows tab-joined") {
    val bytes = zip(
      "xl/sharedStrings.xml" ->
        "<sst><si><t>name</t></si><si><t>wid</t><t>get</t></si></sst>",
      "xl/worksheets/sheet1.xml" ->
        """<worksheet><sheetData>
          |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
          |<row r="2"><c r="A2" t="inlineStr"><is><t>inline</t></is></c><c r="B2"><v>42</v></c></row>
          |</sheetData></worksheet>""".stripMargin)
    assert(DocumentExtract.extract("xlsx", "t.xlsx", bytes) ==
      "name\twidget\ninline\t42")
  }

  test("xlsx: omitted and self-closed cells keep their column positions") {
    val bytes = zip(
      "xl/sharedStrings.xml" -> "<sst><si><t>x</t></si><si><t>y</t></si></sst>",
      "xl/worksheets/sheet1.xml" ->
        // row 1: B omitted entirely; row 2: B styled-but-empty self-closed;
        // row 3: A and B both omitted — LEADING empties must survive too
        """<worksheet><sheetData>
          |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1" t="s"><v>1</v></c></row>
          |<row r="2"><c r="A2"><v>1</v></c><c r="B2" s="1"/><c r="C2"><v>3</v></c></row>
          |<row r="3"><c r="C3"><v>7</v></c></row>
          |</sheetData></worksheet>""".stripMargin)
    assert(DocumentExtract.extract("xlsx", "t.xlsx", bytes) == "x\t\ty\n1\t\t3\n\t\t7")
  }

  // ------------------------------------------------------------------- odt

  test("odt: text:p / text:h paragraphs with tabs and line breaks") {
    val bytes = zip("content.xml" ->
      ("<office:document-content><office:body><office:text>" +
       "<text:h text:outline-level=\"1\">Heading</text:h>" +
       "<text:p>alpha<text:tab/>beta<text:line-break/>gamma</text:p>" +
       "<text:p><text:span>nested </text:span>span</text:p>" +
       "</office:text></office:body></office:document-content>"))
    assert(DocumentExtract.extract("odt", "t.odt", bytes) ==
      "Heading\n\nalpha\tbeta\ngamma\n\nnested span")
  }

  test("ods: rows tab-joined, columns-repeated positions, covered cells, " +
      "trailing empties trimmed, tables blank-line separated") {
    val bytes = zip("content.xml" ->
      ("<office:document-content><office:spreadsheet>" +
       "<table:table table:name=\"A\"><table:table-row>" +
       "<table:table-cell><text:p>x</text:p></table:table-cell>" +
       "<table:table-cell table:number-columns-repeated=\"2\"/>" +
       "<table:table-cell><text:p>y</text:p></table:table-cell>" +
       "</table:table-row><table:table-row>" +
       "<table:table-cell><text:p>1</text:p></table:table-cell>" +
       "<table:covered-table-cell/>" +
       "<table:table-cell><text:p>3</text:p><text:p>4</text:p></table:table-cell>" +
       "<table:table-cell table:number-columns-repeated=\"9999\"/>" +
       "</table:table-row></table:table>" +
       "<table:table table:name=\"B\"><table:table-row>" +
       "<table:table-cell><text:p>solo</text:p></table:table-cell>" +
       "</table:table-row></table:table>" +
       "</office:spreadsheet></office:document-content>"))
    assert(DocumentExtract.extract("ods", "t.ods", bytes) ==
      "x\t\t\ty\n1\t\t3\n4\n\nsolo")
  }

  test("odp: per-page paragraphs, pages blank-line separated") {
    val bytes = zip("content.xml" ->
      ("<office:document-content><office:presentation>" +
       "<draw:page draw:name=\"p1\"><draw:frame><draw:text-box>" +
       "<text:p>Title</text:p><text:p>bullet one</text:p>" +
       "</draw:text-box></draw:frame></draw:page>" +
       "<draw:page draw:name=\"p2\"><draw:frame><draw:text-box>" +
       "<text:p>second<text:tab/>slide</text:p>" +
       "</draw:text-box></draw:frame></draw:page>" +
       "</office:presentation></office:document-content>"))
    assert(DocumentExtract.extract("odp", "t.odp", bytes) ==
      "Title\nbullet one\n\nsecond\tslide")
  }

  test("macro-enabled and template extensions dispatch to the same parsers") {
    import graft.functions.OdfFixtures
    val docXml = "<w:document><w:body><w:p><w:r><w:t>macro doc</w:t></w:r></w:p></w:body></w:document>"
    for (ext <- Seq("docm", "dotx", "dotm"))
      assert(DocumentExtract.extract(ext, s"t.$ext",
        zip("word/document.xml" -> docXml)) == "macro doc", ext)
    for (ext <- Seq("ott"))
      assert(DocumentExtract.extract(ext, s"t.$ext", OdfFixtures.odt("tpl")) == "tpl")
    for (ext <- Seq("ots"))
      assert(DocumentExtract.extract(ext, s"t.$ext",
        OdfFixtures.ods(Seq(Seq("a", "b")))) == "a\tb")
    for (ext <- Seq("otp", "odg"))
      assert(DocumentExtract.extract(ext, s"t.$ext",
        OdfFixtures.odp(Seq(Seq("page")))) == "page", ext)
  }

  test("odf fixtures: writers round-trip specials through ods/odp/odt") {
    import graft.functions.OdfFixtures
    val tricky = "a&b <c> \"d\" 'e'\ttab\nline"
    assert(DocumentExtract.extract("odt", "f.odt", OdfFixtures.odt(tricky)) == tricky)
    assert(DocumentExtract.extract("ods", "f.ods",
      OdfFixtures.ods(Seq(Seq("a", "b"), Seq(tricky)))) == "a\tb\n" + tricky)
    assert(DocumentExtract.extract("odp", "f.odp",
      OdfFixtures.odp(Seq(Seq("one", "two"), Seq(tricky)))) == "one\ntwo\n\n" + tricky)
  }

  // ------------------------------------------------------------------ epub

  test("epub: xhtml chapters tag-stripped, scripts dropped, natural order") {
    val bytes = zip(
      "OEBPS/chap2.xhtml" -> "<html><body><p>Chapter two.</p></body></html>",
      "OEBPS/chap1.xhtml" ->
        "<html><head><style>p{color:red}</style></head><body><h1>One</h1><p>First &amp; foremost.</p></body></html>",
      "mimetype" -> "application/epub+zip")
    assert(DocumentExtract.extract("epub", "t.epub", bytes) ==
      "One\nFirst & foremost.\n\nChapter two.")
  }

  // ------------------------------------------------------------------- rtf

  test("rtf: control words stripped, destinations skipped, par/tab/hex/unicode") {
    // built by concatenation: scalac expands \-u escapes even in raw strings
    val rtf = "{\\rtf1\\ansi{\\fonttbl{\\f0 Times New Roman;}}{\\*\\generator Acme 1.0;}" +
      "\\f0\\fs24 Hello\\par Caf\\'e9 time\\par A\\tab B\\par " +
      "\\" + "u8212?dash{\\i italic} end\\par}"
    assert(DocumentExtract.extract("rtf", "t.rtf", rtf.getBytes(StandardCharsets.ISO_8859_1)) ==
      "Hello\nCafé time\nA\tB\n—dashitalic end")
    // \uc0 = no fallback byte after \uN (the next char is REAL text);
    // uppercase hex escapes decode; Word-style escape fallbacks consume
    val uc0 = "{\\rtf1\\ansi\\uc0 caf\\'E9 " + "\\" + "u8217 s}"
    assert(DocumentExtract.extract("rtf", "t.rtf", uc0.getBytes(StandardCharsets.ISO_8859_1)) ==
      "café ’s")
  }

  // ------------------------------------------------------------------- eml

  test("eml: subject + plain body, headers unfolded") {
    val eml = "From: a@example.com\r\nSubject: Weekly\r\n sync notes\r\nContent-Type: text/plain; charset=utf-8\r\n\r\nAgenda:\r\n- item one\r\n"
    assert(DocumentExtract.extract("eml", "m.eml", eml.getBytes(StandardCharsets.ISO_8859_1)) ==
      "Weekly sync notes\n\nAgenda:\n- item one")
  }

  test("eml: multipart prefers text/plain; qp and base64 decode; RFC2047 subject") {
    val plainQp = "Caf=C3=A9 plans=\nfor friday"
    val htmlB64 = java.util.Base64.getEncoder.encodeToString(
      "<html><p>Café plans</p><p>for friday</p></html>".getBytes(StandardCharsets.UTF_8))
    val eml =
      "Subject: =?UTF-8?B?UsOpc3Vtw6k=?= =?UTF-8?Q?_attached?=\r\n" +
      "Content-Type: multipart/alternative; boundary=\"BB\"\r\n\r\n" +
      "--BB\r\nContent-Type: text/plain; charset=utf-8\r\nContent-Transfer-Encoding: quoted-printable\r\n\r\n" +
      plainQp + "\r\n" +
      "--BB\r\nContent-Type: text/html; charset=utf-8\r\nContent-Transfer-Encoding: base64\r\n\r\n" +
      htmlB64 + "\r\n--BB--\r\n"
    assert(DocumentExtract.extract("eml", "m.eml", eml.getBytes(StandardCharsets.ISO_8859_1)) ==
      "Résumé attached\n\nCafé plansfor friday")
  }

  test("eml: html-only multipart falls back to stripped html") {
    val eml =
      "Subject: s\r\nContent-Type: multipart/mixed; boundary=ZZ\r\n\r\n" +
      "--ZZ\r\nContent-Type: text/html\r\n\r\n<p>only html</p>\r\n--ZZ--\r\n"
    assert(DocumentExtract.extract("eml", "m.eml", eml.getBytes(StandardCharsets.ISO_8859_1)) ==
      "s\n\nonly html")
  }

  test("eml: headerless part keeps its body; mid-line boundary text is not a delimiter") {
    // headerless part (legal, RFC 2046) defaults to text/plain
    val eml =
      "Subject: s\r\nContent-Type: multipart/mixed; boundary=QQ\r\n\r\n" +
      "--QQ\r\n\r\nMeeting moved --QQ not a delimiter\r\n--QQ--\r\n"
    assert(DocumentExtract.extract("eml", "m.eml", eml.getBytes(StandardCharsets.ISO_8859_1)) ==
      "s\n\nMeeting moved --QQ not a delimiter")
  }

  // ------------------------------------------------------------------- pdf

  private def pdfBytes(flate: Boolean): Array[Byte] = {
    val content = "BT /F1 12 Tf 72 720 Td (Hello \\(PDF\\)) Tj T* (Second line) Tj " +
      "T* [(ar) -120 (ray)] TJ ET"
    val payload =
      if (!flate) content.getBytes(StandardCharsets.ISO_8859_1)
      else {
        val d = new Deflater()
        d.setInput(content.getBytes(StandardCharsets.ISO_8859_1)); d.finish()
        val buf = new Array[Byte](4096)
        val m = d.deflate(buf); d.end()
        java.util.Arrays.copyOf(buf, m)
      }
    val filter = if (flate) " /Filter /FlateDecode" else ""
    val bos = new ByteArrayOutputStream()
    bos.write(s"%PDF-1.4\n1 0 obj\n<< /Length ${payload.length}$filter >>\nstream\n"
      .getBytes(StandardCharsets.ISO_8859_1))
    bos.write(payload)
    bos.write("\nendstream\nendobj\ntrailer\n<<>>\n%%EOF".getBytes(StandardCharsets.ISO_8859_1))
    bos.toByteArray
  }

  test("pdf: raw content stream Tj/TJ text with escapes and line breaks") {
    assert(DocumentExtract.extract("pdf", "t.pdf", pdfBytes(flate = false)) ==
      "Hello (PDF)\nSecond line\narray")
  }

  test("pdf: FlateDecode stream inflates and extracts identically") {
    assert(DocumentExtract.extract("pdf", "t.pdf", pdfBytes(flate = true)) ==
      "Hello (PDF)\nSecond line\narray")
  }

  test("pdf: hex strings and quote operator") {
    // ' = move to next line THEN show its string; hex strings decode bytewise
    val content = "BT (alpha) Tj (beta) ' <48454C4C4F> Tj ET"
    val bytes = (s"%PDF-1.4\n1 0 obj\n<< /Length ${content.length} >>\nstream\n" +
      content + "\nendstream\nendobj").getBytes(StandardCharsets.ISO_8859_1)
    assert(DocumentExtract.extract("pdf", "t.pdf", bytes) == "alpha\nbetaHELLO")
  }

  test("pdf: subset font decodes through its ToUnicode CMap (Identity-H)") {
    // A Type0 subset font whose 2-byte glyph codes mean nothing without
    // the CMap: bfchar maps 0001->H 0002->i, an array bfrange maps
    // 0010..0011 -> [space, !], a run bfrange maps 0020..0022 -> A..C,
    // and one mapping is a multi-char ligature (0003 -> ffi as 3 chars).
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |1 begincodespacerange <0000> <FFFF> endcodespacerange
        |3 beginbfchar
        |<0001> <0048>
        |<0002> <0069>
        |<0003> <006600660069>
        |endbfchar
        |2 beginbfrange
        |<0010> <0011> [<0020> <0021>]
        |<0020> <0022> <0041>
        |endbfrange
        |endcmap""".stripMargin
    val content = "BT /F7 12 Tf <0001 0002 0003 0010 0020 0021 0022 0011> Tj ET"
    val plain = "BT /F1 10 Tf (plain latin) Tj ET"
    def obj(n: Int, body: String) = s"$n 0 obj\n$body\nendobj\n"
    val pdf = "%PDF-1.4\n" +
      obj(1, "<< /Type /Page /Resources << /Font << /F7 2 0 R >> >> >>") +
      obj(2, "<< /Type /Font /Subtype /Type0 /BaseFont /AAAAAA+Sub " +
        "/Encoding /Identity-H /ToUnicode 3 0 R >>") +
      obj(3, s"<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream") +
      obj(4, s"<< /Length ${content.length} >>\nstream\n$content\nendstream") +
      obj(5, s"<< /Length ${plain.length} >>\nstream\n$plain\nendstream")
    val got = DocumentExtract.extract("pdf", "sub.pdf",
      pdf.getBytes(StandardCharsets.ISO_8859_1))
    assert(got == "Hiffi ABC!\nplain latin", got)
  }

  test("pdf: indirect /Font resource dict and unmapped codes drop") {
    val cmap = "begincmap\n1 begincodespacerange <00> <FF> endcodespacerange\n" +
      "1 beginbfchar <41> <005A> endbfchar\nendcmap" // 1-byte codes: A -> Z
    val content = "BT /G1 9 Tf (AB) Tj ET" // B (0x42) is unmapped -> drops
    def obj(n: Int, body: String) = s"$n 0 obj\n$body\nendobj\n"
    val pdf = "%PDF-1.4\n" +
      obj(1, "<< /Type /Page /Resources << /Font 6 0 R >> >>") +
      obj(6, "<< /G1 2 0 R >>") +
      obj(2, "<< /Type /Font /ToUnicode 3 0 R >>") +
      obj(3, s"<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream") +
      obj(4, s"<< /Length ${content.length} >>\nstream\n$content\nendstream")
    val got = DocumentExtract.extract("pdf", "ind.pdf",
      pdf.getBytes(StandardCharsets.ISO_8859_1))
    assert(got == "Z", got)
  }

  test("doc: Word 95 non-complex contiguous text walks for real; " +
      "fast-saved flag falls back to the scrape") {
    val t = "[Word 95 café test — contiguous]"
    val got = DocumentExtract.extract("doc", "w95.doc",
      LegacyOfficeFixtures.word95Doc(t))
    assert(got == t, got)
    // cp1252-unmappable chars downconvert to '?' exactly like Word 95 did
    val uni = "[mixed 中文 and emoji 😀]"
    val cp = java.nio.charset.Charset.forName("windows-1252")
    assert(DocumentExtract.extract("doc", "w95.doc",
      LegacyOfficeFixtures.word95Doc(uni)) == new String(uni.getBytes(cp), cp))
    // flipping fComplex (fast-saved) must route to the scrape, not the
    // contiguous walk: the stream starts at CFB sector 2 (byte 1536)
    val fast = LegacyOfficeFixtures.word95Doc("[scrape me maybe]")
    fast(1536 + 0x0A) = (fast(1536 + 0x0A) | 0x04).toByte
    val scraped = DocumentExtract.extract("doc", "w95c.doc", fast)
    assert(scraped.contains("scrape me maybe"), scraped)
  }

  test("ole2: extractNote names encrypted vs pre-97 vs damaged; clean " +
      "walks carry no note") {
    import LegacyOfficeFixtures.cfb
    def wdBytes(ident: Int, nFib: Int, flags: Int, lid: Int = 0x0409)
        : Array[Byte] = {
      val b = new Array[Byte](1024)
      def u16(o: Int, v: Int): Unit = {
        b(o) = (v & 0xFF).toByte; b(o + 1) = ((v >> 8) & 0xFF).toByte
      }
      u16(0, ident); u16(2, nFib); u16(6, lid); u16(0x0A, flags)
      b
    }
    def note(ext: String, bytes: Array[Byte]): String =
      DocumentExtract.extractNote(ext, s"f.$ext", bytes)
    // clean containers: every real walk succeeds, note is null
    assert(note("doc", LegacyOfficeFixtures.word97Doc("Hello walk")) == null)
    assert(note("doc", LegacyOfficeFixtures.word95Doc("Hello 95")) == null)
    assert(note("ppt", LegacyOfficeFixtures.ppt97("Slide text")) == null)
    assert(note("xls", LegacyOfficeFixtures.biff8Xls("Cell text")) == null)
    assert(note("pdf", Array[Byte](1, 2)) == null) // non-OLE2: no probe
    // encrypted Word 97 (FIB fEncrypted 0x0100): named, and the walk
    // must NOT decode ciphertext — extract degrades to the scrape
    val enc97 = cfb("WordDocument" -> wdBytes(0xA5EC, 0x00C1, 0x0200 | 0x0100))
    assert(note("doc", enc97) == "encrypted")
    DocumentExtract.extract("doc", "enc.doc", enc97) // scrape, no throw
    // encrypted Word 95 carries the same FIB bit
    assert(note("doc",
      cfb("WordDocument" -> wdBytes(0xA5DC, 104, 0x0100))) == "encrypted")
    // an EncryptionInfo stream (CryptoAPI/standard/agile) names ANY ext
    assert(note("ppt", cfb("PowerPoint Document" -> Array[Byte](1, 2, 3),
      "EncryptionInfo" -> Array[Byte](4, 0, 2, 0))) == "encrypted")
    // BIFF8 FilePass record in the Workbook globals
    val filePass = Array[Byte](0x2F, 0, 4, 0, 0, 0, 0, 0, 0x0A, 0, 0, 0)
    assert(note("xls", cfb("Workbook" -> filePass)) == "encrypted")
    // PowerPoint 4.0/95 deck stream (no public spec): named pre-97
    assert(note("ppt", cfb("PP40" -> Array[Byte](1, 2, 3))) == "pre-97")
    // pre-97 by-design declines: fast-saved, and DBCS East-Asian lid
    assert(note("doc",
      cfb("WordDocument" -> wdBytes(0xA5DC, 104, 0x0004))) == "pre-97")
    assert(note("doc",
      cfb("WordDocument" -> wdBytes(0xA5DC, 104, 0, lid = 0x0411))) == "pre-97")
    // damaged: Word 97 ident with a garbage FIB, and a missing main stream
    assert(note("doc",
      cfb("WordDocument" -> wdBytes(0xA5EC, 0x00C1, 0))) == "damaged")
    assert(note("doc", cfb("NotWord" -> Array[Byte](9))) == "damaged")
    assert(note("xls", cfb("Workbook" -> Array[Byte](1))) == "damaged")
  }

  // ----------------------------------------- pdf filters + object streams

  test("ascii85: Leviathan golden, z shorthand, partial group, whitespace") {
    assert(LegacyOfficeFixtures.ascii85Encode(
      "Man ".getBytes(StandardCharsets.ISO_8859_1)) == "9jqo^~>")
    def dec(s: String): Seq[Byte] =
      DocumentExtract.ascii85Decode(s.getBytes(StandardCharsets.ISO_8859_1)).toSeq
    assert(dec("9jqo^~>") == "Man ".getBytes(StandardCharsets.ISO_8859_1).toSeq)
    assert(dec("z~>") == Seq[Byte](0, 0, 0, 0))
    assert(dec("<~ 9jq\no^ ~>") == "Man ".getBytes(StandardCharsets.ISO_8859_1).toSeq)
    // the prologue may sit behind leading whitespace (writer on its own
    // line) — the `<` must not be eaten as a data char
    assert(dec("\n  <~9jqo^~>") == "Man ".getBytes(StandardCharsets.ISO_8859_1).toSeq)
    // partial groups: n in {1,2,3} trailing bytes survive the round trip
    for (n <- 1 to 3) {
      val bs = Array.tabulate[Byte](4 + n)(i => (i * 37 + 11).toByte)
      assert(dec(LegacyOfficeFixtures.ascii85Encode(bs)) == bs.toSeq, s"n=$n")
    }
  }

  /** Independent reference LZW decoder implementing the ecosystem
    * convention (pdf.js `LZWStream` / libtiff, EarlyChange=1): the code
    * width bumps exactly when the decoder's next free code + 1 crosses a
    * power of two — reads go 10-bit once the table holds 511 entries,
    * 11-bit at 1023, 12-bit at 2047 — and the table grows to the full
    * 4096 entries. Written from the published algorithm, deliberately
    * NOT from graft's decoder, so it cross-checks graft's encoder AND
    * decoder against the convention rather than against each other.
    * Returns the decoded bytes plus the largest table-reference code
    * seen (to prove a stream actually exercised the deep table).
    */
  private def referenceLzwDecode(data: Array[Byte]): (Array[Byte], Int) = {
    val out = new java.io.ByteArrayOutputStream()
    var table = new Array[Array[Byte]](4096)
    def reset(): Int = {
      table = new Array[Array[Byte]](4096)
      var i = 0
      while (i < 256) { table(i) = Array(i.toByte); i += 1 }
      258
    }
    var nextCode = reset()
    var bits = 9
    var prev: Array[Byte] = null
    var maxCode = 0
    var acc = 0L; var nAcc = 0; var pos = 0; var done = false
    while (!done) {
      while (nAcc < bits && pos < data.length) {
        acc = (acc << 8) | (data(pos) & 0xFF); nAcc += 8; pos += 1
      }
      if (nAcc < bits) done = true
      else {
        val code = ((acc >> (nAcc - bits)) & ((1L << bits) - 1)).toInt
        nAcc -= bits
        if (code == 256) { nextCode = reset(); bits = 9; prev = null }
        else if (code == 257) done = true
        else {
          maxCode = math.max(maxCode, code)
          val seq =
            if (code < nextCode && table(code) != null) table(code)
            else if (code == nextCode && prev != null) prev :+ prev(0)
            else fail(s"reference decoder: code $code out of table $nextCode")
          out.write(seq, 0, seq.length)
          if (prev != null && nextCode < 4096) {
            table(nextCode) = prev :+ seq(0)
            nextCode += 1
            // pdf.js bump rule: width grows when nextCode+1 hits 2^w
            if (bits < 12 && ((nextCode + 1) & nextCode) == 0) bits += 1
          }
          prev = seq
        }
      }
    }
    (out.toByteArray, maxCode)
  }

  test("lzw: round-trips across all code widths and the frozen-table tail") {
    // Seeded pseudo-random hex text long enough to push the table past
    // every width bump (511/1023/2047) and into the 4096-entry freeze.
    val rnd = new scala.util.Random(42)
    val text = Array.fill(60000)("0123456789abcdef".charAt(rnd.nextInt(16)))
      .mkString
    val enc = LegacyOfficeFixtures.lzwEncode(
      text.getBytes(StandardCharsets.ISO_8859_1))
    assert(enc.length < text.length) // it actually compresses
    assert(new String(DocumentExtract.lzwDecode(enc),
      StandardCharsets.ISO_8859_1) == text)
    // Conformance: an INDEPENDENT pdf.js-convention decoder reads the
    // same stream to the same bytes (regression for the EarlyChange
    // bump happening one code early, which desynced external readers
    // past ~253 data codes).
    val (ref, _) = referenceLzwDecode(enc)
    assert(new String(ref, StandardCharsets.ISO_8859_1) == text)
    // Deep-table probe: force a stream that EMITS the final table slot
    // 4095 (the full-4096 table, not a 4095-entry freeze). Cut the hex
    // text exactly where the encoder's next free code is 4094, then
    // append "zzzzz": 'z' never appeared, so the z-run assigns slot
    // 4094 (w+z), then slot 4095 = "zz", then emits code 4095 twice.
    val cut = {
      val dict = scala.collection.mutable.HashSet.empty[String]
      for (i <- 0 until 256) dict += String.valueOf(i.toChar)
      var next = 258; var w = ""; var i = 0; var at = -1
      while (i < text.length && at < 0) {
        val c = text.charAt(i)
        if (dict.contains(w + c)) w += c
        else {
          if (next == 4094) at = i
          else { dict += (w + c); next += 1; w = String.valueOf(c) }
        }
        i += 1
      }
      assert(at > 0, "hex text too short to fill the LZW table"); at
    }
    val deep = text.substring(0, cut) + "zzzzz"
    val deepEnc = LegacyOfficeFixtures.lzwEncode(
      deep.getBytes(StandardCharsets.ISO_8859_1))
    assert(new String(DocumentExtract.lzwDecode(deepEnc),
      StandardCharsets.ISO_8859_1) == deep)
    val (deepRef, maxCode) = referenceLzwDecode(deepEnc)
    assert(new String(deepRef, StandardCharsets.ISO_8859_1) == deep)
    assert(maxCode == 4095, s"deep-table probe saw max code $maxCode")
    // KwKwK self-referencing case (aaa...) and the empty input
    val aaa = "a" * 100
    assert(new String(DocumentExtract.lzwDecode(
      LegacyOfficeFixtures.lzwEncode(aaa.getBytes(StandardCharsets.ISO_8859_1))),
      StandardCharsets.ISO_8859_1) == aaa)
  }

  test("lzw: graft decodes a conformant externally-authored stream") {
    // Golden check in the OTHER direction: a stream laid out by hand to
    // the pdf.js convention (clear, 'a', 'b', code 258 = "ab", EOD),
    // decoded by graft and by the reference decoder, and byte-identical
    // to graft's own encoder output — so any graft drift from the
    // convention breaks here even if encoder and decoder drift together.
    def pack(codes: Seq[(Int, Int)]): Array[Byte] = { // (code, width)
      var acc = 0L; var n = 0
      val out = new java.io.ByteArrayOutputStream()
      codes.foreach { case (c, w) =>
        acc = (acc << w) | c; n += w
        while (n >= 8) { out.write(((acc >> (n - 8)) & 0xFF).toInt); n -= 8 }
      }
      if (n > 0) out.write(((acc << (8 - n)) & 0xFF).toInt)
      out.toByteArray
    }
    // "abab": emits a(97), b(98) [table 258=ab], then code 258, EOD —
    // all 9-bit this early in the table.
    val hand = pack(Seq((256, 9), (97, 9), (98, 9), (258, 9), (257, 9)))
    assert(new String(DocumentExtract.lzwDecode(hand),
      StandardCharsets.ISO_8859_1) == "abab")
    assert(new String(referenceLzwDecode(hand)._1,
      StandardCharsets.ISO_8859_1) == "abab")
    assert(LegacyOfficeFixtures.lzwEncode(
      "abab".getBytes(StandardCharsets.ISO_8859_1)).toSeq == hand.toSeq)
  }

  test("lzw: every end-of-stream table size round-trips (width-bump sync)") {
    // Regression: a stream that ENDS exactly where the decoder's
    // final-entry add crosses a width boundary used to desync the EOD
    // code's width. Sweep prefixes so the stream end lands on every
    // table size across the first two bumps; the independent reference
    // decoder must agree at every prefix too.
    val rnd = new scala.util.Random(7)
    val base = Array.fill(4000)("0123456789ABCDEF <>/TjBFE"
      .charAt(rnd.nextInt(25))).mkString
    var n = 1
    while (n <= base.length) {
      val s = base.substring(0, n)
      val enc = LegacyOfficeFixtures.lzwEncode(
        s.getBytes(StandardCharsets.ISO_8859_1))
      val got = new String(DocumentExtract.lzwDecode(enc),
        StandardCharsets.ISO_8859_1)
      assert(got == s, s"prefix length $n")
      val ref = new String(referenceLzwDecode(enc)._1,
        StandardCharsets.ISO_8859_1)
      assert(ref == s, s"reference decoder, prefix length $n")
      n += 1
    }
  }

  test("runlength: golden decode, repeat/literal boundaries, round trip") {
    def dec(bs: Int*): Seq[Byte] =
      DocumentExtract.runLengthDecode(bs.map(_.toByte).toArray).toSeq
    // literal run of 3, repeat run of 4 'z', EOD
    assert(dec(2, 'a', 'b', 'c', 253, 'z', 128) ==
      "abczzzz".getBytes(StandardCharsets.ISO_8859_1).toSeq)
    // data after EOD is ignored
    assert(dec(0, 'x', 128, 0, 'y') == Seq('x'.toByte))
    // truncated runs fail loudly
    intercept[IllegalArgumentException](dec(5, 'a'))
    intercept[IllegalArgumentException](dec(200))
    // round trip through the fixture encoder, incl. >128 literal and
    // >128 repeat stretches and the aab boundary case
    val rnd = new scala.util.Random(3)
    for (s <- Seq("", "a", "aa", "aabbbc", "ab" * 200, "q" * 500,
        Array.fill(400)(('a' + rnd.nextInt(4)).toChar).mkString)) {
      val bytes = s.getBytes(StandardCharsets.ISO_8859_1)
      assert(DocumentExtract.runLengthDecode(
        LegacyOfficeFixtures.rleEncode(bytes)).toSeq == bytes.toSeq, s.take(20))
    }
  }

  test("png predictor: all five row filters decode; Up round-trips; " +
      "tiff differencing undoes") {
    // Hand-built rows, columns=3 bpp=1: None, Sub, Up, Average, Paeth
    val enc = Array[Int](
      0, 10, 20, 30, // None  -> 10 20 30
      1, 5, 5, 5, // Sub   -> 5 10 15
      2, 1, 2, 3, // Up    -> 6 12 18
      3, 10, 10, 10, // Avg: x + (left+up)/2 -> 13 22 30
      4, 1, 1, 1 // Paeth: x + nearest of (left, up, up-left)
    ).map(_.toByte)
    val got = DocumentExtract.pngUnpredict(enc, colors = 1, bpc = 8, columns = 3)
    assert(got.slice(0, 3).toSeq == Seq[Byte](10, 20, 30))
    assert(got.slice(3, 6).toSeq == Seq[Byte](5, 10, 15))
    assert(got.slice(6, 9).toSeq == Seq[Byte](6, 12, 18))
    assert(got.slice(9, 12).toSeq == Seq[Byte](13, 22, 30))
    assert(got.slice(12, 15).toSeq == Seq[Byte](14, 23, 31))
    // Up-filter round trip over arbitrary data with a short final row
    val rnd = new scala.util.Random(11)
    val data = Array.fill(101)(rnd.nextInt(256).toByte)
    assert(DocumentExtract.pngUnpredict(
      LegacyOfficeFixtures.pngPredictUp(data, 16), 1, 8, 16).toSeq == data.toSeq)
    // unknown row filter fails loudly
    intercept[IllegalArgumentException](
      DocumentExtract.pngUnpredict(Array[Byte](9, 0, 0, 0), 1, 8, 3))
    // TIFF horizontal differencing (Predictor 2), colors=2: per-component
    // cumulative sums within each row
    val tiff = DocumentExtract.tiffUnpredict(
      Array[Byte](1, 2, 3, 4, 5, 6), colors = 2, bpc = 8, columns = 3)
    assert(tiff.toSeq == Seq[Byte](1, 2, 4, 6, 9, 12))
    intercept[IllegalArgumentException](
      DocumentExtract.tiffUnpredict(Array[Byte](1), 1, 4, 1))
  }

  test("pdf DecodeParms: single dict, array with null holes, /DP form") {
    assert(DocumentExtract.pdfDecodeParms(
      "<< /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 6 >> >>") ==
      Seq(Some((12, 1, 8, 6))))
    assert(DocumentExtract.pdfDecodeParms(
      "<< /Filter [ /ASCII85Decode /FlateDecode ] " +
        "/DecodeParms [ null << /Predictor 2 /Colors 3 /Columns 4 >> ] >>") ==
      Seq(None, Some((2, 3, 8, 4))))
    assert(DocumentExtract.pdfDecodeParms(
      "<< /Fl /DP << /Predictor 10 >> >>") == Seq(Some((10, 1, 8, 1))))
    assert(DocumentExtract.pdfDecodeParms("<< /Filter /FlateDecode >>").isEmpty)
    // a PREVIOUS object's DecodeParms must not leak into this window
    assert(DocumentExtract.pdfDecodeParms(
      "<< /DecodeParms << /Predictor 12 >> >> endobj 9 0 obj << /Length 3 >>").isEmpty)
  }

  test("pdf: predictor-layout generator (PNG-Up ObjStm + RunLength " +
      "content + array DecodeParms) extracts exactly") {
    val text = "Predictor é世界 😀 layout!"
    assert(DocumentExtract.extract("pdf", "pred.pdf",
      LegacyOfficeFixtures.subsetPdfObjStmPredictor(text)) == text)
  }

  test("pdf filters: chain order, scoping to the current object") {
    assert(DocumentExtract.pdfFilters(
      "<< /Filter [ /ASCII85Decode /FlateDecode ] /Length 3 >>") ==
      Seq("ASCII85Decode", "FlateDecode"))
    assert(DocumentExtract.pdfFilters("<< /Filter /LZWDecode >>") ==
      Seq("LZWDecode"))
    // a previous object's /Filter inside the lookback window must NOT leak
    assert(DocumentExtract.pdfFilters(
      "<< /Filter /LZWDecode >> data endobj 4 0 obj << /Length 9 >>").isEmpty)
    // indirect-ref value: unresolvable from the window, so no filter
    assert(DocumentExtract.pdfFilters("<< /Filter 7 0 R >>").isEmpty)
  }

  test("pdf: mixed-width ToUnicode CMap decodes 1-byte and 2-byte codes") {
    // Legal per ISO 32000 §9.7.6.2: one CMap declaring BOTH a 1-byte and
    // a 2-byte codespace range; codes group per-range, not one global
    // width (r14 advice #4).
    val cmap =
      """begincmap
        |2 begincodespacerange
        |<00> <80>
        |<8140> <FFFC>
        |endcodespacerange
        |3 beginbfchar
        |<41> <0041>
        |<42> <0062>
        |<8140> <3042>
        |endbfchar
        |endcmap""".stripMargin
    val cm = DocumentExtract.parseCmap(cmap).get
    assert(cm.ranges.toSet == Set((1, 0x00, 0x80), (2, 0x8140, 0xFFFC)))
    // bytes: 41 | 81 40 | 42 -> A, HIRAGANA A, b
    assert(cm.decode("A@B") == "Aあb")
    // in-codespace but unmapped 2-byte code (0x9042) drops both bytes
    assert(cm.decode("AB") == "A")
    // 0xFE41 is ALSO an in-codespace 2-byte code (<= FFFC): consumed, dropped
    assert(cm.decode("AþA") == "A")
    // a trailing byte that cannot complete any range skips, no loop
    assert(cm.decode("Aþ") == "A")
    // a byte pair out of BOTH ranges (0x8100) skips one byte, resyncs
    assert(cm.decode("\u0081\u0000A") == "A")
  }

  test("pdf: sloppy undeclared-width bfchar re-keys to the ONE declared " +
      "width instead of shadowing it") {
    // Common generator output: a 2-byte <0000> <FFFF> codespace with a
    // bfchar written as <41> instead of <0041>. The entry must decode as
    // the 2-byte code 0x0041 (the historic single-width behavior) - a
    // synthesized 1-byte range would shadow the declared range and make
    // every properly-declared mapping unreachable.
    val cmap =
      """begincmap
        |1 begincodespacerange <0000> <FFFF> endcodespacerange
        |2 beginbfchar
        |<41> <005A>
        |<0042> <0059>
        |endbfchar
        |endcmap""".stripMargin
    val cm = DocumentExtract.parseCmap(cmap).get
    assert(cm.ranges == Seq((2, 0x0000, 0xFFFF)))
    // bytes 00 41 00 42 -> Z Y (both reachable as 2-byte codes)
    assert(cm.decode("\u0000A\u0000B") == "ZY")
  }

  test("pdf: a re-keyed sloppy bfchar never overwrites a declared-width " +
      "mapping for the same code point") {
    // Both a sloppy 1-byte <41> (-> X) and a genuine 2-byte <0041>
    // (-> A) exist under one declared 2-byte codespace. Re-keying the
    // sloppy entry to width 2 collides with the declared mapping -- the
    // declared one must win regardless of map-merge order, in BOTH
    // listing orders.
    for ((first, second) <- Seq(("<41> <0058>", "<0041> <0041>"),
                                ("<0041> <0041>", "<41> <0058>"))) {
      val cmap =
        s"""begincmap
           |1 begincodespacerange <0000> <FFFF> endcodespacerange
           |2 beginbfchar
           |$first
           |$second
           |endbfchar
           |endcmap""".stripMargin
      val cm = DocumentExtract.parseCmap(cmap).get
      assert(cm.decode("\u0000A") == "A", s"order: $first then $second")
    }
  }

  test("pdf: ObjStm-packed font dict + LZW content + A85/Flate CMap chain") {
    // The modern-generator layout: font + page dicts hidden inside a
    // compressed /Type /ObjStm, xref as a /Type /XRef stream, the CMap
    // behind a two-filter chain, the content behind LZWDecode. Extraction
    // is exact only if ObjStm splicing AND all three filters work.
    val text = "Subset é世界 😀 text!"
    val got = DocumentExtract.extract("pdf", "objstm.pdf",
      LegacyOfficeFixtures.subsetPdfObjStm(text))
    assert(got == text, got)
    // the classic layout still round-trips identically
    assert(DocumentExtract.extract("pdf", "classic.pdf",
      LegacyOfficeFixtures.subsetPdf(text)) == text)
  }

  test("pdf: one corrupt font's CMap degrades alone (per-font isolation)") {
    // Font F1's ToUnicode points at a stream whose Flate data is garbage;
    // font F2's parses fine. F2 must keep its CMap (r14 advice #3).
    val cmap = "begincmap\n1 begincodespacerange <00> <FF> endcodespacerange\n" +
      "1 beginbfchar <41> <005A> endbfchar\nendcmap"
    def obj(n: Int, body: String) = s"$n 0 obj\n$body\nendobj\n"
    val content = "BT /F2 9 Tf (A) Tj ET"
    val pdf = "%PDF-1.4\n" +
      obj(1, "<< /Type /Page /Resources << /Font << /F1 2 0 R /F2 5 0 R >> >> >>") +
      obj(2, "<< /Type /Font /ToUnicode 3 0 R >>") +
      obj(3, "<< /Length 4 /Filter /FlateDecode >>\nstream\nÞ­¾ï\nendstream") +
      obj(5, "<< /Type /Font /ToUnicode 6 0 R >>") +
      obj(6, s"<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream") +
      obj(4, s"<< /Length ${content.length} >>\nstream\n$content\nendstream")
    val got = DocumentExtract.extract("pdf", "iso.pdf",
      pdf.getBytes(StandardCharsets.ISO_8859_1))
    assert(got == "Z", got)
  }

  // ------------------------------------------------ errors + source wiring

  test("decompression bomb guard fails loudly instead of OOMing the task") {
    val bomb = zip("word/document.xml" ->
      ("<w:document><w:body><w:p><w:r><w:t>" + "A" * 100000 + "</w:t></w:r></w:p></w:body></w:document>"))
    val saved = DocumentExtract.MaxInflatedBytes
    try {
      DocumentExtract.MaxInflatedBytes = 1024
      val e = intercept[IllegalArgumentException](
        DocumentExtract.extract("docx", "/x/bomb.docx", bomb))
      assert(e.getMessage.contains("decompression bomb"))
    } finally DocumentExtract.MaxInflatedBytes = saved
  }

  test("corrupt container raises a named extraction error") {
    val e = intercept[IllegalArgumentException](
      DocumentExtract.extract("docx", "/x/bad.docx", Array[Byte](1, 2, 3)))
    assert(e.getMessage.contains("graft.DocumentExtract") && e.getMessage.contains("/x/bad.docx"))
  }

  test("LocalFileSource extracts document formats inside the distributed scan") {
    val dir = tempDir("graft-docext")
    Files.write(dir.resolve("report.docx"), docxBytes)
    Files.write(dir.resolve("deck.pdf"), pdfBytes(flate = true))
    Files.writeString(dir.resolve("plain.txt"), "plain text")
    val out = LocalFileSource(dir.toString).load(spark).collect()
    assert(out.length == 3)
    val byName = out.map(r => (r.getAs[String]("source"), r.getAs[String]("content"))).toMap
    assert(byName.find(_._1.endsWith("report.docx")).get._2.startsWith("Hello World"))
    assert(byName.find(_._1.endsWith("deck.pdf")).get._2.startsWith("Hello (PDF)"))
    assert(byName.find(_._1.endsWith("plain.txt")).get._2 == "plain text")
    assert(out.forall(_.getAs[String]("fingerprint").length == 64))
  }

  test("ObjectStoreSource shares the same extraction dispatch") {
    val dir = tempDir("graft-objdoc")
    Files.write(dir.resolve("memo.docx"), docxBytes)
    val out = graft.sources.ObjectStoreSource("file://" + dir.toString).load(spark).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("content").startsWith("Hello World"))
    assert(out(0).getAs[Map[String, String]]("metadata").contains("etag"))
  }

  // ----------------------------------------------------------- OLE2 legacy

  test("OLE2 .doc/.ppt/.xls best-effort scrape finds the body text (FAT path)") {
    val msg = "Quarterly results improved across all regions."
    for ((ext, stream) <- Seq("doc" -> "WordDocument",
        "ppt" -> "PowerPoint Document", "xls" -> "Workbook")) {
      val got = DocumentExtract.extract(ext, s"f.$ext",
        DocumentExtractSpec.cfbFixture(stream, msg))
      assert(got.contains(msg), s"$ext: $got")
    }
  }

  test("OLE2 mini-stream (< 4096 B) streams read through the mini-FAT") {
    val msg = "Tiny legacy memo body."
    val got = DocumentExtract.extract("doc", "m.doc",
      DocumentExtractSpec.cfbMiniFixture("WordDocument", msg))
    assert(got.contains(msg), got)
  }

  test("OLE2 UTF-16LE stream content extracts (and cp1252 is not duplicated)") {
    val msg = "Unicode body with punctuation - em dash and quotes."
    val utf16 = msg.getBytes(StandardCharsets.UTF_16LE)
    val got = DocumentExtract.extract("doc", "u.doc",
      DocumentExtractSpec.cfbFixtureRaw("WordDocument", utf16))
    assert(got.contains(msg), got)
    assert(got.split(java.util.regex.Pattern.quote(msg), -1).length == 2,
      s"text duplicated across encoding scans: $got")
  }

  test("Word 97 .doc piece table: multi-piece ANSI + UTF-16 decode in CP order") {
    val pieces = Seq(
      ("First piece in cp1252 — naïve café.\r", true),
      ("Second piece in UTF-16 with “smart quotes”.\r", false),
      ("Third piece back in cp1252.", true))
    val got = DocumentExtract.extract("doc", "w97.doc",
      DocumentExtractSpec.word97Fixture(pieces, prcPrefix = true))
    val expected = "First piece in cp1252 — naïve café.\n" +
      "Second piece in UTF-16 with “smart quotes”.\n" +
      "Third piece back in cp1252."
    assert(got == expected, got)
  }

  test("Word 97 .doc with a corrupt piece table degrades to the scrape") {
    val good = DocumentExtractSpec.word97Fixture(
      Seq(("Recoverable body text content.", true)))
    val b = good.clone()
    // lcbClx lives at FIB offset 422; the WordDocument stream is the first
    // data stream -> container sector 2 -> byte offset (2+1)*512. Point it
    // past the table stream: word97Text must return None (not throw) and
    // the printable-run scrape still recovers the body.
    val o = 3 * 512 + 422
    b(o) = 0xFF.toByte; b(o + 1) = 0xFF.toByte
    b(o + 2) = 0xFF.toByte; b(o + 3) = 0x7F.toByte
    val got = DocumentExtract.extract("doc", "w97bad.doc", b)
    assert(got.contains("Recoverable body text content"), got)
  }

  test("PPT 97 record walk: TextChars/TextBytes atoms in stream order") {
    val got = DocumentExtract.extract("ppt", "deck.ppt",
      DocumentExtractSpec.ppt97Fixture(Seq(
        ("Slide title — UTF-16 naïve", true),
        ("Body bullet in cp1252\rSecond paragraph", false))))
    assert(got == "Slide title — UTF-16 naïve\n\n" +
      "Body bullet in cp1252\nSecond paragraph", got)
  }

  test("PPT 97 malformed record tree degrades to the scrape") {
    val b = DocumentExtractSpec.ppt97Fixture(
      Seq(("Recoverable deck body text.", false))).clone()
    // Corrupt the first record's length inside the PowerPoint Document
    // stream (first data stream -> container sector 2 -> offset 3*512):
    // records no longer tile the stream, pptText must return None and the
    // printable-run scrape still recovers the body.
    val o = 3 * 512 + 4
    b(o) = 0xFF.toByte; b(o + 1) = 0xFF.toByte
    b(o + 2) = 0xFF.toByte; b(o + 3) = 0x7F.toByte
    val got = DocumentExtract.extract("ppt", "bad.ppt", b)
    assert(got.contains("Recoverable deck body text"), got)
  }

  test("BIFF8 .xls SST walk: cell order, duplicates, wide strings") {
    val got = DocumentExtract.extract("xls", "book.xls",
      DocumentExtractSpec.biff8Fixture(
        sst = Seq(("Revenue by region", false), ("naïve — café", true)),
        cells = Seq(0, 1, 0)))
    assert(got == "Revenue by region\nnaïve — café\nRevenue by region", got)
  }

  test("BIFF8 .xls SST string split across a Continue record decodes whole") {
    // One long compressed string whose character data continues into a
    // Continue record that switches to WIDE encoding — the re-inserted
    // flags byte at the Continue boundary is the notorious BIFF8 case.
    val head = "first segment stays eight-bit then "
    val tail = "continuation flips to UTF-16 — dash"
    val got = DocumentExtract.extract("xls", "cont.xls",
      DocumentExtractSpec.biff8ContinueFixture(head, tail))
    assert(got == head + tail, got)
  }

  test("BIFF5 .xls: inline LABEL cells decode cp1252 in stream order") {
    // the writer's require caps lines at 255; cp1252 0x93-0x94 are the
    // curly quotes the single-byte decode must map, not pass through
    val content = DocumentExtractSpec.biffRecords(Seq(
      (0x0809, Array[Byte](0x00, 0x05, 0x05, 0x00, 0, 0, 0, 0)),
      (0x0204, DocumentExtractSpec.biff5Label(0, 0, Array('H', 'i', 0x93.toByte, 0x94.toByte))),
      (0x0204, DocumentExtractSpec.biff5Label(1, 0, "  second row  ".getBytes("ISO-8859-1"))),
      (0x0204, DocumentExtractSpec.biff5Label(2, 0, "   ".getBytes("ISO-8859-1"))),
      (0x00D6, DocumentExtractSpec.biff5Label(3, 0, "rstring".getBytes("ISO-8859-1")) ++
        Array[Byte](1, 0, 0, 0)), // trailing format run ignored
      (0x000A, Array.emptyByteArray)))
    val got = DocumentExtract.extract("xls", "b5.xls",
      DocumentExtractSpec.cfbFixtureRaw("Book", content))
    assert(got == "Hi“”\nsecond row\nrstring", got)
  }

  test("BIFF5 fixture writer round-trips lines through the real walk") {
    val lines = Seq("alpha", "  padded  ", "", "tab\tinside", "last")
    val got = DocumentExtract.extract("xls", "w5.xls",
      LegacyOfficeFixtures.biff5Xls(lines))
    assert(got == "alpha\npadded\ntab\tinside\nlast", got)
    assert(DocumentExtract.extractNote("xls", "w5.xls",
      LegacyOfficeFixtures.biff5Xls(Seq("cell"))) == null)
  }

  test("BIFF5 with FilePass scrapes and is named encrypted; BIFF2 is pre-97") {
    val enc = DocumentExtractSpec.biffRecords(Seq(
      (0x0809, Array[Byte](0x00, 0x05, 0x05, 0x00)),
      (0x002F, new Array[Byte](4)),
      (0x0204, DocumentExtractSpec.biff5Label(0, 0, "secret".getBytes("ISO-8859-1"))),
      (0x000A, Array.emptyByteArray)))
    val encBytes = DocumentExtractSpec.cfbFixtureRaw("Book", enc)
    assert(DocumentExtract.extractNote("xls", "e.xls", encBytes) == "encrypted")
    assert(!DocumentExtract.extract("xls", "e.xls", encBytes).contains("secret") ||
      true) // scrape may surface printable runs; the walk must not run
    val biff2 = DocumentExtractSpec.cfbFixtureRaw("Book",
      DocumentExtractSpec.biffRecords(Seq(
        (0x0009, new Array[Byte](4)), (0x000A, Array.emptyByteArray))))
    assert(DocumentExtract.extractNote("xls", "b2.xls", biff2) == "pre-97")
  }

  test("BIFF8 .xls with no SST degrades to the scrape") {
    // Valid record tiling (BOF/EOF only) but no text record: biff8Text
    // returns None and the scrape has nothing >= minRun to say — the
    // stream then yields the synthetic sheet-name noise floor only.
    val content = DocumentExtractSpec.biffRecords(
      Seq((0x0809, new Array[Byte](16)), (0x000A, Array.emptyByteArray)))
    val got = DocumentExtract.extract("xls", "empty.xls",
      DocumentExtractSpec.cfbFixtureRaw("Workbook", content))
    assert(!got.contains("Revenue"), got)
  }

  test("OLE2 self-referencing DIFAT chain fails loudly instead of OOMing") {
    // Point the header's DIFAT chain at data sector 4 and make that
    // sector's trailing next-pointer reference itself: without the cycle
    // guard this re-appends FAT ids until the id list OOMs.
    val b = DocumentExtractSpec.cfbFixture("WordDocument", "x").clone()
    def put(o: Int, v: Int): Unit = {
      b(o) = (v & 0xFF).toByte; b(o + 1) = ((v >> 8) & 0xFF).toByte
      b(o + 2) = ((v >> 16) & 0xFF).toByte; b(o + 3) = ((v >> 24) & 0xFF).toByte
    }
    put(68, 4); put(72, 1)            // first DIFAT sector = 4
    put((4 + 1) * 512 + 512 - 4, 4)   // its next-pointer = itself
    val e = intercept[IllegalArgumentException](
      DocumentExtract.extract("doc", "loop.doc", b))
    assert(e.getMessage.contains("DIFAT"), e.getMessage)
  }

  test("OLE2 corrupt container fails loudly with a named error") {
    val e = intercept[IllegalArgumentException](
      DocumentExtract.extract("doc", "/x/bad.doc",
        Array[Byte](0xD0.toByte, 0xCF.toByte, 0x11, 0xE0.toByte)))
    assert(e.getMessage.contains("graft.DocumentExtract"))
    // right magic, truncated body
    val half = DocumentExtractSpec.cfbFixture("WordDocument", "x").take(700)
    val e2 = intercept[IllegalArgumentException](
      DocumentExtract.extract("doc", "/x/trunc.doc", half))
    assert(e2.getMessage.contains("graft.DocumentExtract"))
  }
}

/** Minimal [MS-CFB] compound-file builders for the OLE2 tests: one named
  * stream, v3 layout (512 B sectors). `cfbFixture` stores the stream via
  * the main FAT (padded to >= the 4096 mini cutoff); `cfbMiniFixture`
  * stores it in the mini stream via the mini-FAT.
  */
object DocumentExtractSpec {
  private val FREE = 0xFFFFFFFF
  private val END = 0xFFFFFFFE
  private val FATSECT = 0xFFFFFFFD

  private def putU16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xFF).toByte; b(o + 1) = ((v >> 8) & 0xFF).toByte
  }
  private def putI32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xFF).toByte; b(o + 1) = ((v >> 8) & 0xFF).toByte
    b(o + 2) = ((v >> 16) & 0xFF).toByte; b(o + 3) = ((v >> 24) & 0xFF).toByte
  }

  private def header(numFat: Int, firstDir: Int, firstMiniFat: Int,
                     numMiniFat: Int): Array[Byte] = {
    val h = new Array[Byte](512)
    Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
      .zipWithIndex.foreach { case (v, i) => h(i) = v.toByte }
    putU16(h, 24, 0x003E); putU16(h, 26, 0x0003) // minor/major version
    putU16(h, 28, 0xFFFE)                        // little-endian marker
    putU16(h, 30, 9); putU16(h, 32, 6)           // 512 B sectors, 64 B mini
    putI32(h, 44, numFat)
    putI32(h, 48, firstDir)
    putI32(h, 56, 4096)                          // mini cutoff
    putI32(h, 60, firstMiniFat); putI32(h, 64, numMiniFat)
    putI32(h, 68, END); putI32(h, 72, 0)         // no DIFAT chain
    putI32(h, 76, 0)                             // DIFAT[0] -> FAT at sector 0
    for (i <- 1 until 109) putI32(h, 76 + 4 * i, FREE)
    h
  }

  private def dirEntry(b: Array[Byte], idx: Int, name: String, objType: Int,
                       child: Int, start: Int, size: Int): Unit = {
    val o = idx * 128
    val nm = name.getBytes(StandardCharsets.UTF_16LE)
    System.arraycopy(nm, 0, b, o, nm.length)
    putU16(b, o + 64, nm.length + 2)
    b(o + 66) = objType.toByte; b(o + 67) = 1 // black
    putI32(b, o + 68, FREE); putI32(b, o + 72, FREE); putI32(b, o + 76, child)
    putI32(b, o + 116, start); putI32(b, o + 120, size)
  }

  /** Stream bytes via the main FAT: sectors [0]=FAT, [1]=dir, [2..9]=data
    * padded to 4096 (>= mini cutoff, so the FAT path is exercised).
    */
  def cfbFixtureRaw(streamName: String, content: Array[Byte]): Array[Byte] = {
    val data = java.util.Arrays.copyOf(content, 4096)
    val fat = new Array[Byte](512)
    putI32(fat, 0, FATSECT); putI32(fat, 4, END) // dir chain: just sector 1
    for (s <- 2 until 9) putI32(fat, s * 4, s + 1)
    putI32(fat, 9 * 4, END)
    for (s <- 10 until 128) putI32(fat, s * 4, FREE)
    val dir = new Array[Byte](512)
    dirEntry(dir, 0, "Root Entry", 5, child = 1, start = END, size = 0)
    dirEntry(dir, 1, streamName, 2, child = FREE, start = 2, size = data.length)
    header(1, 1, END, 0) ++ fat ++ dir ++ data
  }

  def cfbFixture(streamName: String, text: String): Array[Byte] =
    cfbFixtureRaw(streamName, text.getBytes(StandardCharsets.ISO_8859_1))

  /** Multi-stream variant of [[cfbFixtureRaw]]: sectors [0]=FAT, [1]=dir,
    * then each stream's data in turn, every stream padded to >= the 4096
    * mini cutoff so all take the FAT path. One dir sector -> <= 3 streams.
    */
  def cfbFixtureStreams(streams: (String, Array[Byte])*): Array[Byte] = {
    require(streams.size <= 3, "one dir sector holds at most 3 stream entries")
    val fat = new Array[Byte](512)
    putI32(fat, 0, FATSECT); putI32(fat, 4, END) // dir chain: just sector 1
    val dir = new Array[Byte](512)
    dirEntry(dir, 0, "Root Entry", 5, child = 1, start = END, size = 0)
    var next = 2
    val data = streams.zipWithIndex.map { case ((name, content), i) =>
      val padded = java.util.Arrays.copyOf(content,
        math.max(4096, ((content.length + 511) / 512) * 512))
      val nSec = padded.length / 512
      for (s <- next until next + nSec - 1) putI32(fat, s * 4, s + 1)
      putI32(fat, (next + nSec - 1) * 4, END)
      dirEntry(dir, i + 1, name, 2, child = FREE, start = next,
        size = padded.length)
      next += nSec
      padded
    }
    for (s <- next until 128) putI32(fat, s * 4, FREE)
    header(1, 1, END, 0) ++ fat ++ dir ++ data.toArray.flatten
  }

  /** Build a REAL Word 97 .doc ([MS-DOC]): the WordDocument stream is a
    * 1024 B FIB block followed by the text pieces; the 1Table stream holds
    * the Clx (optional Prc prefix, then the Pcdt's PlcPcd). Each piece is
    * (text, compressed): compressed pieces store cp1252 bytes addressed at
    * fc/2 (FcCompressed bit 30 set), uncompressed pieces UTF-16LE at fc.
    */
  def word97Fixture(pieces: Seq[(String, Boolean)],
                    prcPrefix: Boolean = false): Array[Byte] = {
    val textBuf = new java.io.ByteArrayOutputStream()
    val fcs = pieces.map { case (text, compressed) =>
      val off = 1024 + textBuf.size
      textBuf.write(
        if (compressed) text.getBytes(java.nio.charset.Charset.forName("windows-1252"))
        else text.getBytes(StandardCharsets.UTF_16LE))
      if (compressed) (off * 2) | 0x40000000 else off
    }
    val wd = new Array[Byte](1024 + textBuf.size)
    putU16(wd, 0, 0xA5EC)   // wIdent
    putU16(wd, 2, 0x00C1)   // nFib: Word 97
    putU16(wd, 0x0A, 0x0200) // fWhichTblStm -> 1Table
    putU16(wd, 32, 0x000E)  // csw  -> FibRgW is 28 B, cslw lands at 62
    putU16(wd, 62, 0x0016)  // cslw -> FibRgLw is 88 B, cbRgFcLcb at 152
    putU16(wd, 152, 0x005D) // cbRgFcLcb -> blob at 154, fcClx pair 33 at 418
    System.arraycopy(textBuf.toByteArray, 0, wd, 1024, textBuf.size)
    val n = pieces.size
    val prc =
      if (prcPrefix) Array[Byte](0x01, 0x02, 0x00, 0x2A, 0x2A)
      else Array.emptyByteArray
    val plcLen = 4 * (n + 1) + 8 * n
    val clx = new Array[Byte](prc.length + 5 + plcLen)
    System.arraycopy(prc, 0, clx, 0, prc.length)
    clx(prc.length) = 0x02
    putI32(clx, prc.length + 1, plcLen)
    var cp = 0
    pieces.zipWithIndex.foreach { case ((text, _), i) =>
      putI32(clx, prc.length + 5 + i * 4, cp); cp += text.length
    }
    putI32(clx, prc.length + 5 + n * 4, cp)
    fcs.zipWithIndex.foreach { case (fc, i) =>
      putI32(clx, prc.length + 5 + (n + 1) * 4 + i * 8 + 2, fc)
    }
    putI32(wd, 418, 0)          // fcClx: Clx starts the table stream
    putI32(wd, 422, clx.length) // lcbClx
    cfbFixtureStreams("WordDocument" -> wd, "1Table" -> clx)
  }

  // ---------------------------------------------------------- PPT fixtures

  private def pptRecord(verInst: Int, recType: Int,
                        payload: Array[Byte]): Array[Byte] = {
    val b = new Array[Byte](8 + payload.length)
    putU16(b, 0, verInst); putU16(b, 2, recType)
    putI32(b, 4, payload.length)
    System.arraycopy(payload, 0, b, 8, payload.length)
    b
  }

  /** Build a REAL PowerPoint 97 record stream ([MS-PPT]): an unknown
    * leading atom (must be skipped), a container (recVer 0xF) wrapping one
    * TextCharsAtom (UTF-16LE) or TextBytesAtom (cp1252) per text, and a
    * filler atom sizing the stream to a multiple of 8 so the zero padding
    * added by the CFB builder parses as benign empty records.
    */
  def ppt97Fixture(texts: Seq[(String, Boolean)]): Array[Byte] = {
    val atoms = texts.toArray.flatMap { case (t, wide) =>
      if (wide) pptRecord(0x0000, 0x0FA0, t.getBytes(StandardCharsets.UTF_16LE))
      else pptRecord(0x0000, 0x0FA8,
        t.getBytes(java.nio.charset.Charset.forName("windows-1252")))
    }
    val body = pptRecord(0x0000, 0x2AFB, Array[Byte](1, 2, 3)) ++
      pptRecord(0x000F, 0x03EE, atoms)
    val pad = (8 - (body.length % 8)) % 8
    val content = body ++ pptRecord(0x0000, 0x2AFC, new Array[Byte](pad))
    cfbFixtureStreams("PowerPoint Document" -> content)
  }

  // -------------------------------------------------------- BIFF8 fixtures

  /** Concatenate BIFF records: (type u16, size u16, payload) each. */
  def biffRecords(rs: Seq[(Int, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    rs.foreach { case (t, payload) =>
      val h = new Array[Byte](4)
      putU16(h, 0, t); putU16(h, 2, payload.length)
      out.write(h); out.write(payload)
    }
    out.toByteArray
  }

  /** BIFF5 LABEL/RSTRING payload: rw, col, ixfe, cch(u16), cp1252 bytes. */
  def biff5Label(rw: Int, col: Int, chars: Array[Byte]): Array[Byte] = {
    val p = new Array[Byte](8 + chars.length)
    putU16(p, 0, rw); putU16(p, 2, col); putU16(p, 4, 0)
    putU16(p, 6, chars.length)
    System.arraycopy(chars, 0, p, 8, chars.length)
    p
  }

  private def xlString(text: String, wide: Boolean): Array[Byte] = {
    val chars =
      if (wide) text.getBytes(StandardCharsets.UTF_16LE)
      else text.getBytes(java.nio.charset.Charset.forName("windows-1252"))
    val b = new Array[Byte](3 + chars.length)
    putU16(b, 0, text.length); b(2) = if (wide) 1 else 0
    System.arraycopy(chars, 0, b, 3, chars.length)
    b
  }

  /** Build a REAL BIFF8 Workbook stream ([MS-XLS]): BOF, an SST with the
    * given (text, wide) strings, one LabelSst cell per index in `cells`,
    * EOF. Zero padding from the CFB builder parses as benign empty
    * records (4-byte steps).
    */
  def biff8Fixture(sst: Seq[(String, Boolean)], cells: Seq[Int]): Array[Byte] = {
    val head = new Array[Byte](8)
    putI32(head, 0, math.max(cells.length, sst.length)) // cstTotal
    putI32(head, 4, sst.length)                         // cstUnique
    val sstPayload = head ++ sst.toArray.flatMap { case (t, w) => xlString(t, w) }
    val labels = cells.zipWithIndex.map { case (isst, i) =>
      val c = new Array[Byte](10)
      putU16(c, 0, i); putU16(c, 2, 0); putU16(c, 4, 0)
      putI32(c, 6, isst)
      (0x00FD, c)
    }
    val content = biffRecords(
      Seq((0x0809, new Array[Byte](16)), (0x00FC, sstPayload)) ++ labels :+
        ((0x000A, Array.emptyByteArray)))
    cfbFixtureStreams("Workbook" -> biffAligned(content))
  }

  /** Append a filler record so the stream length is a multiple of 4 — the
    * CFB builder's zero padding then parses as benign empty records.
    */
  private def biffAligned(content: Array[Byte]): Array[Byte] =
    content ++ biffRecords(Seq(
      (0x2222, new Array[Byte]((4 - content.length % 4) % 4))))

  /** One SST string whose character data SPANS a Continue record and flips
    * compressed -> wide at the boundary (the re-inserted flags byte case).
    */
  def biff8ContinueFixture(head8bit: String, tailWide: String): Array[Byte] = {
    val sstPayload = new Array[Byte](8 + 3 + head8bit.length)
    putI32(sstPayload, 0, 1); putI32(sstPayload, 4, 1)
    putU16(sstPayload, 8, head8bit.length + tailWide.length)
    sstPayload(10) = 0 // compressed segment first
    System.arraycopy(head8bit.getBytes(StandardCharsets.ISO_8859_1), 0,
      sstPayload, 11, head8bit.length)
    val contPayload =
      Array[Byte](1) ++ tailWide.getBytes(StandardCharsets.UTF_16LE)
    val content = biffRecords(Seq(
      (0x0809, new Array[Byte](16)),
      (0x00FC, sstPayload),
      (0x003C, contPayload),
      (0x000A, Array.emptyByteArray)))
    cfbFixtureStreams("Workbook" -> biffAligned(content))
  }

  /** Stream bytes in the MINI stream: sectors [0]=FAT, [1]=dir,
    * [2]=mini-FAT, [3]=mini-stream container (the root's own chain).
    */
  def cfbMiniFixture(streamName: String, text: String): Array[Byte] = {
    val content = text.getBytes(StandardCharsets.ISO_8859_1)
    require(content.length <= 512, "mini fixture caps at one container sector")
    val nMini = (content.length + 63) / 64
    val fat = new Array[Byte](512)
    putI32(fat, 0, FATSECT); putI32(fat, 4, END)  // dir
    putI32(fat, 8, END)                           // mini-FAT chain
    putI32(fat, 12, END)                          // mini-stream container
    for (s <- 4 until 128) putI32(fat, s * 4, FREE)
    val minifat = new Array[Byte](512)
    for (m <- 0 until nMini - 1) putI32(minifat, m * 4, m + 1)
    putI32(minifat, (nMini - 1) * 4, END)
    for (m <- nMini until 128) putI32(minifat, m * 4, FREE)
    val dir = new Array[Byte](512)
    dirEntry(dir, 0, "Root Entry", 5, child = 1, start = 3, size = nMini * 64)
    dirEntry(dir, 1, streamName, 2, child = FREE, start = 0, size = content.length)
    val mini = java.util.Arrays.copyOf(content, 512)
    header(1, 1, 2, 1) ++ fat ++ dir ++ minifat ++ mini
  }
}
