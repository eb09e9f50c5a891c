package graft.functions

import java.nio.charset.StandardCharsets

import scala.collection.mutable

/** Deterministic legacy-Office container WRITERS — the `syntheticBmp` /
  * `syntheticWav` probe-generator discipline applied to the OLE2 family:
  * build REAL [MS-CFB] containers carrying a REAL Word 97 piece table
  * ([MS-DOC]), PowerPoint 97 record tree ([MS-PPT]), or BIFF8 SST
  * ([MS-XLS]) around arbitrary text, so the extraction gates can
  * round-trip corpus text through the genuine binary walk in-plan (the
  * `jsonl_parse` identity-reconstruction discipline: the gate only
  * hash-matches if writer AND parser are faithful for every character).
  *
  * Scope: minimal single-purpose writers (one text payload), not a
  * document-authoring API — structure is fixed, only the text varies.
  */
object LegacyOfficeFixtures {
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

  /** Minimal [MS-CFB] v3 writer: sectors [0]=FAT, [1]=directory, then each
    * stream's data padded to >= the 4096 mini cutoff (so every stream takes
    * the FAT path the reader exercises; the directory records the PADDED
    * size for the same reason — a true sub-cutoff size would route a
    * tree-walking reader to the mini-FAT, which this fixture does not
    * carry). One directory sector -> <= 3 streams; streams capped at 120
    * sectors total (far above any text payload this builder carries).
    * Directory tree: the root's child points at the first stream entry
    * and streams chain through RIGHT-sibling pointers (child = NOSTREAM
    * on every stream entry), so a conformant tree-walking reader sees all
    * streams — a degenerate but valid [MS-CFB] §2.6.4 tree.
    */
  def cfb(streams: (String, Array[Byte])*): Array[Byte] = {
    require(streams.size <= 3, "one dir sector holds at most 3 streams")
    val fat = new Array[Byte](512)
    putI32(fat, 0, FATSECT); putI32(fat, 4, END) // dir chain: just sector 1
    val dir = new Array[Byte](512)
    def dirEntry(idx: Int, name: String, objType: Int, start: Int,
                 size: Int, right: Int, child: Int): Unit = {
      val o = idx * 128
      val nm = name.getBytes(StandardCharsets.UTF_16LE)
      System.arraycopy(nm, 0, dir, o, nm.length)
      putU16(dir, o + 64, nm.length + 2)
      dir(o + 66) = objType.toByte; dir(o + 67) = 1
      putI32(dir, o + 68, FREE); putI32(dir, o + 72, right)
      putI32(dir, o + 76, child)
      putI32(dir, o + 116, start); putI32(dir, o + 120, size)
    }
    dirEntry(0, "Root Entry", 5, END, 0, FREE,
      if (streams.nonEmpty) 1 else FREE)
    var next = 2
    val data = streams.zipWithIndex.map { case ((name, content), i) =>
      val padded = java.util.Arrays.copyOf(content,
        math.max(4096, ((content.length + 511) / 512) * 512))
      val nSec = padded.length / 512
      for (s <- next until next + nSec - 1) putI32(fat, s * 4, s + 1)
      putI32(fat, (next + nSec - 1) * 4, END)
      dirEntry(i + 1, name, 2, next, padded.length,
        right = if (i + 1 < streams.size) i + 2 else FREE, child = FREE)
      next += nSec
      padded
    }
    require(next <= 120, "payload exceeds the single-FAT-sector fixture cap")
    for (s <- next until 128) putI32(fat, s * 4, FREE)
    val h = new Array[Byte](512)
    Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
      .zipWithIndex.foreach { case (v, i) => h(i) = v.toByte }
    putU16(h, 24, 0x003E); putU16(h, 26, 0x0003); putU16(h, 28, 0xFFFE)
    putU16(h, 30, 9); putU16(h, 32, 6)        // 512 B sectors, 64 B mini
    putI32(h, 44, 1); putI32(h, 48, 1); putI32(h, 56, 4096)
    putI32(h, 60, END); putI32(h, 64, 0)
    putI32(h, 68, END); putI32(h, 72, 0); putI32(h, 76, 0)
    for (i <- 1 until 109) putI32(h, 76 + 4 * i, FREE)
    h ++ fat ++ dir ++ data.toArray.flatten
  }

  /** A REAL Word 97 .doc carrying `text` as a TWO-piece piece table
    * (FIB -> Clx in 1Table -> PlcPcd): the text splits at its midpoint
    * (never inside a surrogate pair) and each piece stores cp1252
    * (FcCompressed) when pure <= 0x7E, UTF-16LE otherwise — so corpus
    * text exercises BOTH encodings and the piece-concatenation order.
    */
  def word97Doc(text: String): Array[Byte] = {
    var mid = text.length / 2
    if (mid > 0 && mid < text.length && Character.isLowSurrogate(text.charAt(mid)))
      mid += 1
    val pieces = Seq(text.substring(0, mid), text.substring(mid))
      .filter(_.nonEmpty) match {
      case Nil => Seq("") // empty doc still needs one piece
      case ps  => ps
    }
    val textBuf = new java.io.ByteArrayOutputStream()
    val encoded = pieces.map { p =>
      val compressed = p.forall(_ <= '~')
      val off = 1024 + textBuf.size
      textBuf.write(
        if (compressed)
          p.getBytes(java.nio.charset.Charset.forName("windows-1252"))
        else p.getBytes(StandardCharsets.UTF_16LE))
      (p.length, if (compressed) (off * 2) | 0x40000000 else off)
    }
    val wd = new Array[Byte](1024 + textBuf.size)
    putU16(wd, 0, 0xA5EC)    // wIdent
    putU16(wd, 2, 0x00C1)    // nFib: Word 97
    putU16(wd, 0x0A, 0x0200) // fWhichTblStm -> 1Table
    putU16(wd, 32, 0x000E)   // csw
    putU16(wd, 62, 0x0016)   // cslw
    putU16(wd, 152, 0x005D)  // cbRgFcLcb -> fcClx/lcbClx pair 33 at 418
    System.arraycopy(textBuf.toByteArray, 0, wd, 1024, textBuf.size)
    val n = encoded.size
    val plcLen = 4 * (n + 1) + 8 * n
    val clx = new Array[Byte](5 + plcLen)
    clx(0) = 0x02
    putI32(clx, 1, plcLen)
    var cp = 0
    encoded.zipWithIndex.foreach { case ((len, _), i) =>
      putI32(clx, 5 + i * 4, cp); cp += len
    }
    putI32(clx, 5 + n * 4, cp)
    encoded.zipWithIndex.foreach { case ((_, fc), i) =>
      putI32(clx, 5 + (n + 1) * 4 + i * 8 + 2, fc)
    }
    putI32(wd, 418, 0)
    putI32(wd, 422, clx.length)
    cfb("WordDocument" -> wd, "1Table" -> clx)
  }

  /** A REAL Word 6.0/95 .doc (the pre-97 class): wIdent 0xA5DC, nFib 104
    * (Word 95), non-complex — body text is the contiguous cp1252 run from
    * fcMin (1024) to fcMac, exactly how a normally-saved (not fast-saved)
    * Word 95 file lays text out. Caps at cp1252-encodable text by
    * construction: characters outside cp1252 are written as '?' the same
    * way Word 95's own save dialog downconverted them, so round-trip
    * gates must feed cp1252-safe payloads (the `word95_roundtrip` gate
    * filters to ASCII).
    */
  def word95Doc(text: String): Array[Byte] = {
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    val body = text.getBytes(cp1252)
    val wd = new Array[Byte](1024 + body.length)
    putU16(wd, 0, 0xA5DC)  // wIdent: Word 6/95
    putU16(wd, 2, 104)     // nFib: Word 95
    putU16(wd, 0x0A, 0)    // flags: not complex, not encrypted
    putI32(wd, 24, 1024)   // fcMin
    putI32(wd, 28, 1024 + body.length) // fcMac
    System.arraycopy(body, 0, wd, 1024, body.length)
    cfb("WordDocument" -> wd)
  }

  private def pptRecord(verInst: Int, recType: Int,
                        payload: Array[Byte]): Array[Byte] = {
    val b = new Array[Byte](8 + payload.length)
    putU16(b, 0, verInst); putU16(b, 2, recType)
    putI32(b, 4, payload.length)
    System.arraycopy(payload, 0, b, 8, payload.length)
    b
  }

  /** A REAL PowerPoint 97 .ppt: one container record wrapping a single
    * TextCharsAtom (UTF-16LE) holding `text`, plus a filler atom so the
    * record stream is 8-byte-aligned (zero padding then parses as benign
    * empty records).
    */
  def ppt97(text: String): Array[Byte] = {
    val body = pptRecord(0x000F, 0x03EE,
      pptRecord(0x0000, 0x0FA0, text.getBytes(StandardCharsets.UTF_16LE)))
    val pad = (8 - (body.length % 8)) % 8
    cfb("PowerPoint Document" ->
      (body ++ pptRecord(0x0000, 0x2AFC, new Array[Byte](pad))))
  }

  /** A REAL subset-font PDF: a Type0 font whose 2-byte glyph codes are
    * meaningless without its generated ToUnicode CMap — code k+1 maps to
    * the k-th distinct UTF-16 unit of `text`, and the content stream
    * shows `text` as one hex string of those codes. Extraction is exact
    * ONLY through the CMap interpreter (the raw byte fallback yields
    * garbage), so a round-trip gate pins the subset-font path the way
    * `word97Doc` pins the piece table.
    */
  def subsetPdf(text: String): Array[Byte] = {
    val distinct = text.distinct
    require(distinct.length <= 0xFFFE,
      "graft.LegacyOfficeFixtures: subsetPdf caps at 65534 distinct units")
    val bfchars = distinct.zipWithIndex.map { case (c, k) =>
      f"<${k + 1}%04X> <${c.toInt}%04X>"
    }
    val cmap = "begincmap\n" +
      "1 begincodespacerange <0000> <FFFF> endcodespacerange\n" +
      bfchars.grouped(100).map(g =>
        s"${g.size} beginbfchar\n${g.mkString("\n")}\nendbfchar")
        .mkString("\n") +
      "\nendcmap"
    val codes = text.map(c => f"${distinct.indexOf(c) + 1}%04X").mkString
    val content = s"BT /F1 12 Tf <$codes> Tj ET"
    def obj(n: Int, body: String) = s"$n 0 obj\n$body\nendobj\n"
    ("%PDF-1.4\n" +
      obj(1, "<< /Type /Page /Resources << /Font << /F1 2 0 R >> >> >>") +
      obj(2, "<< /Type /Font /Subtype /Type0 /BaseFont /AAAAAA+Gen " +
        "/Encoding /Identity-H /ToUnicode 3 0 R >>") +
      obj(3, s"<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream") +
      obj(4, s"<< /Length ${content.length} >>\nstream\n$content\nendstream"))
      .getBytes(StandardCharsets.ISO_8859_1)
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length / 2))
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** ASCII85 encoder (ISO 32000 §7.4.3) — the writer side of
    * `DocumentExtract.ascii85Decode`: 4 bytes → 5 chars `!`..`u`, all-zero
    * groups as `z`, partial final group of n bytes → n+1 chars, `~>`
    * terminator.
    */
  private[graft] def ascii85Encode(data: Array[Byte]): String = {
    val sb = new StringBuilder(data.length * 5 / 4 + 4)
    var i = 0
    while (i < data.length) {
      val n = math.min(4, data.length - i)
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (if (j < n) data(i + j) & 0xFF else 0); j += 1 }
      if (n == 4 && v == 0) sb += 'z'
      else {
        val cs = new Array[Char](5)
        var k = 4
        while (k >= 0) { cs(k) = ('!' + (v % 85).toInt).toChar; v /= 85; k -= 1 }
        var t = 0
        while (t <= n) { sb += cs(t); t += 1 }
      }
      i += 4
    }
    sb.append("~>").toString
  }

  /** LZW encoder (ISO 32000 §7.4.4, EarlyChange=1) — the writer side of
    * `DocumentExtract.lzwDecode`: leading clear code, 9→12-bit MSB-first
    * codes with the width bump one entry before each power-of-two
    * boundary (at decoder next-code 511/1023/2047, the pdf.js / libtiff
    * convention), table growing to the full 4096 entries then frozen,
    * trailing EOD. Kept exactly symmetric with the decoder so
    * round-trip gates pin the pair, and pinned against an independent
    * pdf.js-convention decoder in `DocumentExtractSpec`.
    */
  private[graft] def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val dict = mutable.HashMap.empty[String, Int]
    for (i <- 0 until 256) dict(String.valueOf(i.toChar)) = i
    var next = 258
    // The code width follows the DECODER's table size, which lags the
    // encoder's by one entry mid-stream and — because the decoder also
    // assigns an entry for the FINAL data code while the encoder does
    // not — by a different amount at the stream tail. Simulating the
    // decoder's table directly (rather than tracking the encoder's own
    // next code) is what keeps the width of the final data code and the
    // EOD marker in sync across a bump boundary.
    var emitted = 0
    def width: Int = {
      val decSize = math.min(4096, 258 + math.max(0, emitted - 1))
      var w = 9
      while (w < 12 && decSize + 1 > (1 << w) - 1) w += 1
      w
    }
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length))
    var bitBuf = 0L
    var bitCnt = 0
    def emit(code: Int): Unit = {
      val wd = width
      bitBuf = (bitBuf << wd) | code; bitCnt += wd
      while (bitCnt >= 8) {
        out.write(((bitBuf >> (bitCnt - 8)) & 0xFF).toInt); bitCnt -= 8
      }
    }
    emit(256)
    var w = ""
    var i = 0
    while (i < data.length) {
      val c = (data(i) & 0xFF).toChar
      if (dict.contains(w + c)) w += c
      else {
        emit(dict(w)); emitted += 1
        if (next < 4096) { dict(w + c) = next; next += 1 }
        w = String.valueOf(c)
      }
      i += 1
    }
    if (w.nonEmpty) { emit(dict(w)); emitted += 1 }
    emit(257)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xFF).toInt)
    out.toByteArray
  }

  /** The [[subsetPdf]] document re-packed the way a MODERN (PDF ≥ 1.5)
    * generator writes it: the page and font dicts live inside a
    * FlateDecode'd `/Type /ObjStm` object stream (invisible to a raw
    * `N 0 obj` scan until the ObjStm is inflated and spliced), the
    * ToUnicode CMap stream is filtered through the
    * `[/ASCII85Decode /FlateDecode]` CHAIN, the content stream through
    * `/LZWDecode`, and the cross-reference table is a `/Type /XRef`
    * stream (no classic `xref` section at all). One fixture therefore
    * exercises ObjStm splicing, all three filter decoders, filter
    * chaining, and xref-stream-only layout — extraction is exact ONLY if
    * every one of them works.
    */
  def subsetPdfObjStm(text: String): Array[Byte] = {
    val distinct = text.distinct
    require(distinct.length <= 0xFFFE,
      "graft.LegacyOfficeFixtures: subsetPdfObjStm caps at 65534 distinct units")
    val bfchars = distinct.zipWithIndex.map { case (c, k) =>
      f"<${k + 1}%04X> <${c.toInt}%04X>"
    }
    val cmap = "begincmap\n" +
      "1 begincodespacerange <0000> <FFFF> endcodespacerange\n" +
      bfchars.grouped(100).map(g =>
        s"${g.size} beginbfchar\n${g.mkString("\n")}\nendbfchar")
        .mkString("\n") +
      "\nendcmap"
    val codes = text.map(c => f"${distinct.indexOf(c) + 1}%04X").mkString
    val content = s"BT /F1 12 Tf <$codes> Tj ET"
    val inner1 = "<< /Type /Page /Resources << /Font << /F1 5 0 R >> >> >>"
    val inner5 = "<< /Type /Font /Subtype /Type0 /BaseFont /BBBBBB+Gen " +
      "/Encoding /Identity-H /ToUnicode 3 0 R >>"
    val hdr = s"1 0 5 ${inner1.length + 1} "
    val stm = deflate((hdr + inner1 + "\n" + inner5)
      .getBytes(StandardCharsets.ISO_8859_1))
    val cmapData = ascii85Encode(
      deflate(cmap.getBytes(StandardCharsets.ISO_8859_1)))
      .getBytes(StandardCharsets.ISO_8859_1)
    val lzwContent = lzwEncode(content.getBytes(StandardCharsets.ISO_8859_1))
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    val off2 = out.size
    w(s"2 0 obj\n<< /Type /ObjStm /N 2 /First ${hdr.length} " +
      s"/Length ${stm.length} /Filter /FlateDecode >>\nstream\n")
    out.write(stm); w("\nendstream\nendobj\n")
    val off3 = out.size
    w(s"3 0 obj\n<< /Length ${cmapData.length} " +
      "/Filter [ /ASCII85Decode /FlateDecode ] >>\nstream\n")
    out.write(cmapData); w("\nendstream\nendobj\n")
    val off4 = out.size
    w(s"4 0 obj\n<< /Length ${lzwContent.length} /Filter /LZWDecode >>\nstream\n")
    out.write(lzwContent); w("\nendstream\nendobj\n")
    // Cross-reference STREAM (/W [1 4 1]: type, 4-byte offset-or-objstm,
    // 1-byte gen-or-index): type 2 entries point objects 1 and 5 into
    // ObjStm 2 at indices 0 and 1.
    val xrefOff = out.size
    def entry(t: Int, f2: Int, f3: Int): Array[Byte] = Array(
      t.toByte, ((f2 >> 24) & 0xFF).toByte, ((f2 >> 16) & 0xFF).toByte,
      ((f2 >> 8) & 0xFF).toByte, (f2 & 0xFF).toByte, f3.toByte)
    val xrefData = deflate(Array(
      entry(0, 0, 255), entry(2, 2, 0), entry(1, off2, 0),
      entry(1, off3, 0), entry(1, off4, 0), entry(2, 2, 1),
      entry(1, xrefOff, 0)).flatten)
    w(s"6 0 obj\n<< /Type /XRef /Size 7 /W [ 1 4 1 ] /Root 1 0 R " +
      s"/Length ${xrefData.length} /Filter /FlateDecode >>\nstream\n")
    out.write(xrefData); w("\nendstream\nendobj\n")
    w(s"startxref\n$xrefOff\n%%EOF")
    out.toByteArray
  }

  /** RunLengthEncode (ISO 32000 §7.4.5 writer): repeat runs of ≥ 3 equal
    * bytes become `(257−n, byte)` pairs (n ≤ 128), everything else
    * accumulates into literal runs of ≤ 128, EOD byte 128 trails. The
    * writer side of `DocumentExtract.runLengthDecode`.
    */
  private[graft] def rleEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(16, data.length / 2))
    var i = 0
    while (i < data.length) {
      var run = 1
      while (i + run < data.length && data(i + run) == data(i) && run < 128)
        run += 1
      if (run >= 3) {
        out.write(257 - run); out.write(data(i) & 0xFF); i += run
      } else {
        // literal run: scan forward until a ≥3 repeat starts or 128 cap
        var j = i + 1
        var lastRun = 1
        while (j < data.length && j - i < 128 && lastRun < 3) {
          if (data(j) == data(j - 1)) lastRun += 1 else lastRun = 1
          j += 1
        }
        val end = if (lastRun >= 3) j - lastRun else j
        val len = math.max(1, end - i)
        out.write(len - 1); out.write(data, i, len); i += len
      }
    }
    out.write(128) // EOD
    out.toByteArray
  }

  /** PNG Up-filter predictor (type 2) over fixed-width rows — the writer
    * side of `DocumentExtract.pngUnpredict` for `/Predictor 12` streams:
    * each output row is the tag byte 2 followed by `cur − prevRow` per
    * byte; the final row may be short.
    */
  private[graft] def pngPredictUp(data: Array[Byte], columns: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + data.length / columns + 2)
    val prev = new Array[Byte](columns)
    var i = 0
    while (i < data.length) {
      val n = math.min(columns, data.length - i)
      out.write(2)
      var j = 0
      while (j < n) {
        out.write((data(i + j) - prev(j)) & 0xFF); j += 1
      }
      if (n == columns) System.arraycopy(data, i, prev, 0, columns)
      i += n
    }
    out.toByteArray
  }

  /** The [[subsetPdfObjStm]] document re-packed the way a pdfTeX-class
    * generator writes it: the ObjStm is PNG-Up-predicted
    * (`/DecodeParms << /Predictor 12 /Columns 16 >>`) before Flate — the
    * predictor layout real xref/object streams carry — the content
    * stream uses `/RunLengthDecode`, and the CMap keeps its
    * `[/ASCII85Decode /FlateDecode]` chain with an array-form
    * `/DecodeParms [ null null ]`. Extraction is exact ONLY if the
    * predictor undo, the RunLength decoder, AND the parms/filter index
    * alignment all work.
    */
  def subsetPdfObjStmPredictor(text: String): Array[Byte] = {
    val distinct = text.distinct
    require(distinct.length <= 0xFFFE,
      "graft.LegacyOfficeFixtures: subsetPdfObjStmPredictor caps at 65534 distinct units")
    val bfchars = distinct.zipWithIndex.map { case (c, k) =>
      f"<${k + 1}%04X> <${c.toInt}%04X>"
    }
    val cmap = "begincmap\n" +
      "1 begincodespacerange <0000> <FFFF> endcodespacerange\n" +
      bfchars.grouped(100).map(g =>
        s"${g.size} beginbfchar\n${g.mkString("\n")}\nendbfchar")
        .mkString("\n") +
      "\nendcmap"
    val codes = text.map(c => f"${distinct.indexOf(c) + 1}%04X").mkString
    val content = s"BT /F1 12 Tf <$codes> Tj ET"
    val inner1 = "<< /Type /Page /Resources << /Font << /F1 5 0 R >> >> >>"
    val inner5 = "<< /Type /Font /Subtype /Type0 /BaseFont /BBBBBB+Gen " +
      "/Encoding /Identity-H /ToUnicode 3 0 R >>"
    val hdr = s"1 0 5 ${inner1.length + 1} "
    val stm = deflate(pngPredictUp((hdr + inner1 + "\n" + inner5)
      .getBytes(StandardCharsets.ISO_8859_1), columns = 16))
    val cmapData = ascii85Encode(
      deflate(cmap.getBytes(StandardCharsets.ISO_8859_1)))
      .getBytes(StandardCharsets.ISO_8859_1)
    val rleContent = rleEncode(content.getBytes(StandardCharsets.ISO_8859_1))
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    val off2 = out.size
    w(s"2 0 obj\n<< /Type /ObjStm /N 2 /First ${hdr.length} " +
      s"/Length ${stm.length} /Filter /FlateDecode " +
      "/DecodeParms << /Predictor 12 /Colors 1 /BitsPerComponent 8 " +
      "/Columns 16 >> >>\nstream\n")
    out.write(stm); w("\nendstream\nendobj\n")
    val off3 = out.size
    w(s"3 0 obj\n<< /Length ${cmapData.length} " +
      "/Filter [ /ASCII85Decode /FlateDecode ] " +
      "/DecodeParms [ null null ] >>\nstream\n")
    out.write(cmapData); w("\nendstream\nendobj\n")
    val off4 = out.size
    w(s"4 0 obj\n<< /Length ${rleContent.length} " +
      "/Filter /RunLengthDecode >>\nstream\n")
    out.write(rleContent); w("\nendstream\nendobj\n")
    val xrefOff = out.size
    def entry(t: Int, f2: Int, f3: Int): Array[Byte] = Array(
      t.toByte, ((f2 >> 24) & 0xFF).toByte, ((f2 >> 16) & 0xFF).toByte,
      ((f2 >> 8) & 0xFF).toByte, (f2 & 0xFF).toByte, f3.toByte)
    // Xref stream with the REAL-WORLD layout: PNG-Up-predicted rows
    // before Flate (what pdfTeX/Acrobat emit; graft's object scan never
    // reads it, but a conformant external reader must be able to).
    val xrefRaw = Array(
      entry(0, 0, 255), entry(2, 2, 0), entry(1, off2, 0),
      entry(1, off3, 0), entry(1, off4, 0), entry(2, 2, 1),
      entry(1, xrefOff, 0)).flatten
    val xrefData = deflate(pngPredictUp(xrefRaw, columns = 6))
    w(s"6 0 obj\n<< /Type /XRef /Size 7 /W [ 1 4 1 ] /Root 1 0 R " +
      s"/Length ${xrefData.length} /Filter /FlateDecode " +
      "/DecodeParms << /Predictor 12 /Columns 6 >> >>\nstream\n")
    out.write(xrefData); w("\nendstream\nendobj\n")
    w(s"startxref\n$xrefOff\n%%EOF")
    out.toByteArray
  }

  /** A REAL BIFF8 .xls: BOF, an SST with ONE wide string holding `text`,
    * one LabelSst cell referencing it, EOF, and a 4-byte-alignment filler
    * record. Text caps at the single-record SST limit (u16 payload).
    */
  def biff8Xls(text: String): Array[Byte] = {
    require(text.length <= 30000,
      "graft.LegacyOfficeFixtures: single-record SST caps at 30000 chars")
    val chars = text.getBytes(StandardCharsets.UTF_16LE)
    val sst = new Array[Byte](8 + 3 + chars.length)
    putI32(sst, 0, 1); putI32(sst, 4, 1)
    putU16(sst, 8, text.length); sst(10) = 1 // fHighByte: wide
    System.arraycopy(chars, 0, sst, 11, chars.length)
    val cell = new Array[Byte](10) // rw=0, col=0, ixfe=0, isst=0
    val out = new java.io.ByteArrayOutputStream()
    def rec(t: Int, payload: Array[Byte]): Unit = {
      val h = new Array[Byte](4)
      putU16(h, 0, t); putU16(h, 2, payload.length)
      out.write(h); out.write(payload)
    }
    rec(0x0809, new Array[Byte](16))
    rec(0x00FC, sst)
    rec(0x00FD, cell)
    rec(0x000A, Array.emptyByteArray)
    rec(0x2222, new Array[Byte]((4 - out.size % 4) % 4))
    cfb("Workbook" -> out.toByteArray)
  }

  /** A REAL Excel 5.0/95 (BIFF5) workbook: BOF declaring vers 0x0500,
    * then one inline-string LABEL (0x0204) cell per line (cp1252, the
    * pre-97 layout — no SST), then EOF, in the era's "Book" CFB stream.
    * Caps at BIFF5's 255-char cell limit and cp1252-encodable text by
    * construction (non-encodable chars become '?', same stance as
    * [[word95Doc]]) — gates feed ASCII-printable payloads.
    */
  def biff5Xls(lines: Seq[String]): Array[Byte] = {
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    val out = new java.io.ByteArrayOutputStream()
    def rec(t: Int, payload: Array[Byte]): Unit = {
      val h = new Array[Byte](4)
      putU16(h, 0, t); putU16(h, 2, payload.length)
      out.write(h); out.write(payload)
    }
    val bof = new Array[Byte](8)
    putU16(bof, 0, 0x0500) // vers: BIFF5
    putU16(bof, 2, 0x0005) // dt: workbook globals
    rec(0x0809, bof)
    lines.zipWithIndex.foreach { case (line, i) =>
      val b = line.getBytes(cp1252)
      require(b.length <= 255,
        "graft.LegacyOfficeFixtures: BIFF5 LABEL caps at 255 chars")
      val p = new Array[Byte](8 + b.length)
      putU16(p, 0, i & 0xFFFF) // rw
      putU16(p, 2, 0)          // col
      putU16(p, 4, 0)          // ixfe
      putU16(p, 6, b.length)
      System.arraycopy(b, 0, p, 8, b.length)
      rec(0x0204, p)
    }
    rec(0x000A, Array.emptyByteArray)
    // align to 4 so the cfb fixture's sector zero-padding tiles as empty
    // records (the biff8Xls convention)
    rec(0x2222, new Array[Byte]((4 - out.size % 4) % 4))
    cfb("Book" -> out.toByteArray)
  }
}
