package graft.functions

import java.nio.charset.StandardCharsets

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
    * the FAT path the reader exercises). One directory sector -> <= 3
    * streams; streams capped at 120 sectors total (far above any text
    * payload this builder carries).
    */
  def cfb(streams: (String, Array[Byte])*): Array[Byte] = {
    require(streams.size <= 3, "one dir sector holds at most 3 streams")
    val fat = new Array[Byte](512)
    putI32(fat, 0, FATSECT); putI32(fat, 4, END) // dir chain: just sector 1
    val dir = new Array[Byte](512)
    def dirEntry(idx: Int, name: String, objType: Int, start: Int,
                 size: Int): Unit = {
      val o = idx * 128
      val nm = name.getBytes(StandardCharsets.UTF_16LE)
      System.arraycopy(nm, 0, dir, o, nm.length)
      putU16(dir, o + 64, nm.length + 2)
      dir(o + 66) = objType.toByte; dir(o + 67) = 1
      putI32(dir, o + 68, FREE); putI32(dir, o + 72, FREE)
      putI32(dir, o + 76, 1)
      putI32(dir, o + 116, start); putI32(dir, o + 120, size)
    }
    dirEntry(0, "Root Entry", 5, END, 0)
    var next = 2
    val data = streams.zipWithIndex.map { case ((name, content), i) =>
      val padded = java.util.Arrays.copyOf(content,
        math.max(4096, ((content.length + 511) / 512) * 512))
      val nSec = padded.length / 512
      for (s <- next until next + nSec - 1) putI32(fat, s * 4, s + 1)
      putI32(fat, (next + nSec - 1) * 4, END)
      dirEntry(i + 1, name, 2, next, padded.length)
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
}
