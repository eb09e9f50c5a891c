package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Deterministic OpenDocument (ODF) WRITERS for the in-plan round-trip
  * gate and specs (the [[LegacyOfficeFixtures]] discipline): minimal but
  * structurally real content.xml bodies inside a zip container — text
  * runs entity-escaped, tabs/newlines as the `<text:tab/>` /
  * `<text:line-break/>` elements real ODF writers emit.
  */
object OdfFixtures {

  private def xmlEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    s.foreach {
      case '&'  => sb ++= "&amp;"
      case '<'  => sb ++= "&lt;"
      case '>'  => sb ++= "&gt;"
      case '"'  => sb ++= "&quot;"
      case '\'' => sb ++= "&apos;"
      case c    => sb += c
    }
    sb.toString
  }

  /** Escape + encode tab/newline as their ODF elements. */
  private def odfText(s: String): String =
    xmlEscape(s).replace("\t", "<text:tab/>").replace("\n", "<text:line-break/>")

  /** Real ODF container shape: the `mimetype` member FIRST and STORED
    * (uncompressed — §2.2.4 of the ODF spec; also what content sniffers
    * key on), then the compressed content.xml.
    */
  private def pack(mime: String, contentBody: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val z = new ZipOutputStream(out)
    val mb = mime.getBytes(StandardCharsets.US_ASCII)
    val m = new ZipEntry("mimetype")
    m.setTime(315532800000L)
    m.setMethod(java.util.zip.ZipOutputStream.STORED)
    m.setSize(mb.length)
    m.setCompressedSize(mb.length)
    val crc = new java.util.zip.CRC32(); crc.update(mb)
    m.setCrc(crc.getValue)
    z.putNextEntry(m)
    z.write(mb)
    z.closeEntry()
    val e = new ZipEntry("content.xml")
    e.setTime(315532800000L)
    z.putNextEntry(e)
    z.write(("<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
      "<office:document-content>" + contentBody + "</office:document-content>")
      .getBytes(StandardCharsets.UTF_8))
    z.closeEntry()
    z.close()
    out.toByteArray
  }

  /** Writer document: one text:p per paragraph. */
  def odt(paragraphs: Seq[String]): Array[Byte] =
    pack("application/vnd.oasis.opendocument.text",
      "<office:text>" +
        paragraphs.map(p => s"<text:p>${odfText(p)}</text:p>").mkString +
        "</office:text>")

  def odt(text: String): Array[Byte] = odt(Seq(text))

  /** Spreadsheet: one table of rows × cells, one text:p per cell. */
  def ods(rows: Seq[Seq[String]]): Array[Byte] =
    pack("application/vnd.oasis.opendocument.spreadsheet",
      "<office:spreadsheet><table:table table:name=\"Sheet1\">" +
        rows.map(r => "<table:table-row>" +
          r.map(c => s"<table:table-cell><text:p>${odfText(c)}</text:p></table:table-cell>").mkString +
          "</table:table-row>").mkString +
        "</table:table></office:spreadsheet>")

  /** Presentation: one draw:page per page, one text:p per paragraph. */
  def odp(pages: Seq[Seq[String]]): Array[Byte] =
    pack("application/vnd.oasis.opendocument.presentation",
      "<office:presentation>" +
        pages.map(pg => "<draw:page draw:name=\"p\"><draw:frame><draw:text-box>" +
          pg.map(p => s"<text:p>${odfText(p)}</text:p>").mkString +
          "</draw:text-box></draw:frame></draw:page>").mkString +
        "</office:presentation>")
}
