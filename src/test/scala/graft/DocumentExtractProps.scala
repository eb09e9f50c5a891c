package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{Deflater, ZipEntry, ZipOutputStream}

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.DocumentExtract

/** ScalaCheck properties for the offline document extractors: round-trip
  * provenance (author a container from random paragraphs, extract, get the
  * paragraphs back) must hold for EVERY input, not just the golden fixtures.
  */
object DocumentExtractProps extends Properties("DocumentExtract") {

  // Paragraph text free of XML-special and control characters (entity
  // escaping is pinned separately by the golden specs).
  private val word: Gen[String] =
    Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
  private val para: Gen[String] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
  private val paras: Gen[List[String]] = Gen.choose(1, 8).flatMap(Gen.listOfN(_, para))

  private def zip(entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (n, c) =>
      z.putNextEntry(new ZipEntry(n)); z.write(c.getBytes(StandardCharsets.UTF_8)); z.closeEntry()
    }
    z.close(); bos.toByteArray
  }

  property("docx round-trip: authored paragraphs extract verbatim") =
    forAll(paras) { ps =>
      val xml = "<w:document><w:body>" +
        ps.map(p => s"<w:p><w:r><w:t>$p</w:t></w:r></w:p>").mkString +
        "</w:body></w:document>"
      DocumentExtract.extract("docx", "p.docx", zip("word/document.xml" -> xml)) ==
        ps.mkString("\n\n")
    }

  property("odt round-trip: authored paragraphs extract verbatim") =
    forAll(paras) { ps =>
      val xml = "<office:text>" + ps.map(p => s"<text:p>$p</text:p>").mkString + "</office:text>"
      DocumentExtract.extract("odt", "p.odt", zip("content.xml" -> xml)) ==
        ps.mkString("\n\n")
    }

  property("pdf round-trip: one Tj line per paragraph, raw and deflated") =
    forAll(paras, Gen.oneOf(true, false)) { (ps, flate) =>
      val content = "BT " + ps.map(p => s"($p) Tj T*").mkString(" ") + " ET"
      val payload =
        if (!flate) content.getBytes(StandardCharsets.ISO_8859_1)
        else {
          val d = new Deflater(); d.setInput(content.getBytes(StandardCharsets.ISO_8859_1)); d.finish()
          val buf = new Array[Byte](content.length * 2 + 64)
          val m = d.deflate(buf); d.end()
          java.util.Arrays.copyOf(buf, m)
        }
      val filter = if (flate) " /Filter /FlateDecode" else ""
      val bos = new ByteArrayOutputStream()
      bos.write(s"%PDF-1.4\n1 0 obj\n<< /Length ${payload.length}$filter >>\nstream\n"
        .getBytes(StandardCharsets.ISO_8859_1))
      bos.write(payload)
      bos.write("\nendstream\nendobj".getBytes(StandardCharsets.ISO_8859_1))
      DocumentExtract.extract("pdf", "p.pdf", bos.toByteArray) == ps.mkString("\n")
    }

  property("rtf round-trip: \\par-separated plain lines extract verbatim") =
    forAll(paras) { ps =>
      val rtf = "{\\rtf1\\ansi " + ps.mkString("\\par ") + "}"
      DocumentExtract.extract("rtf", "p.rtf", rtf.getBytes(StandardCharsets.ISO_8859_1)) ==
        ps.mkString("\n")
    }

  property("xlsx round-trip: one shared-string cell per row") =
    forAll(paras) { ps =>
      val sst = "<sst>" + ps.map(p => s"<si><t>$p</t></si>").mkString + "</sst>"
      val sheet = "<worksheet><sheetData>" +
        ps.indices.map(i => s"""<row><c t="s"><v>$i</v></c></row>""").mkString +
        "</sheetData></worksheet>"
      DocumentExtract.extract("xlsx", "p.xlsx",
        zip("xl/sharedStrings.xml" -> sst, "xl/worksheets/sheet1.xml" -> sheet)) ==
        ps.mkString("\n")
    }
}
