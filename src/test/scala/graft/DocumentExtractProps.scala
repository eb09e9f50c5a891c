package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{Deflater, ZipEntry, ZipOutputStream}

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{DocumentExtract, LegacyOfficeFixtures}

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

  property("ods round-trip: authored cell grid extracts tab/newline-joined") =
    forAll(Gen.choose(1, 5).flatMap(r => Gen.listOfN(r,
      Gen.choose(1, 4).flatMap(c => Gen.listOfN(c, para))))) { rows =>
      DocumentExtract.extract("ods", "p.ods",
        graft.functions.OdfFixtures.ods(rows)) ==
        rows.map(_.mkString("\t")).mkString("\n")
    }

  property("odp round-trip: authored pages extract blank-line separated") =
    forAll(Gen.choose(1, 4).flatMap(n => Gen.listOfN(n,
      Gen.choose(1, 4).flatMap(k => Gen.listOfN(k, para))))) { pages =>
      DocumentExtract.extract("odp", "p.odp",
        graft.functions.OdfFixtures.odp(pages)) ==
        pages.map(_.mkString("\n")).mkString("\n\n")
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

  property("ole2 round-trip: scraped text contains every authored sentence") =
    forAll(paras) { ps =>
      // Sentences >= the 5-char printable-run floor survive the scrape in
      // order; runs under it may drop (best-effort contract).
      val body = ps.map(p => p + " end").mkString(". ")
      val got = DocumentExtract.extract("doc", "p.doc",
        DocumentExtractSpec.cfbFixture("WordDocument", body))
      ps.filter(_.length >= 5).forall(got.contains)
    }

  // Adversarial robustness: arbitrary bytes behind the OLE2 magic, and bit
  // flips over a VALID container, must either scrape (string) or fail
  // loudly (IllegalArgumentException) — never hang, loop, or escape with a
  // different error. The bounds/cycle guards of the CFB walker are exactly
  // what this exercises.
  private val magic =
    Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)

  private val legacyTextGen: Gen[String] = Gen.listOf(Gen.oneOf(
    "plain ascii", "naïve café — dash", "中文段落", "é combining",
    "🙂🚀 astral", "tabs\tand\nlines", "[brackets]", "")).map(_.mkString(" "))

  property("legacy office writers round-trip text through the real walks") =
    forAll(legacyTextGen) { t0 =>
      val t = "[" + t0 + "]" // trim-proof; generator avoids CR/BEL/VT
      DocumentExtract.extract("doc", "p.doc",
        LegacyOfficeFixtures.word97Doc(t)) == t &&
      DocumentExtract.extract("ppt", "p.ppt",
        LegacyOfficeFixtures.ppt97(t)) == t &&
      DocumentExtract.extract("xls", "p.xls",
        LegacyOfficeFixtures.biff8Xls(t)) == t &&
      DocumentExtract.extract("pdf", "p.pdf",
        LegacyOfficeFixtures.subsetPdf(t)) == t &&
      DocumentExtract.extract("pdf", "p.pdf",
        LegacyOfficeFixtures.subsetPdfObjStm(t)) == t && {
        // Word 95 is single-byte cp1252 by format: unmappable chars
        // downconvert to '?' exactly as the fixture writer encodes them.
        val cp = java.nio.charset.Charset.forName("windows-1252")
        DocumentExtract.extract("doc", "p95.doc",
          LegacyOfficeFixtures.word95Doc(t)) == new String(t.getBytes(cp), cp)
      }
    }

  property("ole2 fuzz: random bytes after the magic never escape the contract") =
    forAll(Gen.choose(0, 2048).flatMap(n =>
        Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))),
        Gen.oneOf("doc", "ppt", "xls")) { (tail, ext) =>
      val bytes = magic ++ tail.toArray
      try { DocumentExtract.extract(ext, s"f.$ext", bytes); true }
      catch { case _: IllegalArgumentException => true }
    }

  property("ole2 fuzz: bit flips over a valid container never escape the contract") =
    forAll(Gen.choose(0L, Long.MaxValue), Gen.choose(1, 16),
        Gen.oneOf(("doc", "WordDocument"), ("ppt", "PowerPoint Document"),
          ("xls", "Workbook"))) { (seed, flips, extStream) =>
      val (ext, stream) = extStream
      val base = DocumentExtractSpec.cfbFixture(stream, "fuzz target body text")
      val rnd = new scala.util.Random(seed)
      val mutated = base.clone()
      (1 to flips).foreach { _ =>
        val i = rnd.nextInt(mutated.length)
        mutated(i) = (mutated(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      try { DocumentExtract.extract(ext, s"m.$ext", mutated); true }
      catch { case _: IllegalArgumentException => true }
    }

  property("ole2 fuzz: bit flips over REAL word97/ppt97/biff8 containers " +
      "never escape the contract") =
    forAll(Gen.choose(0L, Long.MaxValue), Gen.choose(1, 16),
        Gen.choose(0, 3)) { (seed, flips, which) =>
      val body = "real container fuzz body — naïve text"
      val (ext, base) = which match {
        case 0 => ("doc", LegacyOfficeFixtures.word97Doc(body))
        case 1 => ("ppt", LegacyOfficeFixtures.ppt97(body))
        case 2 => ("xls", LegacyOfficeFixtures.biff8Xls(body))
        case _ => ("doc", LegacyOfficeFixtures.word95Doc(body))
      }
      val rnd = new scala.util.Random(seed)
      val mutated = base.clone()
      (1 to flips).foreach { _ =>
        val i = rnd.nextInt(mutated.length)
        mutated(i) = (mutated(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      try { DocumentExtract.extract(ext, s"m.$ext", mutated); true }
      catch { case _: IllegalArgumentException => true }
    }
}
