package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextualFixtures, TextualFormats}

class TextualFormatsSpec extends AnyFunSuite {

  private def utf8(s: String) = s.getBytes(StandardCharsets.UTF_8)

  private def zip(entries: (String, String)*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    for ((name, content) <- entries) {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(content.getBytes(StandardCharsets.UTF_8))
      z.closeEntry()
    }
    z.close()
    out.toByteArray
  }

  // ------------------------------------------------------------ Jupyter

  test("ipynb v4 fixture round-trips payload through markdown/code/outputs/raw") {
    val payload = "line one\n\nline three\ttab \"quote\" \\backslash\nunicode \u00e9\u4e16"
    val got = TextualFormats.ipynb(TextualFixtures.ipynb4(payload))
    assert(got ==
      payload + "\n\nprint(1 + 1)\n\n2\ndone\n\n42\n\nrawtail")
  }

  test("ipynb v3 worksheets walk: input, pyout inline text, heading levels") {
    val payload = "legacy body"
    val got = TextualFormats.ipynb(TextualFixtures.ipynb3(payload))
    assert(got ==
      payload + "\n\nprint(1 + 1)\n\n2\nlegacy\n\n7\n\n## Legacy heading")
  }

  test("ipynb source as plain string and as list of lines both join faithfully") {
    val asString = """{"nbformat":4,"cells":[{"cell_type":"markdown","source":"a\nb"}]}"""
    val asList = """{"nbformat":4,"cells":[{"cell_type":"markdown","source":["a\n","b"]}]}"""
    assert(TextualFormats.ipynb(utf8(asString)) == "a\nb")
    assert(TextualFormats.ipynb(utf8(asList)) == "a\nb")
  }

  test("ipynb skips unknown cell types and cells with empty text") {
    val nb = """{"nbformat":4,"cells":[
      {"cell_type":"mystery","source":"ignored"},
      {"cell_type":"markdown","source":""},
      {"cell_type":"code","source":"x = 1","outputs":[]},
      {"cell_type":"code","source":"x","outputs":[{"output_type":"error","ename":"E"}]}]}"""
    assert(TextualFormats.ipynb(utf8(nb)) == "x = 1\n\nx")
  }

  test("ipynb structural breakage fails loudly") {
    val eArr = intercept[IllegalArgumentException](TextualFormats.ipynb(utf8("[1,2]")))
    assert(eArr.getMessage.contains("not an object"))
    val eNo = intercept[IllegalArgumentException](TextualFormats.ipynb(utf8("{}")))
    assert(eNo.getMessage.contains("neither"))
  }

  // ----------------------------------------------------------- subtitles

  test("srt fixture round-trips payload lines including blanks; markup strips") {
    val payload = "first line\n\nthird <not a tag\nfourth"
    val got = TextualFormats.srt(TextualFixtures.srt(payload.split("\n", -1).toSeq))
    assert(got == TextualFixtures.subtitleLeadText + "\n" +
      TextualFormats.stripCueMarkup(payload))
  }

  test("srt without index lines and with multi-line cues still parses") {
    val raw = "00:00:01,000 --> 00:00:02,000\nhello\nworld\n\n" +
      "00:00:03,000 --> 00:00:04,000\nbye\n"
    assert(TextualFormats.srt(raw) == "hello\nworld\nbye")
  }

  test("srt strips italic/ASS markup and fails loudly without a timing line") {
    val raw = "1\n00:00:01,000 --> 00:00:02,000\n{\\an8}<i>styled</i> text\n"
    assert(TextualFormats.srt(raw) == "styled text")
    val e = intercept[IllegalArgumentException](TextualFormats.srt("just\ntext\n"))
    assert(e.getMessage.contains("timing"))
  }

  test("vtt fixture round-trips payload; NOTE/STYLE blocks and ids vanish") {
    val payload = "caption one\n\n42\nlast"
    val got = TextualFormats.vtt(TextualFixtures.vtt(payload.split("\n", -1).toSeq))
    assert(got == TextualFixtures.subtitleLeadText + "\n" +
      TextualFormats.stripCueMarkup(payload))
  }

  test("vtt accepts BOM + bare signature, requires the signature otherwise") {
    val raw = "\ufeffWEBVTT\n\n00:01.000 --> 00:02.000\nhi <v Ann>there</v>\n"
    assert(TextualFormats.vtt(raw) == "hi there")
    val e = intercept[IllegalArgumentException](TextualFormats.vtt("1\n00:01.000 --> 00:02.000\nx"))
    assert(e.getMessage.contains("WEBVTT"))
  }

  // -------------------------------------------------------------- LaTeX

  test("tex fixture round-trips every escaped special through the walk") {
    val payload = "pct % amp & dollar $ hash # under _ braces {x} bslash \\ tilde ~ caret ^\nsecond line"
    val got = TextualFormats.tex(TextualFixtures.tex(payload))
    assert(got == "Header\n" + payload + "\nlast item")
  }

  test("tex drops comments, env names, and reference-style arguments") {
    val src = "intro % trailing comment\n\\begin{itemize}\n\\item one\n" +
      "\\end{itemize}\n\\cite{key2024} cited\n\\label{sec:x}done"
    // comment swallows its newline; \cite's space survives; raggedness is
    // detex-faithful — the gate pins the exact shape
    assert(TextualFormats.tex(src) == "intro \none\n\n cited\ndone")
  }

  test("tex keeps command arguments as prose and handles math + breaks") {
    val src = "\\textbf{bold} and $x^2$ stays\\\\next\\ldots"
    assert(TextualFormats.tex(src) == "bold and x^2 stays\nnext...")
  }

  test("tex preamble is skipped only when a document body exists") {
    val full = "\\documentclass{article}\n\\begin{document}\nbody\n\\end{document}"
    assert(TextualFormats.tex(full) == "body")
    val fragment = "no preamble \\emph{here}"
    assert(TextualFormats.tex(fragment) == "no preamble here")
  }

  test("sniff names containers by content; extractAuto overrides mislabels") {
    import graft.functions.{DocumentExtract, LegacyOfficeFixtures, OdfFixtures}
    assert(DocumentExtract.sniff(LegacyOfficeFixtures.subsetPdf("x")) == Some("pdf"))
    assert(DocumentExtract.sniff(LegacyOfficeFixtures.word97Doc("x")) == Some("doc"))
    assert(DocumentExtract.sniff(LegacyOfficeFixtures.ppt97("x")) == Some("ppt"))
    assert(DocumentExtract.sniff(LegacyOfficeFixtures.biff8Xls("x")) == Some("xls"))
    assert(DocumentExtract.sniff(OdfFixtures.odt("x")) == Some("odt"))
    assert(DocumentExtract.sniff(OdfFixtures.ods(Seq(Seq("x")))) == Some("ods"))
    assert(DocumentExtract.sniff(OdfFixtures.odp(Seq(Seq("x")))) == Some("odp"))
    assert(DocumentExtract.sniff(utf8("{\\rtf1 hi}")) == Some("rtf"))
    assert(DocumentExtract.sniff(utf8("WEBVTT\n")) == Some("vtt"))
    assert(DocumentExtract.sniff(
      utf8("""{"nbformat":4,"cells":[]}""")) == Some("ipynb"))
    // plain text: no signature -> declared extension stays in charge
    assert(DocumentExtract.sniff(utf8("just words")) == None)
    // "From " as prose is NOT an mbox; the RFC 4155 envelope shape is
    assert(DocumentExtract.sniff(
      utf8("From the archives of 1999, a story.")) == None)
    assert(DocumentExtract.sniff(utf8(
      graft.sources.ArchiveFixtures.mboxrd(Seq("Subject: s\n\nbody")))) == Some("mbox"))
    // docx zip (no mimetype member) sniffs by entry prefix
    val docXml = "<w:document><w:body><w:p><w:r><w:t>mislabeled</w:t></w:r></w:p></w:body></w:document>"
    val docxBytes = zip("word/document.xml" -> docXml)
    assert(DocumentExtract.sniff(docxBytes) == Some("docx"))
    assert(DocumentExtract.extractAuto("pdf", "wrong.pdf", docxBytes) == "mislabeled")
    // correctly-labeled content is unchanged by the auto path
    assert(DocumentExtract.extractAuto("odt", "right.odt", OdfFixtures.odt("ok")) == "ok")
  }

  test("dispatch routes ipynb/srt/vtt/tex through DocumentExtract") {
    import graft.functions.DocumentExtract
    assert(DocumentExtract.extract("ipynb", "t.ipynb",
      utf8("""{"nbformat":4,"cells":[{"cell_type":"raw","source":"r"}]}""")) == "r")
    assert(DocumentExtract.extract("srt", "t.srt",
      utf8("1\n00:00:01,000 --> 00:00:02,000\nx\n")) == "x")
    assert(DocumentExtract.extract("vtt", "t.vtt",
      utf8("WEBVTT\n\n00:01.000 --> 00:02.000\ny\n")) == "y")
    assert(DocumentExtract.extract("tex", "t.tex", utf8("z \\& w")) == "z & w")
  }
}
