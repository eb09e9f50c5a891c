package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DocumentExtract
import graft.sources.{ArchiveFixtures, LocalFileSource}

/** mbox (RFC 4155) mail-archive extraction: envelope framing, mboxrd
  * quoting reversal, per-message MIME decode through the eml stack.
  */
class MboxSpec extends AnyFunSuite with SparkTestBase {

  private def extract(s: String) =
    DocumentExtract.extract("mbox", "t.mbox", s.getBytes(UTF_8))

  test("two messages split on envelope lines; subjects and bodies decode") {
    val raw = ArchiveFixtures.mboxrd(Seq(
      "Subject: first\n\nbody one",
      "Subject: second\n\nbody two"))
    assert(extract(raw) == "first\n\nbody one\n\nsecond\n\nbody two")
  }

  test("mboxrd quoting round-trips From-lines at any depth") {
    val body = "a line\nFrom the start\n>From quoted once\n>>From twice\nnot From"
    val raw = ArchiveFixtures.mboxrd(Seq("Subject: q\n\n" + body))
    // writer must have quoted all three: the raw stream contains no bare
    // body line starting with "From " (only the envelope)
    val bodyLines = raw.linesIterator.toSeq.drop(1)
    assert(!bodyLines.exists(_.startsWith("From ")))
    assert(extract(raw) == "q\n\n" + body)
  }

  test("quoted-printable body with non-ASCII round-trips through UTF-8") {
    val text = "naïve — résumé ünïcode 日本語\nFrom = tricky=20"
    val m = "Subject: qp\nContent-Type: text/plain; charset=utf-8\n" +
      "Content-Transfer-Encoding: quoted-printable\n\n" + ArchiveFixtures.qpEncode(text)
    // QP encodes the space in "From " so no line can alias the envelope
    assert(!ArchiveFixtures.qpEncode(text).linesIterator.exists(_.startsWith("From ")))
    assert(extract(ArchiveFixtures.mboxrd(Seq(m))) == "qp\n\n" + text)
  }

  test("input without any envelope line is one bare message") {
    assert(extract("Subject: solo\n\njust me") == "solo\n\njust me")
  }

  test("golden RFC-4155-style fixture: CRLF lines, multipart, empties") {
    val raw =
      "From alice@example.org Thu Nov 21 09:55:06 2024\r\n" +
      "Subject: =?utf-8?B?Z3LDvMOfZQ==?=\r\n" +
      "Content-Type: multipart/alternative; boundary=\"b1\"\r\n" +
      "\r\n" +
      "--b1\r\n" +
      "Content-Type: text/plain\r\n" +
      "\r\n" +
      "plain wins\r\n" +
      "--b1\r\n" +
      "Content-Type: text/html\r\n" +
      "\r\n" +
      "<p>html loses</p>\r\n" +
      "--b1--\r\n" +
      "\r\n" +
      "From bob@example.org Thu Nov 21 10:00:00 2024\r\n" +
      "Subject: empty body\r\n" +
      "\r\n" +
      "\r\n"
    assert(extract(raw) == "grüße\n\nplain wins\n\nempty body")
  }

  test("S1 local_files dispatches .mbox through the registry") {
    val dir = tempDir("graft-mbox")
    Files.writeString(dir.resolve("mail.mbox"), ArchiveFixtures.mboxrd(Seq(
      "Subject: a\n\none", "Subject: b\n\ntwo")))
    val out = LocalFileSource(dir.toString).load(spark).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("content") == "a\n\none\n\nb\n\ntwo")
  }
}
