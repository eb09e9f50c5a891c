package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** PII redaction and Gopher-style repetition signals (the remaining
  * TextAnalysis operators are value-pinned by the oracle gates).
  */
class TextAnalysisSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("redactPii scrubs emails, IPs, SSNs and phones; categories don't collide") {
    val df = Seq(
      (1L, "mail alice.smith+x@corp.example.org, host 10.20.30.40, ssn 123-45-6789, call +1 (415) 555-0142 now"),
      (2L, "no pii here, just 3.14 and the year 2026"),
      (3L, "two mails a@b.co c@d.io and dotted 255.255.255.255")
    ).toDF("id", "txt")
    val out = TextAnalysis.piiFrame(df, "txt", "id").collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(1L).getAs[String]("redacted") ==
      "mail [EMAIL], host [IP], ssn [SSN], call [PHONE] now")
    assert(out(1L).getAs[Long]("n_email") == 1 && out(1L).getAs[Long]("n_ipv4") == 1 &&
      out(1L).getAs[Long]("n_ssn") == 1 && out(1L).getAs[Long]("n_phone") == 1)
    // decimals / years are not IPs or phones
    assert(out(2L).getAs[String]("redacted").contains("3.14") &&
      out(2L).getAs[String]("redacted").contains("2026"))
    assert(Seq("n_email", "n_ipv4", "n_ssn", "n_phone").forall(c => out(2L).getAs[Long](c) == 0))
    assert(out(3L).getAs[Long]("n_email") == 2 && out(3L).getAs[Long]("n_ipv4") == 1)
  }

  test("repetitionFrame: duplicate lines and tokens measured, clean text scores 0") {
    val clean = "alpha beta gamma\ndelta epsilon zeta"
    val spam = "buy now\nbuy now\nbuy now\nlimited offer"
    val out = TextAnalysis.repetitionFrame(
      Seq((1L, clean), (2L, spam), (3L, ""), (4L, "word word word word")).toDF("id", "txt"),
      "txt", "id").collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(1L).getAs[Double]("dup_line_fraction") == 0.0 &&
      out(1L).getAs[Double]("dup_line_char_fraction") == 0.0)
    // spam: 4 lines, 2 distinct -> 0.5 dup fraction; "buy now" = 7 chars,
    // total 7*3 + 13 = 34, extra copies 14 -> 14/34
    assert(out(2L).getAs[Long]("n_lines") == 4)
    assert(out(2L).getAs[Double]("dup_line_fraction") == 0.5)
    assert(out(2L).getAs[Double]("dup_line_char_fraction") == math.rint(14.0 / 34.0 * 1e6) / 1e6)
    assert(out(3L).getAs[Double]("dup_token_fraction") == 0.0) // empty -> all zeros
    assert(out(4L).getAs[Double]("dup_token_fraction") == 0.75)
  }

  test("extractMainContent keeps content blocks, drops nav/link-farm/short blocks") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val page =
      """<div id="nav"><a href="/">Home</a> <a href="/a">About</a></div>
        |<p>This paragraph carries the genuine long-form article content of the page.</p>
        |<div><a href="/x">a long link label over here</a> <a href="/y">another long link label there</a> ok</div>
        |<p>Second real paragraph, also with plenty of honest words inside it.</p>
        |<div>tiny</div>""".stripMargin
    val out = Seq((1L, page)).toDF("id", "html")
      .select(TextFunctions.extractMainContent(org.apache.spark.sql.functions.col("html")))
      .as[String].collect().head
    assert(out ==
      "This paragraph carries the genuine long-form article content of the page.\n" +
        "Second real paragraph, also with plenty of honest words inside it.")
    // all-boilerplate page -> empty
    val none = Seq((1L, "<div><a href=\"/\">Home</a></div><div>tiny</div>"))
      .toDF("id", "html")
      .select(TextFunctions.extractMainContent(org.apache.spark.sql.functions.col("html")))
      .as[String].collect().head
    assert(none == "")
  }

  test("extractLinks: page order, markup-stripped anchors, href-less skipped") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val page = "x <a href=\"/one\">First link</a> y " +
      "<A HREF=\"https://e.com/p?q=1\">Ex <b>bold</b> label</A> z " +
      "<a name=\"anchor-only\">not a link</a> " +
      "<a class=\"btn\" href=\"/two\"> spaced </a>"
    val out = Seq((1L, page)).toDF("id", "html")
      .select(org.apache.spark.sql.functions.explode(
        TextFunctions.extractLinks(org.apache.spark.sql.functions.col("html"))).as("l"))
      .select("l.href", "l.anchor")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out == Seq(
      ("/one", "First link"),
      ("https://e.com/p?q=1", "Ex  bold  label"), // inner tags -> spaces
      ("/two", "spaced")))
    // no links at all -> empty array
    val none = Seq((1L, "<p>plain</p>")).toDF("id", "html")
      .select(org.apache.spark.sql.functions.size(
        TextFunctions.extractLinks(org.apache.spark.sql.functions.col("html"))))
      .collect().head.getInt(0)
    assert(none == 0)
  }

  test("scriptProfileFrame: per-script counts and non-Latin fraction") {
    import spark.implicits._
    val df = Seq(
      (1L, "hello привет"),  // 5 latin, 6 cyrillic
      (2L, "你好 abc"),       // 2 han, 3 latin
      (3L, "123 !!!")        // no letters at all
    ).toDF("id", "txt")
    val out = graft.operators.TextAnalysis.scriptProfileFrame(df, "txt", "id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out(1L) == ((5L, 6L, 0L, 0L, 0.545455)))
    assert(out(2L) == ((3L, 0L, 2L, 0L, 0.4)))
    assert(out(3L) == ((0L, 0L, 0L, 0L, 0.0)))
  }

  test("charEntropy: hand-computed values, degenerate and empty text") {
    import org.apache.spark.sql.functions.col
    val got = Seq(
      (1L, "abab"),   // two chars, p=1/2 each -> 1 bit
      (2L, "abcd"),   // four chars uniform -> 2 bits
      (3L, "aaaa"),   // one char -> 0 (p=1, ln 1 = 0)
      (4L, ""),       // empty -> 0 by definition
      (5L, "aab")     // 2/3, 1/3 -> ~0.918296
    ).toDF("doc_id", "text")
      .select(col("doc_id"), graft.operators.TextAnalysis.charEntropy(col("text")).as("h"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == 1.0 && got(2L) == 2.0)
    assert(got(3L) == 0.0 && got(4L) == 0.0)
    assert(got(5L) == 0.918296)
  }

  test("lexicalDiversityFrame: TTR and hapax hand-checked, empty text zeroed") {
    val got = Seq(
      (1L, "the cat sat on the mat"), // 6 toks, 5 distinct, hapax {cat,sat,on,mat}
      (2L, "spam spam spam"),         // 3 toks, 1 distinct, 0 hapax
      (3L, "")
    ).toDF("doc_id", "text")
    val rows = graft.operators.TextAnalysis
      .lexicalDiversityFrame(got, "text", "doc_id")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(rows(1L) == ((6L, 5L, 4L, 0.833333, 0.666667)))
    assert(rows(2L) == ((3L, 1L, 0L, 0.333333, 0.0)))
    assert(rows(3L) == ((0L, 0L, 0L, 0.0, 0.0)))
  }

  test("oovRateFrame: top-V vocab with deterministic ties, per-doc OOV, empty docs") {
    // Corpus counts: a=4, b=3, c=2, d=2, e=1. vocabSize=3 -> vocab {a,b,c}
    // (c beats d on the token-asc tie-break).
    val docs = Seq(
      (1L, "a a b c d"),  // 5 toks, oov {d} -> 1
      (2L, "a b c d e"),  // 5 toks, oov {d,e} -> 2
      (3L, "a a b"),      // 3 toks, 0 oov
      (4L, "")            // empty -> (0, 0, 0.0)
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .oovRateFrame(docs, "text", "doc_id", vocabSize = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((5L, 1L, 0.2)))
    assert(got(2L) == ((5L, 2L, 0.4)))
    assert(got(3L) == ((3L, 0L, 0.0)))
    assert(got(4L) == ((0L, 0L, 0.0)))
  }

  test("fertilityFrame: group-sum ratios hand-checked, empty group zeroed") {
    import org.apache.spark.sql.functions.col
    // Pinned BPE: "scan" -> 1 token, "value" -> 1, "xq" -> 2 ("x","q"
    // never merge). en: texts "scan value" (2w/2t/10c) and "xq" (1w/2t/2c)
    // -> fertility 4/3, chars_per_token 12/4 = 3.0.
    val docs = Seq(
      (1L, "en", "scan value"), (2L, "en", "xq"), (3L, "zz", "")
    ).toDF("doc_id", "lang", "text")
    val got = graft.operators.TextAnalysis
      .fertilityFrame(docs, "lang", "text",
        graft.functions.Bpe.count(col("text")))
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got("en") == ((2L, 3L, 4L, math.rint(4.0 / 3 * 1e6) / 1e6, 3.0)))
    assert(got("zz") == ((1L, 0L, 0L, 0.0, 0.0)))
  }

  test("readabilityFrame: hand-counted Flesch terms, floors and drops") {
    import spark.implicits._
    val docs = Seq(
      // "the cat sat. it ran!" -> 5 words, 2 sentence runs,
      // vowel runs: e,a,a,i,a -> 5 syllables
      (1L, "the cat sat. it ran!"),
      // no terminator -> sentence floor 1; y counts as a vowel run
      (2L, "xyz xyz"),
      (3L, ""), // zero words -> dropped
      (4L, "   ") // whitespace only -> dropped
    ).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis
      .readabilityFrame(docs, "text", "doc_id")
      .collect().map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_words"), x.getAs[Long]("n_sents"),
          x.getAs[Long]("n_syll"), x.getAs[Double]("reading_ease"),
          x.getAs[Double]("fk_grade")))).toMap
    assert(r.keySet == Set(1L, 2L))
    val (w, s, y) = (5.0, 2.0, 5.0)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(1L) == ((5L, 2L, 5L,
      r6(206.835 - 1.015 * (w / s) - 84.6 * (y / w)),
      r6(0.39 * (w / s) + 11.8 * (y / w) - 15.59))))
    assert(r(2L)._1 == 2L && r(2L)._2 == 1L && r(2L)._3 == 2L)
  }

  test("luhnValid: known cards, off-by-one digit, separators, short/empty") {
    import spark.implicits._
    val cases = Seq(
      ("4111111111111111", true),   // classic Visa test number
      ("4111111111111112", false),  // corrupted check digit
      ("4111 1111 1111 1111", true), // separators tolerated
      ("5500-0000-0000-0004", true), // Mastercard test number
      ("79927398713", false),       // valid Luhn but 11 digits < 12 floor
      ("799273987130", false),      // 12 digits, fold sums 62 -> invalid
      ("no digits at all", false),
      ("", false))
    val got = cases.map(_._1).toDF("s")
      .select(col("s"), graft.functions.TextFunctions.luhnValid(col("s")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (s, exp) => assert(got(s) == exp, s"'$s'") }
  }

  test("ibanValid: canonical valid IBANs, corruption, shape rejects") {
    import spark.implicits._
    val cases = Seq(
      ("DE89 3704 0044 0532 0130 00", true),  // canonical DE example
      ("GB82 WEST 1234 5698 7654 32", true),  // letters in the BBAN
      ("gb82 west 1234 5698 7654 32", true),  // case-folds
      ("DE89-3704-0044-0532-0130-00", true),  // dash separators
      ("DE88 3704 0044 0532 0130 00", false), // corrupted check digits
      ("GB82 WEST 1234 5698 7654 33", false), // corrupted tail
      ("DE89370400440532013", false),         // 19 chars but mod-97 fails
      ("1289 3704 0044 0532 0130 00", false), // digits where country goes
      ("DE89", false), ("", false))
    val got = cases.map(_._1).toDF("s")
      .select(col("s"), graft.functions.TextFunctions.ibanValid(col("s")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (s, exp) => assert(got(s) == exp, s"'$s'") }
  }

  test("wordNgrams: windows, short docs empty, joins with single spaces") {
    import spark.implicits._
    val df = Seq(Tuple1("a b c d"), Tuple1("a b"), Tuple1("")).toDF("t")
    val got = df.select(graft.operators.TextAnalysis
        .wordNgrams(col("t"), 3).as("g"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(got == Seq(Seq("a b c", "b c d"), Seq.empty, Seq.empty))
  }

  test("kwic: per-occurrence windows, edge clipping, 1-based positions") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val df = Seq((1L, "x spark y z spark"), (2L, "no hits here"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .kwic(df, "text", "doc_id", "spark", context = 2)
      .orderBy("pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 2L, "x spark y z", 4L),       // left clipped at the doc edge
      (1L, 5L, "y z spark", 3L)))        // right clipped
    intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.kwic(df, "text", "doc_id", "", 2)
    }
  }

  test("front matter: quoted values strip, missing keys null, body splits") {
    import org.apache.spark.sql.functions.col
    val fenced = "---\ntitle: \"Quoted: Title\"\nauthor: 'single'\n" +
      "tags: a, b\nempty:\n---\nbody line\n---\nnot a fence"
    val plain = "no front matter\n---\nstray fence"
    val df = Seq((1L, fenced), (2L, plain)).toDF("id", "text")
    val got = df.select(col("id"),
      graft.functions.TextFunctions.frontMatterField(col("text"), "title").as("t"),
      graft.functions.TextFunctions.frontMatterField(col("text"), "author").as("a"),
      graft.functions.TextFunctions.frontMatterField(col("text"), "tags").as("g"),
      graft.functions.TextFunctions.frontMatterField(col("text"), "empty").as("e"),
      graft.functions.TextFunctions.frontMatterField(col("text"), "absent").as("x"),
      graft.functions.TextFunctions.frontMatterBody(col("text")).as("b"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getString(1) == "Quoted: Title")
    assert(got(1L).getString(2) == "single")
    assert(got(1L).getString(3) == "a, b")
    assert(got(1L).isNullAt(4) && got(1L).isNullAt(5))
    assert(got(1L).getString(6) == "body line\n---\nnot a fence")
    // no front matter: fields null, body untouched (stray fence survives)
    assert(got(2L).isNullAt(1) && got(2L).getString(6) == plain)
    // CRLF (Windows-authored) fences split too, values CR-stripped
    val crlf = "---\r\ntitle: Win\r\n---\r\nbody"
    val winRow = Seq((3L, crlf)).toDF("id", "text").select(
      graft.functions.TextFunctions.frontMatterField(col("text"), "title").as("t"),
      graft.functions.TextFunctions.frontMatterBody(col("text")).as("b"))
      .collect().head
    assert(winRow.getString(0) == "Win" && winRow.getString(1) == "body")
    intercept[IllegalArgumentException] {
      graft.functions.TextFunctions.frontMatterField(col("text"), "bad key")
    }
  }
}
