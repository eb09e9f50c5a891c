package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Normalize

class NormalizeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def clean(s: String, form: String = "NFC"): String =
    Seq(s).toDF("t").select(Normalize.cleanText(col("t"), form).as("o"))
      .as[String].collect()(0)

  test("NFC composes combining accents; typographic chars map to ASCII") {
    // e + combining acute (U+0301) -> precomposed U+00E9
    assert(clean("e\u0301le\u0300ve") == "\u00e9l\u00e8ve")
    // curly double/single quotes, em/en dash
    assert(clean("\u201Chi\u201D \u2018x\u2019 a\u2014b c\u2013d") ==
      "\"hi\" 'x' a-b c-d")
    // NBSP / figure space / narrow NBSP all become plain spaces
    assert(clean("a\u00A0b\u2007c\u202Fd") == "a b c d")
    assert(clean("wait\u2026 what") == "wait... what")
  }

  test("controls and zero-width chars stripped, whitespace collapsed") {
    assert(clean("a\u0007b") == "ab") // BEL
    assert(clean("z\u200Bw\u200C\u200Dj\uFEFF!") == "zwj!")
    assert(clean("  a\t\tb\r\nc  ") == "a b c")
    assert(clean("x\u000B\u000Cy") == "xy") // VT/FF die in the control pass
  }

  test("NFKC additionally folds compatibility forms") {
    assert(clean("\uFB01le", "NFKC") == "file")   // fi ligature
    assert(clean("\uFF21\uFF22", "NFKC") == "AB") // fullwidth A B
    assert(clean("\u2460", "NFKC") == "1")        // circled one
    assert(clean("\uFB01le") == "\uFB01le")       // NFC keeps the ligature
  }

  test("null passes through; unknown form fails loudly; idempotent") {
    val out = Seq[String](null).toDF("t")
      .select(Normalize.cleanText(col("t")).as("o")).collect()(0)
    assert(out.isNullAt(0))
    intercept[IllegalArgumentException](Normalize.cleanText(col("t"), "NFD"))
    val once = clean("e\u0301 \u201Cx\u201D\u2026  y")
    assert(clean(once) == once)
  }
}
