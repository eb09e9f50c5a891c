package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Unicode canonicalization — the cleanup pass a crawl corpus needs BEFORE
  * fingerprinting, shingling, or exact dedup, so that byte-level variants
  * of the same text ("e"+combining-acute vs precomposed é, curly vs ASCII
  * quotes, NBSP vs space, zero-width joiners) collapse to one canonical
  * form and stop defeating hash-based operators.
  *
  * Reference scope: the reference normalizes per-line whitespace only
  * (`sources.py:143-147`, cf. [[TextFunctions.normalizeLines]]); full
  * Unicode canonicalization is part of the mandated training-data-pipeline
  * extension surface.
  *
  * Pipeline (order is part of the contract — the SQL oracle mirrors it
  * step for step):
  *   1. strip C0/C1-adjacent control chars (TAB/LF/CR survive for the
  *      whitespace pass; U+000B/U+000C die here so Java's and RE2's `\s`
  *      classes agree downstream);
  *   2. strip zero-width chars (ZWSP/ZWNJ/ZWJ/BOM) — BEFORE the
  *      normalizer, so a combining mark separated from its base by a
  *      zero-width char still composes (r16 property-test find: with the
  *      strip after NFC, "N"+ZWSP+U+0301 left a decomposed residue that a
  *      SECOND pass composed — not idempotent, and exactly the byte
  *      variant this operator exists to collapse);
  *   3. Unicode normalize — NFC by default (byte canonicalization only),
  *      NFKC on request (also folds compatibility forms: ligatures,
  *      fullwidth ASCII, circled digits);
  *   4. map typographic punctuation to ASCII: curly quotes, em/en dash,
  *      NBSP-family spaces;
  *   5. ellipsis to "...";
  *   6. collapse whitespace runs to one space and trim.
  *
  * The Normalizer step is a per-row JDK kernel (`java.text.Normalizer` —
  * Spark has no built-in); everything around it stays native codegen'd
  * expressions. All steps are narrow — no shuffle, pushdown-friendly.
  */
object Normalize {

  private val nfcUdf = udf((s: String) =>
    if (s == null) null else Normalizer.normalize(s, Normalizer.Form.NFC))
  private val nfkcUdf = udf((s: String) =>
    if (s == null) null else Normalizer.normalize(s, Normalizer.Form.NFKC))

  /** Typographic -> ASCII single-char map (step 4): curly double/single
    * quotes, em/en dash, NBSP / figure space / narrow NBSP.
    */
  private[graft] val MapFrom = "\u201C\u201D\u2018\u2019\u2014\u2013\u00A0\u2007\u202F"
  private[graft] val MapTo = "\"\"''--   "

  /** The full canonicalization chain; `form` is `"NFC"` or `"NFKC"`. */
  def cleanText(c: Column, form: String = "NFC"): Column = {
    val stripped = regexp_replace(c, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    val zw = regexp_replace(stripped, "[\\u200B-\\u200D\\uFEFF]", "")
    val norm = form.toUpperCase match {
      case "NFC"  => nfcUdf(zw)
      case "NFKC" => nfkcUdf(zw)
      case other  => throw new IllegalArgumentException(
        s"unknown normalization form '$other' (expected NFC or NFKC)")
    }
    val mapped = translate(norm, MapFrom, MapTo)
    val ell = replace(mapped, lit("…"), lit("..."))
    trim(regexp_replace(ell, "\\s+", " "))
  }
}
