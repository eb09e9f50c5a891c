package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar text helpers as pure Column expressions (codegen'd built-ins only —
  * no UDFs in this file). These reproduce the expression-level computations
  * inventoried in SURVEY.md §2.9 from the reference
  * (`yamlpipe/components/sources.py`, `state_manager.py`).
  */
object TextFunctions {

  /** Strip HTML tags and decode the common entities — the reference's
    * BeautifulSoup `get_text()` step (`sources.py:134-135`) re-expressed as a
    * regexp_replace chain.
    */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<(script|style)[^>]*>.*?</\\1>", "")
    val noTags = regexp_replace(noScript, "<[^>]*>", "")
    val entities = Seq(
      "&nbsp;" -> " ", "&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'")
    entities.foldLeft(noTags) { case (col, (e, r)) =>
      regexp_replace(col, e, java.util.regex.Matcher.quoteReplacement(r))
    }
  }

  /** jusText/trafilatura-style MAIN-CONTENT extraction: split the page at
    * block-level boundaries (</p>, </div>, </li>, headings, <br>), score
    * each block by its stripped-text length and its link-text density
    * (anchor inner-text chars / text chars), and keep only content-looking
    * blocks — navigation, footers, and link farms drop. The heuristic core
    * of every boilerplate-removal crawler, as pure codegen'd expressions
    * (split/transform/filter/regexp — no UDF, narrow, linear).
    *
    * A block survives when `len(text) >= minBlockChars` AND
    * `linkChars/len(text) <= maxLinkFrac` (empty blocks count as all-link).
    * Survivors re-join with newlines in page order.
    */
  def extractMainContent(html: Column, minBlockChars: Int = 25,
                         maxLinkFrac: Double = 0.3): Column = {
    val blocks = split(html, "(?i)</p>|</div>|</li>|</h[1-6]>|<br */?>", -1)
    val scored = transform(blocks, b => {
      // full-whitespace trim (plain trim() is spaces-only in both engines)
      val text = regexp_replace(stripHtml(b), "^\\s+|\\s+$", "")
      val linkChars = aggregate(
        transform(regexp_extract_all(b, lit("(?is)<a[^>]*>(.*?)</a>"), lit(1)),
          x => length(x)),
        lit(0), (acc, v) => acc + v).cast("double")
      struct(text.as("t"),
        (length(text) >= minBlockChars &&
          when(length(text) > 0, linkChars / length(text).cast("double"))
            .otherwise(lit(1.0)) <= maxLinkFrac).as("keep"))
    })
    array_join(
      transform(filter(scored, s => s.getField("keep")), s => s.getField("t")),
      "\n")
  }

  /** Outlink extraction — the crawl-side producer of the link graph (and
    * of anchor-text training signal): every `<a href="...">...</a>` in
    * page order as a struct array `(href, anchor)`, anchors stripped of
    * inner markup and whitespace-trimmed. Anchors without an href
    * attribute are not links and are skipped. Pure codegen'd
    * regexp/transform expressions — no UDF, narrow, linear; feeds
    * [[graft.operators.PageRank]] edges and URL-frontier dedup directly.
    */
  def extractLinks(html: Column): Column = {
    val tagRe = "(?is)<a\\s[^>]*href=\"([^\"]*)\"[^>]*>(.*?)</a>"
    transform(regexp_extract_all(html, lit(tagRe), lit(0)), t =>
      struct(
        regexp_extract(t, tagRe, 1).as("href"),
        regexp_replace(regexp_replace(regexp_extract(t, tagRe, 2),
          "<[^>]*>", " "), "^\\s+|\\s+$", "").as("anchor")))
  }

  /** Per-line strip, drop blank lines, re-join with "\n" — the reference's
    * web-source normalization (`sources.py:136-137`).
    */
  def normalizeLines(c: Column): Column =
    array_join(
      filter(
        transform(split(c, "\n"), l => trim(l)),
        l => length(l) > 0),
      "\n")

  /** Non-empty, non-whitespace content test (`sources.py:94`,
    * `chunkers.py:70,113`).
    */
  def nonBlank(c: Column): Column = length(trim(c)) > 0

  /** Content fingerprint for change detection — the reference hashes file
    * bytes with sha256 (`state_manager.py:141-147`); over a string column
    * this is `sha2(col, 256)`.
    */
  def fingerprint(c: Column): Column = sha2(c.cast("string"), 256)

  /** ETag-style quote stripping (`sources.py:187,209`). */
  def stripQuotes(c: Column): Column = regexp_replace(c, "[\"']", "")

  /** The adaptive chunker's markdown-ness heuristic as a Column
    * (`chunkers.py:161-171`): >= 2 occurrences of any of "\n# ", "\n## ",
    * "\n### ".
    */
  def isMarkdownish(c: Column): Column = {
    def occ(sub: String): Column = size(split(c, java.util.regex.Pattern.quote(sub), -1)) - 1
    (occ("\n# ") >= 2) || (occ("\n## ") >= 2) || (occ("\n### ") >= 2)
  }

  /** Whitespace token count. */
  def wsTokenCount(c: Column): Column =
    size(filter(split(c, "\\s+"), t => length(t) > 0))

  /** Luhn checksum validity of a digit string (spaces/dashes tolerated) —
    * the false-positive filter card-number PII detection needs: a 16-digit
    * run is only a payment card if its mod-10 check digit holds, which
    * eliminates ~90% of random digit runs. From the RIGHT, every second
    * digit doubles (minus 9 above 9); valid iff the fold sums to 0 mod 10.
    * Pure higher-order-function expression (filter/transform/aggregate
    * over the digit array) — codegen-friendly, no UDF; non-digit-bearing
    * or sub-12-digit inputs are invalid, never an error.
    */
  /** IBAN mod-97 validity (ISO 13616) — the bank-account counterpart of
    * [[luhnValid]]: uppercase, strip spaces/dashes, shape-check
    * (2 letters + 2 check digits + 11–30 alphanumerics), rotate the first
    * four chars to the end, then fold the digits-and-letters expansion
    * (A=10..Z=35) through a running `mod 97` — valid iff the remainder is
    * 1. The fold IS the big-integer mod (each step keeps acc < 97, so
    * `acc·100 + 35` never overflows a long) and runs as pure HOF
    * expressions over the char array — codegen'd, SQL-replayable, no UDF.
    */
  def ibanValid(c: Column): Column = {
    val s = upper(regexp_replace(c, "[\\s-]", ""))
    val shapeOk = s.rlike("^[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}$")
    val rot = concat(substring(s, 5, Int.MaxValue), substring(s, 1, 4))
    val chars = filter(split(rot, ""), ch => length(ch) > 0)
    val rem = aggregate(chars, lit(0L), (acc, ch) => {
      val v = ascii(ch).cast("long")
      when(ch.rlike("[0-9]"), (acc * 10 + (v - 48)) % 97)
        .otherwise((acc * 100 + (v - 55)) % 97)
    })
    shapeOk && (rem === 1L)
  }

  def luhnValid(c: Column): Column = {
    val ds = filter(split(c, ""), ch => ch.rlike("[0-9]"))
    val n = size(ds)
    // position from the right of element i (1-based): n - i; doubles when
    // that distance is even (2nd, 4th, ... from the right)
    val total = aggregate(
      zip_with(ds, sequence(lit(1), greatest(n, lit(1))), (d, i) => {
        val v = d.cast("int")
        val dbl = v * 2
        when(((n - i) % 2) === 1, when(dbl > 9, dbl - 9).otherwise(dbl))
          .otherwise(v)
      }),
      lit(0), (acc, x) => acc + x)
    (n >= 12) && (total % 10 === 0)
  }

  /** Jekyll/Hugo-style markdown front matter — the metadata convention a
    * documentation/blog corpus carries: a `---`-fenced block of
    * `key: value` lines opening at character 0. Pure codegen'd regex (no
    * UDF, no YAML engine) covering the scalar-string subset real corpora
    * use; list/nested values come through as their raw line text.
    */
  // \r?\n throughout: Windows-authored markdown fences CRLF and must
  // still split (the capture keeps per-line \r; the field regex strips it)
  private val FrontMatterBlock = "(?s)\\A---\\r?\\n(.*?\\r?\\n)---\\r?\\n"

  /** The value of `key` inside the front-matter block, surrounding single
    * or double quotes stripped; null when the document has no front matter
    * or the key is absent/empty. `key` must be a plain identifier.
    */
  def frontMatterField(t: Column, key: String): Column = {
    require(key.matches("[A-Za-z0-9_-]+"), s"front-matter key must be plain, got '$key'")
    val block = regexp_extract(t, FrontMatterBlock, 1)
    val raw = regexp_extract(block, "(?m)^" + key + ":[ \\t]*(.*?)\\r?$", 1)
    val unq = regexp_replace(
      regexp_replace(raw, "^\"(.*)\"$", "$1"), "^'(.*)'$", "$1")
    when(raw === "", lit(null).cast("string")).otherwise(unq)
  }

  /** The document with its front-matter block removed (the block is
    * anchored to the start, so at most one strip happens); documents
    * without front matter pass through unchanged.
    */
  def frontMatterBody(t: Column): Column =
    regexp_replace(t, FrontMatterBlock, "")
}
