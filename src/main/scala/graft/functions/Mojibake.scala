package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ftfy-style repair of the single most common text-encoding corruption in
  * web corpora: UTF-8 bytes decoded as Windows-1252 ("A-tilde copyright"
  * renderings of 'e-acute', "a-circumflex euro trademark" for a right
  * quote). Common Crawl-derived corpora hit this constantly, and the fix is
  * a deterministic ordered replacement chain - pure codegen'd `replace`
  * calls, no UDF, no shuffle, linear at any scale.
  *
  * Scope: ONE level of mis-decoding over the top ~34 sequences (curly
  * quotes, dashes, ellipsis, euro/trademark/bullet, Latin-1 accents, the
  * stray-A-circumflex pairs). Double-encoded text and the long tail are out
  * of scope - real ftfy detects encodings heuristically; this is the fixed
  * high-frequency table a Spark pipeline can afford on every row.
  *
  * Three-char sequences repair before two-char ones so an ellipsis
  * misdecode never first loses its 'a-circumflex' to an accent rule. The
  * table is exposed so the SQL oracle is GENERATED from it - engine and
  * oracle can never hold different mappings (same pattern as Bpe.merges).
  * All characters are \uXXXX-escaped: the source file stays pure ASCII.
  */
object Mojibake {

  /** (misdecoded, repaired), longest-first. Each left side is exactly the
    * cp1252 rendering of the right side's UTF-8 bytes (cp1252 holes 0x81,
    * 0x8d, 0x8f, 0x90, 0x9d fall back to the Latin-1 control char, matching
    * how lenient decoders surface them).
    */
  val table: Seq[(String, String)] = Seq(
    ("\u00e2\u20ac\u2122", "\u2019"), // right single quote
    ("\u00e2\u20ac\u02dc", "\u2018"), // left single quote
    ("\u00e2\u20ac\u0153", "\u201c"), // left double quote
    ("\u00e2\u20ac\u009d", "\u201d"), // right double quote (cp1252 hole 0x9d)
    ("\u00e2\u20ac\u201c", "\u2013"), // en dash
    ("\u00e2\u20ac\u201d", "\u2014"), // em dash
    ("\u00e2\u20ac\u00a6", "\u2026"), // ellipsis
    ("\u00e2\u201a\u00ac", "\u20ac"), // euro
    ("\u00e2\u201e\u00a2", "\u2122"), // trademark
    ("\u00e2\u20ac\u00a2", "\u2022"), // bullet
    ("\u00c3\u00a9", "\u00e9"), // latin accent U+00E9
    ("\u00c3\u00a8", "\u00e8"), // latin accent U+00E8
    ("\u00c3\u00aa", "\u00ea"), // latin accent U+00EA
    ("\u00c3\u00ab", "\u00eb"), // latin accent U+00EB
    ("\u00c3\u00a1", "\u00e1"), // latin accent U+00E1
    ("\u00c3\u00a0", "\u00e0"), // latin accent U+00E0
    ("\u00c3\u00a2", "\u00e2"), // latin accent U+00E2
    ("\u00c3\u00a4", "\u00e4"), // latin accent U+00E4
    ("\u00c3\u00a7", "\u00e7"), // latin accent U+00E7
    ("\u00c3\u00ad", "\u00ed"), // latin accent U+00ED
    ("\u00c3\u00ae", "\u00ee"), // latin accent U+00EE
    ("\u00c3\u00af", "\u00ef"), // latin accent U+00EF
    ("\u00c3\u00b3", "\u00f3"), // latin accent U+00F3
    ("\u00c3\u00b4", "\u00f4"), // latin accent U+00F4
    ("\u00c3\u00b6", "\u00f6"), // latin accent U+00F6
    ("\u00c3\u00ba", "\u00fa"), // latin accent U+00FA
    ("\u00c3\u00bb", "\u00fb"), // latin accent U+00FB
    ("\u00c3\u00bc", "\u00fc"), // latin accent U+00FC
    ("\u00c3\u00b1", "\u00f1"), // latin accent U+00F1
    ("\u00c3\u0178", "\u00df"), // latin accent U+00DF
    ("\u00c2\u00b0", "\u00b0"), // latin accent U+00B0
    ("\u00c2\u00ab", "\u00ab"), // latin accent U+00AB
    ("\u00c2\u00bb", "\u00bb"), // latin accent U+00BB
    ("\u00c2\u00a0", "\u00a0")) // nbsp (stray-A-circumflex pair)

  /** Repair a string column: the ordered replace chain over [[table]]. */
  def fixMojibake(c: Column): Column =
    table.foldLeft(c) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to))
    }

  /** Render a string as a pure-`chr(N)` SQL concat — survives any source-
    * encoding round trip between engine and oracle.
    */
  def sqlStringExpr(s: String): String =
    s.map(ch => s"chr(${ch.toInt})").mkString("(", " || ", ")")

  /** The same chain as portable SQL (DuckDB/ANSI) around `inner`. Generated
    * from [[table]]: one source of truth.
    */
  def sqlRepairExpr(inner: String): String =
    table.foldLeft(inner) { case (acc, (from, to)) =>
      s"replace($acc, ${sqlStringExpr(from)}, ${sqlStringExpr(to)})"
    }

  /** Driver-side inverse of [[fixMojibake]] for planting fixtures: renders a
    * clean string the way a UTF-8-as-cp1252 mis-decode would (one level).
    */
  def corrupt(clean: String): String = {
    val inverse = table.map(_.swap).toMap
    clean.flatMap(ch => inverse.getOrElse(ch.toString, ch.toString))
  }
}
