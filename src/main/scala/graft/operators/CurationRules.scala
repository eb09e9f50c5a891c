package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The two canonical public curation rule sets, as pure codegen'd
  * expressions (no UDF, no shuffle — linear at any corpus size):
  *
  *  - Gopher document-level quality rules (Rae et al. 2021, §A1.1): word
  *    count bounds, mean word length band, symbol-to-word ratio, bullet /
  *    ellipsis line fractions, alphabetic-word fraction, stopword
  *    presence. Emitted as per-rule metrics plus the combined pass flag,
  *    so a pipeline can tune thresholds per corpus instead of inheriting
  *    the paper's.
  *  - C4 line-level cleaning (Raffel et al. 2020, §2.2): keep lines with
  *    >= `minLineWords` words ending in terminal punctuation, drop lines
  *    mentioning javascript, drop whole documents containing '{' or
  *    "lorem ipsum" or with fewer than `minKeptLines` surviving lines.
  *
  * Reference scope: the reference has no corpus-quality gating; these are
  * training-data-pipeline extensions (same family as [[TextAnalysis]]).
  * Both are deterministic and fully oracle-mirrorable (list/string
  * functions only).
  */
object CurationRules {

  /** Count occurrences of literal `what` via the replace-length trick —
    * identical semantics in any engine.
    */
  private def countOccurrences(c: Column, what: String): Column =
    ((length(c) - length(replace(c, lit(what), lit("")))) / lit(what.length))
      .cast("long")

  /** Gopher §A1.1 per-document metrics + pass flag. Thresholds are the
    * paper's defaults; every metric is also emitted so callers can re-gate.
    */
  def gopherFlags(df: DataFrame, textCol: String, idCol: String,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1,
                  maxBulletFrac: Double = 0.9,
                  maxEllipsisFrac: Double = 0.3,
                  minAlphaFrac: Double = 0.8,
                  minStopHits: Int = 2): DataFrame = {
    val t = col(textCol)
    val tk = TextAnalysis.toks(t)
    val nToks = size(tk).cast("double")
    val tokChars = aggregate(transform(tk, x => length(x)), lit(0),
      (acc, v) => acc + v).cast("double")
    val meanWordLen = when(nToks > 0, tokChars / nToks).otherwise(lit(0.0))
    val symbols = countOccurrences(t, "#") + countOccurrences(t, "...")
    val symbolRatio = when(nToks > 0, symbols.cast("double") / nToks).otherwise(lit(0.0))
    // Non-blank lines only — blank separators should not dilute fractions.
    val lines = filter(split(t, "\n", -1), l => length(trim(l)) > 0)
    val nLines = size(lines).cast("double")
    val bullets = size(filter(lines, l =>
      ltrim(l).startsWith("- ") || ltrim(l).startsWith("* ") ||
        ltrim(l).startsWith("•"))).cast("double")
    val ellipses = size(filter(lines, l =>
      rtrim(l).endsWith("...") || rtrim(l).endsWith("…"))).cast("double")
    val bulletFrac = when(nLines > 0, bullets / nLines).otherwise(lit(0.0))
    val ellipsisFrac = when(nLines > 0, ellipses / nLines).otherwise(lit(0.0))
    val alphaWords = size(filter(tk, x => x.rlike("[a-z]"))).cast("double")
    val alphaFrac = when(nToks > 0, alphaWords / nToks).otherwise(lit(0.0))
    val stopHits = size(filter(tk,
      x => x.isin(TextAnalysis.QualityStopwords.map(lit): _*))).cast("long")
    val passes =
      nToks >= minWords && nToks <= maxWords &&
        meanWordLen >= minMeanWordLen && meanWordLen <= maxMeanWordLen &&
        symbolRatio <= maxSymbolRatio &&
        bulletFrac <= maxBulletFrac && ellipsisFrac <= maxEllipsisFrac &&
        alphaFrac >= minAlphaFrac && stopHits >= minStopHits
    df.select(col(idCol),
      nToks.cast("long").as("word_count"),
      round(meanWordLen, 6).as("mean_word_len"),
      round(symbolRatio, 6).as("symbol_ratio"),
      round(bulletFrac, 6).as("bullet_frac"),
      round(ellipsisFrac, 6).as("ellipsis_frac"),
      round(alphaFrac, 6).as("alpha_frac"),
      stopHits.as("stop_hits"),
      passes.as("passes"))
  }

  /** C4 §2.2 cleaning: `(id, clean_text, n_lines_kept, doc_dropped)`.
    * `clean_text` is the newline-join of surviving lines (empty string
    * when none survive or the document is dropped wholesale).
    */
  def c4Clean(df: DataFrame, textCol: String, idCol: String,
              minLineWords: Int = 5, minKeptLines: Int = 1): DataFrame = {
    val t = col(textCol)
    val lines = split(t, "\n", -1)
    val kept = filter(lines, l => {
      val words = size(filter(split(l, " ", -1), w => length(w) > 0))
      val r = rtrim(l)
      val punct = r.endsWith(".") || r.endsWith("!") || r.endsWith("?") ||
        r.endsWith("\"")
      words >= minLineWords && punct && !contains(lower(l), lit("javascript"))
    })
    val docFlagged = contains(lower(t), lit("lorem ipsum")) || contains(t, lit("{"))
    val dropped = docFlagged || size(kept) < minKeptLines || t.isNull
    df.select(col(idCol),
      when(dropped, lit("")).otherwise(array_join(kept, "\n")).as("clean_text"),
      when(dropped, lit(0L)).otherwise(size(kept).cast("long")).as("n_lines_kept"),
      dropped.as("doc_dropped"))
  }
}
