package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID, quality
  * scoring, token counting, document fingerprinting.
  *
  * Everything here is composed from codegen'd built-in expressions (no UDFs)
  * so the hot path stays inside whole-stage codegen AND the exact same
  * arithmetic is expressible in the DuckDB oracle for the correctness gate.
  * All operators are embarrassingly parallel per-row transforms: no shuffle,
  * no state, safe at any scale.
  */
object TextAnalysis {

  /** Space tokenizer shared by all operators (corpus text is space-joined;
    * a literal-space split keeps Spark and the SQL oracle bit-identical).
    *
    * r17: the empty-token strip is `array_remove(_, "")` rather than the
    * equivalent `filter(_, length(t) > 0)` — ArrayRemove is a codegen'd
    * expression while the `filter` higher-order function is a
    * CodegenFallback that evaluates its WHOLE subtree (split + lower
    * included) interpreted per row, in every one of the ~45 text gates'
    * hot paths. `split` never yields null elements, so removing `""` is
    * exactly the length>0 filter; token values are unchanged.
    */
  def toks(c: Column): Column = array_remove(split(lower(c), " "), "")

  // -------------------------------------------------------------------------
  // Language identification (marker-word heuristic)
  // -------------------------------------------------------------------------

  /** Marker words per language. Deliberately tiny and deterministic: the
    * point is the operator shape (per-row scoring + argmax), not linguistic
    * accuracy. Alphabetical language order defines tie-breaking.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "en" -> Seq("the", "of", "and", "to", "in", "is", "was", "that", "for", "a"),
    "es" -> Seq("el", "los", "que", "y", "un", "es", "por", "con", "una", "para"),
    "fr" -> Seq("le", "les", "des", "et", "est", "une", "dans", "pour", "qui", "sur"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有",
      "和", "就", "不", "人"))

  /** Hits of `markers` among the tokens of `c` (repeats counted). */
  def markerHits(c: Column, markers: Seq[String]): Column =
    size(filter(toks(c), t => t.isin(markers.map(lit): _*)))

  /** Predicted language: argmax of marker hits, ties to the alphabetically
    * first language, zero hits everywhere -> "unknown".
    */
  def langId(c: Column): Column = {
    val scores = LangMarkers.map { case (lang, ms) => lang -> markerHits(c, ms) }
    val maxScore = greatest(scores.map(_._2): _*)
    val pick = scores.foldRight(lit("unknown")) { case ((lang, s), acc) =>
      when(s === maxScore && maxScore > 0, lit(lang)).otherwise(acc)
    }
    // foldRight + overwrite-on-match means the FIRST (alphabetical) max wins:
    // each earlier lang's `when` shadows later ones.
    pick
  }

  /** Per-document language-ID frame: doc id, predicted language, per-lang
    * hit counts.
    */
  def langIdFrame(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val base = df.select(col(idCol), col(textCol).as("__t"))
    val withScores = LangMarkers.foldLeft(base) { case (d, (lang, ms)) =>
      d.withColumn(s"hits_$lang", markerHits(col("__t"), ms))
    }
    withScores
      .withColumn("predicted_lang", langId(col("__t")))
      .drop("__t")
  }

  // -------------------------------------------------------------------------
  // Quality scoring
  // -------------------------------------------------------------------------

  /** English stopwords used for the stopword-ratio quality signal. */
  val QualityStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  /** The combined quality score in [0,1] as a standalone expression, for
    * operators that rank or filter on quality without the full signal frame
    * (corpus packing, domain caps).
    */
  def qualityScore(t: Column): Column = {
    val tk = toks(t)
    val nChars = length(t).cast("double")
    val nToks = size(tk).cast("double")
    val tokChars = aggregate(transform(tk, x => length(x)), lit(0),
      (acc, v) => acc + v).cast("double")
    val meanTokLen = when(nToks > 0, tokChars / nToks).otherwise(lit(0.0))
    val punct = size(split(t, "[^A-Za-z0-9\\s]", -1)).cast("double") - 1.0
    val punctRatio = when(nChars > 0, punct / nChars).otherwise(lit(0.0))
    val stopHits = size(filter(tk, x => x.isin(QualityStopwords.map(lit): _*))).cast("double")
    val stopRatio = when(nToks > 0, stopHits / nToks).otherwise(lit(0.0))
    val lengthSignal = least(nChars / 500.0, lit(1.0))
    val tokLenSignal = when(meanTokLen >= 3.0 && meanTokLen <= 12.0, lit(1.0))
      .otherwise(lit(0.0))
    round(
      lengthSignal * 0.4 + tokLenSignal * 0.3 +
        (lit(1.0) - least(punctRatio * 5.0, lit(1.0))) * 0.2 +
        least(stopRatio * 5.0, lit(1.0)) * 0.1, 6)
  }

  /** Heuristic quality signals + a combined score in [0,1]:
    *  - length signal: saturating n_chars / 500
    *  - token-length signal: mean token length in a sane [3,12] band
    *  - punctuation ratio penalty
    *  - stopword ratio (natural text has some function words)
    * The formula is arbitrary but fixed; the operator contract is
    * "deterministic per-row quality in [0,1]".
    */
  def qualityFrame(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    val tk = toks(t)
    val nChars = length(t).cast("double")
    val nToks = size(tk).cast("double")
    val tokChars = aggregate(transform(tk, x => length(x)), lit(0),
      (acc, v) => acc + v).cast("double")
    val meanTokLen = when(nToks > 0, tokChars / nToks).otherwise(lit(0.0))
    val punct = size(split(t, "[^A-Za-z0-9\\s]", -1)).cast("double") - 1.0
    val punctRatio = when(nChars > 0, punct / nChars).otherwise(lit(0.0))
    val stopHits = size(filter(tk, x => x.isin(QualityStopwords.map(lit): _*))).cast("double")
    val stopRatio = when(nToks > 0, stopHits / nToks).otherwise(lit(0.0))
    df.select(
      col(idCol),
      nChars.cast("long").as("n_chars"),
      nToks.cast("long").as("n_tokens"),
      round(meanTokLen, 6).as("mean_token_len"),
      round(punctRatio, 6).as("punct_ratio"),
      round(stopRatio, 6).as("stopword_ratio"),
      qualityScore(t).as("quality"))
  }

  // -------------------------------------------------------------------------
  // PII redaction (training-data scrubbing)
  // -------------------------------------------------------------------------

  /** Redaction patterns, applied in order (IPv4 before phone so dotted quads
    * are not swallowed by the looser phone pattern; SSN before phone for the
    * same reason). Each regex is valid under BOTH Java regex (Spark) and RE2
    * (DuckDB oracle) with identical leftmost-longest behavior — no
    * backreferences, no lookaround.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "[IP]"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "[SSN]"),
    ("phone", "\\+[0-9][0-9()\\s.-]{7,}[0-9]", "[PHONE]"))

  /** Scrub emails / IPv4s / SSN-shaped ids / international phone numbers.
    * Pure codegen'd regexp_replace chain — per-row, no shuffle, no UDF.
    */
  def redactPii(c: Column): Column =
    PiiPatterns.foldLeft(c) { case (acc, (_, re, tag)) =>
      regexp_replace(acc, re, tag)
    }

  /** Per-document redaction frame: redacted text + per-category match
    * counts (counted BEFORE redaction, on the progressively-scrubbed text so
    * categories don't double-count each other's spans).
    */
  def piiFrame(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val counted = PiiPatterns.foldLeft(
      df.select(col(idCol), col(textCol).as("__t"))) {
        case (d, (name, re, tag)) =>
          d.withColumn(s"n_$name",
              size(regexp_extract_all(col("__t"), lit(re), lit(0))).cast("long"))
            .withColumn("__t", regexp_replace(col("__t"), re, tag))
      }
    counted.withColumnRenamed("__t", "redacted")
      .select(col(idCol) +: PiiPatterns.map(p => col(s"n_${p._1}")) :+ col("redacted"): _*)
  }

  // -------------------------------------------------------------------------
  // Repetition signals (Gopher-style quality rules)
  // -------------------------------------------------------------------------

  /** Gopher-style repetition measures (Rae et al. 2021 §A1.1): documents
    * dominated by repeated lines or repeated tokens are boilerplate/spam.
    *  - `dup_line_fraction`: 1 - distinct/total over trimmed non-empty lines
    *  - `dup_line_char_fraction`: chars in the EXTRA copies of repeated
    *    lines / total line chars (total - distinct-sum keeps one copy free)
    *  - `dup_token_fraction`: 1 - distinct/total over tokens
    * All pure array expressions — per-row, codegen'd, oracle-expressible.
    */
  def repetitionFrame(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val lines = filter(transform(split(col(textCol), "\n"), l => trim(l)), l => length(l) > 0)
    val dLines = array_distinct(lines)
    val nLines = size(lines).cast("double")
    val charsOf = (a: Column) =>
      aggregate(transform(a, l => length(l)), lit(0), (acc, v) => acc + v).cast("double")
    val totalChars = charsOf(lines)
    val tk = toks(col(textCol))
    val nToks = size(tk).cast("double")
    df.select(
      col(idCol),
      size(lines).cast("long").as("n_lines"),
      round(when(nLines > 0, lit(1.0) - size(dLines).cast("double") / nLines)
        .otherwise(lit(0.0)), 6).as("dup_line_fraction"),
      round(when(totalChars > 0, (totalChars - charsOf(dLines)) / totalChars)
        .otherwise(lit(0.0)), 6).as("dup_line_char_fraction"),
      round(when(nToks > 0, lit(1.0) - size(array_distinct(tk)).cast("double") / nToks)
        .otherwise(lit(0.0)), 6).as("dup_token_fraction"))
  }

  // -------------------------------------------------------------------------
  // Token counting
  // -------------------------------------------------------------------------

  /** BPE-ish regex token estimate (words greedily cut into <=4-char pieces,
    * digit runs, single punctuation marks — the classic "~4 chars per token"
    * approximation as a deterministic regex), exposed standalone for
    * budget-based operators.
    */
  def bpeTokens(t: Column): Column =
    size(regexp_extract_all(t, lit("[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
      .cast("long")

  /** Whitespace tokens + the BPE-ish estimate per document. */
  def tokenCountFrame(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      size(filter(split(t, " "), x => length(x) > 0)).cast("long").as("ws_tokens"),
      bpeTokens(t).as("bpe_tokens"))
  }

  /** Flesch readability per document — the grade-level curation signal a
    * corpus card reports next to [[qualityScore]]: reading ease
    * `206.835 − 1.015·(words/sentences) − 84.6·(syllables/word)` and the
    * Flesch–Kincaid grade `0.39·(words/sentences) +
    * 11.8·(syllables/word) − 15.59`. Counting contract (deterministic and
    * SQL-replayable, like every signal here): words via the [[toks]]
    * tokenizer, sentences as runs of `[.!?]` (floored at 1), syllables as
    * vowel-group runs `[aeiouy]+` over the lowercased text — the standard
    * cheap approximation. Zero-word documents are dropped (no defined
    * score). Pure codegen'd expressions: one narrow pass, no UDF.
    */
  def readabilityFrame(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
        size(toks(t)).cast("long").as("n_words"),
        greatest(regexp_count(t, lit("[.!?]+")), lit(1)).cast("long")
          .as("n_sents"),
        regexp_count(lower(t), lit("[aeiouy]+")).cast("long").as("n_syll"))
      .filter(col("n_words") > 0)
      .select(col(idCol), col("n_words"), col("n_sents"), col("n_syll"),
        round(lit(206.835) -
          lit(1.015) * (col("n_words").cast("double") / col("n_sents")) -
          lit(84.6) * (col("n_syll").cast("double") / col("n_words")), 6)
          .as("reading_ease"),
        round(lit(0.39) * (col("n_words").cast("double") / col("n_sents")) +
          lit(11.8) * (col("n_syll").cast("double") / col("n_words")) -
          lit(15.59), 6).as("fk_grade"))
  }

  /** Word n-grams under the [[toks]] contract: all `size−n+1` contiguous
    * n-token windows joined with single spaces; empty array when the
    * document has fewer than n tokens.
    */
  def wordNgrams(t: Column, n: Int): Column = {
    require(n >= 1, "n-gram order must be >= 1")
    val tk = toks(t)
    when(size(tk) >= n,
        transform(sequence(lit(0), size(tk) - n),
          i => array_join(slice(tk, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Tokenizer fertility report per group (language/source): how many
    * subword tokens the tokenizer spends per word, and how many characters
    * one token buys — THE capacity metrics a multilingual training pipeline
    * watches, because a high-fertility language burns sequence budget
    * ([[graft.operators.CorpusMix.packToBudget]]) faster than its byte
    * share suggests.
    *
    * `tokens` is the per-document token count as a Column so the caller
    * picks the tokenizer — [[graft.functions.Bpe.count]] for the exact
    * pinned-merge-table BPE, [[bpeTokens]] for the zero-setup regex
    * estimate. One groupBy over per-row arithmetic (map-side partial
    * aggregate, group-cardinality shuffle only); ratios are computed from
    * the group SUMS (corpus-level fertility, not a mean of per-doc ratios)
    * and 6-dp rounded for oracle parity. Zero-word / zero-token groups
    * read 0.0 rather than NULL so empty-corpus audits stay arithmetic.
    */
  def fertilityFrame(df: DataFrame, groupCol: String, textCol: String,
                     tokens: Column): DataFrame = {
    val per = df.select(col(groupCol),
      length(col(textCol)).cast("long").as("__chars"),
      size(toks(col(textCol))).cast("long").as("__words"),
      tokens.cast("long").as("__tokens"))
    def ratio(num: Column, den: Column): Column =
      round(when(den === 0, lit(0.0))
        .otherwise(num.cast("double") / den), 6) + lit(0.0)
    per.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(col("__words")).as("n_words"),
      sum(col("__tokens")).as("n_tokens"),
      ratio(sum(col("__tokens")), sum(col("__words"))).as("fertility"),
      ratio(sum(col("__chars")), sum(col("__tokens"))).as("chars_per_token"))
  }

  // -------------------------------------------------------------------------
  // Document fingerprinting (rolling hash)
  // -------------------------------------------------------------------------

  private val rollingHashUdf = udf((s: String) => {
    if (s == null) null
    else {
      var acc = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        acc = (acc * 31 + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      java.lang.Long.valueOf(acc)
    }
  })

  /** Polynomial rolling hash over the code points of `c`, mod 1e9+7 —
    * left-fold `(acc * 31 + code(ch)) % p`, value-identical to the oracle's
    * list_reduce/ascii formulation. Single-pass UDF: the equivalent
    * transform(sequence, substr(i,1)) expression is O(n^2) per document
    * (substr re-scans the string for every index).
    */
  def rollingHash(c: Column): Column = rollingHashUdf(c)

  def fingerprintFrame(df: DataFrame, textCol: String, idCol: String): DataFrame =
    Partitioning.ensureParallelism(df)
      .select(col(idCol), rollingHash(col(textCol)).as("rolling_hash"))

  /** Character-level Shannon entropy (bits/char), rounded to 6dp — the
    * cheap gibberish/boilerplate signal real curation stacks pair with the
    * ratio rules: natural prose sits ~3.5-4.5 bits, `aaaa...` runs and
    * base64 blobs fall far outside. Pure HOF expression, no UDF: the
    * distinct-character list is SORTED before the fold so the floating-sum
    * order is deterministic and oracle-replayable; O(len * alphabet) per
    * row with alphabet <= ~100 on text. Empty text -> 0.0.
    */
  def charEntropy(c: Column): Column = {
    val chars = split(c, "")
    val n = size(chars).cast("double")
    val terms = transform(array_sort(array_distinct(chars)), d => {
      val p = size(filter(chars, ch => ch === d)).cast("double") / n
      p * log(p) / log(lit(2.0))
    })
    when(length(c) === 0, lit(0.0))
      .otherwise(round(-aggregate(terms, lit(0.0), (a, b) => a + b), 6))
  }

  def entropyFrame(df: DataFrame, textCol: String, idCol: String): DataFrame =
    Partitioning.ensureParallelism(df)
      .select(col(idCol), charEntropy(col(textCol)).as("char_entropy"))

  /** Lexical-diversity signals per document: token count, distinct tokens,
    * hapax legomena (tokens occurring exactly once), type-token ratio and
    * hapax ratio — the Gopher-style unique-word-fraction family (templated
    * boilerplate repeats its vocabulary; natural prose doesn't). Pure HOF
    * expressions over the shared tokenizer contract, O(len * distinct) per
    * row, no shuffle.
    */
  def lexicalDiversityFrame(df: DataFrame, textCol: String,
                            idCol: String): DataFrame = {
    val tk = toks(col(textCol))
    val n = size(tk)
    val dis = array_distinct(tk)
    val hapax = size(filter(dis, d => size(filter(tk, t => t === d)) === 1))
    Partitioning.ensureParallelism(df).select(col(idCol),
      n.cast("long").as("n_tokens"),
      size(dis).cast("long").as("n_distinct"),
      hapax.cast("long").as("n_hapax"),
      when(n === 0, lit(0.0))
        .otherwise(round(size(dis).cast("double") / n.cast("double"), 6)).as("ttr"),
      when(n === 0, lit(0.0))
        .otherwise(round(hapax.cast("double") / n.cast("double"), 6)).as("hapax_ratio"))
  }

  /** Tokenizer-vocabulary coverage: per document, how many tokens fall
    * outside the corpus's top-`vocabSize` vocabulary (count desc, token asc
    * tie-break — deterministic). High OOV rate flags transcoded/garbled/
    * wrong-language docs before they waste tokenizer <unk> budget; the same
    * frame sizes a vocab for a new domain.
    *
    * Shape: one token-count aggregate, a top-V row_number (the COUNTS
    * table, tiny next to the corpus), then a broadcast left join back over
    * the exploded tokens and a per-doc aggregate — two shuffles total, both
    * on narrow projections. `explode_outer` keeps empty docs at
    * (0, 0, 0.0). At true web scale the exact global top-V over an
    * unbounded vocab should come from [[Sketches]]' heavy hitters instead;
    * the contract here is the exact one the oracle can replay.
    */
  def oovRateFrame(df: DataFrame, textCol: String, idCol: String,
                   vocabSize: Int = 25): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val tk = df.select(col(idCol), explode_outer(toks(col(textCol))).as("__tok"))
    val counts = tk.filter(col("__tok").isNotNull)
      .groupBy(col("__tok")).agg(count(lit(1)).as("__cf"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__cf").desc, col("__tok"))
    val vocab = counts.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= vocabSize).select(col("__tok").as("__v"))
    val joined = tk.join(broadcast(vocab), col("__tok") === col("__v"), "left")
    val n = count(col("__tok"))
    val oov = sum(when(col("__tok").isNotNull && col("__v").isNull, 1)
      .otherwise(0))
    joined.groupBy(col(idCol)).agg(
      n.cast("long").as("n_tokens"),
      oov.cast("long").as("n_oov"),
      when(n > 0, round(oov.cast("double") / n.cast("double"), 6))
        .otherwise(lit(0.0)).as("oov_rate"))
  }

  /** Unicode-script profile — the writing-system complement of the
    * token-marker [[langIdFrame]]: per-document character counts for the
    * four highest-volume scripts plus the non-Latin letter fraction. The
    * multilingual-corpus routing signal (CJK/Arabic/Cyrillic content needs
    * different tokenizers and quality models than Latin) computed as pure
    * codegen'd regexp counts, no UDF. Script classes (`\p{IsLatin}` in
    * Java = `\p{Latin}` in RE2) are Unicode SCRIPTS, not blocks — both
    * engines bind them identically, which the gate verifies end-to-end.
    */
  def scriptProfileFrame(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    def cnt(script: String): Column =
      length(regexp_replace(col(textCol), s"[^\\p{Is$script}]", "")).cast("long")
    val latin = cnt("Latin"); val cyr = cnt("Cyrillic")
    val han = cnt("Han"); val arab = cnt("Arabic")
    val nonLatin = cyr + han + arab
    val letters = latin + nonLatin
    Partitioning.ensureParallelism(df).select(col(idCol),
      latin.as("n_latin"), cyr.as("n_cyrillic"), han.as("n_han"),
      arab.as("n_arabic"),
      when(letters > 0,
        round(nonLatin.cast("double") / letters.cast("double"), 6))
        .otherwise(lit(0.0)).as("non_latin_frac"))
  }

  /** KWIC (keyword-in-context) concordance: one row per OCCURRENCE of
    * `term` with the surrounding `context`-token window — the snippet a
    * search result page shows, and the qualitative-review view a
    * curation analyst reads before trusting any aggregate ("show me
    * 'crypto' in context, not its count"). Output:
    * `(id, pos, snippet, n_window)` — `pos` 1-based in tokens, snippet
    * the up-to-`2*context+1`-token window joined by spaces, clipped at
    * document edges.
    *
    * Pure codegen'd HOFs: posexplode + an array slice per hit — the
    * fan-out is the occurrence count, never positions x positions.
    */
  def kwic(df: DataFrame, textCol: String, idCol: String, term: String,
           context: Int = 3): DataFrame = {
    require(term.nonEmpty && context >= 0, "need a term, context >= 0")
    val withToks = df.select(col(idCol), toks(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"),
        posexplode(col("__toks")).as(Seq("__p0", "__tok")))
      .filter(col("__tok") === term)
      .withColumn("__p1", col("__p0") + 1)
    val start = greatest(col("__p1") - context, lit(1))
    val end = least(size(col("__toks")), col("__p1") + context)
    withToks.select(col(idCol), col("__p1").cast("long").as("pos"),
      array_join(slice(col("__toks"), start, end - start + 1), " ")
        .as("snippet"),
      (end - start + 1).cast("long").as("n_window"))
  }
}
