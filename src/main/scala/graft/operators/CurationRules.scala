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

  /** Word-blocklist gate (the C4 "bad words" document filter, Raffel et al.
    * 2020 §2.2: drop any page containing a word from a fixed list). Tokens
    * are lowercase `[a-z0-9]+` runs; a document is `blocked` when its total
    * blocklisted-token occurrences exceed `maxFlagged` (0 = the paper's
    * any-hit semantics). Emits the evidence alongside the verdict:
    * `(idCol, n_flagged, flagged_terms, blocked)` with `flagged_terms` the
    * sorted distinct matches comma-joined — so a curator can audit WHY a
    * doc was dropped without re-running.
    *
    * This is the narrow path: the list rides inside a codegen'd
    * `array_contains` filter — right for the typical few-thousand-word
    * list (per-row cost is tokens × list with no shuffle, no join, no
    * broadcast table to manage). For very large lists use
    * [[blocklistFlagsJoin]].
    */
  def blocklistFlags(df: DataFrame, textCol: String, idCol: String,
                     terms: Seq[String], maxFlagged: Long = 0L): DataFrame = {
    require(terms.nonEmpty, "blocklist must not be empty")
    val listLit =
      lit(terms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct.toArray)
    // coalesce against the null-text row so both paths (and a SQL LEFT JOIN
    // mirror) agree on (0, "", false) instead of propagating nulls.
    val toks = coalesce(
      regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)),
      lit(Array.empty[String]))
    val hits = filter(toks, tk => array_contains(listLit, tk))
    df.select(col(idCol),
      size(hits).cast("long").as("n_flagged"),
      array_join(array_sort(array_distinct(hits)), ",").as("flagged_terms"),
      (size(hits) > maxFlagged).as("blocked"))
  }

  /** Template-boilerplate detector: documents from the same source that
    * share their first `prefixLen` characters are near-certainly stamped
    * from one template (cookie banners, subscription headers, listing
    * pages). Complements [[Paragraphs]]' cross-doc paragraph dedup at the
    * document head where templates live: the prefix is a cheap fixed-width
    * key, no shingling.
    *
    * One shuffle: a count window over (source, prefix). Emits the evidence
    * (`prefix_count` = docs in this source sharing the prefix) plus the
    * `is_boilerplate` flag at `minShared`. Short docs (< prefixLen chars)
    * participate with their full text as the prefix — two identical tiny
    * docs ARE template suspects.
    */
  def sharedPrefixFlags(df: DataFrame, textCol: String, idCol: String,
                        sourceCol: String, prefixLen: Int = 40,
                        minShared: Int = 3): DataFrame = {
    require(prefixLen >= 1 && minShared >= 2,
      s"need prefixLen >= 1 and minShared >= 2, got ($prefixLen, $minShared)")
    val prefix = substring(col(textCol), 1, prefixLen)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol), prefix)
    df.select(col(idCol), col(sourceCol), prefix.as("prefix"),
        count(lit(1)).over(w).as("prefix_count"))
      .withColumn("is_boilerplate", col("prefix_count") >= minShared)
  }

  /** Scale path of [[blocklistFlags]] for blocklists too large to inline in
    * an expression (phrase lists, multi-language unions): explode tokens,
    * broadcast-hash-join the term table, aggregate back per document, then
    * restore zero-hit documents with a left join against the id spine. One
    * shuffle (the per-doc aggregate); the blocklist never shuffles.
    * Identical output contract to the narrow path — pinned by a spec that
    * runs both over the same frame.
    */
  def blocklistFlagsJoin(df: DataFrame, textCol: String, idCol: String,
                         termsDf: DataFrame, termCol: String = "term",
                         maxFlagged: Long = 0L): DataFrame = {
    val toks = df.select(col(idCol),
      explode(regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)))
        .as("__tok"))
    val hits = toks.join(
      broadcast(termsDf.select(lower(col(termCol)).as("__term")).distinct()),
      col("__tok") === col("__term"))
    val agg = hits.groupBy(col(idCol)).agg(
      count(lit(1)).as("__n"),
      array_join(array_sort(collect_set(col("__tok"))), ",").as("__terms"))
    df.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).as("n_flagged"),
        coalesce(col("__terms"), lit("")).as("flagged_terms"),
        (coalesce(col("__n"), lit(0L)) > maxFlagged).as("blocked"))
  }

  /** k-anonymity audit over a quasi-identifier combination — the release
    * check that complements token-level PII redaction: a record is
    * re-identifiable when its (quasi-identifier) group is smaller than k,
    * even with direct identifiers stripped. Emits one row per occupied
    * combination: the quasi columns, `n_rows`, and `k_anonymous`
    * (n_rows >= k). Publish-ready = every combination k-anonymous;
    * violating groups are the ones to suppress or generalize.
    *
    * One partial-aggregating shuffle to |combinations| rows — at 100 TB
    * the output is bounded by the quasi-identifier domain, not the corpus.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, "k must be >= 1")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .select(quasiCols.map(col) :+ col("n_rows") :+
        (col("n_rows") >= k).as("k_anonymous"): _*)
  }

  /** l-diversity audit — the refinement k-anonymity misses: a group can be
    * large (k-anonymous) yet carry a SINGLE sensitive value, so membership
    * alone discloses it (the homogeneity attack). A group is l-diverse
    * when its sensitive column takes at least `l` distinct values. Emits
    * one row per occupied quasi-identifier combination: the quasi columns,
    * `n_rows`, `n_sensitive` (distinct sensitive values), and `l_diverse`.
    * Publish-ready = every combination both k-anonymous AND l-diverse.
    *
    * One partial-aggregating shuffle; `count(DISTINCT)` expands to a
    * two-level aggregate whose intermediate is bounded by
    * |combinations| x |sensitive domain|, never the corpus — exact (the
    * oracle-checkable regime), matching [[kAnonymity]]'s posture.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
                 l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(!quasiCols.contains(sensitiveCol),
      "sensitive column cannot also be a quasi-identifier")
    require(l >= 1, "l must be >= 1")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .select(quasiCols.map(col) :+ col("n_rows") :+ col("n_sensitive") :+
        (col("n_sensitive") >= l).as("l_diverse"): _*)
  }

  /** robots.txt evaluation — the crawl-governance gate every fetch MUST
    * clear: for each URL, the longest-prefix-matching rule of its host's
    * ruleset decides (the modern robots semantics: longest match wins;
    * on an exact length tie, allow beats disallow — Google's published
    * tie-break). URLs on hosts with NO matching rule are allowed (absent
    * robots means crawlable). One row per input row:
    * `(host, path, matched_rule, allowed)` — `matched_rule` null for the
    * no-rule default.
    *
    * Scale shape: one host-keyed join (rulesets are tiny per host and
    * broadcast when they fit), a prefix filter, one longest-match window
    * per (host, path, row id). No regex — rule matching is
    * `startswith`, codegen'd.
    */
  def robotsCheck(urls: DataFrame, hostCol: String, pathCol: String,
                  idCol: String, rules: DataFrame, ruleHostCol: String,
                  rulePathCol: String, allowCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = urls.select(col(idCol).as("__id"), col(hostCol).as("host"),
      col(pathCol).as("path"))
    val r = rules.select(col(ruleHostCol).as("host"),
      col(rulePathCol).as("__rule"), col(allowCol).cast("boolean").as("__allow"))
    val matched = u.join(r, Seq("host"))
      .filter(col("path").startsWith(col("__rule")))
    val w = Window.partitionBy(col("__id"))
      .orderBy(length(col("__rule")).desc, col("__allow").desc,
        col("__rule"))
    val best = matched.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__id"), col("__rule").as("matched_rule"),
        col("__allow").as("allowed"))
    u.join(best, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("host"), col("path"),
        col("matched_rule"),
        coalesce(col("allowed"), lit(true)).as("allowed"))
  }

  /** t-closeness audit — the third rung of the release ladder after
    * [[kAnonymity]] and [[lDiversity]]: a group can be k-anonymous AND
    * l-diverse yet still leak (skewness attack — 3 distinct diseases, but
    * 98% of the group has one of them). A group is t-close when the
    * distribution of the categorical sensitive attribute WITHIN the group
    * is within total-variation distance `t` of its corpus-wide
    * distribution. Emits one row per occupied quasi-identifier
    * combination: the quasi columns, `n_rows`, `tvd`, `t_close`.
    *
    * Exact arithmetic: with integer counts (`n_gv` group x value, `n_g`
    * group, `nv` global value, `N` corpus),
    * `TVD = (sum_v_in_group |n_gv*N - nv*n_g| + (N - sum_v_in_group nv) * n_g)
    *        / (2*N*n_g)`
    * — the second numerator term folds in every sensitive value ABSENT
    * from the group (|0 - nv/N| each). Numerator and denominator are exact
    * BIGINTs, so the single double division is bit-identical across
    * engines; `t_close` compares the ROUNDED tvd so the flag matches what
    * the output shows.
    *
    * Scale shape: one map-side-combined shuffle to the
    * |combinations| x |sensitive domain| cell table; the global sensitive
    * distribution is a sensitive-domain-sized aggregate joined in
    * broadcast. Nothing corpus-sized moves after the first aggregate.
    */
  def tCloseness(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
                 t: Double, roundDp: Int = 6): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(!quasiCols.contains(sensitiveCol),
      "sensitive column cannot also be a quasi-identifier")
    require(t >= 0.0 && t <= 1.0, "t must be in [0, 1]")
    val quasi = quasiCols.map(col)
    // Null sensitive values must survive the global-distribution JOIN
    // below (equi-joins drop null keys even though groupBy keeps them), or
    // groups containing nulls get undercounted n_rows/__sum_nv_in while
    // __n_total still includes those rows — a silently wrong TVD. Fold
    // nulls into a sentinel level up front (the Profile.mutualInformation
    // pitfall); the sentinel only feeds the distance arithmetic and is
    // never emitted.
    val sens = coalesce(col(sensitiveCol).cast("string"), lit("\u0000<null>"))
    val cells = df.groupBy(quasi :+ sens.as("__v"): _*)
      .agg(count(lit(1)).as("__n_gv"))
    val global = df.groupBy(sens.as("__v"))
      .agg(count(lit(1)).as("__nv"))
    val total = df.agg(count(lit(1)).as("__n_total"))
    val tvd = (col("__sum_abs") +
      (col("__n_total") - col("__sum_nv_in")) * col("n_rows")).cast("double") /
      (lit(2L) * col("__n_total") * col("n_rows"))
    cells.join(broadcast(global), "__v")
      .crossJoin(broadcast(total))
      .withColumn("__n_g", sum(col("__n_gv"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(quasi: _*)))
      .groupBy(quasi :+ col("__n_total"): _*)
      .agg(max(col("__n_g")).as("n_rows"),
        sum(abs(col("__n_gv") * col("__n_total") - col("__nv") * col("__n_g")))
          .as("__sum_abs"),
        sum(col("__nv")).as("__sum_nv_in"))
      .withColumn("tvd", round(tvd, roundDp))
      .select(quasi :+ col("n_rows") :+ col("tvd") :+
        (col("tvd") <= t).as("t_close"): _*)
  }

  /** The Stack / StarCoder-style source-file quality filters (Kocetkov et
    * al. 2022 "The Stack", Li et al. 2023 "StarCoder" §preprocessing):
    * line-geometry bounds (max / mean line length), ASCII-alphanumeric
    * character fraction, auto-generated-file banners, and embedded
    * encoded-data blobs (a base64-alphabet run of `dataRunLen`+ chars).
    * Pure codegen'd Column expressions — linear per document, no shuffle,
    * no UDF — so the filter runs at scan speed over a 100 TB code corpus.
    * Every metric is emitted beside the combined `keep` flag so thresholds
    * can be re-gated per language without recomputing.
    */
  def stackCodeFlags(df: DataFrame, textCol: String, idCol: String,
                     maxLineLen: Int = 1000, maxMeanLineLen: Double = 100.0,
                     minAlnumFrac: Double = 0.25, longLineLen: Int = 120,
                     dataRunLen: Int = 64): DataFrame = {
    val t = col(textCol)
    val lines = split(t, "\n", -1)
    val lens = transform(lines, l => length(l))
    val nLines = size(lines).cast("long") // split never yields 0 elements
    val maxLen = array_max(lens).cast("long")
    val total = aggregate(lens, lit(0L), (a, v) => a + v)
    val meanLen = total.cast("double") / nLines.cast("double")
    val alnum = length(regexp_replace(t, "[^A-Za-z0-9]", "")).cast("double")
    val alnumFrac = alnum / length(t).cast("double") // caller filters len > 0
    val longLines = size(filter(lines, l => length(l) > longLineLen)).cast("long")
    val autogen =
      t.rlike("(?i)(auto[- ]generated|automatically generated|do not edit)")
    val dataBlob = t.rlike(s"[A-Za-z0-9+/=]{$dataRunLen,}")
    val keep = maxLen <= maxLineLen && meanLen <= maxMeanLineLen &&
      alnumFrac >= minAlnumFrac && !autogen
    df.select(col(idCol),
      nLines.as("n_lines"),
      maxLen.as("max_line_len"),
      round(meanLen, 6).as("mean_line_len"),
      round(alnumFrac, 6).as("alnum_frac"),
      longLines.as("n_long_lines"),
      autogen.as("has_autogen"),
      dataBlob.as("has_data_blob"),
      keep.as("keep"))
  }
}
