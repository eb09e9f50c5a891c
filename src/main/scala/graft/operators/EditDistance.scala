package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance near-duplicate detection: prefix-blocked candidate pairs
  * verified by exact Levenshtein distance on a capped text window.
  *
  * The character-level complement to the token-set family
  * ([[Dedup.minhashLshPairs]] sees shingle overlap, [[Dedup.simhashPairs]]
  * sees term-frequency direction): Levenshtein catches small in-place EDITS
  * — typo fixes, template slot substitutions, date/byline swaps — that keep
  * the token sets nearly identical but also certifies HOW different two
  * texts are, which the probabilistic signatures only bound. Real curation
  * pipelines use exactly this as the final verifier behind a cheap blocker.
  *
  * Blocking is a shared normalized prefix (`prefixLen` chars of the
  * lowercased text): boilerplate-headed near-dups — the dominant template
  * family in web corpora — share their head by construction, and the block
  * key is computable in the scan (no signature pass). Distance runs on the
  * first `cap` chars only, bounding the O(len^2) DP per pair; a pair is
  * kept when `round(dist / max(len_a, len_b), 6) <= maxRatio` (0 when both
  * capped texts are empty).
  *
  * Physical shape: ONE shuffle on the prefix (the self-join reuses the same
  * exchange for both sides), `levenshtein` is a codegen'd built-in, and the
  * mega-block guard is a LAZY `raise_error` on the per-block row count —
  * evaluated per input row before the join multiplies anything, so a
  * pathological block (a giant exact-dup cluster: quadratic pair count no
  * partitioning trick shrinks) fails loudly by default instead of grinding
  * one task for hours. Same bound and default as
  * [[Dedup.DefaultMaxBucketSize]]; run exact dedup first to clear it.
  */
object EditDistance {

  /** Verified near-dup pairs `(id_a, id_b, dist, ratio)` with
    * `id_a < id_b`; NULL ids are dropped (NULL never orders under `<`).
    */
  def pairs(df: DataFrame, idCol: String, textCol: String,
            prefixLen: Int = 24, cap: Int = 400, maxRatio: Double = 0.2,
            maxBlockSize: Int = Dedup.DefaultMaxBucketSize): DataFrame = {
    require(prefixLen > 0 && cap >= prefixLen,
      s"graft.EditDistance: need 0 < prefixLen <= cap, got ($prefixLen, $cap)")
    val b = df.filter(col(idCol).isNotNull).select(
      col(idCol).as("__id"),
      substring(lower(col(textCol)), 1, prefixLen).as("__pfx"),
      substring(lower(col(textCol)), 1, cap).as("__t"))
    val guarded = b
      .withColumn("__bsz",
        count(lit(1)).over(Window.partitionBy(col("__pfx"))))
      .filter(when(col("__bsz") > maxBlockSize,
        raise_error(concat(
          lit("graft.editDistancePairs: prefix block holds "), col("__bsz"),
          lit(s" rows > maxBlockSize=$maxBlockSize; run exact dedup first " +
            "or raise maxBlockSize"))))
        .otherwise(lit(true)))
    val l = guarded.select(col("__pfx"), col("__id").as("id_a"),
      col("__t").as("__ta"))
    val r = guarded.select(col("__pfx"), col("__id").as("id_b"),
      col("__t").as("__tb"))
    val len = greatest(length(col("__ta")), length(col("__tb")))
    l.join(r, Seq("__pfx")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__ta"), col("__tb")).cast("long").as("dist"),
        (round(when(len === 0, lit(0.0))
          .otherwise(levenshtein(col("__ta"), col("__tb")).cast("double") / len),
          6) + lit(0.0)).as("ratio"))
      .filter(col("ratio") <= maxRatio)
  }

  /** Jaro-Winkler similarity — the record-linkage-standard string metric
    * [[pairs]]' Levenshtein ratio complements badly on SHORT strings
    * (names, titles, usernames): Jaro counts windowed character matches
    * and half-transpositions, Winkler boosts shared prefixes. Standard
    * parameters: prefix scale 0.1, max prefix 4, boost only when the base
    * Jaro exceeds 0.7 — the same convention DuckDB's
    * `jaro_winkler_similarity` implements, which the gate oracle leans on.
    */
  private[graft] def jaroWinkler(s1: String, s2: String): Double = {
    val (l1, l2) = (s1.length, s2.length)
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val matched2 = new Array[Boolean](l2)
    val m1 = new StringBuilder
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matched2(j) && s1.charAt(i) == s2.charAt(j)) {
          matched2(j) = true
          m1.append(s1.charAt(i))
          found = true
        }
        j += 1
      }
      i += 1
    }
    val m = m1.length
    if (m == 0) return 0.0
    val m2 = new StringBuilder
    var j = 0
    while (j < l2) { if (matched2(j)) m2.append(s2.charAt(j)); j += 1 }
    var t = 0
    var p = 0
    while (p < m) { if (m1.charAt(p) != m2.charAt(p)) t += 1; p += 1 }
    val half = t / 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 +
      (m - half).toDouble / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var pfx = 0
      while (pfx < math.min(4, math.min(l1, l2)) &&
        s1.charAt(pfx) == s2.charAt(pfx)) pfx += 1
      jaro + pfx * 0.1 * (1.0 - jaro)
    }
  }

  private val jwUdf = udf((a: String, b: String) => jaroWinkler(a, b))

  /** Fuzzy entity-resolution pairs by Jaro-Winkler: candidates block on
    * the first character of the lowercased name (typo families keep their
    * initial; the classic cheap blocker), pairs within a block score
    * `round(jw, 6)` and survive at `>= minSim`. Returns
    * `(id_a, id_b, name_a, name_b, jw)` with `id_a < id_b`; null
    * ids/names drop.
    *
    * Physical shape mirrors [[pairs]]: ONE shuffle on the block key
    * (ReusedExchange covers both self-join sides), the same lazy
    * `raise_error` mega-block guard bounds the quadratic blow-up, and the
    * similarity is the one justified UDF (a windowed two-cursor match
    * count has no HOF/builtin form; the kernel is O(len * window) on
    * short strings).
    */
  def jaroPairs(df: DataFrame, idCol: String, nameCol: String,
                minSim: Double = 0.85,
                maxBlockSize: Int = Dedup.DefaultMaxBucketSize): DataFrame = {
    require(minSim >= 0.0 && minSim <= 1.0,
      s"graft.EditDistance: minSim must be in [0, 1], got $minSim")
    val b = df.filter(col(idCol).isNotNull && col(nameCol).isNotNull)
      .select(col(idCol).as("__id"), lower(col(nameCol)).as("__name"),
        substring(lower(col(nameCol)), 1, 1).as("__blk"))
    val guarded = b
      .withColumn("__bsz",
        count(lit(1)).over(Window.partitionBy(col("__blk"))))
      .filter(when(col("__bsz") > maxBlockSize,
        raise_error(concat(
          lit("graft.jaroPairs: block holds "), col("__bsz"),
          lit(s" rows > maxBlockSize=$maxBlockSize; tighten the blocker " +
            "or raise maxBlockSize"))))
        .otherwise(lit(true)))
    val l = guarded.select(col("__blk"), col("__id").as("id_a"),
      col("__name").as("name_a"))
    val r = guarded.select(col("__blk"), col("__id").as("id_b"),
      col("__name").as("name_b"))
    l.join(r, Seq("__blk")).filter(col("id_a") < col("id_b"))
      .withColumn("jw", round(jwUdf(col("name_a"), col("name_b")), 6))
      .filter(col("jw") >= minSim)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        col("jw"))
  }

  /** SymSpell-style edit-distance-1 matching by DELETION variants (Garbe's
    * symmetric delete algorithm): every string generates itself plus its
    * |s| single-character deletions; two strings within Levenshtein
    * distance 1 are GUARANTEED to share a variant (equal → the string
    * itself; substitution → the deletion at the edited position; 1-char
    * insert/delete → the shorter string is a deletion of the longer). So
    * candidate generation is an equi-join on the variant key — linear
    * work + a keyed shuffle, where naive fuzzy match is O(n^2) and
    * prefix-blocking ([[jaroPairs]]) can MISS first-character edits.
    * Candidates are verified with the exact codegen'd `levenshtein`, so
    * false positives (two deletions apart) are filtered and the result is
    * EXACT: every distance-<=1 pair, no false negatives — the
    * brute-force-oracle-checkable guarantee.
    *
    * Returns `(id_a, id_b, name_a, name_b, dist)` with `id_a < id_b`,
    * `dist` in {0, 1}. Variant fan-out is |s|+1 rows per string — bound
    * input length upstream for 100 TB runs; the variant-key blocks are
    * frequency-bounded by construction (a variant is shared only by
    * near-identical strings), so no mega-bucket guard is needed beyond
    * the exact-dup families an upstream exact dedup should clear anyway.
    */
  /** Sorted-neighborhood blocking (Hernandez-Stolfo): rank DISTINCT names
    * under the lexicographic order and compare only names within `window`
    * ranks of each other, verified by Jaro-Winkler — the third blocker of
    * the kit ([[jaroPairs]] first-letter blocks miss mid-string families
    * that sort apart? no — the converse: sorted neighborhoods catch
    * same-prefix-different-first-letter ONLY when adjacent in sort order,
    * but unlike a hard block key the window slides, so families that
    * straddle a block boundary still pair). Production linkage runs
    * several blockers and unions candidates; this supplies the classic
    * second pass.
    *
    * Returns `(id_a, id_b, name_a, name_b, jw)` with `id_a < id_b` at
    * `jw >= minSim`. The rank window runs over the DISTINCT-name table
    * (domain-bounded single partition, the vocabulary-rank regime); the
    * band join fans out `window` rows per name; id expansion is
    * output-sized (the [[symspellPairs]] discipline).
    */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, nameCol: String,
                              window: Int = 3,
                              minSim: Double = 0.85): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(minSim >= 0.0 && minSim <= 1.0, "minSim must be in [0, 1]")
    val named = df
      .filter(col(idCol).isNotNull && col(nameCol).isNotNull)
      .select(col(idCol).as("__id"), lower(col(nameCol)).as("__name"))
    val ranked = named.select(col("__name")).distinct()
      .withColumn("__r", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("__name"))))
    val l = ranked.select(col("__name").as("__na"), col("__r").as("__ra"))
    val r = ranked.select(col("__name").as("__nb"), col("__r").as("__rb"))
    val namePairs = l.join(r,
        col("__rb") - col("__ra") >= 0 && col("__rb") - col("__ra") <= window)
      .withColumn("jw", round(jwUdf(col("__na"), col("__nb")), 6))
      .filter(col("jw") >= minSim)
      .select(col("__na"), col("__nb"), col("jw"))
    val rev = namePairs.filter(col("__na") =!= col("__nb"))
      .select(col("__nb").as("__na"), col("__na").as("__nb"), col("jw"))
    namePairs.unionByName(rev)
      .join(named.select(col("__id").as("id_a"), col("__name").as("__na")),
        Seq("__na"))
      .join(named.select(col("__id").as("id_b"), col("__name").as("__nb")),
        Seq("__nb"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("__na").as("name_a"),
        col("__nb").as("name_b"), col("jw"))
  }

  /** Noisy-channel spell correction against a corpus vocabulary: for each
    * query string, the distance-<=1 vocabulary word with the highest
    * corpus frequency (the unigram prior — the channel model is uniform
    * over single edits, Norvig's classic recipe). Candidates come from
    * the SymSpell deletion-variant join ([[symspellPairs]]'s generation,
    * so first-char edits are found), verified by exact levenshtein.
    * One row per query: `(query, correction, freq, dist)` — null
    * correction when nothing is within distance 1 (the honest "no
    * suggestion"); exact vocabulary hits return themselves at dist 0.
    *
    * Scale shape: variant fan-out is |query|+1 and |vocab word|+1 rows
    * per string; the candidate join is keyed on the variant; ranking is
    * one window per query over its (small) candidate set.
    */
  /** `broadcastBest = true` pins the final attach-join to a broadcast of
    * the one-row-per-query `best` side — set it when the QUERY SET is
    * known driver-small (a UI's misspelling panel, a fixture). The
    * default leaves the choice to AQE's runtime size estimate, which is
    * correct at both regimes but sits near the broadcast threshold on
    * small fixtures and flips strategy run-to-run (the r14 canonical-
    * digest flap) — a stability knob, not a semantics change.
    */
  def spellCorrect(queries: DataFrame, queryCol: String,
                   vocab: DataFrame, wordCol: String,
                   freqCol: String, broadcastBest: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Tail bound is the string's own length (not a fixed cap): a fixed cap
    // silently truncates long strings' variants and breaks the
    // zero-false-negative guarantee past the cap.
    def variants(c: Column): Column = array_distinct(concat(array(c),
      transform(sequence(lit(1), length(c)),
        i => concat(c.substr(lit(1), i - 1), c.substr(i + 1, length(c))))))
    val qv = queries.filter(col(queryCol).isNotNull)
      .select(lower(col(queryCol)).as("query"))
      .distinct()
      .select(col("query"), explode(variants(col("query"))).as("__v"))
    val vv = vocab.filter(col(wordCol).isNotNull)
      .select(lower(col(wordCol)).as("__w"), col(freqCol).as("__f"))
      .select(col("__w"), col("__f"), explode(variants(col("__w"))).as("__v"))
    val cands = qv.join(vv, Seq("__v"))
      .select(col("query"), col("__w"), col("__f")).distinct()
      .withColumn("__d", levenshtein(col("query"), col("__w")).cast("long"))
      .filter(col("__d") <= 1)
    val w = Window.partitionBy(col("query"))
      .orderBy(col("__d"), col("__f").desc, col("__w"))
    val best = cands.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("query"), col("__w").as("correction"),
        col("__f").cast("long").as("freq"), col("__d").as("dist"))
    queries.filter(col(queryCol).isNotNull)
      .select(lower(col(queryCol)).as("query")).distinct()
      .join(if (broadcastBest) broadcast(best) else best, Seq("query"), "left")
  }

  def symspellPairs(df: DataFrame, idCol: String,
                    nameCol: String): DataFrame = {
    val named = df
      .filter(col(idCol).isNotNull && col(nameCol).isNotNull)
      .select(col(idCol).as("__id"), lower(col(nameCol)).as("__name"))
    // Candidate generation + verification run over DISTINCT names only —
    // exact-dup families (the dominant mass in real corpora) would
    // otherwise multiply every variant block quadratically before the
    // distinct; measured 4x on the fixture corpus. Work is
    // O(|distinct names| * len) + verified name pairs; only the final
    // id expansion touches row counts, and that is output-sized.
    // Tail bound = the name's own length — a fixed cap would truncate
    // variants of long names and could miss a shared deletion variant,
    // contradicting the documented zero-false-negative guarantee.
    val deletions = transform(
      sequence(lit(1), length(col("__name"))),
      i => concat(col("__name").substr(lit(1), i - 1),
        col("__name").substr(i + 1, length(col("__name")))))
    val variants = named.select(col("__name")).distinct()
      .select(col("__name"),
        explode(array_distinct(concat(array(col("__name")), deletions)))
          .as("__v"))
    val l = variants.select(col("__v"), col("__name").as("__na"))
    val r = variants.select(col("__v"), col("__name").as("__nb"))
    val namePairs = l.join(r, Seq("__v")).filter(col("__na") <= col("__nb"))
      .select(col("__na"), col("__nb")).distinct()
      .withColumn("dist", levenshtein(col("__na"), col("__nb")).cast("long"))
      .filter(col("dist") <= 1)
    val fwd = namePairs
    val rev = namePairs.filter(col("__na") =!= col("__nb"))
      .select(col("__nb").as("__na"), col("__na").as("__nb"), col("dist"))
    fwd.unionByName(rev)
      .join(named.select(col("__id").as("id_a"), col("__name").as("__na")),
        Seq("__na"))
      .join(named.select(col("__id").as("id_b"), col("__name").as("__nb")),
        Seq("__nb"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("__na").as("name_a"),
        col("__nb").as("name_b"), col("dist"))
  }
}
