package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Deduplication operators for large-scale text corpora — the
  * training-data-pipeline extensions mandated beyond the reference surface
  * (the reference's only dedup-adjacent behavior is delete-by-source upsert,
  * `yamlpipe/components/sinks.py:66-80`).
  *
  * Scale design:
  *  - exact dedup is a single hash-shuffle groupBy on the content hash —
  *    map-side partial aggregation, no driver state;
  *  - MinHash+LSH banding turns the quadratic near-dup join into a
  *    bucket-equi-join: candidates shuffle only within matching bands;
  *  - SimHash reduces each doc to 64 bits; near-dups cluster by hamming
  *    distance on bucketed prefixes;
  *  - n-gram Jaccard is the exact verifier, run only on candidate pairs;
  *  - embedding-cosine near-dup blocks on a key (label/LSH bucket) to bound
  *    the pairwise join.
  */
object Dedup {

  // -------------------------------------------------------------------------
  // Exact dedup
  // -------------------------------------------------------------------------

  /** Persist candidate-bounded intermediates only when re-executing the
    * banding join would re-scan a non-trivial input. Catalyst's
    * size-in-bytes estimate of the input (parquet footers / file sizes) is
    * compared against `graft.dedup.persistThresholdBytes` (Spark conf,
    * default 256 MB): below it a rebuild is cheaper than the cache's
    * serialization + memory churn (measured at sf0.1, local[32]: bench
    * median 2.5 s persisted vs 1.7 s rebuilt); above it, skipping the cache
    * costs up to three extra full scans + band shuffles of the corpus and
    * the id-pair-sized cache always wins. `choice` (the public
    * `persistIntermediates` parameter) overrides the heuristic in either
    * direction.
    */
  private[graft] def shouldPersist(df: DataFrame, choice: Option[Boolean]): Boolean =
    choice.getOrElse {
      val threshold = df.sparkSession.conf
        .getOption("graft.dedup.persistThresholdBytes")
        .map(_.toLong).getOrElse(256L << 20)
      df.queryExecution.optimizedPlan.stats.sizeInBytes > threshold
    }

  /** Exact duplicate groups by content hash: one row per distinct content
    * with the kept (minimum) id and the duplicate count. Pure hash groupBy:
    * partial-aggregates map-side, shuffles only one row per distinct text.
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Keep exactly one row per distinct content (the min-id winner). */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** URL-level dedup groups: [[exactGroups]] keyed on the CANONICAL url
    * ([[graft.functions.UrlFunctions.canonicalizeUrl]]) instead of the
    * content hash — the crawl-frontier dedup that unifies
    * `HTTP://Example.com:80/a?utm_source=x#top` with `http://example.com/a`
    * before any text is fetched or compared. Same scale shape as exact
    * dedup: the canonicalization is a narrow codegen'd expression chain, so
    * the whole operator is one hash-shuffle groupBy on the canonical form.
    */
  def urlDedupGroups(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.groupBy(
        graft.functions.UrlFunctions.canonicalizeUrl(col(urlCol)).as("url_canonical"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Keep exactly one row per canonical URL (the min-id winner), with the
    * canonical form attached. Single window shuffle, corpus never re-read.
    */
  def urlDedup(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val canon = graft.functions.UrlFunctions.canonicalizeUrl(col(urlCol))
    val w = Window.partitionBy(col("url_canonical")).orderBy(col(idCol))
    df.withColumn("url_canonical", canon)
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  // -------------------------------------------------------------------------
  // Shingles + n-gram Jaccard (exact similarity kernel)
  // -------------------------------------------------------------------------

  /** Lowercased single-space tokens — the tokenizer contract every n-gram
    * kernel here and in [[SpanDedup]] shares (shingles, minhash signatures,
    * span windows). One definition so the kernels cannot drift apart.
    */
  private[operators] def spaceTokens(text: String): Array[String] =
    if (text == null) Array.empty[String]
    else text.toLowerCase(java.util.Locale.ROOT).split(' ').filter(_.nonEmpty)

  /** All `n`-token windows of `toks`, space-joined, in positional order
    * (NOT distinct). Empty when the text is shorter than one window.
    */
  private[operators] def wordWindows(toks: Array[String], n: Int): Iterator[String] =
    if (toks.length < n) Iterator.empty
    else {
      val sb = new java.lang.StringBuilder()
      (0 to toks.length - n).iterator.map { i =>
        sb.setLength(0)
        var j = 0
        while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        sb.toString
      }
    }

  /** Fold one shingle into a running minhash signature: two murmur32 passes
    * combined into a 64-bit base, re-mixed per hash function with a
    * golden-ratio stream split + fmix64 finalizer, min-kept.
    */
  private def minhashUpdate(sig: Array[Long], sh: String, seed: Int): Unit = {
    val h1 = scala.util.hashing.MurmurHash3.stringHash(sh, seed)
    val h2 = scala.util.hashing.MurmurHash3.stringHash(sh, h1)
    val base = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
    var k = 0
    while (k < sig.length) {
      var h = base ^ (0x9E3779B97F4A7C15L * (k + 1)) // golden-ratio stream split
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33 // fmix64
      if (h < sig(k)) sig(k) = h
      k += 1
    }
  }

  /** Fold a minhash signature into `sig.length / bandSize` band values
    * (fmix-combined).
    */
  private def minhashFoldBands(sig: Array[Long], bandSize: Int): Array[Long] = {
    val nBands = sig.length / bandSize
    val bands = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var h = 0x9E3779B97F4A7C15L * (b + 1)
      var j = 0
      while (j < bandSize) {
        h ^= sig(b * bandSize + j)
        h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
        j += 1
      }
      bands(b) = h
      b += 1
    }
    bands
  }

  private[graft] val shinglesUdf = udf((text: String, n: Int) => {
    val toks = spaceTokens(text)
    if (toks.length < n) Seq.empty[String]
    else {
      // LinkedHashSet = distinct keeping first-occurrence order (the
      // array_distinct contract).
      val seen = new java.util.LinkedHashSet[String]()
      wordWindows(toks, n).foreach(seen.add)
      import scala.jdk.CollectionConverters._
      seen.asScala.toSeq
    }
  })

  /** Distinct word n-gram shingles (single spaces tokenization, first-
    * occurrence order). Single-pass UDF: the equivalent
    * transform/sequence/element_at expression re-evaluates the tokenizer
    * inside every lambda (O(grams x tokens) per row) and is ~30x slower.
    * Values are identical to the DuckDB oracle's
    * list_distinct(list_transform(...)) formulation.
    */
  def shingles(textCol: Column, n: Int = 3): Column = shinglesUdf(textCol, lit(n))

  /** Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0.0, lit(0.0)).otherwise(inter / union)
  }

  /** Single-pass Jaccard over (already-distinct) shingle arrays. Same values
    * as [[jaccard]] but one hash-set intersection per pair — the expression
    * form gets duplicated by project/filter collapse and pays one
    * array_intersect per duplicate.
    */
  private[graft] val jaccardFastUdf = udf((a: Seq[String], b: Seq[String]) => {
    if (a == null || b == null) 0.0
    else {
      val sa = a.toSet
      var inter = 0
      b.foreach(x => if (sa.contains(x)) inter += 1)
      val union = a.size + b.size - inter
      if (union == 0) 0.0 else inter.toDouble / union
    }
  })

  /** Exact n-gram Jaccard over candidate pairs: `pairs` must carry shingle
    * array columns `aCol`/`bCol`.
    */
  def ngramJaccard(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    pairs.withColumn("jaccard", jaccard(col(aCol), col(bCol)))

  // -------------------------------------------------------------------------
  // Eval-set decontamination (n-gram overlap against a benchmark corpus)
  // -------------------------------------------------------------------------

  /** Training-data decontamination: flag every document sharing at least one
    * word n-gram with an eval/benchmark corpus (the GPT-3 appendix-C recipe —
    * 13-gram overlap — default). Output: one row per input document with
    * `matched_grams` (distinct overlapping n-grams) and a `contaminated`
    * flag.
    *
    * Scale shape: eval sets are small and bounded (benchmarks are thousands
    * of prompts, not terabytes), so the distinct eval-gram side BROADCASTS
    * and the corpus side streams through a broadcast-hash semi-ish join —
    * the 100 TB side is scanned once, never shuffled at gram granularity.
    * Only the post-join survivors (contaminated docs' matched grams — tiny
    * by construction) hit the per-doc count shuffle, and the final flag
    * join-back moves doc ids only. Set `broadcastEval = false` for a
    * pathological eval corpus too big to broadcast (falls back to a shuffle
    * hash join, same results).
    */
  def contaminationFlags(docs: DataFrame, evalSet: DataFrame,
                         textCol: String, idCol: String, evalTextCol: String,
                         n: Int = 13, broadcastEval: Boolean = true): DataFrame = {
    val docGrams = docs.select(col(idCol), explode(shingles(col(textCol), n)).as("__gram"))
    val evalGramsRaw = evalSet
      .select(explode(shingles(col(evalTextCol), n)).as("__gram")).distinct()
    val evalGrams = if (broadcastEval) broadcast(evalGramsRaw) else evalGramsRaw
    val matches = docGrams.join(evalGrams, "__gram")
      .groupBy(col(idCol)).agg(countDistinct(col("__gram")).as("matched_grams"))
    docs.select(col(idCol)).distinct()
      .join(matches, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("matched_grams"), lit(0L)).as("matched_grams"),
        (coalesce(col("matched_grams"), lit(0L)) > 0).as("contaminated"))
  }

  /** Per-document eval-overlap FRACTION — the "dirty document" criterion
    * later-generation decontamination pipelines threshold on (PaLM /
    * Llama-style: a doc is dirty when a large share of its n-grams appear
    * in the benchmark; [[contaminationFlags]]' any-collision flag is the
    * GPT-3-style conservative special case). Output: `(id, total_grams,
    * matched_grams, overlap_fraction, dirty)`; gram-less docs report 0.0
    * and clean. `dirty` thresholds the UNROUNDED fraction.
    *
    * Scale shape: identical broadcast posture to [[contaminationFlags]] —
    * the eval-gram side broadcasts, the 100 TB corpus side is scanned
    * once; posexplode over the DISTINCT gram array keeps the per-doc
    * total recoverable as `max(pos) + 1` (no second shingle pass — the
    * [[duplicationDensity]] trick); only doc-key rollups shuffle.
    */
  def contaminationFraction(docs: DataFrame, evalSet: DataFrame,
                            textCol: String, idCol: String, evalTextCol: String,
                            n: Int = 13, dirtyThreshold: Double = 0.2,
                            broadcastEval: Boolean = true): DataFrame = {
    val grams = Partitioning.ensureParallelism(docs)
      .select(col(idCol),
        posexplode(array_distinct(shingles(col(textCol), n))).as(Seq("__pos", "__gram")))
    val evalGramsRaw = evalSet
      .select(explode(shingles(col(evalTextCol), n)).as("__gram")).distinct()
      .withColumn("__hit", lit(1L))
    val evalGrams = if (broadcastEval) broadcast(evalGramsRaw) else evalGramsRaw
    val perDoc = grams.join(evalGrams, Seq("__gram"), "left")
      .groupBy(col(idCol))
      .agg((max(col("__pos")) + 1).cast("long").as("total_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("matched_grams"))
    docs.select(col(idCol)).distinct()
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("total_grams"), lit(0L)).as("total_grams"),
        coalesce(col("matched_grams"), lit(0L)).as("matched_grams"))
      .withColumn("overlap_fraction",
        round(when(col("total_grams") === 0L, lit(0.0))
          .otherwise(col("matched_grams").cast("double") / col("total_grams")), 6))
      .withColumn("dirty", col("total_grams") > 0L &&
        col("matched_grams").cast("double") / col("total_grams") > dirtyThreshold)
  }

  /** [[contaminationFlags]] for an eval corpus too big to broadcast as a
    * hash relation: a Bloom filter over the distinct eval grams (~10 bits
    * per gram at `fpp` 1% — 10-50x smaller than the gram strings) broadcasts
    * in its place and prefilters the corpus-gram stream as a NARROW filter,
    * so the exact-verify join that removes the Bloom's false positives only
    * shuffles survivors (true matches + ~fpp of the corpus grams), never
    * the 100 TB side. Same output, row for row, as [[contaminationFlags]] —
    * the Bloom changes what moves, not what matches.
    *
    * `expectedEvalGrams` sizes the filter; an undersized filter degrades
    * fpp (more survivors shuffle) but never correctness.
    */
  def contaminationFlagsBloom(docs: DataFrame, evalSet: DataFrame,
                              textCol: String, idCol: String, evalTextCol: String,
                              n: Int = 13, expectedEvalGrams: Long = 4L * 1000 * 1000,
                              fpp: Double = 0.01): DataFrame = {
    val evalGrams = evalSet
      .select(explode(shingles(col(evalTextCol), n)).as("__gram")).distinct()
    // One bounded job: the filter is built distributed (per-partition blooms
    // OR-merged), only the final bitset (~expectedEvalGrams * 10 bits) comes
    // back to the driver for broadcast.
    val bloom = evalGrams.stat.bloomFilter("__gram", expectedEvalGrams, fpp)
    val bloomBc = docs.sparkSession.sparkContext.broadcast(bloom)
    val mightMatch = udf((g: String) => g != null && bloomBc.value.mightContainString(g))
    val survivorGrams = docs
      .select(col(idCol), explode(shingles(col(textCol), n)).as("__gram"))
      .filter(mightMatch(col("__gram")))
    // Exact verify over survivors only — a SHUFFLE join by design (the
    // premise is that the eval-gram set outgrew broadcast).
    val matches = survivorGrams.join(evalGrams, "__gram")
      .groupBy(col(idCol)).agg(countDistinct(col("__gram")).as("matched_grams"))
    docs.select(col(idCol)).distinct()
      .join(matches, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("matched_grams"), lit(0L)).as("matched_grams"),
        (coalesce(col("matched_grams"), lit(0L)) > 0).as("contaminated"))
  }

  /** Cross-document duplication density: for every document, the fraction
    * of its distinct word `n`-grams that also occur in at least one OTHER
    * document — the span-level duplication signal curation pipelines use to
    * find boilerplate-heavy and template-generated text (the per-corpus
    * companion of [[contaminationFlags]], which asks the same question
    * against an external eval set). Output: one row per input document with
    * `total_grams`, `dup_grams`, `dup_density` (0.0 for shingle-less docs).
    *
    * Scale shape: one corpus scan computes shingles ONCE (posexplode keeps
    * the per-doc total recoverable as `max(pos) + 1`, so no second shingle
    * pass); gram frequencies aggregate with map-side partials and join back
    * at gram granularity — the two vocabulary-sized shuffles are inherent
    * to a corpus-global statistic (same shape as [[TfIdf.score]]). The
    * final per-doc rollup shuffles doc ids only.
    */
  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * algorithm): md5 each `k`-token gram, then keep the MINIMUM hash of
    * every `window`-gram sliding window, distinct — a position-robust
    * document fingerprint SET whose density is guaranteed (at least one
    * selection per window) while insertions/deletions only perturb nearby
    * windows. The plagiarism-detection complement to [[SpanDedup]]'s exact
    * spans and the minhash signature's whole-document sketch.
    *
    * Output: `(id, n_grams, n_fingerprints, fp_digest)` where `fp_digest`
    * is md5 over the sorted fingerprint set (set-stable). Pure codegen'd
    * HOFs (transform/slice/array_min) — no UDF, no shuffle, linear at any
    * corpus size. Documents with fewer than `k + window - 1` tokens yield
    * zero fingerprints.
    */
  def winnowFingerprints(df: DataFrame, textCol: String, idCol: String,
                         k: Int = 5, window: Int = 4): DataFrame = {
    require(k > 0 && window > 0, "k and window must be positive")
    val toks = TextAnalysis.toks(col(textCol))
    val n = size(toks)
    val grams = when(n >= k,
        transform(sequence(lit(1), n - (k - 1)), i =>
          md5(concat_ws(" ", slice(toks, i, lit(k))))))
      .otherwise(array().cast("array<string>"))
    val nGrams = size(grams)
    val fps = when(nGrams >= window,
        array_distinct(transform(sequence(lit(1), nGrams - (window - 1)), i =>
          array_min(slice(grams, i, lit(window))))))
      .otherwise(array().cast("array<string>"))
    df.select(col(idCol),
      nGrams.cast("long").as("n_grams"),
      size(fps).cast("long").as("n_fingerprints"),
      md5(array_join(array_sort(fps), "")).as("fp_digest"))
  }

  def duplicationDensity(df: DataFrame, textCol: String, idCol: String,
                         n: Int = 13): DataFrame = {
    val grams = Partitioning.ensureParallelism(df)
      .select(col(idCol), posexplode(shingles(col(textCol), n)).as(Seq("__pos", "__gram")))
    val gfreq = grams.groupBy(col("__gram")).agg(count(lit(1)).as("__df"))
    val perDoc = grams.join(gfreq, "__gram")
      .groupBy(col(idCol))
      .agg((max(col("__pos")) + 1).cast("long").as("total_grams"),
        sum((col("__df") >= 2).cast("long")).as("dup_grams"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("total_grams"), lit(0L)).as("total_grams"),
        coalesce(col("dup_grams"), lit(0L)).as("dup_grams"),
        round(when(coalesce(col("total_grams"), lit(0L)) === 0L, lit(0.0))
          .otherwise(col("dup_grams").cast("double") / col("total_grams")), 6)
          .as("dup_density"))
  }

  // -------------------------------------------------------------------------
  // MinHash + LSH (approximate Jaccard at scale)
  // -------------------------------------------------------------------------

  /** Banded minhash signature of a shingle set: one 64-bit base hash per
    * shingle (two murmur32 passes combined), re-mixed per hash function with
    * a fixed odd multiplier + fmix64 finalizer, min-reduced — then the
    * `numHashes` mins are folded into `numHashes / bandSize` band values
    * (fmix-combined). One array walk per document — no 2^18-dim sparse
    * feature vectors, no model fit.
    *
    * Band size is the LSH precision dial: candidate probability for a pair
    * with Jaccard s is 1 - (1 - s^bandSize)^nBands. bandSize=1 makes ANY
    * matching hash a candidate (huge noise-candidate volume); bandSize=2
    * with twice the hashes keeps recall high near the dedup threshold while
    * cutting random-pair collisions by an order of magnitude — the shuffle
    * and verify stages scale with collisions.
    */
  private[graft] val minhashBandsUdf = udf((shingles: Seq[String], numHashes: Int, bandSize: Int, seed: Int) => {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    shingles.foreach(minhashUpdate(sig, _, seed))
    minhashFoldBands(sig, bandSize)
  })

  /** Fused tokenize→shingle→minhash→band kernel: byte-identical output to
    * `minhashBandsUdf(shinglesUdf(text, n), ...)` (min over a multiset
    * equals min over its set, so the distinct pass shingling does for the
    * VERIFY stage is a no-op for signatures) in ONE evaluation with no
    * intermediate shingle array. This matters beyond constant factors:
    * Catalyst's CollapseProject + InferFiltersFromGenerate duplicate a
    * projected UDF into the scan filter and the generator input, so the
    * two-UDF composition was evaluated up to 3x per row — the fused form
    * explodes with `posexplode_outer` (nothing to infer) and is evaluated
    * exactly once. Returns null when the text yields no shingles.
    */
  private[graft] val minhashBandsFromTextUdf = udf(
    (text: String, shingleSize: Int, numHashes: Int, bandSize: Int, seed: Int) => {
      val toks = spaceTokens(text)
      if (toks.length < shingleSize) null
      else {
        val sig = Array.fill(numHashes)(Long.MaxValue)
        wordWindows(toks, shingleSize).foreach(minhashUpdate(sig, _, seed))
        minhashFoldBands(sig, bandSize)
      }
    })

  /** Near-duplicate candidate pairs via banded MinHash: docs sharing any of
    * `numHashes / bandSize` minhash bands become candidates (equi-join on
    * (band, value) — the shuffle key bounds the join, never a cross
    * product), then candidates are verified with EXACT shingle-set Jaccard
    * and filtered to distance <= `maxJaccardDistance`.
    *
    * Returns (id_a, id_b, jaccard_dist) with a < b; deterministic under the
    * seed. Same candidate semantics as MLlib's MinHashLSH
    * approxSimilarityJoin, but ~10x faster: no HashingTF sparse vectors, no
    * lsh.fit, no per-pair keyDistance over 2^18-dim vectors. At scale:
    * signature pass is narrow, candidate generation shuffles once on the
    * band key, verification shuffles only candidate ids.
    *
    * CACHING: `persistIntermediates = Some(true)` persists the candidate-
    * bounded intermediates MEMORY_AND_DISK until the session drops them — a
    * long-running app calling this repeatedly should
    * `spark.catalog.clearCache()` between corpora; `Some(false)` trades
    * re-execution of the band join for zero cache footprint. The default
    * (`None`) decides from the INPUT size estimate — see [[shouldPersist]].
    */
  def minhashLshPairs(df: DataFrame, textCol: String, idCol: String,
                      maxJaccardDistance: Double = 0.6,
                      numHashes: Int = 16,
                      bandSize: Int = 2,
                      shingleSize: Int = 3,
                      seed: Long = 42L,
                      persistIntermediates: Option[Boolean] = None): DataFrame = {
    require(numHashes % bandSize == 0, "numHashes must be a multiple of bandSize")
    val banded = bandedKeys(df, textCol, idCol, numHashes, bandSize, shingleSize, seed)
    val a = banded.select(col(idCol).as("id_a"), col("__band"), col("__minh"))
    val b = banded.select(col(idCol).as("id_b"), col("__band"), col("__minh"))
    // Candidates are orders of magnitude smaller than the corpus; persisting
    // them (pairs of ids — bytes per pair) saves the verify stage's three
    // uses from re-executing the band self-join. This is the one
    // intermediate small enough to cache at any corpus size.
    val persist = shouldPersist(df, persistIntermediates)
    def maybePersist(d: DataFrame): DataFrame =
      if (persist)
        d.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else d
    val candidates = maybePersist(a.join(b, Seq("__band", "__minh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct())
    // Exact-Jaccard verification on candidates only. Semi-join the corpus
    // down to candidate ids BEFORE computing verify shingles: the shingle
    // UDF then runs over O(candidates) rows, not O(corpus) — the plan keeps
    // the (broadcast, id-only) semi join below the UDF projection.
    val candIds = candidates.select(col("id_a").as(idCol))
      .union(candidates.select(col("id_b").as(idCol)))
      .distinct()
    val candShingles = maybePersist(
      candidateShingles(df, textCol, idCol, shingleSize, candIds))
    verifiedPairs(
      candShingles.select(col(idCol).as("id_a"), col("__shingles").as("__sh_a")),
      candShingles.select(col(idCol).as("id_b"), col("__shingles").as("__sh_b")),
      candidates, "id_a", "id_b", maxJaccardDistance)
  }

  /** Recall audit of the banded-MinHash path against exact ground truth —
    * the dedup-QA report that answers "is the LSH shortcut still finding
    * every true near-duplicate?" as a number instead of a belief.
    *
    * Ground truth is computed WITHOUT banding: Jaccard >= (1 - maxDist) > 0
    * requires at least one shared shingle, so the inverted-index self-join
    * (explode distinct shingles, equi-join on the shingle, COUNT(*) per
    * pair = |A∩B|) enumerates every qualifying pair exactly — no all-pairs
    * product, but ALSO no minhash approximation. The engine's
    * [[minhashLshPairs]] output is then compared against that truth set.
    *
    * Returns ONE row: (n_truth, n_found, n_missed, recall). Precision is
    * structurally 1.0 (candidates are exact-verified before emission), so
    * recall is the only free parameter of the banding.
    *
    * Scale: the inverted-index join's group sizes follow shingle document
    * frequency — at 100 TB run the audit over a sampled stratum (the
    * sketch path stays production); the fixture-scale gate keeps the
    * parameter choices honest. Reference posture: quality metrics surfaced
    * beside the data they grade (yamlpipe evaluators.py).
    */
  def lshRecallAudit(df: DataFrame, textCol: String, idCol: String,
                     maxJaccardDistance: Double = 0.6,
                     numHashes: Int = 16,
                     bandSize: Int = 2,
                     shingleSize: Int = 3,
                     seed: Long = 42L): DataFrame = {
    val sh = Partitioning.ensureParallelism(df)
      .select(col(idCol), shingles(col(textCol), shingleSize).as("__sh"))
    val ln = sh.select(col(idCol), size(col("__sh")).as("__l"))
      .filter(col("__l") > 0)
    val e = sh.select(col(idCol), explode(col("__sh")).as("__g"))
    val inter = e.alias("a")
      .join(e.alias("b"),
        col("a.__g") === col("b.__g") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).cast("double").as("__i"))
    val truth = inter
      .join(ln.select(col(idCol).as("id_a"), col("__l").as("__la")), "id_a")
      .join(ln.select(col(idCol).as("id_b"), col("__l").as("__lb")), "id_b")
      .filter(col("__i") >=
        lit(1.0 - maxJaccardDistance) * (col("__la") + col("__lb") - col("__i")))
      .select("id_a", "id_b")
    val found = minhashLshPairs(df, textCol, idCol, maxJaccardDistance,
        numHashes, bandSize, shingleSize, seed)
      .select(col("id_a"), col("id_b"), lit(1L).as("__f"))
    truth.join(found, Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("__f"), lit(0L))).as("n_found"))
      .select(col("n_truth"), col("n_found"),
        (col("n_truth") - col("n_found")).as("n_missed"),
        round(col("n_found").cast("double") / col("n_truth"), 6).as("recall"))
  }

  /** Shingles for the candidate-bounded subset of a corpus: semi-join the
    * ids BEFORE computing shingles so the UDF runs over O(candidates) rows,
    * not O(corpus).
    */
  private def candidateShingles(df: DataFrame, textCol: String, idCol: String,
                                shingleSize: Int, ids: DataFrame): DataFrame =
    Partitioning.ensureParallelism(df)
      .join(broadcast(ids), Seq(idCol), "left_semi")
      .select(col(idCol), shingles(col(textCol), shingleSize).as("__shingles"))

  /** Shared exact-Jaccard verification tail: join both candidate-bounded
    * shingle sides through the (tiny, broadcast) candidate pairs and keep
    * pairs within the distance bound. AQE picks broadcast vs shuffle for
    * the shingle joins from actual sizes (the array-heavy sides must not
    * be force-broadcast).
    */
  /** [[jaccardFastUdf]] marked non-deterministic — it IS deterministic, but
    * the marking stops the optimizer substituting the projected expression
    * into the distance filter (and from there into the join condition),
    * which evaluated the set intersection TWICE per candidate pair: once
    * probing the join, once in the output projection. Marked, the UDF runs
    * exactly once per pair in the projection and the filter consumes the
    * projected attribute.
    */
  private[graft] val jaccardOnceUdf = jaccardFastUdf.asNondeterministic()

  private def verifiedPairs(shLeft: DataFrame, shRight: DataFrame,
                            candidates: DataFrame, leftId: String, rightId: String,
                            maxJaccardDistance: Double): DataFrame =
    shLeft.join(broadcast(candidates), leftId)
      .join(shRight, rightId)
      .withColumn("jaccard_dist",
        lit(1.0) - jaccardOnceUdf(col("__sh_a"), col("__sh_b")))
      .filter(col("jaccard_dist") <= maxJaccardDistance)
      .select(leftId, rightId, "jaccard_dist")

  /** (id, band index, band value) LSH bucket keys for one corpus — the
    * shared front half of the within- and cross-corpus MinHash joins.
    * The full-corpus shingle pass feeds only the banding join (recomputing
    * beats caching — a persist of this table held memory for the whole
    * query and caused GC pressure downstream, r2); at cluster scale the
    * signature table would instead be a persisted/bucketed table keyed by
    * id, written once.
    */
  private[graft] def bandedKeys(df: DataFrame, textCol: String, idCol: String,
                         numHashes: Int, bandSize: Int, shingleSize: Int,
                         seed: Long): DataFrame = {
    // Fold BOTH halves of the Long seed into the Int the UDF consumes —
    // a bare .toInt would silently drop the high 32 bits, making seeds
    // that differ only in the upper half produce identical signatures.
    val mixedSeed = (seed ^ (seed >>> 32)).toInt
    // posexplode_OUTER + null-filter AFTER the generate: the non-outer form
    // makes the optimizer infer a `size(bands) > 0` scan filter that
    // re-evaluates the signature kernel per row (see
    // [[minhashBandsFromTextUdf]]); outer generates a (null, null) row for
    // shingle-less docs instead, dropped by a cheap attribute filter.
    Partitioning.ensureParallelism(df)
      .select(col(idCol),
        posexplode_outer(minhashBandsFromTextUdf(col(textCol), lit(shingleSize),
          lit(numHashes), lit(bandSize), lit(mixedSeed))).as(Seq("__band", "__minh")))
      .filter(col("__minh").isNotNull)
  }

  /** Cross-corpus near-dup join: MinHash-banded candidates BETWEEN two
    * corpora (a new crawl vs the existing training set), verified with
    * exact shingle Jaccard. Returns `(id_new, id_ref, jaccard_dist)` —
    * only cross pairs exist by construction (each side is banded
    * separately and the bucket join is between them, so no within-corpus
    * candidate is ever generated, unlike tagging + self-join). Ids must be
    * unique within each corpus but may collide across them. Same scale
    * shape as [[minhashLshPairs]]: one bucket-key equi-join, candidate-
    * bounded verification.
    *
    * CACHING: as with [[minhashLshPairs]], `Some(true)`/`Some(false)` force
    * the candidate cache on/off; the default (`None`) decides from the
    * combined input size estimate — see [[shouldPersist]]. An app calling
    * this once per crawl batch with caching on should
    * `spark.catalog.clearCache()` between batches.
    */
  def crossCorpusPairs(dfNew: DataFrame, dfRef: DataFrame,
                       textCol: String, idCol: String,
                       maxJaccardDistance: Double = 0.6,
                       numHashes: Int = 16,
                       bandSize: Int = 2,
                       shingleSize: Int = 3,
                       seed: Long = 42L,
                       persistIntermediates: Option[Boolean] = None): DataFrame =
    crossCorpusPairsPrebanded(dfNew, dfRef, textCol, idCol,
      signatures(dfRef, textCol, idCol, numHashes, bandSize, shingleSize, seed),
      maxJaccardDistance, numHashes, bandSize, shingleSize, seed,
      persistIntermediates)

  /** The reference corpus's banded signature table `(id, band, minh)` — the
    * artifact an INCREMENTAL pipeline persists once and re-joins every
    * crawl instead of re-banding the whole training set:
    * {{{
    *   Dedup.signatures(trainingSet, "text", "doc_id")
    *     .write.bucketBy(256, "band", "minh").sortBy("band")
    *     .saveAsTable("train_signatures")
    *   // later, per crawl:
    *   Dedup.crossCorpusPairsPrebanded(crawl, trainingSet, "text", "doc_id",
    *     spark.table("train_signatures"))
    * }}}
    * Bucketing by (band, minh) makes the candidate join shuffle-free on
    * the (large) reference side — only the new crawl's signatures move.
    */
  def signatures(df: DataFrame, textCol: String, idCol: String,
                 numHashes: Int = 16, bandSize: Int = 2,
                 shingleSize: Int = 3, seed: Long = 42L): DataFrame = {
    require(numHashes % bandSize == 0, "numHashes must be a multiple of bandSize")
    bandedKeys(df, textCol, idCol, numHashes, bandSize, shingleSize, seed)
      .select(col(idCol), col("__band").as("band"), col("__minh").as("minh"))
  }

  /** [[crossCorpusPairs]] against a PRE-COMPUTED reference signature table
    * (from [[signatures]], typically a bucketed catalog table). `dfRef` is
    * still required — the exact-Jaccard verification reads candidate
    * shingles from it — but its full-corpus banding pass is skipped, and
    * with a bucketed table the candidate join does not shuffle the
    * reference side at all. Signature parameters MUST match the ones the
    * table was built with (same hashes/bands/shingles/seed), or candidates
    * silently miss; they are passed explicitly to document that coupling.
    */
  def crossCorpusPairsPrebanded(dfNew: DataFrame, dfRef: DataFrame,
                                textCol: String, idCol: String,
                                refSignatures: DataFrame,
                                maxJaccardDistance: Double = 0.6,
                                numHashes: Int = 16,
                                bandSize: Int = 2,
                                shingleSize: Int = 3,
                                seed: Long = 42L,
                                persistIntermediates: Option[Boolean] = None): DataFrame = {
    require(numHashes % bandSize == 0, "numHashes must be a multiple of bandSize")
    require(Seq(idCol, "band", "minh").forall(refSignatures.columns.contains),
      s"refSignatures needs columns ($idCol, band, minh) — build it with Dedup.signatures")
    val persist = shouldPersist(dfNew.unionByName(dfRef), persistIntermediates)
    def maybePersist(d: DataFrame): DataFrame =
      if (persist)
        d.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else d
    val a = bandedKeys(dfNew, textCol, idCol, numHashes, bandSize, shingleSize, seed)
      .select(col(idCol).as("id_new"), col("__band"), col("__minh"))
    val b = refSignatures.select(col(idCol).as("id_ref"),
      col("band").as("__band"), col("minh").as("__minh"))
    val candidates = maybePersist(a.join(b, Seq("__band", "__minh"))
      .select("id_new", "id_ref").distinct())
    val shNew = candidateShingles(dfNew, textCol, idCol, shingleSize,
        candidates.select(col("id_new").as(idCol)).distinct())
      .select(col(idCol).as("id_new"), col("__shingles").as("__sh_a"))
    val shRef = candidateShingles(dfRef, textCol, idCol, shingleSize,
        candidates.select(col("id_ref").as(idCol)).distinct())
      .select(col(idCol).as("id_ref"), col("__shingles").as("__sh_b"))
    verifiedPairs(shNew, shRef, candidates, "id_new", "id_ref", maxJaccardDistance)
  }

  /** The COMPLETE incremental near-dup pass for one crawl batch: every
    * near-dup pair involving at least one NEW document, as the union of
    *  - new x reference candidates via the PRE-BANDED signature table
    *    ([[crossCorpusPairsPrebanded]] — the reference corpus is never
    *    re-banded, and with a bucketed table never re-shuffled), and
    *  - new x new candidates via the self-banding path
    *    ([[minhashLshPairs]] over just the batch).
    * Reference-internal pairs are by construction absent — they were
    * found when THOSE documents were the batch. This is the daily-crawl
    * contract: work scales with the batch, not the accumulated corpus.
    * Ids must be unique across the union (the incremental store's id
    * space); pairs come back normalized `(id_a < id_b, jaccard_dist)`.
    */
  def minhashLshIncrementalPairs(dfNew: DataFrame, dfRef: DataFrame,
                                 textCol: String, idCol: String,
                                 refSignatures: DataFrame,
                                 maxJaccardDistance: Double = 0.6,
                                 numHashes: Int = 16,
                                 bandSize: Int = 2,
                                 shingleSize: Int = 3,
                                 seed: Long = 42L,
                                 persistIntermediates: Option[Boolean] = None): DataFrame = {
    val cross = crossCorpusPairsPrebanded(dfNew, dfRef, textCol, idCol,
        refSignatures, maxJaccardDistance, numHashes, bandSize, shingleSize,
        seed, persistIntermediates)
      .select(least(col("id_new"), col("id_ref")).as("id_a"),
        greatest(col("id_new"), col("id_ref")).as("id_b"),
        col("jaccard_dist"))
    val within = minhashLshPairs(dfNew, textCol, idCol, maxJaccardDistance,
        numHashes, bandSize, shingleSize, seed, persistIntermediates)
      .select(col("id_a"), col("id_b"), col("jaccard_dist"))
    cross.unionByName(within)
  }

  // -------------------------------------------------------------------------
  // SimHash (64-bit fingerprint; hamming-near docs are near-dups)
  // -------------------------------------------------------------------------

  /** Add a 64-bit `simhash` column from space-tokenized content. The
    * kernel is the codegen'd [[graft.plans.SimhashExpr]] (md5-derived
    * per-token hash — engine-neutral, so the near-dup gate carries a FULL
    * SQL oracle replaying the bit votes; see its scaladoc).
    */
  def simhash(df: DataFrame, textCol: String): DataFrame =
    Partitioning.ensureParallelism(df).withColumn("simhash",
      graft.plans.SimhashExpr.sig(
        filter(split(lower(col(textCol)), " "), t => length(t) > 0)))

  /** Hamming distance between two simhash columns (bit_count of xor). */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on each of the four 16-bit quarters of
    * the fingerprint (the simhash-paper table scheme) — a pair is a
    * candidate if ANY quarter matches, which by pigeonhole GUARANTEES
    * detection at hamming <= 3 and catches higher distances
    * probabilistically (diffs must spread over all four quarters to hide).
    * Candidates are then verified with the exact 64-bit hamming distance.
    *
    * Physical shape: ONE shuffle on the (band index, band value) bucket key
    * and a streaming per-bucket pair kernel that applies the hamming filter
    * before any candidate row materializes — no self-join (which would
    * recompute the simhash scan on both sides), no broadcast, and the only
    * other exchange is the final cross-band distinct. A bucket's pairwise
    * work runs in one task; at cluster scale a pathological mega-bucket
    * (e.g. a giant exact-dup cluster) is the thing to cap upstream via
    * exact dedup first — the same bound the self-join formulation had, in
    * row-explosion form.
    */
  /** Guard against a pathological mega-bucket (e.g. a giant exact-dup
    * cluster all sharing a simhash quarter): fail loudly with a named error
    * instead of grinding through O(bucket^2) pair work in one task.
    */
  final class BucketTooLargeException(op: String, size: Int, limit: Int)
    extends IllegalStateException(
      s"graft.$op: LSH bucket holds $size rows > maxBucketSize=$limit; " +
        "run exact dedup first or raise maxBucketSize")

  /** Lazy (i, j) upper-triangle pair iterator over one bucket's membership
    * arrays: O(bucket) heap (the membership itself), never O(bucket^2) —
    * pairs stream out as downstream consumes them.
    */
  private def lazyPairs[T](n: Int, emit: (Int, Int) => Option[T]): Iterator[T] =
    Iterator.range(0, n).flatMap(i =>
      Iterator.range(i + 1, n).flatMap(j => emit(i, j)))

  /** Default per-bucket cap for the pairwise kernels: a bucket past this
    * size means ~50M+ candidate pairs in ONE task — at that point the
    * corpus needs exact dedup first (the pair count is inherently
    * quadratic; no partitioning trick shrinks it). Failing loudly by
    * default beats a silent multi-hour grind on a pathological cluster.
    */
  val DefaultMaxBucketSize: Int = 10000

  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 8,
                   maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // NULL ids are dropped up front (matching the old self-join's
    // id_a < id_b semantics, where NULL comparisons discarded the row).
    val h = simhash(df, textCol).select(col(idCol), col("simhash"))
      .filter(col(idCol).isNotNull)
    val idType = h.schema(idCol).dataType
    val bandVals = array((0 until 4).map(b =>
      shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xffffL))): _*)
    // Row layout into the kernel: (id, simhash, __band, __bits).
    val banded = h.select(col(idCol), col("simhash"),
      posexplode(bandVals).as(Seq("__band", "__bits")))
    val outSchema = StructType(Seq(
      StructField("id_a", idType), StructField("id_b", idType),
      StructField("hamming", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    banded
      .repartition(col("__band"), col("__bits"))
      .sortWithinPartitions(col("__band"), col("__bits"), col(idCol))
      .mapPartitions { rows =>
        val buf = rows.buffered
        new Iterator[Row] {
          private var pending: Iterator[Row] = Iterator.empty
          private def load(): Unit = {
            while (!pending.hasNext && buf.hasNext) {
              val band = buf.head.getInt(2)
              val bits = buf.head.getLong(3)
              val ids = scala.collection.mutable.ArrayBuffer[Any]()
              val hs = scala.collection.mutable.ArrayBuffer[Long]()
              while (buf.hasNext && buf.head.getInt(2) == band &&
                     buf.head.getLong(3) == bits) {
                val r = buf.next()
                ids += r.get(0); hs += r.getLong(1)
              }
              if (ids.length > maxBucketSize)
                throw new BucketTooLargeException("simhashPairs", ids.length, maxBucketSize)
              pending = lazyPairs(ids.length, (i, j) => {
                val d = java.lang.Long.bitCount(hs(i) ^ hs(j))
                if (d <= maxHamming) Some(Row(ids(i), ids(j), d)) else None
              })
            }
          }
          override def hasNext: Boolean = { load(); pending.hasNext }
          override def next(): Row = { load(); pending.next() }
        }
      }(enc)
      // A pair sharing several quarters is emitted once per matching bucket.
      .distinct()
  }

  // -------------------------------------------------------------------------
  // Embedding-cosine near-dup
  // -------------------------------------------------------------------------

  /** Near-duplicate pairs by embedding cosine similarity, blocked on
    * `blockCol` to bound the pairwise comparison (at scale the block key is
    * an LSH bucket; here any low-cardinality key works).
    *
    * Implemented as one shuffle on the block key + a per-partition pair
    * kernel, NOT a self-join: a join materializes |block|^2 rows each
    * carrying two boxed float arrays, while the kernel unboxes every vector
    * ONCE and runs the O(n^2) inner loop over primitive arrays. Cosine
    * arithmetic (double, left-to-right, dot/(sqrt*sqrt), skip on zero norm)
    * is value-identical to the join+expression formulation. Each block must
    * fit in one task's memory — the blocking key is chosen for that.
    */
  def cosinePairs(df: DataFrame, vecCol: String, idCol: String, blockCol: String,
                  minCosine: Double = 0.8,
                  maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val inSchema = df.schema
    val outSchema = StructType(Seq(
      StructField("block", inSchema(blockCol).dataType),
      StructField("id_a", inSchema(idCol).dataType),
      StructField("id_b", inSchema(idCol).dataType),
      StructField("cosine", DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col(blockCol), col(idCol), col(vecCol))
      .repartition(col(blockCol))
      .sortWithinPartitions(col(blockCol), col(idCol))
      .mapPartitions { rows =>
        val buf = rows.buffered
        new Iterator[Row] {
          private var pending: Iterator[Row] = Iterator.empty
          private def loadNextBlock(): Unit = {
            while (!pending.hasNext && buf.hasNext) {
              val blockVal = buf.head.get(0)
              val ids = scala.collection.mutable.ArrayBuffer[Any]()
              val vecs = scala.collection.mutable.ArrayBuffer[Array[Float]]()
              while (buf.hasNext && java.util.Objects.equals(buf.head.get(0), blockVal)) {
                val r = buf.next()
                ids += r.get(1)
                vecs += (if (r.isNullAt(2)) null else r.getSeq[Float](2).toArray)
              }
              if (ids.length > maxBucketSize)
                throw new BucketTooLargeException("cosinePairs", ids.length, maxBucketSize)
              // Pairs stream lazily out of the (i, j) triangle — the block's
              // heap cost stays O(|block|) membership, not O(|block|^2) rows.
              pending = lazyPairs(ids.length, (i, j) => {
                val va = vecs(i); val vb = vecs(j)
                if (va == null || vb == null) None
                else {
                  var dot = 0.0; var na = 0.0; var nb = 0.0
                  val n = math.min(va.length, vb.length)
                  var k = 0
                  while (k < n) {
                    val x = va(k).toDouble; val y = vb(k).toDouble
                    dot += x * y; na += x * x; nb += y * y
                    k += 1
                  }
                  val denom = math.sqrt(na) * math.sqrt(nb)
                  if (denom != 0.0 && dot / denom >= minCosine)
                    Some(Row(blockVal, ids(i), ids(j), dot / denom))
                  else None
                }
              })
            }
          }
          override def hasNext: Boolean = { loadNextBlock(); pending.hasNext }
          override def next(): Row = { loadNextBlock(); pending.next() }
        }
      }(enc)
  }

  /** CORPUS-level n-gram overlap between two corpora — the one-number
    * contamination screen run BEFORE any pairwise dedup ("how much of this
    * crawl is already in the training set?"). Exact: distinct shingle sets
    * per corpus, one equi-join. Output (1 row): set sizes, intersection,
    * Jaccard, and containment of A in B's direction
    * (`n_intersect / n_a` — the asymmetric number a crawl-vs-trainset
    * screen actually wants).
    *
    * Scale shape: each corpus is shingled once (explode -> distinct is a
    * map-side-combined aggregate whose exchange is REUSED by its size
    * count); the join is distinct-gram-sized. At 100 TB the distinct-gram
    * space itself is the cost — that regime uses [[corpusOverlapSketch]],
    * the bottom-k (KMV) estimator whose state is k hashes per corpus.
    */
  def corpusOverlap(a: DataFrame, b: DataFrame, textCol: String,
                    n: Int = 3): DataFrame = {
    def grams(df: DataFrame): DataFrame =
      Partitioning.ensureParallelism(df)
        .select(explode(shingles(col(textCol), n)).as("__g")).distinct()
    val ga = grams(a)
    val gb = grams(b)
    val na = ga.agg(count(lit(1)).as("__na"))
    val nb = gb.agg(count(lit(1)).as("__nb"))
    val inter = ga.join(gb, "__g").agg(count(lit(1)).as("__i"))
    val union = col("__na") + col("__nb") - col("__i")
    na.crossJoin(nb).crossJoin(inter).select(
      col("__na").as("n_a"), col("__nb").as("n_b"), col("__i").as("n_intersect"),
      when(union === 0, lit(0.0))
        .otherwise(round(col("__i").cast("double") / union, 6)).as("jaccard"),
      when(col("__na") === 0, lit(0.0))
        .otherwise(round(col("__i").cast("double") / col("__na"), 6)).as("containment_a"))
  }

  /** Bottom-k (KMV) sketch estimate of [[corpusOverlap]]'s Jaccard: per
    * corpus keep the k smallest `xxhash64` values over its distinct
    * shingles (a `TakeOrderedAndProject` — per-partition top-k then a
    * k-row merge, never a full sort); the estimator is
    * `|bottomK(A u B) ∩ A_k ∩ B_k| / k` (Bar-Yossef et al. 2002). State is
    * k longs per corpus regardless of corpus size; error ~ 1/sqrt(k).
    */
  def corpusOverlapSketch(a: DataFrame, b: DataFrame, textCol: String,
                          n: Int = 3, k: Int = 1024): DataFrame = {
    require(k > 0, "k must be positive")
    def sketch(df: DataFrame): DataFrame =
      Partitioning.ensureParallelism(df)
        .select(explode(shingles(col(textCol), n)).as("__g")).distinct()
        .select(xxhash64(col("__g")).as("__h"))
        .orderBy(col("__h")).limit(k)
    val sa = sketch(a)
    val sb = sketch(b)
    val unionK = sa.union(sb).distinct().orderBy(col("__h")).limit(k)
    val inBoth = unionK.join(sa, "__h").join(sb, "__h")
      .agg(count(lit(1)).as("__m"))
    val kk = unionK.agg(count(lit(1)).as("__k")) // < k only for tiny corpora
    inBoth.crossJoin(kk).select(
      col("__m").as("n_matched"), col("__k").as("sketch_size"),
      when(col("__k") === 0, lit(0.0))
        .otherwise(round(col("__m").cast("double") / col("__k"), 6))
        .as("jaccard_est"))
  }

  // -------------------------------------------------------------------------
  // LSH parameter planning
  // -------------------------------------------------------------------------

  /** Tuning report for the MinHash-LSH banding scheme: for each way to split
    * a `numPerms`-permutation signature into b bands of r rows (b·r =
    * numPerms), the S-curve characteristics of the candidate filter
    * (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets §3.4.2 — the
    * same analysis datasketch's `MinHashLSH` runs to pick its params):
    *
    *  - `s50` = (1/b)^(1/r), the Jaccard similarity with 50% collision odds
    *    (the threshold the band split effectively filters at);
    *  - `p_at_05/07/08/09` = 1 − (1 − s^r)^b, the probability a pair at
    *    Jaccard s shares at least one band bucket;
    *  - `recommended` = the split whose s50 lands closest to
    *    `targetJaccard` (ties to fewer bands = cheaper shuffle).
    *
    * Feed the winning (b, r) to [[minhashLshPairs]] as
    * `numHashes = numPerms, bandSize = r`. Driver-side planning math — the
    * frame is |divisors(numPerms)| rows regardless of corpus size.
    */
  def lshPlan(spark: org.apache.spark.sql.SparkSession, numPerms: Int = 128,
              targetJaccard: Double = 0.8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    require(numPerms >= 1, s"numPerms must be >= 1, got $numPerms")
    require(targetJaccard > 0.0 && targetJaccard < 1.0,
      s"targetJaccard must be in (0,1), got $targetJaccard")
    val splits = (1 to numPerms).filter(numPerms % _ == 0)
      .map(b => (b.toLong, (numPerms / b).toLong))
    val d = splits.toDF("bands", "rows_per_band")
    def pAt(s: Double): Column =
      round(lit(1.0) - pow(lit(1.0) - pow(lit(s), col("rows_per_band")),
        col("bands")), 6) + lit(0.0)
    val curved = d.select(col("bands"), col("rows_per_band"),
      (round(pow(lit(1.0) / col("bands"), lit(1.0) / col("rows_per_band")), 6)
        + lit(0.0)).as("s50"),
      pAt(0.5).as("p_at_05"), pAt(0.7).as("p_at_07"),
      pAt(0.8).as("p_at_08"), pAt(0.9).as("p_at_09"))
    // Tiny global window (one row per divisor) — argmin of |s50 - target|
    // over the ROUNDED s50 so the pick is engine-stable.
    val w = Window.orderBy(round(abs(col("s50") - lit(targetJaccard)), 6),
      col("bands"))
    curved
      .withColumn("recommended", row_number().over(w) === 1)
  }

  /** Byte-level near-duplicate pairs via content-defined chunk
    * fingerprints — the CDC payoff ([[Chunkers.contentDefined]] scaladoc):
    * because chunk boundaries re-synchronize around edits, two documents
    * that share long byte runs share exact chunk fingerprints even when
    * insertions have shifted every fixed offset. Pairs are scored by
    * CONTAINMENT `shared / min(|A|, |B|)` over distinct chunk
    * fingerprints — the doc-inside-doc signal Jaccard dilutes when sizes
    * differ (a quote of half a small doc inside a huge one has high
    * containment, tiny Jaccard).
    *
    * Boilerplate guard: a chunk fingerprint occurring in more than
    * `maxDocsPerChunk` documents is template chrome, not identity, and is
    * dropped BEFORE pairing — the skew fence that keeps a shared footer
    * from generating |docs|² candidate pairs (the [[simhashPairs]]
    * mega-bucket discipline, here a silent semantic filter because
    * boilerplate genuinely is not duplication evidence).
    *
    * Scale shape: chunking is a narrow generator; fingerprint distinct +
    * frequency filter are partial-aggregating shuffles on the fingerprint
    * key; pair generation joins only within same-fingerprint buckets whose
    * size the guard bounds; per-doc sizes broadcast back. No all-pairs
    * stage anywhere.
    */
  def cdcContainment(df: DataFrame, textCol: String, idCol: String,
                     window: Int = 16, maskBits: Int = 6,
                     maxDocsPerChunk: Long = 50, minShared: Long = 2,
                     minContainment: Double = 0.5): DataFrame = {
    require(maxDocsPerChunk >= 2, "maxDocsPerChunk must be >= 2")
    require(minShared >= 1, "minShared must be >= 1")
    // The CDC expression costs O(window) per char; materialize the
    // (id, fingerprint) table ONCE so the frequency fence, the per-doc
    // sizes, and both sides of the pair join all read the checkpoint
    // instead of re-running the chunk pipeline (the Bm25 tf-table
    // discipline — the checkpoint is owned by this result's lineage).
    val chunks = Chunkers
      .contentDefined(df.select(col(idCol), col(textCol)), textCol, idCol,
        window, maskBits)
      .select(col(idCol).as("__id"), md5(col("chunk")).as("__fp"))
      .distinct()
      .localCheckpoint()
    val keep = chunks.groupBy(col("__fp"))
      .agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") <= maxDocsPerChunk)
      .select(col("__fp"))
    // (no second checkpoint: the semi-join re-derives cheaply from the
    // materialized chunk table on each of its three consumers)
    val filtered = chunks.join(keep, Seq("__fp"), "left_semi")
    val sizes = filtered.groupBy(col("__id")).agg(count(lit(1)).as("__nfp"))
    val pairs = filtered.as("a")
      .join(filtered.as("b"),
        col("a.__fp") === col("b.__fp") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
    pairs
      .join(sizes.select(col("__id").as("id_a"), col("__nfp").as("nfp_a")),
        Seq("id_a"))
      .join(sizes.select(col("__id").as("id_b"), col("__nfp").as("nfp_b")),
        Seq("id_b"))
      .withColumn("containment",
        round(col("shared") / least(col("nfp_a"), col("nfp_b")), 6))
      .filter(col("containment") >= minContainment)
      .select(col("id_a"), col("id_b"), col("shared"), col("nfp_a"),
        col("nfp_b"), col("containment"))
  }

  /** EXACT set-similarity join by prefix filtering (PPJoin-family,
    * Chaudhuri/Xiao et al.) — the zero-false-negative complement to
    * [[minhashLshPairs]]: every pair with token-set Jaccard >= `tNum/tDen`
    * is GUARANTEED found (prefix-filter theorem: two sets meeting the
    * threshold must share a token in their first `|x| - ceil(t*|x|) + 1`
    * tokens under any fixed global order), where MinHash only finds them
    * with high probability. The right tool when the dedup decision is
    * contractual (compliance takedowns, exact-recall eval sets).
    *
    * The threshold is a RATIONAL `tNum/tDen`, so the prefix length
    * (`sz - (tNum*sz + tDen - 1) div tDen + 1` — exact integer ceil) and
    * the verify predicate (`inter * tDen >= union * tNum`) are pure
    * integer arithmetic: a float `ceil(0.8 * 25)` lands on 21 (0.8 has no
    * binary representation) and silently SHORTENS the prefix — a real
    * false-negative bug this formulation cannot have.
    *
    * Global token order is (document frequency ASC, token) — rare tokens
    * first, the standard choice that keeps prefixes selective. The rank
    * assignment is one row_number window over the VOCABULARY table
    * (vocab-sized single partition, the DSIR distinct-weights regime —
    * never corpus rows). Candidates explode only prefix tokens, pair up
    * inside per-token blocks, and are verified with one exact
    * `array_intersect`. Zero-token documents drop (Jaccard undefined).
    *
    * Returns `(id_a, id_b, n_inter, n_union, jaccard)` with `id_a < id_b`.
    */
  def prefixFilterJoin(df: DataFrame, textCol: String, idCol: String,
                       tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tDen >= tNum,
      s"need 0 < threshold = tNum/tDen <= 1, got $tNum/$tDen")
    val sets = df.select(col(idCol).as("__id"),
        array_distinct(TextAnalysis.toks(col(textCol))).as("__set"))
      .withColumn("__sz", size(col("__set")))
      .filter(col("__sz") > 0)
    val toksOf = sets.select(col("__id"), explode(col("__set")).as("__t"))
    val vocabRank = toksOf.groupBy(col("__t"))
      .agg(count(lit(1)).as("__df"))
      .withColumn("__rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("__df"), col("__t"))).cast("long"))
      .select(col("__t"), col("__rank"))
    val ranked = toksOf.join(vocabRank, Seq("__t"))
      .groupBy(col("__id"))
      .agg(array_sort(collect_list(col("__rank"))).as("__r"))
      .withColumn("__sz", size(col("__r")))
    // exact integer ceil(tNum*sz/tDen) via (a + b - 1) div b
    val plen = col("__sz") -
      ((col("__sz") * tNum + (tDen - 1)) / tDen).cast("int") + 1
    val prefix = ranked
      .select(col("__id"), explode(slice(col("__r"), lit(1), plen)).as("__p"))
    val cands = prefix.select(col("__p"), col("__id").as("id_a"))
      .join(prefix.select(col("__p"), col("__id").as("id_b")), Seq("__p"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val a = ranked.select(col("__id").as("id_a"), col("__r").as("__ra"),
      col("__sz").as("__sa"))
    val b = ranked.select(col("__id").as("id_b"), col("__r").as("__rb"),
      col("__sz").as("__sb"))
    cands.join(a, "id_a").join(b, "id_b")
      .withColumn("n_inter",
        size(array_intersect(col("__ra"), col("__rb"))).cast("long"))
      .withColumn("n_union",
        (col("__sa") + col("__sb")).cast("long") - col("n_inter"))
      .filter(col("n_inter") * tDen >= col("n_union") * tNum)
      .select(col("id_a"), col("id_b"), col("n_inter"), col("n_union"),
        round(col("n_inter").cast("double") / col("n_union"), 6)
          .as("jaccard"))
  }
}
