package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Okapi BM25 document scoring against a bag-of-words query — the lexical
  * retrieval ranking the reference's search path (SURVEY §2.6) would reach
  * for before/alongside vector top-k (`yamlpipe/core/evaluation.py` ranks by
  * embedding similarity only; BM25 is the standard lexical complement). Uses
  * the Lucene idf variant, `ln((N - df + 0.5) / (df + 0.5) + 1)`, which is
  * non-negative for any df <= N.
  *
  * Scale shape — the query term set is tiny and bounded, so everything
  * downstream of the corpus scan moves only query-matching rows:
  *   1. ONE corpus scan: doc length (narrow `size(tokens)`) is carried
  *      through the token explode, and the explode output is filtered to
  *      query terms BEFORE any shuffle — the (doc, term) aggregation
  *      shuffles matching tokens only, never the corpus vocabulary;
  *   2. per-term document frequencies aggregate over the (persisted,
  *      query-bounded) per-doc tf table and broadcast back onto it;
  *   3. corpus stats (N, average doc length) are a 1-row reduce-only
  *      aggregate, broadcast. This is the one extra pass over the text
  *      column; at cluster scale N/avgdl come from table statistics
  *      maintained at write time instead.
  * No UDFs — tokenization is the shared [[TextAnalysis.toks]] expression
  * chain, so the whole plan stays inside whole-stage codegen.
  */
object Bm25 {

  /** BM25 score per document for `queryTerms` (lowercased, de-duplicated;
    * term multiplicity in the query carries no weight, matching Lucene).
    * Output: one row per document containing at least one query term —
    * `(id, matched_terms, bm25)`. Documents matching nothing score zero and
    * are omitted; union them back if a dense score column is needed.
    */
  def score(df: DataFrame, textCol: String, idCol: String,
            queryTerms: Seq[String],
            k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "BM25 needs at least one query term")
    val q = queryTerms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    // 1-row (N, avgdl) — reduce-only, no shuffle wider than the partial aggs.
    // NULL text counts as length 0 in the average (size(null) is NULL and
    // avg would silently skip the row, shifting avgdl — and with it every
    // scored doc's length normalization — relative to a dense-count mirror).
    val stats = df.agg(
      count(lit(1)).as("__n_docs"),
      coalesce(avg(coalesce(size(TextAnalysis.toks(col(textCol))), lit(0))), lit(0.0))
        .as("__avgdl"))
    // The tf table is query-bounded (matching docs x |q| rows) — materialize
    // it once (eager localCheckpoint, MEMORY_AND_DISK blocks) so the
    // doc-frequency aggregate and the final join both read the blocks
    // instead of re-scanning and re-exploding the corpus. (A per-term
    // window count would also avoid the rescan but funnels every tf row of
    // a term through one task — groupBy keeps map-side partials, no skew
    // straggler.) Unlike a persist(), checkpoint blocks are OWNED by the
    // returned frame: the ContextCleaner frees them when the result is
    // garbage-collected, so a long-running app issuing many queries no
    // longer accumulates one cached table per query (r7 advice fix).
    val tf = tfFrame(df, textCol, idCol, q).localCheckpoint()
    scoreTail(tf, stats, idCol, k1, b)
  }

  /** The scoring tail shared by [[score]] and [[scoreMergedShards]]:
    * doc-frequency aggregate over the (already materialized) tf table,
    * Lucene idf/saturation, per-doc sum. Identical arithmetic regardless
    * of where tf/stats came from — which is exactly the mergeability
    * claim the incremental gate checks.
    */
  private def scoreTail(tf: DataFrame, stats: DataFrame, idCol: String,
                        k1: Double, b: Double): DataFrame = {
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log((col("__n_docs") - col("doc_freq") + lit(0.5)) /
          (col("doc_freq") + lit(0.5)) + lit(1.0)))
      .withColumn("__w",
        col("__idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("matched_terms"), round(sum(col("__w")), 6).as("bm25"))
  }

  /** BM25 over PRE-SHARDED corpora via mergeable statistics — the
    * incremental-indexing path: each shard contributes its query-bounded
    * tf table plus two integers (doc count, total doc length); the union
    * of tf tables and the SUM of the stat partials reconstruct the
    * global index state exactly, so scores are IDENTICAL to a one-shot
    * [[score]] over the concatenated corpus (the gate shares
    * `bm25_rank`'s oracle to prove it). This is why a production index
    * ingests deltas instead of rebuilding: tf rows append, (N, sum_dl,
    * df) add — nothing global recomputes.
    *
    * Shards must be doc-disjoint (the same contract as any index
    * ingest); overlapping ids would double-count silently.
    */
  def scoreMergedShards(shards: Seq[DataFrame], textCol: String,
                        idCol: String, queryTerms: Seq[String],
                        k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(shards.nonEmpty, "need at least one shard")
    require(queryTerms.nonEmpty, "BM25 needs at least one query term")
    val q = queryTerms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    val partials = shards.map(s => s.agg(
        count(lit(1)).as("__n"),
        coalesce(sum(coalesce(size(TextAnalysis.toks(col(textCol))), lit(0))
          .cast("long")), lit(0L)).as("__sdl")))
      .reduce(_ unionByName _)
    val stats = partials.agg(
      sum(col("__n")).as("__n_docs"),
      (sum(col("__sdl")).cast("double") / sum(col("__n"))).as("__avgdl"))
    val tf = shards.map(s => tfFrame(s, textCol, idCol, q))
      .reduce(_ unionByName _).localCheckpoint()
    scoreTail(tf, stats, idCol, k1, b)
  }

  /** The (id, doc length, term, tf) table for `q`, BEFORE materialization —
    * the query-term filter sits under the aggregation so only matching
    * term rows reach the shuffle (pinned by Bm25Spec on this frame, since
    * the checkpoint in [[score]] hides the plan).
    */
  private[graft] def tfFrame(df: DataFrame, textCol: String, idCol: String,
                             q: Seq[String]): DataFrame =
    df.select(col(idCol),
        size(TextAnalysis.toks(col(textCol))).as("__dl"),
        explode(TextAnalysis.toks(col(textCol))).as("term"))
      .filter(col("term").isin(q: _*))
      .groupBy(col(idCol), col("__dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Dirichlet-smoothed query-likelihood scoring (Zhai & Lafferty) — the
    * language-model retrieval baseline beside [[score]]'s BM25 and the
    * vector top-k: rank by `Σ_w ln P(w|d)` with
    * `P(w|d) = (tf + μ·P(w|C)) / (|d| + μ)`. Computed in the standard
    * rank-equivalent decomposition
    * `Σ_{w∈q∩d} ln(1 + tf / (μ·cf_w/|C|)) + |q|·ln(μ / (|d| + μ))`,
    * which needs the tf table only for MATCHING terms — the exact value of
    * the full sum, not an approximation. Query terms absent from the
    * collection are dropped (their contribution is a rank-irrelevant
    * constant). Output: one row per document matching at least one term —
    * `(id, matched_terms, ql_score)` (scores are negative log-likelihoods
    * shifted by the collection model; higher = better, as always).
    *
    * Scale shape identical to [[score]]: the query-bounded tf table is
    * checkpointed once and feeds the collection-frequency aggregate AND
    * the scoring join; collection token count is a 1-row reduce-only
    * aggregate. No extra corpus pass beyond BM25's.
    */
  def dirichletScore(df: DataFrame, textCol: String, idCol: String,
                     queryTerms: Seq[String], mu: Double = 2000.0): DataFrame = {
    require(queryTerms.nonEmpty, "query-likelihood needs at least one term")
    require(mu > 0, "mu must be positive")
    val q = queryTerms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    val stats = df.agg(
      sum(coalesce(size(TextAnalysis.toks(col(textCol))), lit(0)))
        .as("__ctoks"))
    val tf = tfFrame(df, textCol, idCol, q).localCheckpoint()
    val cf = tf.groupBy(col("term")).agg(sum(col("tf")).as("__cf"))
    val nEff = cf.agg(count(lit(1)).as("__nq"))
    tf.join(broadcast(cf), "term")
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(nEff))
      .withColumn("__w", log(lit(1.0) +
        col("tf") / (lit(mu) * col("__cf") / col("__ctoks"))))
      .groupBy(col(idCol), col("__dl"), col("__nq"))
      .agg(count(lit(1)).as("matched_terms"), sum(col("__w")).as("__ws"))
      .select(col(idCol), col("matched_terms"),
        round(col("__ws") +
          col("__nq") * log(lit(mu) / (col("__dl") + lit(mu))), 6)
          .as("ql_score"))
  }

  /** Top-`k` documents for the query (ties broken by id — deterministic).
    * Global top-k: Spark plans `TakeOrderedAndProject`, never a full sort.
    */
  def topK(df: DataFrame, textCol: String, idCol: String,
           queryTerms: Seq[String], k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame =
    score(df, textCol, idCol, queryTerms, k1, b)
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)

  /** Pseudo-relevance-feedback expansion terms (RM1 relevance model,
    * Lavrenko & Croft 2001 — the scoring half of RM3, before interpolation
    * back into the query): assume the BM25 top-`topDocs` documents are
    * relevant, estimate `P(w|R) = sum_d P(w|d) * P(d|R)` with `P(w|d) =
    * tf/|d|` and `P(d|R)` = the doc's share of the feedback set's BM25
    * mass, and emit the `topTerms` highest-weight terms outside the
    * original query — the terms a query expander appends.
    *
    * Scale shape: the feedback set is `topDocs` rows (broadcast join
    * against the corpus), so only those documents are re-tokenized —
    * explode runs over 10 docs, not the corpus; the BM25 mass is an exact
    * decimal 1-row broadcast. Per-term weights sum 9-dp-rounded decimal
    * contributions (order-independent), then round to 6 dp IN DECIMAL
    * before the double cast — float-sum and round-boundary drift can't
    * split the engines. Output: `(term, df_top, weight)`, top terms by
    * (weight desc, term).
    */
  def prfExpansionTerms(df: DataFrame, textCol: String, idCol: String,
                        queryTerms: Seq[String], topDocs: Int = 10,
                        topTerms: Int = 15,
                        k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(topDocs >= 1 && topTerms >= 1,
      s"topDocs and topTerms must be >= 1, got $topDocs/$topTerms")
    val q = queryTerms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    val top = topK(df, textCol, idCol, q, topDocs, k1, b)
      .select(col(idCol), col("bm25"))
    // Exact decimal total of the (6-dp) feedback-set scores: a float sum
    // over topDocs rows would be addition-order-dependent.
    val total = top.agg(
      sum(col("bm25").cast("decimal(18,6)")).cast("double").as("__total"))
    val contrib = df
      .select(col(idCol), TextAnalysis.toks(col(textCol)).as("__tk"))
      .join(broadcast(top), idCol)
      .crossJoin(broadcast(total))
      .select(col(idCol), col("bm25"), col("__total"),
        size(col("__tk")).as("__dl"), explode(col("__tk")).as("term"))
      .filter(!col("term").isin(q: _*))
      .groupBy(col(idCol), col("term"), col("bm25"), col("__total"), col("__dl"))
      .agg(count(lit(1)).as("__tf"))
      .select(col("term"),
        round(col("__tf").cast("double") / col("__dl") *
          (col("bm25") / col("__total")), 9)
          .cast("decimal(18,9)").as("__c"))
    contrib.groupBy(col("term"))
      .agg(count(lit(1)).cast("long").as("df_top"),
        round(sum(col("__c")), 6).cast("double").as("weight"))
      .orderBy(col("weight").desc, col("term"))
      .limit(topTerms)
  }

  /** Exact positional phrase search — the quoted-query complement of the
    * bag-of-words ranking above (BM25 scores `hash AND join` the same
    * whether adjacent or paragraphs apart; a quoted "hash join" must match
    * adjacency). Token positions are 1-based over the shared
    * [[TextAnalysis.toks]] contract.
    *
    * Pure narrow HOF per row — a window-compare over candidate start
    * indices, no positional inverted index to maintain. O(n_tokens *
    * phrase_len) per document, no shuffle, embarrassingly parallel: at
    * 100 TB this is a map-only scan that AQE never touches. Emits matching
    * docs only: `(idCol, n_matches, first_pos)`.
    */
  def phraseMatches(df: DataFrame, textCol: String, idCol: String,
                    phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    // Locale.ROOT: a default-locale lowercase diverges from Spark's
    // locale-independent lower() under e.g. the Turkish dotted/dotless I.
    val terms = phrase.map(_.toLowerCase(java.util.Locale.ROOT))
    // Cheap necessary pre-filter: a token equals `w` only if `w` occurs as
    // a substring of the lowercased text (toks is a space-split), so docs
    // missing any term skip tokenization entirely. On a 100 TB corpus the
    // selective substring scan is what keeps the O(n_tokens * phrase_len)
    // window-compare off the overwhelming majority of rows.
    val prefiltered = df.filter(
      terms.map(w => lower(col(textCol)).contains(w)).reduce(_ && _))
    val tk = TextAnalysis.toks(col(textCol))
    val n = size(tk)
    val len = terms.length
    val starts = when(n >= len, sequence(lit(1), n - lit(len) + 1))
      .otherwise(array().cast("array<int>"))
    val hits = filter(starts, i => terms.zipWithIndex.map { case (w, j) =>
      element_at(tk, (i + lit(j)).cast("int")) === lit(w)
    }.reduce(_ && _))
    prefiltered.select(col(idCol),
        size(hits).cast("long").as("n_matches"),
        // try_: ANSI element_at throws on the zero-hit rows this very
        // frame filters away a line later (evaluation order isn't ours).
        try_element_at(hits, lit(1)).cast("long").as("first_pos"))
      .filter(col("n_matches") > 0)
  }
}
