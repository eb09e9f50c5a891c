package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus n-gram language-model scoring — the CCNet-style quality signal:
  * train token frequencies on a corpus, score each document by its mean
  * token log-probability (and perplexity = exp(-mean)). Documents whose
  * token distribution diverges from the corpus (gibberish, boilerplate,
  * wrong language) score low; fluent in-distribution text scores high.
  *
  * Reference scope: the reference has no LM scorer (its quality gates are
  * per-row heuristics, cf. [[TextAnalysis.qualityScore]]); this is one of
  * the mandated training-data-pipeline extensions.
  *
  * Unigram model with add-k smoothing:
  * `lp(t) = ln((cf(t) + k) / (T + k*V))` with `cf` the corpus frequency,
  * `T` total tokens, `V` vocabulary size; unseen terms (cross-corpus
  * scoring) get `cf = 0`.
  *
  * Scale shape (mirrors [[TfIdf.score]], all aggregates map-side combined):
  *   1. explode tokens -> groupBy(doc, term): one shuffle on (doc, term);
  *   2. corpus frequencies: groupBy(term) OVER THE SAME (doc, term)
  *      subtree — ReusedExchange executes the scan+explode once;
  *   3. frequency join back on term: vocabulary-sized build side, AQE
  *      broadcasts when it fits;
  *   4. per-doc score: a weighted mean (sum(tf*lp)/sum(tf)) — one doc-key
  *      shuffle, algebraically the per-token mean without re-exploding.
  * Totals (T, V) are a 1-row aggregate, broadcast. No collect, no UDF.
  */
object LangModel {

  /** Corpus unigram frequencies `(term, cf)` — the trainable model half,
    * reusable against other corpora via [[scoreAgainst]].
    */
  def unigramCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.toks(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cf"))

  /** Train on `df` and score the same corpus (self-perplexity — the usual
    * in-pipeline quality pass). Output: `(id, n_toks, avg_logprob,
    * perplexity)`, rounded to 6 decimals; token-less documents are absent.
    */
  def unigramScore(df: DataFrame, textCol: String, idCol: String,
                   addK: Double = 0.5): DataFrame = {
    require(addK >= 0, "addK must be non-negative")
    val terms = df.select(col(idCol),
      explode(TextAnalysis.toks(col(textCol))).as("__term"))
    val tf = terms.groupBy(col(idCol), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    // Consumes __tf (not a pruned distinct-term subtree) so both join
    // sides share the identical exchange — same trick as TfIdf.score.
    val cf = tf.groupBy(col("__term")).agg(sum(col("__tf")).as("__cf"))
    scoreTf(tf, cf, idCol, addK, seenOnly = true)
  }

  /** Score `df` against a PRE-TRAINED frequency table (cross-corpus: e.g.
    * score fresh crawl against a trusted reference corpus). Terms absent
    * from the model smooth to `cf = 0`.
    */
  def scoreAgainst(df: DataFrame, textCol: String, idCol: String,
                   counts: DataFrame, addK: Double = 0.5): DataFrame = {
    require(addK > 0, "cross-corpus scoring needs addK > 0 (unseen terms)")
    val tf = df.select(col(idCol),
        explode(TextAnalysis.toks(col(textCol))).as("__term"))
      .groupBy(col(idCol), col("__term")).agg(count(lit(1)).as("__tf"))
    val cf = counts.select(col("term").as("__term"), col("cf").as("__cf"))
    scoreTf(tf, cf, idCol, addK, seenOnly = false)
  }

  /** Bigram conditional scoring: mean `ln P(w2 | w1)` over a document's
    * token bigrams, with add-k smoothing against continuation-context
    * counts (`c1(w) = #bigrams starting with w`, `V` = distinct
    * continuation types — self-normalizing: probabilities per context sum
    * to 1 at k=0). The repetition-sensitive LM signal: boilerplate has
    * hyper-predictable bigrams (score high), shuffled/gibberish text has
    * unseen ones (score low) even when unigram frequencies match.
    *
    * Scale shape: bigrams build NARROW (zip_with over adjacent slices —
    * no per-doc window shuffle); one (doc, w1, w2) aggregate; the
    * frequency, context, and vocabulary sides all consume that same
    * subtree (ReusedExchange — one corpus scan); joins are
    * bigram-vocabulary-sized. Documents under 2 tokens are absent.
    */
  def bigramScore(df: DataFrame, textCol: String, idCol: String,
                  addK: Double = 0.5): DataFrame = {
    require(addK >= 0, "addK must be non-negative")
    val tk = TextAnalysis.toks(col(textCol))
    val n = size(tk)
    val pairs = zip_with(
      slice(tk, lit(1), greatest(n - 1, lit(0))),
      slice(tk, lit(2), greatest(n - 1, lit(0))),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val tf2 = df.select(col(idCol), explode(pairs).as("__p"))
      .select(col(idCol), col("__p.w1").as("__w1"), col("__p.w2").as("__w2"))
      .groupBy(col(idCol), col("__w1"), col("__w2"))
      .agg(count(lit(1)).as("__tf"))
    val cf2 = tf2.groupBy(col("__w1"), col("__w2")).agg(sum(col("__tf")).as("__c2"))
    val c1 = tf2.groupBy(col("__w1")).agg(sum(col("__tf")).as("__c1"))
    val vv = tf2.agg(countDistinct(col("__w2")).as("__v"))
    tf2.join(cf2, Seq("__w1", "__w2")).join(c1, Seq("__w1"))
      .crossJoin(broadcast(vv))
      .select(col(idCol), col("__tf"),
        (col("__tf") * log((col("__c2") + addK) /
          (col("__c1") + col("__v") * addK))).as("__wlp"))
      .groupBy(col(idCol))
      .agg(sum(col("__tf")).cast("long").as("n_bigrams"),
        (sum(col("__wlp")) / sum(col("__tf"))).as("__avg"))
      .select(col(idCol), col("n_bigrams"),
        round(col("__avg"), 6).as("avg_logprob"),
        round(exp(-col("__avg")), 6).as("perplexity"))
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; the
    * smoothing the real CCNet-style perplexity filters use, where add-k
    * systematically over-penalizes rare-but-fluent continuations):
    * {{{
    *   P(w2|w1) = (max(c2(w1,w2) - D, 0) + D * N1+(w1,*) * Pcont(w2)) / c1(w1)
    *   Pcont(w2) = N1+(*,w2) / B
    * }}}
    * with `c2` the bigram count, `c1(w1) = sum_w2 c2`, `N1+(w1,*)` the
    * distinct continuations of `w1`, `N1+(*,w2)` the distinct left
    * contexts of `w2`, `B` the number of distinct bigram TYPES, and fixed
    * discount `D in (0,1)`. Self-scoring keeps every probability positive
    * (`c2 >= 1 > D`). Output matches [[bigramScore]]'s shape:
    * `(id, n_bigrams, avg_logprob, perplexity)`, 6-dp rounded.
    *
    * Scale shape: the (doc,w1,w2) aggregate is localCheckpointed ONCE (the
    * [[Bm25]] tf-table pattern) and the four model aggregates plus the
    * scoring join all read the checkpoint — the corpus is scanned exactly
    * once. Plain ReusedExchange does NOT survive here: each model table
    * prunes different columns from the shared subtree, so Catalyst
    * specializes four non-identical copies (measured: 4 corpus explodes
    * without the checkpoint). Join sides are bigram-vocabulary sized; the
    * type total is a 1-row broadcast. Storage is executor-local and
    * GC-reclaimed.
    */
  def kneserNeyBigramScore(df: DataFrame, textCol: String, idCol: String,
                           discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, "KN discount must be in (0,1)")
    val tk = TextAnalysis.toks(col(textCol))
    val n = size(tk)
    val pairs = zip_with(
      slice(tk, lit(1), greatest(n - 1, lit(0))),
      slice(tk, lit(2), greatest(n - 1, lit(0))),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val tf2 = df.select(col(idCol), explode(pairs).as("__p"))
      .select(col(idCol), col("__p.w1").as("__w1"), col("__p.w2").as("__w2"))
      .groupBy(col(idCol), col("__w1"), col("__w2"))
      .agg(count(lit(1)).as("__tf"))
      .localCheckpoint(true)
    // Model tables all derive from cf2; cf2 row-count per key IS the
    // distinct-continuation count (N1+).
    val cf2 = tf2.groupBy(col("__w1"), col("__w2")).agg(sum(col("__tf")).as("__c2"))
    val c1 = cf2.groupBy(col("__w1"))
      .agg(sum(col("__c2")).as("__c1"), count(lit(1)).as("__n1f"))
    val cont = cf2.groupBy(col("__w2")).agg(count(lit(1)).as("__n1b"))
    val bt = cf2.agg(count(lit(1)).as("__b"))
    val d = lit(discount)
    tf2.join(cf2, Seq("__w1", "__w2")).join(c1, Seq("__w1"))
      .join(cont, Seq("__w2"))
      .crossJoin(broadcast(bt))
      .select(col(idCol), col("__tf"),
        (col("__tf") * log(
          (greatest(col("__c2") - d, lit(0.0)) +
            d * col("__n1f") * (col("__n1b") / col("__b"))) / col("__c1")))
          .as("__wlp"))
      .groupBy(col(idCol))
      .agg(sum(col("__tf")).cast("long").as("n_bigrams"),
        (sum(col("__wlp")) / sum(col("__tf"))).as("__avg"))
      .select(col(idCol), col("n_bigrams"),
        round(col("__avg"), 6).as("avg_logprob"),
        round(exp(-col("__avg")), 6).as("perplexity"))
  }

  /** Top-k collocations by pointwise mutual information over corpus
    * bigrams: `pmi(w1,w2) = ln(c2 * N / (c1l * c1r))` with `c2` the bigram
    * count, `c1l`/`c1r` the left/right marginal totals, and `N` the total
    * bigram count — the standard collocation/phrase-mining signal
    * (Church & Hanks 1990). `minCount` suppresses the low-frequency PMI
    * explosion (a hapax pair maxes the score by definition). Output:
    * `(w1, w2, pair_count, pmi)`, top `k` by (rounded pmi desc, w1, w2) —
    * a deterministic total order.
    *
    * Scale shape: everything reduces to bigram-vocabulary-sized count
    * tables before any join (the [[bigramScore]] family); the global top-k
    * is `orderBy.limit` = TakeOrderedAndProject (per-partition top-k, one
    * driver merge, never a global sort).
    */
  def collocations(df: DataFrame, textCol: String, k: Int = 50,
                   minCount: Long = 5L): DataFrame = {
    require(k > 0 && minCount >= 1, "k and minCount must be positive")
    val tk = TextAnalysis.toks(col(textCol))
    val n = size(tk)
    val pairs = zip_with(
      slice(tk, lit(1), greatest(n - 1, lit(0))),
      slice(tk, lit(2), greatest(n - 1, lit(0))),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val cf2 = df.select(explode(pairs).as("__p"))
      .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__c2"))
    val cl = cf2.groupBy(col("w1")).agg(sum(col("__c2")).as("__cl"))
    val cr = cf2.groupBy(col("w2")).agg(sum(col("__c2")).as("__cr"))
    val tot = cf2.agg(sum(col("__c2")).as("__n"))
    cf2.filter(col("__c2") >= minCount)
      .join(cl, "w1").join(cr, "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("__c2").as("pair_count"),
        round(log((col("__c2").cast("double") * col("__n")) /
          (col("__cl").cast("double") * col("__cr"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Skip-window co-occurrence PMI (the word2vec/GloVe context statistic):
    * unordered token pairs within `window` positions of each other inside
    * a document, scored
    * `pmi = ln( (n_ab/T) / ((n_a/N)(n_b/N)) )` with pair total `T` and
    * token totals `N` — where [[collocations]] sees only ADJACENT bigrams
    * (phrases), the windowed statistic sees the loose association
    * embedding training actually consumes. Pairs normalize to
    * `w1 <= w2`; `minCount` fences the hapax-PMI explosion.
    *
    * Output `(w1, w2, pair_count, pmi)`, bounded by the vocabulary
    * square. The PMI argument is one fixed-shape double product chain of
    * exact integers — identical on any engine.
    *
    * Scale shape: positions explode once; the pair join is per-document
    * on the id key with a position-band predicate (each token joins to at
    * most `window` successors); counts collapse map-side. No corpus-wide
    * quadratic anywhere.
    */
  def windowedCooccurrence(df: DataFrame, textCol: String, idCol: String,
                           window: Int = 2, minCount: Long = 5L): DataFrame = {
    require(window >= 1 && minCount >= 1, "window and minCount must be >= 1")
    val pos = df.select(col(idCol).as("__id"),
      posexplode(TextAnalysis.toks(col(textCol))).as(Seq("__pos", "__w")))
    val l = pos.select(col("__id"), col("__pos").as("__p1"),
      col("__w").as("__w1"))
    val r = pos.select(col("__id"), col("__pos").as("__p2"),
      col("__w").as("__w2"))
    val pairs = l.join(r, Seq("__id"))
      .filter(col("__p2") - col("__p1") >= 1 &&
        col("__p2") - col("__p1") <= window)
      .select(least(col("__w1"), col("__w2")).as("w1"),
        greatest(col("__w1"), col("__w2")).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("pair_count"))
    val occ = pos.groupBy(col("__w")).agg(count(lit(1)).as("__nw"))
    val nTotal = pos.agg(count(lit(1)).as("__n"))
    val tTotal = pairs.agg(sum(col("pair_count")).as("__t"))
    pairs.filter(col("pair_count") >= minCount)
      .join(broadcast(occ.select(col("__w").as("w1"), col("__nw").as("__na"))),
        Seq("w1"))
      .join(broadcast(occ.select(col("__w").as("w2"), col("__nw").as("__nb"))),
        Seq("w2"))
      .crossJoin(broadcast(nTotal)).crossJoin(broadcast(tTotal))
      .select(col("w1"), col("w2"), col("pair_count"),
        round(log(col("pair_count").cast("double") * col("__n") * col("__n") /
          (col("__t").cast("double") * col("__na") * col("__nb"))), 6)
          .as("pmi"))
  }

  /** word2vec negative-sampling distribution (Mikolov et al. 2013's
    * `count^(3/4)` flattening): the draw probabilities a skip-gram trainer
    * samples negatives from — raw frequency under-samples the long tail,
    * uniform over-samples it, the 3/4 power is the empirical sweet spot.
    * Output per token: `(token, n, p_raw, p_neg)`.
    *
    * Determinism: each `n^0.75` rounds to 6 dp FIRST, the normalizer sums
    * those exact 1e-6 multiples as DECIMAL (order-independent), and each
    * probability is one division of deterministic doubles.
    */
  def negativeSamplingDist(df: DataFrame, textCol: String): DataFrame = {
    val occ = df.select(explode(TextAnalysis.toks(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .withColumn("__pw", round(pow(col("n").cast("double"), 0.75), 6))
    val tot = occ.agg(sum(col("n")).as("__nt"),
      sum(col("__pw").cast("decimal(24,6)")).cast("double").as("__z"))
    occ.crossJoin(broadcast(tot))
      .select(col("token"), col("n"),
        round(col("n").cast("double") / col("__nt"), 6).as("p_raw"),
        round(col("__pw") / col("__z"), 6).as("p_neg"))
  }

  /** CCNet's final step (Wenzek et al. 2020 §4.3): bucket documents into
    * per-language perplexity bands — head (most fluent third), middle,
    * tail — because BOTH extremes are suspect at web scale (head skews to
    * repetitive template prose, tail to gibberish; CCNet trains on middle).
    * Emits every doc with its band so downstream chooses the policy;
    * `keep_middle` pre-computes the CCNet default.
    *
    * Banding is exact `ntile(n)` over (rounded perplexity, id) within each
    * language — deterministic and oracle-replayable. At true web scale the
    * per-language sort becomes the bottleneck; the scale path is sampled
    * threshold estimation (CCNet itself uses thresholds from a sample)
    * joined as literals — same output contract, approximate cutpoints.
    */
  def perplexityBands(scored: DataFrame, idCol: String, langCol: String,
                      pplCol: String = "perplexity", nBands: Int = 3): DataFrame = {
    require(nBands >= 2, s"nBands must be >= 2, got $nBands")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol)).orderBy(col(pplCol), col(idCol))
    val banded = scored.withColumn("band", ntile(nBands).over(w))
    val label =
      if (nBands == 3)
        when(col("band") === 1, lit("head"))
          .when(col("band") === 2, lit("middle"))
          .otherwise(lit("tail"))
      else concat(lit("b"), col("band"))
    banded.withColumn("band_label", label)
      .withColumn("keep_middle", col("band") === ((nBands + 1) / 2))
  }

  private def scoreTf(tf: DataFrame, cf: DataFrame, idCol: String,
                      addK: Double, seenOnly: Boolean): DataFrame = {
    val tot = cf.agg(sum(col("__cf")).as("__t"), count(lit(1)).as("__v"))
    val joined =
      if (seenOnly) tf.join(cf, "__term")
      else tf.join(cf, Seq("__term"), "left")
        .withColumn("__cf", coalesce(col("__cf"), lit(0L)))
    joined.crossJoin(broadcast(tot))
      .select(col(idCol), col("__tf"),
        (col("__tf") * log((col("__cf") + addK) /
          (col("__t") + col("__v") * addK))).as("__wlp"))
      .groupBy(col(idCol))
      .agg(sum(col("__tf")).cast("long").as("n_toks"),
        (sum(col("__wlp")) / sum(col("__tf"))).as("__avg"))
      .select(col(idCol), col("n_toks"),
        round(col("__avg"), 6).as("avg_logprob"),
        round(exp(-col("__avg")), 6).as("perplexity"))
  }
}
