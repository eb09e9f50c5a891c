package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): score
  * every raw-corpus document by how much more likely its n-gram features
  * are under a TARGET (trusted, in-domain) corpus model than under the raw
  * corpus's own model, then keep the top fraction. The published method
  * reweights web crawl toward Wikipedia/books-like text before training;
  * here both models are add-k-smoothed unigram+bigram feature counts over
  * the shared tokenizer contract ([[TextAnalysis.toks]]).
  *
  * Log importance weight of a document x with feature counts `tf(x, f)`:
  * {{{
  *   lw(x) = sum_f tf(x, f) * [ ln p_tgt(f) - ln p_raw(f) ]
  *   p_m(f) = (c_m(f) + k) / (T_m + k * V)
  * }}}
  * with `c_m` the model's feature count, `T_m` its total, and `V` the size
  * of the UNION vocabulary (so both models smooth over the same support;
  * features unseen by the target get `c_tgt = 0`, hence `k > 0`).
  *
  * Reference scope: the reference has no data-selection operator; this is
  * one of the mandated training-data-pipeline extensions.
  *
  * Scale shape (mirrors [[LangModel]] / [[TfIdf]]):
  *   1. feature build is NARROW (array concat of tokens and zip_with
  *      bigrams), one explode, one (doc, feature) aggregate;
  *   2. the raw model consumes that same aggregate subtree (ReusedExchange
  *      — the raw corpus is scanned once);
  *   3. the target model is its own scan (a different, usually far
  *      smaller corpus); both count tables are vocabulary-sized join
  *      sides, AQE broadcasts when they fit;
  *   4. totals are 1-row broadcasts; the per-doc weight is one doc-key
  *      aggregate. No collect, no UDF, no global sort anywhere — even
  *      top-fraction selection ([[selectTopFraction]]) runs its only
  *      single-partition window over the DISTINCT-weight table, not the
  *      corpus.
  *
  * The paper hashes features into a bounded bucket space to cap model
  * memory; `buckets > 0` reproduces that with `pmod(xxhash64(f), buckets)`
  * — the count tables shrink from vocabulary-sized to exactly `buckets`
  * rows (collisions merge counts, as published). `buckets = 0` keeps raw
  * string features (exact, SQL-replayable).
  */
object Dsir {

  /** Unigram+bigram feature array over a MATERIALIZED token-array column:
    * `u:tok` and `b:w1 w2`, prefixed so the two spaces can't collide.
    * Narrow.
    */
  private def featureArray(tk: Column): Column = {
    val n = size(tk)
    val unis = transform(tk, t => concat(lit("u:"), t))
    val bis = zip_with(
      slice(tk, lit(1), greatest(n - 1, lit(0))),
      slice(tk, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(lit("b:"), a, lit(" "), b))
    concat(unis, bis)
  }

  /** Exploded `(idCol, __f)` feature occurrences; `buckets > 0` maps each
    * feature to its hashed bucket id (string, `h:<bucket>`).
    *
    * The tokenizer runs in its own projection so the split+filter executes
    * ONCE per row — the feature expression references the token array six
    * times, and CollapseProject keeps a multiply-referenced non-trivial
    * alias out of the Generate instead of inlining six split() copies.
    */
  private[graft] def features(df: DataFrame, textCol: String, idCol: String,
                              buckets: Int): DataFrame = {
    val withTk = df.select(col(idCol),
      TextAnalysis.toks(col(textCol)).as("__tk"))
    val out = withTk.select(col(idCol),
      explode(featureArray(col("__tk"))).as("__f"))
    if (buckets <= 0) out
    else out.select(col(idCol),
      concat(lit("h:"), pmod(xxhash64(col("__f")), lit(buckets.toLong))
        .cast("string")).as("__f"))
  }

  /** Per-document log importance weights of `raw` under `target` vs `raw`.
    * Output: `(idCol, n_feats, log_weight)` — occurrence count and the
    * 6-dp-rounded log weight; feature-less (empty-text) documents are
    * absent, matching the LM scorers.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, textCol: String,
                        idCol: String, addK: Double = 0.5,
                        buckets: Int = 0): DataFrame =
    importanceWeightsAgainst(raw, targetModel(target, textCol, idCol, buckets),
      textCol, idCol, addK, buckets)

  /** The trainable half: target-corpus feature counts `(feature, cf)` — a
    * vocabulary-sized frame meant to be WRITTEN ONCE (parquet/table) and
    * re-used by [[importanceWeightsAgainst]] across crawl batches, the
    * same persisted-artifact posture as the cross-corpus dedup signature
    * tables. Train with the same `buckets` you will score with.
    */
  def targetModel(target: DataFrame, textCol: String, idCol: String,
                  buckets: Int = 0): DataFrame =
    features(target, textCol, idCol, buckets)
      .groupBy(col("__f")).agg(count(lit(1)).as("cf"))
      .select(col("__f").as("feature"), col("cf"))

  /** [[importanceWeights]] against a PRE-TRAINED `(feature, cf)` model
    * (incremental posture: yesterday's target model scores today's crawl
    * without re-reading the target corpus).
    */
  def importanceWeightsAgainst(raw: DataFrame, targetCounts: DataFrame,
                               textCol: String, idCol: String,
                               addK: Double = 0.5,
                               buckets: Int = 0): DataFrame = {
    require(addK > 0, "DSIR needs addK > 0 (target-unseen features)")
    val tf = features(Partitioning.ensureParallelism(raw), textCol, idCol, buckets)
      .groupBy(col(idCol), col("__f")).agg(count(lit(1)).as("__tf"))
    // Raw counts consume __tf so both sides share one exchange (one scan).
    val rawC = tf.groupBy(col("__f")).agg(sum(col("__tf")).as("__cr"))
    val tgtC = targetCounts.select(col("feature").as("__f"), col("cf").as("__ct"))
    // One vocabulary-sized frame carries both models; the totals (T_r, T_t,
    // V over the union support) aggregate THIS frame, not a re-explode of
    // either corpus — each corpus is feature-counted exactly once.
    val counts = rawC.join(tgtC, Seq("__f"), "full_outer")
    val tot = counts.agg(sum(col("__cr")).as("__tr"), sum(col("__ct")).as("__tt"),
      count(lit(1)).as("__v"))
    tf.join(counts, "__f")
      .crossJoin(broadcast(tot))
      .select(col(idCol), col("__tf"),
        (col("__tf") * (
          log((coalesce(col("__ct"), lit(0L)) + addK) / (coalesce(col("__tt"), lit(0L)) + col("__v") * addK)) -
          log((col("__cr") + addK) / (col("__tr") + col("__v") * addK)))).as("__w"))
      .groupBy(col(idCol))
      .agg(sum(col("__tf")).cast("long").as("n_feats"),
        round(sum(col("__w")), 6).as("log_weight"))
  }

  /** Mark the top `fraction` of rows by `(log_weight DESC, id ASC)` with
    * `selected = true` — the deterministic (Gumbel-free) DSIR keep set,
    * `ceil(fraction * n)` rows exactly.
    *
    * Scale shape: equivalent to a global `row_number() <= K` but WITHOUT
    * the global sort — the cumulative rank runs over the distinct-weight
    * table (weights are 6-dp-rounded, so it is at most corpus-sized and
    * in practice tiny), and only rows AT the cutoff weight pay a
    * per-weight-partition `row_number` for the tie-break. Rows strictly
    * above the cutoff are selected by a broadcast-joined comparison.
    */
  def selectTopFraction(weights: DataFrame, idCol: String,
                        fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    // The input is referenced three times (distribution, total, final
    // join); materialize it once via EAGER localCheckpoint — one row per
    // doc, 3 narrow columns. Eager matters: with a lazy checkpoint the
    // three consumer subtrees can race to compute the (usually expensive)
    // scoring plan before the persist lands, re-running it up to 3x
    // depending on stage scheduling — the r7 3.3->9.6 s dsir_weights
    // swing under an unchanged plan digest. Storage is executor-local
    // and GC-reclaimed (same pattern as Components' iteration frames).
    val wts = weights.localCheckpoint(true)
    val w = col("log_weight")
    val dist = wts.groupBy(w.as("__w")).agg(count(lit(1)).as("__n"))
    val tot = wts.agg(ceil(count(lit(1)) * fraction).cast("long").as("__k"))
    // Cumulative count of rows with weight STRICTLY above each distinct
    // weight; single-partition window, but over distinct weights only.
    val cum = dist.select(col("__w"),
      coalesce(sum(col("__n")).over(
        Window.orderBy(col("__w").desc).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)).as("__above"))
    val cut = cum.crossJoin(broadcast(tot))
      .filter(col("__above") < col("__k"))
      .agg(min(col("__w")).as("__cut"), max(col("__above")).as("__cut_above"),
        max(col("__k")).as("__k2"))
    val joined = wts.crossJoin(broadcast(cut))
    // Tie-break inside the cutoff weight group only: rank by id ASC.
    val tieRank = row_number().over(
      Window.partitionBy(w).orderBy(col(idCol).asc))
    joined.withColumn("selected",
        when(col("__cut").isNull, lit(false))
          .when(w > col("__cut"), lit(true))
          .when(w === col("__cut"),
            tieRank <= (col("__k2") - col("__cut_above")))
          .otherwise(lit(false)))
      .drop("__cut", "__cut_above", "__k2")
  }
}
