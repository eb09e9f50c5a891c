package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** ColBERT-style late-interaction reranking (Khattab & Zaharia 2020,
  * SIGIR — "ColBERT: Efficient and Effective Passage Search via
  * Contextualized Late Interaction"): a query and a document each carry a
  * token-embedding MATRIX (`array<array<float>>`), and the relevance score
  * is MaxSim — for every query token take the best-matching document token
  * by cosine, then sum:
  *
  *   score(q, d) = Σ_{t ∈ q} max_{u ∈ d} cos(t, u)
  *
  * Reference scope: the reference's searcher (yamlpipe/rag/searcher.py)
  * ranks by single-vector similarity; late interaction is the
  * training-pipeline extension tier above it (same family as
  * [[HybridSearch]]).
  *
  * Scale stance: the query set (a rerank pass sees tens-to-thousands of
  * queries, each a handful of tokens) BROADCASTS; the candidate corpus
  * streams through one narrow BroadcastNestedLoopJoin pass — no shuffle of
  * the big side, and the scoring expression is pure nested
  * higher-order-function arithmetic (aggregate over transform), entirely
  * codegen'd, no UDF. The only shuffle is the per-query top-k window over
  * the (queries × candidates) scored rows — the candidate set is the
  * OUTPUT of a first-stage retriever (IVF/LSH/BM25), already k-bounded per
  * query, so that shuffle is small by construction. Double arithmetic is
  * left-to-right over token order, so the score is deterministic and
  * oracle-replayable value-for-value.
  */
object MaxSim {

  /** Score every (query, candidate) pair and keep the top `k` candidates
    * per query: `(qIdCol, dIdCol, score, rank)`, rank 1-based, ties broken
    * by candidate id ascending. Zero-norm tokens follow
    * [[VectorFunctions.cosineSimilarity]]'s null discipline: a null best
    * match drops out of the sum via `array_max`'s null-skipping only when
    * other tokens matched; an all-null row nulls the score (surfacing the
    * broken input instead of faking a 0).
    */
  def rerank(queries: DataFrame, qIdCol: String, qTokCol: String,
             docs: DataFrame, dIdCol: String, dTokCol: String,
             k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val score = aggregate(
      col(qTokCol), lit(0.0),
      (acc, qt) => acc + array_max(
        transform(col(dTokCol), dt => VectorFunctions.cosineSimilarity(qt, dt))))
    val scored = docs
      .crossJoin(broadcast(queries.select(col(qIdCol), col(qTokCol))))
      .select(col(qIdCol), col(dIdCol), score.as("score"))
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(col("score").desc, col(dIdCol).asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Score an ALREADY-PAIRED candidate table — the deployment shape: a
    * first-stage retriever (single-vector ANN, BM25, IVF) emits
    * `(query, candidate)` pairs with both token matrices attached, and
    * MaxSim only pays for those pairs instead of the full cross product
    * (the PLAID/ColBERTv2 two-stage recipe). Same score arithmetic, same
    * per-query top-k and tie-break as [[rerank]].
    */
  def rerankPairs(pairs: DataFrame, qIdCol: String, qTokCol: String,
                  dIdCol: String, dTokCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val score = aggregate(
      col(qTokCol), lit(0.0),
      (acc, qt) => acc + array_max(
        transform(col(dTokCol), dt => VectorFunctions.cosineSimilarity(qt, dt))))
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(col("score").desc, col(dIdCol).asc)
    pairs
      .select(col(qIdCol), col(dIdCol), score.as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Mean-pool a token matrix into one vector (the single-vector proxy a
    * first-stage retriever indexes): dimension-wise mean over the tokens,
    * left-to-right double accumulation — deterministic and
    * oracle-replayable. Null/empty matrices yield null.
    */
  def meanPool(tokens: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val n = size(tokens)
    when(tokens.isNull || n === 0, lit(null))
      .otherwise(transform(
        sequence(lit(1), size(element_at(tokens, 1))),
        i => aggregate(tokens, lit(0.0),
          (acc, t) => acc + element_at(t, i).cast("double")) / n.cast("double")))
  }
}
