package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** The Σ-max score expression. Per query token, `array_max` skips null
    * cosines (zero-norm doc tokens), so a doc with SOME healthy tokens
    * still scores on those; but when a query token has NO non-null match
    * (empty doc matrix, or every doc token zero-norm) the best-match is
    * null and `acc + null` nulls the WHOLE pair score — the honest
    * outcome, since a partial sum would silently rank the pair as if that
    * query token contributed 0. [[topK]] then EXCLUDES null-scored pairs
    * from the ranking instead of letting them occupy rank slots.
    */
  private def maxSimScore(qTokCol: String, dTokCol: String): Column =
    aggregate(
      col(qTokCol), lit(0.0),
      (acc, qt) => acc + array_max(
        transform(col(dTokCol), dt => VectorFunctions.cosineSimilarity(qt, dt))))

  /** Per-query top-k over scored pairs: null scores drop (see
    * [[maxSimScore]]), rank 1-based, ties broken by candidate id
    * ascending.
    */
  private def topK(scored: DataFrame, qIdCol: String, dIdCol: String,
                   k: Int): DataFrame = {
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(col("score").desc, col(dIdCol).asc)
    scored
      .filter(col("score").isNotNull)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Score every (query, candidate) pair and keep the top `k` candidates
    * per query: `(qIdCol, dIdCol, score, rank)`. Score nulling and rank
    * semantics per [[maxSimScore]]/[[topK]] — a candidate with a
    * zero-norm or empty token matrix never appears in anyone's top-k.
    */
  def rerank(queries: DataFrame, qIdCol: String, qTokCol: String,
             docs: DataFrame, dIdCol: String, dTokCol: String,
             k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val scored = docs
      .crossJoin(broadcast(queries.select(col(qIdCol), col(qTokCol))))
      .select(col(qIdCol), col(dIdCol),
        maxSimScore(qTokCol, dTokCol).as("score"))
    topK(scored, qIdCol, dIdCol, k)
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
    topK(pairs.select(col(qIdCol), col(dIdCol),
      maxSimScore(qTokCol, dTokCol).as("score")), qIdCol, dIdCol, k)
  }

  /** Mean-pool a token matrix into one vector (the single-vector proxy a
    * first-stage retriever indexes): dimension-wise mean over the tokens,
    * left-to-right double accumulation — deterministic and
    * oracle-replayable. Null/empty matrices yield null.
    */
  def meanPool(tokens: Column): Column = {
    val n = size(tokens)
    when(tokens.isNull || n === 0, lit(null))
      .otherwise(transform(
        sequence(lit(1), size(element_at(tokens, 1))),
        i => aggregate(tokens, lit(0.0),
          (acc, t) => acc + element_at(t, i).cast("double")) / n.cast("double")))
  }

  /** Group per-vector rows into a token MATRIX per `idCol` group: the
    * first `n` vectors in `orderCol` order. The builder behind the gate
    * fixtures and [[graft.tools.MaxSimBench]] — one ObjectHashAggregate,
    * deterministic order via the sort inside the collected struct.
    */
  def tokenMatrix(df: DataFrame, idCol: Column, orderCol: String,
                  vecCol: String, n: Int): DataFrame = {
    require(n > 0, s"token count must be positive, got $n")
    df.groupBy(idCol.as("id"))
      .agg(slice(array_sort(collect_list(struct(col(orderCol), col(vecCol)))),
        1, n).as("__t"))
      .select(col("id"), transform(col("__t"), x => x(vecCol)).as("toks"))
  }
}
