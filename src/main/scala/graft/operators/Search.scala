package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** The read path: vector top-k search and retrieval-evaluation aggregates —
  * the reference's `search(query, k)` / hit-rate eval
  * (`yamlpipe/core/evaluation.py:44-109`, `app.py:53-61`).
  *
  * Exact top-k is `ORDER BY distance LIMIT k`, which Catalyst plans as
  * `TakeOrderedAndProject` — a per-partition top-k + a k-row merge on the
  * driver, NOT a full sort: the right plan at any corpus size. Ties broken by
  * a caller-supplied id column so results are deterministic.
  */
object Search {

  /** Exact brute-force top-k by cosine similarity against a literal query
    * vector. `vecCol` is array<float>. Adds a `score` column (cosine, higher
    * is better).
    */
  def topKCosine(corpus: DataFrame, queryVec: Array[Float], k: Int,
                 vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val q = lit(queryVec)
    corpus
      .withColumn("score", graft.plans.CosineSimilarityExpr.cosine(col(vecCol), q))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Exact top-k by L2 distance (the reference sink's default metric). */
  def topKL2(corpus: DataFrame, queryVec: Array[Float], k: Int,
             vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val q = lit(queryVec.map(_.toDouble))
    corpus
      .withColumn("dist", l2Distance(col(vecCol), q))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }

  /** Set-oriented batch retrieval: top-k per query row via a join + window
    * rank — one distributed plan for the whole eval set (the reference loops
    * queries on the driver, `evaluation.py:83-95`).
    *
    * `queries` must carry (`qidCol`, `qvecCol`); `corpus` carries
    * (`idCol`, `vecCol`). This is the EXACT all-pairs baseline: both inputs
    * are guarded by [[Similarity.guardExactRegime]] (defaults ON at
    * [[Similarity.DefaultMaxExactRows]]) so a 100 TB corpus fails loudly
    * instead of silently planning O(|Q|·|N|). Past the cap, use
    * [[Similarity.blockedTopKPerQuery]] (LSH-banded candidates, same
    * re-rank tail). Note the guard evaluates each input twice (1-row count
    * + row stream) — cache/checkpoint expensive upstream lineage first.
    */
  def topKPerQuery(queries: DataFrame, corpus: DataFrame, k: Int,
                   qidCol: String = "qid", qvecCol: String = "qvec",
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   excludeSelf: Boolean = false,
                   maxExactRows: Long = Similarity.DefaultMaxExactRows): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = Similarity
      .guardExactRegime(queries, "topKPerQuery.queries", maxExactRows)
      .crossJoin(Similarity.guardExactRegime(corpus, "topKPerQuery.corpus",
        maxExactRows))
    val scored0 = joined.withColumn("score",
      graft.plans.CosineSimilarityExpr.cosine(col(vecCol), col(qvecCol)))
    val scored = if (excludeSelf) scored0.filter(col(qidCol) =!= col(idCol)) else scored0
    val w = Window.partitionBy(col(qidCol)).orderBy(col("score").desc, col(idCol))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Hard-negative mining for contrastive retrieval training (DPR-style,
    * Karpukhin et al. 2020; margin view after Artetxe & Schwenk 2019): for
    * each query, the top-k most similar corpus items OUTSIDE the query's
    * positive group — the near-misses a contrastive loss learns most from.
    * Output per negative: `rank`, 6-dp cosine `score`, and `margin` =
    * score minus the query's BEST positive score (near-zero or positive
    * margin = the hardest negatives; null when the corpus holds no positive
    * for the query). The query's own row is excluded from both sides.
    *
    * Scale shape: ONE pass over the scored pairs — best-positive is an
    * unordered window max and the negative rank an ordered `row_number`
    * over the same `qidCol` partitioning, so both resolve in a single
    * query-key shuffle. The cross join is the exact baseline (same as the
    * eval gates); at corpus scale swap candidate generation for
    * [[Similarity.blockedTopKPerQuery]] and keep the same exclusion +
    * margin tail.
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int,
                    qidCol: String = "qid", qvecCol: String = "qvec",
                    qGroupCol: String = "qgroup", idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    groupCol: String = "label",
                    maxExactRows: Long = Similarity.DefaultMaxExactRows): DataFrame =
    hardNegativesUnguarded(
      Similarity.guardExactRegime(queries, "hardNegatives.queries", maxExactRows),
      Similarity.guardExactRegime(corpus, "hardNegatives.corpus", maxExactRows),
      k, qidCol, qvecCol, qGroupCol, idCol, vecCol, groupCol)

  /** Guard-free exact hard-negatives kernel (router discipline — see
    * [[Similarity.fitsExactRegime]]).
    */
  private def hardNegativesUnguarded(queries: DataFrame, corpus: DataFrame,
      k: Int, qidCol: String, qvecCol: String, qGroupCol: String,
      idCol: String, vecCol: String, groupCol: String): DataFrame = {
    val scored = queries
      .crossJoin(corpus)
      .filter(col(qidCol) =!= col(idCol))
      .withColumn("score", round(
        graft.plans.CosineSimilarityExpr.cosine(col(vecCol), col(qvecCol)), 6))
    hardNegativesFromScored(scored, k, qidCol, qGroupCol, idCol, groupCol)
  }

  /** The SCALE regime of [[hardNegatives]]: candidates from
    * [[Similarity.bandedCandidatePairs]] instead of the cross join, then
    * the identical best-positive window + negative rank. Approximate in
    * candidate recall only — and note the margin baseline itself is
    * band-local: `__best_pos` is the best positive AMONG CANDIDATES, which
    * is the production behavior (a positive the index would never surface
    * is not a meaningful contrast baseline).
    */
  def hardNegativesBlocked(queries: DataFrame, corpus: DataFrame, k: Int,
                           qidCol: String = "qid", qvecCol: String = "qvec",
                           qGroupCol: String = "qgroup", idCol: String = "vec_id",
                           vecCol: String = "embedding",
                           groupCol: String = "label",
                           numPlanes: Int = 16, bandBits: Int = 2,
                           seed: Int = 42): DataFrame = {
    val q = queries.select(col(qidCol), col(qvecCol), col(qGroupCol))
    val c = corpus.select(col(idCol), col(vecCol), col(groupCol))
    val cand = Similarity.bandedCandidatePairs(q, c, qidCol, qvecCol,
        idCol, vecCol, numPlanes, bandBits, seed)
      .filter(col(qidCol) =!= col(idCol))
    val scored = cand.join(q, qidCol).join(c, idCol)
      .withColumn("score", round(
        graft.plans.CosineSimilarityExpr.cosine(col(vecCol), col(qvecCol)), 6))
    hardNegativesFromScored(scored, k, qidCol, qGroupCol, idCol, groupCol)
  }

  /** Best-positive window + negative-rank tail shared by the exact and
    * blocked hard-negative regimes.
    */
  private def hardNegativesFromScored(scored: DataFrame, k: Int,
                                      qidCol: String, qGroupCol: String,
                                      idCol: String,
                                      groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byQuery = Window.partitionBy(col(qidCol))
    val isPos = col(qGroupCol) === col(groupCol)
    scored
      .withColumn("__best_pos", max(when(isPos, col("score"))).over(byQuery))
      .filter(!isPos)
      .withColumn("rank", row_number().over(
        byQuery.orderBy(col("score").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("rank"), col("score"),
        round(col("score") - col("__best_pos"), 6).as("margin"))
  }

  /** Maximal-Marginal-Relevance re-ranking (Carbonell & Goldstein 1998) of
    * the top-`n` cosine candidates per query down to `k` diversified
    * results — the standard answer to a RAG result page full of near-copies
    * of one passage (the reference's `search(query, k)` returns raw top-k;
    * this is the diversity-aware tail a pipeline bolts on top).
    *
    * Greedy: the first pick is the most relevant candidate; each later pick
    * maximizes `lambda * rel - (1 - lambda) * maxSimToSelected`. Emits one
    * row per selected candidate: `(qid, id, mmr_rank, rel, mmr)`; `rel` is
    * 6-dp rounded, `mmr` 7-dp (−0.0 folded), ties broken by id. 7 dp for
    * the MMR value is load-bearing, not cosmetic: over 6-dp inputs,
    * `lambda*rel - (1-lambda)*maxSim` is an exact multiple of 1e-7, so
    * rounding it at 6 dp sits ON the half-up boundary where engines'
    * round implementations legitimately disagree; at 7 dp the value is
    * strictly interior and every engine lands on the same double.
    *
    * Scale shape: relevance + top-n candidate cut is the same
    * cross-join + `row_number` window as the eval gates (swap in
    * [[Similarity.blockedTopKPerQuery]] for candidate generation at corpus
    * scale); candidate-pair similarities are an n²-per-query self-join of
    * the ALREADY-CUT candidate frame (n ≤ ~tens, never the corpus); the
    * greedy selection runs inside one UDF per query over O(n²) pre-rounded
    * sims — bounded state, no driver loop, no iteration over the corpus.
    */
  def mmrRerank(queries: DataFrame, corpus: DataFrame, n: Int, k: Int,
                lambda: Double = 0.7,
                qidCol: String = "qid", qvecCol: String = "qv",
                idCol: String = "vec_id", vecCol: String = "embedding",
                maxExactRows: Long = Similarity.DefaultMaxExactRows): DataFrame = {
    require(n >= 1 && k >= 1, s"n and k must be >= 1, got n=$n k=$k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    mmrRerankUnguarded(
      Similarity.guardExactRegime(queries, "mmrRerank.queries", maxExactRows),
      Similarity.guardExactRegime(corpus, "mmrRerank.corpus", maxExactRows),
      n, k, lambda, qidCol, qvecCol, idCol, vecCol)
  }

  /** Guard-free exact MMR kernel (router discipline — see
    * [[Similarity.fitsExactRegime]]).
    */
  private def mmrRerankUnguarded(queries: DataFrame, corpus: DataFrame,
      n: Int, k: Int, lambda: Double, qidCol: String, qvecCol: String,
      idCol: String, vecCol: String): DataFrame = {
    val scored = queries
      .crossJoin(corpus)
      .filter(col(idCol) =!= col(qidCol))
      .withColumn("__rel", round(
        graft.plans.CosineSimilarityExpr.cosine(col(vecCol), col(qvecCol)), 6))
      .filter(col("__rel").isNotNull)
    mmrFromScored(scored, n, k, lambda, qidCol, idCol, vecCol)
  }

  /** The SCALE regime of [[mmrRerank]]: the relevance candidates come from
    * [[Similarity.bandedCandidatePairs]] (hyperplane-LSH band agreement)
    * instead of the query x corpus cross join; the top-n cut, candidate
    * pair similarities, and the greedy selection UDF are the identical
    * tail. Approximate only in candidate RECALL — the greedy selection
    * over whatever candidates survive is the same deterministic
    * arithmetic. Work scales with band collisions plus n² per query.
    */
  def mmrRerankBlocked(queries: DataFrame, corpus: DataFrame, n: Int, k: Int,
                       lambda: Double = 0.7,
                       qidCol: String = "qid", qvecCol: String = "qv",
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       numPlanes: Int = 16, bandBits: Int = 2,
                       seed: Int = 42): DataFrame = {
    require(n >= 1 && k >= 1, s"n and k must be >= 1, got n=$n k=$k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    val q = queries.select(col(qidCol), col(qvecCol))
    val c = corpus.select(col(idCol), col(vecCol))
    val cand = Similarity.bandedCandidatePairs(q, c, qidCol, qvecCol,
        idCol, vecCol, numPlanes, bandBits, seed)
      .filter(col(idCol) =!= col(qidCol))
    val scored = cand.join(q, qidCol).join(c, idCol)
      .withColumn("__rel", round(
        graft.plans.CosineSimilarityExpr.cosine(col(vecCol), col(qvecCol)), 6))
      .filter(col("__rel").isNotNull)
    mmrFromScored(scored, n, k, lambda, qidCol, idCol, vecCol)
  }

  /** Top-n cut + pairwise-sim + greedy-selection tail shared by the exact
    * and blocked MMR regimes: `scored` is one row per (query, candidate)
    * with 6-dp `__rel`.
    */
  private def mmrFromScored(scored: DataFrame, n: Int, k: Int, lambda: Double,
                            qidCol: String, idCol: String,
                            vecCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(qidCol)).orderBy(col("__rel").desc, col(idCol))
    val cand = scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .select(col(qidCol), col(idCol), col(vecCol), col("__rel"))
    val c1 = cand.select(col(qidCol), col(idCol).as("__a"), col(vecCol).as("__va"))
    val c2 = cand.select(col(qidCol).as("__qid2"), col(idCol).as("__b"),
      col(vecCol).as("__vb"))
    val pairs = c1.join(c2, c1(qidCol) === col("__qid2") && col("__a") < col("__b"))
      .select(col(qidCol), struct(
        col("__a").as("_1"), col("__b").as("_2"),
        round(graft.plans.CosineSimilarityExpr.cosine(col("__va"), col("__vb")), 6)
          .as("_3")).as("__p"))
      .groupBy(col(qidCol)).agg(collect_list(col("__p")).as("__pairs"))
    val cands = cand
      .select(col(qidCol), struct(col(idCol).as("_1"), col("__rel").as("_2")).as("__c"))
      .groupBy(col(qidCol)).agg(collect_list(col("__c")).as("__cands"))
    cands.join(pairs, Seq(qidCol), "left")
      .select(col(qidCol), explode(mmrSelectUdf(
        col("__cands"),
        coalesce(col("__pairs"), typedLit(Seq.empty[(Long, Long, Double)])),
        lit(k), lit(lambda))).as("__s"))
      .select(col(qidCol), col("__s._1").as(idCol),
        col("__s._2").as("mmr_rank"), col("__s._3").as("rel"),
        col("__s._4").as("mmr"))
  }

  /** Regime router for [[hardNegatives]]/[[hardNegativesBlocked]]: exact
    * all-pairs while both sides fit under `maxExactRows`, banded
    * candidates above it. Snapshot semantics per
    * [[Similarity.fitsExactRegime]] — counts run at call time, the exact
    * branch is guard-free.
    */
  def hardNegativesRouted(queries: DataFrame, corpus: DataFrame, k: Int,
                          qidCol: String = "qid", qvecCol: String = "qvec",
                          qGroupCol: String = "qgroup",
                          idCol: String = "vec_id",
                          vecCol: String = "embedding",
                          groupCol: String = "label",
                          numPlanes: Int = 16, bandBits: Int = 2,
                          seed: Int = 42,
                          maxExactRows: Long = Similarity.DefaultMaxExactRows): DataFrame =
    if (Similarity.fitsExactRegime(maxExactRows, queries, corpus))
      hardNegativesUnguarded(queries, corpus, k, qidCol, qvecCol, qGroupCol,
        idCol, vecCol, groupCol)
    else
      hardNegativesBlocked(queries, corpus, k, qidCol, qvecCol, qGroupCol,
        idCol, vecCol, groupCol, numPlanes, bandBits, seed)

  /** Regime router for [[mmrRerank]]/[[mmrRerankBlocked]]. Snapshot
    * semantics per [[Similarity.fitsExactRegime]].
    */
  def mmrRerankRouted(queries: DataFrame, corpus: DataFrame, n: Int, k: Int,
                      lambda: Double = 0.7,
                      qidCol: String = "qid", qvecCol: String = "qv",
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      numPlanes: Int = 16, bandBits: Int = 2,
                      seed: Int = 42,
                      maxExactRows: Long = Similarity.DefaultMaxExactRows): DataFrame = {
    require(n >= 1 && k >= 1, s"n and k must be >= 1, got n=$n k=$k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    if (Similarity.fitsExactRegime(maxExactRows, queries, corpus))
      mmrRerankUnguarded(queries, corpus, n, k, lambda, qidCol, qvecCol,
        idCol, vecCol)
    else
      mmrRerankBlocked(queries, corpus, n, k, lambda, qidCol, qvecCol,
        idCol, vecCol, numPlanes, bandBits, seed)
  }

  /** 7-dp HALF_UP round over the shortest decimal repr (BigDecimal.valueOf,
    * the same path Spark's `round` takes); `+ 0.0` folds −0.0 so both
    * engines hash the same zero.
    */
  private def round7(x: Double): Double =
    BigDecimal.valueOf(x).setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0

  /** Greedy MMR over one query's candidate set: pre-rounded relevance plus
    * pre-rounded pairwise sims in, `(id, rank, rel, mmr)` out. All float
    * arithmetic (`lambda * rel - (1 - lambda) * maxSim`, then round) uses
    * the same double ops as the SQL oracle, so scores hash-match.
    */
  private val mmrSelectUdf = udf(
    (cands: Seq[org.apache.spark.sql.Row], pairs: Seq[org.apache.spark.sql.Row],
     k: Int, lambda: Double) => {
      val cs = cands.map(r => (r.getLong(0), r.getDouble(1)))
        .sortBy { case (id, rel) => (-rel, id) }
      val sim = pairs.iterator.flatMap { p =>
        val (a, b, s) = (p.getLong(0), p.getLong(1), p.getDouble(2))
        Iterator((a, b) -> s, (b, a) -> s)
      }.toMap
      val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Double, Double)]
      val remaining = scala.collection.mutable.ArrayBuffer(cs: _*)
      while (selected.length < k && remaining.nonEmpty) {
        val best = remaining.map { case (id, rel) =>
          val maxSim =
            if (selected.isEmpty) 0.0
            else selected.iterator.map(s => sim.getOrElse((id, s._1), 0.0)).max
          (id, rel, round7(lambda * rel - (1.0 - lambda) * maxSim))
        }.minBy { case (id, _, v) => (-v, id) }
        selected += ((best._1, selected.length + 1, best._2, best._3))
        remaining.remove(remaining.indexWhere(_._1 == best._1))
      }
      selected.toSeq
    })

  /** Hit@k + hit-rate aggregate (`evaluation.py:83-109`): a query is a hit if
    * ANY of its top-k results matches the expected source. Returns a 1-row
    * frame `(hit_rate double, total_questions bigint, hits bigint)`;
    * empty input -> 0.0 (same guard as `evaluation.py:97-100`).
    */
  def hitRate(topk: DataFrame, qidCol: String, resultSourceCol: String,
              expectedSourceCol: String): DataFrame = {
    val perQuery = topk
      .groupBy(col(qidCol))
      .agg(max(when(col(resultSourceCol) === col(expectedSourceCol), 1).otherwise(0)).as("hit"))
    perQuery.agg(
      coalesce(round(sum("hit") * lit(100.0) / count(lit(1)), 6), lit(0.0)).as("hit_rate"),
      count(lit(1)).as("total_questions"),
      coalesce(sum("hit"), lit(0)).cast("long").as("hits"))
  }

  /** Mean reciprocal rank over the same top-k frame as [[hitRate]]: per
    * query, 1/rank of the FIRST relevant result (0 when none in the top
    * k). Returns 1 row `(mrr, total_questions, answered)`; empty input ->
    * 0.0. Rank-sensitive where hit-rate is membership-only — the pair is
    * the standard retrieval report.
    */
  def mrr(topk: DataFrame, qidCol: String, resultSourceCol: String,
          expectedSourceCol: String, rankCol: String = "rank"): DataFrame = {
    val perQuery = topk
      .groupBy(col(qidCol))
      .agg(min(when(col(resultSourceCol) === col(expectedSourceCol),
        col(rankCol))).as("__first_hit"))
    perQuery.agg(
      coalesce(round(avg(
        when(col("__first_hit").isNotNull, lit(1.0) / col("__first_hit"))
          .otherwise(lit(0.0))), 6), lit(0.0)).as("mrr"),
      count(lit(1)).as("total_questions"),
      sum(when(col("__first_hit").isNotNull, 1).otherwise(0))
        .cast("long").as("answered"))
  }

  /** Binary-relevance nDCG@k over the same top-k frame as [[hitRate]] /
    * [[mrr]]: per query, DCG = sum of 1/log2(rank+1) over relevant results,
    * normalized by the ideal DCG of `min(k, total relevant in corpus)`
    * front-loaded ranks. Unlike the degenerate "ideal = retrieved" variant,
    * a query with 5 relevant docs that surfaces only one at rank 1 does NOT
    * score 1.0 — `relevantTotals` supplies the per-query corpus-wide
    * relevant count `(qidCol, totalCol)` so the ideal is honest.
    *
    * Graded position-sensitivity completes the standard retrieval report:
    * hit-rate (membership), MRR (first hit), nDCG (all hits, discounted).
    * Returns 1 row `(ndcg double, total_questions bigint)`; empty -> 0.0.
    * Both the per-query ratio and the final mean are rounded to 6 dp so a
    * SQL oracle summing the ≤k discount terms in a different order cannot
    * drift past the hash compare.
    *
    * Scale shape: one groupBy on the (small) top-k frame + a join against
    * the per-query totals — no second corpus scan; callers derive
    * `relevantTotals` from a per-source count aggregate they already need.
    */
  def ndcg(topk: DataFrame, qidCol: String, resultSourceCol: String,
           expectedSourceCol: String, rankCol: String, k: Int,
           relevantTotals: DataFrame, totalCol: String = "n_relevant"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val dcg = topk
      .groupBy(col(qidCol))
      .agg(sum(when(col(resultSourceCol) === col(expectedSourceCol),
        lit(1.0) / log2(col(rankCol).cast("double") + 1))
        .otherwise(lit(0.0))).as("__dcg"))
    val withIdeal = dcg
      .join(relevantTotals.select(col(qidCol).as("__tq"), col(totalCol).as("__n_rel")),
        dcg(qidCol) === col("__tq"), "left")
      .withColumn("__m", least(lit(k), coalesce(col("__n_rel"), lit(0))).cast("int"))
      .withColumn("__idcg",
        when(col("__m") >= 1,
          aggregate(sequence(lit(1), col("__m")), lit(0.0d),
            (acc, i) => acc + lit(1.0) / log2(i.cast("double") + 1)))
          .otherwise(lit(0.0)))
    val perQuery = withIdeal.withColumn("__ndcg",
      when(col("__idcg") > 0, round(col("__dcg") / col("__idcg"), 6))
        .otherwise(lit(0.0)))
    perQuery.agg(
      coalesce(round(avg(col("__ndcg")), 6), lit(0.0)).as("ndcg"),
      count(lit(1)).as("total_questions"))
  }

  /** Prefix autocomplete index: for every token prefix up to
    * `maxPrefixLen` chars, the top-`k` completions by corpus frequency —
    * the materialized table behind search-box suggestions (and behind
    * query-log analysis of what users were *about* to type). One row per
    * (prefix, suggestion): `(prefix, token, n, rank)`.
    *
    * Scale shape: token counts collapse first (vocabulary-sized), prefix
    * fan-out runs over the VOCABULARY (x maxPrefixLen), one rank window
    * per prefix — never corpus rows.
    */
  def autocompleteIndex(df: DataFrame, textCol: String, k: Int = 3,
                        maxPrefixLen: Int = 4): DataFrame = {
    require(k >= 1 && maxPrefixLen >= 1, "need k >= 1, maxPrefixLen >= 1")
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(explode(TextAnalysis.toks(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    val prefixes = counts.select(col("token"), col("n"),
      explode(transform(
        sequence(lit(1), least(length(col("token")), lit(maxPrefixLen))),
        i => col("token").substr(lit(1), i))).as("prefix"))
    val w = Window.partitionBy(col("prefix"))
      .orderBy(col("n").desc, col("token"))
    prefixes.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("prefix"), col("token"), col("n"), col("rank"))
  }

  /** Percolation / reverse search: match a registry of STORED conjunctive
    * term queries against every document — the alerting/routing primitive
    * (saved searches, compliance watchlists, topic routers) where the
    * queries are the stable side and documents stream past. A document
    * matches a query when it contains EVERY query term. One row per
    * stored query: `(query_id, query_terms, n_matches)`.
    *
    * Scale shape: the registry broadcasts (it is tiny by definition, and
    * `maxRegistry` makes the bound LOUD — the registry is
    * driver-materialized and rides a BroadcastNestedLoopJoin, so a
    * registry that outgrows broadcast size must move to the
    * inverted-index formulation, not limp through this one); matching is
    * a codegen'd `forall` over each document's distinct-token set — one
    * narrow pass, one map-side-combined count. At true scale use
    * [[percolateIndexed]]: a DataFrame registry with an inverted-index
    * prefilter on each query's rarest term and this same forall as the
    * verify — identical result contract.
    */
  def percolate(df: DataFrame, textCol: String, idCol: String,
                queries: Seq[(String, Seq[String])],
                maxRegistry: Int = 100000): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "need at least one stored query, each with at least one term")
    require(queries.size <= maxRegistry,
      s"graft.percolate: ${queries.size} stored queries > " +
        s"maxRegistry=$maxRegistry — the registry is driver-held and " +
        "broadcast; use an inverted-index prefilter at this scale")
    val spark = df.sparkSession
    import spark.implicits._
    val reg = queries.map { case (qid, ts) => (qid, ts, ts.mkString(" ")) }
      .toDF("query_id", "__terms", "query_terms")
    val docs = df.select(col(idCol),
      array_distinct(TextAnalysis.toks(col(textCol))).as("__set"))
    docs.crossJoin(broadcast(reg))
      .withColumn("__hit",
        forall(col("__terms"), t => array_contains(col("__set"), t)))
      .groupBy(col("query_id"), col("query_terms"))
      .agg(sum(col("__hit").cast("long")).as("n_matches"))
  }

  /** The SCALE regime of [[percolate]]: the registry is a DATAFRAME (no
    * driver materialization, no broadcast bound — millions of stored
    * queries shard like any other table) and matching runs through the
    * classic inverted-index prefilter: candidates for a query are the
    * postings of its RAREST term only (by measured document frequency,
    * ties by token), then the same every-term containment verify as the
    * broadcast regime. A conjunctive match must contain every term, so
    * filtering on any one term loses nothing — picking the rarest
    * minimizes candidate volume (the standard percolator/set-containment
    * recipe). Identical result contract: one row per stored query
    * `(query_id, query_terms, n_matches)`, zero-match queries included.
    *
    * Physical shape: one posting explode + token-count aggregate, hash
    * joins on token and query id, one per-query argmin window over the
    * (registry x terms)-sized frame — every edge keyed, no cross join,
    * no broadcast. Work scales with `sum over queries of df(rarest
    * term)`, not |docs| x |registry|. A term absent from the corpus has
    * df 0, wins the argmin, and correctly yields zero candidates. Stored
    * queries with null/empty term lists raise in-flight (the broadcast
    * regime's same refusal, without a driver-side count). Duplicate doc
    * ids count once per ROW, exactly as the broadcast regime does (the
    * candidate set is distinct-ed per (query, id) before the row-level
    * verify join, so id multiplicity lands only in the verify).
    *
    * CACHING: the tokenized doc frame feeds BOTH the posting/df pass and
    * the verify join; `persistDocs = Some(true)` persists it
    * MEMORY_AND_DISK so the corpus tokenizes once (clear with
    * `spark.catalog.clearCache()` between corpora), `Some(false)` trades
    * a second tokenization scan for zero cache footprint, and the
    * default (`None`) persists when the input size estimate exceeds
    * `graft.dedup.persistThresholdBytes` (256 MB) — the [[Dedup]]
    * intermediates convention.
    */
  def percolateIndexed(df: DataFrame, textCol: String, idCol: String,
                       queries: DataFrame,
                       qidCol: String = "query_id",
                       termsCol: String = "terms",
                       persistDocs: Option[Boolean] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val reg = queries
      .select(col(qidCol).as("__qid"), col(termsCol).as("__terms"),
        array_join(col(termsCol), " ").as("query_terms"))
      .filter(when(col("__terms").isNull || size(col("__terms")) === 0,
        raise_error(concat(lit("graft.percolateIndexed: stored query "),
          col("__qid"), lit(" has no terms"))))
        .otherwise(lit(true)))
    // Query ids must be UNIQUE: the rarest-term argmin partitions by id,
    // so a duplicated id would pick ONE token across the UNION of both
    // rows' term lists — a lossy prefilter for whichever query doesn't
    // contain it — and the output would merge distinct term lists under
    // one id (r11 advice). Detected in-flight with a registry-sized count
    // window, applied ONLY on the FINAL left-join reference: `reg` feeds
    // three plan branches, and this is the one branch no optimization can
    // skip — it is the preserved (left) side of the output join, one row
    // per stored query, whereas the rarest/verify branches can be pruned
    // entirely by AQE empty-relation propagation when the corpus or its
    // postings are empty. One guard evaluation per action, guaranteed.
    val regChecked = reg
      .withColumn("__qn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__qid"))))
      .filter(when(col("__qn") > 1,
        raise_error(concat(lit("graft.percolateIndexed: duplicate stored "),
          lit("query id "), col("__qid"),
          lit(" — ids must be unique (merge or re-key the registry)"))))
        .otherwise(lit(true)))
      .drop("__qn")
    val docs0 = df.select(col(idCol).as("__doc"),
      array_distinct(TextAnalysis.toks(col(textCol))).as("__set"))
    val docs =
      if (Dedup.shouldPersist(df, persistDocs))
        docs0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else docs0
    val postings = docs.select(col("__doc"), explode(col("__set")).as("__tok"))
    val dfreq = postings.groupBy(col("__tok")).agg(count(lit(1)).as("__df"))
    val rarest = reg.select(col("__qid"), explode(col("__terms")).as("__tok"))
      .join(dfreq, Seq("__tok"), "left")
      .withColumn("__df", coalesce(col("__df"), lit(0L)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__qid")).orderBy(col("__df"), col("__tok"))))
      .filter(col("__rn") === 1)
      .select(col("__qid"), col("__tok"))
    // Distinct per (query, id) BEFORE the verify join: with duplicate doc
    // ids the token join yields one candidate per matching ROW, and
    // re-joining each against every same-id row would count matches
    // quadratically; distinct-then-join counts each row exactly once,
    // row-identical to the broadcast regime.
    val matched = rarest.join(postings, Seq("__tok"))
      .select(col("__qid"), col("__doc")).distinct()
      .join(reg.select(col("__qid"), col("__terms")), "__qid")
      .join(docs, "__doc")
      .filter(forall(col("__terms"), t => array_contains(col("__set"), t)))
      .groupBy(col("__qid")).agg(count(lit(1)).as("__n"))
    regChecked.join(matched, Seq("__qid"), "left")
      .select(col("__qid").as("query_id"), col("query_terms"),
        coalesce(col("__n"), lit(0L)).as("n_matches"))
  }

  /** Rank-biased overlap (Webber et al., TOIS 2010) truncated at depth `k`
    * between two rankings of the same candidate universe — the
    * ranker-comparison metric of a retrieval stack migration ("how much
    * does the ordering actually change if we swap cosine for dot-product /
    * BM25 v2 / the new ANN index?"). Top-weighted where Kendall's tau is
    * not: disagreement at rank 1 costs more than at rank k.
    *
    * `RBO@k = (1-p) * sum_{d=1..k} p^(d-1) * |A_1..d ∩ B_1..d| / d`, with
    * persistence `p = pNum/pDen`. Input is one row per (query, item) with
    * the item's rank under ranking A and ranking B; an item enters every
    * depth `d >= max(rankA, rankB)`, so each item contributes the exact
    * rational suffix sum `sum_{d>=m} coef(d)` with `m = max(rA, rB)` — the
    * whole metric is ONE groupBy(qid) over integer-weighted items. With
    * `p` rational the coefficients are exact BIGINTs over the common
    * denominator `lcm(1..k) * pDen^(k-1)`, so the single final division is
    * bit-identical across engines.
    *
    * Returns one row per query: `(qid, overlap_at_k, rbo)`. Items ranked
    * past `k` by either ranking contribute nothing and are filtered before
    * the aggregate — the shuffle moves at most k rows per query.
    */
  def rbo(ranks: DataFrame, qidCol: String, rankACol: String,
          rankBCol: String, k: Int, pNum: Long, pDen: Long,
          roundDp: Int = 6): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(pNum > 0 && pDen > pNum, "need 0 < p = pNum/pDen < 1")
    val coefs = rboSuffixCoefs(k, pNum, pDen)
    val denom = coefs._2
    val suffix = coefs._1
    val m = greatest(col(rankACol), col(rankBCol)).cast("int")
    ranks.filter(m <= k)
      .withColumn("__w", element_at(lit(suffix), m))
      .groupBy(col(qidCol))
      .agg(count(lit(1)).cast("long").as("overlap_at_k"),
        round(((lit(pDen - pNum) * sum(col("__w"))).cast("double") /
          (lit(pDen) * lit(denom)).cast("double")), roundDp).as("rbo"))
  }

  /** Exact suffix coefficient table for [[rbo]]: `(suffix, D)` where
    * `suffix(m-1) = sum_{d=m..k} pNum^(d-1) * pDen^(k-d) * (lcm(1..k)/d)`
    * and `D = lcm(1..k) * pDen^(k-1)`, both guaranteed to fit a Long
    * (callers wanting huge k/pDen would overflow — fail loudly instead).
    */
  private[graft] def rboSuffixCoefs(k: Int, pNum: Long,
                                    pDen: Long): (Array[Long], Long) = {
    val lcm = (1 to k).map(BigInt(_)).reduce((a, b) => a * b / a.gcd(b))
    val coef = (1 to k).map(d =>
      BigInt(pNum).pow(d - 1) * BigInt(pDen).pow(k - d) * (lcm / d))
    val suffix = (1 to k).map(m => coef.drop(m - 1).sum)
    val d = lcm * BigInt(pDen).pow(k - 1)
    require(suffix.head.isValidLong && (d * (pDen - pNum)).isValidLong,
      s"rbo coefficients overflow Long for k=$k, p=$pNum/$pDen")
    (suffix.map(_.toLong).toArray, d.toLong)
  }

  /** ROUGE-N (Lin, 2004) between a candidate text and a reference text per
    * row — the n-gram-overlap eval of a summarization / distillation
    * pipeline (does the extracted lead, the model summary, the paraphrase
    * cover the source?). Clipped-count formulation: overlap counts each
    * n-gram at most `min(count_in_candidate, count_in_reference)` times.
    *
    * With integer gram counts every metric is a single exact division:
    * `P = ov/nc`, `R = ov/nr`, and — because P and R share the numerator —
    * `F1 = 2PR/(P+R) = 2*ov/(nc+nr)`; all three bit-identical across
    * engines. A candidate shorter than `n` tokens has no grams: P/R/F all
    * 0.0 (never null, never a divide-by-zero).
    *
    * Returns one row per input row: `(id, n_cand, n_ref, overlap,
    * precision, recall, f1)`.
    *
    * Scale shape: tokenization and gram construction are codegen'd HOF
    * expressions; both gram multisets aggregate map-side-combined on
    * `(id, gram)` and join co-partitioned on the same key — one shuffle
    * per side, no corpus-wide state.
    */
  def rougeN(pairs: DataFrame, idCol: String, candCol: String,
             refCol: String, n: Int, roundDp: Int = 6): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    def grams(c: Column): Column = {
      val toks = TextAnalysis.toks(c)
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array().cast("array<string>"))
    }
    def counts(textCol: String, out: String): DataFrame =
      pairs.select(col(idCol), explode(grams(col(textCol))).as("__gram"))
        .groupBy(col(idCol), col("__gram"))
        .agg(count(lit(1)).as(out))
    val cand = counts(candCol, "__cc")
    val ref = counts(refCol, "__cr")
    val overlap = cand.join(ref, Seq(idCol, "__gram"))
      .groupBy(col(idCol))
      .agg(sum(least(col("__cc"), col("__cr"))).as("__ov"))
    val totals = pairs.select(col(idCol),
      greatest(size(TextAnalysis.toks(col(candCol))) - (n - 1), lit(0))
        .cast("long").as("n_cand"),
      greatest(size(TextAnalysis.toks(col(refCol))) - (n - 1), lit(0))
        .cast("long").as("n_ref"))
    totals.join(overlap, Seq(idCol), "left")
      .withColumn("overlap", coalesce(col("__ov"), lit(0L)))
      .select(col(idCol), col("n_cand"), col("n_ref"), col("overlap"),
        when(col("n_cand") > 0,
          round(col("overlap").cast("double") / col("n_cand"), roundDp))
          .otherwise(lit(0.0)).as("precision"),
        when(col("n_ref") > 0,
          round(col("overlap").cast("double") / col("n_ref"), roundDp))
          .otherwise(lit(0.0)).as("recall"),
        when(col("n_cand") + col("n_ref") > 0,
          round(lit(2.0) * col("overlap") / (col("n_cand") + col("n_ref")),
            roundDp))
          .otherwise(lit(0.0)).as("f1"))
  }
}
