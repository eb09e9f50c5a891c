package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (RRF) of two independently
  * scored candidate lists — the standard way to blend vector similarity
  * ([[Search.topKCosine]]) with lexical relevance ([[Bm25]]) without score
  * calibration: `rrf(d) = Σ_lists 1 / (k + rank_list(d))`, k = 60 from the
  * original RRF paper. Rank-based, so it is insensitive to each list's
  * score scale and fully deterministic given deterministic tie-breaks.
  *
  * Scale shape: each list is first cut to its top `perListK` by
  * `ORDER BY score LIMIT` — Catalyst plans `TakeOrderedAndProject`
  * (per-partition top-k + a k-row merge), never a full sort — and only the
  * two k-row lists are ranked (one-task window over ≤ perListK rows, by
  * construction) and fused with a tiny full-outer join.
  */
object HybridSearch {

  /** Fuse two `(idCol, scoreCol)` lists (higher score = better; ties broken
    * by id). Output: `(idCol, rrf_score)`, best `topN` rows, rank-fusion
    * constant `k`.
    */
  def rrf(a: DataFrame, b: DataFrame, idCol: String, scoreCol: String,
          k: Int = 60, perListK: Int = 100, topN: Int = 20): DataFrame = {
    require(k >= 1 && perListK >= 1 && topN >= 1, "rrf parameters must be positive")
    def ranked(df: DataFrame, rank: String) =
      df.select(col(idCol), col(scoreCol))
        .orderBy(col(scoreCol).desc, col(idCol))
        .limit(perListK)
        .withColumn(rank, row_number().over(
          Window.orderBy(col(scoreCol).desc, col(idCol))))
        .select(col(idCol), col(rank))
    ranked(a, "__ra").join(ranked(b, "__rb"), Seq(idCol), "full_outer")
      .select(col(idCol),
        round(
          coalesce(lit(1.0) / (lit(k) + col("__ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k) + col("__rb")), lit(0.0)), 6).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(topN)
  }
}
