package graft.operators

import org.apache.spark.sql.DataFrame
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
}
