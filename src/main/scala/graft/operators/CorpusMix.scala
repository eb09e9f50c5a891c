package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-mixing operators for assembling a training set from a scored
  * corpus: pack each group (language / domain / source) up to a token
  * budget in quality order, and cap the number of documents any one
  * domain may contribute (the C4/Gopher-style anti-boilerplate rule).
  *
  * No reference counterpart (the reference stops at ingest+search) — these
  * are the mix/selection steps a 100 TB pretraining pipeline runs after
  * dedup + quality scoring.
  *
  * Scale stance: the EXACT packers sort inside a window partitioned by the
  * group column, so each group's rows land in one task — correct and fine
  * when groups are languages or domains (thousands of groups, each far
  * smaller than the corpus), but a single mega-group serializes into one
  * task. `packToBudgetHistogram` is the mega-group-safe variant: it reduces
  * the corpus to a (group × quality-bucket) token histogram (tiny,
  * map-side-combined agg), picks per-group quality thresholds from the
  * histogram, and keeps rows with a broadcast-joined map-side filter — no
  * per-group sort anywhere, at the cost of budget granularity (whole
  * buckets only).
  */
object CorpusMix {

  /** Exact per-group token-budget packing: order each group by `orderBy`
    * (best first), keep rows while the running token total stays within
    * `budgetPerGroup`. Emits the input columns plus `cum_tokens`.
    *
    * One shuffle (hash on `groupCol` for the window); the running sum is a
    * single in-order pass per group. Deterministic iff `orderBy` is a total
    * order — pass a unique tiebreaker as the last sort key.
    */
  def packToBudget(df: DataFrame, groupCol: String, tokensCol: String,
                   budgetPerGroup: Long, orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .filter(col("cum_tokens") <= budgetPerGroup)
  }

  /** Mega-group-safe approximate packing: bucket quality to `buckets`
    * equal-width bins over [0,1], build a (group, bucket) token histogram,
    * keep exactly the buckets that fit the budget cumulatively from the top,
    * and filter the corpus against the per-group threshold bucket.
    *
    * Guarantees: kept tokens <= budget per group (partial buckets are
    * dropped, never split); the kept set is a quality prefix at bucket
    * granularity. The histogram is `|groups| * (buckets+1)` rows — tiny —
    * so its window sort is trivial and the thresholds broadcast.
    *
    * Plan: one map-side-combined agg (shuffle of histogram rows only), one
    * broadcast join back, a narrow filter. The full corpus is never sorted
    * and never shuffled.
    *
    * `df` is consumed by BOTH the histogram and the output branch; when its
    * columns carry expensive annotations (token counts, quality scores —
    * regex-heavy extractions in this library), `persistInput` (default)
    * materializes the annotated rows ONCE (eager localCheckpoint,
    * MEMORY_AND_DISK blocks) so the annotations aren't computed once per
    * branch — and, unlike a persist(), the blocks are freed by the
    * ContextCleaner when the returned frame is garbage-collected instead of
    * accumulating per call until clearCache() (r7 advice fix). Callers
    * should pass the narrow projection (id, group, tokens, quality — never
    * raw text), which keeps the cached bytes-per-row small at any corpus
    * size; pass false for a cheap input (plain table scan) where a second
    * scan beats the cache.
    */
  def packToBudgetHistogram(df: DataFrame, groupCol: String, tokensCol: String,
                            qualityCol: String, budgetPerGroup: Long,
                            buckets: Int = 100, persistInput: Boolean = true): DataFrame = {
    require(buckets > 0, "graft.CorpusMix: buckets must be positive")
    val in = if (persistInput) df.localCheckpoint() else df
    // floor to a bucket index in [0, buckets]; quality is expected in [0,1]
    val bucket = floor(col(qualityCol) * buckets).cast("int")
    val hist = in.groupBy(col(groupCol), bucket.as("__bucket"))
      .agg(sum(col(tokensCol)).as("__bucket_tokens"))
    // cumulative tokens from the BEST bucket downward; a bucket is kept only
    // if everything down to and including it fits the budget
    val w = Window.partitionBy(groupCol).orderBy(col("__bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kept = hist.withColumn("__cum", sum(col("__bucket_tokens")).over(w))
      .filter(col("__cum") <= budgetPerGroup)
      .groupBy(groupCol).agg(min(col("__bucket")).as("__threshold_bucket"))
    // Null-SAFE join key: a null group is a real group (the histogram and
    // window above both kept it), but a plain equi-join would silently
    // drop every null-group row here — the tCloseness null-key class.
    val keptR = kept.withColumnRenamed(groupCol, "__kept_g")
    in.join(broadcast(keptR), col(groupCol) <=> col("__kept_g"), "inner")
      .drop("__kept_g")
      .filter(floor(col(qualityCol) * buckets).cast("int") >= col("__threshold_bucket"))
      .drop("__threshold_bucket")
  }

  /** Per-group contribution cap: keep the best `maxPerGroup` rows of each
    * group under the `orderBy` ranking (best first). Emits the input columns
    * plus the 1-based `rank`. One shuffle (window on `groupCol`).
    */
  def capPerGroup(df: DataFrame, groupCol: String, maxPerGroup: Int,
                  orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderBy: _*)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= maxPerGroup)
  }

  /** Temperature sampling across groups (the T5/mT5 multilingual mix,
    * Raffel et al. / Xue et al.): group `j` contributes
    * `floor(round(n_j^alpha / sum_k n_k^alpha * budget, 6))` rows — at
    * `alpha = 1` proportional to size, at `alpha -> 0` uniform across
    * groups, in between up-weighting low-resource groups, capped at the
    * group's actual size. Row selection within a group follows `orderBy`
    * (pass an md5-of-key order for an unbiased deterministic draw, or
    * quality-desc for best-first). The round(..., 6) before floor pins the
    * target against cross-engine pow/division ulps.
    *
    * Scale shape: group sizes are one map-side-combined aggregate (rows =
    * number of groups, broadcast back); the per-group rank is the same
    * one-shuffle window as [[capPerGroup]]. Output adds `rank` (in-group)
    * and `target` (the group's computed quota).
    */
  def temperatureSample(df: DataFrame, groupCol: String, alpha: Double,
                        budget: Long, orderBy: Seq[Column]): DataFrame = {
    require(alpha > 0, "alpha must be positive (alpha -> 0 is uniform)")
    require(budget > 0, "budget must be positive")
    val sizes = df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("double").as("__n"))
    val tot = sizes.agg(sum(pow(col("__n"), alpha)).as("__z"))
    val targets = sizes.crossJoin(broadcast(tot))
      .select(col(groupCol),
        least(col("__n").cast("long"),
          floor(round(pow(col("__n"), alpha) / col("__z") * budget, 6))
            .cast("long")).as("target"))
    val w = Window.partitionBy(groupCol).orderBy(orderBy: _*)
    // Null-safe join for the same reason as [[packToBudgetHistogram]]: the
    // sizes aggregate counted the null group, so its quota must reach its
    // rows instead of being dropped by a null-hostile equi-join.
    val targetsR = targets.withColumnRenamed(groupCol, "__tgt_g")
    df.withColumn("rank", row_number().over(w).cast("long"))
      .join(broadcast(targetsR), col(groupCol) <=> col("__tgt_g"))
      .drop("__tgt_g")
      .filter(col("rank") <= col("target"))
  }
}
