package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus drift monitoring: Jensen-Shannon divergence between the token
  * distributions of two corpora (crawl snapshots, sources, or languages).
  * The operational question a 100 TB ingest pipeline asks every run —
  * "does this week's crawl still look like last week's?" — answered with
  * the one f-divergence that is always finite, symmetric, and bounded
  * (<= ln 2 nats / 1 bit), so thresholds survive vocabulary churn.
  *
  * [[graft.plans.KmvSketchAgg]]'s language-similarity matrix answers the
  * SET question (shared vocabulary); this answers the DISTRIBUTION question
  * (frequency mix) — a corpus can keep its vocabulary and still drift hard.
  *
  * Shape: two token-count aggregates (map-side combined), a full-outer join
  * on the vocabulary (vocab-sized, tiny next to the corpora), 1-row totals
  * broadcast, one final 1-row aggregate. No collect, no UDF. Per-token
  * contributions are rounded to 12 dp and summed as DECIMAL(28,12) so the
  * result is independent of partition/summation order — the oracle-parity
  * decimal-sum rule.
  */
object Drift {

  private def tokenCounts(df: DataFrame, textCol: String, cnt: String): DataFrame =
    df.select(explode(TextAnalysis.toks(col(textCol))).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as(cnt))

  /** Two-sample Kolmogorov-Smirnov distance between a numeric feature's
    * distributions in two corpora — the companion to
    * [[tokenDistributionDrift]] for NUMERIC health signals (document
    * length, quality score, token count): JSD sees the token mix, KS sees
    * a shifted length profile the mix can hide.
    *
    * Exact, not sampled: both corpora reduce to per-distinct-value count
    * tables (bounded by the value domain, tiny for lengths/scores), the
    * ECDFs come from one running-sum window over the joined table, and the
    * statistic is the max |ECDF_p - ECDF_q| with the 6-dp round + min-value
    * tie-break making the argmax row deterministic. Returns 1 row
    * `(ks, ks_at, n_p, n_q)`; an empty corpus yields ECDF 0 for that side
    * (ks then reads 1.0 against any non-empty side at its top value, and
    * the zero total is the audit signal).
    */
  def ksDistance(p: DataFrame, q: DataFrame, valueCol: String): DataFrame = {
    val pc = p.groupBy(col(valueCol).as("__v")).agg(count(lit(1)).as("__cp"))
    val qc = q.groupBy(col(valueCol).as("__v")).agg(count(lit(1)).as("__cq"))
    val j = pc.join(qc, Seq("__v"), "full_outer")
      .select(col("__v"),
        coalesce(col("__cp"), lit(0L)).as("__cp"),
        coalesce(col("__cq"), lit(0L)).as("__cq"))
    val tot = j.agg(sum(col("__cp")).as("__tp"), sum(col("__cq")).as("__tq"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = j.crossJoin(broadcast(tot))
      .withColumn("__fp", when(col("__tp") > 0,
        sum(col("__cp")).over(w).cast("double") / col("__tp")).otherwise(lit(0.0)))
      .withColumn("__fq", when(col("__tq") > 0,
        sum(col("__cq")).over(w).cast("double") / col("__tq")).otherwise(lit(0.0)))
      .withColumn("__d", round(abs(col("__fp") - col("__fq")), 6))
    cum.orderBy(col("__d").desc, col("__v")).limit(1)
      .select((col("__d") + lit(0.0)).as("ks"),
        col("__v").cast("long").as("ks_at"),
        col("__tp").cast("long").as("n_p"),
        col("__tq").cast("long").as("n_q"))
  }

  /** 1-row drift report between corpus `p` and corpus `q`:
    * `(jsd_nats, jsd_bits, vocab_p, vocab_q, vocab_shared, total_p,
    * total_q)`. Empty corpora yield 0 totals and a 0.0 divergence rather
    * than an error (a missing snapshot should page via the totals, not
    * crash the report).
    */
  def tokenDistributionDrift(p: DataFrame, q: DataFrame,
                             textCol: String = "text"): DataFrame = {
    val pc = tokenCounts(p, textCol, "__cp")
    val qc = tokenCounts(q, textCol, "__cq")
    val j = pc.join(qc, Seq("__t"), "full_outer")
      .select(col("__t"),
        coalesce(col("__cp"), lit(0L)).as("__cp"),
        coalesce(col("__cq"), lit(0L)).as("__cq"))
    val tot = j.agg(sum(col("__cp")).as("__tp"), sum(col("__cq")).as("__tq"))
    val withP = j.crossJoin(broadcast(tot))
    // 0/0 is NaN in double math and would poison the mixture term; an
    // empty corpus contributes probability 0 instead.
    val pi = when(col("__tp") > 0, col("__cp").cast("double") / col("__tp"))
      .otherwise(lit(0.0))
    val qi = when(col("__tq") > 0, col("__cq").cast("double") / col("__tq"))
      .otherwise(lit(0.0))
    val m = (pi + qi) / lit(2)
    def half(x: Column): Column =
      lit(0.5) * when(x > 0, x * log(x / m)).otherwise(lit(0.0))
    val contrib = round(half(pi) + half(qi), 12).cast("decimal(28,12)")
    withP.select(col("__cp"), col("__cq"), contrib.as("__contrib"))
      .agg(
        (coalesce(round(sum(col("__contrib")).cast("double"), 6), lit(0.0))
          + lit(0.0)).as("jsd_nats"),
        (coalesce(round(sum(col("__contrib")).cast("double") / log(lit(2.0)), 6),
          lit(0.0)) + lit(0.0)).as("jsd_bits"),
        sum(when(col("__cp") > 0, 1).otherwise(0)).cast("long").as("vocab_p"),
        sum(when(col("__cq") > 0, 1).otherwise(0)).cast("long").as("vocab_q"),
        sum(when(col("__cp") > 0 && col("__cq") > 0, 1).otherwise(0))
          .cast("long").as("vocab_shared"),
        coalesce(sum(col("__cp")), lit(0L)).cast("long").as("total_p"),
        coalesce(sum(col("__cq")), lit(0L)).cast("long").as("total_q"))
  }

  /** CUSUM mean-shift changepoint over an ordered integer series — the
    * pipeline-monitoring answer to "WHEN did this metric move", the
    * location complement of [[ksDistance]]'s "how far apart". For each
    * key, the classic statistic S_t = Σ_{i<=t}(x_i - mean) is evaluated
    * EXACTLY by scaling through n: `n·S_t = n·cumsum_t − t·total` is pure
    * integer arithmetic (no rational mean, no floating drift), and the
    * changepoint is the position with the largest |n·S_t|, ties to the
    * earliest. Emits `(key, changepoint_t, cusum_scaled, n_points)` —
    * `cusum_scaled` keeps its sign (negative = the series runs below its
    * mean up to the changepoint, i.e. an upward shift after it).
    *
    * Scale shape: one per-key window over the (key, t, x) series — the
    * series is already aggregated (e.g. daily counts), so window width is
    * bounded by the time range, never by event volume.
    */
  /** Dispersion report over an integer series per key — mean, sample
    * variance, and the Fano factor (variance/mean): the burstiness alarm
    * for arrival-count series (Poisson traffic sits near 1; bursts and
    * bot storms push it far above). Variance is computed from exact
    * integer power sums — `var = (n·Σx² − (Σx)²) / (n·(n−1))` — with one
    * double division at the end, so the oracle replays it bit-for-bit.
    * Emits `(key, n_points, mean, variance, fano)`, 6dp.
    */
  def dispersion(series: DataFrame, keyCol: String, xCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    series.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"), sum(x).as("__s"),
        sum(x * x).as("__s2"))
      .select(col(keyCol), col("__n").as("n_points"),
        round(col("__s").cast("double") / col("__n"), 6).as("mean"),
        when(col("__n") > 1,
          round((col("__n") * col("__s2") - col("__s") * col("__s"))
            .cast("double") / (col("__n") * (col("__n") - 1)), 6))
          .otherwise(lit(0.0)).as("variance"),
        when(col("__n") > 1 && col("__s") > 0,
          round((col("__n") * col("__s2") - col("__s") * col("__s"))
            .cast("double") / (col("__n") * (col("__n") - 1)) /
            (col("__s").cast("double") / col("__n")), 6))
          .otherwise(lit(0.0)).as("fano"))
  }

  def cusumChangepoint(series: DataFrame, keyCol: String, tCol: String,
                       xCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
    val wOrd = w.orderBy(col(tCol))
    val scaled = series.select(col(keyCol), col(tCol),
        (count(lit(1)).over(w) *
          sum(col(xCol)).over(wOrd.rowsBetween(Long.MinValue, 0)) -
          row_number().over(wOrd) * sum(col(xCol)).over(w)).as("__s"),
        count(lit(1)).over(w).as("__n"))
    val pick = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
      .orderBy(abs(col("__s")).desc, col(tCol).asc)
    scaled.withColumn("__rk", row_number().over(pick))
      .filter(col("__rk") === 1)
      .select(col(keyCol), col(tCol).as("changepoint_t"),
        col("__s").cast("long").as("cusum_scaled"),
        col("__n").cast("long").as("n_points"))
  }

  /** Distinctive terms between two corpora by Dirichlet-smoothed log-odds
    * z-scores (Monroe/Colaresi/Quinn "Fightin' Words") — THE method for
    * "which words characterize corpus A vs corpus B": raw frequency
    * differences surface stopwords, PMI-style ratios surface hapaxes;
    * the informative prior (the pooled corpus) damps both, and the
    * variance estimate turns the gap into a comparable z-score. One row
    * per term: `(term, n_a, n_b, delta, z)` — positive z leans A.
    *
    * Formula (prior scale `alpha0` tokens distributed by pooled
    * frequency): `delta = ln((y_a+a_w)/(n_a+a0-y_a-a_w)) - ln(same for
    * B)`, `var = 1/(y_a+a_w) + 1/(y_b+a_w)`, `z = delta/sqrt(var)` — all
    * inputs exact integer counts plus one pooled ratio, fixed double
    * shapes, rounded at output.
    *
    * Scale shape: two vocabulary-sized count tables full-outer-joined,
    * 1-row totals broadcast. Nothing corpus-sized moves after the
    * token-count aggregates.
    */
  def fightinWords(a: DataFrame, b: DataFrame, textCol: String,
                   alpha0: Double = 100.0, roundDp: Int = 6): DataFrame = {
    require(alpha0 > 0, s"alpha0 must be positive, got $alpha0")
    val ca = tokenCounts(a, textCol, "__ya")
    val cb = tokenCounts(b, textCol, "__yb")
    val j = ca.join(cb, Seq("__t"), "full_outer")
      .select(col("__t").as("term"),
        coalesce(col("__ya"), lit(0L)).as("n_a"),
        coalesce(col("__yb"), lit(0L)).as("n_b"))
    val tot = j.agg(sum(col("n_a")).as("__na"), sum(col("n_b")).as("__nb"),
      (sum(col("n_a")) + sum(col("n_b"))).as("__np"))
    val aw = lit(alpha0) * (col("n_a") + col("n_b")).cast("double") / col("__np")
    val da = log((col("n_a") + aw) /
      (col("__na") + alpha0 - col("n_a") - aw))
    val db = log((col("n_b") + aw) /
      (col("__nb") + alpha0 - col("n_b") - aw))
    val variance = lit(1.0) / (col("n_a") + aw) + lit(1.0) / (col("n_b") + aw)
    j.crossJoin(broadcast(tot))
      .select(col("term"), col("n_a"), col("n_b"),
        round(da - db, roundDp).as("delta"),
        round((da - db) / sqrt(variance), roundDp).as("z"))
  }

  /** Embedding-space drift between two corpora: cosine between the MEAN
    * vectors plus the mean-norm ratio — the two cheapest honest answers to
    * "did the new crawl's embedding distribution move?" (a centroid
    * rotation shows in the cosine, a mass/scale change in the ratio;
    * `embed_covariance` is the expensive second moment, this is the first).
    *
    * Determinism: per-dimension sums ride integer micro-units
    * (`round(v * 1e6)` — exact BIGINT sums, order-independent), cosine is
    * scale-invariant so it runs directly on the SUM vectors, and the norm
    * ratio rescales by the exact counts; the dot/norm contractions are
    * fixed-shape double chains over those exact integers. One row:
    * `(n_a, n_b, mean_cosine, norm_ratio)`; a zero mean vector on either
    * side yields null cosine (direction undefined — the audit signal is
    * the null).
    *
    * Scale shape: one posexplode + map-side-combined per-dim aggregate per
    * side (dim-bounded), a dim-sized join, a 1-row contraction. Nothing
    * corpus-sized moves after the first aggregate.
    */
  def embeddingDrift(a: DataFrame, b: DataFrame,
                     vecCol: String = "embedding",
                     roundDp: Int = 6): DataFrame = {
    def dimSums(df: DataFrame, out: String, cnt: String): (DataFrame, DataFrame) = {
      val d = df.filter(col(vecCol).isNotNull)
      (d.select(posexplode(col(vecCol)).as(Seq("__d", "__v")))
        .groupBy(col("__d"))
        .agg(sum(round(col("__v").cast("double") * 1e6, 0).cast("long"))
          .as(out)),
        d.agg(count(lit(1)).as(cnt)))
    }
    val (sa, na) = dimSums(a, "__sa", "__na")
    val (sb, nb) = dimSums(b, "__sb", "__nb")
    val contracted = sa.join(sb, Seq("__d"), "full_outer")
      .select(coalesce(col("__sa"), lit(0L)).as("__sa"),
        coalesce(col("__sb"), lit(0L)).as("__sb"))
      .agg(
        sum(col("__sa").cast("double") * col("__sb")).as("__dot"),
        sum(col("__sa").cast("double") * col("__sa")).as("__a2"),
        sum(col("__sb").cast("double") * col("__sb")).as("__b2"))
    contracted.crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"),
        when(col("__a2") > 0 && col("__b2") > 0,
          round(col("__dot") / (sqrt(col("__a2")) * sqrt(col("__b2"))),
            roundDp))
          .otherwise(lit(null).cast("double")).as("mean_cosine"),
        when(col("__b2") > 0 && col("__na") > 0,
          round(sqrt(col("__a2")) * col("__nb") /
            (sqrt(col("__b2")) * col("__na")), roundDp))
          .otherwise(lit(null).cast("double")).as("norm_ratio"))
  }

  /** Population stability index between a reference and a current corpus
    * over a numeric column — the industry-standard scorecard-drift gauge
    * that completes the drift kit (JSD: token mix, KS: continuous shape,
    * PSI: BINNED mix with the asymmetric-log weighting risk teams
    * threshold at 0.1/0.25). Fixed-width bins over `[lo, hi)` (outliers
    * clamp into the edge bins, so a runaway tail still registers), Laplace
    * `+1` smoothing so empty bins stay finite.
    *
    * One row per bin: `(bin, n_ref, n_cur, psi_term, psi_total)`.
    * `psi_term = (p_r - p_c) * ln(p_r / p_c)` with
    * `p = (n_bin + 1) / (N + bins)` — exact integer ratios in, identical
    * expression shape both engines, rounded to 6 dp. `psi_total` repeats
    * the rounded-term sum on every row: each rounded term is a multiple of
    * 1e-6, so the float sum sits within 1e-15 of an exact 1e-6 multiple
    * and the final 6-dp round can never straddle a boundary —
    * order-independent without a decimal cast.
    *
    * Scale shape: two map-side-combined aggregates to `bins` rows each, a
    * bins-sized join, one window over `bins` rows. Nothing corpus-sized
    * moves.
    */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String, bins: Int,
          lo: Double, hi: Double, roundDp: Int = 6): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val width = (hi - lo) / bins
    def bin(c: Column): Column =
      least(greatest(floor((c - lo) / width), lit(0)), lit(bins - 1))
        .cast("long")
    def counts(df: DataFrame, out: String): DataFrame =
      df.filter(col(valueCol).isNotNull)
        .groupBy(bin(col(valueCol)).as("bin"))
        .agg(count(lit(1)).as(out))
    val all = counts(ref, "n_ref")
      .join(counts(cur, "n_cur"), Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val allBins = ref.sparkSession.range(0, bins).select(col("id").as("bin"))
      .join(all, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = allBins.agg(sum(col("n_ref")).as("__tr"),
      sum(col("n_cur")).as("__tc"))
    val pr = (col("n_ref") + 1).cast("double") / (col("__tr") + bins)
    val pc = (col("n_cur") + 1).cast("double") / (col("__tc") + bins)
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    allBins.crossJoin(broadcast(tot))
      .withColumn("psi_term", round((pr - pc) * log(pr / pc), roundDp))
      .withColumn("psi_total", round(sum(col("psi_term")).over(w), roundDp))
      .select(col("bin"), col("n_ref"), col("n_cur"), col("psi_term"),
        col("psi_total"))
  }
}
