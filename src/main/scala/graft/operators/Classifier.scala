package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed quality-classifier training — the fastText-style filter
  * step of an LLM data pipeline (train a cheap linear model on labeled
  * quality signals, score the whole corpus, keep the confident slice).
  *
  * Reference scope: the reference has no trainable component; this is one
  * of the mandated training-data-pipeline extensions.
  *
  * Logistic regression by FULL-BATCH gradient descent, deterministic and
  * oracle-mirrorable:
  *   - weights start at zero, bias first, then `featureCols` in order;
  *   - `z = b + w1*x1 + ... + wp*xp` summed left-to-right;
  *   - gradient = per-component mean of `(sigmoid(z) - y) * x`;
  *   - update `w' = round(w - lr * grad, roundDp)` — the per-iteration
  *     rounding makes weights bit-identical across engines (the same
  *     trick as [[KMeans]]'s centroid rounding), so scores are too.
  *
  * Scale shape: each iteration is ONE map-side-combined global aggregate
  * (p+1 partial sums per partition move, never rows); the model is p+1
  * doubles on the driver; scoring is one narrow codegen'd pass. Full-batch
  * GD per epoch is the standard distributed LR layout (MLlib's LBFGS costs
  * the same per pass); epochs are bounded by `iterations`.
  */
object Classifier {

  private def z(weights: Array[Double], features: Seq[Column]): Column =
    features.zipWithIndex.foldLeft(lit(weights(0)): Column) {
      case (acc, (x, j)) => acc + lit(weights(j + 1)) * x
    }

  private def sigmoid(c: Column): Column = lit(1.0) / (lit(1.0) + exp(-c))

  /** Train: returns `(bias, w1..wp)` after `iterations` rounded updates.
    * Rows with a null label or null feature are excluded (both engines
    * would otherwise propagate null through the mean).
    */
  def fitLogistic(df: DataFrame, featureCols: Seq[String], labelCol: String,
                  iterations: Int = 2, lr: Double = 1.0,
                  roundDp: Int = 6): Array[Double] = {
    require(featureCols.nonEmpty, "need at least one feature")
    val feats = featureCols.map(col)
    val clean = df.filter(
      (col(labelCol).isNotNull +: featureCols.map(col(_).isNotNull))
        .reduce(_ && _))
      .persist()
    try {
      var weights = new Array[Double](featureCols.length + 1)
      var it = 0
      while (it < iterations) {
        val err = sigmoid(z(weights, feats)) - col(labelCol)
        val gradCols = avg(err).as("g0") +:
          feats.zipWithIndex.map { case (x, j) => avg(err * x).as(s"g${j + 1}") }
        val g = clean.agg(gradCols.head, gradCols.tail: _*).collect()(0)
        require(!g.isNullAt(0),
          "graft.Classifier: no trainable rows (all labels/features null?)")
        weights = weights.indices.map { j =>
          BigDecimal(weights(j) - lr * g.getDouble(j))
            .setScale(roundDp, BigDecimal.RoundingMode.HALF_UP).toDouble
        }.toArray
        it += 1
      }
      weights
    } finally clean.unpersist()
  }

  /** Score: adds `prob` (rounded) and `predicted` (prob >= 0.5). One
    * narrow pass; `weights` layout as returned by [[fitLogistic]].
    * `predicted` derives from the SAME rounded value emitted as `prob`, so
    * the output can never show prob = 0.5 with predicted = false (an
    * unrounded p = 0.4999996 used to round up in `prob` while predicting
    * false; r7 advice fix — the oracle applies the identical rounding).
    */
  def scoreLogistic(df: DataFrame, featureCols: Seq[String],
                    weights: Array[Double], roundDp: Int = 6): DataFrame = {
    require(weights.length == featureCols.length + 1,
      s"weights (${weights.length}) must be features+bias (${featureCols.length + 1})")
    val p = round(sigmoid(z(weights, featureCols.map(col))), roundDp)
    df.withColumn("prob", p)
      .withColumn("predicted", p >= 0.5)
  }

  /** Fit + score in one call (the gate entry point). The feature frame is
    * localCheckpoint'ed first (r16): callers feed a regex-heavy derived
    * frame (quality signals + label join), and without the checkpoint the
    * fit's gradient cache-build AND the scoring pass each re-evaluated
    * that lineage from the scan. One materialization, bit-identical rows
    * (same partitioning, same order — the per-iteration double sums are
    * unchanged), one fewer full evaluation per gate.
    */
  def fitScoreLogistic(df: DataFrame, featureCols: Seq[String],
                       labelCol: String, iterations: Int = 2,
                       lr: Double = 1.0): DataFrame = {
    val snap = df.localCheckpoint()
    scoreLogistic(snap, featureCols,
      fitLogistic(snap, featureCols, labelCol, iterations, lr))
  }

  /** ROC-AUC of a scored frame, one row `(auc, n_pos, n_neg)` — the
    * rank-sum (Mann-Whitney) formulation with exact tie handling:
    * `AUC = P(score_pos > score_neg) + P(score_pos = score_neg)/2`.
    *
    * Scale shape: NO global per-row window. Rows first collapse to the
    * per-distinct-score distribution `(score, n_pos, n_neg)` (one shuffle,
    * map-side combine), and the cumulative pass runs over THAT table,
    * bounded by the number of distinct scores — the same regime trick as
    * `CorpusMix.packToBudgetHistogram` (rounded probabilities have at most
    * 10^roundDp + 1 distinct values, here ~1e6 worst case, typically far
    * fewer). Every accumulated term is an exact multiple of 0.5 well below
    * 2^52, so the floating sums are order-independent and the single final
    * division is the only inexact step — deterministic and
    * oracle-replayable.
    */
  def aucFrame(scored: DataFrame, probCol: String, labelCol: String,
               roundDp: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dist = scored.groupBy(col(probCol).as("__p"))
      .agg(sum(col(labelCol)).as("__npos"),
        sum(lit(1.0) - col(labelCol)).as("__nneg"))
    val w = Window.orderBy(col("__p"))
      .rowsBetween(Window.unboundedPreceding, -1)
    dist.withColumn("__below", coalesce(sum(col("__nneg")).over(w), lit(0.0)))
      .agg(
        round(sum(col("__npos") * (col("__below") + col("__nneg") / 2.0)) /
          (sum(col("__npos")) * sum(col("__nneg"))), roundDp).as("auc"),
        sum(col("__npos")).cast("long").as("n_pos"),
        sum(col("__nneg")).cast("long").as("n_neg"))
  }

  /** Exact best-F1 decision threshold — the last step of the classifier
    * operational loop (train -> score -> AUC -> calibrate -> conformal ->
    * PICK THE CUTOFF): sweep every distinct score as a candidate
    * threshold (predict positive at `p >= t`), compute the exact
    * confusion counts by suffix sums over the per-distinct-score
    * distribution, and return the F1-maximizing cutoff (ties -> the
    * HIGHER threshold, the conservative choice). One row:
    * `(threshold, tp, fp, fn, precision, recall, f1)`.
    *
    * All counts are exact integers (`F1 = 2tp / (2tp + fp + fn)` — one
    * division), so the argmax is decided on exact values; the sweep table
    * is bounded by distinct scores (~1e6 worst case at 6 dp), the
    * [[aucFrame]] regime — never row-level.
    */
  def bestF1Threshold(scored: DataFrame, probCol: String,
                      labelCol: String, roundDp: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dist = scored
      .filter(col(probCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(probCol).as("__p"))
      .agg(sum(col(labelCol).cast("long")).as("__np"),
        sum(lit(1L) - col(labelCol).cast("long")).as("__nn"))
    val wSuffix = Window.orderBy(col("__p").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val swept = dist
      .withColumn("__tp", sum(col("__np")).over(wSuffix).cast("long"))
      .withColumn("__fp", sum(col("__nn")).over(wSuffix).cast("long"))
      .withColumn("__pos", sum(col("__np")).over(wAll).cast("long"))
      .withColumn("__fn", col("__pos") - col("__tp"))
      .withColumn("__f1",
        when(lit(2L) * col("__tp") + col("__fp") + col("__fn") > 0,
          round((lit(2L) * col("__tp")).cast("double") /
            (lit(2L) * col("__tp") + col("__fp") + col("__fn")), roundDp))
          .otherwise(lit(0.0)))
    val pick = Window.orderBy(col("__f1").desc, col("__p").desc)
    swept.withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") === 1)
      .select(col("__p").as("threshold"), col("__tp").as("tp"),
        col("__fp").as("fp"), col("__fn").as("fn"),
        when(col("__tp") + col("__fp") > 0,
          round(col("__tp").cast("double") / (col("__tp") + col("__fp")),
            roundDp)).otherwise(lit(0.0)).as("precision"),
        when(col("__pos") > 0,
          round(col("__tp").cast("double") / col("__pos"), roundDp))
          .otherwise(lit(0.0)).as("recall"),
        col("__f1").as("f1"))
  }

  /** Split-conformal prediction threshold + holdout coverage — the
    * distribution-free uncertainty wrapper for ANY scored classifier
    * (Vovk; the modern deployment answer to "how confident is this
    * filter"): on a calibration split, take the
    * `ceil((n+1)(1-alpha))`-th smallest nonconformity score
    * (`s = |y - p|`, the probability mass on the wrong side); on a
    * disjoint eval split, measure how often `s <= threshold` — the
    * conformal guarantee says ~`1-alpha` regardless of the model being
    * right. One row: `(n_cal, threshold, n_eval, coverage)`.
    *
    * Determinism: probabilities arrive 6-dp-rounded, nonconformity lifts
    * to micro-units, the quantile is EXACT integer rank selection under
    * `(s, id)` (`ceil((n+1)*(1-aNum/aDen))` in pure integers, clamped to
    * n), and coverage is one division.
    *
    * Scale shape: one rank window over the calibration split, a 1-row
    * threshold broadcast into the eval aggregate.
    */
  def conformalThreshold(scored: DataFrame, idCol: String, probCol: String,
                         labelCol: String, calCol: Column,
                         aNum: Int = 1, aDen: Int = 10): DataFrame = {
    require(aNum > 0 && aDen > aNum, "need 0 < alpha = aNum/aDen < 1")
    import org.apache.spark.sql.expressions.Window
    val s = round(abs(col(labelCol).cast("double") - col(probCol)) * 1e6, 0)
      .cast("long")
    val base = scored
      .filter(col(probCol).isNotNull && col(labelCol).isNotNull)
      .select(col(idCol).as("__id"), s.as("__s"), calCol.as("__cal"))
    val cal = base.filter(col("__cal"))
    val w = Window.orderBy(col("__s"), col("__id"))
    val ranked = cal
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    // rank = min(n, ceil((n+1) * (aDen-aNum) / aDen)) in pure integers
    val rank = least(col("__n"),
      (((col("__n") + 1) * (aDen - aNum) + (aDen - 1)) / aDen).cast("long"))
    val thr = ranked.filter(col("__rn") === rank)
      .select(col("__n").as("n_cal"), col("__s").as("__thr"))
    val eval0 = base.filter(!col("__cal"))
    // LEFT join, not crossJoin (the funnelLatency annihilation class): an
    // EMPTY calibration split must yield one row with null
    // n_cal/threshold/coverage and the real n_eval — not an empty frame a
    // caller cannot distinguish from "no data at all".
    eval0.join(broadcast(thr), lit(true), "left")
      .agg(first(col("n_cal")).as("n_cal"),
        round(first(col("__thr")).cast("double") / 1e6, 6).as("threshold"),
        count(lit(1)).as("n_eval"),
        round(sum((col("__s") <= col("__thr")).cast("long")).cast("double") /
          count(lit(1)), 6).as("coverage"))
  }

  /** Per-row feature attribution for the linear classifier: each
    * feature's logit contribution `w_j * (x_j - mean_j)` against the
    * corpus-mean baseline — the "WHY was this document scored down"
    * explanation a curation reviewer needs before trusting a filter
    * (exact SHAP for a linear model under feature independence). One row
    * per input row: `(id, top_feature, contribution, logit)` — the
    * largest-|contribution| feature (ties by feature name), with the
    * full logit for context.
    *
    * Determinism: weights and features are 6-dp by the training
    * contract; means are DECIMAL-exact then rounded; every contribution
    * is rounded BEFORE the argmax comparison so the winner is decided on
    * the emitted values.
    */
  def featureAttribution(df: DataFrame, idCol: String,
                         featureCols: Seq[String], weights: Array[Double],
                         roundDp: Int = 6): DataFrame = {
    require(weights.length == featureCols.length + 1,
      s"weights (${weights.length}) must be features+bias (${featureCols.length + 1})")
    val means = df.agg(
      featureCols.map(c => round(
        sum(col(c).cast("decimal(24,6)")).cast("double") / count(lit(1)),
        roundDp).as(s"__m_$c")).head,
      featureCols.map(c => round(
        sum(col(c).cast("decimal(24,6)")).cast("double") / count(lit(1)),
        roundDp).as(s"__m_$c")).tail: _*)
    val withM = df.crossJoin(broadcast(means))
    val contribs = featureCols.zipWithIndex.map { case (c, j) =>
      struct(
        round(lit(weights(j + 1)) * (col(c) - col(s"__m_$c")), roundDp)
          .as("c"),
        lit(c).as("f"))
    }
    val best = array_sort(array(contribs: _*),
      (a, b) => when(abs(a("c")) > abs(b("c")), -1)
        .when(abs(a("c")) < abs(b("c")), 1)
        .when(a("f") < b("f"), -1).when(a("f") > b("f"), 1)
        .otherwise(0))
    withM.select(col(idCol),
      element_at(best, 1).getField("f").as("top_feature"),
      element_at(best, 1).getField("c").as("contribution"),
      round(z(weights, featureCols.map(col)), roundDp).as("logit"))
  }

  /** Leave-one-out target encoding with additive smoothing — the
    * categorical-feature transform tabular models actually train on
    * (naive per-category target means leak the row's own label; LOO
    * removes it, the prior damps rare categories toward the global mean):
    * `enc_i = (sum_cat - y_i + m * SY/N) / (n_cat - 1 + m)`.
    *
    * Exact arithmetic: with integer targets the encoding rewrites to
    * `((sum_cat - y_i) * N + m * SY) / (N * (n_cat - 1 + m))` — exact
    * BIGINT numerator and denominator, ONE division per row. A singleton
    * category collapses to exactly the global mean (the graceful LOO
    * edge naive implementations divide by zero on).
    *
    * Output: input rows + `enc` (rounded). Scale shape: one
    * map-side-combined aggregate to the category domain, broadcast back;
    * the encoding itself is a narrow codegen'd pass.
    */
  def targetEncodeLoo(df: DataFrame, idCol: String, catCol: String,
                      targetCol: String, m: Long = 10L,
                      roundDp: Int = 6): DataFrame = {
    require(m >= 1, s"smoothing m must be >= 1, got $m")
    val base = df.filter(col(catCol).isNotNull && col(targetCol).isNotNull)
      .select(col(idCol), col(catCol).as("category"),
        col(targetCol).cast("long").as("y"))
    val cats = base.groupBy(col("category"))
      .agg(count(lit(1)).as("__nc"), sum(col("y")).as("__sc"))
    val glob = base.agg(count(lit(1)).as("__n"), sum(col("y")).as("__sy"))
    base.join(broadcast(cats), Seq("category")).crossJoin(broadcast(glob))
      .select(col(idCol), col("category"), col("y"),
        round(((col("__sc") - col("y")).cast("double") * col("__n") +
          lit(m).cast("double") * col("__sy")) /
          (col("__n").cast("double") * (col("__nc") - 1 + m)), roundDp)
          .as("enc"))
  }

  /** Murphy decomposition of the Brier score over the calibration bins —
    * the quantitative companion to [[calibrationFrame]]'s reliability
    * diagram: `brier = reliability - resolution + uncertainty` (up to
    * within-bin variance), separating "the probabilities are miscalibrated"
    * (reliability, want 0) from "the classifier can't discriminate"
    * (resolution, want large) from the label base-rate floor
    * (uncertainty). The decision this feeds: recalibrate (high
    * reliability) vs retrain (low resolution).
    *
    * One row per occupied bin:
    * `(bin, n, rel_term, res_term, brier, uncertainty)` — the two global
    * scalars repeat on every row (the gate artifact stays a single flat
    * frame). Determinism: probabilities arrive 6-dp-rounded and lift to
    * exact integer micro-units, labels are 0/1, so every numerator is an
    * exact integer and each output is one fixed-shape division chain:
    *   rel_term = (sum_pu - 1e6*sum_y)^2 / n_b / 1e12 / N
    *   res_term = (sum_y*N - SY*n_b)^2 / n_b / N / N / N
    *   brier    = sum((pu - 1e6*y)^2) / N / 1e12
    *   uncertainty = SY*(N-SY) / N^2
    * (squares computed in double so a 100 TB corpus cannot overflow the
    * integer path; identical shape in the oracle).
    *
    * Scale shape: one map-side-combined shuffle to the bin table, 1-row
    * globals broadcast — same regime as [[calibrationFrame]].
    */
  def brierDecomposition(scored: DataFrame, probCol: String, labelCol: String,
                         bins: Int = 10, roundDp: Int = 6): DataFrame = {
    require(bins > 0, "bins must be positive")
    val micro = 1000000L
    val pu = round(col(probCol) * micro, 0).cast("long")
    val y = col(labelCol).cast("long")
    val bin = least(floor(col(probCol) * bins), lit(bins - 1)).cast("long")
    val perBin = scored
      .filter(col(probCol).isNotNull && col(labelCol).isNotNull)
      .select(bin.as("bin"), pu.as("__pu"), y.as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__pu")).as("__sp"),
        sum(col("__y")).as("__sy"),
        sum((col("__pu") - lit(micro) * col("__y")).cast("double") *
          (col("__pu") - lit(micro) * col("__y"))).as("__sq"))
    val glob = perBin.agg(sum(col("n")).as("__nt"), sum(col("__sy")).as("__syt"),
      sum(col("__sq")).as("__sqt"))
    val dp = (col("__sp") - lit(micro) * col("__sy")).cast("double")
    val dy = (col("__sy") * col("__nt") - col("__syt") * col("n")).cast("double")
    perBin.crossJoin(broadcast(glob))
      .select(col("bin"), col("n"),
        round(dp * dp / col("n") / lit(1.0e12) / col("__nt"), roundDp)
          .as("rel_term"),
        round(dy * dy / col("n") / col("__nt") / col("__nt") / col("__nt"),
          roundDp).as("res_term"),
        round(col("__sqt") / col("__nt") / lit(1.0e12), roundDp).as("brier"),
        round((col("__syt") * (col("__nt") - col("__syt"))).cast("double") /
          (col("__nt") * col("__nt")), roundDp).as("uncertainty"))
  }

  /** Cohen's kappa between two categorical rater columns — the
    * inter-annotator-agreement audit of a labeling pipeline (two human
    * annotators, or a new quality classifier vs the incumbent): observed
    * agreement corrected for the agreement two raters with these marginal
    * label distributions would reach by chance.
    *
    * One row: `n` (co-rated rows — rows where either rater is null are
    * excluded), `po` (observed agreement), `pe` (chance agreement from the
    * marginals), `kappa`. With integer cell counts the whole computation
    * is exact until the final division:
    * `kappa = (n*agree - sum_k margA_k*margB_k) / (n^2 - sum_k margA_k*margB_k)`
    * — both operands are exact BIGINTs, so the one double division is
    * bit-identical across engines. Degenerate marginals (both raters
    * constant -> pe = 1, denominator 0) yield kappa = 0.0 by convention:
    * a constant rater carries no information beyond chance.
    *
    * Scale shape: ONE map-side-combined shuffle to the label-pair domain
    * (`|A| x |B|` cells); marginals and the final row are aggregates over
    * that tiny cell table — the corpus is scanned once (the three cell
    * consumers share the identical scan->partial-agg->shuffle subtree,
    * which ReusedExchange executes once).
    */
  def cohenKappa(df: DataFrame, raterACol: String, raterBCol: String,
                 roundDp: Int = 6): DataFrame = {
    val cells = df
      .filter(col(raterACol).isNotNull && col(raterBCol).isNotNull)
      .groupBy(col(raterACol).as("__ra"), col(raterBCol).as("__rb"))
      .agg(count(lit(1)).as("__n_cell"))
    val margA = cells.groupBy(col("__ra").as("__label"))
      .agg(sum(col("__n_cell")).as("__na"))
    val margB = cells.groupBy(col("__rb").as("__label"))
      .agg(sum(col("__n_cell")).as("__nb"))
    // Inner join: a label missing from one rater's marginals contributes 0
    // to the chance product either way.
    val sumProd = margA.join(margB, "__label")
      .agg(coalesce(sum(col("__na") * col("__nb")), lit(0L)).as("__sum_prod"))
    val totals = cells.agg(
      sum(col("__n_cell")).as("__n"),
      sum(when(col("__ra") === col("__rb"), col("__n_cell"))
        .otherwise(lit(0L))).as("__agree"))
    totals.crossJoin(sumProd).select(
      col("__n").cast("long").as("n"),
      round(col("__agree").cast("double") / col("__n"), roundDp).as("po"),
      round(col("__sum_prod").cast("double") / (col("__n") * col("__n")),
        roundDp).as("pe"),
      when(col("__n") * col("__n") === col("__sum_prod"), lit(0.0))
        .otherwise(round(
          (col("__n") * col("__agree") - col("__sum_prod")).cast("double") /
            (col("__n") * col("__n") - col("__sum_prod")), roundDp))
        .as("kappa"))
  }

  /** Reliability diagram over a scored frame: equal-width probability bins
    * (the last bin closed at 1.0), each with its row count, mean predicted
    * probability, empirical positive rate, and |gap| — the per-bin view
    * behind expected-calibration-error, the companion diagnostic to
    * [[aucFrame]] (AUC says the RANKING is good; calibration says the
    * PROBABILITIES mean what they claim — what a filter-threshold decision
    * actually consumes).
    *
    * Determinism: probabilities arrive 6-dp-rounded (the classifier's
    * output contract), so summing them as `decimal` is exact and
    * order-independent; labels are 0/1. One groupBy over `bins` keys — a
    * single map-side-combined shuffle, any corpus size.
    */
  def calibrationFrame(scored: DataFrame, probCol: String, labelCol: String,
                       bins: Int = 10, roundDp: Int = 6): DataFrame = {
    require(bins > 0, "bins must be positive")
    val bin = least(floor(col(probCol) * bins), lit(bins - 1)).cast("long")
    val meanProb = round(
      sum(col(probCol).cast("decimal(16,6)")).cast("double") / count(lit(1)), roundDp)
    val posRate = round(sum(col(labelCol)) / count(lit(1)), roundDp)
    scored.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"), meanProb.as("mean_prob"),
        posRate.as("pos_rate"))
      .withColumn("gap", round(abs(col("mean_prob") - col("pos_rate")), roundDp))
  }
}
