package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass corpus/table profiling — the data-quality report a pipeline
  * runs before and after every curation stage (did dedup drop a language?
  * did a schema change null out a column?).
  *
  * One global aggregate computes every metric for every requested column in
  * a single scan: the parquet read prunes to exactly the profiled columns,
  * partial aggregation runs map-side, and the only movement is the
  * fixed-size partial-aggregate merge — no groupBy shuffle of data rows at
  * any corpus size. The wide 1-row aggregate is then unpivoted to one row
  * per column.
  *
  * `exactDistinct = true` uses `count(DISTINCT col)` (Spark expands the
  * aggregate — one pass but rows replicate per distinct-column; exact, the
  * oracle-checkable regime). The default approximates with HyperLogLog++
  * (`approx_count_distinct`, fixed-size sketch per column — the 100 TB
  * regime).
  */
object Profile {

  /** Class-balance report over a label column — the dataset-card staple
    * for classifier/eval-set prep: class count, row count, the majority
    * share, and the normalized label entropy (H / ln k: 1 = perfectly
    * balanced, → 0 = one class dominates). Entropy terms are folded in
    * LABEL-ASCENDING order (the [[graft.operators.TextAnalysis.charEntropy]]
    * discipline) so the floating sum is deterministic and
    * oracle-replayable. One partial-aggregating shuffle to |classes| rows,
    * then a 1-row fold.
    */
  def classBalance(df: DataFrame, labelCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val counts = df.groupBy(col(labelCol).as("__l"))
      .agg(count(lit(1)).as("__c"))
    counts.agg(
        count(lit(1)).as("n_classes"),
        sum(col("__c")).as("n_rows"),
        max(col("__c")).as("__mx"),
        transform(sort_array(collect_list(struct(col("__l"), col("__c")))),
          s => s.getField("__c")).as("__a"))
      .select(col("n_classes"), col("n_rows"),
        round(col("__mx").cast("double") / col("n_rows"), 6).as("max_share"),
        when(col("n_classes") > 1,
          round(-aggregate(col("__a"), lit(0.0), (acc, c) =>
            acc + (c.cast("double") / col("n_rows")) *
              log(c.cast("double") / col("n_rows"))) /
            log(col("n_classes").cast("double")), 6))
          .otherwise(lit(0.0)).as("entropy_norm"))
  }

  /** Gini concentration of a weight distribution over groups — "how
    * dominated is the corpus by a few sources/domains?" as one number
    * (0 = perfectly even, →1 = one group holds everything). The
    * diversity-tracking complement of [[graft.operators.Profile]]'s
    * per-group slices and `zipfFit`'s rank-frequency slope.
    *
    * Exact formulation: with weights sorted ascending (1-indexed),
    * `G = 2·Σ i·x_i / (n·Σx) − (n+1)/n`. Σ i·x_i is tie-invariant
    * (permuting equal weights leaves it unchanged), so the sort needs no
    * tie-break; every term is an integer sum, the division shape is
    * pinned, output rounds to 6dp. Emits one row:
    * `(n_groups, total_weight, gini)`.
    *
    * Scale: the input is one row per GROUP (sources, domains), so the
    * single-partition window ranks a group-bounded table, never the
    * corpus.
    */
  def giniConcentration(weights: DataFrame, weightCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(weightCol))
    weights.select(col(weightCol).cast("long").as("__x"),
        row_number().over(w).cast("long").as("__i"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("__x")).as("total_weight"),
        sum(col("__i") * col("__x")).as("__sw"))
      .select(col("n_groups"), col("total_weight"),
        when(col("n_groups") > 0 && col("total_weight") > 0,
          round(lit(2.0) * col("__sw") /
            (col("n_groups") * col("total_weight")) -
            (col("n_groups") + lit(1.0)) / col("n_groups"), 6))
          .otherwise(lit(0.0)).as("gini"))
  }

  /** Referential-integrity audit for one child→parent relationship — the
    * data-quality staple a warehouse runs after every load: child-side
    * row/key counts, the orphan count (child keys with no parent row,
    * counted over rows and over distinct keys), and coverage. One row out.
    *
    * Scale shape: a left-anti join on the key (AQE broadcasts the smaller
    * side) plus key-level partial aggregates — no row-level wide state.
    */
  def fkOrphans(child: DataFrame, childKey: String,
                parent: DataFrame, parentKey: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val orphanRows = child
      .join(parent.select(col(parentKey)).distinct(),
        child(childKey) === col(parentKey), "left_anti")
    val totals = child.agg(
      count(lit(1)).as("n_child_rows"),
      countDistinct(col(childKey)).as("n_child_keys"))
    val orphans = orphanRows.agg(
      count(lit(1)).as("n_orphan_rows"),
      countDistinct(col(childKey)).as("n_orphan_keys"))
    totals.crossJoin(orphans)
      .select(col("n_child_rows"), col("n_child_keys"),
        col("n_orphan_rows"), col("n_orphan_keys"),
        when(col("n_child_keys") > 0,
          round((col("n_child_keys") - col("n_orphan_keys")).cast("double") /
            col("n_child_keys").cast("double"), 6))
          .otherwise(lit(1.0)).as("key_coverage"))
  }

  /** Profile numeric columns: `(col_name, n, n_null, n_distinct, min_v,
    * max_v)`, one row per requested column, values as doubles.
    */
  def numeric(df: DataFrame, cols: Seq[String],
              exactDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "graft.Profile: no columns to profile")
    require(cols.distinct.size == cols.size,
      s"graft.Profile: duplicate columns in ${cols.mkString(", ")}")
    val aggs = cols.flatMap { c =>
      val v = col(c)
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(when(v.isNull, lit(1))).as(s"__nnull_$c"),
        (if (exactDistinct) countDistinct(v) else approx_count_distinct(v))
          .as(s"__ndist_$c"),
        min(v).cast("double").as(s"__min_$c"),
        max(v).cast("double").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"), col(s"__n_$c").as("n"),
        col(s"__nnull_$c").as("n_null"), col(s"__ndist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_v"), col(s"__max_$c").as("max_v"))
    }
    wide.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }

  /** [[numeric]] stratified by `groupCol` — the per-language / per-domain
    * slice report (did curation starve a language? is one domain's doc
    * length collapsing?). Same single-scan shape with a groupBy on the
    * stratum key: partials still combine map-side, and only
    * `groups x cols` aggregate rows move — the stratum cardinality
    * (languages, domains) is orders of magnitude below row count at any
    * corpus size.
    */
  def numericBy(df: DataFrame, groupCol: String, cols: Seq[String],
                exactDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "graft.Profile: no columns to profile")
    require(cols.distinct.size == cols.size,
      s"graft.Profile: duplicate columns in ${cols.mkString(", ")}")
    require(!cols.contains(groupCol),
      s"graft.Profile: group column $groupCol cannot also be profiled")
    val aggs = cols.flatMap { c =>
      val v = col(c)
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(when(v.isNull, lit(1))).as(s"__nnull_$c"),
        (if (exactDistinct) countDistinct(v) else approx_count_distinct(v))
          .as(s"__ndist_$c"),
        min(v).cast("double").as(s"__min_$c"),
        max(v).cast("double").as(s"__max_$c"))
    }
    val wide = df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"), col(s"__n_$c").as("n"),
        col(s"__nnull_$c").as("n_null"), col(s"__ndist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_v"), col(s"__max_$c").as("max_v"))
    }
    wide.select(col(groupCol), explode(array(stacked: _*)).as("p"))
      .select(col(groupCol), col("p.*"))
  }

  /** Zipf's-law fit over the corpus vocabulary: OLS of `ln(freq)` on
    * `ln(rank)`. Natural-language corpora fit a slope near -1 with high
    * r-squared (Piantadosi 2014's review of Zipf's word-frequency law);
    * templated, machine-generated, or truncated-vocabulary corpora deviate
    * — a one-row corpus-health signal for intake QA.
    *
    * Output: `(n_terms, slope, intercept, r2)`, 6-dp; degenerate inputs
    * (under 2 distinct terms, or zero variance in either axis) yield null
    * fit columns instead of division blowups.
    *
    * Scale shape: one map-side-combined term count; ranking is a
    * single-partition window over DISTINCT TERMS ONLY (vocabulary-sized,
    * the [[Dsir.selectTopFraction]] posture — never the corpus); then a
    * 1-row moment aggregate.
    */
  /** Robust per-group outlier report over one numeric column: median, MAD
    * (median absolute deviation), and how many rows sit outside
    * `median ± k * MAD` — the robust z-score curation signal (a source
    * whose length distribution needs mean/stddev screening gets wrecked by
    * the very outliers being hunted; median/MAD doesn't). Output one row
    * per group: `(group, n, med_v, mad_v, n_outliers, outlier_frac)`.
    * `mad_v = 0` (constant-valued group) flags any deviating row — there
    * are none by construction, so the group reports 0 outliers.
    *
    * Scale shape: exact interpolated percentiles are per-group sort-based
    * aggregates (the `event_percentiles` cost class); the two aggregate
    * passes join back through a group-cardinality-sized broadcast, and the
    * data rows themselves shuffle only on the group key. At web scale swap
    * `percentile` for `approx_percentile` (t-digest) — same contract,
    * approximate cutpoints.
    */
  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String,
                     k: Double = 3.0): DataFrame = {
    val v = col(valueCol).cast("double")
    val base = df.select(col(groupCol), v.as("__v"))
    val med = base.groupBy(col(groupCol))
      .agg(expr("percentile(__v, 0.5)").as("__med"))
    val mad = base.join(med, Seq(groupCol))
      .select(col(groupCol), col("__med"), abs(col("__v") - col("__med")).as("__ad"))
      .groupBy(col(groupCol))
      .agg(max(col("__med")).as("__med2"), expr("percentile(__ad, 0.5)").as("__mad"))
    base.join(mad, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        round(max(col("__med2")), 6).as("med_v"),
        round(max(col("__mad")), 6).as("mad_v"),
        sum((abs(col("__v") - col("__med2")) > lit(k) * col("__mad"))
          .cast("long")).as("n_outliers"))
      .withColumn("outlier_frac",
        round(col("n_outliers").cast("double") / col("n"), 6))
  }

  /** Per-group percent-rank calibration of a score column: appends
    * `pct_rank` in [0,1] computed WITHIN each group — the rank-based
    * normalization that makes one quality threshold comparable across
    * sources whose raw score distributions differ (a 0.6 from a
    * clean-books source and a 0.6 from a web crawl are not the same
    * signal; their within-source percentiles are). Ties share a rank
    * (percent_rank semantics), so the output is deterministic without a
    * tie-break key; single-member groups calibrate to 0.0.
    *
    * Scale shape: one window per group (hash-partitioned on the group
    * key) — the CCNet-banding cost class; a skewed mega-group pays its
    * sort, with sampled cutpoints as the web-scale escape hatch.
    */
  def percentRankBy(df: DataFrame, groupCol: String, scoreCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(scoreCol))
    df.withColumn("pct_rank", round(percent_rank().over(w), 6))
  }

  def zipfFit(df: DataFrame, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cf = Partitioning.ensureParallelism(df)
      .select(explode(TextAnalysis.toks(col(textCol))).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__cf"))
    val pts = cf.withColumn("__rank",
        row_number().over(Window.orderBy(col("__cf").desc, col("__t"))))
      .select(log(col("__rank").cast("double")).as("__x"),
        log(col("__cf").cast("double")).as("__y"))
    val s = pts.agg(count(lit(1)).cast("double").as("__n"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__x") * col("__y")).as("__sxy"),
      sum(col("__y") * col("__y")).as("__syy"))
    val n = col("__n"); val sx = col("__sx"); val sy = col("__sy")
    val cov = n * col("__sxy") - sx * sy
    val varX = n * col("__sxx") - sx * sx
    val varY = n * col("__syy") - sy * sy
    val slope = cov / varX
    s.select(n.cast("long").as("n_terms"),
      when(varX > 0, round(slope, 6)).as("slope"),
      when(varX > 0, round((sy - slope * sx) / n, 6)).as("intercept"),
      when(varX > 0 && varY > 0, round(cov * cov / (varX * varY), 6)).as("r2"))
  }

  /** Vocabulary coverage curve: what fraction of corpus TOKEN MASS the
    * top-k word types cover, for each requested k — the Zipf-in-practice
    * number behind vocab-size decisions (a tokenizer whose top-1000 types
    * cover 95% of tokens spends its remaining budget on the 5% tail) and
    * the drift alarm's cheap cousin (coverage at fixed k drops when new
    * jargon floods in). One row per k: top-type count (= min(k, |vocab|)),
    * covered and total token counts, distinct type count, and coverage.
    *
    * Scale shape: one explode + partial-aggregating shuffle to the
    * vocab-bounded count table (checkpointed once — it feeds |ks| top-k
    * probes plus the total), then per-k `TakeOrderedAndProject` heaps.
    * Ranking ties break by term, so every cut is deterministic.
    */
  def vocabCoverage(df: DataFrame, textCol: String,
                    ks: Seq[Int] = Seq(10, 100, 1000)): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), "ks must be positive")
    val counts = Partitioning.ensureParallelism(df)
      .select(explode(TextAnalysis.toks(col(textCol))).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val total = counts.agg(sum(col("__c")).as("__tot"),
      count(lit(1)).as("n_types"))
    val perK = ks.map { k =>
      counts.orderBy(col("__c").desc, col("__t")).limit(k)
        .agg(count(lit(1)).as("n_top_types"),
          sum(col("__c")).as("covered_tokens"))
        .withColumn("k", lit(k.toLong))
    }.reduce(_ unionByName _)
    perK.crossJoin(total)
      .select(col("k"), col("n_top_types"), col("covered_tokens"),
        col("__tot").as("total_tokens"), col("n_types"),
        round(col("covered_tokens").cast("double") / col("__tot"), 6)
          .as("coverage"))
  }

  /** Most-duplicated word n-grams across the corpus — the boilerplate
    * radar: templated headers, licence blocks, and navigation chrome
    * surface as n-grams whose occurrence count dwarfs their document
    * count, BEFORE any dedup decision is taken. Emits the top `k`
    * duplicated n-grams (occurrences >= `minCount`) with both counts,
    * ranked by (occurrences desc, n-gram asc) — a total order, so the
    * cut at k is deterministic and oracle-checkable.
    *
    * Scale shape: n-gram explosion is a narrow generator; the groupBy
    * partial-aggregates map-side (dominant singleton mass collapses
    * before the shuffle), and the top-k is a `TakeOrderedAndProject` —
    * per-partition heaps, never a global sort of the n-gram table.
    */
  def topDuplicatedNgrams(df: DataFrame, textCol: String, idCol: String,
                          n: Int = 5, minCount: Long = 2,
                          k: Int = 50): DataFrame = {
    require(k >= 1 && minCount >= 1, "k and minCount must be >= 1")
    Partitioning.ensureParallelism(df)
      .select(col(idCol).as("__id"),
        explode(TextAnalysis.wordNgrams(col(textCol), n)).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("n_occ"), countDistinct(col("__id")).as("n_docs"))
      .filter(col("n_occ") >= minCount)
      .orderBy(col("n_occ").desc, col("ngram"))
      .limit(k)
  }

  /** Per-ROW robust outlier flags — the row-level companion of
    * [[robustOutliers]] (which emits per-group summaries): every input row
    * comes back with its group's exact median and MAD and an `is_outlier`
    * flag (`|v − med| > k·MAD`). This is the actionable form — WHICH days
    * spiked, WHICH documents ballooned — where the summary only says
    * something did. A zero-MAD group (over half its values identical)
    * flags any row off the median, matching [[robustOutliers]].
    *
    * Scale shape: two exact-percentile aggregates over |groups|-bounded
    * tables plus two broadcast-sized joins back — the row table shuffles
    * on the group key once and is never windowed.
    */
  def robustFlags(df: DataFrame, groupCol: String, valueCol: String,
                  k: Double = 3.0): DataFrame = {
    val v = col(valueCol).cast("double")
    val med = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("__med"))
    val withMed = df.join(med, Seq(groupCol))
    val mad = withMed
      .select(col(groupCol), abs(v - col("__med")).as("__ad"))
      .groupBy(col(groupCol))
      .agg(expr("percentile(__ad, 0.5)").as("__mad"))
    withMed.join(mad, Seq(groupCol))
      .withColumn("med_v", round(col("__med"), 6))
      .withColumn("mad_v", round(col("__mad"), 6))
      .withColumn("is_outlier",
        abs(v - col("__med")) > lit(k) * col("__mad"))
      .drop("__med", "__mad")
  }

  /** Per-group winsorized statistics — outlier-robust means without
    * dropping rows: values are clipped to the group's EXACT [pLo, pHi]
    * percentiles (linear-interpolation order statistics, the
    * [[robustOutliers]] exactness regime) and the report carries both raw
    * and winsorized means plus how many rows each fence touched. The
    * metric-stabilization step before comparing event values or doc
    * lengths across skewed groups.
    *
    * Both means fold through `decimal(18,6)` so the sums are exact and
    * engine-identical (floating accumulation order never shows up in the
    * 6dp output). Two exact-percentile aggregates over |groups|-bounded
    * tables, two broadcast joins back, one final aggregate — the row
    * table is never windowed.
    */
  def winsorizedStats(df: DataFrame, groupCol: String, valueCol: String,
                      pLo: Double = 0.01, pHi: Double = 0.99): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, "need 0 <= pLo < pHi <= 1")
    val v = col(valueCol).cast("double")
    // null values carry no information for fences OR means — drop them up
    // front so n / clip counts / means all describe the same population
    val rows = df.filter(col(valueCol).isNotNull)
    val fences = rows.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, $pLo)").as("__lo"),
        expr(s"percentile($valueCol, $pHi)").as("__hi"))
    // fences are pinned to 6dp BEFORE clipping, so every winsorized value
    // is either an input value or an exactly-6dp fence — the decimal cast
    // below is then rounding-mode-independent across engines
    rows.join(fences, Seq(groupCol))
      .select(col(groupCol), round(col("__lo"), 6).as("__lo"),
        round(col("__hi"), 6).as("__hi"), v.as("__v"))
      .withColumn("__w", greatest(least(col("__v"), col("__hi")), col("__lo")))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum((col("__v") < col("__lo")).cast("long")).as("n_clipped_lo"),
        sum((col("__v") > col("__hi")).cast("long")).as("n_clipped_hi"),
        min(col("__lo")).as("fence_lo"),
        min(col("__hi")).as("fence_hi"),
        // exact decimal sum, ONE double division, 6dp: engine-identical
        round(sum(col("__v").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("mean_raw"),
        round(sum(col("__w").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("mean_winsorized"))
  }

  /** Hill tail-index estimator over a positive numeric column — "how
    * heavy is the tail?" as one number. Fit on the top `k+1` order
    * statistics: `gamma = mean_{i<=k}(ln x_(i) − ln x_(k+1))`,
    * `alpha = 1/gamma` (Pareto tail exponent; smaller alpha = heavier
    * tail). Corpus length distributions are the classic subject — a crawl
    * whose doc-length alpha drifts below ~1.5 is accumulating pathological
    * mega-documents faster than content.
    *
    * Emits one row: `(k, x_tail, gamma, alpha)` rounded to 6. Order
    * statistics are a multiset, so value ties at the cut need no
    * tie-break — the result is deterministic and oracle-checkable.
    *
    * Scale shape: a `TakeOrderedAndProject` top-(k+1) (per-partition
    * heaps, one k-row merge — no global sort), then a 1-row aggregate.
    */
  def hillTailIndex(df: DataFrame, valueCol: String, k: Int = 100): DataFrame = {
    require(k >= 2, "Hill estimator needs k >= 2")
    val top = df.select(col(valueCol).cast("double").as("__x"))
      .filter(col("__x") > 0)
      .orderBy(col("__x").desc)
      .limit(k + 1)
    top.agg(count(lit(1)).as("__n"), min(col("__x")).as("__xt"),
        sum(log(col("__x"))).as("__slog"))
      .select(
        (col("__n") - 1).cast("long").as("k"),
        round(col("__xt"), 6).as("x_tail"),
        (col("__slog") - col("__n") * log(col("__xt"))).as("__g"),
        col("__n"))
      .select(col("k"), col("x_tail"),
        round(col("__g") / col("k"), 6).as("gamma"),
        // degenerate tail (all top values equal) has no finite exponent
        when(col("__g") > 0, round(col("k") / col("__g"), 6)).as("alpha"))
  }

  /** Mutual information (nats) between two categorical columns — the
    * dependence audit behind corpus-mix decisions: MI(source; lang) near
    * zero means sources are language-balanced, high MI means language
    * coverage is hostage to specific sources (dropping one drops a
    * language). Emits one row: cell/marginal cardinalities, entropies of
    * both columns, `mi_nats`, and the normalized `mi_norm = MI /
    * min(H(a), H(b))` in [0,1] (0 when either column is constant).
    *
    * Exact counts; the MI sum runs over |A|x|B| occupied cells — bounded
    * by the categorical domains, never the corpus. Null categories count
    * as their own level (dropping them would hide a skewed null pattern).
    *
    * Scale shape: one partial-aggregating shuffle to the joint table;
    * marginals and entropies derive from it without touching rows again.
    */
  def mutualInformation(df: DataFrame, colA: String, colB: String): DataFrame = {
    // Nulls must survive the marginal JOINS below (equi-joins drop null
    // keys even though groupBy keeps them) — fold them into a sentinel
    // level up front (the sentinel cannot collide with a cast categorical).
    def lvl(c: String) = coalesce(col(c).cast("string"), lit("\u0000<null>"))
    val joint = df.groupBy(lvl(colA).as("__a"), lvl(colB).as("__b"))
      .agg(count(lit(1)).as("__c"))
    val totals = joint.agg(count(lit(1)).as("n_cells"),
      sum(col("__c")).as("__nr"))
    val margA = joint.groupBy(col("__a")).agg(sum(col("__c")).as("__ca"))
    val margB = joint.groupBy(col("__b")).agg(sum(col("__c")).as("__cb"))
    val entA = margA.crossJoin(totals.select(col("__nr").as("__n1")))
      .agg(count(lit(1)).as("n_a"),
        (-sum((col("__ca") / col("__n1")) *
          log(col("__ca") / col("__n1")))).as("__ha"))
    val entB = margB.crossJoin(totals.select(col("__nr").as("__n2")))
      .agg(count(lit(1)).as("n_b"),
        (-sum((col("__cb") / col("__n2")) *
          log(col("__cb") / col("__n2")))).as("__hb"))
    val mi = joint.join(margA, Seq("__a")).join(margB, Seq("__b"))
      .crossJoin(totals.select(col("__nr").as("__n3")))
      .agg(sum(col("__c") * (log(col("__c").cast("double")) +
        log(col("__n3").cast("double")) - log(col("__ca").cast("double")) -
        log(col("__cb").cast("double")))).as("__misum"))
    totals.crossJoin(entA).crossJoin(entB).crossJoin(mi)
      .select(col("n_cells"), col("n_a"), col("n_b"),
        col("__nr").cast("long").as("n_rows"),
        round(col("__ha"), 6).as("h_a"),
        round(col("__hb"), 6).as("h_b"),
        round(col("__misum") / col("__nr"), 6).as("mi_nats"),
        when(least(col("__ha"), col("__hb")) > 0,
          round((col("__misum") / col("__nr")) /
            least(col("__ha"), col("__hb")), 6))
          .otherwise(lit(0.0)).as("mi_norm"))
  }

  /** 2-D Pareto frontier (skyline): the rows not STRICTLY dominated under
    * (maximize `maximizeCol`, minimize `minimizeCol`) — the
    * quality-vs-cost selection curve of a curation budget ("which docs are
    * optimal trade-offs of quality score against token cost?"). A row is
    * dominated when some other row is >= on the maximize axis, <= on the
    * minimize axis, and strictly better on at least one; ties on both
    * axes survive together.
    *
    * Scale shape — the 2-D skyline needs NO pairwise pass: collapse to
    * per-maximize-value minima (one map-side-combined shuffle, bounded by
    * the value domain), one running-min window over THAT table ordered by
    * the maximize axis descending, then a semi-join back. A row survives
    * iff it attains its group's minimum AND that minimum beats every
    * strictly-higher group's (`min < prevMin`). Null on either axis
    * drops (dominance is undefined there).
    */
  def paretoFrontier(df: DataFrame, maximizeCol: String,
                     minimizeCol: String): DataFrame = {
    val clean = df.filter(col(maximizeCol).isNotNull &&
      col(minimizeCol).isNotNull)
    val groups = clean.groupBy(col(maximizeCol).as("__q"))
      .agg(min(col(minimizeCol)).as("__gl"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__q").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    val frontier = groups.withColumn("__prev", min(col("__gl")).over(w))
      .filter(col("__prev").isNull || col("__gl") < col("__prev"))
      .select(col("__q"), col("__gl"))
    clean.join(broadcast(frontier),
      col(maximizeCol) === col("__q") && col(minimizeCol) === col("__gl"))
      .drop("__q", "__gl")
  }

  /** Inclusion-dependency profile — candidate-foreign-key discovery, the
    * schema-inference audit a lakehouse runs over freshly landed tables:
    * for a declared (child column, parent column) pair, what fraction of
    * the child's distinct non-null values exist in the parent?
    * `containment = 1` is a verified inclusion dependency (FK candidate);
    * the threshold flags near-inclusions dirtied by a few orphans (the
    * row-level complement is [[fkOrphans]]).
    *
    * One row: `(pair, n_child_distinct, n_contained, containment,
    * fk_candidate)` — containment is one exact integer division, the flag
    * compares the ROUNDED value. Scale shape: two distinct-aggregates
    * (map-side combined, bounded by the key domains) and a domain-sized
    * join — never row-level.
    */
  def inclusionDependency(child: DataFrame, childCol: String,
                          parent: DataFrame, parentCol: String, pair: String,
                          threshold: Double = 0.95): DataFrame = {
    val c = child.filter(col(childCol).isNotNull)
      .select(col(childCol).cast("string").as("__v")).distinct()
    val p = parent.filter(col(parentCol).isNotNull)
      .select(col(parentCol).cast("string").as("__v")).distinct()
    c.join(p.withColumn("__hit", lit(1L)), Seq("__v"), "left")
      .agg(count(lit(1)).as("n_child_distinct"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_contained"))
      .select(lit(pair).as("pair"), col("n_child_distinct"),
        col("n_contained"),
        round(col("n_contained").cast("double") / col("n_child_distinct"), 6)
          .as("containment"))
      .withColumn("fk_candidate", col("containment") >= threshold)
  }

  /** Exact quantile-difference report between two numeric distributions:
    * for each decile, the rank-selected value on each side and the gap —
    * WHERE a shift lives, which a single KS statistic or PSI number hides
    * (a tail-only regression vs a uniform drift read identically there).
    * Values must be INTEGER-scaled by the caller; quantile `k/10` selects
    * rank `ceil(k*n/10)` under the total order (value, id) — pure integer
    * rank arithmetic, no interpolation, both engines pick the identical
    * element. One row per decile k=1..9:
    * `(q, x_a, x_b, diff)` with `diff = x_b - x_a` (exact).
    *
    * Scale shape: one rank window per side (value-ordered; at true scale
    * swap in the GK-sketch path audited by `percentile_sketch_audit` —
    * this exact formulation is the oracle-checkable regime).
    */
  def quantileDiff(a: DataFrame, b: DataFrame, valueCol: String,
                   idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def deciles(df: DataFrame, out: String): DataFrame = {
      val w = Window.orderBy(col(valueCol).cast("long"), col(idCol))
      val ranked = df.filter(col(valueCol).isNotNull)
        .withColumn("__rn", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      ranked.crossJoin(broadcast(
          ranked.sparkSession.range(1, 10).select(col("id").as("q"))))
        .filter(col("__rn") ===
          ((col("q") * col("__n") + 9) / 10).cast("long"))
        .select(col("q"), col(valueCol).cast("long").as(out))
    }
    deciles(a, "x_a").join(deciles(b, "x_b"), Seq("q"))
      .select(col("q"), col("x_a"), col("x_b"),
        (col("x_b") - col("x_a")).as("diff"))
  }

  /** Chi-square independence audit between two categorical columns: per
    * occupied cell, observed count vs the independence expectation
    * `e = row_total * col_total / N`, with the chi-square term — the
    * "are these two labels actually related" test behind balance checks
    * (is language independent of source? is label independent of
    * annotator?). One row per cell:
    * `(a, b, n, expected, chi2_term, chi2_total, dof)` — the two global
    * scalars repeat per row. `chi2_total` is the window sum of the
    * ROUNDED terms (each a 1e-6 multiple, so the final round cannot
    * straddle a boundary — the PSI trick); `dof = (|A|-1)(|B|-1)`.
    *
    * Scale shape: one map-side-combined shuffle to the |A| x |B| cell
    * table; marginals and totals are aggregates over that table,
    * broadcast back. Null categories are excluded.
    */
  def chiSquareIndependence(df: DataFrame, colA: String,
                            colB: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).as("a"), col(colB).as("b"))
      .agg(count(lit(1)).as("n"))
    val ra = cells.groupBy(col("a")).agg(sum(col("n")).as("__ra"))
    val cb = cells.groupBy(col("b")).agg(sum(col("n")).as("__cb"))
    val tot = cells.agg(sum(col("n")).as("__nt"),
      countDistinct(col("a")).as("__ka"), countDistinct(col("b")).as("__kb"))
    val expected = round(
      (col("__ra") * col("__cb")).cast("double") / col("__nt"), 6)
    val w = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    cells.join(broadcast(ra), "a").join(broadcast(cb), "b")
      .crossJoin(broadcast(tot))
      .withColumn("expected", expected)
      .withColumn("chi2_term",
        round((col("n") - col("expected")) * (col("n") - col("expected")) /
          col("expected"), 6))
      .withColumn("chi2_total", round(sum(col("chi2_term")).over(w), 6))
      .select(col("a"), col("b"), col("n"), col("expected"),
        col("chi2_term"), col("chi2_total"),
        ((col("__ka") - 1) * (col("__kb") - 1)).as("dof"))
  }

  /** Exact Pearson correlation per group PLUS the pooled row — the
    * Simpson's-paradox audit view: a pooled correlation whose sign flips
    * (or collapses) inside every group is a confounded aggregate, and
    * shipping it un-grouped is how dashboards lie. Inputs must be
    * INTEGER-scaled by the caller (cents, micro-units): every moment sum
    * is then an exact BIGINT and
    * `r = (n*sxy - sx*sy) / (sqrt(n*sxx - sx^2) * sqrt(n*syy - sy^2))`
    * is one fixed-shape chain. One row per group and one labeled
    * `pooledLabel` row: `(group, n, r)` — degenerate variance (constant
    * x or y) yields null r.
    *
    * Scale shape: both levels are single map-side-combined aggregates of
    * five products; nothing bigger than the group domain moves.
    */
  def pearsonByGroup(df: DataFrame, groupCol: String, xCol: String,
                     yCol: String, pooledLabel: String = "<pooled>",
                     roundDp: Int = 6): DataFrame = {
    val base = df.filter(col(groupCol).isNotNull && col(xCol).isNotNull &&
      col(yCol).isNotNull)
      .select(col(groupCol).cast("string").as("group"),
        col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
    def moments(d: DataFrame, g: Column): DataFrame =
      d.groupBy(g.as("group"))
        .agg(count(lit(1)).as("n"), sum(col("__x")).as("__sx"),
          sum(col("__y")).as("__sy"),
          sum(col("__x") * col("__y")).as("__sxy"),
          sum(col("__x") * col("__x")).as("__sxx"),
          sum(col("__y") * col("__y")).as("__syy"))
    val both = moments(base, col("group"))
      .unionByName(moments(base, lit(pooledLabel)))
    // moment COMBINATIONS go through double (fixed shape both engines):
    // n*sxx overflows BIGINT around 1e5 rows of 5-digit cents; the raw
    // sums themselves stay exact longs.
    val vx = col("n").cast("double") * col("__sxx") -
      col("__sx").cast("double") * col("__sx")
    val vy = col("n").cast("double") * col("__syy") -
      col("__sy").cast("double") * col("__sy")
    val cov = col("n").cast("double") * col("__sxy") -
      col("__sx").cast("double") * col("__sy")
    both.select(col("group"), col("n"),
      when(vx > 0 && vy > 0,
        round(cov / (sqrt(vx) * sqrt(vy)), roundDp))
        .otherwise(lit(null).cast("double")).as("r"))
  }

  /** Functional-dependency audit `lhs -> rhs`: does every distinct LHS
    * value map to exactly one RHS value? The schema-semantics complement
    * to [[inclusionDependency]] (FK candidates): FDs that SHOULD hold
    * (natural key -> attribute) and silently break are how denormalized
    * lakehouse tables rot. One row:
    * `(dependency, n_lhs, n_violating, max_rhs_per_lhs, holds)` —
    * `n_violating` counts LHS values with more than one RHS.
    *
    * Scale shape: distinct pairs first (map-side combined, bounded by the
    * pair domain), then an LHS-keyed count — never row-level. Null LHS or
    * RHS rows are excluded (a null determines nothing).
    */
  def functionalDependency(df: DataFrame, lhsCol: String, rhsCol: String,
                           dependency: String): DataFrame = {
    df.filter(col(lhsCol).isNotNull && col(rhsCol).isNotNull)
      .select(col(lhsCol).as("__l"), col(rhsCol).as("__r")).distinct()
      .groupBy(col("__l")).agg(count(lit(1)).as("__nr"))
      .agg(count(lit(1)).as("n_lhs"),
        sum(when(col("__nr") > 1, 1L).otherwise(0L)).as("n_violating"),
        max(col("__nr")).as("max_rhs_per_lhs"))
      .select(lit(dependency).as("dependency"), col("n_lhs"),
        col("n_violating"), col("max_rhs_per_lhs"),
        (col("n_violating") === 0).as("holds"))
  }

  /** Reversed-label domain hierarchy rollup: every host contributes a
    * count to each node on its public-suffix-rooted path
    * (`uk -> uk.co -> uk.co.example -> uk.co.example.www`) — the crawl
    * -analytics tree behind per-TLD/per-site budgets and block decisions.
    * One row per occupied node: `(node, depth, n_urls)`.
    *
    * Scale shape: label split + prefix expansion are codegen'd HOFs
    * (fan-out = label count, ~4), one map-side-combined aggregate to the
    * node domain.
    */
  def domainTree(df: DataFrame, hostCol: String): DataFrame = {
    val labels = reverse(split(lower(col(hostCol)), "\\."))
    val prefixes = transform(sequence(lit(1), size(labels)),
      d => array_join(slice(labels, lit(1), d), "."))
    df.filter(col(hostCol).isNotNull)
      .select(posexplode(prefixes).as(Seq("__d", "node")))
      .groupBy(col("node"), (col("__d") + 1).cast("long").as("depth"))
      .agg(count(lit(1)).as("n_urls"))
  }

  /** Benford first-digit audit over a positive numeric column — the
    * forensic data-quality check for ingested metrics/amounts: naturally
    * occurring multi-scale values follow `P(d) = log10(1 + 1/d)`; a flat
    * or spiky first-digit profile flags synthetic, truncated, or
    * unit-mangled feeds before they poison downstream stats.
    *
    * One row per digit 1..9: `(digit, n, expected, chi2_term)`.
    * First-significant-digit extraction is
    * `floor(v / pow(10, floor(log10(v))))` with the `10 -> 1` clamp (at
    * exact powers of 10 libm's `log10` can sit one ulp under the integer,
    * making the ratio read 10 — that IS digit 1 one decade up).
    * `expected = n_total * round(log10(1 + 1/d), 6)` and the chi-square
    * term divide/multiply in the identical shape both engines, every input
    * already exact or pre-rounded — deterministic to the 6-dp output.
    * Non-positive and null values are excluded (Benford is undefined
    * there); their count is the caller's separate hygiene gate.
    *
    * Scale shape: one narrow codegen'd pass, one map-side-combined
    * aggregate to <= 9 rows, a 1-row total broadcast.
    */
  def benford(df: DataFrame, valueCol: String, roundDp: Int = 6): DataFrame = {
    val v = col(valueCol).cast("double")
    val raw = floor(v / pow(lit(10.0), floor(log10(v))))
    val digit = when(raw === 10, lit(1)).otherwise(raw).cast("long")
    val counts = df.filter(v.isNotNull && v > 0)
      .groupBy(digit.as("digit"))
      .agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("__nt"))
    val expected = col("__nt") * round(log10(lit(1.0) + lit(1.0) / col("digit")),
      roundDp)
    counts.crossJoin(broadcast(tot))
      .withColumn("expected", round(expected, roundDp))
      .withColumn("chi2_term",
        round((col("n") - col("expected")) * (col("n") - col("expected")) /
          col("expected"), roundDp))
      .select(col("digit"), col("n"), col("expected"), col("chi2_term"))
  }

  /** DATASET CARD — the publishable corpus summary (Datasheets for
    * Datasets, Gebru et al. 2021) a training-data release ships with,
    * composed entirely from this library's oracle-proven kernels: size
    * and emptiness counts, token/char volume, the exact-text duplication
    * rate, language shares over [[TextAnalysis.langIdFrame]]'s fixed
    * marker set (one row per language plus `unknown`, so the row COUNT is
    * deterministic), and the mean [[TextAnalysis.qualityScore]]. One row
    * per metric: `(metric, value)`.
    *
    * Determinism: counts are exact longs; every mean divides exact
    * integers once; the quality mean DECIMAL-sums the per-doc 6-dp scores
    * before one double division (order-free — the `negative_sampling`
    * normalizer discipline). Degenerate corpora stay honest: ratios over
    * an empty corpus are null, never NaN.
    *
    * Scale shape: two single-pass global aggregates (corpus scan +
    * quality scan), one language groupBy whose key cardinality is the
    * fixed marker-set size, and a 6-row static join — nothing here grows
    * with the corpus except the scans.
    */
  def datasetCard(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id", roundDp: Int = 6,
                  storage: Option[DataFrame] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val t = col(textCol)
    val isBlank = t.isNull || length(trim(t)) === 0
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(when(isBlank, 1L).otherwise(0L)), lit(0L)).as("n_empty"),
      coalesce(sum(when(t.isNotNull,
        size(TextAnalysis.toks(t)).cast("long")).otherwise(0L)), lit(0L))
        .as("n_tokens"),
      coalesce(sum(when(t.isNotNull, length(t).cast("long")).otherwise(0L)),
        lit(0L)).as("n_chars"),
      countDistinct(t).as("n_distinct"),
      coalesce(sum(when(t.isNotNull, 1L).otherwise(0L)), lit(0L))
        .as("n_nonnull"))
    // Quality mean over NON-NULL texts only: a NULL-text doc would score
    // 0.6 (Spark's least() ignores nulls, granting the full length credit
    // to contentless rows) and inflate the headline number above real
    // short documents — while the card's own n_tokens/n_chars treat the
    // same rows as zero content. Empty STRINGS stay in: they are real
    // (bad) content and legitimately score low.
    val qagg = TextAnalysis.qualityFrame(docs.filter(t.isNotNull),
        textCol, idCol)
      .agg(sum(col("quality").cast("decimal(18,6)")).cast("double")
          .as("__qsum"),
        count(col("quality")).as("__qn"))
    val langCounts = TextAnalysis.langIdFrame(docs, textCol, idCol)
      .groupBy(col("predicted_lang")).agg(count(lit(1)).as("__n"))
    val langNames = TextAnalysis.LangMarkers.map(_._1) :+ "unknown"
    def ratio(num: Column, den: Column): Column =
      when(den > 0, round(num.cast("double") / den, roundDp))
    val langRows = langNames.toDF("predicted_lang")
      .join(langCounts, Seq("predicted_lang"), "left")
      .crossJoin(broadcast(base.select(col("n_docs").as("__nd"))))
      .select(concat(lit("lang_share_"), col("predicted_lang")).as("metric"),
        ratio(coalesce(col("__n"), lit(0L)), col("__nd")).as("value"))
    val scalars = base.crossJoin(qagg)
      .select(explode(array(
        struct(lit("n_docs").as("metric"),
          col("n_docs").cast("double").as("value")),
        struct(lit("n_empty_docs").as("metric"),
          col("n_empty").cast("double").as("value")),
        struct(lit("n_tokens").as("metric"),
          col("n_tokens").cast("double").as("value")),
        struct(lit("mean_doc_tokens").as("metric"),
          ratio(col("n_tokens"), col("n_docs")).as("value")),
        struct(lit("mean_doc_chars").as("metric"),
          ratio(col("n_chars"), col("n_docs")).as("value")),
        struct(lit("exact_text_dup_rate").as("metric"),
          ratio(col("n_nonnull") - col("n_distinct"),
            col("n_nonnull")).as("value")),
        struct(lit("mean_quality").as("metric"),
          when(col("__qn") > 0,
            round(col("__qsum") / col("__qn"), roundDp)).as("value"))
      )).as("__m"))
      .select(col("__m.metric").as("metric"), col("__m.value").as("value"))
    val card = scalars.unionByName(langRows)
    // Optional STORAGE section (r12 verdict #8): the compression decision
    // table ([[graft.operators.Similarity.compressionTradeoff]] output —
    // `(axis, memory_ratio, n_queries, mean_recall)`) reshaped into the
    // card's (metric, value) rows, two per axis, making the card the
    // single release report: content stats AND the measured serving-
    // compression menu. Row count stays deterministic (fixed axis set).
    storage match {
      case None => card
      case Some(tr) =>
        val sRows = tr.select(explode(array(
            struct(concat(lit("storage_memory_ratio_"), col("axis"))
              .as("metric"),
              col("memory_ratio").cast("double").as("value")),
            struct(concat(lit("storage_mean_recall_"), col("axis"))
              .as("metric"),
              col("mean_recall").cast("double").as("value"))
          )).as("__m"))
          .select(col("__m.metric").as("metric"), col("__m.value").as("value"))
        card.unionByName(sRows)
    }
  }
}
