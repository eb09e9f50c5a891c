package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-event analytics over the events stream: funnel conversion and
  * cohort retention — the two queries every product/event warehouse runs,
  * here in exact integer event-time (epoch micros via
  * [[EventTime.readMicros]]) so the oracle replays them with plain
  * arithmetic.
  *
  * Scale shape: both are user-keyed aggregations — every shuffle is on the
  * user id (or the small cohort key), partial-aggregated map-side, output
  * bounded by |stages| or |cohorts x offsets| regardless of event volume.
  */
object EventAnalytics {

  /** Strictly-ordered funnel: stage k counts users whose earliest stage-k
    * event happens AT OR AFTER their earliest qualifying stage-(k-1)
    * event. Emits one row per stage: `(stage_index, event_type, n_users,
    * conversion)` where conversion is n / n_of_previous_stage (1.0 for
    * stage 1), rounded to 6dp.
    *
    * Each stage is one filtered user-keyed min aggregate joined to the
    * previous stage's per-user frontier — k stages = k bounded shuffles on
    * the user key, never a self-cross-join.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    // per-stage per-user earliest qualifying ts, chained
    var frontier = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
      .localCheckpoint()
    val counts = scala.collection.mutable.ArrayBuffer[Long](frontier.count())
    stages.drop(1).foreach { st =>
      frontier = events.filter(col(typeCol) === st)
        .join(frontier.select(col(userCol), col("__t").as("__prev")), userCol)
        .filter(col(tsCol) >= col("__prev"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
        .localCheckpoint()
      counts += frontier.count()
    }
    val rows = stages.zipWithIndex.map { case (st, i) =>
      // HALF_UP to match SQL round() semantics exactly
      val conv =
        if (i == 0) 1.0
        else if (counts(i - 1) == 0) 0.0
        else BigDecimal(counts(i).toDouble / counts(i - 1))
          .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
      (i + 1L, st, counts(i), conv)
    }
    rows.toDF("stage_index", "event_type", "n_users", "conversion")
  }

  /** Day-granularity cohort retention: a user's cohort is the day of
    * their first event; `(cohort_day, day_offset, n_active)` counts
    * cohort members with any event `day_offset` days after their cohort
    * day, for offsets `0..maxOffsetDays`. Days are exact integer
    * `micros div day` — no timezone, no calendar.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      maxOffsetDays: Int = 7): DataFrame = {
    require(maxOffsetDays >= 0, "maxOffsetDays must be >= 0")
    val day = EventTime.DayMicros
    // integer div — exact at any epoch, no double rounding
    val withDay = events.select(col(userCol),
      expr(s"`$tsCol` div $day").as("__day"))
    val cohort = withDay.groupBy(col(userCol))
      .agg(min(col("__day")).as("__cohort"))
    withDay.join(cohort, userCol)
      .select(col(userCol), col("__cohort"),
        (col("__day") - col("__cohort")).as("__off"))
      .filter(col("__off") <= maxOffsetDays)
      .distinct()
      .groupBy(col("__cohort").as("cohort_day"), col("__off").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Dwell time after each event type: the gap from an event to the SAME
    * user's next event (any type), summarized per type by exact
    * rank-selected lower median and p90 — "how long do users sit on X
    * before doing anything else", the engagement-depth read that mean
    * gaps (skewed by overnight idles) get wrong. One row per type:
    * `(event_type, n_gaps, median_us, p90_us)`; a user's last event has
    * no successor and contributes nothing.
    *
    * Scale shape: one lead window per user, then per-type rank windows
    * over the gap table (the [[funnelLatency]] selection discipline —
    * integer rank arithmetic, no interpolation).
    */
  def dwellTime(events: DataFrame, userCol: String, typeCol: String,
                tsCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val gaps = events
      .filter(col(userCol).isNotNull && col(typeCol).isNotNull &&
        col(tsCol).isNotNull)
      .withColumn("__next", lead(col(tsCol).cast("long"), 1).over(byUser))
      .filter(col("__next").isNotNull)
      .select(col(typeCol).as("event_type"),
        (col("__next") - col(tsCol).cast("long")).as("__g"),
        col(idCol).as("__id"))
    val byType = Window.partitionBy(col("event_type"))
      .orderBy(col("__g"), col("__id"))
    val ranked = gaps
      .withColumn("__rn", row_number().over(byType))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
    val med = ranked
      .filter(col("__rn") === ((col("__n") + 1) / 2).cast("long"))
      .select(col("event_type"), col("__n").as("n_gaps"),
        col("__g").as("median_us"))
    val p90 = ranked
      .filter(col("__rn") === ((col("__n") * 9 + 9) / 10).cast("long"))
      .select(col("event_type"), col("__g").as("p90_us"))
    med.join(p90, Seq("event_type"))
  }

  /** EXACT rolling active users — DAU, trailing-7-day WAU, and their
    * ratio (stickiness, the canonical engagement health number): a user
    * counts toward WAU(d) iff active anywhere in `[d-6, d]`. Exact
    * distinct-over-a-window is the query approximate sketches usually
    * replace; the exact distributed form is a bounded 7x fan-out — each
    * (user, active day) pair contributes membership to the 7 windows it
    * covers, then one distinct + count per window. One row per day WITH
    * ACTIVITY: `(day, dau, wau, stickiness)`.
    *
    * Scale shape: distinct (user, day) first (user-keyed,
    * map-side-combined), a 7-row HOF fan-out, a second distinct + count
    * keyed on (window, user) — never event-row state, never a sketch.
    */
  def rollingActiveUsers(events: DataFrame, userCol: String, tsCol: String,
                         windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val ud = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"),
        floor(col(tsCol).cast("long") / EventTime.DayMicros).cast("long")
          .as("day"))
      .distinct()
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("__u"),
        explode(sequence(col("day"), col("day") + (windowDays - 1)))
          .as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
  }

  /** Recency-decayed activity score per user:
    * `score = sum over events of 2^(-(T - t) / halflife)` with `T` the
    * corpus-wide latest timestamp — the engagement feature a ranking /
    * re-crawl scheduler consumes (a visit today counts 1, a visit one
    * half-life ago counts 0.5; plain counts can't tell a lapsed heavy
    * user from an active one). One row per user:
    * `(user, n_events, last_ts, score)`.
    *
    * Determinism: per-user timestamps fold in SORTED ascending order
    * (collect + array_sort, event multisets are per-user-bounded), each
    * term the identical pow-of-2 shape, summed left-to-right — the
    * DuckDB `list_reduce` op sequence exactly (0-seeded vs first-seeded
    * folds agree because 0.0 + x is exact). Rounded only at output.
    */
  def decayedActivity(events: DataFrame, userCol: String, tsCol: String,
                      halflifeDays: Int = 7): DataFrame = {
    require(halflifeDays >= 1, s"halflifeDays must be >= 1, got $halflifeDays")
    val hl = (halflifeDays * EventTime.DayMicros).toDouble
    val base = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("user"), col(tsCol).cast("long").as("__ts"))
    val tMax = base.agg(max(col("__ts")).as("__tmax"))
    base.groupBy(col("user"))
      .agg(count(lit(1)).as("n_events"),
        max(col("__ts")).as("last_ts"),
        array_sort(collect_list(col("__ts"))).as("__tss"))
      .crossJoin(broadcast(tMax))
      .select(col("user"), col("n_events"), col("last_ts"),
        round(aggregate(col("__tss"), lit(0.0), (acc, t) =>
          acc + pow(lit(2.0),
            -((col("__tmax") - t).cast("double") / hl))), 6).as("score"))
  }

  /** Funnel latency between two stages: per user, the gap from the FIRST
    * `stageA` event to the first `stageB` event AT OR AFTER it — then the
    * conversion rate and the latency distribution's lower median and p90
    * (exact order statistics by rank selection over (delta, user) — no
    * float interpolation, so both engines pick the identical element).
    * The time-to-convert companion to [[funnel]]'s who-converts counts.
    * One row ALWAYS: `(n_a, n_converted, conv_rate, median_us, p90_us)`;
    * `p90` rank = ceil(0.9 * n) in pure integers. Zero converted users
    * yields `(n_a, 0, 0.0, null, null)` — distinguishable from no data
    * (`n_a = 0`), never an empty frame.
    *
    * Scale shape: two user-keyed min-aggregates + one join on the user
    * key; rank selection windows run over the CONVERTED-USER table
    * (user-bounded, not event-bounded).
    */
  def funnelLatency(events: DataFrame, userCol: String, typeCol: String,
                    tsCol: String, stageA: String,
                    stageB: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"), col(typeCol).as("__t"),
        col(tsCol).cast("long").as("__ts"))
    val firstA = base.filter(col("__t") === stageA)
      .groupBy(col("__u")).agg(min(col("__ts")).as("__ta"))
    val bAfter = base.filter(col("__t") === stageB)
      .join(firstA, Seq("__u"))
      .filter(col("__ts") >= col("__ta"))
      .groupBy(col("__u"), col("__ta")).agg(min(col("__ts")).as("__tb"))
      .withColumn("__d", col("__tb") - col("__ta"))
    val w = Window.orderBy(col("__d"), col("__u"))
    val ranked = bAfter
      .withColumn("__rn", row_number().over(w))
      .withColumn("__nc", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    val nA = firstA.agg(count(lit(1)).as("n_a"))
    val med = ranked
      .filter(col("__rn") === ((col("__nc") + 1) / 2).cast("long"))
      .select(col("__d").as("median_us"), col("__nc").as("n_converted"))
    val p90 = ranked
      .filter(col("__rn") === ((col("__nc") * 9 + 9) / 10).cast("long"))
      .select(col("__d").as("p90_us"))
    // LEFT joins, not crossJoins: with zero converted users the median/p90
    // frames are EMPTY and a cross join would annihilate the n_a row —
    // callers could not tell "no conversions" from "no data". The answer
    // to zero conversions is one row: n_converted = 0, conv_rate = 0.0,
    // null latencies.
    nA.join(med, lit(true), "left").join(p90, lit(true), "left")
      .select(col("n_a"),
        coalesce(col("n_converted"), lit(0L)).as("n_converted"),
        when(col("n_a") > 0,
          round(coalesce(col("n_converted"), lit(0L)).cast("double") /
            col("n_a"), 6))
          .otherwise(lit(0.0)).as("conv_rate"),
        col("median_us"), col("p90_us"))
  }

  /** Theil-Sen robust trend per series key: the MEDIAN of all pairwise
    * day-over-day slopes of the daily counts — the trend estimator one
    * outlier day cannot drag (ordinary least squares moves with a single
    * spike; the median of O(days^2) pairwise slopes has a 29% breakdown
    * point). One row per key: `(key, n_days, n_pairs, slope)` in
    * events/day; keys with a single day emit a null slope.
    *
    * Determinism: each pairwise slope is one exact-integer division
    * rounded to 6 dp; the median is the LOWER median of the rounded
    * slopes under the total order (slope, d1, d2) — no float averaging of
    * middle elements, so both engines pick the identical element.
    *
    * Scale shape: the pair join is per-key over the DAILY table (days^2,
    * day-span-bounded — never event rows); one rank window per key.
    */
  def theilSenTrend(events: DataFrame, keyCol: String,
                    tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events.filter(col(tsCol).isNotNull)
      .select(col(keyCol).as("key"),
        floor(col(tsCol).cast("long") / EventTime.DayMicros).cast("long")
          .as("day"))
      .groupBy(col("key"), col("day")).agg(count(lit(1)).as("n"))
    val a = daily.select(col("key"), col("day").as("__d1"), col("n").as("__n1"))
    val b = daily.select(col("key"), col("day").as("__d2"), col("n").as("__n2"))
    val slopes = a.join(b, Seq("key")).filter(col("__d1") < col("__d2"))
      .withColumn("__s",
        round((col("__n2") - col("__n1")).cast("double") /
          (col("__d2") - col("__d1")), 6))
    val w = Window.partitionBy(col("key"))
      .orderBy(col("__s"), col("__d1"), col("__d2"))
    val nDays = daily.groupBy(col("key")).agg(count(lit(1)).as("n_days"))
    val med = slopes
      .withColumn("__rn", row_number().over(w))
      .withColumn("__np",
        count(lit(1)).over(Window.partitionBy(col("key"))))
      .filter(col("__rn") === ((col("__np") + 1) / 2).cast("long"))
      .select(col("key"), col("__np").as("n_pairs"), col("__s").as("slope"))
    nDays.join(med, Seq("key"), "left")
      .select(col("key"), col("n_days"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"), col("slope"))
  }

  /** New-entity novelty rate per day: how much of today's activity comes
    * from users never seen before? The growth-vs-churn decomposition
    * every activation dashboard opens with, and — read over a crawl —
    * the "is this source still yielding new documents" signal. One row
    * per day: `(day, n_active, n_new, new_ratio)`; ratio is one exact
    * division.
    *
    * Scale shape: distinct (user, day) first, then a per-user min-day
    * aggregate joined back — two user-keyed map-side-combined shuffles,
    * output day-bounded.
    */
  def noveltyRate(events: DataFrame, userCol: String,
                  tsCol: String): DataFrame = {
    val ud = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"),
        floor(col(tsCol).cast("long") / EventTime.DayMicros).cast("long")
          .as("day"))
      .distinct()
    val first = ud.groupBy(col("__u")).agg(min(col("day")).as("__fd"))
    ud.join(first, Seq("__u"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum((col("day") === col("__fd")).cast("long")).as("n_new"))
      .select(col("day"), col("n_active"), col("n_new"),
        round(col("n_new").cast("double") / col("n_active"), 6)
          .as("new_ratio"))
  }

  /** Top-k event-type TRIGRAM journeys — the sequence-mining extension of
    * [[transitionMatrix]]: three consecutive events in one user's
    * time-ordered history form a path (`a>b>c`), and the most frequent
    * paths are the product's actual highways (and its rage-click loops).
    * Returns the top `k` by (count desc, path): `(path, n)`.
    *
    * Scale shape: two leads over one per-user window, a map-side-combined
    * count to the |types|^3 path domain, `orderBy.limit` =
    * TakeOrderedAndProject.
    */
  def journeyTrigrams(events: DataFrame, userCol: String, typeCol: String,
                      tsCol: String, idCol: String, k: Int = 20): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .filter(col(userCol).isNotNull && col(typeCol).isNotNull &&
        col(tsCol).isNotNull)
      .withColumn("__t2", lead(col(typeCol), 1).over(w))
      .withColumn("__t3", lead(col(typeCol), 2).over(w))
      .filter(col("__t3").isNotNull)
      .groupBy(concat_ws(">", col(typeCol), col("__t2"), col("__t3"))
        .as("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** Rolling `windowDays`-day aggregates per series key — the
    * trailing-window health view (7-day active counts, rolling spend)
    * every metrics dashboard reads beside the raw dailies. RANGE-framed
    * on the day NUMBER, so gap days genuinely age out of the window
    * (a ROWS frame would silently stretch across gaps — the classic
    * rolling-window bug).
    *
    * One row per occupied (key, day): `(key, day, n, rolling_n,
    * rolling_value, rolling_avg)` — value sums ride integer cents
    * (exact), the two emitted ratios are each one division.
    *
    * Scale shape: one map-side-combined aggregate to |keys x days| rows,
    * then one RANGE window over that daily table (per-key, days-bounded).
    * `tsCol` must be epoch micros ([[EventTime.tsMicros]]).
    */
  def rollingDaily(events: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol).as("key"),
        floor(col(tsCol).cast("long") / EventTime.DayMicros).cast("long")
          .as("day"),
        round(col(valueCol).cast("double") * 100, 0).cast("long").as("__c"))
      .groupBy(col("key"), col("day"))
      .agg(count(lit(1)).as("n"), sum(col("__c")).as("__cents"))
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
      .rangeBetween(-(windowDays - 1).toLong, 0L)
    daily
      .withColumn("rolling_n", sum(col("n")).over(w).cast("long"))
      .withColumn("__rc", sum(col("__cents")).over(w))
      .select(col("key"), col("day"), col("n"), col("rolling_n"),
        round(col("__rc").cast("double") / 100.0, 6).as("rolling_value"),
        round(col("__rc").cast("double") / (lit(100.0) * col("rolling_n")), 6)
          .as("rolling_avg"))
  }

  /** Exponentially-weighted moving average of DAILY COUNTS per series key
    * (`s_1 = x_1`, `s_i = alpha*x_i + (1-alpha)*s_{i-1}`) — the smoothed
    * baseline an alerting rule compares today against; unlike the
    * [[rollingDaily]] flat window it never forgets level shifts, only
    * fades them.
    *
    * Determinism: each day's value is recomputed as an independent
    * LEFT-TO-RIGHT prefix fold over the day-sorted counts (identical
    * lambda shape in the oracle — DuckDB's `list_reduce` seeds with the
    * first element exactly like the `aggregate` fold here), so both
    * engines execute the same IEEE op sequence; rounded only at output.
    * The per-series O(days^2) fold cost is bounded by the day span, not
    * event volume.
    *
    * One row per occupied (key, day): `(key, day, n, ewma)`.
    */
  def ewmaDaily(events: DataFrame, keyCol: String, tsCol: String,
                alpha: Double = 0.3): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val daily = events
      .filter(col(tsCol).isNotNull)
      .select(col(keyCol).as("key"),
        floor(col(tsCol).cast("long") / EventTime.DayMicros).cast("long")
          .as("day"))
      .groupBy(col("key"), col("day"))
      .agg(count(lit(1)).as("n"))
    val series = daily.groupBy(col("key"))
      .agg(array_sort(collect_list(struct(col("day"), col("n")))).as("__s"))
      .select(col("key"),
        transform(col("__s"), x => x("day")).as("__days"),
        transform(col("__s"), x => x("n").cast("double")).as("__xs"))
    val ewmas = transform(
      sequence(lit(1), size(col("__xs"))),
      i => round(aggregate(
        slice(col("__xs"), lit(2), i - 1),
        element_at(col("__xs"), 1),
        (acc, x) => lit(alpha) * x + lit(1.0 - alpha) * acc), 6))
    series
      .withColumn("__e", ewmas)
      .select(col("key"),
        posexplode(arrays_zip(col("__days"), col("__xs"), col("__e")))
          .as(Seq("__i", "__z")))
      .select(col("key"), col("__z.__days").as("day"),
        col("__z.__xs").cast("long").as("n"), col("__z.__e").as("ewma"))
  }

  /** First-order Markov transition matrix over each user's event stream —
    * the user-journey model behind "what happens after X": consecutive
    * event-type pairs within a user's time-ordered history, with the
    * empirical transition probability `P(to | from)`. The row-stochastic
    * matrix feeds next-step prediction, funnel design, and anomaly checks
    * (a transition probability collapsing week-over-week is a product
    * regression). Self-transitions count — repeats are signal here.
    *
    * Exact arithmetic: counts are BIGINTs, `prob = n / n_from` is ONE
    * division rounded at output.
    *
    * Scale shape: one lead window per user (shuffle on the user key),
    * then a map-side-combined aggregate to the |types|^2 matrix; marginals
    * broadcast. `tsCol` must be epoch micros ([[EventTime.tsMicros]]).
    */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .filter(col(userCol).isNotNull && col(typeCol).isNotNull &&
        col(tsCol).isNotNull)
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("__nf"))
    pairs.join(broadcast(fromTotals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("__nf"), 6).as("prob"))
  }

  /** Frequent-pair mining over user baskets (the 2-itemset core of
    * association rules): which event types co-occur in the same user's
    * history more than their marginals predict? Emits one row per
    * unordered type pair with support and the two directionless rule
    * stats: `confidence` = P(b|a) and `lift` = P(a,b)/(P(a)P(b)) — lift
    * > 1 is genuine affinity, the cross-sell / co-trigger signal.
    *
    * Exact arithmetic: all counts are BIGINTs;
    * `lift = n_ab * n_users / (n_a * n_b)` and `confidence = n_ab / n_a`
    * are each ONE division of exact integers, rounded at output.
    *
    * Scale shape: baskets collapse to DISTINCT (user, type) first (one
    * map-side-combined shuffle), the pair join is per-user over the type
    * domain (|types|^2 per user, domain-bounded — never event-row
    * quadratic), marginals broadcast.
    */
  def itemsetPairs(events: DataFrame, userCol: String,
                   typeCol: String): DataFrame = {
    val baskets = events
      .filter(col(userCol).isNotNull && col(typeCol).isNotNull)
      .select(col(userCol).as("__u"), col(typeCol).as("__t")).distinct()
    val nUsers = baskets.select(col("__u")).distinct()
      .agg(count(lit(1)).as("__n_users"))
    val singles = baskets.groupBy(col("__t")).agg(count(lit(1)).as("__n"))
    val pairs = baskets.select(col("__u"), col("__t").as("type_a"))
      .join(baskets.select(col("__u"), col("__t").as("type_b")), Seq("__u"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(singles.select(col("__t").as("type_a"),
        col("__n").as("n_a"))), Seq("type_a"))
      .join(broadcast(singles.select(col("__t").as("type_b"),
        col("__n").as("n_b"))), Seq("type_b"))
      .crossJoin(broadcast(nUsers))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_ab"),
        round(col("n_ab").cast("double") / col("n_a"), 6).as("confidence"),
        round((col("n_ab") * col("__n_users")).cast("double") /
          (col("n_a") * col("n_b")), 6).as("lift"))
  }

  /** Time-weighted average value per (series key, day) — the TWAP/
    * duty-cycle aggregate a metrics warehouse needs wherever samples
    * arrive unevenly (a plain mean over-weights bursts): each event's
    * value holds until the next event of the same key and day, and the
    * average weights by that holding time. The day's last event has no
    * successor inside the day and carries no weight (the conservative
    * convention — no weight invented past the observation window); days
    * with a single event emit `n_events` with a null twap, which is the
    * honest answer.
    *
    * Exact arithmetic: values lift to integer cents
    * (`round(value * 100)` — the fixtures' 2-decimal contract), weights
    * are exact micro durations, so the accumulator is an exact BIGINT and
    * `twap = sum(cents * w) / (100.0 * sum(w))` is ONE division.
    *
    * Scale shape: one window (partitioned by key+day) for the successor
    * timestamp, one map-side-combined aggregate to |keys x days| rows.
    * `tsCol` must be epoch micros ([[EventTime.tsMicros]]).
    */
  def timeWeightedAverage(events: DataFrame, keyCol: String, tsCol: String,
                          valueCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = events
      .select(col(keyCol).as("key"), col(tsCol).cast("long").as("ts"),
        col(valueCol).cast("double").as("value"), col(idCol).as("id"))
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .withColumn("day", floor(col("ts") / EventTime.DayMicros).cast("long"))
    val w = Window.partitionBy(col("key"), col("day"))
      .orderBy(col("ts"), col("id"))
    pts
      .withColumn("__w", lead(col("ts"), 1).over(w) - col("ts"))
      .withColumn("__cents", round(col("value") * 100, 0).cast("long"))
      .groupBy(col("key"), col("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__cents") * col("__w")).as("__num"),
        sum(col("__w")).as("__den"))
      .select(col("key"), col("day"), col("n_events"),
        when(col("__den") > 0,
          round(col("__num").cast("double") / (lit(100.0) * col("__den")), 6))
          .otherwise(lit(null).cast("double")).as("twap"))
  }

  /** LTTB-style time-series downsampling (Steinarsson's
    * largest-triangle-three-buckets, in the bucket-average variant):
    * per series key, points fall into fixed-count buckets in time order
    * and each interior bucket keeps the single point forming the
    * LARGEST-AREA triangle with the neighboring buckets' averages — the
    * downsample that preserves spikes and shape where naive avg/first
    * smears them. The first and last buckets keep their first/last point
    * (the standard anchor rule). The per-dashboard/per-export compaction
    * step of an event warehouse.
    *
    * The classic sequential LTTB anchors on the PREVIOUS SELECTED point —
    * an inherently serial chain; this variant anchors on the previous
    * bucket's average (the original paper's own suggested parallel
    * simplification), which makes every bucket independent: one window to
    * assign buckets, one bucket-level aggregate, lag/lead, one argmax
    * window. Fully shuffle-bounded by (key, bucket).
    *
    * Determinism: bucket averages are single exact-sum divisions
    * (timestamps sum as exact longs, values as DECIMAL), the area is a
    * fixed-shape cross-product of identical doubles rounded to 6 dp for
    * the argmax, ties break by the id column.
    *
    * `tsCol` must be epoch micros (long — [[EventTime.tsMicros]]).
    * Returns `(key, bucket, id, ts, value, reason)` with reason in
    * `first|lttb|last`.
    */
  def lttbDownsample(events: DataFrame, keyCol: String, tsCol: String,
                     valueCol: String, idCol: String,
                     bucketSize: Int): DataFrame = {
    require(bucketSize >= 1, s"bucketSize must be >= 1, got $bucketSize")
    import org.apache.spark.sql.expressions.Window
    val ordered = Window.partitionBy(col("key"))
      .orderBy(col("ts"), col("id"))
    val pts = events
      .select(col(keyCol).as("key"), col(tsCol).cast("long").as("ts"),
        col(valueCol).cast("double").as("value"), col(idCol).as("id"))
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .withColumn("__rn", row_number().over(ordered) - 1)
      .withColumn("bucket", floor(col("__rn") / bucketSize).cast("long"))
    val aggs = pts.groupBy(col("key"), col("bucket"))
      .agg(count(lit(1)).as("__n"), sum(col("ts")).as("__st"),
        sum(col("value").cast("decimal(24,6)")).as("__sv"),
        min(col("__rn")).as("__lo"), max(col("__rn")).as("__hi"))
      .select(col("key"), col("bucket"), col("__lo"), col("__hi"),
        (col("__st").cast("double") / col("__n")).as("__ax"),
        (col("__sv").cast("double") / col("__n")).as("__ay"))
    val byBucket = Window.partitionBy(col("key")).orderBy(col("bucket"))
    val nb = Window.partitionBy(col("key"))
    val ctx = aggs
      .withColumn("__px", lag(col("__ax"), 1).over(byBucket))
      .withColumn("__py", lag(col("__ay"), 1).over(byBucket))
      .withColumn("__nx", lead(col("__ax"), 1).over(byBucket))
      .withColumn("__ny", lead(col("__ay"), 1).over(byBucket))
      .withColumn("__maxb", max(col("bucket")).over(nb))
    val joined = pts.join(ctx, Seq("key", "bucket"))
    val area = round(abs(
      (col("__px") - col("__nx")) * (col("value") - col("__py")) -
        (col("__px") - col("ts").cast("double")) * (col("__ny") - col("__py"))),
      6)
    val argmax = Window.partitionBy(col("key"), col("bucket"))
      .orderBy(col("__area").desc, col("id"))
    joined
      .withColumn("__area", area)
      .withColumn("__pick", row_number().over(argmax))
      .withColumn("reason",
        when(col("bucket") === 0, lit("first"))
          .when(col("bucket") === col("__maxb"), lit("last"))
          .otherwise(lit("lttb")))
      .filter(
        (col("reason") === "first" && col("__rn") === col("__lo")) ||
          (col("reason") === "last" && col("__rn") === col("__hi")) ||
          (col("reason") === "lttb" && col("__pick") === 1))
      .select(col("key"), col("bucket"), col("id"), col("ts"), col("value"),
        col("reason"))
  }
}
