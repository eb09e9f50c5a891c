package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics

/** Funnel ordering semantics and cohort day arithmetic, hand-checked. */
class EventAnalyticsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val DAY = 86400000000L

  test("funnel: strict ordering — later-stage events before the frontier don't count") {
    // u1: view@10, click@20, buy@30  -> completes all stages
    // u2: click@5, view@10           -> click BEFORE first view: stage2 no
    // u3: view@10                    -> stage 1 only
    // u4: click@10 (never views)     -> not even stage 1
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "buy", 30L),
      (2L, "click", 5L), (2L, "view", 10L),
      (3L, "view", 10L),
      (4L, "click", 10L)
    ).toDF("user_id", "event_type", "ts")
    val out = EventAnalytics.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "buy"))
      .orderBy("stage_index").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out(0) == ((1L, "view", 3L, 1.0)))
    assert(out(1) == ((2L, "click", 1L, 0.333333)))
    assert(out(2) == ((3L, "buy", 1L, 1.0)))
  }

  test("funnel: same-timestamp stage events count (>= frontier, not >)") {
    val ev = Seq((1L, "a", 10L), (1L, "b", 10L)).toDF("user_id", "event_type", "ts")
    val out = EventAnalytics.funnel(ev, "user_id", "event_type", "ts", Seq("a", "b"))
      .orderBy("stage_index").collect()
    assert(out(1).getLong(2) == 1L)
    intercept[IllegalArgumentException] {
      EventAnalytics.funnel(ev, "user_id", "event_type", "ts", Seq.empty)
    }
  }

  test("cohortRetention: cohort = first-event day, distinct per offset, cap") {
    // u1 first on day 0: active days 0, 1, 1 (dup), 9 (past cap)
    // u2 first on day 1: active days 1, 2
    val ev = Seq(
      (1L, 10L), (1L, DAY + 5L), (1L, DAY + 6L), (1L, 9 * DAY),
      (2L, DAY), (2L, 2 * DAY + 1)
    ).toDF("user_id", "ts")
    val out = EventAnalytics.cohortRetention(ev, "user_id", "ts", maxOffsetDays = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (0L, 0L) -> 1L, (0L, 1L) -> 1L, // u1 day0+day1 (dup collapsed, day9 capped)
      (1L, 0L) -> 1L, (1L, 1L) -> 1L  // u2 day1+day2
    ))
  }

  test("lttbDownsample: spike-preserving picks, first/last anchors") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    // key a: 8 points, bucketSize 2. Interior bucket 1 holds the spike
    // (ts=2, v=10): its area vs neighbor-bucket averages is 40 vs 0, so
    // the spike survives where an average would smear it. Bucket 2 picks
    // ts=4 (area 16.25 vs 13.75). First/last points anchor.
    val vals = Seq(0.0, 0.0, 10.0, 0.0, 0.0, 0.0, 5.0, 0.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ("a", i.toLong, v, i.toLong) } :+ (("b", 99L, 7.0, 42L))
    val df = rows.toDF("etype", "tsu", "value", "eid")
    val got = graft.operators.EventAnalytics
      .lttbDownsample(df, "etype", "tsu", "value", "eid", bucketSize = 2)
      .orderBy("key", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(5)))
    assert(got.toSeq == Seq(
      ("a", 0L, 0L, "first"), ("a", 1L, 2L, "lttb"), ("a", 2L, 4L, "lttb"),
      ("a", 3L, 7L, "last"),
      ("b", 0L, 42L, "first"))) // single-bucket series keeps its first
    intercept[IllegalArgumentException] {
      graft.operators.EventAnalytics
        .lttbDownsample(df, "etype", "tsu", "value", "eid", bucketSize = 0)
    }
  }

  test("itemsetPairs: hand-computed support, confidence, lift") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val ev = Seq((1L, "A"), (1L, "B"), (1L, "A"), (2L, "A"), (2L, "B"),
      (3L, "A"), (4L, "B"), (4L, "C")).toDF("user_id", "etype")
    val got = graft.operators.EventAnalytics
      .itemsetPairs(ev, "user_id", "etype")
      .orderBy("type_a", "type_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    // N=4 users; n_A=3, n_B=3, n_C=1; AB support 2, BC support 1; the
    // repeated (1,A) event collapses in the distinct basket.
    assert(got.toSeq == Seq(
      ("A", "B", 3L, 3L, 2L, 0.666667, 0.888889),
      ("B", "C", 3L, 1L, 1L, 0.333333, 1.333333)))
  }

  test("timeWeightedAverage: holding-time weights, day split, 1-event null") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val day = graft.operators.EventTime.DayMicros
    val ev = Seq(("a", 0L, 1.0, 1L), ("a", 10L, 3.0, 2L),
      ("a", 40L, 2.0, 3L), ("a", day + 5L, 9.0, 4L))
      .toDF("etype", "tsu", "value", "eid")
    val got = graft.operators.EventAnalytics
      .timeWeightedAverage(ev, "etype", "tsu", "value", "eid")
      .orderBy("day").collect()
      .map(r => (r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    // day 0: (100c*10 + 300c*30)/(100*(10+30)) = 2.5; last event weightless
    // day 1: single event -> null twap (no holding window observed)
    assert(got.toSeq == Seq((0L, 3L, Some(2.5)), (1L, 1L, None)))
  }

  test("transitionMatrix: consecutive pairs per user, row-stochastic probs") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val ev = Seq((1L, "A", 10L, 1L), (1L, "B", 20L, 2L), (1L, "A", 30L, 3L),
      (2L, "A", 5L, 4L), (2L, "A", 6L, 5L)).toDF("u", "t", "tsu", "eid")
    val got = graft.operators.EventAnalytics
      .transitionMatrix(ev, "u", "t", "tsu", "eid")
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    // user1: A->B->A; user2: A->A (self-transition counts)
    assert(got.toSeq == Seq(("A", "A", 1L, 0.5), ("A", "B", 1L, 0.5),
      ("B", "A", 1L, 1.0)))
  }

  test("rollingDaily: RANGE frame ages gap days out of the window") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val day = graft.operators.EventTime.DayMicros
    val ev = Seq(("a", 0L, 1.0, 1L), ("a", 1L, 1.0, 2L),
      ("a", day, 2.0, 3L), ("a", 2 * day, 4.0, 4L),
      ("a", 9 * day, 10.0, 5L)).toDF("etype", "tsu", "value", "eid")
    val got = graft.operators.EventAnalytics
      .rollingDaily(ev, "etype", "tsu", "value")
      .orderBy("day").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
        r.getDouble(5)))
    assert(got.toSeq == Seq(
      (0L, 2L, 2L, 2.0, 1.0),
      (1L, 1L, 3L, 4.0, 1.333333),
      (2L, 1L, 4L, 8.0, 2.0),
      // day 9's trailing week covers days 3..9 only: the gap aged out
      (9L, 1L, 1L, 10.0, 10.0)))
    intercept[IllegalArgumentException] {
      graft.operators.EventAnalytics
        .rollingDaily(ev, "etype", "tsu", "value", windowDays = 0)
    }
  }

  test("ewmaDaily: independent prefix folds match the hand recurrence") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val day = graft.operators.EventTime.DayMicros
    val rows = Seq.fill(10)(("a", 0L)) ++ Seq.fill(4)(("a", day)) ++
      Seq.fill(7)(("a", 2 * day))
    val ev = rows.zipWithIndex.map { case ((k, t), i) => (k, t + i, i.toLong) }
      .toDF("etype", "tsu", "eid")
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val e2raw = 0.3 * 4 + 0.7 * 10.0
    val got = graft.operators.EventAnalytics.ewmaDaily(ev, "etype", "tsu")
      .orderBy("day").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((0L, 10L, 10.0), (1L, 4L, r6(e2raw)),
      (2L, 7L, r6(0.3 * 7 + 0.7 * e2raw))))
    intercept[IllegalArgumentException] {
      graft.operators.EventAnalytics.ewmaDaily(ev, "etype", "tsu", alpha = 0.0)
    }
  }

  test("journeyTrigrams: two leads, path strings, top-k cut") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val ev = Seq((1L, "A", 1L, 1L), (1L, "B", 2L, 2L), (1L, "A", 3L, 3L),
      (1L, "C", 4L, 4L), (2L, "A", 1L, 5L), (2L, "B", 2L, 6L))
      .toDF("u", "t", "tsu", "eid")
    val all = graft.operators.EventAnalytics
      .journeyTrigrams(ev, "u", "t", "tsu", "eid", k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(all == Map("A>B>A" -> 1L, "B>A>C" -> 1L)) // user2 too short
    val top1 = graft.operators.EventAnalytics
      .journeyTrigrams(ev, "u", "t", "tsu", "eid", k = 1)
      .collect().map(_.getString(0)).toSeq
    assert(top1 == Seq("A>B>A")) // tie broken by path
  }

  test("theilSenTrend: outlier-robust lower-median slope") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val day = graft.operators.EventTime.DayMicros
    // daily counts 1,2,3,100 on days 0..3: OLS would chase 100; the six
    // pairwise slopes are [1,1,32.333333,49,49.5,98] -> lower median
    // (rank 3) = 32.333333... wait recompute: slopes: (2-1)/1=1,
    // (3-1)/2=1, (100-1)/3=33, (3-2)/1=1, (100-2)/2=49, (100-3)/1=97
    // sorted: [1,1,1,33,49,97] -> lower median rank 3 = 1.0
    val rows = (0 to 0).flatMap(_ =>
      Seq.fill(1)(0L) ++ Seq.fill(2)(1L) ++ Seq.fill(3)(2L) ++
        Seq.fill(100)(3L))
    val ev = rows.zipWithIndex
      .map { case (d, i) => ("a", d * day + i, i.toLong) }
      .toDF("etype", "tsu", "eid")
    val r = graft.operators.EventAnalytics
      .theilSenTrend(ev, "etype", "tsu").collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getDouble(3)) == ((4L, 6L, 1.0)))
    // single-day key -> null slope, 0 pairs
    val one = Seq(("b", 5L, 1L)).toDF("etype", "tsu", "eid")
    val r1 = graft.operators.EventAnalytics
      .theilSenTrend(one, "etype", "tsu").collect()(0)
    assert(r1.getLong(1) == 1L && r1.getLong(2) == 0L && r1.isNullAt(3))
  }

  test("noveltyRate: first-seen decomposition per day") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val day = graft.operators.EventTime.DayMicros
    // day0: users 1,2 (both new); day1: users 1,3 (3 new) -> ratio 0.5
    val ev = Seq((1L, 0L), (2L, 5L), (1L, day), (3L, day + 1), (1L, day + 2))
      .toDF("user_id", "tsu")
    val got = graft.operators.EventAnalytics
      .noveltyRate(ev, "user_id", "tsu")
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((0L, 2L, 2L, 1.0), (1L, 2L, 1L, 0.5)))
  }

  test("funnelLatency: first-A to first-B-after, exact rank selection") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    // u1: A@10 -> B@30 (delta 20); u2: B@5 BEFORE A@10 then B@50 (delta 40)
    // u3: A@10, no B -> not converted; u4: B only -> not in funnel
    val ev = Seq((1L, "A", 10L), (1L, "B", 30L), (2L, "B", 5L),
      (2L, "A", 10L), (2L, "B", 50L), (3L, "A", 10L), (4L, "B", 7L))
      .toDF("u", "t", "tsu")
    val r = graft.operators.EventAnalytics
      .funnelLatency(ev, "u", "t", "tsu", "A", "B").collect()(0)
    // n_a=3, converted=2, rate 2/3; deltas [20, 40]: lower median 20,
    // p90 rank = ceil(1.8) = 2 -> 40
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
      r.getLong(4)) == ((3L, 2L, 0.666667, 20L, 40L)))
  }

  test("funnelLatency: zero conversions still emit the one-row answer (r9 advice)") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    // Two users reach A, nobody reaches B afterward: the old crossJoin
    // against the empty median/p90 frames annihilated the n_a row.
    val ev = Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "B", 5L))
      .toDF("u", "t", "tsu")
    val rows = graft.operators.EventAnalytics
      .funnelLatency(ev.filter($"u" < 3L), "u", "t", "tsu", "A", "B")
      .collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((2L, 0L, 0.0)))
    assert(r.isNullAt(3) && r.isNullAt(4)) // no latencies to report
  }

  test("decayedActivity: half-life halves each step; last event scores 1") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val hl = 7L * graft.operators.EventTime.DayMicros
    val T = 100L * graft.operators.EventTime.DayMicros
    val ev = Seq((1L, T), (1L, T - hl), (2L, T - 2 * hl))
      .toDF("user_id", "tsu")
    val got = graft.operators.EventAnalytics
      .decayedActivity(ev, "user_id", "tsu")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((2L, T, 1.5)))   // 1 + 2^-1
    assert(got(2L) == ((1L, T - 2 * hl, 0.25))) // 2^-2, global T anchor
  }

  test("rollingActiveUsers: WAU window membership, stickiness, day gaps") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val day = graft.operators.EventTime.DayMicros
    // u1 active day 0; u2 active days 0 and 8. WAU(0)={u1,u2}=2;
    // day 8: DAU={u2}; WAU(8) counts u2 only (u1's day-0 activity aged
    // out after day 6). Days 1..6 have no DAU rows (inner join).
    val ev = Seq((1L, 0L), (2L, 5L), (2L, 8 * day)).toDF("user_id", "tsu")
    val got = graft.operators.EventAnalytics
      .rollingActiveUsers(ev, "user_id", "tsu")
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((0L, 2L, 2L, 1.0), (8L, 1L, 1L, 1.0)))
    // a user active on TWO days of one window still counts once in WAU
    val ev2 = Seq((1L, 0L), (1L, day), (2L, 2 * day)).toDF("user_id", "tsu")
    val g2 = graft.operators.EventAnalytics
      .rollingActiveUsers(ev2, "user_id", "tsu")
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(g2.toSeq == Seq((0L, 1L, 1L), (1L, 1L, 1L), (2L, 1L, 2L)))
  }

  test("dwellTime: per-type gap percentiles; last events contribute nothing") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    // u1: A@0 -> B@10 -> A@40 (gaps: A->10, B->30; final A no successor)
    // u2: A@0 -> C@20 (gap A->20)
    val ev = Seq((1L, "A", 0L, 1L), (1L, "B", 10L, 2L), (1L, "A", 40L, 3L),
      (2L, "A", 0L, 4L), (2L, "C", 20L, 5L)).toDF("u", "t", "tsu", "eid")
    val got = graft.operators.EventAnalytics
      .dwellTime(ev, "u", "t", "tsu", "eid")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // A gaps [10, 20]: lower median 10, p90 rank ceil(1.8)=2 -> 20
    assert(got("A") == ((2L, 10L, 20L)))
    assert(got("B") == ((1L, 30L, 30L)))
    assert(!got.contains("C")) // terminal events only
  }
}
