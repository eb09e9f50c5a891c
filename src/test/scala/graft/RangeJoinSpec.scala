package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Bucketed range join: result parity with the naive range join (across
  * bucket widths, including intervals spanning many buckets) and an
  * equi-join plan with no nested loop.
  */
class RangeJoinSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private lazy val points = (0L until 500L).map(i => (i % 7, i * 13 % 1000, i))
    .toDF("k", "p", "pid")
  private lazy val intervals = (0L until 60L)
    .map(i => (i % 7, i * 16 % 900, i * 16 % 900 + (i % 5) * 77, i))
    .toDF("k", "s", "e", "iid")

  private def naive = points.join(intervals, Seq("k"))
    .filter(col("p") >= col("s") && col("p") <= col("e"))
    .select("pid", "iid")

  test("parity with the naive range join for several bucket widths") {
    val expected = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)
    for (width <- Seq(1L, 10L, 64L, 1000L, 10000L)) {
      val got = RangeJoin.pointInInterval(points, intervals, "k", "p", "s", "e", width)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"width=$width")
    }
  }

  test("plan is a hash equi-join on (key, bucket), not a nested loop") {
    val plan = RangeJoin.pointInInterval(points, intervals, "k", "p", "s", "e", 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(600))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan.take(600))
  }

  test("broadcast decision: forced regimes and the adaptive size threshold pin the plan") {
    // AQE + auto-broadcast off so the physical join shape reflects ONLY the
    // operator's own broadcast decision, not a runtime size conversion.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    def planOf(bc: Option[Boolean], thr: Long = 10L << 20): String =
      RangeJoin.pointInInterval(points, intervals, "k", "p", "s", "e", 64L, bc, thr)
        .queryExecution.executedPlan.toString
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(planOf(Some(true)).contains("BroadcastHashJoin"), "forced broadcast regime")
      assert(!planOf(Some(false)).contains("BroadcastHashJoin"), "forced shuffle regime")
      // Adaptive: estimate under threshold -> broadcast; over -> shuffle.
      assert(planOf(None, thr = Long.MaxValue).contains("BroadcastHashJoin"),
        "dimension-sized intervals should broadcast")
      assert(!planOf(None, thr = 0L).contains("BroadcastHashJoin"),
        "intervals above the size threshold must take the scale-safe shuffle path")
      // The guard is POST-explosion: a byte-small interval table whose
      // intervals span many buckets (replication ~155x at width=1 here)
      // must NOT broadcast even though its raw size fits the threshold.
      val preSize = intervals.queryExecution.optimizedPlan.stats.sizeInBytes.toLong
      def planW(width: Long, thr: Long): String =
        RangeJoin.pointInInterval(points, intervals, "k", "p", "s", "e", width, None, thr)
          .queryExecution.executedPlan.toString
      assert(!planW(1L, preSize * 10).contains("BroadcastHashJoin"),
        "explosion factor must veto the broadcast")
      assert(planW(10000L, preSize * 10).contains("BroadcastHashJoin"),
        "replication ~1 at huge widths keeps the broadcast")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThr)
    }
  }

  test("adaptive and forced regimes agree on results") {
    val expected = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (bc <- Seq(Some(true), Some(false), None)) {
      val got = RangeJoin.pointInInterval(points, intervals, "k", "p", "s", "e", 64L, bc)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"broadcastIntervals=$bc")
    }
  }

  test("intervalOverlap matches the naive theta join; multi-cell pairs emit once") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // Spans crossing many 10-wide cells, touching pairs, disjoint pairs,
    // and a keyed split.
    val l = Seq((1L, "a", 0L, 35L), (2L, "a", 50L, 55L), (3L, "b", 0L, 100L))
      .toDF("lid", "k", "ls", "le")
    val r = Seq((10L, "a", 30L, 70L), (11L, "a", 200L, 210L), (12L, "b", 90L, 95L))
      .toDF("rid", "k", "rs", "re")
    val got = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re",
        bucketWidth = 10L, keyCols = Seq("k"))
      .select("lid", "rid").as[(Long, Long)].collect().toList
    val naiveOverlap = l.join(r, Seq("k"))
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got.toSet == naiveOverlap)
    assert(got.size == got.toSet.size, s"duplicate pair emission: $got")
    // (1,10) overlap [30,35] spans only part of a cell; (2,10) and (3,12)
    // also overlap; key separation keeps b-side pairs apart from a-side.
    assert(got.toSet == Set((1L, 10L), (2L, 10L), (3L, 12L)))
  }
}
