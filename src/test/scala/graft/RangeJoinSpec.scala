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
}
