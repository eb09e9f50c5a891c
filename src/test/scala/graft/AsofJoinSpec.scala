package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

/** As-of join semantics: at-or-before matching, tie inclusion, LEFT nulls
  * for rows with no prior right row, key isolation, multi-column payloads.
  */
class AsofJoinSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("each left row gets the latest right payload at or before its ts") {
    val left = Seq((1L, 10L, "p1"), (1L, 25L, "p2"), (1L, 5L, "p0"), (2L, 50L, "q1"))
      .toDF("user_id", "ts", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 20L, 200.0), (2L, 60L, 999.0))
      .toDF("user_id", "ts", "price")
    val got = AsofJoin.leftAsof(left, right, "user_id", "ts", Seq("price"))
      .select("tag", "price").collect()
      .map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(got("p0").isEmpty)          // no right row at or before ts=5
    assert(got("p1").contains(100.0))  // tie at ts=10 matches (at-or-before)
    assert(got("p2").contains(200.0))  // latest of 10,20
    assert(got("q1").isEmpty)          // key 2's only right row is later
  }

  test("multiple payload columns carry together; left columns untouched") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 3L, 7.0, "a"), (1L, 9L, 8.0, "b"))
      .toDF("k", "ts", "v", "s")
    val row = AsofJoin.leftAsof(left, right, "k", "ts", Seq("v", "s")).collect()(0)
    assert(row.getAs[Long]("k") == 1L && row.getAs[Long]("ts") == 10L)
    assert(row.getAs[Double]("v") == 8.0 && row.getAs[String]("s") == "b")
  }

  test("a matched right row with a NULL payload yields NULL, not an older value") {
    // DuckDB ASOF JOIN semantics: the most recent right ROW wins; if its
    // payload is NULL the left row gets NULL — a per-column last(ignoreNulls)
    // would skip it and resurrect the older 100.0.
    val left = Seq((1L, 30L)).toDF("k", "ts")
    val right = Seq((1L, 10L, Some(100.0)), (1L, 20L, None))
      .toDF("k", "ts", "v")
    val row = AsofJoin.leftAsof(left, right, "k", "ts", Seq("v")).collect()(0)
    assert(row.isNullAt(row.fieldIndex("v")),
      s"expected NULL from the ts=20 row, got ${row.get(row.fieldIndex("v"))}")
  }

  test("plan shape: one shuffle on the key, no range-join explosion") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 3L, 7.0)).toDF("k", "ts", "v")
    val plan = AsofJoin.leftAsof(left, right, "k", "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan.take(500))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1, plan.take(500))
  }
}
