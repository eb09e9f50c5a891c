package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.HeavyHittersAgg.approxTopItems

/** Misra-Gries heavy-hitters aggregate: exact when distinct items fit the
  * capacity (any partitioning), guaranteed-presence + bounded undercount
  * under skew, and null handling.
  */
class HeavyHittersSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("exact counts when distinct items <= capacity, any partitioning") {
    val data = (1 to 1000).map(i => s"item_${i % 7}")
    for (parts <- Seq(1, 4, 13)) {
      val got = data.toDF("s").repartition(parts)
        .agg(approxTopItems(col("s"), 16).as("top"))
        .collect()(0).getMap[String, Long](0)
      val expected = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(Map(got.toSeq: _*) == expected, s"parts=$parts")
    }
  }

  test("skew: the heavy item always survives with count >= truth - n/(capacity+1)") {
    // 10k rows: 60% one hot key, the rest spread over 500 cold keys.
    val n = 10000
    val data = (0 until n).map(i => if (i % 5 < 3) "hot" else s"cold_${i % 500}")
    val cap = 20
    val got = data.toDF("s").repartition(8)
      .agg(approxTopItems(col("s"), cap).as("top"))
      .collect()(0).getMap[String, Long](0)
    val m = Map(got.toSeq: _*)
    val trueHot = data.count(_ == "hot").toLong
    assert(m.contains("hot"), s"hot item evicted: $m")
    assert(m("hot") <= trueHot, "MG must never overcount")
    assert(m("hot") >= trueHot - n.toLong / (cap + 1),
      s"undercount beyond bound: got ${m("hot")}, true $trueHot")
    assert(m.size <= cap)
  }

  test("nulls are skipped; grouped aggregation works per group") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", null), ("b", "y"))
      .toDF("g", "s")
    val rows = df.groupBy("g").agg(approxTopItems(col("s"), 4).as("top"))
      .collect().map(r => r.getString(0) -> Map(r.getMap[String, Long](1).toSeq: _*)).toMap
    assert(rows("a") == Map("x" -> 2L))
    assert(rows("b") == Map("y" -> 1L))
  }
}
