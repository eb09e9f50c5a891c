package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SketchAudit

/** Sketch accuracy audits: HLL union-vs-exact and GK quantile rank bound. */
class SketchAuditSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("hllUnionAudit: sharded sketches union to within tolerance of exact") {
    // 3 keys x 4 shards, distinct cardinalities 1000/2000/3000 — well
    // inside HLL lgK=12 territory where the estimate is near-exact.
    val df = (0 until 6000).map { i =>
      val key = "k" + (i % 3)
      val value = (i / 3).toLong * 3 + i % 3 // distinct per key
      (key, value, value % 4)
    }.toDF("key", "value", "shard")
    val out = SketchAudit.hllUnionAudit(df, "key", col("shard"), "value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1)
    assert(out.length == 3)
    out.foreach { case (_, nShards, nExact, ok) =>
      assert(nShards == 4)
      assert(nExact == 2000)
      assert(ok)
    }
  }

  test("hllUnionAudit: low cardinality is exact (coupon list regime)") {
    val df = Seq(("a", 1L, 0), ("a", 1L, 1), ("a", 2L, 0), ("b", 9L, 0))
      .toDF("key", "value", "shard")
    val out = SketchAudit.hllUnionAudit(df, "key", col("shard"), "value")
      .orderBy("key").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 1L))
    assert(out.forall(_.getBoolean(3)))
  }

  test("percentileSketchAudit: exact percentile and rank bound on uniform data") {
    val df = (1 to 10000).map(i => ("g" + (i % 2), i.toDouble)).toDF("key", "v")
    val out = SketchAudit.percentileSketchAudit(df, "key", "v",
        Seq(0.5, 0.9), accuracy = 1000)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getBoolean(3)))
    assert(out.length == 4)
    assert(out.forall(_._4), s"rank bound violated: ${out.mkString(",")}")
    // g0: evens 2..10000 (n=5000), exact p50 = 2 + 0.5*(n-1)*2 = 5001.
    val g0p50 = out.find(t => t._1 == "g0" && t._2 == 0.5).get._3
    assert(math.abs(g0p50 - 5001.0) < 1e-6)
  }

  test("percentileSketchAudit: single-row group is trivially within bound") {
    val df = Seq(("only", 42.0)).toDF("key", "v")
    val out = SketchAudit.percentileSketchAudit(df, "key", "v", Seq(0.99))
      .collect()
    assert(out.length == 1)
    assert(out(0).getDouble(2) == 42.0)
    assert(out(0).getBoolean(3))
  }
}
