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

  test("countMinAudit: exact counts, one-sided error, topK ordering") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val keys = (Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++
      Seq.fill(3)("gamma") ++ Seq("delta")).toDF("k")
    val got = graft.operators.SketchAudit.countMinAudit(keys, "k", topK = 3)
      .orderBy(org.apache.spark.sql.functions.col("n_true").desc,
        org.apache.spark.sql.functions.col("key"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(4)))
    // topK=3 cuts delta; beta/gamma tie at 3 -> both kept over delta.
    assert(got.map(_._1).toSeq == Seq("alpha", "beta", "gamma"))
    assert(got.map(_._2).toSeq == Seq(5L, 3L, 3L))
    // CMS law: estimates never undercount.
    assert(got.forall(_._4))
    assert(got.forall(r => r._3 >= r._2))
  }

  test("countMinAudit: forced collisions (width=2) still never undercount") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val keys = (1 to 40).flatMap(i => Seq.fill(i % 4 + 1)(s"k$i")).toDF("k")
    val got = graft.operators.SketchAudit
      .countMinAudit(keys, "k", depth = 2, width = 2, topK = 40).collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getBoolean(4)))
    // with 40 keys in 2 buckets, SOME estimate must exceed its true count
    assert(got.exists(r => r.getLong(2) > r.getLong(1)))
  }
}
