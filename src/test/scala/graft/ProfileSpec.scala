package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile

class ProfileSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def sample = Seq[(java.lang.Long, java.lang.Double)](
    (1L, 1.5), (2L, 2.5), (2L, null), (3L, 2.5), (null, 0.5)
  ).toDF("a", "b")

  test("exact profile reports counts, nulls, distincts, min/max per column") {
    val p = Profile.numeric(sample, Seq("a", "b"), exactDistinct = true)
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(p("a") == ((5L, 1L, 3L, 1.0, 3.0)))
    assert(p("b") == ((5L, 1L, 3L, 0.5, 2.5)))
  }

  test("numericBy stratifies per group and rejects profiling the group key") {
    import spark.implicits._
    val rows = Seq(("en", Some(1.0)), ("en", Some(3.0)), ("de", Some(5.0)),
      ("de", None)).toDF("lang", "v")
    val p = Profile.numericBy(rows, "lang", Seq("v"), exactDistinct = true)
      .collect().map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_null"), r.getAs[Long]("n_distinct"),
          r.getAs[Double]("min_v"), r.getAs[Double]("max_v")))).toMap
    assert(p("en") == ((2L, 0L, 2L, 1.0, 3.0)))
    assert(p("de") == ((2L, 1L, 1L, 5.0, 5.0)))
    intercept[IllegalArgumentException] {
      Profile.numericBy(rows, "lang", Seq("lang", "v"))
    }
  }

  test("approx regime needs no row shuffle: only the 1-row aggregate merge moves") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val q = Profile.numeric(df, Seq("l_quantity", "l_discount"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("Exchange hashpartitioning"),
      s"profiling shuffled data rows:\n${plan.take(600)}")
    // column pruning: the scan reads only the profiled columns
    assert(!plan.contains("l_extendedprice"), "scan read unprofiled columns")
  }
}
