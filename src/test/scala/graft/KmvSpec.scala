package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.KmvSketchAgg

class KmvSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("sketch is the sorted min-k of the distinct values, duplicates ignored") {
    val vals = (1 to 100).map(i => f"v$i%03d") ++ (1 to 100).map(i => f"v$i%03d")
    val got = vals.toDF("v")
      .agg(KmvSketchAgg.kmvSketch(col("v"), 4).as("sk"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("v001", "v002", "v003", "v004"))
  }

  test("partial-aggregate merges are exact: repartitioned == single partition") {
    val df = (1 to 500).map(i => f"x$i%04d").toDF("v")
    def sk(d: org.apache.spark.sql.DataFrame) =
      d.agg(KmvSketchAgg.kmvSketch(col("v"), 16)).collect()(0).getSeq[String](0)
    assert(sk(df.repartition(13)) == sk(df.coalesce(1)))
  }

  test("jaccardEstimate is exact when k covers the union; bounded otherwise") {
    // A = {a..f}, B = {d..i}: inter 3, union 9 -> J = 1/3
    val a = Seq("a", "b", "c", "d", "e", "f")
    val b = Seq("d", "e", "f", "g", "h", "i")
    val df = Seq((a, b)).toDF("sa", "sb")
    val exact = df.select(KmvSketchAgg.jaccardEstimate(col("sa"), col("sb"), 16))
      .collect()(0).getDouble(0)
    assert(math.abs(exact - 1.0 / 3) < 1e-6)
    // truncated sketches (k=4): estimate still in [0, 1]
    val sk4 = df.select(KmvSketchAgg.jaccardEstimate(
      slice(col("sa"), 1, 4), slice(col("sb"), 1, 4), 4)).collect()(0).getDouble(0)
    assert(sk4 >= 0.0 && sk4 <= 1.0)
  }

  test("SQL surface: kmv_sketch and approx_top_items usable from SQL text") {
    graft.plans.GraftFunctions.register(spark)
    (1 to 50).map(i => (i % 5, f"v$i%03d")).toDF("g", "v")
      .createOrReplaceTempView("kmv_rows")
    val sk = spark.sql(
      "SELECT g, kmv_sketch(v, 3) AS sk FROM kmv_rows GROUP BY g ORDER BY g")
      .collect()
    assert(sk.length == 5)
    assert(sk(0).getSeq[String](1) == Seq("v005", "v010", "v015"))
    val top = spark.sql(
      "SELECT approx_top_items(CAST(g AS STRING), 8) AS t FROM kmv_rows")
      .collect()(0).getMap[String, Long](0)
    assert(top.values.sum == 50)
    // non-literal k fails loudly
    val e = intercept[Exception](
      spark.sql("SELECT kmv_sketch(v, g) FROM kmv_rows").collect())
    assert(e.getMessage.contains("integer literal") ||
      Option(e.getCause).exists(_.getMessage.contains("integer literal")))
  }

  test("null inputs are skipped; empty input yields an empty sketch") {
    val got = Seq(Option("a"), None, Option("b")).toDF("v")
      .agg(KmvSketchAgg.kmvSketch(col("v"), 8)).collect()(0).getSeq[String](0)
    assert(got == Seq("a", "b"))
    val empty = Seq.empty[String].toDF("v")
      .agg(KmvSketchAgg.kmvSketch(col("v"), 8)).collect()(0).getSeq[String](0)
    assert(empty.isEmpty)
  }
}
