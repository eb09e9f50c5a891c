package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Rake

/** RAKE keyphrases: hand-computed deg/freq scores, island splitting,
  * phrase dedup, all-stopword documents, top-k ranking.
  */
class RakeSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("hand-computed phrase scores: deg/freq in exact micro-units") {
    // Stopwords "and"/"of" split: [good data], [good models], [data].
    // good: freq 2, deg 4 -> 2.0; data: freq 2, deg 3 -> 1.5;
    // models: freq 1, deg 2 -> 2.0.
    // "good models" 4.0 > "good data" 3.5 > "data" 1.5.
    val df = Seq((1L, "good data and good models of data")).toDF("id", "text")
    val got = Rake.keyphrases(df, "text", "id", k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("good models", 2L, 4.0, 1L),
      ("good data", 2L, 3.5, 2L),
      ("data", 1L, 1.5, 3L)))
  }

  test("duplicate phrase occurrences collapse to one scored row") {
    // Two [alpha beta] islands: each word freq 2, deg 4 -> phrase 4.0,
    // ONE output row.
    val df = Seq((1L, "alpha beta and alpha beta")).toDF("id", "text")
    val got = Rake.keyphrases(df, "text", "id", k = 5).collect()
    assert(got.length == 1)
    assert(got(0).getString(1) == "alpha beta" && got(0).getDouble(3) == 4.0)
  }

  test("all-stopword and empty documents emit no rows; k guard") {
    val df = Seq((1L, "the of and a"), (2L, ""), (3L, "solo"))
      .toDF("id", "text")
    val got = Rake.keyphrases(df, "text", "id", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3)))
    assert(got.toSeq == Seq((3L, "solo", 1.0)))
    intercept[IllegalArgumentException] {
      Rake.keyphrases(df, "text", "id", k = 0)
    }
  }

  test("top-k cuts by (score desc, phrase) deterministically") {
    // Two single-word phrases tie at 1.0 -> lexicographic phrase order
    // decides which survives k=2 beside the 2-word winner.
    val df = Seq((1L, "zeta of alpha of big gains")).toDF("id", "text")
    // islands: [zeta], [alpha], [big gains]; zeta/alpha: 1.0 each;
    // big gains: 2+2=4.0
    val got = Rake.keyphrases(df, "text", "id", k = 2)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getLong(4)))
    assert(got.toSeq == Seq(("big gains", 1L), ("alpha", 2L)))
  }
}
