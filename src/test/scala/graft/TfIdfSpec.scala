package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TfIdf

class TfIdfSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry durian cherry")
  ).toDF("doc_id", "text")

  private def expected(tf: Long, df: Long, n: Long): Double =
    BigDecimal(tf * (math.log((n + 1.0) / (df + 1.0)) + 1.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("score matches the smoothed tf-idf formula on a hand-checked corpus") {
    val s = TfIdf.score(docs, "text", "doc_id")
      .select("doc_id", "term", "tf", "doc_freq", "cf", "tfidf")
      .as[(Long, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(s.size == 6) // (1,apple)(1,banana)(2,banana)(2,cherry)(3,cherry)(3,durian)
    assert(s((1L, "apple")) == ((2L, 1L, 2L, expected(2, 1, 3))))
    assert(s((1L, "banana")) == ((1L, 2L, 2L, expected(1, 2, 3))))
    assert(s((3L, "cherry")) == ((2L, 2L, 3L, expected(2, 2, 3))))
    assert(s((3L, "durian")) == ((1L, 1L, 1L, expected(1, 1, 3))))
  }

  test("the frequency join reuses one scan+explode+shuffle subtree (ReusedExchange)") {
    // exchange reuse is finalized during execution (AQE stage cache) —
    // run the query, then inspect the final plan
    val q = TfIdf.topTerms(docs, "text", "doc_id", 3)
    q.collect()
    // AQE's toString appends the pre-reuse "== Initial Plan ==" — inspect
    // only the executed section
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"no exchange reuse in final plan:\n${plan.take(1200)}")
    assert("Generate explode".r.findAllIn(plan).size == 1,
      s"corpus exploded more than once:\n${plan.take(1200)}")
  }

  test("topTerms ranks by tfidf desc with term tiebreak and caps at k") {
    val top = TfIdf.topTerms(docs, "text", "doc_id", k = 1)
      .select("doc_id", "term", "rank").as[(Long, String, Long)].collect().toSet
    // doc 1: apple (tf=2, df=1) beats banana; doc 3: cherry (tf=2) beats durian (tf=1, rarer)?
    //   cherry: 2*(ln(4/3)+1)=2.575, durian: 1*(ln(2)+1)=1.693 -> cherry
    // doc 2: banana vs cherry both tf=1 df=2 -> tie, term asc -> banana
    assert(top == Set((1L, "apple", 1L), (2L, "banana", 1L), (3L, "cherry", 1L)))
  }

  test("empty and whitespace-only documents contribute no terms") {
    val d = Seq((1L, "only doc"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val s = TfIdf.score(d, "text", "doc_id").select("doc_id").as[Long].collect().toSet
    assert(s == Set(1L))
    // N still counts the empty docs (they are part of the corpus)
    val tfidf = TfIdf.score(d, "text", "doc_id")
      .select("tfidf").as[Double].collect().toSeq
    assert(tfidf.forall(_ == expected(1, 1, 3)))
  }
}
