package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Search

/** MMR re-ranking: hand-checked greedy selection (diversification beats a
  * near-duplicate at low lambda), k overshoot, single-candidate query.
  */
class MmrSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // q = [1,0]; a(1) = [1,0] rel 1.0; b(2) = [1,0] exact dup of a;
  // c(3) = [0.6,0.8] rel 0.6, sim to a/b 0.6, all 6-dp-exact.
  private def fixture = {
    val corpus = Seq(
      (1L, Array(1f, 0f)), (2L, Array(1f, 0f)), (3L, Array(0.6f, 0.8f))
    ).toDF("vec_id", "embedding")
    val qs = Seq((100L, Array(1f, 0f))).toDF("qid", "qv")
    (qs, corpus)
  }

  test("lambda=0.3 diversifies: the duplicate drops below the off-axis doc") {
    val (qs, corpus) = fixture
    val got = Search.mmrRerank(qs, corpus, n = 10, k = 3, lambda = 0.3)
      .orderBy("mmr_rank")
      .as[(Long, Long, Int, Double, Double)].collect()
    // step 1: a (rel tie with b, id wins), mmr = 0.3*1.0 = 0.3
    // step 2: b scores 0.3 - 0.7*1.0 = -0.4; c scores 0.3*0.6 - 0.7*0.6
    //         = -0.24 -> c wins despite lower relevance
    // step 3: b, maxSim to {a,c} = 1.0 -> -0.4
    assert(got.map(r => (r._2, r._3)).toSeq ==
      Seq((1L, 1), (3L, 2), (2L, 3)))
    assert(math.abs(got(0)._5 - 0.3) < 1e-9)
    assert(math.abs(got(1)._5 - (-0.24)) < 1e-9)
    assert(math.abs(got(2)._5 - (-0.4)) < 1e-9)
    assert(math.abs(got(1)._4 - 0.6) < 1e-9) // rel column is the raw cosine
  }

  test("high lambda keeps pure relevance order") {
    val (qs, corpus) = fixture
    val got = Search.mmrRerank(qs, corpus, n = 10, k = 3, lambda = 1.0)
      .orderBy("mmr_rank").as[(Long, Long, Int, Double, Double)].collect()
    assert(got.map(_._2).toSeq == Seq(1L, 2L, 3L))
  }

  test("k beyond candidate count emits all candidates; n cuts first") {
    val (qs, corpus) = fixture
    assert(Search.mmrRerank(qs, corpus, n = 10, k = 50, lambda = 0.7).count() == 3)
    // n=1 leaves a single candidate (no pair rows -> left-join path)
    val one = Search.mmrRerank(qs, corpus, n = 1, k = 5, lambda = 0.7)
      .as[(Long, Long, Int, Double, Double)].collect()
    assert(one.toSeq.map(r => (r._2, r._3)) == Seq((1L, 1)))
  }

  test("self row excluded when qid matches a corpus id") {
    val corpus = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val qs = Seq((1L, Array(1f, 0f))).toDF("qid", "qv")
    val got = Search.mmrRerank(qs, corpus, n = 10, k = 5)
      .as[(Long, Long, Int, Double, Double)].collect()
    assert(got.map(_._2).toSeq == Seq(2L))
  }
}
