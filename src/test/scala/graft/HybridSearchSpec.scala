package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HybridSearch

/** Reciprocal-rank fusion: hand-checked fusion arithmetic, one-list-only
  * membership, per-list cutoffs, tie-breaks.
  */
class HybridSearchSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("rrf fuses ranks from both lists; single-list docs get one term") {
    val vec = Seq((1L, 0.9), (2L, 0.8), (3L, 0.7)).toDF("id", "score")
    val lex = Seq((2L, 5.0), (4L, 4.0)).toDF("id", "score")
    val out = HybridSearch.rrf(vec, lex, "id", "score", k = 60)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("rrf_score")).toMap
    // vec ranks: 1->1, 2->2, 3->3; lex ranks: 2->1, 4->2
    assert(out(1L) == r6(1.0 / 61))
    assert(out(2L) == r6(1.0 / 62 + 1.0 / 61)) // both lists
    assert(out(3L) == r6(1.0 / 63))
    assert(out(4L) == r6(1.0 / 62))
    // doc in both lists wins
    val best = HybridSearch.rrf(vec, lex, "id", "score")
      .select("id").as[Long].head()
    assert(best == 2L)
  }

  test("perListK cuts each list before fusion; topN bounds the output") {
    val a = (1L to 10L).map(i => (i, 1.0 / i)).toDF("id", "score")
    val b = (11L to 20L).map(i => (i, 1.0 / i)).toDF("id", "score")
    val out = HybridSearch.rrf(a, b, "id", "score", perListK = 3, topN = 4)
      .collect().map(_.getAs[Long]("id"))
    // only ranks 1-3 of each list survive; topN=4 keeps the best 4 by score
    // (rank-1 pair first by id, then the rank-2 pair)
    assert(out.toSeq == Seq(1L, 11L, 2L, 12L))
  }

  test("score ties break by id deterministically") {
    val a = Seq((5L, 1.0), (3L, 1.0), (4L, 1.0)).toDF("id", "score")
    val b = Seq.empty[(Long, Double)].toDF("id", "score")
    val out = HybridSearch.rrf(a, b, "id", "score", topN = 3)
      .collect().map(_.getAs[Long]("id"))
    assert(out.toSeq == Seq(3L, 4L, 5L))
  }
}
