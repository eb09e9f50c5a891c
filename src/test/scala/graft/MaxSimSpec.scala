package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MaxSim

class MaxSimSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val q = Seq(
    (10L, Seq(Seq(1f, 0f), Seq(0f, 1f)))).toDF("qid", "q_tokens")

  test("maxsim: per-query-token best match sums; top-k and ties by id") {
    val docs = Seq(
      (1L, Seq(Seq(1f, 0f))),               // 1 + 0 = 1
      (2L, Seq(Seq(0f, 2f), Seq(3f, 0f))),  // 1 + 1 = 2 (cosine ignores scale)
      (3L, Seq(Seq(-1f, 0f))),              // -1 + 0 = -1
      (4L, Seq(Seq(0f, 1f), Seq(1f, 0f)))   // 2 — ties doc 2, id breaks
    ).toDF("did", "d_tokens")
    val got = MaxSim.rerank(q, "qid", "q_tokens", docs, "did", "d_tokens", k = 3)
      .collect().map(r => (r.getAs[Long]("did"), r.getAs[Double]("score"),
        r.getAs[Int]("rank"))).toList
    assert(got == List((2L, 2.0, 1), (4L, 2.0, 2), (1L, 1.0, 3)))
  }

  test("maxsim: zero-norm tokens null-skip per query token; null pairs leave the ranking") {
    val docs = Seq(
      (1L, Seq(Seq(0f, 0f), Seq(1f, 0f))), // zero-norm token skipped: 1 + 0
      (2L, Seq(Seq(1f, 1f))),              // sqrt(2)/2 twice = 1.41421...
      (3L, Seq.empty[Seq[Float]]),         // empty matrix -> null score
      (4L, Seq(Seq(0f, 0f)))               // ALL tokens zero-norm -> null score
    ).toDF("did", "d_tokens")
    val got = MaxSim.rerank(q, "qid", "q_tokens", docs, "did", "d_tokens", k = 4)
      .collect().map(r => (r.getAs[Long]("did"), r.getAs[Int]("rank"))).toList
    // docs 3 and 4 are EXCLUDED (null score never occupies a rank slot)
    assert(got == List((2L, 1), (1L, 2)))
  }

  test("meanPool: dimension-wise mean; empty matrix nulls") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, Seq(Seq(1f, 3f), Seq(3f, 5f))),
      (2L, Seq.empty[Seq[Float]])
    ).toDF("id", "toks").select(col("id"), MaxSim.meanPool(col("toks")).as("p"))
    val got = df.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).contains(Seq(2.0, 4.0)))
    assert(got(2L).isEmpty)
  }

  test("rerankPairs scores only the supplied candidate pairs") {
    val pairs = Seq(
      // query 10 paired with docs 1 and 3 only — doc 2 (the best full-corpus
      // match) is absent, so it must not appear
      (10L, Seq(Seq(1f, 0f), Seq(0f, 1f)), 1L, Seq(Seq(1f, 0f))),
      (10L, Seq(Seq(1f, 0f), Seq(0f, 1f)), 3L, Seq(Seq(-1f, 0f)))
    ).toDF("qid", "q_tokens", "did", "d_tokens")
    val got = MaxSim.rerankPairs(pairs, "qid", "q_tokens", "did", "d_tokens", k = 2)
      .collect().map(r => (r.getAs[Long]("did"), r.getAs[Double]("score"),
        r.getAs[Int]("rank"))).toList
    assert(got == List((1L, 1.0, 1), (3L, -1.0, 2)))
  }
}
