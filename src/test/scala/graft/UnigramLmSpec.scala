package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UnigramLm

/** Unigram-LM tokenizer: Viterbi optimality, tie conventions, vocabulary
  * counts/costs, and the segment-output invariants the SQL oracle's
  * metric-only check cannot see (the pieces string itself).
  */
class UnigramLmSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("viterbi picks the min-cost segmentation") {
    val v = Map("a" -> 10L, "b" -> 10L, "ab" -> 5L)
    val Some((ps, m)) = UnigramLm.viterbi("abab", v, 4)
    assert(ps == List("ab", "ab"))
    assert(m / 16 == 10L && m % 16 == 2L)
  }

  test("cost ties break toward fewer pieces; residual ties keep the shorter last piece") {
    val v1 = Map("a" -> 2L, "aa" -> 4L)
    assert(UnigramLm.viterbi("aa", v1, 4).get._1 == List("aa"))
    // "aba": ab+a and a+ba tie at cost 4, 2 pieces -> shorter LAST piece
    val v2 = Map("a" -> 2L, "b" -> 2L, "ab" -> 2L, "ba" -> 2L)
    assert(UnigramLm.viterbi("aba", v2, 4).get._1 == List("ab", "a"))
  }

  test("unsegmentable words return None / fail loudly in segment") {
    assert(UnigramLm.viterbi("za", Map("a" -> 1L), 4).isEmpty)
    assert(UnigramLm.viterbi("", Map("a" -> 1L), 4).contains((Nil, 0L)))
    val df = Seq(Tuple1("zz")).toDF("text")
    val vocab = Seq(("a", 1L, 7L)).toDF("piece", "n", "cost_micro")
    val e = intercept[Exception] {
      UnigramLm.segment(df, "text", vocab).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("graft.UnigramLm")))
  }

  test("trainVocab: occurrence-weighted substring counts and micro-nat costs") {
    val df = Seq(Tuple1("ab ab b")).toDF("text")
    val got = UnigramLm.trainVocab(df, "text", topK = 1)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // words: ab x2, b x1 -> counts a=2, b=2+1=3, ab=2; total = 7
    def cost(n: Long) = math.rint(-math.log(n.toDouble / 7) * 1e6).toLong
    assert(got == Map(
      "a" -> ((2L, cost(2))), "b" -> ((3L, cost(3))),
      "ab" -> ((2L, cost(2)))))
  }

  test("segment invariants: pieces concat to the word, cost = sum of piece costs") {
    val df = Seq(Tuple1("scan scan sort merge fastscan")).toDF("text")
    val vocab = UnigramLm.trainVocab(df, "text")
    val vmap = vocab.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val rows = UnigramLm.segment(df, "text", vocab).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val word = r.getString(0)
      val pieces = r.getString(2).split(" ").toList
      assert(pieces.mkString == word, s"pieces don't cover '$word'")
      assert(pieces.length.toLong == r.getLong(3))
      assert(pieces.map(vmap).sum == r.getLong(4),
        s"cost mismatch for '$word'")
    }
    // the repeated word's count flows through
    assert(rows.find(_.getString(0) == "scan").get.getLong(1) == 2L)
  }
}
