package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bpe
import graft.operators.SequencePack

class BpeSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("encodeWord replays merges by rank, leftmost occurrence first") {
    // 'scan': s c a n -> (a,n) rank 10 -> s c an -> (c,an) -> s can -> scan
    assert(Bpe.encodeWord("scan").toSeq == Seq("scan"))
    assert(Bpe.encodeWord("window").toSeq == Seq("window"))
    assert(Bpe.encodeWord("the").toSeq == Seq("the"))
    // unseen word: only partial merges apply, the rest stay code points
    assert(Bpe.encodeWord("zzz").toSeq == Seq("z", "z", "z"))
    // 'stream' exercises a chain: (s,t) then (e,am)... -> single token
    assert(Bpe.encodeWord("stream").toSeq == Seq("stream"))
    // single char / empty
    assert(Bpe.encodeWord("x").toSeq == Seq("x"))
    assert(Bpe.encodeWord("").toSeq == Seq())
  }

  test("count follows the space-tokenizer contract (lowercase, empties dropped)") {
    val df = Seq(
      (1L, "Scan  WINDOW the"),          // case-folded, double space dropped
      (2L, ""),                          // no tokens
      (3L, null.asInstanceOf[String]),   // null text
      (4L, "zzz qq")                     // unseen words: 3 + 2 code points
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), Bpe.count(col("text")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 0L, 3L -> 0L, 4L -> 5L))
  }

  test("graft_bpe_merge_count is registered as a SQL function") {
    graft.plans.GraftFunctions.register(spark)
    val n = spark.sql("SELECT graft_bpe_merge_count('the fast scan') AS n")
      .as[Long].collect()(0)
    assert(n == 3L)
  }

  test("BPE counts drive the packing operators as tokensCol") {
    // The verdict-#5 wiring: budget in exact BPE tokens, not whitespace
    // tokens. 'the fast scan' = 3 BPE tokens but 14 chars / 3 ws tokens;
    // sequence packing over the BPE column must use the BPE arithmetic.
    val docs = Seq(
      (1L, "the fast scan"),       // 3 tokens
      (2L, "window window"),       // 2 tokens
      (3L, "zzz")                  // 3 tokens (unseen word stays chars)
    ).toDF("doc_id", "text")
      .withColumn("bpe_tokens", Bpe.count(col("text")))
    val packed = SequencePack.assignments(docs, "bpe_tokens", seqLen = 4,
        orderBy = Seq(col("doc_id")))
      .select("doc_id", "start_token").as[(Long, Long)].collect().toMap
    assert(packed == Map(1L -> 0L, 2L -> 3L, 3L -> 5L))
  }

  test("tokens column exposes the piece sequence") {
    val pieces = Seq((1L, "the zzq"))
      .toDF("doc_id", "text")
      .select(Bpe.tokens(col("text")).as("p"))
      .as[Seq[String]].collect()(0)
    assert(pieces == Seq("the", "z", "z", "q"))
  }

  test("trainMerges: the classic low/lower/newest corpus, hand-computed") {
    // words: low x3, lower x2, newest x1.
    // round 1: (l,o)=5 ties (o,w)=5 -> lex smallest (l,o)
    // round 2: (lo,w)=5 wins
    // round 3: (low,e)=2 ties (e,r)=2 -> lex smallest (e,r)
    val docs = Seq((1L, "low low lower newest"), (2L, "low lower"))
      .toDF("doc_id", "text")
    val got = Bpe.trainMerges(docs, "text", 3)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1, "l", "o", 5L), (2, "lo", "w", 5L), (3, "e", "r", 2L)))
  }

  test("trainMerges stops early when the vocabulary runs out of pairs") {
    val got = Bpe.trainMerges(Seq((1L, "ab ab")).toDF("doc_id", "text"), "text", 10)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "b", 2L))) // 'ab' x2 -> one pair, then done
  }

  test("trainMerges on the fixture reproduces the pinned artifact's prefix") {
    // The pinned table's provenance claim (object scaladoc): trained with
    // exactly this learner on the sf0.001 documents fixture. Retraining the
    // first 10 merges must reproduce the artifact prefix.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Bpe.trainMerges(docs, "text", 10)
      .orderBy("rank").as[(Int, String, String, Long)].collect()
      .map(r => (r._2, r._3)).toSeq
    assert(got == Bpe.merges.take(10).toSeq)
  }

  test("tableFor: a trained table drives count/tokens like the pinned one") {
    val docs = Seq((1L, "low low lower newest")).toDF("doc_id", "text")
    val learned = Bpe.trainMerges(docs, "text", 3)
      .orderBy("rank").as[(Int, String, String, Long)].collect()
      .map(r => (r._2, r._3)).toSeq
    val tbl = Bpe.tableFor(learned)
    // after (l,o), (lo,w), (e,r): low -> [low], lower -> [low, er],
    // newest -> [n, e, w, e, s, t] (no trained merge applies cleanly:
    // (e,r) needs adjacent e r which newest lacks)
    assert(tbl.encodeWord("low").toSeq == Seq("low"))
    assert(tbl.encodeWord("lower").toSeq == Seq("low", "er"))
    assert(tbl.encodeWord("newest").toSeq == Seq("n", "e", "w", "e", "s", "t"))
    val counts = docs.select(tbl.count(col("text")).as("n")).as[Long].collect()
    assert(counts.toSeq == Seq(1L + 1L + 2L + 6L))
  }
}
