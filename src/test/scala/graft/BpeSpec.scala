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
}
