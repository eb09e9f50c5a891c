package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SequencePack

class SequencePackSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // (id, tokens): stream order is doc_id; offsets are 0,3,8,8,18 for seqLen 5
  private def docs = Seq(
    (1L, 3L), (2L, 5L), (3L, 0L), (4L, 10L), (5L, 2L)
  ).toDF("doc_id", "bpe_tokens")

  test("assignments computes exact global offsets, sequence ids and spans") {
    val got = SequencePack.assignments(docs, "bpe_tokens", seqLen = 5,
      orderBy = Seq(col("doc_id")))
      .select("doc_id", "start_token", "seq_id", "offset_in_seq", "n_seqs")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 0L, 0L, 0L, 1L),   // [0,3) in seq 0
      (2L, 3L, 0L, 3L, 2L),   // [3,8): fills seq 0, spills into seq 1
      (3L, 8L, 1L, 3L, 0L),   // empty doc: takes no space
      (4L, 8L, 1L, 3L, 3L),   // [8,18): seqs 1,2,3
      (5L, 18L, 3L, 3L, 1L))) // [18,20) in seq 3
  }

  test("assignments is invariant to the partition count") {
    val one = SequencePack.assignments(docs, "bpe_tokens", 5,
      Seq(col("doc_id")), numPartitions = Some(1))
      .select("doc_id", "start_token").as[(Long, Long)].collect().toMap
    val many = SequencePack.assignments(docs, "bpe_tokens", 5,
      Seq(col("doc_id")), numPartitions = Some(7))
      .select("doc_id", "start_token").as[(Long, Long)].collect().toMap
    assert(one == many)
    assert(one == Map(1L -> 0L, 2L -> 3L, 3L -> 8L, 4L -> 8L, 5L -> 18L))
  }

  test("assignments matches a single global running sum on random corpora") {
    val n = 200
    val rnd = new scala.util.Random(42)
    val corpus = (1L to n).map(i => (i, rnd.nextInt(30).toLong))
      .toDF("doc_id", "bpe_tokens")
    val got = SequencePack.assignments(corpus, "bpe_tokens", 17,
      Seq(col("doc_id")), numPartitions = Some(8))
      .select("doc_id", "start_token").as[(Long, Long)].collect().toMap
    // oracle: plain exclusive prefix sum in driver code
    val rows = corpus.select("doc_id", "bpe_tokens").as[(Long, Long)]
      .collect().sortBy(_._1)
    var acc = 0L
    rows.foreach { case (id, t) =>
      assert(got(id) == acc, s"doc $id")
      acc += t
    }
  }

  test("pieces partitions each document exactly and fills interior sequences") {
    val assigned = SequencePack.assignments(docs, "bpe_tokens", 5,
      Seq(col("doc_id")))
    val p = SequencePack.pieces(assigned, "bpe_tokens", 5, "doc_id")
      .select("doc_id", "seq", "take_from", "take_len", "pos_in_seq")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(p == Set(
      (1L, 0L, 0L, 3L, 0L),
      (2L, 0L, 0L, 2L, 3L), (2L, 1L, 2L, 3L, 0L),
      (4L, 1L, 0L, 2L, 3L), (4L, 2L, 2L, 5L, 0L), (4L, 3L, 7L, 3L, 0L),
      (5L, 3L, 0L, 2L, 3L)))
    // empty doc 3 emits no pieces; slices of a doc sum to its token count
    val sums = SequencePack.pieces(assigned, "bpe_tokens", 5, "doc_id")
      .groupBy("doc_id").agg(sum("take_len").as("t"))
      .as[(Long, Long)].collect().toMap
    assert(sums == Map(1L -> 3L, 2L -> 5L, 4L -> 10L, 5L -> 2L))
    // every sequence before the stream tail is filled to exactly seqLen
    val perSeq = SequencePack.pieces(assigned, "bpe_tokens", 5, "doc_id")
      .groupBy("seq").agg(sum("take_len").as("t"))
      .as[(Long, Long)].collect().toMap
    assert(perSeq == Map(0L -> 5L, 1L -> 5L, 2L -> 5L, 3L -> 5L))
  }

  test("the prefix-sum window is per-partition, never global") {
    val assigned = SequencePack.assignments(docs, "bpe_tokens", 5,
      Seq(col("doc_id")), numPartitions = Some(4))
    // a global window would show 'Window ... ORDER BY' with an Exchange
    // SinglePartition feeding it
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global single-partition stage found:\n$plan")
  }

  test("rejects non-identifier token columns and non-positive seqLen") {
    intercept[IllegalArgumentException] {
      SequencePack.assignments(docs, "bpe_tokens; drop", 5, Seq(col("doc_id")))
    }
    intercept[IllegalArgumentException] {
      SequencePack.assignments(docs, "bpe_tokens", 0, Seq(col("doc_id")))
    }
  }

  test("paddingWasteReport: bucket ceilings, waste math, zero-token docs") {
    import spark.implicits._
    // widths of 4: tokens 1..4 -> bucket 4; 5..8 -> bucket 8; 0 -> bucket 4.
    val df = Seq((1L, 3L), (2L, 4L), (3L, 5L), (4L, 0L)).toDF("id", "ntok")
    val out = SequencePack.paddingWasteReport(df, "ntok", bucketWidth = 4)
      .orderBy("bucket_max").collect()
      .map(r => (r.getAs[Long]("bucket_max"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("total_tokens"), r.getAs[Long]("padded_tokens"),
        r.getAs[Double]("waste_ratio")))
    // bucket 4: docs {1 (3), 2 (4), 4 (0)} -> 7 tokens carried, 12 paid.
    assert(out(0) == ((4L, 3L, 7L, 12L, math.rint((1.0 - 7.0 / 12) * 1e6) / 1e6)))
    // bucket 8: doc 3 (5 tokens) -> 5 carried, 8 paid.
    assert(out(1) == ((8L, 1L, 5L, 8L, 0.375)))
    intercept[IllegalArgumentException] {
      SequencePack.paddingWasteReport(df, "ntok", bucketWidth = 0)
    }
  }
}
