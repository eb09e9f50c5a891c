package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SpanDedup

/** Exact-substring span dedup: duplicated w-token windows (minus their
  * corpus-wide first occurrence) are removed span-wise, first occurrence
  * kept, intervals merged.
  */
class SpanDedupSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // w=3. Doc 1 and 2 share the 5-token prefix "a b c d e" (three 3-token
  // windows -> one merged span [0,5) in doc 2); doc 3 repeats its own
  // opening window at position 4; doc 4 is too short to window; doc 5 is
  // unique.
  private def docs = Seq(
    (1L, "a b c d e one two three"),
    (2L, "a b c d e four five six"),
    (3L, "x y z pad x y z tail"),
    (4L, "so short"),
    (5L, "q r s t u v")
  ).toDF("id", "txt")

  test("duplicate spans: later occurrences only, merged per doc") {
    val spans = SpanDedup.duplicateSpans(docs, "txt", "id", w = 3)
      .collect().map(r => (r.getAs[Long]("id"),
        r.getAs[Long]("span_start"), r.getAs[Long]("span_end"))).toSet
    // doc 1 wins the shared prefix (lowest (doc, start)); doc 2 loses
    // windows at 0,1,2 -> merged [0,5). doc 3's repeat at 4 -> [4,7).
    assert(spans == Set((2L, 0L, 5L), (3L, 4L, 7L)))
  }

  test("removeDuplicateSpans strips spans, keeps winners and clean docs whole") {
    val out = SpanDedup.removeDuplicateSpans(docs, "txt", "id", w = 3)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("removed_tokens")))).toMap
    assert(out(1L) == (("a b c d e one two three", 0L))) // winner untouched
    assert(out(2L) == (("four five six", 5L)))           // shared prefix gone
    assert(out(3L) == (("x y z pad tail", 3L)))          // within-doc repeat gone
    assert(out(4L) == (("so short", 0L)))                // too short to window
    assert(out(5L) == (("q r s t u v", 0L)))             // unique doc untouched
  }

  test("two identical docs: the second is emptied entirely") {
    val twins = Seq((1L, "w1 w2 w3 w4 w5"), (2L, "w1 w2 w3 w4 w5")).toDF("id", "txt")
    val out = SpanDedup.removeDuplicateSpans(twins, "txt", "id", w = 3)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("removed_tokens")))).toMap
    assert(out(1L) == (("w1 w2 w3 w4 w5", 0L)))
    assert(out(2L) == (("", 5L)))
  }

  test("overlapping marked windows merge; null/empty text survives") {
    val weird = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "   "))
      .toDF("id", "txt")
    val out = SpanDedup.removeDuplicateSpans(weird, "txt", "id", w = 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("clean_text")).toMap
    assert(out(1L) == null && out(2L) == "" && out(3L) == "")
    assert(SpanDedup.duplicateSpans(weird, "txt", "id", w = 3).count() == 0)
  }

  test("plan: window fingerprints are md5 projections below the first exchange") {
    val q = SpanDedup.duplicateSpans(docs, "txt", "id", w = 3)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("md5"), s"fingerprint projection missing:\n${plan.take(1200)}")
    // window STRINGS must not cross a shuffle: no Exchange carries __win
    val exchangeLines = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchangeLines.nonEmpty && !exchangeLines.exists(_.contains("__win")),
      s"window text crossed a shuffle:\n${exchangeLines.mkString("\n")}")
  }
}
