package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Paragraphs

class ParagraphsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val banner = "Cookie notice: we use cookies"

  test("boilerplate is stripped and survivors reassemble in original order") {
    // banner appears in 3 docs -> >= minRepeats(3) -> dropped everywhere;
    // every other paragraph is document-unique and must survive in place.
    val docs = Seq(
      (1L, s"alpha one\n\n$banner\n\nalpha two"),
      (2L, s"$banner\n\nbeta one\n\nbeta two"),
      (3L, s"gamma one\n\ngamma two\n\n$banner")
    ).toDF("doc_id", "text")
    val out = Paragraphs.removeBoilerplate(docs, "text", "doc_id", minRepeats = 3)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq === Seq(
      (1L, "alpha one\n\nalpha two", 2L, 1L),
      (2L, "beta one\n\nbeta two", 2L, 1L),
      (3L, "gamma one\n\ngamma two", 2L, 1L)))
  }

  test("all-boilerplate document survives as a row with empty text") {
    val docs = Seq(
      (1L, s"$banner\n\n$banner"),
      (2L, s"$banner\n\nkeep me")
    ).toDF("doc_id", "text")
    val out = Paragraphs.removeBoilerplate(docs, "text", "doc_id", minRepeats = 2)
      .orderBy("doc_id").collect()
    assert(out(0) === Row(1L, "", 0L, 2L))
    assert(out(1) === Row(2L, "keep me", 1L, 1L))
  }

  test("within-document repeats count toward minRepeats") {
    // "dup" occurs twice inside doc 1 and nowhere else: 2 occurrences
    // >= minRepeats(2) -> dropped, even though only one document has it.
    val docs = Seq(
      (1L, "dup\n\nmiddle\n\ndup"),
      (2L, "other")
    ).toDF("doc_id", "text")
    val out = Paragraphs.removeBoilerplate(docs, "text", "doc_id", minRepeats = 2)
      .orderBy("doc_id").collect()
    assert(out(0) === Row(1L, "middle", 1L, 2L))
    assert(out(1) === Row(2L, "other", 1L, 0L))
  }

  test("null and empty-text documents emit no output row") {
    val docs = Seq(
      (1L, null.asInstanceOf[String]),
      (2L, ""),
      (3L, "   \n\n  "),   // whitespace-only paragraphs trim to empty
      (4L, "real content")
    ).toDF("doc_id", "text")
    val out = Paragraphs.removeBoilerplate(docs, "text", "doc_id", minRepeats = 2)
      .collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(4L))
    assert(out(0).getString(1) === "real content")
  }

  test("paragraph splitting tolerates extra blank lines and surrounding spaces") {
    val docs = Seq((1L, "a \n\n\n\n b\n\nc")).toDF("doc_id", "text")
    val out = Paragraphs.removeBoilerplate(docs, "text", "doc_id", minRepeats = 2)
      .collect()
    assert(out(0).getString(1) === "a\n\nb\n\nc")
  }

  test("minRepeats below 2 is rejected loudly") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Paragraphs.removeBoilerplate(docs, "text", "doc_id", minRepeats = 1)
    }
    assert(e.getMessage.contains("minRepeats"))
  }
}
