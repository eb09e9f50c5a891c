package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Wordpiece

/** WordPiece greedy longest-match tokenizer: vocabulary ordering and
  * hand-checked segmentations.
  */
class WordpieceSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("vocabulary: weighted substring counts, (total DESC, piece ASC) order") {
    // "ab ab ba" -> words: ab(x2), ba(x1). Substrings with multiplicity:
    // from ab (cnt 2): a, ab, b; from ba (cnt 1): b, ba, a.
    // totals: a=3, b=3, ab=2, ba=1.
    val df = Seq("ab ab ba").toDF("text")
    val v = Wordpiece.vocabulary(df, "text", vocabSize = 10, maxPieceLen = 6)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(v == Seq(("a", 3L), ("b", 3L), ("ab", 2L), ("ba", 1L)))
    // vocabSize truncates after the deterministic order
    val v2 = Wordpiece.vocabulary(df, "text", vocabSize = 2)
      .collect().map(_.getString(0)).toSeq
    assert(v2 == Seq("a", "b"))
  }

  test("docStats: greedy longest match, UNK fallback, zero-token docs") {
    // Corpus chosen so the top-4 vocab is {a, b, ab, aab}: doc 1 repeats
    // those substrings; "z" never enters a small vocab.
    val df = Seq(
      (1L, "aab aab ab ab a b"),
      (2L, "zz aab"),
      (3L, "   ")
    ).toDF("id", "text")
    val vocab = Wordpiece.vocabulary(df, "text", vocabSize = 4)
      .collect().map(_.getString(0)).toSet
    assert(vocab.contains("a") && vocab.contains("b"))
    val out = Wordpiece.docStats(df, "text", "id", vocabSize = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 3: whitespace only -> zeros.
    assert(out(3L) == ((0L, 0L, 0L)))
    // doc 2: "zz" -> z?z? depends on vocab; 'z' appears only in doc 2 (2
    // occurrences in one word) so it cannot beat a/b/ab/aa|aab family.
    // Each z is UNK: zz -> 2 pieces, 2 unk. aab segments with no unk.
    val (w2, p2, u2) = out(2L)
    assert(w2 == 2L && u2 == 2L)
    assert(p2 >= 3L) // 2 for zz + >= 1 for aab
    // doc 1: no UNKs — every word is covered by {a, b, ab, aab}-ish vocab.
    assert(out(1L)._1 == 6L && out(1L)._3 == 0L)
  }

  test("greedy is longest-match-first, not shortest") {
    // vocab from this corpus contains "abc" (top piece by weight); the
    // word "abc" must segment as ONE piece, not a+b+c.
    val df = Seq((1L, "abc abc abc abc")).toDF("id", "text")
    val out = Wordpiece.docStats(df, "text", "id", vocabSize = 1)
      .collect()(0)
    // top-1 vocab piece is the most frequent substring; with equal counts
    // (a, ab, abc, b, bc, c all x4) the tie-break picks "a" — so pieces
    // become a + UNK + UNK per word.
    assert(out.getLong(1) == 4L)
    assert(out.getLong(2) == 12L) // 3 pieces per word
    assert(out.getLong(3) == 8L)  // b and c are UNK
    // With room for the full family, "abc" wins at its position.
    val out6 = Wordpiece.docStats(df, "text", "id", vocabSize = 6)
      .collect()(0)
    assert(out6.getLong(2) == 4L) // one piece per word
    assert(out6.getLong(3) == 0L)
  }
}
