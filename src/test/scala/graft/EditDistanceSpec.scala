package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EditDistance

class EditDistanceSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], prefixLen: Int = 4,
                  cap: Int = 400, maxRatio: Double = 0.2,
                  maxBlockSize: Int = 10000) =
    EditDistance.pairs(rows.toDF("doc_id", "text"), "doc_id", "text",
      prefixLen, cap, maxRatio, maxBlockSize)
      .orderBy("id_a", "id_b").collect()

  test("hand-computed pair: one substitution on shared-prefix texts") {
    // "the scan runs fast" vs "the scan runs last": dist 1, max len 18.
    val out = run(Seq(1L -> "the scan runs fast", 2L -> "the scan runs last"))
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    assert(r.getAs[Long]("dist") == 1L)
    assert(r.getAs[Double]("ratio") == math.rint(1.0 / 18 * 1e6) / 1e6)
  }

  test("blocking: similar texts with different prefixes are never compared") {
    val out = run(Seq(1L -> "aaa scan order merge", 2L -> "zzz scan order merge"))
    assert(out.isEmpty)
  }

  test("ratio gate: a shared-prefix but distant pair is dropped") {
    val out = run(Seq(
      1L -> "sort window value key merge join",
      2L -> "sort by completely different body text here"))
    assert(out.isEmpty) // dist/len well past 0.2
  }

  test("cap: differences past the cap window are invisible") {
    val head = "same head " * 5
    val out = run(Seq(1L -> (head + "tail one"), 2L -> (head + "tail two")),
      cap = head.length)
    assert(out.length == 1 && out(0).getAs[Long]("dist") == 0L)
    assert(out(0).getAs[Double]("ratio") == 0.0)
  }

  test("exact duplicates and empty texts pair at distance 0, ratio 0.0") {
    val out = run(Seq(1L -> "", 2L -> "", 3L -> "sort sort", 4L -> "sort sort"))
    assert(out.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSeq ==
      Seq((1L, 2L), (3L, 4L)))
    assert(out.forall(r => r.getAs[Long]("dist") == 0L &&
      r.getAs[Double]("ratio") == 0.0))
  }

  test("lowercase normalization: case-only variants are exact dups") {
    val out = run(Seq(1L -> "Sort Merge Join", 2L -> "sort merge join"))
    assert(out.length == 1 && out(0).getAs[Long]("dist") == 0L)
  }

  test("null ids are dropped") {
    val df = Seq((java.lang.Long.valueOf(1L), "sort merge"),
      (null.asInstanceOf[java.lang.Long], "sort merge"))
      .toDF("doc_id", "text")
    assert(EditDistance.pairs(df, "doc_id", "text", 4, 400, 0.2, 100)
      .collect().isEmpty)
  }

  test("mega-block guard fails loudly by default semantics") {
    val rows = (1L to 4L).map(i => i -> "same prefix block row")
    val ex = intercept[Exception] {
      run(rows, maxBlockSize = 3)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m =>
      m != null && m.contains("graft.editDistancePairs")))
  }

  test("jaroWinkler kernel: canonical values and the 0.7 boost threshold") {
    def jw(a: String, b: String) =
      math.rint(EditDistance.jaroWinkler(a, b) * 1e6) / 1e6
    assert(jw("martha", "marhta") == 0.961111)
    assert(jw("dixon", "dicksonx") == 0.813333)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
    // jaro = 5/9 <= 0.7: shared 2-char prefix earns NO Winkler boost
    assert(jw("abcdef", "abpqrs") == 0.555556)
    assert(jw("", "") == 1.0)
    assert(jw("a", "") == 0.0)
  }

  test("jaroPairs: first-letter blocks, threshold, hand-computed sims") {
    val df = Seq((1L, "ann"), (2L, "anna"), (3L, "bob"), (4L, "bobby"),
      (5L, "ben")).toDF("id", "name")
    val got = EditDistance.jaroPairs(df, "id", "name", minSim = 0.8)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("jw"))).toSeq
    // ann/anna: jaro 11/12, prefix 3 -> 0.941667
    // bob/bobby: jaro 13/15, prefix 3 -> 0.906667
    // bob/ben: window 0 so only 'b' matches -> jaro 5/9, no boost, dropped
    // bobby/ben: jaro 0.511 -> dropped; cross-block never compared
    assert(got == Seq((1L, 2L, 0.941667), (3L, 4L, 0.906667)))
  }

  test("jaroPairs mega-block guard raises a named error") {
    val rows = (1L to 5L).map(i => (i, s"aname$i"))
    val ex = intercept[Exception] {
      EditDistance.jaroPairs(rows.toDF("id", "name"), "id", "name",
        minSim = 0.0, maxBlockSize = 3).collect()
    }
    assert(ex.getMessage.contains("graft.jaroPairs"))
  }

  test("symspellPairs: >100-char strings keep their full deletion tails (r9 advice)") {
    // s2 = s1 with the first char deleted; the shared variant's TAIL is 150
    // chars, past the old fixed substr cap that silently truncated it and
    // missed the pair.
    val long1 = "x" + "b" + ("c" * 150)
    val long2 = "b" + ("c" * 150)
    val df = Seq((1L, long1), (2L, long2)).toDF("id", "name")
    val got = EditDistance.symspellPairs(df, "id", "name")
      .filter($"id_a" < $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 2L, 1L)))
  }

  test("symspellPairs: finds all distance-<=1 pairs incl. first-char edits") {
    val df = Seq((1L, "abc"), (2L, "abc"), (3L, "abd"), (4L, "ab"),
      (5L, "xabc"), (6L, "azz")).toDF("id", "name")
    val got = EditDistance.symspellPairs(df, "id", "name")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(4))).toMap
    // (1,5): the FIRST-char insertion a prefix blocker would miss.
    val want = Map((1L, 2L) -> 0L, (1L, 3L) -> 1L, (1L, 4L) -> 1L,
      (1L, 5L) -> 1L, (2L, 3L) -> 1L, (2L, 4L) -> 1L, (2L, 5L) -> 1L,
      (3L, 4L) -> 1L)
    assert(got == want, s"got $got")
    // completeness vs in-test brute force
    val names = Map(1L -> "abc", 2L -> "abc", 3L -> "abd", 4L -> "ab",
      5L -> "xabc", 6L -> "azz")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      a <- names.keys; b <- names.keys if a < b
      if lev(names(a), names(b)) <= 1
    } yield (a, b)).toSet
    assert(got.keySet == brute)
  }

  test("sortedNeighborhoodPairs: window catches cross-letter neighbors") {
    // sorted order: [bob, bobby, box, coy, cox]; window 2 pairs bob-bobby
    // (0.94+), bobby-box?, box-coy (different letters but adjacent in the
    // sort — a first-letter blocker would NEVER compare them).
    val df = Seq((1L, "bob"), (2L, "bobby"), (3L, "box"), (4L, "cox"),
      (5L, "coy")).toDF("id", "name")
    val got = EditDistance.sortedNeighborhoodPairs(df, "id", "name",
        window = 2, minSim = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // jw(bob,bobby)=0.906667; jw(bob,box)=0.822222; jw(cox,coy)=0.822222;
    // jw(bobby,box) = jaro(13/15? recompute) -> below 0.8 threshold or not:
    // m=2 ('b','o'), jaro=(2/5+2/3+1)/3=0.688 <= 0.7 -> 0.688 dropped.
    assert(got == Set((1L, 2L), (1L, 3L), (4L, 5L)))
    intercept[IllegalArgumentException] {
      EditDistance.sortedNeighborhoodPairs(df, "id", "name", window = 0)
    }
  }

  test("spellCorrect: exact hit at dist 0, frequency prior, no-suggestion null") {
    val vocab = Seq(("spark", 50L), ("spare", 80L), ("stark", 10L))
      .toDF("w", "n")
    val queries = Seq("spark", "sparc", "zzzz").map(Tuple1(_)).toDF("q")
    val got = EditDistance.spellCorrect(queries, "q", vocab, "w", "n")
      .collect().map(r => r.getString(0) ->
        ((Option(r.getString(1)), Option(r.get(3)).map(_.asInstanceOf[Long]))))
      .toMap
    assert(got("spark") == ((Some("spark"), Some(0L)))) // exact beats spare
    // "sparc": dist-1 candidates spark(50) and spare(80) -> prior wins
    assert(got("sparc") == ((Some("spare"), Some(1L))))
    assert(got("zzzz") == ((None, None)))
  }
}
