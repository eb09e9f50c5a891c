package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Search

/** Rank-biased overlap and ROUGE-N: exact-rational coefficient replay,
  * hand-computed overlaps, clipped-count edge cases.
  */
class RankTextEvalSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("rbo of identical rankings = 1 - p^k; full overlap at k") {
    // X_d = d at every depth -> RBO@k = (1-p) * sum p^(d-1) = 1 - p^k.
    val ranks = (1 to 10).map(i => (7L, i, i)).toDF("qid", "ra", "rb")
    val r = Search.rbo(ranks, "qid", "ra", "rb", k = 10, pNum = 9, pDen = 10)
      .collect()(0)
    assert(r.getLong(1) == 10L)
    assert(r.getDouble(2) == 0.651322) // 1 - 0.9^10, 6 dp
  }

  test("rbo hand case: k=3, p=1/2, one swap in the top 2") {
    // A=[x,y,z], B=[y,x,z]: X_1=0, X_2=2, X_3=3
    // RBO = 0.5*(1*0/1 + 0.5*2/2 + 0.25*3/3) = 0.375
    val ranks = Seq((1L, 1, 2), (1L, 2, 1), (1L, 3, 3))
      .toDF("qid", "ra", "rb")
    val r = Search.rbo(ranks, "qid", "ra", "rb", k = 3, pNum = 1, pDen = 2)
      .collect()(0)
    assert(r.getLong(1) == 3L && r.getDouble(2) == 0.375)
  }

  test("rbo drops items past k under either ranking; disjoint -> no row") {
    // item at (ra=2, rb=9) is outside k=3 for B -> contributes nothing.
    val ranks = Seq((1L, 1, 1), (1L, 2, 9), (2L, 5, 1), (2L, 1, 6))
      .toDF("qid", "ra", "rb")
    val got = Search.rbo(ranks, "qid", "ra", "rb", k = 3, pNum = 1, pDen = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L)) // qid 2 fully disjoint in the top 3
  }

  test("rbo coefficient overflow fails loudly") {
    val ranks = Seq((1L, 1, 1)).toDF("qid", "ra", "rb")
    intercept[IllegalArgumentException] {
      Search.rbo(ranks, "qid", "ra", "rb", k = 40, pNum = 99, pDen = 100)
    }
  }

  test("rougeN bigrams: hand-computed clipped precision/recall/f1") {
    // cand "a b c" -> {ab, bc}; ref "a b c d a b" -> ab:2 bc:1 cd:1 da:1
    // overlap = min(1,2)+min(1,1) = 2; P = 2/2, R = 2/5, F = 4/7
    val pairs = Seq((1L, "a b c", "a b c d a b")).toDF("id", "cand", "ref")
    val r = Search.rougeN(pairs, "id", "cand", "ref", n = 2).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 5L, 2L)))
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 0.4)
    assert(r.getDouble(6) == 0.571429)
  }

  test("rougeN clips repeated grams by the reference count") {
    // cand "a b a b" -> ab:2 ba:1 (nc=3); ref "a b" -> ab:1 (nr=1)
    // overlap = min(2,1) = 1; P = 1/3, R = 1, F = 2/4
    val pairs = Seq((1L, "a b a b", "a b")).toDF("id", "cand", "ref")
    val r = Search.rougeN(pairs, "id", "cand", "ref", n = 2).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 1L, 1L)))
    assert(r.getDouble(4) == 0.333333 && r.getDouble(5) == 1.0)
    assert(r.getDouble(6) == 0.5)
  }

  test("rougeN: candidate shorter than n has no grams -> all zeros") {
    val pairs = Seq((1L, "a", "a b c")).toDF("id", "cand", "ref")
    val r = Search.rougeN(pairs, "id", "cand", "ref", n = 2).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((0L, 2L, 0L)))
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0 &&
      r.getDouble(6) == 0.0)
  }

  test("percolate: conjunctive matching against the registry") {
    val df = Seq((1L, "fast join on key"), (2L, "join slow"),
      (3L, "fast fast join"), (4L, "other words"))
      .toDF("doc_id", "text")
    val got = Search.percolate(df, "text", "doc_id",
      Seq(("q1", Seq("join", "fast")), ("q2", Seq("key")),
        ("q3", Seq("absent", "join"))))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("q1" -> 2L, "q2" -> 1L, "q3" -> 0L))
    intercept[IllegalArgumentException] {
      Search.percolate(df, "text", "doc_id", Seq(("bad", Seq.empty)))
    }
    // the registry is driver-held and broadcast: outgrowing maxRegistry
    // trips loudly instead of limping through a giant BNLJ
    val ex = intercept[IllegalArgumentException] {
      Search.percolate(df, "text", "doc_id",
        Seq(("q1", Seq("a")), ("q2", Seq("b")), ("q3", Seq("c"))),
        maxRegistry = 2)
    }
    assert(ex.getMessage.contains("maxRegistry"), ex.getMessage)
  }

  test("percolateIndexed: rarest-term prefilter matches the broadcast regime") {
    val df = Seq((1L, "fast join on key"), (2L, "join slow"),
      (3L, "fast fast join"), (4L, "other words"))
      .toDF("doc_id", "text")
    val registry = Seq(("q1", Seq("join", "fast")), ("q2", Seq("key")),
      ("q3", Seq("absent", "join")))
    val broadcastRows = Search.percolate(df, "text", "doc_id", registry)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val indexedRows = Search
      .percolateIndexed(df, "text", "doc_id", registry.toDF("query_id", "terms"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // row identity with the broadcast regime — including q3's zero (its
    // rarest term "absent" has df 0 -> zero candidates, still reported)
    assert(indexedRows == broadcastRows, indexedRows.toString)
    assert(indexedRows.exists(r => r._1 == "q3" && r._3 == 0L))
    // a stored query with no terms raises in-flight, the broadcast
    // regime's same refusal
    val ex2 = intercept[Exception] {
      Search.percolateIndexed(df, "text", "doc_id",
        Seq(("ok", Seq("join")), ("bad", Seq.empty[String]))
          .toDF("query_id", "terms")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex2).exists(_.contains("has no terms")), msgs(ex2).mkString("|"))
    // duplicate doc ids: each ROW counts once (the quadratic verify-join
    // overcount class) — id 7 has two matching rows and one miss
    val dup = Seq((7L, "fast join a"), (7L, "fast join b"), (7L, "join only"),
      (8L, "fast join c")).toDF("doc_id", "text")
    val dupGot = Search.percolateIndexed(dup, "text", "doc_id",
        Seq(("q", Seq("fast", "join"))).toDF("query_id", "terms"))
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    assert(dupGot == Seq(("q", 3L)), dupGot.toString)
    // duplicate QUERY ids raise in-flight: the rarest-term argmin would
    // pick one token across the union of both term lists (lossy for the
    // query that doesn't contain it) — r11 advice
    val exDup = intercept[Exception] {
      Search.percolateIndexed(df, "text", "doc_id",
        Seq(("q1", Seq("join")), ("q1", Seq("key")))
          .toDF("query_id", "terms")).collect()
    }
    assert(msgs(exDup).exists(_.contains("duplicate stored")),
      msgs(exDup).mkString("|"))
    // ... and the guard must fire even when the CORPUS is empty: AQE's
    // empty-relation propagation prunes the postings/verify branches
    // entirely, so the check lives on the preserved side of the output
    // join, the one branch that always evaluates.
    val exDupEmpty = intercept[Exception] {
      Search.percolateIndexed(
        df.filter(org.apache.spark.sql.functions.lit(false)), "text", "doc_id",
        Seq(("q1", Seq("join")), ("q1", Seq("key")))
          .toDF("query_id", "terms")).collect()
    }
    assert(msgs(exDupEmpty).exists(_.contains("duplicate stored")),
      msgs(exDupEmpty).mkString("|"))
  }

  test("autocompleteIndex: per-prefix top-k by frequency, tie by token") {
    val df = Seq(Tuple1("scan scan scan sort sort s key"))
      .toDF("text")
    val got = Search.autocompleteIndex(df, "text", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(3)) ->
        ((r.getString(1), r.getLong(2)))).toMap
    assert(got(("s", 1L)) == (("scan", 3L)))
    assert(got(("s", 2L)) == (("sort", 2L)))   // "s" itself (1) cut at k=2
    assert(got(("sc", 1L)) == (("scan", 3L)))
    assert(got(("k", 1L)) == (("key", 1L)))
    assert(!got.contains(("s", 3L)))
  }
}
