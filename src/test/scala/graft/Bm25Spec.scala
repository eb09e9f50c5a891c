package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bm25

class Bm25Spec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // Doc lengths: 3, 2, 4, 1 (avgdl = 2.5, N = 4).
  private def docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry durian cherry apple"),
    (4L, "elderberry")
  ).toDF("doc_id", "text")

  private def bm25(tf: Long, df: Long, dl: Long,
                   n: Long = 4, avgdl: Double = 2.5,
                   k1: Double = 1.2, b: Double = 0.75): Double =
    math.log((n - df + 0.5) / (df + 0.5) + 1.0) *
      (tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * dl / avgdl))

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("score matches the Lucene BM25 formula on a hand-checked corpus") {
    val s = Bm25.score(docs, "text", "doc_id", Seq("apple", "cherry"))
      .select("doc_id", "matched_terms", "bm25")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 4 matches nothing and is absent
    assert(s.keySet == Set(1L, 2L, 3L))
    assert(s(1L) == ((1L, round6(bm25(tf = 2, df = 2, dl = 3)))))         // apple x2
    assert(s(2L) == ((1L, round6(bm25(tf = 1, df = 2, dl = 2)))))         // cherry
    assert(s(3L) == ((2L, round6(bm25(tf = 1, df = 2, dl = 4)            // apple
      + bm25(tf = 2, df = 2, dl = 4)))))                                  // cherry x2
  }

  test("query terms are lowercased and de-duplicated; idf stays non-negative at df = N") {
    val dup = Bm25.score(docs, "text", "doc_id", Seq("Apple", "APPLE", "apple"))
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    val once = Bm25.score(docs, "text", "doc_id", Seq("apple"))
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    assert(dup == once)
    // a term present in EVERY doc: Lucene idf = ln(1/(N+0.5) + 1) > 0
    val everywhere = Seq((1L, "x"), (2L, "x")).toDF("doc_id", "text")
    val all = Bm25.score(everywhere, "text", "doc_id", Seq("x"))
      .select("doc_id", "bm25").as[(Long, Double)].collect()
    assert(all.length == 2 && all.forall(_._2 > 0.0))
  }

  test("topK returns the best k by score with id tiebreak, via a global top-k plan") {
    val top = Bm25.topK(docs, "text", "doc_id", Seq("apple", "cherry"), k = 2)
    val rows = top.select("doc_id").as[Long].collect()
    // doc 3 matches both terms -> highest; doc 1 (apple x2, short doc) next
    assert(rows.toSeq == Seq(3L, 1L))
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k must not full-sort:\n${plan.take(800)}")
  }

  test("both tf consumers share one materialization owned by the result; no session cache") {
    // r7 advice fix: the tf table is an eager localCheckpoint, not a
    // persist() — the ContextCleaner frees its blocks when the result frame
    // is GC'd, so repeated queries can't accumulate session-lifetime caches.
    val q = Bm25.score(docs, "text", "doc_id", Seq("apple", "cherry"))
    val rddIds = q.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id
    }
    assert(rddIds.size == 2 && rddIds.distinct.size == 1,
      s"both sides must read ONE checkpointed tf RDD, saw $rddIds")
    val cacheReads = q.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }.size
    assert(cacheReads == 0, s"no session-lifetime cache expected, saw $cacheReads")
    q.collect()
    // the explode output is filtered to query terms before the tf shuffle
    // (pinned on the pre-checkpoint frame — the checkpoint hides the plan)
    val tfPlan = Bm25.tfFrame(docs, "text", "doc_id", Seq("apple", "cherry"))
      .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val filterAt = tfPlan.indexOf("IN (")
    val exchangeAt = tfPlan.indexOf("Exchange")
    assert(filterAt >= 0 && exchangeAt >= 0 && filterAt > exchangeAt,
      // textual plans print top-down: the filter BELOW the exchange means
      // it runs before it
      s"query-term filter must precede the shuffle:\n${tfPlan.take(1500)}")
  }

  test("empty and null texts are handled; null counts as length 0 in avgdl") {
    val weird = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "apple")).toDF("doc_id", "text")
    val s = Bm25.score(weird, "text", "doc_id", Seq("apple"))
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    // avgdl must average over ALL THREE docs (0, 0, 1 -> 1/3), not skip the
    // null row (0, 1 -> 1/2): a dense-length mirror (the oracle) counts it.
    assert(s.keySet == Set(3L))
    assert(s(3L) == round6(bm25(tf = 1, df = 1, dl = 1, n = 3, avgdl = 1.0 / 3)))
    intercept[IllegalArgumentException] {
      Bm25.score(docs, "text", "doc_id", Seq.empty)
    }
  }

  test("phraseMatches: adjacency only, overlaps, 1-based positions, edges") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the hash join wins"),          // match at 2
      (2L, "hash beats join always"),      // terms present, not adjacent
      (3L, "hash join and hash join too"), // two matches, first at 1
      (4L, "a b hash Join"),               // case-folds, match at 3
      (5L, "hash"),                        // shorter than the phrase
      (6L, ""), (7L, "x x x hash hash join") // overlap run: match at 5
    ).toDF("doc_id", "text")
    val got = Bm25.phraseMatches(docs, "text", "doc_id", Seq("hash", "JOIN"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_matches"), r.getAs[Long]("first_pos")))).toMap
    assert(got == Map(
      1L -> ((1L, 2L)), 3L -> ((2L, 1L)), 4L -> ((1L, 3L)), 7L -> ((1L, 5L))))
    // Single-token phrase degenerates to a token find.
    val one = Bm25.phraseMatches(docs, "text", "doc_id", Seq("join"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_matches")).toMap
    assert(one == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 7L -> 1L))
    intercept[IllegalArgumentException] {
      Bm25.phraseMatches(docs, "text", "doc_id", Seq.empty)
    }
    // Substring pre-filter must stay a NECESSARY condition only: terms
    // occurring inside larger tokens pass the prefilter but not the
    // token-adjacency match.
    val sub = Seq((8L, "hashjoin mashup rejoinder"), (9L, "the hash join"))
      .toDF("doc_id", "text")
    val subGot = Bm25.phraseMatches(sub, "text", "doc_id", Seq("hash", "join"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(subGot == Set(9L))
  }

  test("prfExpansionTerms: RM1 weights hand-checked, query terms excluded") {
    // Query "apple": matches docs 1 (tf 2, dl 3) and 3 (tf 1, dl 4).
    // Feedback set (topDocs = 2) = {1, 3}; expansion terms come only from
    // those docs, minus the query term itself.
    val out = Bm25.prfExpansionTerms(docs, "text", "doc_id", Seq("apple"),
      topDocs = 2, topTerms = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val terms = out.map(_._1).toSet
    assert(terms == Set("banana", "cherry", "durian")) // no "apple", no doc-2/4 terms
    val s1 = round6(bm25(2, 2, 3))
    val s3 = round6(bm25(1, 2, 4))
    val total = s1 + s3 // decimal-exact at 6 dp
    def c(tf: Double, dl: Double, s: Double) =
      BigDecimal(math.rint(tf / dl * (s / total) * 1e9) / 1e9)
    val w = out.map(t => t._1 -> t._3).toMap
    def r6(x: BigDecimal) = x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(w("banana") == r6(c(1, 3, s1)))            // only in doc 1
    assert(w("cherry") == r6(c(2, 4, s3)))            // tf 2 in doc 3
    assert(w("durian") == r6(c(1, 4, s3)))
    val df = out.map(t => t._1 -> t._2).toMap
    assert(df == Map("banana" -> 1L, "cherry" -> 1L, "durian" -> 1L))
    // ranking: weight desc with term tiebreak; topTerms cuts
    assert(out.sortBy(t => (-t._3, t._1)).toSeq == out.toSeq)
    assert(Bm25.prfExpansionTerms(docs, "text", "doc_id", Seq("apple"),
      topDocs = 2, topTerms = 1).count() == 1)
  }

  test("dirichletScore: hand-checked QL decomposition, unseen terms dropped") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    // corpus: d1 = "a a b", d2 = "b c". |C| = 5 tokens.
    // cf: a=2, b=2, c=1. Query (a, b, zzz): zzz unseen -> |q_eff| = 2.
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val mu = 10.0
    val r = Bm25.dirichletScore(docs, "text", "doc_id", Seq("a", "b", "zzz"),
        mu = mu)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("matched_terms"), x.getAs[Double]("ql_score")))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // d1: tf(a)=2, tf(b)=1, dl=3 ->
    //   ln(1 + 2/(mu*2/5)) + ln(1 + 1/(mu*2/5)) + 2*ln(mu/(3+mu))
    val d1 = math.log(1 + 2 / (mu * 2 / 5)) + math.log(1 + 1 / (mu * 2 / 5)) +
      2 * math.log(mu / (3 + mu))
    // d2: tf(b)=1, dl=2 -> ln(1 + 1/(mu*2/5)) + 2*ln(mu/(2+mu))
    val d2 = math.log(1 + 1 / (mu * 2 / 5)) + 2 * math.log(mu / (2 + mu))
    assert(r(1L)._1 == 2L && math.abs(r(1L)._2 - r6(d1)) < 1e-9, s"${r(1L)}")
    assert(r(2L)._1 == 1L && math.abs(r(2L)._2 - r6(d2)) < 1e-9, s"${r(2L)}")
    // the rank-equivalent decomposition preserves the TRUE QL ordering:
    // full-model scores (including unmatched-term mass) rank identically
    def trueQl(tfs: Map[String, Int], dl: Int): Double =
      Seq("a" -> 2.0, "b" -> 2.0).map { case (w, cf) =>
        math.log((tfs.getOrElse(w, 0) + mu * cf / 5.0) / (dl + mu))
      }.sum
    val trueOrder = Seq(1L -> trueQl(Map("a" -> 2, "b" -> 1), 3),
      2L -> trueQl(Map("b" -> 1), 2)).sortBy(-_._2).map(_._1)
    val gotOrder = r.toSeq.sortBy(-_._2._2).map(_._1)
    assert(gotOrder == trueOrder)
    intercept[IllegalArgumentException] {
      Bm25.dirichletScore(docs, "text", "doc_id", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Bm25.dirichletScore(docs, "text", "doc_id", Seq("a"), mu = 0.0)
    }
  }

  test("scoreMergedShards == one-shot score, row for row") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val docs = Seq((1L, "spark join fast"), (2L, "join join window"),
      (3L, "other words here"), (4L, "spark window"), (5L, ""),
      (6L, "window")).toDF("doc_id", "text")
    val q = Seq("spark", "join", "window")
    val one = graft.operators.Bm25.score(docs, "text", "doc_id", q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val merged = graft.operators.Bm25.scoreMergedShards(
      Seq(docs.filter($"doc_id" % 2 === 0), docs.filter($"doc_id" % 2 === 1)),
      "text", "doc_id", q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(merged == one && one.nonEmpty)
    intercept[IllegalArgumentException] {
      graft.operators.Bm25.scoreMergedShards(Seq.empty, "text", "doc_id", q)
    }
  }
}
