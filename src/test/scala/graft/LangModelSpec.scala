package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LangModel

/** Unigram LM scoring: hand-computed probabilities on a tiny corpus,
  * cross-corpus smoothing of unseen terms, edge inputs, and the
  * exchange-reuse plan pin shared with TfIdf.
  */
class LangModelSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // Corpus: "a a b" / "a c". cf: a=3, b=1, c=1; T=5, V=3; k=0.5 ->
  // denominator 6.5. lp(a)=ln(3.5/6.5), lp(b)=lp(c)=ln(1.5/6.5).
  private val corpus = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")

  test("self-trained scores match the hand-computed formula") {
    val got = LangModel.unigramScore(corpus, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_toks"), r.getAs[Double]("avg_logprob"),
          r.getAs[Double]("perplexity")))).toMap
    val lpA = math.log(3.5 / 6.5); val lpRare = math.log(1.5 / 6.5)
    val avg1 = (2 * lpA + lpRare) / 3.0
    val avg2 = (lpA + lpRare) / 2.0
    assert(got(1L) == ((3L, r6(avg1), r6(math.exp(-avg1)))))
    assert(got(2L) == ((2L, r6(avg2), r6(math.exp(-avg2)))))
    // The common-token doc is more probable (lower perplexity).
    assert(got(1L)._3 < got(2L)._3)
  }

  test("cross-corpus scoring smooths unseen terms to cf = 0") {
    val model = LangModel.unigramCounts(corpus, "text")
    val fresh = Seq((9L, "a zzz")).toDF("doc_id", "text")
    val got = LangModel.scoreAgainst(fresh, "text", "doc_id", model)
      .collect().map(r => (r.getAs[Long]("n_toks"), r.getAs[Double]("avg_logprob")))
    val avg = (math.log(3.5 / 6.5) + math.log(0.5 / 6.5)) / 2.0
    assert(got.toSeq == Seq((2L, r6(avg))))
  }

  test("empty, whitespace, and null texts yield no output rows") {
    val weird = Seq((1L, ""), (2L, "   "), (3L, null.asInstanceOf[String]),
      (4L, "x")).toDF("doc_id", "text")
    val ids = LangModel.unigramScore(weird, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSeq
    assert(ids == Seq(4L))
  }

  test("single-token corpus: probability 1-ish, perplexity = exp(-lp)") {
    val one = Seq((1L, "w w")).toDF("doc_id", "text")
    // cf(w)=2, T=2, V=1 -> lp = ln(2.5/2.5) = 0 -> perplexity 1.
    val row = LangModel.unigramScore(one, "text", "doc_id").collect().head
    assert(row.getAs[Double]("avg_logprob") == 0.0)
    assert(row.getAs[Double]("perplexity") == 1.0)
  }

  test("bigram scores match the hand-computed conditional formula") {
    // "a b a b" + "b c": tf2 = {(1,a,b):2, (1,b,a):1, (2,b,c):1};
    // c2(a,b)=2, c2(b,a)=1, c2(b,c)=1; c1(a)=2, c1(b)=2; V=|{b,a,c}|=3.
    val corpus2 = Seq((1L, "a b a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = LangModel.bigramScore(corpus2, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logprob")))).toMap
    val lpAB = math.log(2.5 / 3.5); val lpBA = math.log(1.5 / 3.5)
    val lpBC = math.log(1.5 / 3.5)
    assert(got(1L) == ((3L, r6((2 * lpAB + lpBA) / 3.0))))
    assert(got(2L) == ((1L, r6(lpBC))))
  }

  test("Kneser–Ney scores match the hand-computed interpolated formula") {
    // "a b a b" + "b c": cf2 = {(a,b):2, (b,a):1, (b,c):1}; c1(a)=2,
    // c1(b)=2; N1+(a,*)=1, N1+(b,*)=2; N1+(*,b)=1, N1+(*,a)=1,
    // N1+(*,c)=1; B=3. D=0.75:
    //  P(b|a) = ((2-D) + D*1*(1/3)) / 2
    //  P(a|b) = ((1-D) + D*2*(1/3)) / 2
    //  P(c|b) = ((1-D) + D*2*(1/3)) / 2
    val corpus2 = Seq((1L, "a b a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = LangModel.kneserNeyBigramScore(corpus2, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logprob")))).toMap
    val d = 0.75
    val lpAB = math.log(((2 - d) + d * 1 * (1.0 / 3)) / 2)
    val lpBA = math.log(((1 - d) + d * 2 * (1.0 / 3)) / 2)
    val lpBC = lpBA
    assert(got(1L) == ((3L, r6((2 * lpAB + lpBA) / 3.0))))
    assert(got(2L) == ((1L, r6(lpBC))))
    // Per-context probabilities sum to <= 1 with the leftover mass going
    // to unseen continuations: P(b|a) < 1 despite a->b being the only
    // observed transition (the smoothing actually discounts).
    assert(math.exp(lpAB) < 1.0 && math.exp(lpAB) > 0.6)
  }

  test("collocations: PMI ranks the exclusive pair above the promiscuous one") {
    // "a b" x5 (a only ever precedes b) and "c d" x5 alongside "c e" x5
    // (c splits its right contexts): pmi(a,b) = ln(5*15/(5*5)) = ln 3,
    // pmi(c,d) = pmi(c,e) = ln(5*15/(10*5)) = ln 1.5.
    val docs = (
      (1 to 5).map(i => (i.toLong, "a b")) ++
      (6 to 10).map(i => (i.toLong, "c d")) ++
      (11 to 15).map(i => (i.toLong, "c e"))
    ).toDF("doc_id", "text")
    val got = LangModel.collocations(docs, "text", k = 10, minCount = 5L)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("pair_count"), r.getAs[Double]("pmi")))
    assert(got.length == 3)
    assert(got(0) == (("a", "b", 5L, r6(math.log(3.0)))))
    // tie between (c,d) and (c,e) breaks on w2
    assert(got(1) == (("c", "d", 5L, r6(math.log(1.5)))))
    assert(got(2) == (("c", "e", 5L, r6(math.log(1.5)))))
    // below minCount: nothing qualifies
    assert(LangModel.collocations(docs, "text", k = 10, minCount = 6L).count() == 0)
  }

  test("documents with fewer than two tokens are absent from bigram output") {
    val weird = Seq((1L, "solo"), (2L, ""), (3L, null.asInstanceOf[String]),
      (4L, "two tokens")).toDF("doc_id", "text")
    val ids = LangModel.bigramScore(weird, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSeq
    assert(ids == Seq(4L))
  }

  test("bigram repetition scores higher than shuffled text") {
    // Repetitive doc reuses one bigram; the scrambled doc has only unseen
    // transitions relative to its own statistics spread thin.
    val corpus3 = Seq((1L, "x y x y x y x y"), (2L, "p q r s t u v w"))
      .toDF("doc_id", "text")
    val ppl = LangModel.bigramScore(corpus3, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("perplexity")).toMap
    assert(ppl(1L) < ppl(2L))
  }

  test("plan: corpus is scanned once (ReusedExchange on the tf subtree)") {
    // Exchange reuse is finalized during execution (AQE stage cache) — run
    // the query, then inspect only the executed section of the plan.
    val q = LangModel.unigramScore(corpus, "text", "doc_id")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"cf side must reuse the tf exchange:\n${plan.take(1200)}")
    assert("Generate explode".r.findAllIn(plan).size == 1,
      s"corpus exploded more than once:\n${plan.take(1200)}")
  }

  test("perplexityBands: per-language terciles, deterministic ties, labels") {
    // Language x: ppl 1..6 -> bands (1,1),(2,2),(3,3) by pairs.
    // Language y: 2 docs, ntile(3) gives bands 1 and 2 (no tail).
    val scored = Seq(
      (1L, "x", 1.0), (2L, "x", 2.0), (3L, "x", 3.0),
      (4L, "x", 4.0), (5L, "x", 5.0), (6L, "x", 6.0),
      (7L, "y", 9.0), (8L, "y", 1.0)
    ).toDF("doc_id", "lang", "perplexity")
    val got = LangModel.perplexityBands(scored, "doc_id", "lang")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("band"), r.getAs[String]("band_label"),
          r.getAs[Boolean]("keep_middle")))).toMap
    assert(got(1L) == ((1, "head", false)) && got(2L) == ((1, "head", false)))
    assert(got(3L) == ((2, "middle", true)) && got(4L) == ((2, "middle", true)))
    assert(got(5L) == ((3, "tail", false)) && got(6L) == ((3, "tail", false)))
    assert(got(8L) == ((1, "head", false)) && got(7L) == ((2, "middle", true)))
    // Equal perplexity: the id tie-break fixes band assignment.
    val ties = Seq((10L, "z", 5.0), (11L, "z", 5.0), (12L, "z", 5.0))
      .toDF("doc_id", "lang", "perplexity")
    val t = LangModel.perplexityBands(ties, "doc_id", "lang")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("band")).toMap
    assert(t == Map(10L -> 1, 11L -> 2, 12L -> 3))
  }

  test("windowedCooccurrence: hand-counted window-2 pairs and PMI") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    // "a b a c": pairs (a,b)x2, (a,a), (b,c), (a,c); N=4 tokens, T=5
    val df = Seq((1L, "a b a c")).toDF("doc_id", "text")
    val got = graft.operators.LangModel
      .windowedCooccurrence(df, "text", "doc_id", window = 2, minCount = 1)
      .collect().map(r => (r.getString(1), r.getString(0)) match {
        case (w2, w1) => (w1, w2) -> ((r.getLong(2), r.getDouble(3)))
      }).toMap
    def pmi(nab: Long, na: Long, nb: Long) =
      BigDecimal(math.log(nab.toDouble * 4 * 4 / (5.0 * na * nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Map(
      ("a", "b") -> ((2L, pmi(2, 2, 1))),
      ("a", "a") -> ((1L, pmi(1, 2, 2))),
      ("b", "c") -> ((1L, pmi(1, 1, 1))),
      ("a", "c") -> ((1L, pmi(1, 2, 1)))))
  }

  test("negativeSamplingDist: 3/4-power flattening vs raw frequency") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val df = Seq(Tuple1("a a a a b")).toDF("text")
    val got = graft.operators.LangModel.negativeSamplingDist(df, "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pwA = r6(math.pow(4, 0.75)); val z = pwA + 1.0
    assert(got("a") == ((4L, 0.8, r6(pwA / z))))
    assert(got("b") == ((1L, 0.2, r6(1.0 / z))))
    // the whole point: flattened tail prob exceeds its raw share
    assert(got("b")._3 > got("b")._2 && got("a")._3 < got("a")._2)
  }
}
