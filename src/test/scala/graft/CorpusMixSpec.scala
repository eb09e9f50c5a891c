package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusMix

class CorpusMixSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // (id, group, tokens, quality)
  private def corpus = Seq(
    (1L, "en", 100L, 0.9), (2L, "en", 100L, 0.8), (3L, "en", 100L, 0.7),
    (4L, "en", 100L, 0.6), (5L, "de", 50L, 0.5), (6L, "de", 300L, 0.95),
    (7L, "de", 100L, 0.2)
  ).toDF("doc_id", "lang", "bpe_tokens", "quality")

  test("packToBudget keeps a quality-ordered prefix within the budget") {
    val kept = CorpusMix.packToBudget(corpus, "lang", "bpe_tokens", 250,
      Seq(col("quality").desc, col("doc_id")))
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toMap
    // en: 0.9(100) + 0.8(200) fit; 0.7 would reach 300 > 250
    // de: 0.95(300) alone already exceeds 250 -> nothing fits... cum=300>250
    assert(kept == Map(1L -> 100L, 2L -> 200L))
  }

  test("packToBudget emits every row when the budget covers the group") {
    val kept = CorpusMix.packToBudget(corpus, "lang", "bpe_tokens", 100000,
      Seq(col("quality").desc, col("doc_id")))
    assert(kept.count() == 7)
    // running totals are per-group and ordered best-first
    val de = kept.filter($"lang" === "de").orderBy($"cum_tokens")
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toSeq
    assert(de == Seq((6L, 300L), (5L, 350L), (7L, 450L)))
  }

  test("packToBudgetHistogram never exceeds the budget and keeps whole buckets top-down") {
    val kept = CorpusMix.packToBudgetHistogram(corpus, "lang", "bpe_tokens",
      "quality", budgetPerGroup = 250, buckets = 100)
    val byLang = kept.groupBy("lang").agg(sum("bpe_tokens").as("tok"))
      .as[(String, Long)].collect().toMap
    // en buckets: 90(100), 80(100), 70(100), 60(100): top two fit exactly
    assert(byLang.get("en").contains(200L))
    // de best bucket (95 -> 300 tokens) exceeds the budget alone: nothing kept
    assert(!byLang.contains("de"))
    // kept set is a quality prefix: every kept row outranks every dropped one
    val keptEn = kept.filter($"lang" === "en").select("doc_id").as[Long].collect().toSet
    assert(keptEn == Set(1L, 2L))
  }

  test("packToBudgetHistogram matches exact packing when bucket = row granularity") {
    // distinct qualities land in distinct buckets, so histogram packing
    // degenerates to exact packing on this data
    val exact = CorpusMix.packToBudget(corpus, "lang", "bpe_tokens", 450,
      Seq(col("quality").desc, col("doc_id"))).select("doc_id").as[Long].collect().toSet
    val hist = CorpusMix.packToBudgetHistogram(corpus, "lang", "bpe_tokens",
      "quality", 450, buckets = 100).select("doc_id").as[Long].collect().toSet
    assert(exact == hist)
  }

  test("capPerGroup keeps the n best rows per group with deterministic ranks") {
    val capped = CorpusMix.capPerGroup(corpus, "lang", 2,
      Seq(col("quality").desc, col("doc_id")))
      .select("doc_id", "rank").as[(Long, Long)].collect().toMap
    assert(capped == Map(1L -> 1L, 2L -> 2L, 6L -> 1L, 5L -> 2L))
  }

  test("plan shapes: exact pack is one shuffle; histogram pack never sorts the corpus") {
    val dir = "/root/testdata/sf0.001"
    val pack = SparkEntry.queries("token_budget_pack")(spark, dir)
      .queryExecution.executedPlan.toString
    // one hash exchange for the per-group window, nothing else
    assert("Exchange hashpartitioning".r.findAllIn(pack).size == 1, pack.take(600))

    val docs = spark.read.parquet(s"$dir/documents.parquet").select(
      col("doc_id"), col("lang"),
      graft.operators.TextAnalysis.bpeTokens(col("text")).as("bpe_tokens"),
      graft.operators.TextAnalysis.qualityScore(col("text")).as("quality"))
    val hist = CorpusMix.packToBudgetHistogram(docs, "lang", "bpe_tokens",
      "quality", 5000).queryExecution.executedPlan.toString
    // the corpus side reaches the filter through a broadcast join — the only
    // shuffle is the tiny histogram aggregation; no corpus-wide sort exists
    assert(hist.contains("BroadcastHashJoin"), hist.take(800))
    assert(!hist.contains("Exchange rangepartitioning"), "corpus got globally sorted")
    assert("Exchange hashpartitioning".r.findAllIn(hist).size <= 2, hist.take(800))
  }

  test("histogram and exact packing agree on the sf0.001 documents corpus") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet").select(
      col("doc_id"), col("lang"),
      graft.operators.TextAnalysis.bpeTokens(col("text")).as("bpe_tokens"),
      graft.operators.TextAnalysis.qualityScore(col("text")).as("quality"))
    val budget = 3000L
    val exactTokens = CorpusMix.packToBudget(docs, "lang", "bpe_tokens", budget,
      Seq(col("quality").desc, col("doc_id")))
      .groupBy("lang").agg(sum("bpe_tokens").as("t")).as[(String, Long)].collect().toMap
    val histTokens = CorpusMix.packToBudgetHistogram(docs, "lang", "bpe_tokens",
      "quality", budget)
      .groupBy("lang").agg(sum("bpe_tokens").as("t")).as[(String, Long)].collect().toMap
    // both respect the budget; histogram never keeps more than exact
    histTokens.foreach { case (l, t) =>
      assert(t <= budget, s"$l histogram pack exceeded budget: $t")
      assert(t <= exactTokens.getOrElse(l, 0L) ||
        exactTokens.getOrElse(l, 0L) <= budget, s"$l inconsistent")
    }
    exactTokens.foreach { case (l, t) => assert(t <= budget, s"$l exact pack exceeded: $t") }
  }

  test("temperatureSample: quotas follow n^alpha, capped at group size, rounding pinned") {
    import org.apache.spark.sql.functions.col
    // sizes 4 and 1, alpha 0.5, budget 3: z = 2 + 1 = 3 ->
    // targets floor(round(2/3*3)) = 2 and floor(round(1/3*3)) = 1. The
    // 1/3*3 = 0.999... case is exactly what the round-before-floor fixes.
    val docs = (1L to 4L).map(i => (i, "big")) :+ ((5L, "small"))
    val got = CorpusMix.temperatureSample(docs.toDF("id", "g"), "g",
        alpha = 0.5, budget = 3, orderBy = Seq(col("id")))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("target"))
    assert(got.toMap.values.toSet == Set(2L, 1L))
    assert(got.length == 3)
    assert(got.count(_._2 == 2L) == 2) // two rows drawn from the big group
    // alpha = 1 reduces to proportional: targets floor(4/5*5)=4, floor(1/5*5)=1
    val prop = CorpusMix.temperatureSample(docs.toDF("id", "g"), "g",
        alpha = 1.0, budget = 5, orderBy = Seq(col("id")))
    assert(prop.count() == 5)
    // cap: a huge budget never over-draws a group
    val capped = CorpusMix.temperatureSample(docs.toDF("id", "g"), "g",
        alpha = 0.5, budget = 1000000, orderBy = Seq(col("id")))
    assert(capped.count() == 5)
  }

  test("null group is a real group: histogram pack and temperature mix keep it (r9)") {
    // The sizes/histogram aggregates count the null group, so a plain
    // equi-join back would silently drop its rows — null-safe joins keep
    // the quota reaching them.
    val docs = Seq((1L, Some("en"), 100L, 0.9), (2L, None, 100L, 0.8),
      (3L, None, 100L, 0.7))
      .toDF("doc_id", "lang", "bpe_tokens", "quality")
    val hist = CorpusMix.packToBudgetHistogram(docs, "lang", "bpe_tokens",
      "quality", budgetPerGroup = 100, buckets = 100)
      .select("doc_id").as[Long].collect().toSet
    // en keeps its one row; the NULL group keeps its best bucket (0.8)
    assert(hist == Set(1L, 2L), hist.toString)
    val temp = CorpusMix.temperatureSample(docs, "lang", alpha = 1.0,
        budget = 3, orderBy = Seq(col("quality").desc, col("doc_id")))
      .select("doc_id").as[Long].collect().toSet
    // proportional at full budget: every row, including the null group's
    assert(temp == Set(1L, 2L, 3L), temp.toString)
  }
}
