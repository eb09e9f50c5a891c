package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Dedup kernels: exact groups, shingles/Jaccard, banded MinHash recall on
  * planted near-duplicates, SimHash hamming clustering.
  */
class DedupSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today extra"), // near-dup of 1
    (3L, "completely different content about distributed analytics engines and catalyst"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (5L, "tomato sauce needs garlic olive oil basil and a lot of patience while cooking")
  ).toDF("id", "txt")

  test("exact dedup groups by content hash with min-id winner") {
    val groups = Dedup.exactGroups(corpus, "txt", "id").collect()
    assert(groups.length == 4) // 1&4 collapse
    val dupGroup = groups.find(_.getAs[Long]("n_dups") == 2).get
    assert(dupGroup.getAs[Long]("keep_id") == 1L)
    assert(Dedup.exactDedup(corpus, "txt", "id").count() == 4)
  }

  test("decontamination: docs sharing an eval n-gram are flagged, rest clean") {
    // eval set holds doc 1's opening 5-gram; docs 1, 2, 4 share it (2 is the
    // token-appended near-dup, 4 the exact dup), 3 and 5 are clean.
    val evalSet = Seq("the quick brown fox jumps").toDF("prompt")
    val out = Dedup.contaminationFlags(corpus, evalSet, "txt", "id", "prompt", n = 5)
    val rows = out.collect().map(r =>
      r.getAs[Long]("id") -> (r.getAs[Long]("matched_grams"), r.getAs[Boolean]("contaminated"))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(rows(1L) == (1L, true) && rows(2L) == (1L, true) && rows(4L) == (1L, true))
    assert(rows(3L) == (0L, false) && rows(5L) == (0L, false))
    // scale shape: the eval-gram side must broadcast (corpus never shuffles
    // at gram granularity)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast eval side, got:\n$plan")
  }

  test("contamination fraction: distinct-gram overlap share and dirty threshold") {
    // doc A: 6 tokens -> 2 distinct 5-grams, one shared with the eval set
    // -> fraction 0.5; doc B: eval text verbatim -> 1.0; doc C: clean ->
    // 0.0; doc D: too short for a 5-gram -> total 0, clean.
    val docs = Seq(
      (1L, "the quick brown fox jumps high"),
      (2L, "the quick brown fox jumps"),
      (3L, "completely unrelated tokens in this sentence"),
      (4L, "too short")
    ).toDF("id", "txt")
    val evalSet = Seq("the quick brown fox jumps").toDF("prompt")
    val out = Dedup.contaminationFraction(docs, evalSet, "txt", "id", "prompt",
        n = 5, dirtyThreshold = 0.4)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("total_grams"), r.getAs[Long]("matched_grams"),
          r.getAs[Double]("overlap_fraction"), r.getAs[Boolean]("dirty")))).toMap
    assert(out(1L) == ((2L, 1L, 0.5, true)))
    assert(out(2L) == ((1L, 1L, 1.0, true)))
    assert(out(3L) == ((2L, 0L, 0.0, false)))
    assert(out(4L) == ((0L, 0L, 0.0, false)))
    // threshold is strict: a fraction exactly AT the threshold stays clean
    val strict = Dedup.contaminationFraction(docs, evalSet, "txt", "id", "prompt",
        n = 5, dirtyThreshold = 0.5)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("dirty")).toMap
    assert(!strict(1L) && strict(2L))
  }

  test("bloom decontamination is row-identical to the exact path, even undersized") {
    val evalSet = Seq("the quick brown fox jumps").toDF("prompt")
    val exact = Dedup.contaminationFlags(corpus, evalSet, "txt", "id", "prompt", n = 5)
      .collect().map(_.toSeq).toSet
    // healthy filter AND a pathologically undersized one (fpp degrades
    // toward 1, every gram survives the prefilter): the exact verify join
    // must absorb the false positives either way.
    for (expected <- Seq(1000L, 1L)) {
      val bloom = Dedup.contaminationFlagsBloom(corpus, evalSet, "txt", "id", "prompt",
        n = 5, expectedEvalGrams = expected)
      assert(bloom.collect().map(_.toSeq).toSet === exact,
        s"bloom path diverged from exact at expectedEvalGrams=$expected")
    }
  }

  test("shingles: distinct n-grams in first-occurrence order; short text -> empty") {
    val sh = corpus.select(col("id"), Dedup.shingles(col("txt"), 3).as("sh"))
      .filter(col("id") === 1).collect()(0).getSeq[String](1)
    assert(sh.head == "the quick brown")
    assert(sh.contains("quick brown fox"))
    assert(sh.distinct.length == sh.length)
    val short = Seq((9L, "two words")).toDF("id", "txt")
      .select(Dedup.shingles(col("txt"), 3)).collect()(0).getSeq[String](0)
    assert(short.isEmpty)
  }

  test("jaccard expression and fast UDF agree") {
    val pairs = corpus.select(col("id"), Dedup.shingles(col("txt"), 3).as("sh"))
      .crossJoin(corpus.select(col("id").as("id2"), Dedup.shingles(col("txt"), 3).as("sh2")))
      .filter(col("id") < col("id2"))
    val both = pairs.select(
      Dedup.jaccard(col("sh"), col("sh2")).as("expr"),
      Dedup.jaccardFastUdf(col("sh"), col("sh2")).as("udf")).collect()
    both.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("banded minhash finds the planted near-dup pair and skips unrelated docs") {
    val pairs = Dedup.minhashLshPairs(corpus, "txt", "id", maxJaccardDistance = 0.5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L))) // near-dup found
    assert(pairs.contains((1L, 4L))) // exact dup trivially found
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated doc clean
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("lshRecallAudit: exact truth enumerated, recall 1.0 on the planted corpus") {
    val out = Dedup.lshRecallAudit(corpus, "txt", "id", maxJaccardDistance = 0.5)
      .collect()(0)
    // Truth at J >= 0.5: (1,2), (1,4), (2,4) — the near-dup triangle.
    assert(out.getAs[Long]("n_truth") == 3L)
    assert(out.getAs[Long]("n_found") == 3L)
    assert(out.getAs[Long]("n_missed") == 0L)
    assert(out.getAs[Double]("recall") == 1.0)
  }

  test("minhash seeds differing only in the high 32 bits change signatures") {
    // A bare seed.toInt at the call site would truncate the upper half and
    // make these two seeds produce byte-identical band arrays.
    import org.apache.spark.sql.functions.lit
    val sh = Dedup.shingles(lit("the quick brown fox jumps over the lazy dog"), 3)
    def bands(seed: Long): Seq[Long] = {
      val mixed = (seed ^ (seed >>> 32)).toInt
      spark.range(1)
        .select(Dedup.minhashBandsUdf(sh, lit(16), lit(2), lit(mixed)))
        .collect()(0).getSeq[Long](0)
    }
    assert(bands(42L) != bands(42L | (1L << 40)))
  }

  test("duplication density: shared trigram fraction per doc, hand-checked") {
    // doc1/doc4 identical (12 trigrams each, all shared -> 1.0); doc2 is
    // doc1 + one token (12 of its 13 trigrams shared -> 12/13); docs 3 and
    // 5 share nothing; a two-token doc has no trigrams at all.
    val withShort = corpus.union(Seq((6L, "too short")).toDF("id", "txt"))
    val d = Dedup.duplicationDensity(withShort, "txt", "id", n = 3)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("total_grams"), r.getAs[Long]("dup_grams"),
          r.getAs[Double]("dup_density")))).toMap
    assert(d.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(d(1L) == ((12L, 12L, 1.0)) && d(4L) == ((12L, 12L, 1.0)))
    assert(d(2L) == ((13L, 12L, BigDecimal(12.0 / 13)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(d(3L)._2 == 0L && d(3L)._3 == 0.0)
    assert(d(5L)._2 == 0L && d(5L)._3 == 0.0)
    assert(d(6L) == ((0L, 0L, 0.0)))
  }

  test("fused text->bands kernel is byte-identical to the composed shingles->bands form") {
    // Includes repeated shingles ("tok tok tok...") — min over the multiset
    // must equal min over the distinct set — plus shingle-less edge cases.
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog near the river bank today",
      "tok tok tok tok tok tok",
      "one two three",
      "two tokens", "", "   ")
    val mixed = (42L ^ (42L >>> 32)).toInt
    texts.foreach { t =>
      val row = spark.range(1).select(
        Dedup.minhashBandsFromTextUdf(lit(t), lit(3), lit(16), lit(2), lit(mixed)).as("fused"),
        Dedup.minhashBandsUdf(Dedup.shingles(lit(t), 3), lit(16), lit(2), lit(mixed)).as("composed"),
        size(Dedup.shingles(lit(t), 3)).as("n")).collect()(0)
      if (row.getAs[Int]("n") > 0)
        assert(row.getSeq[Long](0) == row.getSeq[Long](1), s"text: '$t'")
      else
        assert(row.isNullAt(0), s"shingle-less text must yield null bands: '$t'")
    }
  }

  test("cross-corpus minhash joins only ACROSS the corpora and finds planted dups") {
    // "new crawl": one near-copy of ref doc 1, one exact copy of ref doc 5,
    // one fresh doc — PLUS an exact within-crawl duplicate pair (103/104)
    // that must never appear: their mutual similarity is maximal, so only
    // the cross-only candidate construction keeps them out.
    val fresh = Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the river bank today indeed"),
      (102L, "tomato sauce needs garlic olive oil basil and a lot of patience while cooking"),
      (103L, "novel text with no counterpart in the reference corpus whatsoever today"),
      (104L, "novel text with no counterpart in the reference corpus whatsoever today")
    ).toDF("id", "txt")
    val pairs = Dedup.crossCorpusPairs(fresh, corpus, "txt", "id",
      maxJaccardDistance = 0.5)
      .collect().map(r => (r.getAs[Long]("id_new"), r.getAs[Long]("id_ref"))).toSet
    assert(pairs.contains((101L, 1L)) && pairs.contains((101L, 4L))) // near-copies
    assert(pairs.contains((102L, 5L))) // exact copy
    assert(!pairs.exists(p => p._1 == 103L || p._1 == 104L)) // fresh docs clean
    // the 103~104 within-crawl dup never pairs in ANY orientation
    assert(!pairs.exists(p => p._2 == 103L || p._2 == 104L))
    // provenance: every left id is from the new corpus, every right from ref
    assert(pairs.forall { case (n, r) => n >= 101L && r <= 5L })
  }

  test("minhash distance is the exact verified Jaccard distance") {
    val r = Dedup.minhashLshPairs(corpus, "txt", "id", maxJaccardDistance = 0.5)
      .filter(col("id_a") === 1 && col("id_b") === 4).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Double]("jaccard_dist") == 0.0) // identical shingle sets
  }

  test("simhash: identical text -> identical hash; near text -> small hamming") {
    val h = Dedup.simhash(corpus, "txt").select("id", "simhash")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(4L))
    val near = java.lang.Long.bitCount(h(1L) ^ h(2L))
    val far = java.lang.Long.bitCount(h(1L) ^ h(5L))
    assert(near < far)
    val pairs = Dedup.simhashPairs(corpus, "txt", "id", maxHamming = 12)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("cosine pair kernel matches a naive computation per block") {
    val vecs = Seq(
      (0, 1L, Seq(1f, 0f, 0f)), (0, 2L, Seq(1f, 0.1f, 0f)), (0, 3L, Seq(0f, 0f, 1f)),
      (1, 4L, Seq(0f, 1f, 0f)), (1, 5L, Seq(0f, 1f, 0.2f))
    ).toDF("label", "vec_id", "embedding")
    val out = Dedup.cosinePairs(vecs, "embedding", "vec_id", "label", minCosine = 0.5)
      .collect().map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Double]("cosine"))).toMap
    assert(out.keySet == Set((1L, 2L), (4L, 5L))) // cross-block + low-cos pairs excluded
    assert(math.abs(out((1L, 2L)) - 1.0 / math.sqrt(1.01)) < 1e-9)
    assert(math.abs(out((4L, 5L)) - 1.0 / math.sqrt(1.04)) < 1e-9)
  }

  test("simhash pairs drop null ids (old self-join semantics preserved)") {
    val withNull = corpus.withColumn("id",
      when(col("id") === 5, lit(null).cast("long")).otherwise(col("id")))
    val pairs = Dedup.simhashPairs(withNull, "txt", "id", maxHamming = 64).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(r => !r.isNullAt(0) && !r.isNullAt(1)),
      "NULL ids must never appear in emitted pairs")
  }

  test("mega-bucket guard fails loudly instead of grinding O(n^2) in one task") {
    // 50 identical docs: one exact-dup cluster -> every row lands in the
    // same four simhash buckets. maxBucketSize below the cluster size must
    // raise the named error (the realistic 100 TB failure mode).
    val mega = spark.range(50)
      .select(col("id"), lit("same text repeated for every single row here").as("txt"))
    val e = intercept[Exception] {
      Dedup.simhashPairs(mega, "txt", "id", maxHamming = 3, maxBucketSize = 10).count()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => Option(t.getMessage).exists(_.contains("maxBucketSize"))),
      s"expected BucketTooLargeException in: ${chain(e).map(_.getClass.getSimpleName)}")
    // generous bound -> same pairs as unguarded
    val n = Dedup.simhashPairs(mega, "txt", "id", maxHamming = 3, maxBucketSize = 1000).count()
    assert(n == 50L * 49 / 2)
    // cosine kernel: same guard
    import spark.implicits._
    val vecs = (1L to 30L).map(i => (0, i, Seq(1f, 0f))).toDF("label", "vec_id", "embedding")
    val e2 = intercept[Exception] {
      Dedup.cosinePairs(vecs, "embedding", "vec_id", "label",
        minCosine = -2.0, maxBucketSize = 5).count()
    }
    assert(chain(e2).exists(t => Option(t.getMessage).exists(_.contains("maxBucketSize"))))
  }

  test("mega-bucket guard is ON by default (planted 10k+ exact-dup cluster)") {
    // r6 verdict: maxBucketSize defaulted to Int.MaxValue, so only callers
    // who knew about the guard were protected. The default is now
    // Dedup.DefaultMaxBucketSize (10k): a bucket past it fails loudly with
    // the named error and the exact-dedup-first remedy, with NO argument.
    assert(Dedup.DefaultMaxBucketSize == 10000)
    val mega = spark.range(Dedup.DefaultMaxBucketSize + 1)
      .select(col("id"), lit("identical text in every row of the cluster").as("txt"))
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    val e = intercept[Exception] {
      Dedup.simhashPairs(mega, "txt", "id", maxHamming = 3).count()
    }
    assert(chain(e).exists(t => Option(t.getMessage).exists(_.contains("maxBucketSize"))),
      s"default guard must trip: ${chain(e).map(_.getClass.getSimpleName)}")
    import spark.implicits._
    val vecs = (0L until (Dedup.DefaultMaxBucketSize + 1).toLong)
      .map(i => (0, i, Seq(1f, 0f))).toDF("label", "vec_id", "embedding")
    val e2 = intercept[Exception] {
      Dedup.cosinePairs(vecs, "embedding", "vec_id", "label", minCosine = -2.0).count()
    }
    assert(chain(e2).exists(t => Option(t.getMessage).exists(_.contains("maxBucketSize"))))
  }

  test("cosine pair kernel skips null and zero-norm vectors") {
    val vecs = Seq(
      (0, 1L, Seq(1f, 0f)), (0, 2L, Seq(0f, 0f)), (0, 3L, null.asInstanceOf[Seq[Float]]),
      (0, 4L, Seq(1f, 0f))
    ).toDF("label", "vec_id", "embedding")
    val out = Dedup.cosinePairs(vecs, "embedding", "vec_id", "label", minCosine = -2.0)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(out == Set((1L, 4L)))
  }
  test("winnowing: guaranteed density, shift-robust, short docs empty") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val shifted = "zzz " + base // one token inserted at the front
    val docs = Seq((1L, base), (2L, shifted), (3L, "only four short words"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Dedup.winnowFingerprints(docs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_fingerprints"),
          r.getAs[String]("fp_digest")))).toMap
    // 40 tokens, k=5 -> 36 grams; window=4 -> 33 windows; distinct <= 33
    assert(out(1L)._1 == 36L && out(1L)._2 <= 33L && out(1L)._2 >= 9L)
    // determinism
    val again = Dedup.winnowFingerprints(docs, "text", "doc_id")
      .filter($"doc_id" === 1L).collect()(0).getAs[String]("fp_digest")
    assert(again == out(1L)._3)
    // one inserted token perturbs only nearby windows: the fingerprint
    // SETS must still overlap heavily (winnowing's locality guarantee)
    val fpsOf = (t: String) => {
      val toks = t.split(" ")
      val grams = toks.sliding(5).map(_.mkString(" ")).map { g =>
        java.security.MessageDigest.getInstance("MD5").digest(g.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      }.toVector
      grams.sliding(4).map(_.min).toSet
    }
    val inter = fpsOf(base).intersect(fpsOf(shifted)).size
    assert(inter >= fpsOf(base).size - 3, s"shift destroyed locality: $inter")
    // and the operator agrees with the reference implementation above
    assert(out(1L)._2 == fpsOf(base).size.toLong)
    // short and null docs: zero fingerprints, md5("") digest
    assert(out(3L)._2 == 0L && out(3L)._3 == "d41d8cd98f00b204e9800998ecf8427e")
    assert(!out.contains(4L) || out(4L)._2 == 0L)
  }
  test("prebanded cross-corpus dedup: bucketed signature table, identical pairs, no ref re-banding") {
    import spark.implicits._
    val ref = (1L to 30L).map(i => (i, s"the shared reference document number $i talks about topic ${i % 5}"))
      .toDF("doc_id", "text")
    val crawl = Seq(
      (101L, "the shared reference document number 7 talks about topic 2"), // dup of 7
      (102L, "completely novel crawl content with no overlap whatsoever here")
    ).toDF("doc_id", "text")
    val direct = Dedup.crossCorpusPairs(crawl, ref, "text", "doc_id")
      .select("id_new", "id_ref").as[(Long, Long)].collect().toSet
    // persist the signatures through a REAL bucketed catalog table
    spark.sql("DROP TABLE IF EXISTS ref_sigs")
    Dedup.signatures(ref, "text", "doc_id")
      .write.bucketBy(4, "band", "minh").saveAsTable("ref_sigs")
    val pre = Dedup.crossCorpusPairsPrebanded(crawl, ref, "text", "doc_id",
      spark.table("ref_sigs"))
    assert(pre.select("id_new", "id_ref").as[(Long, Long)].collect().toSet == direct)
    assert(direct.contains((101L, 7L)))
    // the reference side must NOT re-band. The un-persisted candidate
    // subtree is referenced three times, so banding Generates appear once
    // PER COPY per banded side: the prebanded plan must carry half the
    // direct plan's (crawl only vs crawl+ref).
    val preGens = "Generate posexplode".r.findAllIn(
      pre.queryExecution.executedPlan.toString).size
    val directGens = "Generate posexplode".r.findAllIn(
      Dedup.crossCorpusPairs(crawl, ref, "text", "doc_id")
        .queryExecution.executedPlan.toString).size
    assert(preGens * 2 == directGens && preGens > 0,
      s"expected ref banding to disappear: prebanded=$preGens direct=$directGens")
    spark.sql("DROP TABLE IF EXISTS ref_sigs")
  }

  test("url dedup: raw variants collapse on the canonical form, min-id winner") {
    val raws = Seq(
      (1L, "HTTP://Example.com:80/a?utm_source=x#top"),
      (2L, "http://example.com/a"),
      (3L, "https://example.com/a"), // different scheme -> different page
      (4L, "http://example.com/a/?gclid=1&q=2"),
      (5L, "http://example.com/a?q=2")
    ).toDF("doc_id", "url")
    val groups = Dedup.urlDedupGroups(raws, "url", "doc_id")
      .as[(String, Long, Long)].collect()
      .map { case (u, k, n) => u -> ((k, n)) }.toMap
    assert(groups == Map(
      "http://example.com/a" -> ((1L, 2L)),
      "https://example.com/a" -> ((3L, 1L)),
      "http://example.com/a?q=2" -> ((4L, 2L))))
    val kept = Dedup.urlDedup(raws, "url", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("corpusOverlap: hand-checked sets; KMV sketch agrees with exact on small corpora") {
    // corpus A grams: {a b c, b c d} u {x y z}; corpus B: {b c d, c d e}
    val a = Seq((1L, "a b c d"), (2L, "x y z")).toDF("doc_id", "text")
    val b = Seq((3L, "b c d e")).toDF("doc_id", "text")
    val r = Dedup.corpusOverlap(a, b, "text").collect()(0)
    // A = {a b c, b c d, x y z}, B = {b c d, c d e}: inter 1, union 4
    assert(r.getLong(0) == 3 && r.getLong(1) == 2 && r.getLong(2) == 1)
    assert(r.getDouble(3) == 0.25)
    assert(math.abs(r.getDouble(4) - 0.333333) < 1e-9) // containment 1/3
    // sketch with k >= |union|: the estimator is EXACT (bottom-k = the set)
    val sk = Dedup.corpusOverlapSketch(a, b, "text", k = 64).collect()(0)
    assert(sk.getLong(1) == 4) // union size caps the sketch
    assert(sk.getDouble(2) == 0.25)
    // disjoint corpora -> 0 everywhere
    val z = Dedup.corpusOverlap(a, Seq((9L, "p q r s")).toDF("doc_id", "text"), "text")
      .collect()(0)
    assert(z.getLong(2) == 0 && z.getDouble(3) == 0.0)
    // an empty corpus -> zero sizes and the guarded 0.0, no NaN/divide blowup
    val e = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val ze = Dedup.corpusOverlap(e, b, "text").collect()(0)
    assert(ze.getLong(0) == 0 && ze.getDouble(3) == 0.0 && ze.getDouble(4) == 0.0)
    val zs = Dedup.corpusOverlapSketch(e, e, "text").collect()(0)
    assert(zs.getLong(1) == 0 && zs.getDouble(2) == 0.0)
  }

  test("lshPlan: closed-form S-curve rows, sane endpoints, 0.8-target pick") {
    val plan = Dedup.lshPlan(spark, numPerms = 128, targetJaccard = 0.8)
      .collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(plan.keySet == Set(1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L))
    // b=1 (one band of 128 rows): only exact dups collide -> s50 = 1.0,
    // p(0.9) = 0.9^128, tiny
    assert(plan(1L).getDouble(2) == 1.0)
    assert(plan(1L).getDouble(6) < 0.001)
    // b=128 (128 bands of 1 row): everything collides -> s50 = 1/128
    assert(math.abs(plan(128L).getDouble(2) - 0.007813) < 1e-9)
    assert(plan(128L).getDouble(3) > 0.999999)
    // hand-checked interior point: b=16, r=8
    val p16 = plan(16L)
    assert(math.abs(p16.getDouble(2) -
      BigDecimal(math.pow(1.0 / 16, 1.0 / 8)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // the 0.8-target recommendation is b=8/r=16 (s50 ~ 0.878, diff 0.078 —
    // closer than b=16/r=8's 0.707/0.093) and is unique
    assert(plan(8L).getBoolean(7))
    assert(plan.values.count(_.getBoolean(7)) == 1)
  }

  test("minhashLshIncrementalPairs: cross + within-batch, no ref-internal pairs") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    // ref: 1 and 2 are near-dups of each other; batch: 11 ~ 1 (cross),
    // 12 ~ 13 (within batch), 14 unrelated.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val ref = Seq((1L, base), (2L, base + " mu"),
      (3L, "completely different words here nothing shared at all")
    ).toDF("doc_id", "text")
    val batch = Seq((11L, base + " nu"), (12L, base.replace("alpha", "omega")),
      (13L, base.replace("alpha", "omega") + " xi"),
      (14L, "unrelated batch content with its own vocabulary entirely")
    ).toDF("doc_id", "text")
    val sigs = graft.operators.Dedup.signatures(ref, "text", "doc_id")
    val got = graft.operators.Dedup
      .minhashLshIncrementalPairs(batch, ref, "text", "doc_id", sigs,
        maxJaccardDistance = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // every pair touches a batch id; ref-internal (1,2) is absent
    assert(got.forall { case (a, b) => a >= 11L || b >= 11L })
    assert(!got.contains((1L, 2L)))
    assert(got.contains((1L, 11L)) || got.contains((2L, 11L)),
      s"cross pair missing: $got")
    assert(got.contains((12L, 13L)), s"within-batch pair missing: $got")
    assert(!got.exists { case (a, b) => a == 14L || b == 14L })
  }

  test("cdcContainment: finds the edited copy, respects fences and thresholds") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val rng = new scala.util.Random(23)
    def txt(n: Int) = (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val original = txt(800)
    // near-copy: one insertion mid-document — fixed frames would all shift
    val edited = original.substring(0, 400) + "EDIT" + original.substring(400)
    val unrelatedA = txt(800)
    val unrelatedB = txt(800)
    val df = Seq((1L, original), (2L, edited), (3L, unrelatedA),
      (4L, unrelatedB)).toDF("doc_id", "text")
    val pairs = graft.operators.Dedup
      .cdcContainment(df, "text", "doc_id", minShared = 2,
        minContainment = 0.5)
      .collect().map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Double]("containment"))).toMap
    assert(pairs.keySet == Set((1L, 2L)), s"got ${pairs.keySet}")
    assert(pairs((1L, 2L)) >= 0.5)
    // boilerplate fence: a chunk shared by ALL docs is not identity —
    // with maxDocsPerChunk below the doc count, it cannot create pairs
    val boiler = "FOOTER " * 40 // long shared run -> shared chunks
    val many = (1L to 6L).map(i => (i, boiler + txt(300))).toDF("doc_id", "text")
    val fenced = graft.operators.Dedup.cdcContainment(many, "text", "doc_id",
      maxDocsPerChunk = 5, minShared = 1, minContainment = 0.1)
    // every doc shares ONLY the boilerplate chunks -> all fenced out
    assert(fenced.count() == 0)
  }

  test("prefixFilterJoin: hand pair, threshold predicate, zero-token drop") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val df = Seq((1L, "x y z"), (2L, "x y z w"), (3L, "p q r"), (4L, ""))
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .prefixFilterJoin(df, "text", "doc_id", tNum = 2, tDen = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // J(1,2)=3/4 >= 2/3; J with doc 3 is 0; empty doc 4 never appears.
    assert(got.toSeq == Seq((1L, 2L, 3L, 4L, 0.75)))
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.prefixFilterJoin(df, "text", "doc_id", 4, 3)
    }
  }

  test("prefixFilterJoin == brute force: the zero-false-negative law") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    // 40 docs over an 8-word vocab -> dense Jaccard overlaps, every
    // threshold band exercised. Compare against an in-test brute force.
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docs = (0 until 40).map { i =>
      val words = vocab.indices.filter(j => (i >> (j % 6) & 1) == 1 || (i + j) % 3 == 0)
        .map(vocab)
      (i.toLong, words.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .prefixFilterJoin(df, "text", "doc_id", tNum = 3, tDen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sets = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSet }.filter(_._2.nonEmpty)
    val brute = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size; union = sa.size + sb.size - inter
      if inter * 5 >= union * 3
    } yield (ia, ib)).toSet
    assert(got == brute)
    assert(brute.nonEmpty) // the law is vacuous on an empty pair set
  }
}
