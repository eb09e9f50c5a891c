package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Search, Similarity}

/** ANN tiers vs the exact baseline on the driver-generated embeddings
  * fixture: the approximate methods must put the true nearest neighbor
  * first and keep reasonable top-k recall.
  */
class SimilaritySpec extends AnyFunSuite with SparkTestBase {

  private lazy val embeddings =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private lazy val queryVec = embeddings.filter(col("vec_id") === 0)
    .select("embedding").collect()(0).getSeq[Float](0).toArray

  private lazy val exactTop10: Seq[Long] =
    Search.topKCosine(embeddings.filter(col("vec_id") =!= 0), queryVec, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq

  test("exact top-k plans as TakeOrderedAndProject (no full sort)") {
    val plan = Search.topKCosine(embeddings, queryVec, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("LSH top-k contains the true nearest neighbor") {
    val lsh = Similarity.lshTopK(embeddings.filter(col("vec_id") =!= 0), queryVec, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // L2-nearest on unit-ish vectors ~ cosine-nearest: top-1 must be found
    assert(lsh.contains(exactTop10.head))
    assert(lsh.intersect(exactTop10.toSet).size >= 5) // recall@10 >= 0.5
  }

  test("IVF with full probe is exact; partial probe is exact over its probed cells") {
    val corpus = embeddings.filter(col("vec_id") =!= 0)
    val (indexed, centroids) = Similarity.ivfIndex(corpus, nCells = 4)
    val fullProbe = Similarity.ivfTopK(indexed, centroids, queryVec, 10, nProbe = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(fullProbe == exactTop10) // probing every cell == brute force
    // This fixture is isotropic 64-dim noise (max cosine to the query is
    // ~0.33; per-label mean cosine ~0), so NO quantizer can promise the
    // global top-1 falls in the 2 nearest of 4 cells — assert the guarantee
    // IVF actually makes instead: the partial probe returns the EXACT
    // brute-force top-k over the union of its probed cells. (Top-hit recall
    // under partial probe is asserted on clustered data below, where IVF's
    // contract is meaningful.)
    val qUnit = {
      val q = queryVec.map(_.toDouble)
      val n = math.sqrt(q.map(x => x * x).sum)
      q.map(_ / n)
    }
    val probed = centroids.zipWithIndex.map { case (c, i) =>
      (i, c.zip(qUnit).map { case (a, b) => val t = a - b; t * t }.sum)
    }.sortBy(_._2).take(2).map(_._1).toSeq
    val expected = Search.topKCosine(
        indexed.filter(col("cell").isin(probed.map(Int.box): _*)), queryVec, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val partial = Similarity.ivfTopK(indexed, centroids, queryVec, 10, nProbe = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(partial == expected)
  }

  test("IVF partial probe finds the true top hit on clustered data (spherical cells)") {
    // Data where IVF's contract holds: 3 directional clusters. The search
    // metric is cosine, so the quantizer is SPHERICAL (r7: normalize for
    // train/assign, renormalize centroids); magnitudes vary wildly below to
    // prove direction — not length — drives the cells. nProbe=1 must fetch
    // the query's whole neighborhood.
    import spark.implicits._
    val rows = (0 until 300).map { i =>
      val cluster = i % 3
      val mag = 0.1f + (i % 50) * 2f // magnitudes 0.1 .. ~98
      val base = Array.fill(8)(0.01f * (i % 7))
      base(cluster) = mag
      (i.toLong, cluster, base.toSeq)
    }
    val df = rows.toDF("vec_id", "cluster", "embedding")
    val (indexed, centroids) = Similarity.ivfIndex(df, nCells = 3, trainCap = 300)
    val query = Array(1f, 0.02f, 0.01f, 0f, 0f, 0f, 0f, 0f) // cluster-0 direction
    val exact = Search.topKCosine(df, query, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val one = Similarity.ivfTopK(indexed, centroids, query, 10, nProbe = 1)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(one == exact, s"nProbe=1 must be exact on separated clusters: $one vs $exact")
  }

  test("IVF training sample is partition-order independent (skewed layout)") {
    // Three well-separated clusters laid out ADVERSARIALLY: the corpus is
    // sorted so the first partitions hold only cluster A. The old
    // `.limit(trainCap)` sampler would train the quantizer on cluster A
    // alone (trainCap=60 < |A|=200); the hash sampler must see all three
    // clusters regardless of file/partition order.
    import spark.implicits._
    val rows = (0 until 600).map { i =>
      val cluster = i / 200 // 0,1,2 in ID order == partition order
      val base = Array.fill(8)(0f)
      base(cluster) = 10f + (i % 200) * 0.001f
      (i.toLong, cluster, base.toSeq)
    }
    val skewed = rows.toDF("vec_id", "cluster", "embedding")
      .repartitionByRange(6, col("vec_id")) // partition 0-1: cluster A only
      .sortWithinPartitions("vec_id")
    val (indexed, centroids) = Similarity.ivfIndex(skewed, nCells = 3, trainCap = 60)
    assert(centroids.length == 3)
    // every true cluster must dominate its own IVF cell: for each cluster,
    // its rows map to ONE cell and the three cells are distinct — impossible
    // if training only ever saw cluster A vectors.
    val cellOf = indexed.groupBy("cluster")
      .agg(expr("mode(cell)").as("cell"), countDistinct("cell").as("ncells"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    assert(cellOf.forall(_._3 == 1L), s"cluster split across cells: $cellOf")
    assert(cellOf.map(_._2).distinct.size == 3, s"cells collapsed: $cellOf")
    // determinism: same content in a DIFFERENT layout -> same centroids
    val shuffled = rows.toDF("vec_id", "cluster", "embedding")
      .repartition(7, col("cluster"))
    val (_, centroids2) = Similarity.ivfIndex(shuffled, nCells = 3, trainCap = 60)
    assert(centroids.map(_.toSeq).toSeq == centroids2.map(_.toSeq).toSeq,
      "centroids must be a pure function of (content, seed), not layout")
  }

  test("ivfAssign: new batch lands in trained cells, consistent with indexing") {
    import spark.implicits._
    val rows = (0 until 300).map { i =>
      val cluster = i % 3
      val base = Array.fill(8)(0f)
      base(cluster) = 5f + (i % 40) * 0.01f
      (i.toLong, base.toSeq)
    }
    val all = rows.toDF("vec_id", "embedding")
    val base = all.filter($"vec_id" % 10 =!= 3)
    val (_, centroids) = Similarity.ivfIndex(base, nCells = 3)
    // assignment of the TRAINING corpus via ivfAssign must equal the cells
    // ivfIndex itself attached (the shared kernel claim)
    val viaIndex = Similarity.ivfIndex(base, nCells = 3)._1
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaAssign = Similarity.ivfAssign(base, centroids)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaIndex == viaAssign)
    // a NEW batch (unseen rows) from cluster c lands in the same cell as
    // the trained rows of cluster c — no retrain needed
    val batch = all.filter($"vec_id" % 10 === 3)
    val batchCells = Similarity.ivfAssign(batch, centroids)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0) % 3, r.getInt(1))).distinct
    assert(batchCells.length == 3) // one cell per cluster
    assert(batchCells.map(_._2).distinct.length == 3)
    // zero-norm vectors pin to cell 0
    val zero = Seq((999L, Seq.fill(8)(0f))).toDF("vec_id", "embedding")
    assert(Similarity.ivfAssign(zero, centroids)
      .select("cell").collect()(0).getInt(0) == 0)
  }

  test("jlProject: shape, determinism, duplicate collapse, sane distortion") {
    import spark.implicits._
    val vs = (1L to 20L).map(i =>
      (i, Seq.tabulate(16)(j =>
        if (j == 0) i.toFloat / 4 // distinct head: (i*7)%11 has period 11
        else ((i * 7 + j * 3) % 11 - 5).toFloat)))
      .toDF("vec_id", "embedding")
    val p = Similarity.jlProject(vs, "embedding", inDim = 16, outDim = 4)
      .select("vec_id", "embedding_jl").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(p.values.forall(_.length == 4))
    // identical inputs -> identical projections (pure function of content)
    val dup = Similarity.jlProject(vs, "embedding", 16, 4)
      .select("vec_id", "embedding_jl").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(p == dup)
    // JL sanity: the average pairwise distortion ratio is near 1 (the
    // lemma's concentration), every ratio strictly positive for distinct
    // vectors
    val pairs = for (a <- 1L to 20L; b <- (a + 1) to 20L) yield (a, b)
    def d2(x: Seq[Double], y: Seq[Double]) =
      x.zip(y).map { case (u, v) => (u - v) * (u - v) }.sum
    val orig = vs.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val ratios = pairs.map { case (a, b) =>
      d2(p(a), p(b)) / d2(orig(a), orig(b)) }
    assert(ratios.forall(_ > 0))
    val mean = ratios.sum / ratios.size
    assert(mean > 0.4 && mean < 2.5, s"mean distortion $mean")
  }

  test("IVF cell filter prunes the scan (cells are a partitionable key)") {
    val corpus = embeddings.filter(col("vec_id") =!= 0)
    val (indexed, centroids) = Similarity.ivfIndex(corpus, nCells = 4)
    val cells = indexed.select("cell").distinct().count()
    assert(cells > 1 && cells <= 4)
    val probed = Similarity.ivfTopK(indexed, centroids, queryVec, 10, nProbe = 1)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("cell"), "cell predicate missing from plan")
  }

  test("IVF-PQ: codes-only index ranks the query's cluster first under nProbe=1") {
    // Same directional-cluster regime as the spherical IVF test; the IVF-PQ
    // index stores only (id, cell, codes) and ADC must still surface the
    // query's neighborhood. ADC distance on the unit sphere ~ 2 - 2*cos.
    import spark.implicits._
    val rows = (0 until 300).map { i =>
      val cluster = i % 3
      val mag = 0.1f + (i % 50) * 2f
      val base = Array.fill(8)(0.01f * (i % 7))
      base(cluster) = mag
      (i.toLong, cluster, base.toSeq)
    }
    val df = rows.toDF("vec_id", "cluster", "embedding")
    val (encoded, centroids, cb) = Similarity.ivfPqIndex(df, nCells = 3,
      m = 2, kCodes = 8, pqIterations = 3)
    assert(encoded.columns.toSeq == Seq("vec_id", "cell", "codes"))
    val query = Array(1f, 0.02f, 0.01f, 0f, 0f, 0f, 0f, 0f) // cluster-0 direction
    val got = Similarity.ivfPqTopK(encoded, centroids, cb, query, 10, nProbe = 1)
      .as[(Long, Double)].collect()
    // every hit comes from the query's directional cluster (vec_id % 3 == 0)
    assert(got.length == 10 && got.forall(_._1 % 3 == 0), s"got ${got.toSeq}")
    // ADC distances live on the unit sphere: 0 <= d2 <= 4, near for cluster 0
    assert(got.forall(r => r._2 >= 0.0 && r._2 < 1.0), s"got ${got.toSeq}")
  }

  test("IVF-PQ artifact: save/load round-trips the quantizer and codes " +
      "exactly; trainOrLoad loads without retraining; malformed fails loudly") {
    import spark.implicits._
    val rows = (0 until 300).map { i =>
      val cluster = i % 3
      val base = Array.fill(8)(0.01f * (i % 7))
      base(cluster) = 0.1f + (i % 50) * 2f
      (i.toLong, base.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val (enc, cents, cb) = Similarity.ivfPqIndex(df, nCells = 3, m = 2,
      kCodes = 8, pqIterations = 3)
    val path = tempDir("graft-ivfpq-artifact").resolve("idx").toString
    Similarity.saveIvfPqIndex(path, enc, cents, cb)
    assert(Similarity.ivfPqIndexExists(spark, path))
    val (enc2, cents2, cb2) = Similarity.loadIvfPqIndex(spark, path)
    // Quantizer halves are VALUE-IDENTICAL (doubles round-trip parquet
    // exactly) — the training-replay oracles hold over a load.
    assert(cents2.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
    assert(cb2.m == cb.m && cb2.subDim == cb.subDim && cb2.k == cb.k)
    assert(cb2.centroids.map(_.map(_.toSeq).toSeq).toSeq ==
      cb.centroids.map(_.map(_.toSeq).toSeq).toSeq)
    def codeSet(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Int](2).toList)).toSet
    assert(codeSet(enc2) == codeSet(enc))
    // trainOrLoad on an existing artifact LOADS — a corpus that could not
    // train (empty) proves no retraining happened.
    val (enc3, cents3, _) = Similarity.trainOrLoadIvfPqIndex(spark, path,
      df.filter($"vec_id" < 0), nCells = 3, m = 2, kCodes = 8)
    assert(cents3.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
    assert(codeSet(enc3) == codeSet(enc))
    // ... and on a missing path it trains + saves + returns the LOADED form.
    val path2 = tempDir("graft-ivfpq-artifact2").resolve("idx").toString
    val (enc4, cents4, cb4) = Similarity.trainOrLoadIvfPqIndex(spark, path2,
      df, nCells = 3, m = 2, kCodes = 8, pqIterations = 3)
    assert(Similarity.ivfPqIndexExists(spark, path2))
    assert(cents4.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
    assert(cb4.centroids.map(_.map(_.toSeq).toSeq).toSeq ==
      cb.centroids.map(_.map(_.toSeq).toSeq).toSeq)
    assert(codeSet(enc4) == codeSet(enc))
    // Audit parity through the stored artifact: the deployment-recipe
    // recall is IDENTICAL with a loaded index vs in-lineage training.
    val qs = df.filter($"vec_id" < 3)
    def recallRows(pre: Option[(org.apache.spark.sql.DataFrame,
        Array[Array[Double]], graft.operators.Pq.Codebooks)]) =
      Similarity.ivfPqRerankRecall(qs, df, shortlist = 6, k = 3,
          nCells = 3, m = 2, kCodes = 8, pqIterations = 3, prebuilt = pre)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(recallRows(Some((enc2, cents2, cb2))) == recallRows(None))
    // Malformed artifact (quantizer missing a subspace) fails loudly.
    val bad = tempDir("graft-ivfpq-bad").resolve("idx").toString
    enc.write.parquet(s"$bad/codes")
    Seq(("coarse", 0, 0, Seq(1.0, 0.0)), ("pq", 1, 0, Seq(1.0, 0.0)))
      .toDF("section", "i", "j", "vec")
      .write.parquet(s"$bad/quantizer")
    val err = intercept[IllegalArgumentException] {
      Similarity.loadIvfPqIndex(spark, bad)
    }
    assert(err.getMessage.contains("loadIvfPqIndex"))
  }

  test("opqRefinedRotation: orthonormal result, non-increasing distortion, " +
      "and it closes the axis-concentrated recall gap") {
    import spark.implicits._
    // Axis-concentrated spectrum corpus (what spectrumFixture makes of
    // real embeddings): component d of an isotropic-ish deterministic
    // base scaled by exp(-d/2) over 8 dims, so an m=2 split wastes the
    // second codebook — the regime OPQ exists for.
    def base(i: Int, d: Int): Double =
      math.sin(i * 0.37 + d * 1.13) + math.cos(i * 0.11 * (d + 1))
    val rows = (0 until 400).map { i =>
      (i.toLong, (0 until 8).map(d =>
        (base(i, d) * math.exp(-d / 2.0)).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding").localCheckpoint(true)
    // Init from the IDENTITY: dists.head is then PLAIN PQ's distortion and
    // the final entry is the learned rotation's — the alternation's
    // guarantee (each step weakly decreases the objective) becomes a
    // strict end-to-end assertion against the no-rotation baseline.
    val identity = Array.tabulate(8, 8)((i, j) => if (i == j) 1.0 else 0.0)
    val (rot, dists) = Similarity.opqRefinedRotation(df, m = 2, dim = 8,
      kCodes = 8, iterations = 3, pqIterations = 3, init = Some(identity))
    // rows are orthonormal
    for (a <- 0 until 8; b <- a until 8) {
      val dot = (0 until 8).map(i => rot(a)(i) * rot(b)(i)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9, s"($a,$b)=$dot")
    }
    assert(dists.length == 4)
    assert(dists.last < dists.head, s"distortions $dists")
    // PCA-init variant converges too (the default init path)
    val (_, distsPca) = Similarity.opqRefinedRotation(df, m = 2, dim = 8,
      kCodes = 8, iterations = 3, pqIterations = 3)
    assert(distsPca.last < distsPca.head, s"distortions $distsPca")
    // recall through the same machinery — MEASURED, not asserted: on a
    // tiny panel MSE and recall can diverge (the r15 sweep saw the same
    // wobble at full fixture scale; the decision ROW carries the measured
    // ordering, SCALE.md the numbers).
    def recall(c: org.apache.spark.sql.DataFrame): Double =
      Similarity.pqDecisionRow("x", 16.0, 3,
        Similarity.ivfPqRecall(c.filter($"vec_id" < 10), c, k = 3,
          nCells = 3, m = 2, kCodes = 8, nProbe = 2))
        .collect()(0).getDouble(3)
    val plain = recall(df)
    val refined = recall(df.withColumn("embedding",
      graft.functions.VectorFunctions.rotatedVector($"embedding", rot))
      .localCheckpoint(true))
    info(s"recall@3 plain=$plain opq_refined=$refined dists=$dists")
  }

  test("cross-session registry: fingerprint keys are content-addressed, " +
      "a second session resolves the same path and loads without training") {
    import spark.implicits._
    val rows = (0 until 240).map { i =>
      val base = Array.fill(8)(0.01f * (i % 5))
      base(i % 4) = 1f + (i % 9)
      (i.toLong, base.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    // Content-addressing: the fingerprint is invariant under partitioning
    // and row order (a second JVM reading the same corpus computes the
    // SAME key) and moves on any edit (a drifted corpus can never resolve
    // to the stale artifact).
    val fp = Similarity.corpusFingerprint(df)
    assert(fp == Similarity.corpusFingerprint(df.repartition(7)))
    assert(fp == Similarity.corpusFingerprint(df.orderBy($"vec_id".desc)))
    val edited = df.withColumn("embedding",
      when($"vec_id" === 5, array((0 until 8).map(_ => lit(9.9f)): _*))
        .otherwise($"embedding"))
    assert(fp != Similarity.corpusFingerprint(edited))
    assert(fp != Similarity.corpusFingerprint(df.filter($"vec_id" =!= 0)))
    // Path derivation is deterministic (what makes the key resolvable
    // from ANY session) and param-scoped (budgets never collide).
    val root = tempDir("graft-ivfpq-registry").toString
    val path = Similarity.registryPath(root, "base-sf", m = 2, kCodes = 8, fp)
    assert(path == Similarity.registryPath(root, "base-sf", 2, 8, fp))
    assert(path != Similarity.registryPath(root, "base-sf", 4, 8, fp))
    assert(path != Similarity.registryPath(root, "base-sf", 2, 8,
      Similarity.corpusFingerprint(edited)))
    // Session 1 trains + saves at the content-addressed path.
    val (enc1, cents1, _) = Similarity.trainOrLoadIvfPqIndex(spark, path, df,
      nCells = 3, m = 2, kCodes = 8, pqIterations = 3)
    assert(Similarity.ivfPqIndexExists(spark, path))
    // "Session 2": the corpus is re-read from scratch in a different
    // physical layout (all a second JVM would differ by), resolves the
    // SAME path, and LOADS — proven by handing trainOrLoad a corpus that
    // CANNOT train (empty): only the load path can produce the index.
    val fp2 = Similarity.corpusFingerprint(df.repartition(3))
    val path2 = Similarity.registryPath(root, "base-sf", 2, 8, fp2)
    assert(path2 == path)
    val (enc2, cents2, _) = Similarity.trainOrLoadIvfPqIndex(spark, path2,
      df.filter($"vec_id" < 0), nCells = 3, m = 2, kCodes = 8)
    assert(cents2.map(_.toSeq).toSeq == cents1.map(_.toSeq).toSeq)
    assert(enc2.collect().map(r => (r.getLong(0), r.getInt(1),
      r.getSeq[Int](2).toList)).toSet ==
      enc1.collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Int](2).toList)).toSet)
  }

  test("registry retention: prune keeps the newest N and every live " +
      "fingerprint, removes stale versions and crashed staging dirs") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    val root = tempDir("graft-registry-prune").toString
    // Three versions of one artifact family, mtime-ordered A < B < C,
    // plus a crashed publisher's staging leftover and a second family.
    def mkVersion(name: String, fp: String, ageMin: Long): String = {
      val p = Similarity.registryPath(root, name, m = 2, kCodes = 8, fp)
      Files.createDirectories(Paths.get(p, "quantizer"))
      Files.write(Paths.get(p, "quantizer", "_SUCCESS"), Array.empty[Byte])
      Files.setLastModifiedTime(Paths.get(p),
        FileTime.fromMillis(1700000000000L - ageMin * 60000))
      p
    }
    val oldLive  = mkVersion("base", "aaa-1", ageMin = 30) // oldest, but LIVE
    val stale    = mkVersion("base", "bbb-2", ageMin = 20)
    val newest   = mkVersion("base", "ccc-3", ageMin = 10)
    val otherFam = mkVersion("other", "ddd-4", ageMin = 40)
    val staging = s"$newest.staging-deadbeef"
    Files.createDirectories(Paths.get(staging))
    val removed = Similarity.pruneRegistry(root, keepLatestN = 1,
      liveFingerprints = Set("aaa-1"))
    // The resolvable (live-fingerprint) artifact SURVIVES despite being
    // oldest; the stale middle version is gone; newest kept by count;
    // the other family keeps its single newest; staging always removed.
    assert(Files.isDirectory(Paths.get(oldLive)), "live artifact pruned!")
    assert(!Files.exists(Paths.get(stale)))
    assert(Files.isDirectory(Paths.get(newest)))
    assert(Files.isDirectory(Paths.get(otherFam)))
    assert(!Files.exists(Paths.get(staging)))
    assert(removed.toSet == Set(staging, stale))
    // Idempotent; and a missing root is a no-op, not an error.
    assert(Similarity.pruneRegistry(root, 1, Set("aaa-1")).isEmpty)
    assert(Similarity.pruneRegistry(root + "/nope", 3).isEmpty)
  }

  test("registry staleness probe: fresh corpus reproduces the stored " +
      "histogram; a drifted corpus diverges (the retrain trigger)") {
    import spark.implicits._
    val rows = (0 until 300).map { i =>
      val base = Array.fill(8)(0.01f * (i % 7))
      base(i % 3) = 1f + (i % 40)
      (i.toLong, base.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val (enc, cents, _) = Similarity.ivfPqIndex(df, nCells = 3, m = 2,
      kCodes = 8, pqIterations = 3)
    def hist(d: org.apache.spark.sql.DataFrame): Map[Int, Long] =
      d.groupBy("cell").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val stored = hist(enc)
    // same corpus re-assigned against the stored quantizer: identical
    assert(hist(Similarity.ivfAssign(df, cents)) == stored)
    // drifted corpus (every vector pulled to cluster direction 0): the
    // fresh histogram moves off the stored one — the retrain signal
    val drifted = df.withColumn("embedding",
      array((0 until 8).map(d => lit(if (d == 0) 9f else 0.1f)): _*))
    assert(hist(Similarity.ivfAssign(drifted, cents)) != stored)
    // and under content-addressed keying the drifted corpus cannot even
    // resolve the stored artifact's path
    assert(Similarity.corpusFingerprint(drifted) !=
      Similarity.corpusFingerprint(df))
  }

  test("truncationAudit: planted prefix-aligned vs tail-aligned vectors") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    // query = all-ones over 4 dims. ids 1..3 align with the query only in
    // the FIRST 2 dims; ids 4..6 only in the LAST 2. Full-dim cosine ties
    // them, truncated-to-2 search sees only the prefix group.
    val q = Array(1f, 1f, 1f, 1f)
    val rows =
      (1L to 3L).map(i => (i, Seq(1f, 1f, 0f, 0f))) ++
      (4L to 6L).map(i => (i, Seq(0f, 0f, 1f, 1f))) ++
      Seq((7L, Seq(-1f, -1f, -1f, -1f)))
    val df = rows.toDF("vec_id", "embedding")
    val r = Similarity.truncationAudit(df, q, k = 6, dims = Seq(2, 4))
      .collect().map(x => x.getAs[Long]("dim") ->
        ((x.getAs[Long]("k_eff"), x.getAs[Long]("n_overlap"),
          x.getAs[Double]("overlap")))).toMap
    // full top-6 = ids 1..6 (cos 0.707 each) ahead of 7 (cos -1)
    assert(r(4L) == ((6L, 6L, 1.0)))
    // dim=2: prefix group at cos 1.0, then 7 at cos -1, then the tail
    // group (zero prefix -> null cosine, sorted last, id order) — top-6 is
    // {1,2,3,7,4,5}, of which all but 7 sit in the full top-6
    val (kEff2, overlap2, _) = r(2L)
    assert(kEff2 == 6L && overlap2 == 5L, s"got ${r(2L)}")
    // degenerate probe dims reject
    intercept[IllegalArgumentException] {
      Similarity.truncationAudit(df, q, 3, Seq(0))
    }
    intercept[IllegalArgumentException] {
      Similarity.truncationAudit(df, q, 3, Seq(5))
    }
  }

  test("marginBitext: planted hubness makes raw-cosine and margin disagree") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    // knn=1 neighborhoods. s1=t1=(1,0): cos 1, both neighborhoods 1 ->
    // margin 1, mutual. s3=(0.6,0.8)=t2 direction: margin 1, mutual.
    // s2=(0,1): best tgt is t2 at cos 0.8, but t2's own neighborhood is
    // s3 at cos 1.0 -> margin = 2*0.8/(0.8+1.0) = 0.888889, NOT mutual
    // (t2's best source is s3).
    val src = Seq((0L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (4L, Seq(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val tgt = Seq((1L, Seq(1f, 0f)), (3L, Seq(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.marginBitext(src, tgt, knn = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got(0L) == ((1L, 1.0, true)))
    assert(got(2L) == ((3L, 0.888889, false)))
    assert(got(4L) == ((3L, 1.0, true)))
    intercept[IllegalArgumentException] {
      Similarity.marginBitext(src, tgt, knn = 0)
    }
  }

  test("kthNeighborDistance: dense point vs isolated point") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val corpus = Seq((1L, Seq(1f, 0f)), (2L, Seq(1f, 0f)), (3L, Seq(1f, 1f)),
      (4L, Seq(-1f, 0f))).toDF("vec_id", "embedding")
    val got = Similarity.kthNeighborDistance(
      corpus.filter(org.apache.spark.sql.functions.col("vec_id").isin(1L, 4L)),
      corpus, k = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getBoolean(2)))).toMap
    // q1: d(2)=0, d(3)=1-1/sqrt(2)=0.292893 -> kth=0.292893, dense
    assert(got(1L) == ((0.292893, false)))
    // q4: d(3)=1.707107, d(1)=d(2)=2 -> kth (rank2 by (d, id)) = 2.0
    assert(got(4L) == ((2.0, true)))
    intercept[IllegalArgumentException] {
      Similarity.kthNeighborDistance(corpus, corpus, k = 0)
    }
  }

  test("binarize + hammingTopK: hand-packed sign bits, multi-word layout") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val corpus = Seq(
      (1L, Seq(1f, -1f, 1f, -1f)),   // bits {0,2} -> 5
      (2L, Seq(1f, 1f, -1f, -1f)),   // bits {0,1} -> 3
      (3L, Seq(-1f, -1f, 0f, -1f))). // zero is NOT positive -> 0
      toDF("vec_id", "embedding")
    val codes = Similarity.binarize(corpus)
    val got = codes.collect().map(r => r.getLong(0) ->
      ((r.getSeq[Long](1), r.getLong(2)))).toMap
    assert(got(1L) == ((Seq(5L), 2L)))
    assert(got(2L) == ((Seq(3L), 2L)))
    assert(got(3L) == ((Seq(0L), 0L)))
    // 34-dim vector: only dim 34 positive -> word 1, bit 1
    val wide = Seq((9L, (Seq.fill(33)(-1f) :+ 1f))).toDF("vec_id", "embedding")
    val w = Similarity.binarize(wide).collect()(0)
    assert(w.getSeq[Long](1) == Seq(0L, 2L) && w.getLong(2) == 1L)
    // hamming(1,2)=popcount(5^3)=2, hamming(1,3)=popcount(5)=2 -> tie by id
    val top = Similarity.hammingTopK(codes.filter($"id" === 1L), codes, k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(top.toSeq == Seq((2L, 2L, 1L), (3L, 2L, 2L)))
    intercept[IllegalArgumentException] {
      Similarity.hammingTopK(codes, codes, k = 0)
    }
  }

  test("hammingTopKBlocked + hammingSearch: band-found near codes match " +
      "the exact scan; guards trip on oversize") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    // 64-dim codes (two words). 1<->2 differ in ONE bit (word 0 bit 0),
    // 1<->3 in two bits spread over both words — both within the
    // radius-3 pigeonhole guarantee of 16-bit bands, so the banded
    // candidate set contains the exact top-2 and the two regimes must
    // return IDENTICAL rows. 9 is far from everything (every band
    // flipped) yet still k-ranked by the exact scan.
    val codes = Seq(
      (1L, Seq(0x00010001L, 0x00010001L)),
      (2L, Seq(0x00010000L, 0x00010001L)),
      (3L, Seq(0x00000001L, 0x00000001L)),
      (9L, Seq(0xFFFEFFFEL, 0xFFFEFFFEL))).toDF("id", "words")
    val q = codes.filter($"id" === 1L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rank").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val exact = rows(Similarity.hammingTopK(q, codes, k = 2))
    val banded = rows(Similarity.hammingTopKBlocked(q, codes, k = 2))
    assert(exact == Seq((2L, 1L, 1L), (3L, 2L, 2L)))
    assert(banded == exact)
    // the router picks the exact regime under the ceiling ...
    assert(rows(Similarity.hammingSearch(q, codes, k = 2)) == exact)
    // ... and the banded regime above it (same rows on this fixture)
    assert(rows(Similarity.hammingSearch(q, codes, k = 2,
      maxExactRows = 2)) == exact)
    // recall audit: bands catch the full exact top-2 here
    val rec = Similarity.hammingBandedRecall(q, codes, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rec.toSeq == Seq((1L, 2L, 1.0)))
    // far-but-banded: 9's only neighbors never share a band -> absent
    // from the banded regime, present in the exact one (the documented
    // recall tradeoff)
    assert(rows(Similarity.hammingTopKBlocked(codes.filter($"id" === 9L),
      codes, k = 1)).isEmpty)
    assert(rows(Similarity.hammingTopK(codes.filter($"id" === 9L),
      codes, k = 1)).nonEmpty)
    intercept[IllegalArgumentException] {
      Similarity.hammingTopKBlocked(q, codes, k = 2, bandBits = 7)
    }
    // planted-oversize guards (r10 verdict #1: the last two unguarded
    // cross joins)
    assertGuardTrips("hammingTopK.corpus") {
      Similarity.hammingTopK(q, codes, k = 1, maxExactRows = 2).collect()
    }
    assertGuardTrips("hammingTopK.queries") {
      Similarity.hammingTopK(codes, q, k = 1, maxExactRows = 2).collect()
    }
  }

  test("hammingRerankRecall: full shortlist reranks to exact -> recall 1") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val corpus = (0L until 8L).map(i =>
      (i, Seq.tabulate(4)(d => if (((i >> d) & 1L) == 1L) 1f else -1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.hammingRerankRecall(
      corpus.filter($"vec_id" < 3), corpus, shortlist = 7, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // shortlist covers every candidate, so the rerank IS the exact top-3
    assert(got.length == 3)
    assert(got.forall(r => r._2 == 3L && r._3 == 1.0), got.toSeq.toString)
    intercept[IllegalArgumentException] {
      Similarity.hammingRerankRecall(corpus, corpus, shortlist = 2, k = 3)
    }
  }

  test("truncationRecall: full-width prefix is the identity; prefix that " +
      "flips the ranking is measured, not assumed") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    // full cosine ranks 2 over 3 for query 1; the 1-dim prefix ranks 3
    // over 2 (both project to (1) vs query (1), tie -> id) — so recall@1
    // measures the flip
    val corpus = Seq(
      (1L, Seq(1f, 0f, 0f)),
      (2L, Seq(1f, 0.1f, 0f)),
      (3L, Seq(1f, 1f, 1f))).toDF("vec_id", "embedding")
    val q = corpus.filter($"vec_id" === 1L)
    val full = Similarity.truncationRecall(q, corpus, k = 1, dim = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(full.toSeq == Seq((1L, 1L, 1.0)))
    val trunc = Similarity.truncationRecall(q, corpus, k = 1, dim = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // prefix top-1 = 2 (cos tie at 1.0, id break) = full top-1 -> still 1;
    // use k=2 to see the real set: full {2,3}, prefix {2,3} -> 1.0, so
    // check the k=1 flip via a corpus where the prefix prefers 3
    assert(trunc.toSeq == Seq((1L, 1L, 1.0)))
    val skewed = Seq(
      (1L, Seq(0.1f, 1f, 0f)),
      (2L, Seq(1f, -1f, 0f)), // 1-dim-prefix winner (cos tie 1.0, id break)
      (3L, Seq(0.1f, 0.9f, 0.1f))) // full winner
      .toDF("vec_id", "embedding")
    val flipped = Similarity.truncationRecall(
      skewed.filter($"vec_id" === 1L), skewed, k = 1, dim = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(flipped.toSeq == Seq((1L, 0L, 0.0)), flipped.toSeq.toString)
    intercept[IllegalArgumentException] {
      Similarity.truncationRecall(corpus, corpus, k = 0, dim = 1)
    }
    intercept[IllegalArgumentException] {
      Similarity.truncationRecall(corpus, corpus, k = 1, dim = 0)
    }
    // dim past the vector length would slice() to the full vector and
    // certify recall 1.0 for a truncation that never happened — raises
    val exDim = intercept[Exception] {
      Similarity.truncationRecall(q, corpus, k = 1, dim = 4).collect()
    }
    assert(guardMessages(exDim).exists(m =>
      m != null && m.contains("graft.truncationRecall")), guardMessages(exDim))
    assertGuardTrips("truncationRecall.corpus") {
      Similarity.truncationRecall(q, corpus, k = 1, dim = 1,
        maxExactRows = 2).collect()
    }
  }

  test("sq8: hand-checked int8 codes; sq8Recall identity on clean ranks") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    // max|x| = 2 -> scale 63.5: 1 -> round(63.5) = 64 (HALF_UP), -2 -> -127
    val df = Seq((1L, Seq(1f, -2f, 0f)), (2L, Seq(0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val codes = Similarity.sq8(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(1L) == Seq(64, -127, 0))
    assert(codes(2L) == Seq(0, 0, 0)) // zero-norm: all-zero codes
    // well-separated corpus: int8 rounding cannot flip the ranking
    val corpus = Seq((1L, Seq(1f, 0f, 0f)), (2L, Seq(0.9f, 0.1f, 0f)),
      (3L, Seq(0f, 1f, 0f)), (4L, Seq(-1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val rec = Similarity.sq8Recall(corpus.filter($"vec_id" === 1L), corpus,
        k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rec.toSeq == Seq((1L, 2L, 1.0)), rec.toSeq.toString)
    intercept[IllegalArgumentException] {
      Similarity.sq8Recall(corpus, corpus, k = 0)
    }
    assertGuardTrips("sq8Recall.corpus") {
      Similarity.sq8Recall(corpus.filter($"vec_id" === 1L), corpus, k = 1,
        maxExactRows = 2).collect()
    }
  }

  test("ivfPqRecall: exactness regime (full probe + covering codebook) " +
      "-> recall 1; guards and panel bounds trip") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    // 12 real fixture vectors; kCodes = corpus size makes every unit
    // subvector its own (round-6) centroid, so ADC distance = the true
    // unit-sphere d2 up to a ~1e-6 perturbation far below the fixture's
    // cosine gaps, and nProbe = nCells removes cell loss: the composed
    // path must reproduce the exact cosine top-k.
    val corpus = embeddings.filter(col("vec_id") < 12)
    val got = Similarity.ivfPqRecall(corpus.filter(col("vec_id") < 3),
        corpus, k = 3, nCells = 2, m = 4, kCodes = 12, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 3, got.toSeq.toString)
    assert(got.forall(r => r._2 == 3L && r._3 == 1.0), got.toSeq.toString)
    intercept[IllegalArgumentException] {
      Similarity.ivfPqRecall(corpus, corpus, k = 0)
    }
    intercept[IllegalArgumentException] { // empty panel
      Similarity.ivfPqRecall(corpus.filter(col("vec_id") < 0), corpus, k = 1)
    }
    intercept[IllegalArgumentException] { // duplicate panel ids double-count hits
      Similarity.ivfPqRecall(
        corpus.filter(col("vec_id") < 1)
          .union(corpus.filter(col("vec_id") < 1)), corpus, k = 1)
    }
    assertGuardTrips("ivfPqRecall.corpus") {
      Similarity.ivfPqRecall(corpus.filter(col("vec_id") < 1), corpus,
        k = 1, nCells = 2, m = 4, kCodes = 4, maxExactRows = 2).collect()
    }
  }

  test("compressionTradeoff: five axes, one row each, exact hit counts; " +
      "jlRecall guards trip") {
    val corpus = embeddings.filter(col("vec_id") < 16)
    val queries = corpus.filter(col("vec_id") < 3)
    val rows = Similarity.compressionTradeoff(queries, corpus, k = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.map(_._1).sorted.toSeq ==
      Seq("binary_rerank", "ivf_pq_m4", "ivf_pq_m4_rerank", "jl_16", "sq8",
        "truncate_16"),
      rows.toSeq.toString)
    assert(rows.forall(_._3 == 3L), rows.toSeq.toString) // 3 queries each
    assert(rows.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
    assert(rows.map(r => r._1 -> r._2).toMap ==
      Map("sq8" -> 4.0, "jl_16" -> 4.0, "truncate_16" -> 4.0,
        "binary_rerank" -> 32.0, "ivf_pq_m4" -> 64.0,
        "ivf_pq_m4_rerank" -> 64.0))
    // Both sides exceed the bound and AQE materializes their guard
    // stages in parallel — whichever trips first wins, so assert the
    // family, not a specific side.
    assertGuardTrips("jlRecall") {
      Similarity.jlRecall(queries, corpus, k = 1, maxExactRows = 2).collect()
    }
  }

  test("mutualKnnPairs: hubness-proof — only mutual top-1 pairs survive") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val corpus = Seq((1L, Seq(1f, 0f)), (2L, Seq(1f, 0.1f)),
      (3L, Seq(0f, 1f)), (4L, Seq(-1f, 0f))).toDF("vec_id", "embedding")
    val got = Similarity.mutualKnnPairs(corpus, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        r.getLong(4)))
    // NN(1)=2 and NN(2)=1 (mutual); NN(3)=2 but NN(2)=1, NN(4)=3 but
    // NN(3)=2 -> the one-sided links die.
    assert(got.toSeq == Seq((1L, 2L, 1L, 1L)))
    intercept[IllegalArgumentException] {
      Similarity.mutualKnnPairs(corpus, k = 0)
    }
  }

  private def guardMessages(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(e => e.getMessage +: guardMessages(e.getCause))

  private def assertGuardTrips(op: String)(body: => Unit): Unit = {
    val ex = intercept[Exception](body)
    assert(guardMessages(ex).exists(m => m != null && m.contains(s"graft.$op")
        && m.contains("maxExactRows")),
      guardMessages(ex).mkString(" | "))
  }

  test("exact-regime guards trip loudly on oversized input (defaults ON)") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val big = (1L to 30L).map(i => (i, Seq(i.toFloat, 1f)))
      .toDF("vec_id", "embedding")
    assertGuardTrips("mutualKnnPairs") {
      Similarity.mutualKnnPairs(big, k = 1, maxExactRows = 10).collect()
    }
    assertGuardTrips("kthNeighborDistance.corpus") {
      Similarity.kthNeighborDistance(big.filter($"vec_id" < 3), big, k = 1,
        maxExactRows = 10).collect()
    }
    assertGuardTrips("kthNeighborDistance.queries") {
      Similarity.kthNeighborDistance(big, big.filter($"vec_id" < 3), k = 1,
        maxExactRows = 10).collect()
    }
    assertGuardTrips("marginBitext.tgt") {
      Similarity.marginBitext(big.filter($"vec_id" < 3), big, knn = 1,
        maxExactRows = 10).collect()
    }
    assertGuardTrips("mmrRerank") {
      Search.mmrRerank(
        big.filter($"vec_id" === 1L).select($"vec_id".as("qid"),
          $"embedding".as("qv")),
        big, n = 5, k = 2, maxExactRows = 10).collect()
    }
    assertGuardTrips("hardNegatives") {
      Search.hardNegatives(
        big.filter($"vec_id" === 1L).select($"vec_id".as("qid"),
          $"embedding".as("qvec"), lit(0).as("qgroup")),
        big.withColumn("label", lit(1)), k = 2, maxExactRows = 10).collect()
    }
    assertGuardTrips("topKPerQuery.corpus") {
      Search.topKPerQuery(
        big.filter($"vec_id" < 3).select($"vec_id".as("qid"),
          $"embedding".as("qvec")),
        big, k = 2, maxExactRows = 10).collect()
    }
    assertGuardTrips("topKPerQuery.queries") {
      Search.topKPerQuery(
        big.select($"vec_id".as("qid"), $"embedding".as("qvec")),
        big.filter($"vec_id" < 3), k = 2, maxExactRows = 10).collect()
    }
    // under the ceiling the same shapes pass untouched
    assert(Similarity.mutualKnnPairs(big, k = 1, maxExactRows = 30)
      .count() >= 1)
    assert(Search.topKPerQuery(
      big.select($"vec_id".as("qid"), $"embedding".as("qvec")),
      big, k = 1, maxExactRows = 30).count() >= 1)
  }

  test("blocked variants: identical vectors share every band -> found with exact values") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    // 100/101 are identical (cos 1.0, same hyperplane signature -> banded
    // candidates by construction); 3 is orthogonal filler.
    val corpus = Seq((100L, Seq(1f, 0.2f)), (101L, Seq(1f, 0.2f)),
      (3L, Seq(-0.2f, 1f))).toDF("vec_id", "embedding")
    val mutual = Similarity.mutualKnnPairsBlocked(corpus, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(mutual.contains((100L, 101L, 1.0, 1L, 1L)), mutual.toString)
    val kth = Similarity.kthNeighborDistanceBlocked(
        corpus.filter($"vec_id" === 100L), corpus, k = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(kth.toSeq == Seq((100L, 0.0, false)))
    // bitext: src s0; tgt = twin t1 + orthogonal t3. The twin's margin is
    // positive, the orthogonal's cosine (hence margin) is ~0 -> best = twin,
    // and the twin's best source back is s0 -> mutual.
    val bt = Similarity.marginBitextBlocked(
        Seq((0L, Seq(1f, 0.2f))).toDF("vec_id", "embedding"),
        Seq((1L, Seq(1f, 0.2f)), (3L, Seq(-0.2f, 1f)))
          .toDF("vec_id", "embedding"), knn = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    assert(bt.toSeq == Seq((0L, 1L, true)), bt.toSeq.toString)
    val mmr = Search.mmrRerankBlocked(
        Seq((100L, Seq(1f, 0.2f))).toDF("qid", "qv"), corpus,
        n = 5, k = 2)
      .orderBy("mmr_rank").collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getDouble(3)))
    // rank 1 is the identical twin at rel 1.0 (101 shares every band)
    assert(mmr.headOption.contains((101L, 1, 1.0)), mmr.toSeq.toString)
    // hard negatives: query group 9, only doc 3 positive -> the identical
    // twin 101 (group 1) is the rank-1 negative at score 1.0
    val hn = Search.hardNegativesBlocked(
        Seq((100L, Seq(1f, 0.2f), 9)).toDF("qid", "qvec", "qgroup"),
        corpus.withColumn("label",
          when($"vec_id" === 3L, 9).otherwise(1)), k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(hn.headOption.contains((100L, 101L, 1, 1.0)), hn.toSeq.toString)
  }

  test("hyperplanePlan: S-curves monotone, recommends the selective >=0.95-recall split") {
    val rows = Similarity.hyperplanePlan(spark, numPlanes = 16, minRecall = 0.95)
      .orderBy("band_bits").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("p_at_08"),
        r.getAs[Double]("rand_frac"), r.getAs[Boolean]("recommended"),
        r.getAs[Double]("p_at_08_mp")))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L, 16L))
    // selectivity (rand_frac) strictly improves with band_bits; recall at
    // cos 0.8 strictly degrades
    assert(rows.map(_._4).sliding(2).forall(p => p(0) > p(1)))
    assert(rows.map(_._3).sliding(2).forall(p => p(0) > p(1)))
    // the recommended split is the LARGEST band_bits still clearing 0.95
    // recall at cos 0.8 — band_bits=2 for 16 planes (bandBits=4 recalls
    // only ~0.87), matching bandedCandidatePairs' default
    assert(rows.filter(_._5).map(r => (r._1, r._2)).toSeq == Seq((2L, 8L)))
    // multiprobe lifts every split's recall (B=1 trivially to 1.0), and at
    // the selective B=4 split it clears the 0.95 floor the plain split
    // misses — the quantified case for similarity_multiprobe's config
    rows.foreach(r => assert(r._6 >= r._3, r.toString))
    val b4 = rows.find(_._1 == 4L).get
    assert(b4._3 < 0.95 && b4._6 >= 0.95, b4.toString)
    intercept[IllegalArgumentException] {
      Similarity.hyperplanePlan(spark, numPlanes = 63)
    }
  }

  test("pre-banded index path is row-identical to the direct banded search") {
    val corpus = embeddings.select(col("vec_id"), col("embedding"))
    val q = embeddings.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val direct = Similarity.blockedTopKPerQuery(q, corpus, 7,
        qidCol = "qid", qvecCol = "qv")
      .select("qid", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val index = Similarity.bandedSignatures(corpus, "vec_id", "embedding")
    val pre = Similarity.blockedTopKPerQueryPrebanded(q, index, corpus, 7,
        qidCol = "qid", qvecCol = "qv")
      .select("qid", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(direct == pre)
    assert(direct.nonEmpty)
    // config mismatch against the stamped index fails loudly instead of
    // silently joining incompatible band layouts
    intercept[IllegalArgumentException] {
      Similarity.blockedTopKPerQueryPrebanded(q, index, corpus, 7,
        qidCol = "qid", qvecCol = "qv", bandBits = 4)
    }
    // an UNSTAMPED table (hand-built) is refused too
    intercept[IllegalArgumentException] {
      Similarity.blockedTopKPerQueryPrebanded(q,
        index.select(col("vec_id"), (col("__band") + 0).as("__band"),
          col("__bits")),
        corpus, 7, qidCol = "qid", qvecCol = "qv")
    }
  }

  test("multiprobe recovers candidates a selective split drops (query side only)") {
    val corpus = embeddings.select(col("vec_id"), col("embedding"))
    val q = embeddings.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def candidates(probe: Boolean): Set[Long] =
      Similarity.blockedTopKPerQuery(q, corpus, 100000,
          qidCol = "qid", qvecCol = "qv", bandBits = 4, multiprobe = probe)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    val plain = candidates(probe = false)
    val probed = candidates(probe = true)
    // probing flip-values only ADDS candidates, and on this isotropic
    // corpus the bandBits=4 split is selective enough that 1-bit probes
    // find strictly more
    assert(plain.subsetOf(probed))
    assert(probed.size > plain.size, s"${plain.size} vs ${probed.size}")
    intercept[IllegalArgumentException] {
      Similarity.bandedCandidatePairs(
        q, corpus, "qid", "qv", "vec_id", "embedding", 16, 4, 42,
        orderedOnly = true, multiprobe = true)
    }
  }

  test("blocked regimes agree with exact on fixture embeddings for band-found pairs") {
    val corpus = embeddings.filter(col("vec_id") < 60)
    val exact = Similarity.mutualKnnPairs(corpus, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // 1-bit bands (16 of them): a pair is missed only when ALL 16 sign bits
    // differ, so near-neighbor recall is effectively 1 here; every blocked
    // pair that IS mutual under exact ranks must carry the same cosine.
    val blocked = Similarity.mutualKnnPairsBlocked(corpus, k = 3, bandBits = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val shared = exact.keySet.intersect(blocked.keySet)
    assert(shared.nonEmpty)
    shared.foreach(k => assert(exact(k) == blocked(k)))
  }

  test("clusteredFixture: deterministic float32, actually clustered, " +
      "loud on dim mismatch") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = (0L until 64L).map(i =>
      (i, Array.fill(64)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val c1 = Similarity.clusteredFixture(base)
    val c2 = Similarity.clusteredFixture(base)
    // Schema stays array<float>; transform is a pure function of (id, vec).
    assert(c1.schema("embedding").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = true))
    val r1 = c1.orderBy("vec_id").collect().map(_.getSeq[Float](1))
    val r2 = c2.orderBy("vec_id").collect().map(_.getSeq[Float](1))
    assert(r1.zip(r2).forall { case (a, b) => a == b })
    // Anisotropy is real: same-cluster (id % 8 equal) cosine beats
    // cross-cluster cosine on average — the property the fixture exists
    // to inject.
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val vecs = r1.zipWithIndex
    val (same, cross) = (for {
      (a, i) <- vecs; (b, j) <- vecs if i < j
    } yield (i % 8 == j % 8, cos(a, b))).partition(_._1)
    val sameAvg = same.map(_._2).sum / same.size
    val crossAvg = cross.map(_._2).sum / cross.size
    assert(sameAvg > 0.5 && sameAvg > crossAvg + 0.3,
      s"fixture not clustered: within=$sameAvg across=$crossAvg")
    // Null vectors ride through; a wrong-width vector raises in-flight.
    val withNull = Seq((0L, null: Array[Float]), (1L, Array.fill(64)(0.1f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.clusteredFixture(withNull).collect()
      .exists(_.isNullAt(1)))
    val bad = Seq((0L, Array.fill(16)(0.1f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.clusteredFixture(bad).collect()
    }
    assert(e.getMessage.contains("clusteredFixture"))
  }

  test("rotationMatrix: orthonormal, deterministic, seed-sensitive") {
    val q = graft.functions.VectorFunctions.rotationMatrix(32, 1234L)
    var maxOff = 0.0
    for (a <- 0 until 32; b <- 0 until 32) {
      val dot = (0 until 32).map(i => q(a)(i) * q(b)(i)).sum
      maxOff = math.max(maxOff, math.abs(dot - (if (a == b) 1.0 else 0.0)))
    }
    assert(maxOff < 1e-9, s"not orthonormal: $maxOff")
    val q2 = graft.functions.VectorFunctions.rotationMatrix(32, 1234L)
    assert(q.zip(q2).forall { case (r1, r2) => r1.sameElements(r2) })
    val q3 = graft.functions.VectorFunctions.rotationMatrix(32, 99L)
    assert(!q(0).sameElements(q3(0)))
  }

  test("rotatedVector: isometric up to rounding, null-safe, loud on width") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val base = (0L until 8L).map(i =>
      (i, Array.fill(64)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val mat = graft.functions.VectorFunctions.rotationMatrix(64, 1234L)
    val rot = base.withColumn("rv",
      graft.functions.VectorFunctions.rotatedVector(col("embedding"), mat))
    val rows = rot.orderBy("vec_id").collect()
      .map(r => (r.getSeq[Float](1), r.getSeq[Float](2)))
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    // A rotation preserves pairwise geometry: cosine between rotated pairs
    // matches the original within the 6dp-rounding noise floor.
    for (i <- rows.indices; j <- i + 1 until rows.length) {
      val before = cos(rows(i)._1, rows(j)._1)
      val after = cos(rows(i)._2, rows(j)._2)
      assert(math.abs(before - after) < 1e-4, s"pair ($i,$j): $before vs $after")
    }
    val withNull = Seq((0L, null: Array[Float]), (1L, Array.fill(64)(0.1f)))
      .toDF("vec_id", "embedding")
    assert(withNull.select(graft.functions.VectorFunctions
        .rotatedVector(col("embedding"), mat)).collect().exists(_.isNullAt(0)))
    val bad = Seq((0L, Array.fill(16)(0.1f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      bad.select(graft.functions.VectorFunctions
        .rotatedVector(col("embedding"), mat)).collect()
    }
    assert(e.getMessage.contains("rotatedVector"))
  }

  test("spectrumFixture: golden decay weights, null-safe, loud on width") {
    import spark.implicits._
    val base = Seq((0L, Array.fill(64)(1.0f))).toDF("vec_id", "embedding")
    val got = Similarity.spectrumFixture(base).collect()(0).getSeq[Float](1)
    (0 until 64).foreach { d =>
      val want = java.math.BigDecimal.valueOf(StrictMath.exp(-d.toDouble / 8.0))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue.toFloat
      assert(got(d) == want, s"dim $d: ${got(d)} != $want")
    }
    val withNull = Seq((0L, null: Array[Float])).toDF("vec_id", "embedding")
    assert(Similarity.spectrumFixture(withNull).collect()(0).isNullAt(1))
    val bad = Seq((0L, Array.fill(8)(0.1f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.spectrumFixture(bad).collect()
    }
    assert(e.getMessage.contains("spectrumFixture"))
  }

  test("opqRotation: eigen-allocation is orthonormal and beats plain PQ " +
      "on the axis-concentrated spectrum (spec-measured OPQ variant)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val base = (0L until 120L).map(i =>
      (i, Array.fill(64)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val spec = Similarity.spectrumFixture(base).localCheckpoint(true)
    val rot = Similarity.opqRotation(spec, m = 4)
    // Rows are reordered PCA eigenvectors -> still an orthonormal basis
    // (Jacobi tolerance), and a permutation of ALL 64 axes.
    var maxOff = 0.0
    for (a <- 0 until 64; b <- 0 until 64) {
      val dot = (0 until 64).map(i => rot(a)(i) * rot(b)(i)).sum
      maxOff = math.max(maxOff, math.abs(dot - (if (a == b) 1.0 else 0.0)))
    }
    assert(maxOff < 1e-6, s"not orthonormal: $maxOff")
    def meanRecall(corpus: org.apache.spark.sql.DataFrame): Double =
      Similarity.ivfPqRecall(corpus.filter(col("vec_id") < 10), corpus, k = 5)
        .agg(avg(col("recall"))).collect()(0).getDouble(0)
    val rotated = spec.withColumn("embedding",
        graft.functions.VectorFunctions.rotatedVector(col("embedding"), rot))
      .localCheckpoint(true)
    val plain = meanRecall(spec)
    val opq = meanRecall(rotated)
    assert(opq > plain,
      s"eigen-allocation should fix the unbalanced subspaces: " +
        s"plain=$plain opq=$opq")
  }

  test("pqRotationTradeoff: rotation recovers PQ recall on an " +
      "axis-concentrated spectrum (the card's measured headline)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val base = (0L until 120L).map(i =>
      (i, Array.fill(64)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val spec = Similarity.spectrumFixture(base).localCheckpoint(true)
    val rowsOut = Similarity.pqRotationTradeoff(
        spec.filter(col("vec_id") < 10), spec, k = 5)
      .orderBy("axis").collect()
    assert(rowsOut.length == 2)
    val plain = rowsOut.find(_.getString(0) == "ivf_pq_m4").get
    val rotated = rowsOut.find(_.getString(0) == "ivf_pq_m4_rotated").get
    assert(plain.getLong(2) == rotated.getLong(2), "panels must match")
    assert(rotated.getDouble(3) > plain.getDouble(3),
      s"rotation should help on a decayed spectrum: " +
        s"plain=${plain.getDouble(3)} rotated=${rotated.getDouble(3)}")
  }
}
