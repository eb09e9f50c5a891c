package graft.operators

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.linalg.{Vectors, Vector => MLVector}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column — the scale
  * path for the reference's vector top-k (`yamlpipe/core/evaluation.py:55-64`,
  * which delegates to LanceDB/Chroma ANN indexes).
  *
  * Three tiers:
  *  - [[Search.topKCosine]] — exact brute force, `TakeOrderedAndProject`
  *    (per-partition top-k + k-row driver merge). Correctness baseline; scans
  *    everything but never shuffles.
  *  - LSH (random hyperplane buckets): query probes only its own buckets —
  *    sub-linear scan at the cost of recall.
  *  - IVF (inverted file over k-means centroids): probe the nProbe nearest
  *    cells. The index is a plain partitioned-by-cell table, so a cluster
  *    deployment prunes cells at the file-scan level (partition pruning).
  */
object Similarity {

  private def toMl = udf((arr: Seq[Float]) =>
    Vectors.dense(arr.map(_.toDouble).toArray))

  // -------------------------------------------------------------------------
  // LSH tier
  // -------------------------------------------------------------------------

  /** Top-k via BucketedRandomProjectionLSH (MLlib). Deterministic under the
    * seed. Returns the corpus rows + `dist` (euclidean), nearest first.
    */
  def lshTopK(corpus: DataFrame, queryVec: Array[Float], k: Int,
              vecCol: String = "embedding", bucketLength: Double = 2.0,
              numHashTables: Int = 4, seed: Long = 42L): DataFrame = {
    val withMl = corpus.withColumn("__ml_vec", toMl(col(vecCol)))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("__ml_vec").setOutputCol("__hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(seed)
    val model = lsh.fit(withMl)
    model.approxNearestNeighbors(withMl, Vectors.dense(queryVec.map(_.toDouble)), k, "dist")
      .drop("__ml_vec", "__hashes")
  }

  // -------------------------------------------------------------------------
  // IVF tier
  // -------------------------------------------------------------------------

  /** IVF index: assign every vector to its nearest of `nCells` k-means
    * centroids. Returns (indexed corpus with `cell` column, centroids).
    * The indexed frame should be persisted partitioned by `cell` so queries
    * prune at scan time.
    *
    * Centroid TRAINING is driver-local over a bounded sample (`trainCap`
    * rows) — the standard IVF design (FAISS trains coarse quantizers on a
    * sample in-process): at 100 TB a distributed full-corpus k-means is
    * pure waste; cell quality saturates long before millions of training
    * points, and each MLlib iteration is a cluster-wide job. Cell
    * ASSIGNMENT stays distributed: one narrow pass tagging every vector
    * with its nearest centroid. Deterministic under (seed, input order).
    */
  def ivfIndex(corpus: DataFrame, vecCol: String = "embedding",
               nCells: Int = 16, seed: Long = 42L,
               maxIter: Int = 5, trainCap: Int = 20000): (DataFrame, Array[Array[Double]]) = {
    val sample: Array[Array[Double]] = corpus.select(col(vecCol)).limit(trainCap)
      .collect().iterator
      .map(r => r.getSeq[Float](0).iterator.map(_.toDouble).toArray)
      .filter(_.nonEmpty).toArray
    require(sample.nonEmpty, "ivfIndex: corpus has no non-empty vectors")
    val k = math.min(nCells, sample.length)
    val dim = sample(0).length
    // deterministic seeded init: distinct sample indices from an LCG stream
    val rnd = new java.util.Random(seed)
    val centroids = Array.tabulate(k) { _ =>
      sample(rnd.nextInt(sample.length)).clone()
    }
    def nearest(v: Array[Double], cs: Array[Array[Double]]): Int = {
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < cs.length) {
        var d = 0.0; var j = 0
        val cv = cs(c)
        while (j < dim) { val t = v(j) - cv(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    // Lloyd's iterations, driver-local: O(maxIter * |sample| * k * dim)
    var iter = 0
    while (iter < maxIter) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        val c = nearest(v, centroids)
        counts(c) += 1
        var j = 0
        while (j < dim) { sums(c)(j) += v(j); j += 1 }
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var j = 0
          while (j < dim) { centroids(c)(j) = sums(c)(j) / counts(c); j += 1 }
        }
        c += 1
      }
      iter += 1
    }
    val bc = corpus.sparkSession.sparkContext.broadcast(centroids)
    val assignUdf = udf((vec: Seq[Float]) => {
      val cs = bc.value
      val v = new Array[Double](cs(0).length)
      val n = math.min(vec.length, v.length)
      var j = 0
      while (j < n) { v(j) = vec(j).toDouble; j += 1 }
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < cs.length) {
        var d = 0.0; var i = 0
        val cv = cs(c)
        while (i < cv.length) { val t = v(i) - cv(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    })
    (corpus.withColumn("cell", assignUdf(col(vecCol))), centroids)
  }

  // -------------------------------------------------------------------------
  // Hyperplane-LSH blocked batch retrieval (scale path for eval/search)
  // -------------------------------------------------------------------------

  /** Deterministic Rademacher (±1) hyperplane signature: bit p of the
    * result is the sign of the dot product with pseudo-random hyperplane p
    * (components derived from fmix64(seed, plane, dim) — no RNG state, so
    * signatures are reproducible across executors and runs).
    */
  private[operators] val hyperplaneSigUdf = udf((vec: Seq[Float], numPlanes: Int, seed: Int) => {
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      var dot = 0.0
      var j = 0
      while (j < vec.length) {
        var h = (seed.toLong << 32) ^ (p.toLong * 0x9E3779B97F4A7C15L) ^
          (j.toLong * 0xC2B2AE3D27D4EB4FL)
        h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
        dot += (if ((h & 1L) == 0L) 1.0 else -1.0) * vec(j)
        j += 1
      }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  })

  /** Batch top-k per query WITHOUT the cross join: queries and corpus are
    * blocked by hyperplane-LSH signature bands (cosine-similar vectors
    * agree on hyperplane signs, so they share bands); candidates sharing
    * any band are exactly re-ranked. The shuffle key is (band index, band
    * value) — work scales with collisions, not |Q| x |N|. Approximate:
    * recall is tuned by numPlanes / bandBits (more bands -> higher recall).
    *
    * Array columns never ride through the band explode: candidate (qid, id)
    * pairs are distinct-ed first and vectors joined back, the same shape as
    * the minhash verification join.
    */
  def blockedTopKPerQuery(queries: DataFrame, corpus: DataFrame, k: Int,
                          qidCol: String = "qid", qvecCol: String = "qvec",
                          idCol: String = "vec_id", vecCol: String = "embedding",
                          numPlanes: Int = 16, bandBits: Int = 2,
                          seed: Int = 42): DataFrame = {
    require(numPlanes % bandBits == 0, "numPlanes must be a multiple of bandBits")
    val nBands = numPlanes / bandBits
    val mask = (1L << bandBits) - 1
    def banded(df: DataFrame, id: String, vc: String): DataFrame = {
      val sig = hyperplaneSigUdf(col(vc), lit(numPlanes), lit(seed))
      val bandVals = array((0 until nBands).map(b =>
        shiftrightunsigned(col("__sig"), b * bandBits).bitwiseAND(lit(mask))): _*)
      df.select(col(id), sig.as("__sig"))
        .select(col(id), posexplode(bandVals).as(Seq("__band", "__bits")))
    }
    val qb = banded(queries, qidCol, qvecCol)
    val cb = banded(corpus, idCol, vecCol)
    val candidates = qb.join(cb, Seq("__band", "__bits"))
      .select(col(qidCol), col(idCol)).distinct()
    val scored = candidates
      .join(queries.select(col(qidCol), col(qvecCol)), qidCol)
      .join(corpus.select(col(idCol), col(vecCol)), idCol)
      .withColumn("score",
        graft.plans.CosineSimilarityExpr.cosine(col(vecCol), col(qvecCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("score").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Query an IVF-indexed corpus: rank cells by centroid distance, scan only
    * the `nProbe` nearest cells, exact top-k within them. The cell filter is
    * a partition-prunable predicate.
    */
  def ivfTopK(indexed: DataFrame, centroids: Array[Array[Double]],
              queryVec: Array[Float], k: Int, nProbe: Int = 4,
              vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val q = queryVec.map(_.toDouble)
    val probeCells = centroids.zipWithIndex
      .map { case (c, i) =>
        var d = 0.0; var j = 0
        while (j < c.length) { val t = c(j) - q(j); d += t * t; j += 1 }
        (i, d)
      }
      .sortBy(_._2).take(nProbe).map(_._1)
    val qLit = lit(queryVec)
    indexed
      .filter(col("cell").isin(probeCells.toIndexedSeq: _*))
      .withColumn("score", graft.plans.CosineSimilarityExpr.cosine(col(vecCol), qLit))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
