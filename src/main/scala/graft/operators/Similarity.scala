package graft.operators

import org.apache.spark.ml.clustering.KMeans
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
    */
  def ivfIndex(corpus: DataFrame, vecCol: String = "embedding",
               nCells: Int = 16, seed: Long = 42L,
               maxIter: Int = 5): (DataFrame, Array[Array[Double]]) = {
    val withMl = corpus.withColumn("__ml_vec", toMl(col(vecCol)))
    // Few iterations suffice: IVF only needs a reasonable partition of the
    // space, not converged centroids — each extra iteration is a full pass.
    val km = new KMeans().setK(nCells).setSeed(seed).setFeaturesCol("__ml_vec")
      .setPredictionCol("cell").setMaxIter(maxIter)
    val model = km.fit(withMl)
    val indexed = model.transform(withMl).drop("__ml_vec")
    (indexed, model.clusterCenters.map(_.toArray))
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
