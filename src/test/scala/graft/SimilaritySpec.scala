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

  test("IVF with full probe is exact; partial probe keeps the top hit") {
    val corpus = embeddings.filter(col("vec_id") =!= 0)
    val (indexed, centroids) = Similarity.ivfIndex(corpus, nCells = 4)
    val fullProbe = Similarity.ivfTopK(indexed, centroids, queryVec, 10, nProbe = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(fullProbe == exactTop10) // probing every cell == brute force
    val partial = Similarity.ivfTopK(indexed, centroids, queryVec, 10, nProbe = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(partial.contains(exactTop10.head))
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
}
