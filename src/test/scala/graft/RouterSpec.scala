package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Search, Similarity}

/** The `*Routed` regime routers must be TRANSPARENT: below the row bound
  * they return exactly the exact kernel's rows (via the guard-free
  * kernel), above it exactly the blocked kernel's rows — routing never
  * changes results, only which regime computes them. One spec per family,
  * both branches, on the driver-generated fixture.
  */
class RouterSpec extends AnyFunSuite with SparkTestBase {

  private lazy val embeddings =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private lazy val corpus = embeddings.filter(col("vec_id") < 30)

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("mutualKnnPairsRouted: exact branch == mutualKnnPairs, blocked " +
      "branch == mutualKnnPairsBlocked") {
    assert(rows(Similarity.mutualKnnPairsRouted(corpus, k = 2)) ==
      rows(Similarity.mutualKnnPairs(corpus, k = 2)))
    assert(rows(Similarity.mutualKnnPairsRouted(corpus, k = 2,
        maxExactRows = 2)) ==
      rows(Similarity.mutualKnnPairsBlocked(corpus, k = 2)))
  }

  test("kthNeighborDistanceRouted: both branches transparent") {
    val q = corpus.filter(col("vec_id") < 5)
    assert(rows(Similarity.kthNeighborDistanceRouted(q, corpus, k = 2)) ==
      rows(Similarity.kthNeighborDistance(q, corpus, k = 2)))
    assert(rows(Similarity.kthNeighborDistanceRouted(q, corpus, k = 2,
        maxExactRows = 2)) ==
      rows(Similarity.kthNeighborDistanceBlocked(q, corpus, k = 2)))
  }

  test("marginBitextRouted: both branches transparent") {
    val src = embeddings.filter(col("vec_id") < 10)
    val tgt = embeddings.filter(col("vec_id") >= 10 && col("vec_id") < 30)
    assert(rows(Similarity.marginBitextRouted(src, tgt, knn = 2)) ==
      rows(Similarity.marginBitext(src, tgt, knn = 2)))
    assert(rows(Similarity.marginBitextRouted(src, tgt, knn = 2,
        maxExactRows = 2)) ==
      rows(Similarity.marginBitextBlocked(src, tgt, knn = 2)))
  }

  test("hardNegativesRouted: both branches transparent") {
    val labeled = corpus.withColumn("label", col("vec_id") % 3)
    val q = labeled.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("label").as("qgroup"))
    assert(rows(Search.hardNegativesRouted(q, labeled, k = 3)) ==
      rows(Search.hardNegatives(q, labeled, k = 3)))
    assert(rows(Search.hardNegativesRouted(q, labeled, k = 3,
        maxExactRows = 2)) ==
      rows(Search.hardNegativesBlocked(q, labeled, k = 3)))
  }

  test("mmrRerankRouted: both branches transparent") {
    val q = corpus.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    assert(rows(Search.mmrRerankRouted(q, corpus, n = 5, k = 3)) ==
      rows(Search.mmrRerank(q, corpus, n = 5, k = 3)))
    assert(rows(Search.mmrRerankRouted(q, corpus, n = 5, k = 3,
        maxExactRows = 2)) ==
      rows(Search.mmrRerankBlocked(q, corpus, n = 5, k = 3)))
  }
}
