package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pq

class PqSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // 3 well-separated 8-dim cluster centers; 4 points near each (the
  // fixture's embeddings are isotropic noise, so structural claims like
  // "ADC finds the near cluster" are asserted HERE, on clustered data).
  private def clustered() = {
    val centers = Seq(
      Array(10.0, 10, 10, 10, 0, 0, 0, 0),
      Array(0.0, 0, 0, 0, 10, 10, 10, 10),
      Array(-10.0, -10, -10, -10, -10, -10, -10, -10))
    // ids interleaved (id % 3 == cluster) so the 3 LOWEST-id seed vectors
    // KMeans.fit picks span all three planted clusters
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      p <- 0 until 4
    } yield {
      val jitter = (p - 1.5) / 10.0 // deterministic, +-0.15
      ((p * 3 + ci).toLong, c.map(_ + jitter).toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("train validates dimensions and shapes the codebooks") {
    val cb = Pq.train(clustered(), "embedding", "vec_id", m = 2, k = 3,
      iterations = 2)
    assert(cb.m == 2 && cb.subDim == 4 && cb.k == 3)
    assert(cb.centroids.forall(_.forall(_.length == 4)))
    val err = intercept[IllegalArgumentException] {
      Pq.train(clustered(), "embedding", "vec_id", m = 3, k = 2, iterations = 1)
    }
    assert(err.getMessage.contains("not divisible"))
  }

  test("encode emits one code per subspace; same-cluster points share codes") {
    val df = clustered()
    val cb = Pq.train(df, "embedding", "vec_id", m = 2, k = 3, iterations = 3)
    val codes = Pq.encode(df, "embedding", "vec_id", cb)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes.size == 12 && codes.values.forall(_.length == 2))
    // all 4 members of each planted cluster quantize identically
    for (ci <- 0 until 3) {
      val member = (0 until 4).map(p => codes((p * 3 + ci).toLong))
      assert(member.distinct.size == 1,
        s"cluster $ci split across codes: $member")
    }
  }

  test("ADC ranks the query's own cluster first; distances round-trip exactness on centroids") {
    val df = clustered()
    val cb = Pq.train(df, "embedding", "vec_id", m = 2, k = 3, iterations = 3)
    val encoded = Pq.encode(df, "embedding", "vec_id", cb)
    // query = a point in cluster 1's neighborhood
    val q = Array(0.0, 0, 0, 0, 10, 10, 10, 10)
    val top = Pq.adcTopK(encoded, cb, q, topK = 4)
      .as[(Long, Double)].collect()
    assert(top.map(_._1).toSet == Set(1L, 4L, 7L, 10L),
      s"expected cluster 1's members, got ${top.toSeq}")
    // with converged centroids the ADC distance to the cluster's own code
    // is the exact query-to-centroid distance (tiny here)
    assert(top.forall(_._2 < 1.0))
    // a far query ranks the far cluster (id % 3 == 2) first
    val far = Pq.adcTopK(encoded, cb, Array.fill(8)(-10.0), topK = 12)
      .as[(Long, Double)].collect()
    assert(far.take(4).map(_._1).toSet == Set(2L, 5L, 8L, 11L))
  }

  test("adcTopK validates the query dimension") {
    val df = clustered()
    val cb = Pq.train(df, "embedding", "vec_id", m = 2, k = 3, iterations = 1)
    val err = intercept[IllegalArgumentException] {
      Pq.adcTopK(Pq.encode(df, "embedding", "vec_id", cb), cb,
        Array(1.0, 2.0), topK = 3)
    }
    assert(err.getMessage.contains("query dim"))
  }
}
