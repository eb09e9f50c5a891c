package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Components

class ComponentsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], maxIter: Int = 25): Map[Long, Long] =
    Components.connectedComponents(
      edges.toDF("id_a", "id_b"), "id_a", "id_b", maxIter)
      .as[(Long, Long)].collect().toMap

  test("chains, stars, bridges, and separate clusters resolve to min labels") {
    // chain 1-2-3-4; star 10-(11,12,13); bridge 13-20; separate pair 30-31
    val labels = cc(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L), (13L, 20L),
      (30L, 31L)))
    assert(labels == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 10L,
      30L -> 30L, 31L -> 30L))
  }

  test("self-loops, duplicate and reversed edges are harmless") {
    val labels = cc(Seq((5L, 5L), (6L, 7L), (7L, 6L), (6L, 7L)))
    assert(labels == Map(5L -> 5L, 6L -> 6L, 7L -> 6L))
  }

  test("a long path converges in O(log diameter) rounds (path doubling)") {
    // 64-node path: plain min-propagation needs ~63 rounds, doubling ~7
    val edges = (0L until 63L).map(i => (i, i + 1))
    val labels = cc(edges, maxIter = 10)
    assert(labels.size == 64 && labels.values.forall(_ == 0L))
  }

  test("non-convergence fails loudly instead of returning partial labels") {
    val edges = (0L until 63L).map(i => (i, i + 1))
    assertThrows[IllegalStateException](cc(edges, maxIter = 2))
  }

  test("an empty pair graph yields an empty labeling") {
    assert(cc(Seq.empty).isEmpty)
  }

  test("dropDuplicates keeps one representative per cluster and all singletons") {
    val docs = (1L to 8L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val comps = Components.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b"), "a", "b")
    val kept = Components.dropDuplicates(docs, "doc_id", comps)
      .select("doc_id").as[Long].collect().toSet
    // cluster {1,2,3} -> keep 1; {5,6} -> keep 5; 4,7,8 untouched
    assert(kept == Set(1L, 4L, 5L, 7L, 8L))
  }

  test("keepBest keeps the highest-quality member, ties to lowest id, singletons pass") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.5), // cluster {1,2,3} -> 2 wins on quality
      (5L, 0.7), (6L, 0.7),            // cluster {5,6} -> tie, 5 wins on id
      (4L, 0.1), (7L, 0.0)             // singletons pass through
    ).toDF("doc_id", "quality")
    val comps = Components.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b"), "a", "b")
    val kept = Components.keepBest(docs, "doc_id", comps, Seq(col("quality").desc))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 5L, 4L, 7L))
  }

  test("softDedupWeights: cluster mass sums to 1 at alpha=1; singletons weigh 1; alpha=0 is no-op") {
    val docs = Seq(1L, 2L, 3L, 5L, 6L, 9L).toDF("doc_id")
    val comps = Components.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b"), "a", "b")
    val w = Components.softDedupWeights(docs, "doc_id", comps)
      .select("doc_id", "weight").as[(Long, Double)].collect().toMap
    assert(w(1L) == 1.0 / 3 && w(2L) == 1.0 / 3 && w(3L) == 1.0 / 3)
    assert(w(5L) == 0.5 && w(6L) == 0.5)
    assert(w(9L) == 1.0) // singleton
    assert(math.abs((w(1L) + w(2L) + w(3L)) - 1.0) < 1e-12)
    val flat = Components.softDedupWeights(docs, "doc_id", comps, alpha = 0.0)
      .select("doc_id", "weight").as[(Long, Double)].collect().toMap
    assert(flat.values.forall(_ == 1.0))
  }

  test("incrementalComponents: fold equals full recompute, merges relabel") {
    import spark.implicits._
    def cc(pairs: Seq[(Long, Long)]) = Components
      .connectedComponents(pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("component"))
      .toMap
    // yesterday: {1,2,3} and {10,11}; today's batch BRIDGES them (3-10)
    // and adds a fresh cluster {20,21}
    val old = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val batch = Seq((3L, 10L), (20L, 21L))
    val prev = Components.connectedComponents(old.toDF("a", "b"), "a", "b")
    val inc = Components.incrementalComponents(prev, batch.toDF("a", "b"),
        "a", "b")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("component"))
      .toMap
    val full = cc(old ++ batch)
    assert(inc == full)
    // the bridged cluster relabeled to the global min, fresh cluster intact
    assert(inc(11L) == 1L && inc(10L) == 1L && inc(21L) == 20L)
    // empty batch: fold is an identity on the assignment
    val idFold = Components.incrementalComponents(prev,
        Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("component"))
      .toMap
    assert(idFold == cc(old))
  }
}
