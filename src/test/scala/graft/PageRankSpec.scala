package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

/** Fixed-iteration unnormalized PageRank: hand-checked propagation on
  * stars, cycles, chains; parallel-edge weighting; conf restoration.
  */
class PageRankSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] =
    PageRank.ranks(edges.toDF("s", "d"), "s", "d", iterations = iters)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("pagerank")).toMap

  test("star: two iterations of hand-computed propagation") {
    // 2,3,4 -> 1. iter1: r1 = 0.15 + 0.85*3 = 2.7, spokes 0.15.
    // iter2: r1 = 0.15 + 0.85*(3*0.15) = 0.5325.
    val r = run(Seq((2L, 1L), (3L, 1L), (4L, 1L)), iters = 2)
    assert(r == Map(1L -> 0.5325, 2L -> 0.15, 3L -> 0.15, 4L -> 0.15))
  }

  test("cycle and self-loop are fixed points at rank 1.0") {
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 1L)), iters = 5).values.toSet == Set(1.0))
    assert(run(Seq((7L, 7L)), iters = 4) == Map(7L -> 1.0))
  }

  test("chain with dangling tail: two iterations") {
    // 1 -> 2 -> 3; 3 dangles (its mass leaks, per the unnormalized variant).
    // iter1: r1=0.15, r2=1.0, r3=1.0. iter2: r2=0.15+0.85*0.15=0.2775, r3=1.0.
    val r = run(Seq((1L, 2L), (2L, 3L)), iters = 2)
    assert(r == Map(1L -> 0.15, 2L -> 0.2775, 3L -> 1.0))
  }

  test("parallel edges split out-degree proportionally") {
    // 1 -> 2 (twice), 1 -> 3: outdeg 3, so 2 gets 2/3, 3 gets 1/3.
    val r = run(Seq((1L, 2L), (1L, 2L), (1L, 3L)), iters = 1)
    def v(x: Double) = BigDecimal(0.15 + 0.85 * x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r == Map(1L -> 0.15, 2L -> v(2.0 / 3), 3L -> v(1.0 / 3)))
  }

  test("shuffle-partition conf is restored after the loop") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    run(Seq((1L, 2L)), iters = 1)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
  }

  test("personalized: seed teleport, downstream decay, unreachable at 0") {
    import spark.implicits._
    // chain 1 -> 2 -> 3, island 4 -> 5; seed = {1}
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("s", "d")
    val seeds = Seq(1L).toDF("node")
    val r = PageRank.personalized(edges, seeds, "s", "d", "node",
        iterations = 2)
      .collect().map(x => x.getAs[Long]("id") -> x.getAs[Double]("ppr")).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // iter1: r1 = 0.15, r2 = 0.85*1 = 0.85, r3 = 0.85*0 = 0
    // iter2: r1 = 0.15, r2 = 0.85*0.15 = 0.1275, r3 = 0.85*0.85 = 0.7225
    assert(r(1L) == r6(1.0 - 0.85))
    assert(r(2L) == r6(0.85 * (1.0 - 0.85)))
    assert(r(3L) == r6(0.85 * 0.85))
    // island never reached by seed mass
    assert(r(4L) == 0.0 && r(5L) == 0.0)
    // seeding every node with damping teleport reduces toward ranks' shape
    val all = PageRank.personalized(edges,
      Seq(1L, 2L, 3L, 4L, 5L).toDF("node"), "s", "d", "node", iterations = 3)
      .collect().map(x => x.getAs[Long]("id") -> x.getAs[Double]("ppr")).toMap
    val classic = PageRank.ranks(edges, "s", "d", iterations = 3)
      .collect().map(x => x.getAs[Long]("id") -> x.getAs[Double]("pagerank")).toMap
    assert(all == classic)
  }

  private def runHits(edges: Seq[(Long, Long)], iters: Int) = {
    import spark.implicits._
    graft.operators.PageRank
      .hits(edges.toDF("src", "dst"), "src", "dst", iterations = iters)
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
  }

  test("hits: one iteration hand-checked on 1->2, 1->3, 2->3") {
    // auth sums over h0=1: a(2)=1, a(3)=2, max 2 -> a = (0, 0.5, 1.0);
    // hub sums: h(1)=0.5+1.0=1.5, h(2)=1.0, max 1.5 -> h = (1, 2/3, 0).
    val r = runHits(Seq((1L, 2L), (1L, 3L), (2L, 3L)), iters = 1)
    assert(r(1L) == ((1.0, 0.0)))
    assert(r(2L) == ((BigDecimal(2.0 / 3).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble, 0.5)))
    assert(r(3L) == ((0.0, 1.0)))
  }

  test("hits: fixed point structure holds at 4 iterations") {
    val r = runHits(Seq((1L, 2L), (1L, 3L), (2L, 3L)), iters = 4)
    // node 1 stays the top hub, node 3 the top authority, and the
    // source/sink have no authority/hub mass respectively
    assert(r(1L)._1 == 1.0 && r(1L)._2 == 0.0)
    assert(r(3L)._1 == 0.0 && r(3L)._2 == 1.0)
    assert(r(2L)._1 > 0.0 && r(2L)._1 < 1.0)
    assert(r(2L)._2 > 0.0 && r(2L)._2 < 1.0)
  }
}
