package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Triangle counting + clustering coefficients: hand-checked closed forms
  * on K3/K4/stars, canonicalization rules, and a brute-force cross-check
  * on a pseudo-random graph (the same degree-ordered result must match the
  * O(n^3) enumeration).
  */
class GraphSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] =
    Graph.triangleCounts(edges.toDF("s", "d"), "s", "d")
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("triangles"),
          r.getAs[Double]("clustering"))))
      .toMap

  test("triangle: every node has 1 triangle, clustering 1.0") {
    val r = counts(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(r.keySet == Set(1L, 2L, 3L))
    assert(r.values.toSet == Set((2L, 1L, 1.0)))
  }

  test("K4: 4 triangles total, 3 per node, clustering 1.0") {
    val e = for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a, b)
    val r = counts(e)
    assert(r.values.toSet == Set((3L, 3L, 1.0)))
  }

  test("star has no triangles; hub clustering is 0") {
    val r = counts(Seq((1L, 2L), (1L, 3L), (1L, 4L)))
    assert(r(1L) == ((3L, 0L, 0.0)))
    assert(r(2L) == ((1L, 0L, 0.0)))
  }

  test("self-loops, duplicates, and reversed duplicates are canonicalized") {
    // {1,2},{2,3},{1,3} once each after cleanup -> one triangle.
    val r = counts(Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 1L),
      (1L, 3L), (3L, 3L)))
    assert(r.values.toSet == Set((2L, 1L, 1.0)))
  }

  test("square (4-cycle): wedges but no triangles") {
    val r = counts(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(r.values.map(_._2).toSet == Set(0L))
  }

  test("matches brute-force enumeration on a pseudo-random graph") {
    // Deterministic LCG edge set over 30 nodes.
    var x = 12345L
    def nxt(): Long = { x = (x * 1103515245L + 12347L) % 2147483647L; x }
    val edges = (1 to 160).map { _ =>
      ((nxt() % 30 + 1), (nxt() % 30 + 1))
    }
    val und = edges.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = und.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val brute = nodes.map { v =>
      val nbrs = und.collect {
        case (a, b) if a == v => b
        case (a, b) if b == v => a
      }.toSeq
      val tri = (for {
        i <- nbrs.indices; j <- (i + 1) until nbrs.size
        if und.contains((math.min(nbrs(i), nbrs(j)), math.max(nbrs(i), nbrs(j))))
      } yield 1).size.toLong
      v -> ((nbrs.size.toLong, tri))
    }.toMap
    val r = counts(edges)
    assert(r.keySet == brute.keySet)
    brute.foreach { case (v, (d, tr)) =>
      assert(r(v)._1 == d, s"degree of $v")
      assert(r(v)._2 == tr, s"triangles of $v")
      val expC = if (d > 1)
        BigDecimal(2.0 * tr / (d * (d - 1.0)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      else 0.0
      assert(r(v)._3 == expC, s"clustering of $v")
    }
  }

  test("kCore: tendrils peel, core survives, convergence probe") {
    import spark.implicits._
    // triangle {1,2,3} with a chain 3-4-5-6 hanging off it
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 6L)).toDF("s", "d")
    def core(rounds: Int): Map[Long, Long] =
      graft.operators.Graph.kCore(edges, "s", "d", k = 2, rounds = rounds)
        .collect().map(r => r.getAs[Long]("id") ->
          r.getAs[Long]("core_degree")).toMap
    // round 1 peels 6; round 2 peels 5; round 3 peels 4 -> pure triangle
    assert(core(3) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // converged: one more round changes nothing (the fixpoint probe)
    assert(core(4) == core(3))
    // partial peel is a defined intermediate state
    assert(core(1).keySet == Set(1L, 2L, 3L, 4L, 5L))
    // k above the max degree empties the graph
    assert(graft.operators.Graph.kCore(edges, "s", "d", k = 4, rounds = 2)
      .count() == 0)
  }

  test("anchorTexts: sorted distinct anchors, cap, counts, null targets") {
    import spark.implicits._
    val links = Seq(
      ("u1", "buy now", 1L), ("u1", "acme corp", 2L), ("u1", "buy now", 3L),
      ("u2", "z", 1L), ("u2", "y", 1L), ("u2", "x", 1L),
      (null.asInstanceOf[String], "dropped", 9L)
    ).toDF("href", "anchor", "src")
    val r = graft.operators.Graph
      .anchorTexts(links, "href", "anchor", "src", maxAnchors = 2)
      .collect().map(x => x.getAs[String]("target") ->
        ((x.getAs[Long]("n_links"), x.getAs[Long]("n_sources"),
          x.getAs[String]("anchors")))).toMap
    assert(r.keySet == Set("u1", "u2"))
    // distinct anchors sorted, duplicate "buy now" collapsed
    assert(r("u1") == ((3L, 3L, "acme corp | buy now")))
    // cap cuts AFTER the sort: x,y survive, z dropped
    assert(r("u2") == ((3L, 1L, "x | y")))
  }

  test("summary: transitivity on the paw graph (triangle + pendant)") {
    // {1,2,3} triangle, 3-4 pendant. Wedges: d(3)=3 -> C(3,2)=3, others 1+1+0.
    // closed = 3*1 = 3, total wedges = 5 -> transitivity 0.6.
    val r = Graph.triangleSummary(
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("s", "d"), "s", "d")
      .collect().head
    assert(r.getAs[Long]("n_nodes") == 4L)
    assert(r.getAs[Long]("n_edges") == 4L)
    assert(r.getAs[Long]("n_triangles") == 1L)
    assert(r.getAs[Double]("global_clustering") == 0.6)
  }

  test("healthStats: reciprocity and assortativity on a hand graph") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    // edges: 1->2, 2->1 (reciprocal pair), 1->3. degrees (total): 1:3,
    // 2:2, 3:1. reciprocity = 2/3.
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 2L)).toDF("src", "dst")
    val r = graft.operators.Graph.healthStats(e, "src", "dst").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 3L, 2L)))
    assert(r.getDouble(3) == 0.666667)
    // assortativity: edge endpoint degrees (3,2),(2,3),(3,1) — computable
    // and finite; just pin the sign (hub links to leaf -> negative)
    assert(!r.isNullAt(4) && r.getDouble(4) < 0)
    // star graph: all sources degree 1... constant x -> null
    val star = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst")
    val r2 = graft.operators.Graph.healthStats(star, "src", "dst")
      .collect()(0)
    assert(r2.isNullAt(4) && r2.getDouble(3) == 0.0)
  }
}
