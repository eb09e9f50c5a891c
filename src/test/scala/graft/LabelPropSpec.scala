package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LabelProp

/** Deterministic synchronous label propagation: seed immutability,
  * majority vote with min-label ties, round-by-round spread, unreached
  * nodes stay null.
  */
class LabelPropSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], seeds: Seq[(Long, Long)],
                  rounds: Int): Map[Long, (Option[Long], Boolean)] =
    LabelProp.propagate(edges.toDF("src", "dst"), seeds.toDF("id", "lab"),
        "src", "dst", "id", "lab", rounds)
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getBoolean(2)))
      .toMap

  test("labels spread one hop per round along undirected edges") {
    // chain 1-2-3-4, seed at 1.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val r1 = run(edges, Seq((1L, 7L)), rounds = 1)
    assert(r1(2L) == (Some(7L), false))
    assert(r1(3L) == (None, false)) // two hops away, unreached
    val r3 = run(edges, Seq((1L, 7L)), rounds = 3)
    assert(r3(4L) == (Some(7L), false))
    assert(r3(1L) == (Some(7L), true))
  }

  test("majority vote wins; ties break to the smallest label") {
    // node 10 has neighbors: two labeled 5, one labeled 3 -> majority 5.
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L))
    val maj = run(edges, Seq((1L, 5L), (2L, 5L), (3L, 3L)), rounds = 1)
    assert(maj(10L) == (Some(5L), false))
    // 1-1 tie between labels 9 and 4 -> min label 4.
    val tie = run(Seq((1L, 10L), (2L, 10L)), Seq((1L, 9L), (2L, 4L)), rounds = 1)
    assert(tie(10L) == (Some(4L), false))
  }

  test("seeds are immutable even when outvoted by neighbors") {
    // seed 1 has label 0; both neighbors carry label 9.
    val edges = Seq((2L, 1L), (3L, 1L))
    val out = run(edges, Seq((1L, 0L), (2L, 9L), (3L, 9L)), rounds = 2)
    assert(out(1L) == (Some(0L), true))
    // and the seed still propagated its own label outward meanwhile
    assert(out(2L) == (Some(9L), true))
  }

  test("disconnected unlabeled component stays null; isolated seed kept") {
    val edges = Seq((1L, 2L), (5L, 6L))
    val out = run(edges, Seq((1L, 1L), (99L, 2L)), rounds = 3)
    assert(out(5L) == (None, false))
    assert(out(6L) == (None, false))
    assert(out(99L) == (Some(2L), true)) // not in any edge, still reported
  }

  test("a node keeps its adopted label when neighbors go quiet is impossible " +
    "synchronously, but label persists once adopted") {
    // 1(seed)-2: after round 1, 2 has the label; rounds 2..3 keep it even
    // though votes re-confirm; no flip-flop.
    val out = run(Seq((1L, 2L)), Seq((1L, 3L)), rounds = 3)
    assert(out(2L) == (Some(3L), false))
  }
}
