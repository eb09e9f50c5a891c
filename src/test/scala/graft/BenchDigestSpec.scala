package graft

import org.scalatest.funsuite.AnyFunSuite

/** Digest-stability rules in `Bench.normalizePlan` / `Bench.canonicalizePlan`
  * — each case replays one measured unchanged-code flap class from the r12
  * driver rerun (17 of 18 digest changes were placement noise).
  */
class BenchDigestSpec extends AnyFunSuite {

  test("normalizePlan: truncated scan-filter lists clip to a stable prefix") {
    // Spark truncates the field at a RAW char budget; raw expression-id
    // widths (ts#123 vs ts#1234) shift the visible cut by a char or two.
    // The clip keeps a fixed normalized prefix (pushdown evidence stays
    // legible in the committed plan) and cuts the run-varying tail.
    val head = "isnotnull(a#N), isnotnull(b#N), (a#N >= 12345), (b#N < 99)"
    val a = s"+- FileScan parquet [x#N] DataFilters: [$head AND (cast(ts#N as ..., Format: Parquet, PushedFilters: [IsNotNull(ts)]"
    val b = s"+- FileScan parquet [x#N] DataFilters: [$head AND (cast(ts#N a..., Format: Parquet, PushedFilters: [IsNotNull(ts)]"
    val na = Bench.normalizePlan(a)
    assert(na == Bench.normalizePlan(b))
    assert(na.contains("DataFilters: [isnotnull(a#N), isnotnull(b#N),"),
      s"pushdown evidence prefix lost: $na")
    // An UNtruncated list is left alone — it is a real plan signal.
    val c = "DataFilters: [isnotnull(ts#N)], Format: Parquet"
    assert(Bench.normalizePlan(c).contains("[isnotnull(ts#N)]"))
  }

  test("normalizePlan: long integer-list literals collapse, short ones stay") {
    val longA = "element_at(map(keys: [0,5,10,14,1,6,9,13], values: [0,782,1566,2186,158,938,1409,2030]), p)"
    val longB = "element_at(map(keys: [0,5,10,14,1,6,9,13], values: [0,785,1565,2184,160,940,1408,2031]), p)"
    assert(Bench.normalizePlan(longA) == Bench.normalizePlan(longB))
    assert(Bench.normalizePlan("slice(v, [1,2,3], x)").contains("[1,2,3]"))
  }

  test("canonicalizePlan: exchange reuse-site swaps and build sides are placement") {
    // Version A: site 1 prints the full exchange subtree, site 2 reuses
    // it; the broadcast key ordinal (input[0] vs input[2]) follows the
    // build side (the r13 span_dedup_clean flap).
    val a =
      """Join Inner, BuildLeft
        |:- BroadcastExchange HashedRelationBroadcastMode(List(input[0, string, true]),false), [plan_id=N]
        |:  +- Project [a#N]
        |:     +- FileScan parquet [a#N]
        |+- ReusedExchange [b#N], BroadcastExchange HashedRelationBroadcastMode(List(input[0, string, true]),false), [plan_id=N]""".stripMargin
    // Version B: the reuse flipped sites (and the build side flipped).
    val b =
      """Join Inner, BuildRight
        |:- ReusedExchange [a#N], BroadcastExchange HashedRelationBroadcastMode(List(input[2, string, true]),false), [plan_id=N]
        |+- BroadcastExchange HashedRelationBroadcastMode(List(input[2, string, true]),false), [plan_id=N]
        |   +- Project [a#N]
        |      +- FileScan parquet [a#N]""".stripMargin
    assert(Bench.canonicalizePlan(a) == Bench.canonicalizePlan(b))
    // A different broadcast-key TYPE is a real change, ordinal or not.
    val bLong = b.replace("input[2, string, true]", "input[2, bigint, true]")
    assert(Bench.canonicalizePlan(b) != Bench.canonicalizePlan(bLong))
    // A REAL node change must still flip the canonical form.
    val c = b.replace("FileScan parquet [a#N]", "FileScan parquet [a#N,c#N]")
    assert(Bench.canonicalizePlan(b) != Bench.canonicalizePlan(c))
  }

  test("canonicalizePlan: distinct-aggregate key order and gid numbering " +
      "are expression-id noise") {
    val a = "HashAggregate(keys=[d#N, p#N, q#N, gid#N], functions=[count(x#N) FILTER (WHERE (gid#N = 1)), sum(y#N) FILTER (WHERE (gid#N = 2))], output=[q#N, d#N])"
    val b = "HashAggregate(keys=[p#N, q#N, d#N, gid#N], functions=[sum(y#N) FILTER (WHERE (gid#N = 1)), count(x#N) FILTER (WHERE (gid#N = 3))], output=[d#N, q#N])"
    assert(Bench.canonicalizePlan(a) == Bench.canonicalizePlan(b))
    // Different FUNCTION content is a real change.
    val c = b.replace("sum(y#N)", "sum(z#N)")
    assert(Bench.canonicalizePlan(b) != Bench.canonicalizePlan(c))
    // Nested brackets survive the top-level sort.
    assert(Bench.canonicalizePlan("Exchange hashpartitioning(f(a#N, b#N), 32)")
      == Bench.canonicalizePlan("Exchange hashpartitioning(32, f(a#N, b#N))"))
  }

  test("canonicalizePlan: AQE logical wrappers and Expand projections collapse") {
    assert(Bench.canonicalizePlan("LogicalQueryStage Aggregate [s#N], BroadcastQueryStage N")
      == Bench.canonicalizePlan("LogicalQueryStage LogicalQueryStage Aggregate [s#N], HashAggregate(keys=[s#N], functions=[]), BroadcastQueryStage N"))
    assert(Bench.canonicalizePlan("Expand [[null, a#N, 0], [b#N, null, 1]], [x#N]")
      == Bench.canonicalizePlan("Expand [[b#N, null, 1], [null, a#N, 0]], [x#N]"))
  }
}
