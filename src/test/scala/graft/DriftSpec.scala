package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Drift

/** Token-distribution JSD: hand-computed divergence, the 0 and ln2 bounds,
  * symmetry, and empty-corpus degradation.
  */
class DriftSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def drift(p: Seq[String], q: Seq[String]) =
    Drift.tokenDistributionDrift(
      p.map(Tuple1(_)).toDF("text"), q.map(Tuple1(_)).toDF("text"))
      .collect()(0)

  test("hand-computed JSD on a two-token mix") {
    // p: a=3/4, b=1/4; q: a=1/4, b=3/4 -> m: a=b=1/2.
    // jsd = 0.5*(0.75 ln 1.5 + 0.25 ln 0.5) + same by symmetry
    //     = 0.75 ln 1.5 + 0.25 ln 0.5
    val row = drift(Seq("a a a b"), Seq("a b b b"))
    val expect = 0.75 * math.log(1.5) + 0.25 * math.log(0.5)
    assert(math.abs(row.getAs[Double]("jsd_nats") - r6(expect)) < 2e-6)
    assert(row.getAs[Long]("vocab_p") == 2 && row.getAs[Long]("vocab_q") == 2)
    assert(row.getAs[Long]("vocab_shared") == 2)
    assert(row.getAs[Long]("total_p") == 4 && row.getAs[Long]("total_q") == 4)
  }

  test("identical distributions score 0; disjoint vocabularies score ln 2") {
    val same = drift(Seq("x y z x"), Seq("x x y z"))
    assert(same.getAs[Double]("jsd_nats") == 0.0)
    val disjoint = drift(Seq("a b c"), Seq("d e f"))
    assert(math.abs(disjoint.getAs[Double]("jsd_nats") - r6(math.log(2))) < 2e-6)
    assert(math.abs(disjoint.getAs[Double]("jsd_bits") - 1.0) < 2e-6)
    assert(disjoint.getAs[Long]("vocab_shared") == 0)
  }

  test("JSD is symmetric") {
    val ab = drift(Seq("a a b c"), Seq("b c c d"))
    val ba = drift(Seq("b c c d"), Seq("a a b c"))
    assert(ab.getAs[Double]("jsd_nats") == ba.getAs[Double]("jsd_nats"))
  }

  test("an empty corpus degrades to zero totals, not NaN") {
    val row = drift(Seq("a b"), Seq.empty)
    assert(!row.getAs[Double]("jsd_nats").isNaN)
    assert(row.getAs[Long]("total_q") == 0)
    assert(row.getAs[Long]("vocab_q") == 0)
    val both = drift(Seq.empty, Seq.empty)
    assert(both.getAs[Double]("jsd_nats") == 0.0)
    assert(both.getAs[Long]("total_p") == 0)
  }

  private def ks(p: Seq[Long], q: Seq[Long]) =
    Drift.ksDistance(
      p.map(Tuple1(_)).toDF("len"), q.map(Tuple1(_)).toDF("len"), "len")
      .collect()(0)

  test("ksDistance: hand-computed max ECDF gap with its location") {
    // p = {1,2,3,4}, q = {3,4,5,6}: ECDF gap peaks at v=2 (0.5 - 0.0).
    val row = ks(Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L, 6L))
    assert(row.getAs[Double]("ks") == 0.5)
    assert(row.getAs[Long]("ks_at") == 2L)
    assert(row.getAs[Long]("n_p") == 4 && row.getAs[Long]("n_q") == 4)
  }

  test("ksDistance: identical samples give 0; disjoint ranges give 1") {
    assert(ks(Seq(5L, 7L, 9L), Seq(5L, 7L, 9L)).getAs[Double]("ks") == 0.0)
    val far = ks(Seq(1L, 2L), Seq(10L, 20L))
    assert(far.getAs[Double]("ks") == 1.0)
    assert(far.getAs[Long]("ks_at") == 2L)  // gap saturates at p's max
  }

  test("ksDistance: tie on the max gap resolves to the smallest value") {
    // p={1}, q={2}: gap 1.0 at v=1; both rows v=1 and nothing smaller.
    // p={1,3}, q={2,4}: gaps 0.5 at v=1,2,3 -> argmax reported at v=1.
    val row = ks(Seq(1L, 3L), Seq(2L, 4L))
    assert(row.getAs[Double]("ks") == 0.5)
    assert(row.getAs[Long]("ks_at") == 1L)
  }

  test("ksDistance: one empty side reads 1.0 with a zero total as the audit") {
    val row = ks(Seq(3L, 4L), Seq.empty)
    assert(row.getAs[Double]("ks") == 1.0)
    assert(row.getAs[Long]("n_q") == 0)
  }

  test("dispersion: hand-computed mean/variance/fano, single-point guard") {
    import spark.implicits._
    // a: 2,4,6 -> mean 4, var = (3*56-144)/6 = 4, fano = 1
    // b: constant 5,5 -> var 0, fano 0
    // c: single point -> variance/fano 0 by guard
    val s = Seq(("a", 2L), ("a", 4L), ("a", 6L),
      ("b", 5L), ("b", 5L), ("c", 9L)).toDF("k", "x")
    val out = graft.operators.Drift.dispersion(s, "k", "x")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("a") == ((3L, 4.0, 4.0, 1.0)))
    assert(out("b") == ((2L, 5.0, 0.0, 0.0)))
    assert(out("c") == ((1L, 9.0, 0.0, 0.0)))
  }

  test("cusumChangepoint: step series pinpoints the shift, flat series ties to first") {
    import spark.implicits._
    // key a: 10,10,10,50,50 — mean 26; n*S_t = 5*cum - t*130:
    // t=1: 50-130=-80; t=2: -160; t=3: -240 (min, |.|max); t=4: -120; t=5: 0.
    // key b: flat 7s — every n*S_t = 0, tie -> earliest t.
    val s = Seq(
      ("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 10L), ("a", 4L, 50L), ("a", 5L, 50L),
      ("b", 1L, 7L), ("b", 2L, 7L)
    ).toDF("k", "t", "x")
    val out = graft.operators.Drift.cusumChangepoint(s, "k", "t", "x")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("a") == ((3L, -240L, 5L))) // shift right after t=3, upward (negative stat)
    assert(out("b") == ((1L, 0L, 2L)))
  }

  test("psi: hand-computed Laplace-smoothed terms, clamping, total") {
    // bins=2 over [0,2): ref 5 low/15 high, cur 15 low/5 high; the
    // clamped outliers (-5 -> bin 0, 99 -> bin 1) replace two in-range
    // values, nulls drop. Smoothed p0_ref=6/22, p0_cur=16/22 (symmetric).
    val ref = (Seq.fill(4)(0.5) ++ Seq(-5.0) ++ Seq.fill(15)(1.5))
      .map(Option(_)) ++ Seq(None)
    val cur = (Seq.fill(15)(0.5) ++ Seq.fill(4)(1.5) ++ Seq(99.0))
      .map(Option(_))
    val got = Drift.psi(ref.toDF("v"), cur.toDF("v"), "v",
      bins = 2, lo = 0.0, hi = 2.0)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    val term = BigDecimal((6.0 / 22 - 16.0 / 22) *
      math.log((6.0 / 22) / (16.0 / 22)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val total = BigDecimal(term * 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq((0L, 5L, 15L, term, total),
      (1L, 15L, 5L, term, total)))
  }

  test("psi: empty bins stay finite and present via Laplace smoothing") {
    val ref = Seq(0.5, 0.5, 2.5).toDF("v")
    val cur = Seq(2.5, 2.5, 2.5).toDF("v")
    val got = Drift.psi(ref, cur, "v", bins = 3, lo = 0.0, hi = 3.0)
      .orderBy("bin").collect()
    assert(got.length == 3) // bin 1 occupied by neither side, still a row
    assert(got.forall(r => !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
    assert(got.map(r => r.getLong(1)).toSeq == Seq(2L, 0L, 1L))
    intercept[IllegalArgumentException] {
      Drift.psi(ref, cur, "v", bins = 1, lo = 0.0, hi = 1.0)
    }
    intercept[IllegalArgumentException] {
      Drift.psi(ref, cur, "v", bins = 2, lo = 1.0, hi = 1.0)
    }
  }

  test("embeddingDrift: orthogonal/parallel means, norm ratio, zero guard") {
    val a = Seq((1L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val b = Seq((2L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val r1 = Drift.embeddingDrift(a, b, "embedding").collect()(0)
    assert((r1.getLong(0), r1.getLong(1), r1.getDouble(2)) == ((1L, 1L, 0.0)))
    val b2 = Seq((2L, Seq(1f, 0f)), (3L, Seq(1f, 0f)))
      .toDF("vec_id", "embedding")
    val r2 = Drift.embeddingDrift(a, b2, "embedding").collect()(0)
    // parallel means -> cosine 1; |mean_a| = |mean_b| = 1 -> ratio 1
    assert(r2.getDouble(2) == 1.0 && r2.getDouble(3) == 1.0)
    val z = Seq((9L, Seq(0f, 0f))).toDF("vec_id", "embedding")
    val r3 = Drift.embeddingDrift(a, z, "embedding").collect()(0)
    assert(r3.isNullAt(2) && r3.isNullAt(3))
  }

  test("fightinWords: the over-represented term gets the positive z") {
    val a = Seq.fill(20)(Tuple1("alpha beta")).toDF("text")
    val b = (Seq.fill(20)(Tuple1("gamma beta"))).toDF("text")
    val got = Drift.fightinWords(a, b, "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    assert(got("alpha")._3 > 0 && got("gamma")._3 < 0)
    // shared term with identical counts scores exactly symmetric-zero
    assert(got("beta")._1 == got("beta")._2 && math.abs(got("beta")._3) < 1e-9)
    // sign antisymmetry under corpus swap
    val swapped = Drift.fightinWords(b, a, "text")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    got.foreach { case (t, (_, _, z)) =>
      assert(math.abs(swapped(t) + z) < 1e-9, s"$t not antisymmetric") }
    intercept[IllegalArgumentException] {
      Drift.fightinWords(a, b, "text", alpha0 = 0.0)
    }
  }
}
