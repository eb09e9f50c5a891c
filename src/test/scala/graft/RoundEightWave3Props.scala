package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.operators.{Components, Graph, Profile, Sampling}

/** Invariants of the round-8 third-wave additions under generated inputs. */
object RoundEightWave3Props extends Properties("RoundEightWave3") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkTestBase.spark

  // --- graphs -------------------------------------------------------------

  private val edgeGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 16)
    m <- Gen.choose(1, 40)
    es <- Gen.listOfN(m, for {
      a <- Gen.choose(1L, n.toLong); b <- Gen.choose(1L, n.toLong)
    } yield (a, b))
  } yield es

  private def undirect(es: Seq[(Long, Long)]): Set[(Long, Long)] =
    es.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet

  property("triangleCounts matches brute force on random graphs") =
    forAll(edgeGen) { es =>
      import spark.implicits._
      val und = undirect(es)
      val got = Graph.triangleCounts(es.toDF("s", "d"), "s", "d")
        .collect().map(r => r.getAs[Long]("id") ->
          ((r.getAs[Long]("degree"), r.getAs[Long]("triangles")))).toMap
      val nodes = und.flatMap { case (a, b) => Seq(a, b) }
      val brute = nodes.map { v =>
        val nb = und.collect { case (a, b) if a == v => b
                               case (a, b) if b == v => a }.toSeq
        val tri = (for {
          i <- nb.indices; j <- (i + 1) until nb.size
          if und.contains((math.min(nb(i), nb(j)), math.max(nb(i), nb(j))))
        } yield 1).size.toLong
        v -> ((nb.size.toLong, tri))
      }.toMap
      got == brute
    }

  property("kCore at saturation rounds equals the local peel fixpoint") =
    forAll(edgeGen, Gen.choose(2, 3)) { (es, k) =>
      import spark.implicits._
      var und = undirect(es)
      var changed = true
      while (changed) { // local fixpoint peel
        val deg = und.toSeq.flatMap { case (a, b) => Seq(a, b) }
          .groupBy(identity).view.mapValues(_.size).toMap
        val bad = deg.filter(_._2 < k).keySet
        val next = und.filter { case (a, b) => !bad(a) && !bad(b) }
        changed = next != und
        und = next
      }
      val expect = und.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      // 16 nodes peel in at most 16 rounds
      val got = Graph.kCore(es.toDF("s", "d"), "s", "d", k, rounds = 16)
        .collect().map(r => r.getAs[Long]("id") ->
          r.getAs[Long]("core_degree")).toMap
      got == expect
    }

  property("incrementalComponents equals full recompute on random splits") =
    forAll(edgeGen, Gen.choose(0, 100)) { (es, cut) =>
      import spark.implicits._
      val (old, batch) = es.splitAt(es.length * cut / 100)
      (old.nonEmpty && batch.nonEmpty) ==> {
        val prev = Components.connectedComponents(old.toDF("a", "b"), "a", "b")
        val inc = Components
          .incrementalComponents(prev, batch.toDF("a", "b"), "a", "b")
          .collect().map(r => r.getAs[Long]("id") ->
            r.getAs[Long]("component")).toMap
        val full = Components.connectedComponents(es.toDF("a", "b"), "a", "b")
          .collect().map(r => r.getAs[Long]("id") ->
            r.getAs[Long]("component")).toMap
        inc == full
      }
    }

  // --- sampling -----------------------------------------------------------

  private val weightedGen = for {
    n <- Gen.choose(1, 40)
    ws <- Gen.listOfN(n, Gen.choose(-2L, 500L))
  } yield ws.zipWithIndex.map { case (w, i) => (i.toLong, w.toDouble) }

  property("weightedSample: subset, eligible-clipped size, repartition-stable") =
    forAll(weightedGen, Gen.choose(1, 20)) { (rows, k) =>
      import spark.implicits._
      val df = rows.toDF("id", "w")
      val got = Sampling.weightedSample(df, "id", "w", k)
        .collect().map(_.getAs[Long]("id")).toSet
      val eligible = rows.filter(_._2 > 0).map(_._1).toSet
      val again = Sampling.weightedSample(df.repartition(5), "id", "w", k)
        .collect().map(_.getAs[Long]("id")).toSet
      got.subsetOf(eligible) &&
        got.size == math.min(k, eligible.size) &&
        got == again
    }

  property("groupReservoir: exactly min(k, |group|) per group, a subset") =
    forAll(Gen.choose(1, 60), Gen.choose(1, 7)) { (n, k) =>
      import spark.implicits._
      val rows = (1L to n.toLong).map(i => (s"g${i % 4}", i))
      val out = Sampling.groupReservoir(rows.toDF("g", "id"), "g", "id", k)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val bySize = rows.groupBy(_._1).view.mapValues(_.size).toMap
      val gotBy = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      bySize.forall { case (g, sz) =>
        gotBy.getOrElse(g, Set.empty).size == math.min(k, sz)
      } && out.toSet.subsetOf(rows.toSet)
    }

  property("rankBuckets: floor(pos*b/n) against the local sort") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 50L)), Gen.choose(1, 12)) {
      (vs, b) =>
        import spark.implicits._
        val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        val got = Sampling.rankBuckets(rows.toDF("id", "v"), "v", "id", b)
          .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("bucket"))
          .toMap
        val expect = rows.sortBy { case (i, v) => (v, i) }.zipWithIndex
          .map { case ((i, _), p) => i -> (p * b / rows.size) }.toMap
        got == expect
    }

  // --- audits -------------------------------------------------------------

  property("luhnValid agrees with a local mod-10 fold") =
    forAll(Gen.listOf(Gen.oneOf(('0' to '9') ++ Seq(' ', '-'))).map(_.mkString)) {
      s =>
        import spark.implicits._
        val digits = s.filter(_.isDigit)
        val local = digits.length >= 12 && {
          val sum = digits.reverse.zipWithIndex.map { case (c, i) =>
            val v = c - '0'
            if (i % 2 == 1) { val d = v * 2; if (d > 9) d - 9 else d } else v
          }.sum
          sum % 10 == 0
        }
        val got = Seq(Tuple1(s)).toDF("s")
          .select(graft.functions.TextFunctions.luhnValid(col("s")))
          .collect()(0).getBoolean(0)
        got == local
    }

  private val catGen = for {
    n <- Gen.choose(1, 50)
    rows <- Gen.listOfN(n, for {
      a <- Gen.oneOf("x", "y", "z"); b <- Gen.oneOf("p", "q")
    } yield (a, b))
  } yield rows

  property("mutualInformation: symmetric, bounded by min entropy, nonnegative") =
    forAll(catGen) { rows =>
      import spark.implicits._
      val df = rows.toDF("a", "b")
      val r = Profile.mutualInformation(df, "a", "b").collect()(0)
      val rSwap = Profile.mutualInformation(df, "b", "a").collect()(0)
      val mi = r.getAs[Double]("mi_nats")
      val hMin = math.min(r.getAs[Double]("h_a"), r.getAs[Double]("h_b"))
      mi >= -1e-6 && mi <= hMin + 1e-6 &&
        math.abs(mi - rSwap.getAs[Double]("mi_nats")) <= 2e-6 &&
        r.getAs[Long]("n_rows") == rows.size.toLong
    }

  property("vocabCoverage: monotone in k, bounded, conserves totals") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf("a b c", "a a", "d e f g", "a"))) {
      texts =>
        import spark.implicits._
        val df = texts.map(Tuple1(_)).toDF("text")
        val out = Profile.vocabCoverage(df, "text", ks = Seq(1, 3, 100))
          .collect().map(r => r.getAs[Long]("k") ->
            ((r.getAs[Double]("coverage"), r.getAs[Long]("covered_tokens"),
              r.getAs[Long]("total_tokens")))).toMap
        val cs = Seq(1L, 3L, 100L).map(out(_))
        cs.zip(cs.drop(1)).forall { case ((c1, t1, _), (c2, t2, _)) =>
          c1 <= c2 + 1e-9 && t1 <= t2 } &&
          cs.forall { case (c, cov, tot) => c <= 1.0 && cov <= tot } &&
          out(100L)._1 == 1.0 // k beyond vocab covers everything
    }
}
