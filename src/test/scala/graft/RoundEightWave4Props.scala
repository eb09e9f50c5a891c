package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.{Classifier, Dedup, EditDistance, KMeans, Profile,
  Search, SketchAudit}

/** Invariants of the round-8 fourth-wave additions under generated inputs. */
object RoundEightWave4Props extends Properties("RoundEightWave4") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkTestBase.spark

  // --- rank / text eval ---------------------------------------------------

  private val permGen: Gen[(List[Int], List[Int])] = for {
    n <- Gen.choose(3, 12)
    a <- Gen.pick(n, 1 to n).map(_.toList)
    b <- Gen.pick(n, 1 to n).map(_.toList)
  } yield (a, b)

  property("rbo is symmetric in its rankings and bounded by 1 - p^k") =
    forAll(permGen) { case (a, b) =>
      import spark.implicits._
      val ranks = a.zip(b).zipWithIndex
        .map { case ((ra, rb), i) => (1L, ra, rb) }
      def run(df: Seq[(Long, Int, Int)]) =
        Search.rbo(df.toDF("qid", "ra", "rb"), "qid", "ra", "rb",
          k = 5, pNum = 9, pDen = 10)
          .collect().headOption.map(_.getDouble(2)).getOrElse(0.0)
      val fwd = run(ranks)
      val rev = run(ranks.map { case (q, ra, rb) => (q, rb, ra) })
      val cap = 1.0 - math.pow(0.9, 5)
      fwd == rev && fwd >= 0.0 && fwd <= cap + 1e-9
    }

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 14)
    ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e"))
  } yield ws.mkString(" ")

  property("rougeN bounds: P/R/F1 in [0,1]; identical texts score 1") =
    forAll(textGen, textGen) { (cand, ref) =>
      import spark.implicits._
      val r = Search.rougeN(Seq((1L, cand, ref)).toDF("id", "c", "r"),
        "id", "c", "r", n = 2).collect()(0)
      val (p, rec, f) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      val bounded = Seq(p, rec, f).forall(x => x >= 0.0 && x <= 1.0)
      val selfOk = cand.split(" ").count(_.nonEmpty) < 2 || {
        val s = Search.rougeN(Seq((1L, cand, cand)).toDF("id", "c", "r"),
          "id", "c", "r", n = 2).collect()(0)
        s.getDouble(4) == 1.0 && s.getDouble(5) == 1.0 && s.getDouble(6) == 1.0
      }
      bounded && selfOk
    }

  // --- set-similarity join ------------------------------------------------

  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(2, 20)
    docs <- Gen.listOfN(n, for {
      m <- Gen.choose(0, 8)
      ws <- Gen.listOfN(m, Gen.oneOf("u", "v", "w", "x", "y", "z"))
    } yield ws.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("prefixFilterJoin equals brute force on random corpora") =
    forAll(corpusGen) { docs =>
      import spark.implicits._
      val got = Dedup
        .prefixFilterJoin(docs.toDF("doc_id", "text"), "text", "doc_id", 1, 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sets = docs.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).toSet }.filter(_._2.nonEmpty)
      val brute = (for {
        (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
        inter = (sa & sb).size
        if inter * 2 >= (sa.size + sb.size - inter) * 1
      } yield (ia, ib)).toSet
      got == brute
    }

  // --- pareto -------------------------------------------------------------

  private val pointsGen: Gen[List[(Double, Long)]] = for {
    n <- Gen.choose(1, 25)
    ps <- Gen.listOfN(n, for {
      q <- Gen.choose(0, 6); l <- Gen.choose(0L, 6L)
    } yield (q.toDouble, l))
  } yield ps

  property("paretoFrontier: sound (undominated) and complete (covers rest)") =
    forAll(pointsGen) { pts =>
      import spark.implicits._
      val got = Profile.paretoFrontier(pts.toDF("q", "l"), "q", "l")
        .collect().map(r => (r.getDouble(0), r.getLong(1))).toSet
      def dominates(a: (Double, Long), b: (Double, Long)) =
        a._1 >= b._1 && a._2 <= b._2 && (a._1 > b._1 || a._2 < b._2)
      val sound = got.forall(f => !pts.exists(p => dominates(p, f)))
      val complete = pts.toSet.forall(p =>
        got.contains(p) || got.exists(f => dominates(f, p)))
      sound && complete
    }

  // --- agreement ----------------------------------------------------------

  private val ratingsGen: Gen[List[(String, String)]] = for {
    n <- Gen.choose(1, 30)
    rs <- Gen.listOfN(n, for {
      a <- Gen.oneOf("x", "y", "z"); b <- Gen.oneOf("x", "y", "z")
    } yield (a, b))
  } yield rs

  property("cohenKappa is symmetric under rater swap and <= 1") =
    forAll(ratingsGen) { rs =>
      import spark.implicits._
      def kappa(d: Seq[(String, String)]) =
        Classifier.cohenKappa(d.toDF("a", "b"), "a", "b")
          .collect()(0).getDouble(3)
      val k1 = kappa(rs)
      val k2 = kappa(rs.map(_.swap))
      k1 == k2 && k1 <= 1.0
    }

  // --- jaro-winkler kernel ------------------------------------------------

  private val wordGen: Gen[String] =
    Gen.choose(0, 10).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  property("jaroWinkler: symmetric, bounded, reflexive") =
    forAll(wordGen, wordGen) { (a, b) =>
      val ab = EditDistance.jaroWinkler(a, b)
      val ba = EditDistance.jaroWinkler(b, a)
      ab == ba && ab >= 0.0 && ab <= 1.0 &&
        EditDistance.jaroWinkler(a, a) == 1.0
    }

  // --- sketches / coresets ------------------------------------------------

  private val keysGen: Gen[List[String]] = for {
    n <- Gen.choose(1, 60)
    ks <- Gen.listOfN(n, Gen.oneOf((1 to 12).map("k" + _)))
  } yield ks

  property("countMinAudit never undercounts, even at width 2") =
    forAll(keysGen) { ks =>
      import spark.implicits._
      SketchAudit.countMinAudit(ks.map(Tuple1(_)).toDF("k"), "k",
          depth = 2, width = 2, topK = 100)
        .collect().forall(r => r.getBoolean(4))
    }

  private val vecsGen: Gen[List[(Long, List[Float])]] = for {
    n <- Gen.choose(1, 12)
    vs <- Gen.listOfN(n, for {
      x <- Gen.choose(-5, 5); y <- Gen.choose(-5, 5)
    } yield List(x.toFloat, y.toFloat))
  } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }

  property("kCenter selection distances are non-increasing; coverage bounded") =
    forAll(vecsGen) { vs =>
      import spark.implicits._
      val k = math.min(4, vs.size)
      val rows = KMeans.kCenter(vs.toDF("vec_id", "embedding"),
          "embedding", "vec_id", k)
        .orderBy(col("rank")).collect()
        .map(r => (r.getDouble(2), r.getDouble(3)))
      val d2s = rows.map(_._1).drop(1) // seed's 0.0 excluded
      val monotone = d2s.isEmpty ||
        d2s.sliding(2).forall(p => p.length < 2 || p(0) >= p(1))
      val coverage = rows.head._2
      monotone && (d2s.isEmpty || coverage <= d2s.last + 1e-9)
    }

  // --- wave 13-19 additions ---------------------------------------------

  private val logGen: Gen[List[(Long, Long, Long, Double, Boolean)]] = for {
    n <- Gen.choose(1, 30)
    ops <- Gen.listOfN(n, for {
      k <- Gen.choose(1L, 5L); ts <- Gen.choose(0L, 50L)
      v <- Gen.choose(0, 100); del <- Gen.oneOf(true, false)
    } yield (k, ts, 0L, v / 10.0, del))
  } yield ops.zipWithIndex.map { case ((k, ts, _, v, d), i) =>
    (k, ts, i.toLong, v, d) }

  property("cdcApply: surviving keys = keys whose LAST op is an upsert") =
    forAll(logGen) { ops =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val got = graft.operators.StateStore.cdcApply(
        ops.toDF("k", "tsu", "id", "value", "del"),
        "k", "tsu", "id", "value", col("del"))
        .collect().map(_.getLong(0)).toSet
      val want = ops.groupBy(_._1).collect {
        case (k, os) if !os.maxBy(o => (o._2, o._3))._5 => k
      }.toSet
      got == want
    }

  private val xyGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 40)
    ps <- Gen.listOfN(n, for {
      x <- Gen.choose(-50L, 50L); y <- Gen.choose(-50L, 50L)
    } yield (x, y))
  } yield ps

  property("pearsonByGroup pooled r is within [-1, 1] or null") =
    forAll(xyGen) { ps =>
      import spark.implicits._
      val rows = ps.map { case (x, y) => ("g", x, y) }
      val got = graft.operators.Profile
        .pearsonByGroup(rows.toDF("g", "x", "y"), "g", "x", "y")
        .collect().filter(_.getString(0) == "<pooled>")
      got.forall(r => r.isNullAt(2) ||
        (r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0))
    }

  private val valsGen: Gen[List[Long]] =
    Gen.choose(9, 60).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 1000L)))

  property("quantileDiff deciles are monotone within each side") =
    forAll(valsGen, valsGen) { (a, b) =>
      import spark.implicits._
      val da = a.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val db = b.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val got = graft.operators.Profile.quantileDiff(
        da.toDF("id", "v"), db.toDF("id", "v"), "v", "id")
        .orderBy(col("q")).collect()
        .map(r => (r.getLong(1), r.getLong(2)))
      got.sliding(2).forall(w => w.length < 2 ||
        (w(0)._1 <= w(1)._1 && w(0)._2 <= w(1)._2))
    }

  property("targetEncodeLoo stays within the target's [min, max] range") =
    forAll(xyGen) { ps =>
      import spark.implicits._
      val rows = ps.zipWithIndex.map { case ((x, y), i) =>
        (i.toLong, s"c${x % 3}", y.max(0L)) }
      val ys = rows.map(_._3)
      val got = graft.operators.Classifier
        .targetEncodeLoo(rows.toDF("id", "cat", "y"), "id", "cat", "y", m = 3)
        .collect().map(_.getDouble(3))
      got.forall(e => e >= ys.min - 1e-6 && e <= ys.max + 1e-6)
    }
}
