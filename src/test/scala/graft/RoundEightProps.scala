package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.{Drift, EventAnalytics, LabelProp, Multimodal,
  Profile, Sampling, SequencePack, SketchAudit}

/** Invariants of the round-8 additions under generated inputs. */
object RoundEightProps extends Properties("RoundEight") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkTestBase.spark

  // --- curriculum order ---------------------------------------------------

  private val docGen = for {
    n <- Gen.choose(1, 30)
    rows <- Gen.listOfN(n, for {
      s <- Gen.oneOf("a", "b", "c")
      d <- Gen.choose(0L, 5L) // coarse -> ties exercised
    } yield (s, d))
  } yield rows.zipWithIndex.map { case ((s, d), i) => (i.toLong, s, d) }

  property("curriculumOrder positions are a permutation of 0..n-1") =
    forAll(docGen) { rows =>
      import spark.implicits._
      val out = Sampling.curriculumOrder(
          rows.toDF("id", "src", "diff"), "src", "diff", "id")
        .collect().map(_.getAs[Long]("curriculum_pos")).sorted.toSeq
      out == (0L until rows.length.toLong)
    }

  property("curriculumOrder: within a stratum, difficulty is non-decreasing in rank") =
    forAll(docGen) { rows =>
      import spark.implicits._
      val out = Sampling.curriculumOrder(
          rows.toDF("id", "src", "diff"), "src", "diff", "id")
        .collect().map(r => (r.getAs[String]("src"), r.getAs[Long]("stratum_rank"),
          r.getAs[Long]("diff")))
      out.groupBy(_._1).values.forall { g =>
        val byRank = g.sortBy(_._2).map(_._3)
        byRank.zip(byRank.drop(1)).forall { case (a, b) => a <= b }
      }
    }

  // --- padding waste ------------------------------------------------------

  // waste hits exactly 1.0 when a bucket holds only zero-token docs
  // (they pay a fully-padded row) — hence the closed upper bound.
  property("paddingWasteReport conserves docs and tokens; waste in [0,1]") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 300L)), Gen.choose(1L, 64L)) {
      (toks, w) =>
        import spark.implicits._
        val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("id", "ntok")
        val out = SequencePack.paddingWasteReport(df, "ntok", w).collect()
        val nDocs = out.map(_.getAs[Long]("n_docs")).sum
        val total = out.map(_.getAs[Long]("total_tokens")).sum
        nDocs == toks.length.toLong && total == toks.sum &&
          out.forall { r =>
            val wr = r.getAs[Double]("waste_ratio")
            wr >= 0.0 && wr <= 1.0 &&
              r.getAs[Long]("padded_tokens") >= r.getAs[Long]("total_tokens") &&
              r.getAs[Long]("bucket_max") % w == 0
          }
    }

  // --- label propagation --------------------------------------------------

  private val graphGen = for {
    nNodes <- Gen.choose(2, 15)
    nEdges <- Gen.choose(1, 25)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0L, nNodes.toLong - 1)
      b <- Gen.choose(0L, nNodes.toLong - 1)
    } yield (a, b))
    nSeeds <- Gen.choose(1, nNodes)
    seeds <- Gen.listOfN(nSeeds, for {
      id <- Gen.choose(0L, nNodes.toLong - 1)
      lab <- Gen.choose(0L, 3L)
    } yield (id, lab))
  } yield (edges, seeds.distinctBy(_._1))

  property("propagate: every non-null label comes from the seed label set; " +
    "seeded nodes always report their own seed") =
    forAll(graphGen, Gen.choose(1, 3)) { case ((edges, seeds), rounds) =>
      import spark.implicits._
      val out = LabelProp.propagate(edges.toDF("src", "dst"),
          seeds.toDF("id", "lab"), "src", "dst", "id", "lab", rounds)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(2)))
      val seedMap = seeds.toMap
      val labelSet = seeds.map(_._2).toSet
      out.forall { case (id, lab, seeded) =>
        lab.forall(labelSet.contains) &&
          (seedMap.get(id) match {
            case Some(sl) => seeded && lab.contains(sl)
            case None     => !seeded
          })
      }
    }

  property("propagate is monotone in reach: labels only appear, never vanish") =
    forAll(graphGen) { case (edges, seeds) =>
      import spark.implicits._
      def labeled(rounds: Int): Set[Long] =
        LabelProp.propagate(edges.toDF("src", "dst"), seeds.toDF("id", "lab"),
            "src", "dst", "id", "lab", rounds)
          .collect().filter(!_.isNullAt(1)).map(_.getLong(0)).toSet
      labeled(1).subsetOf(labeled(2))
    }

  // --- sketch audits ------------------------------------------------------

  // --- funnel / cohort ----------------------------------------------------

  private val eventGen = Gen.nonEmptyListOf(for {
    u <- Gen.choose(1L, 6L)
    t <- Gen.oneOf("a", "b", "c")
    ts <- Gen.choose(0L, 100L)
  } yield (u, t, ts))

  property("funnel counts are monotone non-increasing down the stages") =
    forAll(eventGen) { evs =>
      import spark.implicits._
      val out = EventAnalytics.funnel(evs.toDF("user_id", "event_type", "ts"),
          "user_id", "event_type", "ts", Seq("a", "b", "c"))
        .orderBy("stage_index").collect().map(_.getAs[Long]("n_users")).toSeq
      out.zip(out.drop(1)).forall { case (hi, lo) => lo <= hi }
    }

  property("cohortRetention: offset-0 count equals the number of distinct users") =
    forAll(eventGen) { evs =>
      import spark.implicits._
      val df = evs.map { case (u, _, ts) => (u, ts * 86400000000L / 4) }
        .toDF("user_id", "ts")
      val out = EventAnalytics.cohortRetention(df, "user_id", "ts", 30)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // every user appears exactly once at their own cohort's offset 0
      out.filter(_._2 == 0L).map(_._3).sum == evs.map(_._1).distinct.size.toLong
    }

  // --- dispersion / gini / class balance ---------------------------------

  property("dispersion: variance non-negative; constant series has fano 0") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 50L)), Gen.choose(1L, 9L)) {
      (xs, c) =>
        import spark.implicits._
        val mixed = xs.map(("v", _)) ++ List.fill(3)(("k", c))
        val out = Drift.dispersion(mixed.toDF("k", "x"), "k", "x")
          .collect().map(r => r.getString(0) ->
            ((r.getDouble(3), r.getDouble(4)))).toMap
        out("k") == ((0.0, 0.0)) && out("v")._1 >= 0.0
    }

  property("gini is in [0, 1) and 0 for a uniform distribution") =
    forAll(Gen.nonEmptyListOf(Gen.choose(1L, 100L)), Gen.choose(1L, 50L),
      Gen.choose(2, 8)) { (ws, u, k) =>
      import spark.implicits._
      val g = Profile.giniConcentration(ws.toDF("w"), "w")
        .collect()(0).getDouble(2)
      val uni = Profile.giniConcentration(
          List.fill(k)(u).toDF("w"), "w").collect()(0).getDouble(2)
      g >= 0.0 && g < 1.0 && uni == 0.0
    }

  property("classBalance entropy_norm is in [0, 1], 1 iff balanced") =
    forAll(Gen.choose(1, 5), Gen.choose(1, 20), Gen.choose(0, 15)) {
      (k, per, extra) =>
        import spark.implicits._
        val labels = (0 until k).flatMap(l => List.fill(per)(l)) ++
          List.fill(extra)(0)
        val r = Profile.classBalance(labels.toDF("label"), "label").collect()(0)
        val h = r.getDouble(3)
        h >= 0.0 && h <= 1.0000001 &&
          (k == 1 || extra > 0 || math.abs(h - 1.0) < 1e-9)
    }

  // --- media fingerprints -------------------------------------------------

  property("image dHash survives the real BMP encode/decode for any seed/size") =
    forAll(Gen.choose(0L, 5000L), Gen.choose(9, 27), Gen.choose(8, 24)) {
      (seed, w, h) =>
        val img = Multimodal.decodeImage(Multimodal.syntheticBmp(seed, w, h))
        img.nonEmpty && img.get.getWidth == w && img.get.getHeight == h
    }

  property("audio fingerprint halves are non-negative 32-bit, decode is lossless") =
    forAll(Gen.choose(0L, 5000L), Gen.choose(130, 400)) { (seed, n) =>
      val (samples, _) = Multimodal.decodeAudio(
        Multimodal.syntheticWav(seed, n)).get
      val (hi, lo) = Multimodal.audioEnvelopeBits(samples)
      samples.length == n &&
        hi >= 0L && hi < (1L << 32) && lo >= 0L && lo < (1L << 32)
    }

  property("hllUnionAudit exact side matches a reference countDistinct") =
    forAll(Gen.nonEmptyListOf(for {
      k <- Gen.oneOf("x", "y")
      v <- Gen.choose(0L, 40L)
      s <- Gen.choose(0, 3)
    } yield (k, v, s))) { rows =>
      import spark.implicits._
      val df = rows.toDF("key", "value", "shard")
      val out = SketchAudit.hllUnionAudit(df, "key", col("shard"), "value")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
          r.getBoolean(3))).toMap
      val ref = rows.groupBy(_._1).map { case (k, g) =>
        k -> (g.map(_._3).distinct.size.toLong, g.map(_._2).distinct.size.toLong)
      }
      // low-cardinality regime: HLL is exact, so sketch_ok must hold too
      out.forall { case (k, (nsh, nex, ok)) =>
        ref(k) == ((nsh, nex)) && ok
      }
    }
}
