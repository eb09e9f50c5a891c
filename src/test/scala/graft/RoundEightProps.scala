package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.{LabelProp, Sampling, SequencePack, SketchAudit}

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

  property("paddingWasteReport conserves docs and tokens; waste in [0,1)") =
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
            wr >= 0.0 && wr < 1.0 &&
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
