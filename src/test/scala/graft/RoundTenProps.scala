package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.{Chunkers, Similarity}

/** Invariants of the round-10 additions under generated inputs. */
object RoundTenProps extends Properties("RoundTen") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkTestBase.spark

  // --- TextTiling chunker -------------------------------------------------

  private val wordGen: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar))
      .map(_.mkString)

  private val docGen: Gen[String] = for {
    nSents <- Gen.choose(1, 8)
    sents <- Gen.listOfN(nSents,
      Gen.choose(1, 7).flatMap(w => Gen.listOfN(w, wordGen)))
  } yield sents.map(_.mkString(" ") + ".").mkString(" ")

  property("textTiling: chunks concatenate back to the sentence stream") =
    forAll(docGen) { doc =>
      import spark.implicits._
      val out = Chunkers.textTiling(
          Seq((1L, doc)).toDF("doc_id", "text"), "text", 1, 4)
        .orderBy(col("chunk_index")).select("chunk")
        .collect().map(_.getString(0))
      // dense 1-based indices; joined chunks = the original sentence stream
      out.mkString(" ") == doc.trim &&
        out.forall(_.nonEmpty)
    }

  property("textTiling: tighter cohesion threshold never merges chunks") =
    forAll(docGen) { doc =>
      import spark.implicits._
      def nChunks(num: Long, den: Long) = Chunkers.textTiling(
        Seq((1L, doc)).toDF("doc_id", "text"), "text", num, den).count()
      // threshold 0 (never break) <= 1/4 <= 1/1 (break every non-identical
      // gap): boundary sets are nested, so chunk counts are monotone
      nChunks(0, 1) <= nChunks(1, 4) && nChunks(1, 4) <= nChunks(1, 1)
    }

  // --- in-house E2LSH -----------------------------------------------------

  private val vecsGen: Gen[List[List[Float]]] = for {
    n <- Gen.choose(2, 24)
    vs <- Gen.listOfN(n, Gen.listOfN(8,
      Gen.choose(-100, 100).map(_ / 10.0f)))
  } yield vs

  property("lshTopK: results are the exact L2 top-k of the bucket-matching rows") =
    forAll(vecsGen) { vs =>
      import spark.implicits._
      val corpus = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val q = vs.head.toArray
      val got = Similarity.lshTopK(corpus, q, k = 5)
        .select("vec_id", "dist").collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      // brute force: bucket membership + exact L2, same ties
      def dir(t: Int) = Array.tabulate(8)(j =>
        graft.plans.HyperplaneSigExpr.sign(42, t, j))
      def bucket(v: Seq[Float], t: Int): Long = {
        val r = dir(t)
        var d = 0.0; var j = 0
        while (j < 8) { d += r(j) * v(j); j += 1 }
        math.floor(d / 2.0).toLong
      }
      val qB = (0 until 4).map(t => bucket(q.toSeq.map(x => x), t))
      val expect = vs.zipWithIndex
        .filter { case (v, _) => (0 until 4).exists(t => bucket(v, t) == qB(t)) }
        .map { case (v, i) =>
          val d = math.sqrt(v.zip(q).map { case (a, b) =>
            val t = a.toDouble - b.toDouble; t * t }.sum)
          (i.toLong, d)
        }
        .sortBy { case (i, d) => (d, i) }.take(5)
      // the query's own vector always matches its buckets -> never empty
      got.map(_._1).toSeq == expect.map(_._1) &&
        got.map(_._2).zip(expect.map(_._2))
          .forall { case (a, b) => math.abs(a - b) < 1e-9 }
    }
}
