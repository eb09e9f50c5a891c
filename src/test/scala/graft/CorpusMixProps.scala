package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.functions._

import graft.operators.CorpusMix

/** ScalaCheck properties for corpus mixing. Invariants that must hold on
  * ANY corpus:
  *  - both packers never exceed the per-group budget;
  *  - exact packing keeps exactly the maximal prefix under the
  *    (quality desc, id) order;
  *  - histogram packing keeps whole quality-bucket ranges (kept and
  *    dropped buckets never interleave);
  *  - capPerGroup keeps exactly the top-n under the order.
  * Few cases — each evaluation runs real Spark jobs.
  */
object CorpusMixProps extends Properties("CorpusMix") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkTestBase.spark

  private case class Doc(id: Long, group: String, tokens: Long, quality: Double)

  private val corpusGen: Gen[List[Doc]] =
    Gen.choose(1, 40).flatMap(n => Gen.listOfN(n,
      for {
        g <- Gen.oneOf("en", "de", "fr")
        tok <- Gen.choose(1L, 400L)
        q <- Gen.choose(0, 100).map(_ / 100.0)
      } yield (g, tok, q))).map(_.zipWithIndex.map {
        case ((g, tok, q), i) => Doc(i.toLong, g, tok, q)
      })

  private def df(docs: List[Doc]) = {
    import spark.implicits._
    docs.map(d => (d.id, d.group, d.tokens, d.quality))
      .toDF("doc_id", "lang", "bpe_tokens", "quality")
  }

  private val order = Seq(col("quality").desc, col("doc_id"))

  /** Reference prefix pack computed in plain Scala. */
  private def exactReference(docs: List[Doc], budget: Long): Set[Long] =
    docs.groupBy(_.group).values.flatMap { g =>
      val sorted = g.sortBy(d => (-d.quality, d.id))
      val cum = sorted.scanLeft(0L)(_ + _.tokens).tail
      sorted.zip(cum).takeWhile(_._2 <= budget).map(_._1.id)
    }.toSet

  property("exact pack = maximal quality-ordered prefix within budget") =
    forAll(corpusGen, Gen.choose(50L, 800L)) { (docs, budget) =>
      val kept = CorpusMix.packToBudget(df(docs), "lang", "bpe_tokens", budget, order)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      kept == exactReference(docs, budget)
    }

  property("histogram pack stays within budget and keeps whole bucket ranges") =
    forAll(corpusGen, Gen.choose(50L, 800L)) { (docs, budget) =>
      val kept = CorpusMix.packToBudgetHistogram(
        df(docs), "lang", "bpe_tokens", "quality", budget, buckets = 10)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val byId = docs.map(d => d.id -> d).toMap
      val groups = docs.groupBy(_.group)
      groups.forall { case (_, g) =>
        val keptG = g.filter(d => kept(d.id))
        val dropG = g.filterNot(d => kept(d.id))
        val withinBudget = keptG.map(_.tokens).sum <= budget
        def bucket(d: Doc) = math.floor(d.quality * 10).toInt
        val bucketRanges = keptG.isEmpty || dropG.isEmpty ||
          keptG.map(bucket).min > dropG.map(bucket).max
        withinBudget && bucketRanges && keptG.forall(d => byId.contains(d.id))
      }
    }

  property("capPerGroup keeps exactly the top-n per group") =
    forAll(corpusGen, Gen.choose(1, 10)) { (docs, n) =>
      val kept = CorpusMix.capPerGroup(df(docs), "lang", n, order)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val expected = docs.groupBy(_.group).values.flatMap(
        _.sortBy(d => (-d.quality, d.id)).take(n).map(_.id)).toSet
      kept == expected
    }
}
