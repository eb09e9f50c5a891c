package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.functions._

import graft.operators.{CorpusMix, Dedup, StateStore}

/** ScalaCheck properties for the round-6 operators. Invariants that must
  * hold on ANY input:
  *  - winnowing: fingerprint count bounded by [ceil(windows/w), windows]
  *    (the density guarantee) and zero below the minimum length;
  *  - temperature sampling: per-group draw never exceeds the group size,
  *    the total never exceeds the budget when no cap binds, and quotas are
  *    monotone in group size;
  *  - corpus diff: statuses partition exactly into the set-algebra
  *    expectation (added = new-only ids, removed = old-only ids).
  * Few cases — each evaluation runs real Spark jobs.
  */
object RoundSixProps extends Properties("RoundSix") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkTestBase.spark

  private val wordGen = Gen.choose(1, 30).map(i => s"w$i")
  private val textGen = Gen.choose(0, 60).flatMap(n =>
    Gen.listOfN(n, wordGen).map(_.mkString(" ")))

  property("winnowing density bounds") = forAll(Gen.listOfN(5, textGen)) { texts =>
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val out = Dedup.winnowFingerprints(df, "text", "id", k = 5, window = 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_fingerprints")))
    out.forall { case (_, nGrams, nFps) =>
      val windows = math.max(0L, nGrams - 3)
      if (windows == 0) nFps == 0
      else nFps <= windows && nFps >= (windows + 3) / 4 // ceil(windows/4)
    }
  }

  private val groupGen = Gen.oneOf("a", "b", "c")

  property("temperature quotas bounded by size and budget") =
    forAll(Gen.choose(1, 30), Gen.listOfN(25, groupGen), Gen.choose(0.2, 1.0)) {
      (budget, groups, alpha) =>
        import spark.implicits._
        val df = groups.zipWithIndex.map { case (g, i) => (i.toLong, g) }.toDF("id", "g")
        val sizes = groups.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val out = CorpusMix.temperatureSample(df, "g", alpha, budget,
            orderBy = Seq(col("id")))
          .groupBy("g").count().as[(String, Long)].collect().toMap
        val perGroupOk = out.forall { case (g, n) => n <= sizes(g) }
        // sum floor(w_j * B) <= B always; the size cap can only reduce it
        val totalOk = out.values.sum <= budget
        perGroupOk && totalOk
    }

  property("corpus diff is the set algebra of the two snapshots") =
    forAll(Gen.listOfN(12, Gen.choose(0, 9)), Gen.listOfN(12, Gen.choose(0, 9))) {
      (oldIds, newIds) =>
        import spark.implicits._
        val o = oldIds.distinct.map(i => (i.toLong, s"fp$i")).toDF("id", "fp")
        val n = newIds.distinct.map(i => (i.toLong, s"fp${i}x")).toDF("id", "fp")
        val diff = StateStore.corpusDiff(o, n, "id", "fp", includeUnchanged = true)
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        val os = oldIds.distinct.map(_.toLong).toSet
        val ns = newIds.distinct.map(_.toLong).toSet
        diff.keySet == (os ++ ns) &&
          (os -- ns).forall(diff(_) == "removed") &&
          (ns -- os).forall(diff(_) == "added") &&
          // fingerprints always differ here ("fpI" vs "fpIx")
          (os & ns).forall(diff(_) == "changed")
    }
}
