package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

/** Deterministic sampling: threshold math, stability under repartitioning,
  * fraction accuracy, stratification, and disjoint splits.
  */
class SamplingSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private lazy val ids = (0L until 5000L).toDF("id")

  test("hexThreshold: exact corner values") {
    assert(Sampling.hexThreshold(0.0) == "0000")
    assert(Sampling.hexThreshold(0.1) == "1999")
    assert(Sampling.hexThreshold(0.8) == "cccc")
    assert(Sampling.hexThreshold(1.0) == "g") // admits every hex prefix
  }

  test("hashSample keeps ~fraction of rows and is repartition-stable") {
    val sampled = Sampling.hashSample(ids, "id", 0.1)
    val n = sampled.count()
    assert(n > 380 && n < 620, s"10% of 5000 expected ~500, got $n")
    val again = Sampling.hashSample(ids.repartition(13), "id", 0.1)
      .collect().map(_.getLong(0)).toSet
    assert(again == sampled.collect().map(_.getLong(0)).toSet)
  }

  test("sample membership is monotone in fraction (nested subsets)") {
    val small = Sampling.hashSample(ids, "id", 0.05).collect().map(_.getLong(0)).toSet
    val large = Sampling.hashSample(ids, "id", 0.2).collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large))
  }

  test("stratifiedSample applies per-stratum fractions") {
    val df = ids.withColumn("stratum", when(col("id") % 2 === 0, "a").otherwise("b"))
    val s = Sampling.stratifiedSample(df, "stratum", "id",
      Map("a" -> 0.3, "b" -> 0.0), defaultFraction = 0.0)
    val byStratum = s.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byStratum.contains("b"))
    val na = byStratum.getOrElse("a", 0L)
    assert(na > 600 && na < 900, s"30% of 2500 expected ~750, got $na")
  }

  test("splitColumn: labels are disjoint, exhaustive at sum=1, roughly proportional") {
    val labeled = ids.withColumn("split",
      Sampling.splitColumn(col("id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    val counts = labeled.groupBy("split").count().collect()
      .map(r => Option(r.getString(0)).getOrElse("null") -> r.getLong(1)).toMap
    assert(!counts.contains("null"), s"sum=1 must label every row: $counts")
    assert(counts.values.sum == 5000)
    assert(counts("train") > 3800 && counts("train") < 4200, counts.toString)
    assert(counts("val") > 330 && counts("val") < 670)
    assert(counts("test") > 330 && counts("test") < 670)
  }

  test("deterministicShuffle: exact permutation, salt-sensitive, partition-stable") {
    val docs = ids.limit(500)
    val out = Sampling.deterministicShuffle(docs, Seq("id"), salt = "e0")
      .select("id", "shuffle_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // positions are exactly 0..n-1 (a permutation, no gaps or repeats)
    assert(out.values.toSeq.sorted === (0L until 500L))
    // not the identity order (the hash actually shuffles)
    assert((0L until 500L).exists(i => out(i) != i))
    // identical on re-run and under a different input partitioning
    val again = Sampling.deterministicShuffle(docs.repartition(13), Seq("id"), salt = "e0")
      .select("id", "shuffle_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === out)
    // a different salt yields a different permutation
    val e1 = Sampling.deterministicShuffle(docs, Seq("id"), salt = "e1")
      .select("id", "shuffle_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e1 !== out)
  }

  test("splitColumn: double accumulation must not orphan ffff-prefix rows") {
    // (0.6, 0.3, 0.1) accumulates to 0.9999999999999999 in double; without
    // snapping, hexThreshold yields "ffff" instead of "g" and a key whose
    // md5(key||salt) prefix is exactly "ffff" falls through to NULL. Find
    // such a key deterministically and pin its label.
    val md = java.security.MessageDigest.getInstance("MD5")
    val ffffKey = Iterator.from(0).map(_.toString).find { k =>
      val hex = md.digest((k + "graft").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      hex.startsWith("ffff")
    }.get
    val one = Seq(ffffKey).toDF("id")
      .withColumn("split", Sampling.splitColumn(col("id"),
        Seq("train" -> 0.6, "val" -> 0.3, "test" -> 0.1)))
    assert(one.collect()(0).getString(1) == "test",
      s"key $ffffKey with md5 prefix ffff must get the last label, not NULL")
  }

  test("splitByComponent: duplicate clusters never straddle splits; append-stable") {
    import graft.operators.Components
    // clusters {1,2,3}, {10,11}; 20..24 are singletons
    val docs = (Seq(1L, 2L, 3L, 10L, 11L) ++ (20L to 24L)).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val comps = Components.connectedComponents(edges, "src", "dst")
    val split = Sampling.splitByComponent(docs, "doc_id", comps,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(split.size == 10 && split.values.forall(_ != null))
    // the leakage property: all members of a cluster share one split
    assert(Set(split(1L), split(2L), split(3L)).size == 1)
    assert(split(10L) == split(11L))
    // append stability: growing the corpus with new singletons never moves
    // an existing row's split (membership is a pure function of the key)
    val grown = Sampling.splitByComponent(
        (Seq(1L, 2L, 3L, 10L, 11L) ++ (20L to 44L)).toDF("doc_id"),
        "doc_id", comps, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(split.forall { case (k, v) => grown(k) == v })
    // singletons split by their own id — identical to the plain splitColumn
    val plain = (20L to 24L).toSeq.toDF("doc_id")
      .withColumn("s", Sampling.splitColumn(col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((20L to 24L).forall(i => split(i) == plain(i)))
  }

  test("exactStratifiedSplit: per-stratum counts are exact and deterministic") {
    import spark.implicits._
    // 50-row and 7-row strata: the Bernoulli predicate would fluctuate;
    // exact split must give ceil-boundary counts per stratum.
    val df = ((1L to 50L).map(i => (i, "big")) ++ (101L to 107L).map(i => (i, "small")))
      .toDF("id", "lang")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.exactStratifiedSplit(df, "lang", "id", splits)
      .groupBy("lang", "split").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // Boundaries via the same double arithmetic the engine uses (0.8 * n
    // can land a hair above the exact product; ceil must agree with it).
    val bTrain = math.ceil(0.8 * 50).toLong
    val bVal = math.ceil(0.9 * 50).toLong - bTrain
    def cnt(k: (String, String)): Long = out.getOrElse(k, 0L)
    assert(cnt(("big", "train")) == bTrain)
    assert(cnt(("big", "val")) == bVal)
    assert(cnt(("big", "test")) == 50 - bTrain - bVal)
    // n=7: ceil(5.6)=6 train, ceil(6.3)=7 -> val takes the last row and
    // test is legitimately EMPTY — ceil boundaries can exhaust a small
    // stratum before the tail label.
    val sTrain = math.ceil(0.8 * 7).toLong
    val sVal = math.ceil(0.9 * 7).toLong - sTrain
    assert(cnt(("small", "train")) == sTrain && cnt(("small", "val")) == sVal)
    assert(cnt(("small", "test")) == 7 - sTrain - sVal)
    // every row labeled; repartitioning does not move any row
    val a = Sampling.exactStratifiedSplit(df, "lang", "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Sampling.exactStratifiedSplit(df.repartition(7), "lang", "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b && a.values.forall(_ != null))
  }

  test("shardOf: in-range, deterministic, engine-stable hex math, power-of-16 only") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = (0L until 200L).toDF("id")
    val a = df.select(col("id"), Sampling.shardOf(col("id"), 16).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a.values.forall(s => s >= 0 && s < 16))
    assert(a.values.toSet.size > 8) // spreads across most shards
    val b = df.repartition(7).select(col("id"), Sampling.shardOf(col("id"), 16).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
    // 256 = two hex digits; first-digit consistency with the 16-way shard
    val c = df.select(col("id"), Sampling.shardOf(col("id"), 256).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(c.forall { case (id, s256) => s256 / 16 == a(id) })
    intercept[IllegalArgumentException](Sampling.shardOf(col("id"), 10))
  }

  test("curriculumOrder: easy-first within stratum, strata interleaved round-robin") {
    import spark.implicits._
    // Two sources: a has difficulties 3<5<9, b has 1<2. Expected global
    // order by (rank, source, id): a3(id=11), b1(id=20), a5(id=12),
    // b2(id=21), a9(id=10).
    val df = Seq(
      (10L, "a", 9L), (11L, "a", 3L), (12L, "a", 5L),
      (20L, "b", 1L), (21L, "b", 2L)
    ).toDF("id", "src", "diff")
    val out = Sampling.curriculumOrder(df, "src", "diff", "id")
      .orderBy("curriculum_pos")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("stratum_rank"),
        r.getAs[Long]("curriculum_pos")))
    assert(out.map(_._1).toSeq == Seq(11L, 20L, 12L, 21L, 10L))
    assert(out.map(_._3).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(out.map(_._2).toSeq == Seq(1L, 1L, 2L, 2L, 3L))
    // Difficulty ties break by id: two equal-difficulty docs keep id order.
    val tie = Seq((2L, "a", 7L), (1L, "a", 7L)).toDF("id", "src", "diff")
    val tieOut = Sampling.curriculumOrder(tie, "src", "diff", "id")
      .orderBy("curriculum_pos").collect().map(_.getAs[Long]("id")).toSeq
    assert(tieOut == Seq(1L, 2L))
  }

  test("weightedSample: matches local A-ES replay, favors weight, k clips") {
    import spark.implicits._
    val rows = (1L to 200L).map(i => (i, (i % 7 + 1) * 100.0))
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", k = 30, salt = "t")
      .collect().map(_.getAs[Long]("id")).toSet
    // local replay of the exact same priority definition
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex4(s: String): Long = {
      val h = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 4), 16)
    }
    val expect = rows
      .map { case (i, w) =>
        val u = (hex4(i.toString + "t") + 1.0) / 65536.0
        (math.pow(u, 1.0 / w), i)
      }
      .sortBy { case (p, i) => (-p, i) }
      .take(30).map(_._2).toSet
    assert(got == expect)
    // zero/negative weights are ineligible; k larger than pool clips
    val small = Seq((1L, 0.0), (2L, -3.0), (3L, 5.0)).toDF("id", "w")
    val s = Sampling.weightedSample(small, "id", "w", k = 10)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(s == Set(3L))
  }

  test("groupReservoir: exactly k per group, deterministic, salt-sensitive") {
    import spark.implicits._
    val df = (1L to 90L).map(i => (s"g${i % 3}", i)).toDF("g", "id")
    val out = Sampling.groupReservoir(df, "g", "id", k = 5)
    val byG = out.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byG.keySet == Set("g0", "g1", "g2"))
    assert(byG.values.forall(_.size == 5))
    // deterministic across runs / repartitioning
    val again = Sampling.groupReservoir(df.repartition(7), "g", "id", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again == out.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    // a different salt draws a different subset (overwhelmingly)
    val salted = Sampling.groupReservoir(df, "g", "id", k = 5, salt = "other")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted != again)
    // small group: min(k, |group|)
    val tiny = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "id")
    assert(Sampling.groupReservoir(tiny, "g", "id", k = 5).count() == 3)
  }

  test("rankBuckets: exact boundaries, near-even sizes, tie and clip behavior") {
    import spark.implicits._
    // 25 rows into 10 buckets: floor(p*10/25) -> sizes 3,2,3,2,...
    val df = (1L to 25L).map(i => (i, (i * 37 % 100).toDouble)).toDF("id", "v")
    val out = Sampling.rankBuckets(df, "v", "id", buckets = 10)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("v"),
        r.getAs[Int]("bucket")))
    assert(out.length == 25)
    val sorted = out.sortBy(x => (x._2, x._1))
    sorted.zipWithIndex.foreach { case ((_, _, b), p) =>
      assert(b == p * 10 / 25, s"position $p")
    }
    val sizes = out.groupBy(_._3).view.mapValues(_.size).toMap
    assert(sizes.values.forall(s => s == 2 || s == 3))
    // single bucket collapses to 0; fewer rows than buckets still in-range
    assert(Sampling.rankBuckets(df, "v", "id", 1)
      .collect().forall(_.getAs[Int]("bucket") == 0))
    val few = Sampling.rankBuckets(df.limit(3), "v", "id", 10)
      .collect().map(_.getAs[Int]("bucket")).toSet
    assert(few.subsetOf(Set(0, 3, 6)))
  }

  test("greedySetCover: greedy argmax with id ties, early stop when covered") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    // round 1: doc 1 {a b c} gain 3. round 2: doc 4 {d e} gain 2 beats
    // doc 2 {c d f} gain 2? no — doc 2 gains {d f} = 2, TIE with doc 4's
    // {d e} = 2 -> lower id wins: doc 2. round 3: doc 4 gains {e} = 1.
    // doc 3 {a b} never gains; k=4's round 4 finds no gain (early stop).
    val df = Seq((1L, "a b c a"), (2L, "c d f"), (3L, "a b"), (4L, "d e"))
      .toDF("doc_id", "text")
    val got = graft.operators.Sampling
      .greedySetCover(df, "text", "doc_id", k = 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1L, 3L, 3L), (2L, 2L, 2L, 5L),
      (3L, 4L, 1L, 6L)))
    intercept[IllegalArgumentException] {
      graft.operators.Sampling.greedySetCover(df, "text", "doc_id", k = 0)
    }
  }

  test("greedySetCover rounds scan the persisted terms table (flat lineage)") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    // The driver-round discipline pin (r9 verdict #6): set-cover keeps its
    // covered set ON THE DRIVER, so unlike the checkpoint-per-round
    // families there is no growing lineage to truncate — each round's
    // argmax must read the ONE persisted exploded-terms cache
    // (InMemoryTableScan), never re-derive the explode from the source.
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark2.listenerManager.register(listener)
    try {
      val df = Seq((1L, "a b c"), (2L, "c d"), (3L, "e f g h"), (4L, "h i"))
        .toDF("doc_id", "text")
      graft.operators.Sampling.greedySetCover(df, "text", "doc_id", k = 3)
        .collect()
      import scala.jdk.CollectionConverters._
      def argmaxPlans = plans.asScala.toSeq.filter(p =>
        p.contains("TakeOrderedAndProject") && p.contains("__gain"))
      val deadline = System.currentTimeMillis() + 30000
      while (argmaxPlans.size < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val rounds = argmaxPlans
      assert(rounds.size >= 3, s"captured ${rounds.size} argmax plans")
      rounds.foreach(p => assert(p.contains("InMemoryTableScan"), p.take(400)))
    } finally spark2.listenerManager.unregister(listener)
  }
}
