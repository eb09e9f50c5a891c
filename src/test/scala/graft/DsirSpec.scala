package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dsir

class DsirSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val raw = Seq(
    (1L, "alpha beta alpha beta"),   // target-like
    (2L, "gamma delta gamma delta"), // off-distribution
    (3L, "alpha beta gamma"),        // mixed
    (4L, "")                         // feature-less
  ).toDF("doc_id", "text")
  private val target = Seq((10L, "alpha beta alpha")).toDF("doc_id", "text")

  test("importanceWeights ranks target-like docs above off-distribution docs") {
    val w = Dsir.importanceWeights(raw, target, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(w.keySet == Set(1L, 2L, 3L)) // empty text absent
    // n_feats = tokens + bigrams: 4 toks -> 4 + 3 = 7; 3 toks -> 3 + 2 = 5.
    assert(w(1L)._1 == 7L && w(2L)._1 == 7L && w(3L)._1 == 5L)
    assert(w(1L)._2 > w(3L)._2 && w(3L)._2 > w(2L)._2)
  }

  test("hashed buckets preserve occurrence counts, determinism and ordering") {
    def run() = Dsir.importanceWeights(raw, target, "text", "doc_id", buckets = 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val a = run()
    assert(a == run()) // pure function of input
    assert(a(1L)._1 == 7L && a(3L)._1 == 5L) // hashing merges types, not tokens
    assert(a(1L)._2 > a(2L)._2) // target-like still wins under collisions
  }

  test("selectTopFraction: exact ceil(f*n) rows, cutoff ties broken by id") {
    val w = Seq((1L, 7L, 1.0), (2L, 7L, 0.5), (3L, 5L, 0.5), (4L, 2L, 0.2))
      .toDF("doc_id", "n_feats", "log_weight")
    def sel(f: Double): Set[Long] = Dsir.selectTopFraction(w, "doc_id", f)
      .filter(col("selected")).select("doc_id").as[Long].collect().toSet
    assert(sel(0.5) == Set(1L, 2L)) // k=2: tie at 0.5 -> lower id wins
    assert(sel(0.75) == Set(1L, 2L, 3L))
    assert(sel(0.0) == Set.empty[Long])
    assert(sel(1.0) == Set(1L, 2L, 3L, 4L))
  }

  test("selectTopFraction on an empty frame yields an empty frame") {
    val w = Seq.empty[(Long, Long, Double)].toDF("doc_id", "n_feats", "log_weight")
    assert(Dsir.selectTopFraction(w, "doc_id", 0.5).count() == 0)
  }

  test("an empty target corpus degrades gracefully: finite weights, no crash") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, empty, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // every feature is target-unseen: the target model is uniform-over-V
    // (pure smoothing), so weights stay finite and defined — a rare-in-raw
    // feature can still sit above uniform, so only finiteness is guaranteed
    assert(w.keySet == Set(1L, 2L, 3L))
    assert(w.values.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("a persisted target model scores identically to the inline path") {
    val dir = java.nio.file.Files.createTempDirectory("dsir-model")
    Dsir.targetModel(target, "text", "doc_id")
      .write.mode("overwrite").parquet(dir.toString)
    val persisted = spark.read.parquet(dir.toString)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inline = Dsir.importanceWeights(raw, target, "text", "doc_id")
    val against = Dsir.importanceWeightsAgainst(raw, persisted, "text", "doc_id")
    assert(rows(against) == rows(inline))
  }
}
