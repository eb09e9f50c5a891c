package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HashingEmbedder
import graft.operators.Embed

/** Pins the hashing-embedder vector VALUES (the correctness-gate compares
  * only scalar digests — dim and nonzero-ness — because the projection
  * isn't ANSI-SQL; reference contract `yamlpipe/components/embedders.py`).
  */
class EmbedSpec extends AnyFunSuite with SparkTestBase {

  test("embedding is deterministic, unit-norm, and dimension-correct") {
    val a = HashingEmbedder.embed("the quick brown fox", 64, 42)
    val b = HashingEmbedder.embed("the quick brown fox", 64, 42)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 64)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("empty / null / non-alnum text embeds to the zero vector") {
    assert(HashingEmbedder.embed("", 16).forall(_ == 0f))
    assert(HashingEmbedder.embed(null, 16).forall(_ == 0f))
    assert(HashingEmbedder.embed("!!! ...", 16).forall(_ == 0f))
  }

  test("token overlap yields higher cosine than disjoint text") {
    def cos(x: Array[Float], y: Array[Float]): Double = {
      val dot = x.zip(y).map { case (a, b) => a.toDouble * b }.sum
      dot // unit vectors
    }
    val base = HashingEmbedder.embed("spark catalyst optimizer engine", 64)
    val near = HashingEmbedder.embed("spark catalyst engine tuning", 64)
    val far = HashingEmbedder.embed("tomato basil garlic sauce", 64)
    assert(cos(base, near) > cos(base, far))
  }

  test("DataFrame operator is row-aligned and distributed") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta"), (2L, ""), (3L, "alpha beta")).toDF("id", "txt")
    val out = Embed.hashing(df, "txt", dim = 32).orderBy("id")
      .select(col("id"), col("embedding")).collect()
    assert(out.length == 3)
    val v1 = out(0).getSeq[Float](1)
    val v2 = out(1).getSeq[Float](1)
    val v3 = out(2).getSeq[Float](1)
    assert(v1 == v3)           // equal text -> equal vector
    assert(v2.forall(_ == 0f)) // empty -> zero vector
    assert(v1.length == 32)
    // matches the driver-side query embedding (search parity)
    assert(v1 == Embed.embedQuery("alpha beta", dim = 32).toSeq)
  }

  test("batch embed contract: n in -> n out, empty in -> empty out") {
    assert(HashingEmbedder.embedBatch(Seq.empty).isEmpty)
    assert(HashingEmbedder.embedBatch(Seq("a", "b", "c")).length == 3)
  }
}
