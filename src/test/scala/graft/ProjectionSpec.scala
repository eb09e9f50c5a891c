package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** Signed random projection: sign-matrix determinism and balance,
  * hand-computed coordinates, and approximate cosine preservation (the JL
  * property the ANN scale path relies on).
  */
class ProjectionSpec extends AnyFunSuite with SparkTestBase {

  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("sign matrix is deterministic, +-1 valued, roughly balanced") {
    val a = VectorFunctions.signMatrix(64, 16)
    val b = VectorFunctions.signMatrix(64, 16)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.flatten.forall(s => s == 1 || s == -1))
    val pos = a.flatten.count(_ == 1)
    assert(pos > 400 && pos < 624, s"suspiciously unbalanced: $pos/1024 positive")
    // a different seed yields a different matrix
    assert(VectorFunctions.signMatrix(64, 16, seed = 7L).map(_.toSeq).toSeq
      != a.map(_.toSeq).toSeq)
  }

  test("projected coordinates match the hand-computed signed sum") {
    val signs = Array(Array(1, -1, 1), Array(-1, -1, 1))
    val df = Seq((1L, Seq(2.0f, 3.0f, 5.0f))).toDF("id", "vec")
    val got = df.select(
        VectorFunctions.projectedCoord(col("vec"), signs, 0).as("p0"),
        VectorFunctions.projectedCoord(col("vec"), signs, 1).as("p1"))
      .as[(Double, Double)].collect().head
    val s = math.sqrt(2.0)
    assert(got == (((2.0 - 3.0 + 5.0) / s, (-2.0 - 3.0 + 5.0) / s)))
  }

  test("projection approximately preserves cosine on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(40).cache()
    val signs = VectorFunctions.signMatrix(64, 16)
    val cols = signs.indices.map(j =>
      VectorFunctions.projectedCoord(col("embedding"), signs, j))
    val proj = e.select(col("vec_id"), array(cols: _*).as("p"))
    val orig = e.select(col("vec_id"), col("embedding"))
    val pairs = orig.as("a").join(orig.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        VectorFunctions.cosineSimilarity(col("a.embedding"), col("b.embedding")).as("c"))
    val ppairs = proj.as("a").join(proj.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        VectorFunctions.cosineSimilarity(col("a.p"), col("b.p")).as("pc"))
    val err = pairs.join(ppairs, Seq("ia", "ib"))
      .agg(avg(abs(col("c") - col("pc")))).as[Double].collect().head
    // 16-dim JL estimate of cosine has std ~ 1/sqrt(16) = 0.25; the MEAN
    // absolute error over ~800 pairs concentrates well below that.
    assert(err < 0.25, s"projection destroyed geometry: mean |d cos| = $err")
    e.unpersist()
  }
}
