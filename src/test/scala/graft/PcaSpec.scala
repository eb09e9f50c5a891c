package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pca

class PcaSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("jacobiEigen recovers a hand-built spectrum") {
    // A = Q diag(5,2) Q^T with Q a 45-degree rotation
    val s = math.sqrt(0.5)
    val q = Array(Array(s, s), Array(-s, s))
    val lam = Array(5.0, 2.0)
    val a = Array.tabulate(2, 2)((i, j) =>
      (0 until 2).map(k => q(k)(i) * lam(k) * q(k)(j)).sum)
    val (ev, vecs) = Pca.jacobiEigen(a)
    assert(math.abs(ev(0) - 5.0) < 1e-12 && math.abs(ev(1) - 2.0) < 1e-12)
    // leading axis = (s, s) up to sign; canonicalized positive
    assert(math.abs(math.abs(vecs(0)(0)) - s) < 1e-12)
    assert(vecs(0)(0) > 0 && math.abs(vecs(0)(0) - vecs(0)(1)) < 1e-12)
  }

  test("fit finds the dominant direction of a planted line") {
    // points along direction (3,4)/5 with small orthogonal noise
    val dir = Array(0.6f, 0.8f)
    val rows = (0 until 200).map { i =>
      val t = (i - 100) / 10.0f
      val noise = ((i * 2654435761L % 97) / 97.0f - 0.5f) * 0.05f
      (i.toLong, Array(dir(0) * t - dir(1) * noise, dir(1) * t + dir(0) * noise))
    }
    val df = rows.toDF("id", "embedding")
    val m = Pca.fit(df, "embedding", 2)
    assert(m.eigenvalues(0) > 50 * m.eigenvalues(1)) // one dominant axis
    val cosine = m.components(0)(0) * 0.6 + m.components(0)(1) * 0.8
    assert(math.abs(math.abs(cosine) - 1.0) < 1e-3)
    // deterministic across runs
    val m2 = Pca.fit(df, "embedding", 2)
    assert(m.components(0).sameElements(m2.components(0)) &&
      m.eigenvalues.sameElements(m2.eigenvalues))
  }

  test("whitened output has identity covariance") {
    val rows = (0 until 300).map { i =>
      val a = ((i * 2654435761L % 101) / 101.0 - 0.5) * 4
      val b = ((i * 1099511628211L % 89) / 89.0 - 0.5)
      // correlated coords: x = a, y = 0.8 a + b
      (i.toLong, Array(a.toFloat, (0.8 * a + b).toFloat))
    }
    val df = rows.toDF("id", "embedding")
    val m = Pca.fit(df, "embedding", 2)
    val w = Pca.transform(df, m, "embedding", k = 2, whiten = true)
      .select("p00", "p01").as[(Double, Double)].collect()
    val n = w.length.toDouble
    val mx = w.map(_._1).sum / n
    val my = w.map(_._2).sum / n
    val vxx = w.map(p => (p._1 - mx) * (p._1 - mx)).sum / n
    val vyy = w.map(p => (p._2 - my) * (p._2 - my)).sum / n
    val vxy = w.map(p => (p._1 - mx) * (p._2 - my)).sum / n
    assert(math.abs(vxx - 1.0) < 1e-6 && math.abs(vyy - 1.0) < 1e-6)
    assert(math.abs(vxy) < 1e-6)
  }

  test("covarianceFrame matches a hand-computed tiny example") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(3.0f, 2.0f)),
      (3L, Array(5.0f, 4.0f))
    ).toDF("id", "embedding")
    val got = Pca.covarianceFrame(df, "embedding", 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // means (3, 2); cov_xx = (4+0+4)/3, cov_xy = (4+0+4)/3, cov_yy = (4+0+4)/3
    val e = 8.0 / 3
    assert(got((0L, 0L)) == math.rint(e * 1e6) / 1e6)
    assert(got((0L, 1L)) == math.rint(e * 1e6) / 1e6)
    assert(got((1L, 1L)) == math.rint(e * 1e6) / 1e6)
    assert(got.size == 3)
  }

  test("fit fails loudly on a single row") {
    val df = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "embedding")
    intercept[IllegalArgumentException](Pca.fit(df, "embedding", 2))
  }
}
