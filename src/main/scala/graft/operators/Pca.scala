package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA and whitening over an embedding column — the standard preprocessing
  * for semantic dedup and retrieval (SemDeDup-style pipelines whiten
  * before cosine thresholds; anisotropic encoder outputs cluster along a
  * few dominant directions and whitening restores cosine's discriminative
  * power).
  *
  * Reference scope: the reference stores raw encoder vectors; this is one
  * of the mandated training-data-pipeline extensions.
  *
  * Scale shape — the k-means pattern (small-model driver math, distributed
  * everything else):
  *   1. moment collection is ONE map-side-combined aggregate pass
  *      producing a single row of `1 + d + d(d+1)/2` sums — no explode, no
  *      per-pair shuffle; the only driver transfer is that one row;
  *   2. the eigendecomposition runs driver-side on the d x d covariance
  *      (cyclic Jacobi — d is an embedding width, 64..4096, so this is
  *      microseconds to seconds of local math, never cluster work);
  *   3. projection/whitening is a narrow codegen'd literal-matrix
  *      expression chain over the corpus (same shape as
  *      [[graft.functions.VectorFunctions.projectedCoord]]) — one pass, no
  *      shuffle, no UDF.
  */
object Pca {

  /** Fitted model: per-dimension mean, principal axes as rows (descending
    * eigenvalue order, sign-canonicalized), and the eigenvalues.
    */
  final case class Model(mean: Array[Double], components: Array[Array[Double]],
                         eigenvalues: Array[Double]) {
    def dim: Int = mean.length
  }

  private def x(vecCol: String, i: Int): Column =
    element_at(col(vecCol), i + 1).cast("double")

  /** Upper-triangle covariance entries `(i, j, cov)` over the first `dim`
    * coordinates, 6-dp rounded — the oracle-checkable face of the moment
    * pass (same single-aggregate plan; the triangle is unfolded from the
    * one-row result lazily, no collect).
    */
  def covarianceFrame(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val pairs = for (i <- 0 until dim; j <- i until dim) yield (i, j)
    val aggs = (count(lit(1)).cast("double").as("__n") +:
      (0 until dim).map(i => sum(x(vecCol, i)).as(s"__sx$i"))) ++
      pairs.map { case (i, j) => sum(x(vecCol, i) * x(vecCol, j)).as(s"__sxy${i}_$j") }
    val one = Partitioning.ensureParallelism(df).agg(aggs.head, aggs.tail: _*)
    val entries = array(pairs.map { case (i, j) =>
      struct(lit(i.toLong).as("i"), lit(j.toLong).as("j"),
        // + 0.0 folds IEEE negative zero to +0.0 (engines disagree on
        // which side of round() it survives).
        (round((col(s"__sxy${i}_$j") - col(s"__sx$i") * col(s"__sx$j") / col("__n")) /
          col("__n"), 6) + lit(0.0)).as("cov"))
    }: _*)
    one.select(explode(entries).as("__e")).select(col("__e.i").as("i"),
      col("__e.j").as("j"), col("__e.cov").as("cov"))
  }

  /** One moment pass -> driver-side covariance matrix + mean. */
  private def moments(df: DataFrame, vecCol: String,
                      dim: Int): (Long, Array[Double], Array[Array[Double]]) = {
    val pairs = for (i <- 0 until dim; j <- i until dim) yield (i, j)
    val aggs = (count(lit(1)).as("__n") +:
      (0 until dim).map(i => sum(x(vecCol, i)).as(s"__sx$i"))) ++
      pairs.map { case (i, j) => sum(x(vecCol, i) * x(vecCol, j)).as(s"__sxy${i}_$j") }
    val row = Partitioning.ensureParallelism(df).agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(0)
    require(n > 1, s"PCA needs at least 2 rows, got $n")
    val sx = Array.tabulate(dim)(i => row.getDouble(1 + i))
    val cov = Array.ofDim[Double](dim, dim)
    pairs.zipWithIndex.foreach { case ((i, j), k) =>
      val c = (row.getDouble(1 + dim + k) - sx(i) * sx(j) / n) / n
      cov(i)(j) = c; cov(j)(i) = c
    }
    (n, sx.map(_ / n), cov)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: eigenvalues +
    * eigenvectors (as rows), descending, each vector's largest-|coord|
    * entry made positive so the basis is deterministic.
    */
  private[graft] def jacobiEigen(m: Array[Array[Double]])
    : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offDiag: Double =
      (0 until d).map(i => (i + 1 until d).map(j => a(i)(j) * a(i)(j)).sum).sum
    var sweep = 0
    while (sweep < 64 && offDiag > 1e-18) {
      for (p <- 0 until d - 1; q <- p + 1 until d) {
        val apq = a(p)(q)
        if (math.abs(apq) > 1e-300) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
          val t = math.signum(theta) match {
            case 0.0 => 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            case sgn => sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          }
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          var k = 0
          while (k < d) { // rotate columns p,q
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
            k += 1
          }
          k = 0
          while (k < d) { // rotate rows p,q
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
            k += 1
          }
          k = 0
          while (k < d) { // accumulate the rotation
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s * vkq
            v(k)(q) = s * vkp + c * vkq
            k += 1
          }
        }
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val eigenvalues = order.map(i => a(i)(i)).toArray
    val vectors = order.map { idx =>
      val vec = Array.tabulate(d)(r => v(r)(idx))
      val m0 = vec.indices.maxBy(i => math.abs(vec(i)))
      if (vec(m0) < 0) vec.map(-_) else vec
    }.toArray
    (eigenvalues, vectors)
  }

  /** Fit on the first `dim` coordinates of `vecCol`. */
  def fit(df: DataFrame, vecCol: String, dim: Int): Model = {
    val (_, mean, cov) = moments(df, vecCol, dim)
    val (ev, vecs) = jacobiEigen(cov)
    Model(mean, vecs, ev)
  }

  /** Project onto the top `k` principal axes (`p00..`), optionally
    * whitening (unit variance per output coordinate). A narrow
    * literal-matrix expression chain — codegen'd, one corpus pass.
    */
  def transform(df: DataFrame, model: Model, vecCol: String, k: Int,
                whiten: Boolean = false, eps: Double = 1e-9): DataFrame = {
    require(k > 0 && k <= model.dim, s"k must be in [1, ${model.dim}]")
    val outs = (0 until k).map { j =>
      val q = model.components(j)
      val terms = (0 until model.dim).map(i =>
        (x(vecCol, i) - lit(model.mean(i))) * lit(q(i)))
      val proj = terms.reduceLeft(_ + _)
      val scaled =
        if (whiten) proj / lit(math.sqrt(math.max(model.eigenvalues(j), eps)))
        else proj
      scaled.as(f"p$j%02d")
    }
    df.select(col("*") +: outs: _*)
  }
}
