package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance/similarity kernels as pure Column expressions.
  *
  * These compose `zip_with` + `aggregate` from
  * `org.apache.spark.sql.functions` so they stay inside whole-stage codegen —
  * no UDF serialization, no Python boundary, columnar all the way. This is
  * the kernel behind the reference's vector top-k search
  * (`yamlpipe/core/evaluation.py:55-64`, delegated there to LanceDB/Chroma;
  * here it is a Catalyst expression the optimizer can see through).
  *
  * All arithmetic is performed in double precision (inputs are
  * `array<float>`): left-to-right summation, so results are deterministic
  * and reproducible across runs and engines.
  */
object VectorFunctions {

  /** Dot product of two float/double array columns, computed in double. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Squared L2 norm. */
  def normSq(a: Column): Column =
    aggregate(
      transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 (Euclidean) norm. */
  def l2Norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity in [-1, 1]; null-safe on zero-norm vectors (returns
    * null rather than NaN so downstream filters behave).
    */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(null).cast("double"))
      .otherwise(dotProduct(a, b) / denom)
  }

  /** Cosine distance = 1 - cosine similarity. */
  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - cosineSimilarity(a, b)

  /** Single-pass cosine similarity as a UDF — bit-identical to
    * [[cosineSimilarity]] (double accumulation, left-to-right, same
    * dot/(sqrt*sqrt) shape, null on zero norms) but one primitive array walk
    * instead of three higher-order-function array traversals. Use in hot
    * pairwise joins (near-dup verification), where the HOF expression's
    * per-row array allocations dominate; keep the expression form where a
    * DuckDB oracle must see the same SQL shape.
    */
  val cosineSimilarityFast = udf((a: Seq[Float], b: Seq[Float]) => {
    if (a == null || b == null) null
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
    }
  })

  /** Squared Euclidean distance. */
  def l2DistanceSq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)

  /** Euclidean distance (the reference sink's default metric — LanceDB
    * defaults to L2).
    */
  def l2Distance(a: Column, b: Column): Column = sqrt(l2DistanceSq(a, b))

  /** L2-normalize an array<float>/array<double> column (unit vector);
    * zero vectors pass through unchanged.
    */
  def l2Normalize(a: Column): Column = {
    val n = l2Norm(a)
    when(n === 0.0, a.cast("array<double>"))
      .otherwise(transform(a, x => x.cast("double") / n))
  }

  // --------------------------------------------------------------------
  // int8 symmetric quantization (ANN storage / bandwidth path: 4x fewer
  // bytes per vector than float32, dot products in integer SIMD)
  // --------------------------------------------------------------------

  /** Per-vector symmetric scale: max|x| / 127 (0.0 for empty/all-zero). */
  def int8Scale(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double")))) / 127.0

  /** Quantize to array<int> in [-127, 127] against `scale`. Rounding is
    * floor(x/scale + 0.5) — half-up toward +inf in BOTH IEEE engines (no
    * locale/banker's ambiguity), exact in double.
    */
  def quantizeInt8(a: Column, scale: Column): Column =
    when(scale === 0.0, transform(a, _ => lit(0)))
      .otherwise(transform(a, x =>
        least(greatest(floor(x.cast("double") / scale + 0.5), lit(-127.0)), lit(127.0))
          .cast("int")))

  /** Mean absolute reconstruction error of the (quantized, scale) pair vs
    * the original — the quality metric a pipeline thresholds before
    * swapping its ANN path to int8. Left-to-right summation (oracle
    * parity); empty vectors yield 0.0.
    */
  def dequantMeanAbsError(a: Column, q: Column, scale: Column): Column = {
    val errs = zip_with(a, q, (x, qi) => abs(x.cast("double") - qi.cast("double") * scale))
    when(size(a) === 0, lit(0.0))
      .otherwise(aggregate(errs, lit(0.0), (acc, e) => acc + e) / size(a).cast("double"))
  }

  // --------------------------------------------------------------------
  // Signed random projection (Achlioptas/JL): dimensionality reduction for
  // the ANN scale path — project float vectors onto +-1 hyperplane rows,
  // shrinking per-vector bytes before LSH/IVF while approximately
  // preserving cosine geometry.
  // --------------------------------------------------------------------

  /** Deterministic +-1 sign matrix (`outDim x dim`), derived per (seed, j,
    * i) from an fmix64 finalizer. Pure function of its arguments — both
    * the Spark expression and an external oracle can embed the SAME
    * literals, so projections are engine-exact.
    */
  def signMatrix(dim: Int, outDim: Int, seed: Long = 42L): Array[Array[Int]] =
    Array.tabulate(outDim, dim) { (j, i) =>
      var h = seed ^ (j.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xC2B2AE3D27D4EB4FL)
      h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
      if ((h & 1L) == 0L) 1 else -1
    }

  /** One projected coordinate `j`: `sum_i sign(j,i) * v(i) / sqrt(outDim)`
    * as a codegen'd expression chain (no UDF) — a left-to-right sum of
    * literal-signed terms, mirrorable token-for-token in SQL.
    */
  def projectedCoord(a: Column, signs: Array[Array[Int]], j: Int): Column = {
    val row = signs(j)
    val terms = row.indices.map { i =>
      val v = element_at(a, i + 1).cast("double")
      if (row(i) > 0) v else -v
    }
    terms.reduceLeft(_ + _) / math.sqrt(signs.length.toDouble)
  }

  // --------------------------------------------------------------------
  // Deterministic random rotation (the FAISS RandomRotationMatrix / OPQ
  // pre-transform): an orthonormal change of basis applied before product
  // quantization spreads anisotropic variance evenly across PQ subspaces
  // at ZERO memory cost — the rotation is dim x dim literals applied at
  // encode/query time, never stored per vector.
  // --------------------------------------------------------------------

  /** Deterministic random ROTATION matrix (`dim x dim`, orthonormal, rows
    * are the output basis): modified Gram–Schmidt over standard Gaussians
    * derived per (seed, j, i) from the [[signMatrix]] fmix64 finalizer via
    * Box–Muller — StrictMath throughout so every platform generates the
    * IDENTICAL matrix. Pure function of (dim, seed): the Spark expression
    * and an external oracle embed the SAME literals, so rotations are
    * engine-exact (the sign-matrix-inlining discipline).
    */
  def rotationMatrix(dim: Int, seed: Long = 1234L): Array[Array[Double]] = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    def uniform(j: Int, i: Int): Double = {
      var h = seed ^ (j.toLong * 0x9E3779B97F4A7C15L +
        i.toLong * 0xC2B2AE3D27D4EB4FL)
      h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
      // 53 high bits -> (0, 1): the +0.5 keeps log() off exact zero.
      ((h >>> 11).toDouble + 0.5) / (1L << 53).toDouble
    }
    val q = Array.tabulate(dim, dim) { (j, i) =>
      StrictMath.sqrt(-2.0 * StrictMath.log(uniform(j, 2 * i))) *
        StrictMath.cos(2.0 * StrictMath.PI * uniform(j, 2 * i + 1))
    }
    var r = 0
    while (r < dim) { // modified Gram–Schmidt, rows in index order
      var p = 0
      while (p < r) {
        var dot = 0.0; var i = 0
        while (i < dim) { dot += q(r)(i) * q(p)(i); i += 1 }
        i = 0
        while (i < dim) { q(r)(i) -= dot * q(p)(i); i += 1 }
        p += 1
      }
      var n = 0.0; var i = 0
      while (i < dim) { n += q(r)(i) * q(r)(i); i += 1 }
      val inv = 1.0 / StrictMath.sqrt(n)
      i = 0
      while (i < dim) { q(r)(i) *= inv; i += 1 }
      r += 1
    }
    q
  }

  /** Rotate an `array<float>` embedding by a literal rotation matrix:
    * out(j) = round(sum_i v(i) * m(j)(i), roundDp) cast back to float32.
    * A UDF, deliberately — the expression-chain form is `dim^2` Catalyst
    * nodes and Janino spends MINUTES compiling it (the
    * [[cosineSimilarityFast]] / `Pq.encodeColumn` tradeoff), while the
    * arithmetic contract stays engine-exact: left-to-right double
    * accumulation (SQL mirrors it with `list_dot_product` against the
    * same literal row) and Spark-`round` semantics via
    * `BigDecimal.HALF_UP` (= DuckDB's round-half-away-from-zero). Null
    * vectors stay null; a wrong-width vector fails loudly (the
    * clusteredFixture contract).
    */
  def rotatedVector(a: Column, matrix: Array[Array[Double]],
                    roundDp: Int = 6): Column = {
    val dim = matrix.length
    val rotate = udf((v: Seq[Float]) => {
      if (v == null) null
      else {
        require(v.length == dim,
          s"graft.rotatedVector: vector length ${v.length} != dim=$dim")
        Array.tabulate(dim) { j =>
          val row = matrix(j)
          var s = 0.0
          var i = 0
          while (i < dim) { s += v(i).toDouble * row(i); i += 1 }
          java.math.BigDecimal.valueOf(s)
            .setScale(roundDp, java.math.RoundingMode.HALF_UP)
            .doubleValue.toFloat
        }
      }
    })
    rotate(a)
  }
}
