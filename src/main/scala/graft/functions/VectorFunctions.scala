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
}
