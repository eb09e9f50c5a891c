package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression for the Rademacher hyperplane-LSH signature
  * over an `array<float>` column — the banding kernel of the whole blocked
  * neighbor family ([[graft.operators.Similarity.bandedCandidatePairs]]),
  * promoted from a Scala UDF to a codegen'd expression:
  *
  *  - the ±1 sign matrix is a PURE function of (seed, plane, dim)
  *    ([[HyperplaneSigExpr.sign]] — fmix64 low bit), precomputed ONCE per
  *    plan for the first [[HyperplaneSigExpr.CachedDims]] dimensions and
  *    shipped as a codegen reference object, so per-row work is the dot
  *    loop alone (the UDF recomputed 5 hash ops per (plane, dim) per ROW);
  *  - `doGenCode` reads floats straight off `ArrayData` inside whole-stage
  *    codegen — no Seq[Float] boxing, no UDF serialization boundary;
  *  - arithmetic is bit-identical to the UDF form (double accumulation,
  *    left-to-right, sign picked by `dot >= 0`), which is also what the
  *    oracle replays via the inlined literal plane table (SparkEntry's
  *    `planesSql`); dims past the cache fall back to the same pure
  *    function.
  *
  * `numPlanes`/`seed` are plan-time constants (they parameterize the sign
  * matrix), so they are case-class fields, not child expressions.
  */
case class HyperplaneSigExpr(child: Expression, numPlanes: Int, seed: Int)
    extends UnaryExpression {

  require(numPlanes >= 1 && numPlanes <= 62,
    s"numPlanes must be in [1, 62], got $numPlanes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  // Null on a null child OR on an array containing a null element — a
  // hole in the vector has no sign contribution, and silently treating it
  // as 0.0 would let the expression and the DuckDB replay (whose DOUBLE[]
  // cast nulls the whole dot) diverge.
  override def nullable: Boolean = true

  override def prettyName: String = "graft_hyperplane_sig"

  @transient private lazy val signs: Array[Array[Double]] =
    Array.tabulate(numPlanes, HyperplaneSigExpr.CachedDims)(
      HyperplaneSigExpr.sign(seed, _, _))

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var j0 = 0
    while (j0 < n) {
      if (v.isNullAt(j0)) return null
      j0 += 1
    }
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      val row = signs(p)
      var dot = 0.0
      var j = 0
      while (j < n) {
        val s = if (j < row.length) row(j) else HyperplaneSigExpr.sign(seed, p, j)
        dot += s * v.getFloat(j)
        j += 1
      }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val signsRef = ctx.addReferenceObj("graftHyperplaneSigns", signs, "double[][]")
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val row = ctx.freshName("row")
      val s = ctx.freshName("s")
      val hasNull = ctx.freshName("hasNull")
      s"""
         |final int $n = $v.numElements();
         |boolean $hasNull = false;
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($v.isNullAt($j)) { $hasNull = true; break; }
         |}
         |if ($hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sig = 0L;
         |  for (int $p = 0; $p < $numPlanes; $p++) {
         |    final double[] $row = $signsRef[$p];
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      final double $s = $j < $row.length
         |        ? $row[$j]
         |        : graft.plans.HyperplaneSigExpr.sign($seed, $p, $j);
         |      $dot += $s * (double) $v.getFloat($j);
         |    }
         |    if ($dot >= 0) $sig |= (1L << $p);
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigExpr =
    copy(child = newChild)
}

object HyperplaneSigExpr {

  /** Dims with a precomputed sign column; beyond this the per-(plane, dim)
    * pure function runs inline with IDENTICAL arithmetic. 1024 covers
    * every common embedding width (384/768/1024) at ~8 KB/plane — the
    * tabulation rides every task binary as a codegen reference object, so
    * it is sized for the typical case, not the maximum (wider vectors just
    * pay the inline fmix64 for the tail dims).
    */
  val CachedDims: Int = 1024

  /** Component sign (+1/-1) of pseudo-random hyperplane `p` at dimension
    * `j` under `seed` — fmix64 of the packed coordinates, low bit picks
    * the sign. A pure compile-time function: SparkEntry's oracle SQL
    * inlines the whole matrix as a literal plane table from exactly this
    * function, which is what makes the banded search fully replayable.
    */
  def sign(seed: Int, p: Int, j: Int): Double = {
    var h = (seed.toLong << 32) ^ (p.toLong * 0x9E3779B97F4A7C15L) ^
      (j.toLong * 0xC2B2AE3D27D4EB4FL)
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    if ((h & 1L) == 0L) 1.0 else -1.0
  }

  /** Column API over the native expression. */
  def sig(vec: Column, numPlanes: Int, seed: Int): Column =
    GraftSqlBridge.column(
      HyperplaneSigExpr(GraftSqlBridge.expression(vec), numPlanes, seed))
}
