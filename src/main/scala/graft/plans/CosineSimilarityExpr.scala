package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` columns — the hot kernel of the search/eval/near-dup
  * paths, promoted from a Scala UDF to a codegen'd expression:
  *
  *  - `doGenCode` emits a primitive `float[]`-over-`ArrayData` loop that
  *    stays inside whole-stage codegen — no UDF serialization boundary, no
  *    Seq[Float] boxing per row, no closure call;
  *  - arithmetic is the engine-wide canonical shape (double accumulation,
  *    left-to-right, `dot / (sqrt(na) * sqrt(nb))`) so results are
  *    bit-identical to [[graft.functions.VectorFunctions.cosineSimilarity]]
  *    and to the DuckDB oracle formulation;
  *  - zero-norm input produces NULL (not NaN), matching the UDF/HOF forms.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  // Result can be null on zero-norm inputs even when both children are
  // non-null.
  override def nullable: Boolean = true

  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xv = (double) $a.getFloat($i);
         |  final double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |final double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($denom == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / $denom;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarityExpr {

  /** Column API over the native expression. */
  def cosine(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineSimilarityExpr(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  val functionName = "graft_cosine"

  private val info = new ExpressionInfo(
    classOf[CosineSimilarityExpr].getName, null, functionName,
    "_FUNC_(a, b) - cosine similarity of two float vectors (NULL on zero norm)",
    "")

  private val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, s"$functionName expects 2 arguments")
    CosineSimilarityExpr(children.head, children(1))
  }

  /** Register `graft_cosine` in a session's function registry so SQL text
    * (`SELECT graft_cosine(a, b)`) can use it.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(functionName), info, builder)
}

/** `SparkSessionExtensions` installer: enables
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` so every
  * session in a deployment has the native functions without code changes.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier(CosineSimilarityExpr.functionName),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName,
        null, CosineSimilarityExpr.functionName,
        "_FUNC_(a, b) - cosine similarity of two float vectors", ""),
      { children: Seq[Expression] =>
        require(children.length == 2, "graft_cosine expects 2 arguments")
        CosineSimilarityExpr(children.head, children(1))
      }))
    // The scalar graft_* surface (quality, lang-id, PII, tokens, vector
    // ops) — same builders as GraftFunctions.register — plus the custom
    // sketch aggregates (approx_top_items, kmv_sketch).
    GraftFunctions.all.foreach(ext.injectFunction)
    AggRegistration.all.foreach(ext.injectFunction)
  }
}
