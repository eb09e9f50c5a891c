package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration for the custom `TypedImperativeAggregate`s — the
  * `(col, k)` shape both sketches share: second argument must be a
  * foldable integer literal (it sizes the aggregation buffer, so it cannot
  * be data-dependent).
  */
private[plans] object AggRegistration {

  type Entry = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  def entry(name: String, doc: String)(
      build: (Expression, Int) => Expression): Entry = {
    val builder: Seq[Expression] => Expression = { children =>
      require(children.length == 2, s"$name expects 2 arguments (col, k)")
      val k = children(1) match {
        case Literal(v: Int, _) => v
        case Literal(v: Long, _) => v.toInt
        case other => throw new IllegalArgumentException(
          s"$name: second argument must be an integer literal, got $other")
      }
      build(children.head, k)
    }
    (FunctionIdentifier(name),
      new ExpressionInfo(AggRegistration.getClass.getName, null, name, doc, ""),
      builder)
  }

  /** The custom-aggregate SQL surface (lazy: the entries live in the
    * aggregate companion objects, which call back into [[entry]] — eager
    * init here would read them mid-construction as nulls).
    */
  lazy val all: Seq[Entry] = Seq(KmvSketchAgg.sqlEntry, HeavyHittersAgg.sqlEntry)

  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
