package graft

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Typed (`Dataset[T]`) view of the canonical document frame.
  *
  * The engine's operators stay `DataFrame`-first on purpose — Catalyst
  * sees through Column expressions (pushdown, pruning, codegen) but NOT
  * through JVM lambdas, so expression-form is the scale path. This facade
  * is for the place type safety genuinely helps: LIBRARY CONSUMERS writing
  * custom per-document logic that has no expression form. `.as[Doc]`
  * validates the canonical schema at analysis time (a renamed column fails
  * the conversion loudly instead of nulling a field), and the lambda gets
  * compile-time fields instead of stringly `getAs` calls.
  *
  * Scale note for users: a `mapDocs`/`filterDocs` lambda is a codegen
  * fence — filters written this way do NOT push into the parquet scan.
  * Keep cheap predicates in Column form BEFORE dropping to typed space.
  */
object Typed {

  /** One canonical document (`sources/Sources.scala` schema contract). */
  final case class Doc(content: String, source: String,
                       fingerprint: Option[String],
                       metadata: Map[String, String])

  implicit val docEncoder: Encoder[Doc] = Encoders.product[Doc]

  /** Typed view of a canonical frame; fails at analysis time if the frame
    * doesn't carry the contract columns.
    */
  def docs(df: DataFrame): Dataset[Doc] =
    df.select(col("content"), col("source"), col("fingerprint"), col("metadata"))
      .as[Doc]

  /** Back to the canonical frame (column order restored). */
  def frame(ds: Dataset[Doc]): DataFrame =
    ds.toDF().select(col("content"), col("source"), col("fingerprint"), col("metadata"))

  /** Custom per-document transform in typed space; returns the canonical
    * frame so the result plugs straight back into the operator surface.
    */
  def mapDocs(df: DataFrame)(f: Doc => Doc): DataFrame =
    frame(docs(df).map(f))

  /** Custom typed predicate (see the scale note above — prefer Column
    * filters when an expression form exists).
    */
  def filterDocs(df: DataFrame)(p: Doc => Boolean): DataFrame =
    frame(docs(df).filter(p))
}
