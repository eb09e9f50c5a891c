package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SFT conversation prep: parse chat-JSON lines into structured messages and
  * flatten them through a training template (the ChatML shape used by most
  * instruction-tuning pipelines: `<|im_start|>role\ncontent<|im_end|>\n`
  * per turn). The reference has no chat path; this is a training-data
  * extension in the same family as the chunkers — the step between a raw
  * conversations.jsonl and the tokenizer.
  *
  * Everything is narrow codegen'd expressions (`from_json`, `transform`,
  * `array_join`): no UDF, no shuffle, linear at any corpus size. Malformed
  * JSON parses to null messages and renders to null output columns — count
  * them with a `chat_text IS NULL` filter rather than failing the batch
  * (same lenient-vs-strict split as JsonlSource).
  */
object ChatTemplate {

  /** `[{"role": ..., "content": ...}, ...]` */
  val MessagesSchema: ArrayType =
    ArrayType(StructType(Seq(
      StructField("role", StringType),
      StructField("content", StringType))))

  /** Parse a JSON-string column of chat messages into `outCol`
    * (array<struct<role,content>>; null when malformed).
    */
  def parseMessages(df: DataFrame, jsonCol: String,
                    outCol: String = "messages"): DataFrame =
    df.withColumn(outCol, from_json(col(jsonCol), MessagesSchema))

  /** Render one message struct through the template. */
  private def renderOne(m: Column): Column =
    concat(lit("<|im_start|>"), m.getField("role"), lit("\n"),
      m.getField("content"), lit("<|im_end|>\n"))

  /** Flatten structured messages into the training text plus audit columns:
    * `chat_text` (template-joined turns), `n_turns`, `roles` (comma-joined,
    * in order — lets a filter assert e.g. strict user/assistant
    * alternation downstream). Null messages -> null columns.
    */
  def render(df: DataFrame, messagesCol: String = "messages"): DataFrame = {
    val m = col(messagesCol)
    df.withColumn("chat_text",
        when(m.isNotNull, array_join(transform(m, renderOne(_)), "")))
      .withColumn("n_turns",
        when(m.isNotNull, size(m).cast("long")))
      .withColumn("roles",
        when(m.isNotNull, array_join(transform(m, _.getField("role")), ",")))
  }
}
