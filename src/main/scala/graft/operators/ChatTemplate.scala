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

  /** Render through the Llama-2 chat template (Touvron et al. 2023 §A.4.4
    * wire format, shared by most Mistral-instruct checkpoints): an
    * optional leading system turn folds into the FIRST user turn inside
    * `<<SYS>>` markers, then each (user, assistant) pair becomes
    * `<s>[INST] {user} [/INST] {assistant} </s>`. Only complete pairs
    * render — a trailing unpaired user turn is a generation prompt, not
    * training text; `n_pairs` exposes the pair count for audits and
    * `has_system` whether the fold happened. Null messages or zero pairs
    * render a null `chat_text`. Pure codegen'd HOF expressions
    * (filter/transform/sequence), shuffle-free, linear.
    */
  def renderLlama2(df: DataFrame, messagesCol: String = "messages"): DataFrame = {
    val m = col(messagesCol)
    val sys = filter(m, x => x.getField("role") === "system")
    val sysContent = when(size(sys) > 0, element_at(sys, 1).getField("content"))
    // Pair by ADJACENCY (a user turn immediately answered by an assistant
    // turn), not by zipping the role-filtered arrays positionally — a
    // user double-send would otherwise attach the reply to the WRONG
    // prompt and silently drop a turn. Unanswered user turns don't render.
    val pairIdx = when(size(m) >= 2,
      filter(sequence(lit(1), size(m) - 1), i =>
        element_at(m, i).getField("role") === "user" &&
          element_at(m, i + 1).getField("role") === "assistant"))
      .otherwise(array().cast("array<int>"))
    val nPairs = size(pairIdx)
    val blocks = transform(pairIdx, (i, pos) => {
      val u = element_at(m, i).getField("content")
      val a = element_at(m, i + 1).getField("content")
      val head = when(pos === 0 && sysContent.isNotNull,
        concat(lit("<<SYS>>\n"), sysContent, lit("\n<</SYS>>\n\n")))
        .otherwise(lit(""))
      concat(lit("<s>[INST] "), head, u, lit(" [/INST] "), a, lit(" </s>"))
    })
    df.withColumn("chat_text",
        when(m.isNotNull && nPairs > 0, array_join(blocks, "")))
      .withColumn("n_pairs", when(m.isNotNull, nPairs.cast("long")))
      .withColumn("has_system", when(m.isNotNull, sysContent.isNotNull))
  }

  // Template overhead per turn: "<|im_start|>" (12) + "\n" (1) +
  // "<|im_end|>\n" (11) = 24 chars beyond role + content.
  private val TurnOverhead = 24
  private val HeaderOverhead = 13 // "<|im_start|>" + "\n"

  /** Loss-mask spans for SFT: the 1-based character span of every
    * ASSISTANT turn's content inside [[render]]'s `chat_text` — the
    * regions a supervised-fine-tuning loss keeps while prompt/system
    * turns are masked out (the standard ChatML recipe). One row per
    * assistant turn: `(…, turn, span_start, span_len)` with the identity
    * `substr(chat_text, span_start, span_len) == content` (pinned by
    * `ChatTemplateSpec`); conversations with null messages produce no
    * rows.
    *
    * Pure arithmetic over the message array (per-turn rendered lengths +
    * an O(turns²) prefix sum inside one codegen'd HOF — turns are tens,
    * never corpus-sized), so the whole operator is narrow, shuffle-free,
    * and SQL-replayable.
    *
    * Malformed conversations produce NO rows, same lenient posture as
    * [[render]]: null/empty message arrays, and — crucially — any turn
    * with a null role or content (a null-rendered turn is SKIPPED by
    * `array_join` in the rendered text, so offsets computed over it would
    * silently misalign the loss mask; dropping the conversation is the
    * only honest answer).
    */
  def assistantSpans(df: DataFrame, messagesCol: String = "messages"): DataFrame = {
    val m = col(messagesCol)
    val lens = transform(m, t => lit(TurnOverhead)
      + length(t.getField("role")) + length(t.getField("content")))
    val spans = transform(sequence(lit(1), size(m)), i => {
      val before = aggregate(slice(col("__lens"), lit(1), i - 1),
        lit(0), (a, x) => a + x)
      val t = element_at(m, i)
      struct(i.as("turn"), t.getField("role").as("role"),
        (before + lit(HeaderOverhead) + length(t.getField("role")) + 1)
          .as("span_start"),
        length(t.getField("content")).as("span_len"))
    })
    df.filter(m.isNotNull && size(m) > 0 // sequence(1, 0) would step -1
        && !exists(m, t =>
          t.getField("role").isNull || t.getField("content").isNull))
      .withColumn("__lens", lens)
      .select(col("*"), explode(spans).as("__s"))
      .filter(col("__s.role") === "assistant")
      .withColumn("turn", col("__s.turn").cast("long"))
      .withColumn("span_start", col("__s.span_start").cast("long"))
      .withColumn("span_len", col("__s.span_len").cast("long"))
      .drop("__s", "__lens")
  }
}
