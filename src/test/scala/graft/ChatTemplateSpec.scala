package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.operators.ChatTemplate

/** Conversation parse + ChatML render: faithful round trip, malformed-JSON
  * leniency, and template shape.
  */
class ChatTemplateSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("parse + render produces the exact ChatML text, turn count and roles") {
    val raw = Seq(
      (1L, """[{"role":"user","content":"hi there"},{"role":"assistant","content":"hello!"}]"""),
      (2L, """[{"role":"system","content":"be brief"},{"role":"user","content":"q"},{"role":"assistant","content":"a"}]""")
    ).toDF("id", "raw")
    val out = ChatTemplate.render(ChatTemplate.parseMessages(raw, "raw"))
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("chat_text"), r.getAs[Long]("n_turns"),
          r.getAs[String]("roles")))).toMap
    assert(out(1L) == ((
      "<|im_start|>user\nhi there<|im_end|>\n<|im_start|>assistant\nhello!<|im_end|>\n",
      2L, "user,assistant")))
    assert(out(2L)._2 == 3L && out(2L)._3 == "system,user,assistant")
    assert(out(2L)._1.startsWith("<|im_start|>system\nbe brief<|im_end|>\n"))
  }

  test("malformed JSON and nulls render to null columns, not failures") {
    val raw = Seq(
      (1L, "not json at all"),
      (2L, null.asInstanceOf[String]),
      (3L, """[{"role":"user","content":"ok"}]""")
    ).toDF("id", "raw")
    val out = ChatTemplate.render(ChatTemplate.parseMessages(raw, "raw"))
    val byId = out.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).isNullAt(out.columns.indexOf("chat_text")))
    assert(byId(2L).isNullAt(out.columns.indexOf("chat_text")))
    assert(byId(3L).getAs[String]("chat_text") == "<|im_start|>user\nok<|im_end|>\n")
    // Null count is the malformed-line audit a pipeline filters on.
    assert(out.filter(col("chat_text").isNull).count() == 2)
  }

  test("renderLlama2: system fold, multi-pair blocks, unpaired prompt dropped") {
    val raw = Seq(
      (1L, """[{"role":"system","content":"be brief"},{"role":"user","content":"q1"},{"role":"assistant","content":"a1"},{"role":"user","content":"q2"},{"role":"assistant","content":"a2"}]"""),
      (2L, """[{"role":"user","content":"q"},{"role":"assistant","content":"a"},{"role":"user","content":"dangling"}]"""),
      (3L, """[{"role":"user","content":"only a prompt"}]"""),
      (4L, "not json")
    ).toDF("id", "raw")
    val out = ChatTemplate.renderLlama2(ChatTemplate.parseMessages(raw, "raw"))
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(1L).getAs[String]("chat_text") ==
      "<s>[INST] <<SYS>>\nbe brief\n<</SYS>>\n\nq1 [/INST] a1 </s>" +
        "<s>[INST] q2 [/INST] a2 </s>")
    assert(out(1L).getAs[Long]("n_pairs") == 2L &&
      out(1L).getAs[Boolean]("has_system"))
    // no system: no SYS fold; the dangling user turn does not render
    assert(out(2L).getAs[String]("chat_text") == "<s>[INST] q [/INST] a </s>")
    assert(out(2L).getAs[Long]("n_pairs") == 1L &&
      !out(2L).getAs[Boolean]("has_system"))
    // prompt-only conversation: zero pairs -> null text, count preserved
    assert(out(3L).isNullAt(out(3L).fieldIndex("chat_text")))
    assert(out(3L).getAs[Long]("n_pairs") == 0L)
    // malformed -> all null
    assert(out(4L).isNullAt(out(4L).fieldIndex("chat_text")) &&
      out(4L).isNullAt(out(4L).fieldIndex("n_pairs")))
  }

  test("renderLlama2 pairs by adjacency: a double-send never misattributes the reply") {
    val raw = Seq(
      // user1 went unanswered; assistant1 answered user2 — the rendered
      // pair must be (user2, assistant1), not (user1, assistant1)
      (1L, """[{"role":"system","content":"s"},{"role":"user","content":"u1"},{"role":"user","content":"u2"},{"role":"assistant","content":"a1"}]"""),
      // assistant double-reply: only the adjacent one pairs
      (2L, """[{"role":"user","content":"u"},{"role":"assistant","content":"a"},{"role":"assistant","content":"followup"}]""")
    ).toDF("id", "raw")
    val out = ChatTemplate.renderLlama2(ChatTemplate.parseMessages(raw, "raw"))
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(1L).getAs[String]("chat_text") ==
      "<s>[INST] <<SYS>>\ns\n<</SYS>>\n\nu2 [/INST] a1 </s>")
    assert(out(1L).getAs[Long]("n_pairs") == 1L)
    assert(out(2L).getAs[String]("chat_text") == "<s>[INST] u [/INST] a </s>")
    assert(out(2L).getAs[Long]("n_pairs") == 1L)
  }

  test("special characters survive the JSON round trip into the template") {
    val content = "line1\nline2 \"quoted\" back\\slash café —"
    val raw = Seq((1L, s"""[{"role":"user","content":${jsonStr(content)}}]"""))
      .toDF("id", "raw")
    val got = ChatTemplate.render(ChatTemplate.parseMessages(raw, "raw"))
      .collect()(0).getAs[String]("chat_text")
    assert(got == s"<|im_start|>user\n$content<|im_end|>\n")
  }

  test("assistantSpans: substr(chat_text, start, len) == assistant content") {
    import spark.implicits._
    val raw = Seq(
      (1L, """[{"role":"system","content":"be brief"},
             |{"role":"user","content":"What is Spark?"},
             |{"role":"assistant","content":"A distributed engine."},
             |{"role":"user","content":"More?"},
             |{"role":"assistant","content":"Yes — much more."}]"""
        .stripMargin.replace("\n", "")),
      (2L, """[{"role":"user","content":"no assistant turn"}]"""),
      (3L, "not json at all"),
      (4L, "[]"), // empty conversation: no rows, no sequence(1,0) blowup
      (5L, """[{"role":"user"},{"role":"assistant","content":"hi"}]"""))
      .toDF("id", "raw") // 5: null content -> malformed -> dropped whole
    val parsed = ChatTemplate.parseMessages(raw, "raw")
    val rendered = ChatTemplate.render(parsed)
    val spans = ChatTemplate.assistantSpans(parsed)
      .join(rendered.select(col("id"), col("chat_text")), "id")
      .collect()
    // conv 1 has exactly two assistant turns (3 and 5); convs 2/3 none
    assert(spans.map(r => (r.getAs[Long]("id"), r.getAs[Long]("turn"))).toSet
      == Set((1L, 3L), (1L, 5L)))
    // the span identity: the masked-in region IS the assistant content
    val contents = spans.map { r =>
      val text = r.getAs[String]("chat_text")
      text.substring(r.getAs[Long]("span_start").toInt - 1,
        r.getAs[Long]("span_start").toInt - 1 + r.getAs[Long]("span_len").toInt)
    }.toSet
    assert(contents == Set("A distributed engine.", "Yes — much more."))
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c => c.toString
    } + "\""
}
