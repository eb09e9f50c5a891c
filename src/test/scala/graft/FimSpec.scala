package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Fim

/** Laws of the FIM transform: lossless permutation (the three spans
  * reassemble the original text), deterministic draws, rate bounds, and
  * the pass-through mode.
  */
class FimSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs = {
    import spark.implicits._
    (1L to 200L).map(i => (i, s"doc $i " + ("abcdefghij" * (1 + (i % 7).toInt))))
      .toDF("doc_id", "text")
  }

  test("psm/spm examples reassemble to the original text; none passes through") {
    val out = Fim.transform(docs, "text", "doc_id").collect()
    assert(out.length == 200)
    out.foreach { r =>
      val (text, mode, fim) = (r.getAs[String]("text"),
        r.getAs[String]("fim_mode"), r.getAs[String]("fim_text"))
      mode match {
        case "none" => assert(fim == text)
        case "psm" =>
          val m = "(?s)^<PRE>(.*)<SUF>(.*)<MID>(.*)$".r.findFirstMatchIn(fim).get
          assert(m.group(1) + m.group(3) + m.group(2) == text, fim)
        case "spm" =>
          val m = "(?s)^<SUF>(.*)<PRE>(.*)<MID>(.*)$".r.findFirstMatchIn(fim).get
          assert(m.group(2) + m.group(3) + m.group(1) == text, fim)
        case other => fail(s"unknown mode $other")
      }
    }
    // both permutation modes and the pass-through actually occur at the
    // default rates over 200 docs
    val modes = out.map(_.getAs[String]("fim_mode")).groupBy(identity)
      .view.mapValues(_.length).toMap
    assert(modes.keySet == Set("none", "psm", "spm"), modes.toString)
    // fim rate ~0.5: transformed count within a generous band
    val transformed = modes("psm") + modes("spm")
    assert(transformed > 60 && transformed < 140, modes.toString)
  }

  test("deterministic under (content, salt); rate 0 and 1 are exact") {
    val a = Fim.transform(docs, "text", "doc_id").orderBy("doc_id")
      .select("fim_text").collect().map(_.getString(0)).toSeq
    val b = Fim.transform(docs, "text", "doc_id").orderBy("doc_id")
      .select("fim_text").collect().map(_.getString(0)).toSeq
    assert(a == b)
    assert(Fim.transform(docs, "text", "doc_id", fimRate = 0.0)
      .filter(col("fim_mode") =!= "none").count() == 0)
    assert(Fim.transform(docs, "text", "doc_id", fimRate = 1.0)
      .filter(col("fim_mode") === "none").count() == 0)
    intercept[IllegalArgumentException] {
      Fim.transform(docs, "text", "doc_id", fimRate = 1.5)
    }
  }
}
