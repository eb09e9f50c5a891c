package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.Typed.Doc

class TypedSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def canonical() = Seq(
    ("hello world", "s1", Some("f1"), Map("lang" -> "en")),
    ("short", "s2", None, Map.empty[String, String])
  ).toDF("content", "source", "fingerprint", "metadata")

  test("docs round-trips the canonical frame through Dataset[Doc]") {
    val ds = Typed.docs(canonical())
    val back = Typed.frame(ds)
    assert(back.columns.toSeq == Seq("content", "source", "fingerprint", "metadata"))
    val rows = ds.collect().sortBy(_.source)
    assert(rows(0) == Doc("hello world", "s1", Some("f1"), Map("lang" -> "en")))
    assert(rows(1).fingerprint.isEmpty) // nullable column -> Option
  }

  test("mapDocs/filterDocs run typed lambdas and return canonical frames") {
    val out = Typed.mapDocs(canonical())(d =>
      d.copy(content = d.content.toUpperCase,
        metadata = d.metadata + ("touched" -> "yes")))
    val got = out.orderBy("source").collect()
    assert(got(0).getAs[String]("content") == "HELLO WORLD")
    assert(got(0).getAs[Map[String, String]]("metadata")("touched") == "yes")
    val kept = Typed.filterDocs(canonical())(_.content.length > 6)
    assert(kept.count() == 1)
  }

  test("a frame missing a contract column fails loudly at analysis time") {
    val bad = Seq(("x", "s")).toDF("content", "source")
    intercept[org.apache.spark.sql.AnalysisException](Typed.docs(bad))
  }

  test("typed view works on a real source load") {
    val dir = tempDir("graft-typed")
    java.nio.file.Files.writeString(dir.resolve("a.txt"), "typed facade doc")
    val df = graft.sources.LocalFileSource(dir.toString).load(spark)
    val ds = Typed.docs(df)
    assert(ds.collect().head.content.contains("typed facade"))
    assert(Typed.frame(ds).filter(col("fingerprint").isNotNull).count() == 1)
  }
}
