package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.functions.Normalize
import graft.operators.{Classifier, Dsir, Pca}

/** Invariants of the round-7 operators under generated inputs. */
object RoundSevenProps extends Properties("RoundSeven") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkTestBase.spark

  // --- DSIR selection -----------------------------------------------------

  private val weightGen = Gen.choose(-5, 5).map(_ / 2.0) // coarse -> many ties

  property("selectTopFraction keeps exactly ceil(f*n), a prefix of the order") =
    forAll(Gen.nonEmptyListOf(weightGen), Gen.choose(0.0, 1.0)) { (ws, f) =>
      import spark.implicits._
      val df = ws.zipWithIndex.map { case (w, i) => (i.toLong, 0L, w) }
        .toDF("doc_id", "n_feats", "log_weight")
      val out = Dsir.selectTopFraction(df, "doc_id", f)
        .select("doc_id", "log_weight", "selected")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
      val k = math.ceil(ws.length * f).toLong
      val ordered = out.sortBy { case (id, w, _) => (-w, id) }
      ordered.count(_._3) == k &&
        ordered.take(k.toInt).forall(_._3) && ordered.drop(k.toInt).forall(!_._3)
    }

  property("identical texts get identical DSIR weights") =
    forAll(Gen.choose(1, 25), Gen.choose(2, 6)) { (seed, n) =>
      import spark.implicits._
      val text = (1 to 8).map(i => s"w${(seed * i) % 7}").mkString(" ")
      val raw = (0 until n).map(i => (i.toLong, text)) :+ (99L, "w1 w2 w3")
      val df = raw.toDF("doc_id", "text")
      val w = Dsir.importanceWeights(df, df.filter(col("doc_id") === 0), "text", "doc_id")
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      (0 until n).map(i => w(i.toLong)).distinct.size == 1
    }

  // --- Unicode canonicalization ------------------------------------------

  private val charGen: Gen[Char] = Gen.frequency(
    (6, Gen.alphaNumChar),
    (2, Gen.oneOf(' ', '\t', '\n')),
    (1, Gen.oneOf('\u201C', '\u201D', '\u2018', '\u2019', '\u2014', '\u2026',
      '\u00A0', '\u200B', '\u0007', '\u00E9', '\u0301')))
  private val strGen = Gen.listOf(charGen).map(_.mkString)

  property("cleanText is idempotent and scrubs the mapped classes") =
    forAll(Gen.listOfN(6, strGen)) { ss =>
      import spark.implicits._
      val out = ss.toDF("t").select(Normalize.cleanText(col("t")).as("o"))
        .as[String].collect()
      val banned = "\u201C\u201D\u2018\u2019\u2014\u2013\u00A0\u2007\u202F" +
        "\u200B\u200C\u200D\uFEFF\u2026\t\n\u0007"
      val again = out.toSeq.toDF("t").select(Normalize.cleanText(col("t")).as("o"))
        .as[String].collect()
      out.forall(s => !s.exists(banned.contains(_))) &&
        out.forall(s => !s.startsWith(" ") && !s.endsWith(" ") && !s.contains("  ")) &&
        again.sameElements(out)
    }

  // --- CSV round-trip -----------------------------------------------------

  // no raw newline: parseLines is line-oriented and to_csv's single-record
  // mode escapes embedded newlines (real files with multiLine=true cover
  // that case in SourcesSpec); quoting/commas/unicode are the point here
  private val csvCellGen: Gen[String] = Gen.listOf(Gen.frequency(
    (6, Gen.alphaNumChar),
    (2, Gen.oneOf(',', '"', ' ', '\t', ';')),
    (1, Gen.oneOf('é', '“')))).map(_.mkString)

  property("csv parseLines round-trips arbitrary cell content through real quoting") =
    forAll(Gen.listOfN(4, Gen.zip(csvCellGen, csvCellGen))) { cells =>
      import scala.jdk.CollectionConverters._
      import spark.implicits._
      // shrinking walks chars toward the zero char - sanitize controls; the
      // writer-side trim is a to_csv default we must disable to test the
      // PARSER's fidelity rather than the generator's
      def clean(s: String) = s.map(c => if (c < ' ') ' ' else c)
      val rows = cells.zipWithIndex.map { case ((t, m), i) =>
        (i.toString, clean(t), clean(m))
      }
      val lines = rows.toDF("id", "text", "meta")
        .select(org.apache.spark.sql.functions.to_csv(
            org.apache.spark.sql.functions.struct(col("text"), col("id"), col("meta")),
            Map("escape" -> "\"", "ignoreLeadingWhiteSpace" -> "false",
              "ignoreTrailingWhiteSpace" -> "false").asJava).as("value"),
          org.apache.spark.sql.functions.lit("mem").as("__file"))
      val out = graft.sources.CsvSource
        .parseLines(lines, "text", Some("id"), Seq("meta"), ",", strict = true)
        .collect()
        .map(r => r.getAs[String]("source").stripPrefix("mem#") ->
          r.getAs[String]("content")).toMap
      // the source's blank-drop uses Spark trim (strips ' ' only, not \n)
      def sparkBlank(s: String): Boolean =
        s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').isEmpty
      val expected = rows.filterNot(r => sparkBlank(r._2))
        .map { case (id, t, _) => id -> t }.toMap
      out == expected
    }

  // --- Calibration -------------------------------------------------------

  property("calibration bins partition the rows and bound their means") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 1000000), Gen.oneOf(0.0, 1.0)))) { rows =>
      import spark.implicits._
      val df = rows.map { case (p, y) => (math.rint(p / 1e6 * 1e6) / 1e6, y) }
        .toDF("prob", "label")
      val out = Classifier.calibrationFrame(df, "prob", "label").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      out.map(_._2).sum == rows.length &&
        out.forall { case (b, _, mp, pr) =>
          b >= 0 && b <= 9 && pr >= 0.0 && pr <= 1.0 &&
            mp >= b / 10.0 - 1e-6 && mp <= (b + 1) / 10.0 + (if (b == 9) 1e-6 else 1e-6)
        }
    }

  // --- PCA ---------------------------------------------------------------

  property("covariance spectrum is PSD and traces to total variance") =
    forAll(Gen.listOfN(40, Gen.zip(Gen.choose(-100, 100), Gen.choose(-100, 100)))) { pts =>
      import spark.implicits._
      val df = pts.zipWithIndex
        .map { case ((a, b), i) => (i.toLong, Array(a / 10.0f, (a / 20.0 + b / 10.0).toFloat)) }
        .toDF("id", "embedding")
      val m = Pca.fit(df, "embedding", 2)
      val xs = pts.map(_._1 / 10.0)
      val ys = pts.map { case (a, b) => (a / 20.0f + b / 10.0f).toDouble }
      def variance(v: Seq[Double]): Double = {
        val mu = v.sum / v.length
        v.map(x => (x - mu) * (x - mu)).sum / v.length
      }
      val trace = variance(xs.map(_.toDouble)) + variance(ys)
      m.eigenvalues.forall(_ >= -1e-9) &&
        math.abs(m.eigenvalues.sum - trace) < math.max(1e-6, trace * 1e-3)
    }
}
