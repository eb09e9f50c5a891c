package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.{ChatTemplate, Fim, Search, Similarity}

/** Invariants of the round-10 determinism kernels under generated inputs
  * (r10 verdict #5): FIM spans reassemble losslessly for EVERY md5-drawn
  * split point, rates are exact at 0/1, and assistant loss-mask spans cut
  * the rendered text back to each turn's exact content — including empty
  * content and arbitrary role mixes.
  */
object RoundElevenProps extends Properties("RoundEleven") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkTestBase.spark

  // --- FIM ------------------------------------------------------------------

  // Alphanumeric text keeps the sentinel strings unforgeable, so the
  // reassembly parse below is unambiguous.
  private val docsGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 12)
    docs <- Gen.listOfN(n, for {
      id <- Gen.choose(0L, Long.MaxValue - 1)
      len <- Gen.choose(0, 40)
      s <- Gen.listOfN(len, Gen.alphaNumChar).map(_.mkString)
    } yield (id, s))
  } yield docs

  property("Fim at fimRate=1 transforms every doc and reassembles losslessly") =
    forAll(docsGen) { docs =>
      import spark.implicits._
      val got = Fim.transform(docs.toDF("doc_id", "text"), "text", "doc_id",
          fimRate = 1.0)
        .select("doc_id", "fim_mode", "fim_text").collect()
      val byId = docs.toMap
      got.nonEmpty && got.forall { r =>
        val text = byId(r.getLong(0))
        val s = r.getString(2)
        r.getString(1) match {
          case "psm" => // <PRE> prefix <SUF> suffix <MID> middle
            val suf = s.indexOf("<SUF>"); val mid = s.indexOf("<MID>")
            s.startsWith("<PRE>") && suf >= 5 && mid > suf &&
              s.substring(5, suf) + s.substring(mid + 5) +
                s.substring(suf + 5, mid) == text
          case "spm" => // <SUF> suffix <PRE> prefix <MID> middle
            val pre = s.indexOf("<PRE>"); val mid = s.indexOf("<MID>")
            s.startsWith("<SUF>") && pre >= 5 && mid > pre &&
              s.substring(pre + 5, mid) + s.substring(mid + 5) +
                s.substring(5, pre) == text
          case _ => false // rate 1.0 is exact: no doc passes through
        }
      }
    }

  property("Fim at fimRate=0 is the exact identity") =
    forAll(docsGen) { docs =>
      import spark.implicits._
      val got = Fim.transform(docs.toDF("doc_id", "text"), "text", "doc_id",
          fimRate = 0.0)
        .select("doc_id", "fim_mode", "fim_text").collect()
      val byId = docs.toMap
      got.forall(r => r.getString(1) == "none" &&
        r.getString(2) == byId(r.getLong(0)))
    }

  // --- assistant loss-mask spans ---------------------------------------------

  private val convGen: Gen[List[(Long, List[(String, String)])]] = for {
    n <- Gen.choose(1, 6)
    convs <- Gen.listOfN(n, for {
      id <- Gen.choose(0L, 1000000L)
      turns <- Gen.choose(1, 8)
      msgs <- Gen.listOfN(turns, for {
        role <- Gen.oneOf("system", "user", "assistant")
        len <- Gen.choose(0, 20) // 0: empty content must span-cut to ""
        content <- Gen.listOfN(len, Gen.alphaNumChar).map(_.mkString)
      } yield (role, content))
    } yield (id, msgs))
  } yield convs

  property("assistantSpans cut chat_text back to each turn's exact content") =
    forAll(convGen) { convs =>
      import spark.implicits._
      val distinct = convs.toMap.toList // duplicate ids would double rows
      val json = distinct.map { case (id, msgs) =>
        (id, msgs.map { case (r, c) => s"""{"role":"$r","content":"$c"}""" }
          .mkString("[", ",", "]"))
      }
      val rendered = ChatTemplate.render(
        ChatTemplate.parseMessages(json.toDF("conv_id", "raw"), "raw"))
      val got = ChatTemplate.assistantSpans(rendered)
        .select("conv_id", "chat_text", "turn", "span_start", "span_len")
        .collect()
        .map(r => ((r.getLong(0), r.getLong(2)),
          (r.getString(1), r.getLong(3), r.getLong(4)))).toMap
      val expected = distinct.flatMap { case (id, msgs) =>
        msgs.zipWithIndex.collect { case ((role, c), i)
          if role == "assistant" => ((id, (i + 1).toLong), c) }
      }.toMap
      got.keySet == expected.keySet && expected.forall { case (k, content) =>
        val (chat, start, len) = got(k)
        chat.substring(start.toInt - 1, start.toInt - 1 + len.toInt) == content
      }
    }

  // --- banded Hamming search --------------------------------------------------

  private val wordsGen: Gen[(Int, List[List[Long]])] = for {
    nWords <- Gen.choose(1, 3)
    n <- Gen.choose(2, 12)
    rows <- Gen.listOfN(n, Gen.listOfN(nWords, Gen.choose(0L, 0xFFFFFFFFL)))
  } yield (nWords, rows)

  private def popXor(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y).toLong }.sum

  property("hammingTopKBlocked: subset of exact at true distances; " +
      "pigeonhole radius always found") =
    forAll(wordsGen, Gen.oneOf(8, 16)) { case ((nWords, rows), bandBits) =>
      import spark.implicits._
      val ids = rows.indices.map(_.toLong)
      val df = ids.zip(rows).toDF("id", "words")
      val k = rows.size // full ranking: blocked returns EVERY candidate
      val blocked = Similarity.hammingTopKBlocked(df, df, k,
          bandBits = bandBits)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      val numBands = nWords * (32 / bandBits)
      val allPairs = for {
        q <- ids; c <- ids if q != c
      } yield (q, c) -> popXor(rows(q.toInt), rows(c.toInt))
      // every blocked row carries the TRUE distance, and every pair
      // within the pigeonhole radius (h < numBands) is present
      blocked.forall { case (pair, h) => allPairs.toMap.apply(pair) == h } &&
        allPairs.forall { case (pair, h) =>
          h >= numBands || blocked.contains(pair) }
    }

  // --- SQ8 quantization ---------------------------------------------------------

  private val vecGen: Gen[List[List[Float]]] = for {
    n <- Gen.choose(1, 8)
    d <- Gen.choose(1, 12)
    rows <- Gen.listOfN(n, Gen.listOfN(d,
      Gen.choose(-100.0, 100.0).map(_.toFloat)))
  } yield rows

  property("sq8 codes: bounded, sign-preserving, max-abs component at ±127") =
    forAll(vecGen) { rows =>
      import spark.implicits._
      val df = rows.indices.map(_.toLong).zip(rows).toDF("vec_id", "embedding")
      val got = Similarity.sq8(df).collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      rows.indices.forall { i =>
        val (v, c) = (rows(i), got(i.toLong))
        val mx = v.map(x => math.abs(x.toDouble)).max
        c.length == v.length &&
          c.forall(q => q >= -127 && q <= 127) &&
          v.zip(c).forall { case (x, q) =>
            q == 0 || (q > 0) == (x > 0) } && // sign-preserving
          (mx == 0.0 || v.zip(c).exists { case (x, q) =>
            math.abs(x.toDouble) == mx && math.abs(q) == 127 })
      }
    }

  // --- percolation regimes ----------------------------------------------------

  private val percGen: Gen[(List[(Long, String)], List[(String, Seq[String])])] =
    for {
      vocabN <- Gen.choose(3, 8)
      nd <- Gen.choose(1, 10)
      docs <- Gen.listOfN(nd, for {
        len <- Gen.choose(0, 12)
        toks <- Gen.listOfN(len, Gen.choose(0, vocabN - 1))
      } yield toks.map(i => s"tok$i").mkString(" "))
      nq <- Gen.choose(1, 6)
      qs <- Gen.listOfN(nq, for {
        nt <- Gen.choose(1, 3)
        // vocabN itself never occurs in any doc: exercises the
        // rarest-term-absent (df 0 -> zero candidates) path
        ts <- Gen.listOfN(nt, Gen.choose(0, vocabN))
      } yield ts.map(i => s"tok$i").distinct)
      // duplicate doc ids must count once per ROW in both regimes (the
      // review-found quadratic verify-join overcount)
      dupIds <- Gen.oneOf(true, false)
    } yield (docs.zipWithIndex.map { case (t, i) =>
        ((if (dupIds) i / 2 else i).toLong, t) },
      qs.zipWithIndex.map { case (ts, i) => (s"q$i", ts.toSeq) })

  property("percolateIndexed is row-identical to the broadcast regime") =
    forAll(percGen) { case (docs, registry) =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
      def rows(out: org.apache.spark.sql.DataFrame) = out.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      rows(Search.percolate(df, "text", "doc_id", registry)) ==
        rows(Search.percolateIndexed(df, "text", "doc_id",
          registry.toDF("query_id", "terms")))
    }

  property("assistantSpans drops conversations with null role or content") =
    forAll(Gen.oneOf("role", "content")) { which =>
      import spark.implicits._
      val raw = // one clean conversation, one with a null field
        Seq((1L, """[{"role":"assistant","content":"ok"}]"""),
          (2L, if (which == "role")
            """[{"role":null,"content":"x"},{"role":"assistant","content":"y"}]"""
          else
            """[{"role":"assistant","content":null}]"""))
      val spans = ChatTemplate.assistantSpans(ChatTemplate.render(
        ChatTemplate.parseMessages(raw.toDF("conv_id", "raw"), "raw")))
        .select("conv_id").collect().map(_.getLong(0)).toSeq
      spans == Seq(1L)
    }
}
