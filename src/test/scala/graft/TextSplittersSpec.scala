package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextSplitters

/** Goldens pinned to the reference's chunker tests
  * (`tests/components/test_chunkers.py:19-47`) plus structural properties.
  */
class TextSplittersSpec extends AnyFunSuite {

  test("recursive splitter golden boundaries (chunk_size=30, overlap=5)") {
    val text = "This is a test sentence for our amazing chunker. It is a long sentence."
    val chunks = TextSplitters.recursiveSplit(text, 30, 5)
    assert(chunks.length > 1)
    assert(chunks.head == "This is a test sentence for")
    assert(chunks(1) == "for our amazing chunker. It")
  }

  test("recursive splitter: empty and whitespace input produce no chunks") {
    assert(TextSplitters.recursiveSplit("", 30, 5).isEmpty)
    assert(TextSplitters.recursiveSplit("   \n  ", 30, 5).isEmpty)
    assert(TextSplitters.recursiveSplit(null, 30, 5).isEmpty)
  }

  test("recursive splitter: short text is a single chunk") {
    assert(TextSplitters.recursiveSplit("short", 30, 5) == Seq("short"))
  }

  test("recursive splitter: paragraphs split before lines before words") {
    val text = "para one\n\npara two\n\npara three"
    val chunks = TextSplitters.recursiveSplit(text, 12, 0)
    assert(chunks == Seq("para one", "para two", "para three"))
  }

  test("recursive splitter: every chunk fits chunk_size when fragments are small") {
    val text = ("word " * 200).trim
    val chunks = TextSplitters.recursiveSplit(text, 30, 5)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.length <= 30), chunks.filter(_.length > 30).toString)
    // chunks cover the text in order
    assert(chunks.forall(text.contains))
  }

  test("recursive splitter: oversize unbreakable token is emitted whole") {
    val text = "a " + ("x" * 50) + " b"
    val chunks = TextSplitters.recursiveSplit(text, 10, 2)
    assert(chunks.contains("x" * 50) || chunks.exists(_.contains("x" * 10)))
  }

  test("markdown splitter golden (headers kept in content)") {
    val text = "# Header 1\n\nThis is a paragraph.\n\n## Header 2\n\n- List item 1\n- List item 2"
    val chunks = TextSplitters.markdownSplit(text)
    assert(chunks.length > 1)
    assert(chunks.head.content.startsWith("# Header 1"))
    assert(chunks(1).content.startsWith("## Header 2"))
    assert(chunks.head.headers == Map("Header 1" -> "Header 1"))
    assert(chunks(1).headers == Map("Header 1" -> "Header 1", "Header 2" -> "Header 2"))
  }

  test("markdown splitter: deeper headers cleared when a shallower one opens") {
    val text = "# A\nx\n## B\ny\n### C\nz\n# D\nw"
    val chunks = TextSplitters.markdownSplit(text)
    val last = chunks.last
    assert(last.headers == Map("Header 1" -> "D"))
  }

  test("markdown splitter: headers inside code fences ignored") {
    val text = "# A\n```\n# not a header\n```\nmore"
    val chunks = TextSplitters.markdownSplit(text)
    assert(chunks.length == 1)
    assert(chunks.head.content.contains("# not a header"))
  }

  test("adaptive dispatch heuristic matches reference") {
    val md = "intro\n# A\nx\n# B\ny\n# C\nz" // three "\n# " occurrences
    val plain = "This is a test sentence for our amazing chunker. It is a long sentence."
    assert(TextSplitters.isMarkdownish(md))
    assert(!TextSplitters.isMarkdownish(plain))
    // adaptive on plain == recursive on plain
    val viaAdaptive = TextSplitters.adaptiveSplit(plain, 30, 5).map(_.content)
    assert(viaAdaptive == TextSplitters.recursiveSplit(plain, 30, 5))
  }

  test("chunk reassembly property: concatenation preserves all non-space chars in order") {
    val texts = Seq(
      "The quick brown fox jumps over the lazy dog. " * 10,
      "line one\nline two\nline three\n" * 8,
      "p1 word word\n\np2 word word\n\np3 word word " * 5)
    for (t <- texts; size <- Seq(20, 50, 100); ov <- Seq(0, 5, 10)) {
      val chunks = TextSplitters.recursiveSplit(t, size, ov)
      // Every chunk must be a substring of the original (no invented text)
      assert(chunks.forall(t.contains), s"size=$size ov=$ov")
      // Coverage: last char of original text appears in the last chunk
      assert(chunks.isEmpty || t.strip().endsWith(chunks.last.takeRight(1)))
    }
  }

  test("per-character fallback splits code points, never surrogate halves") {
    // One long unbroken run of astral-plane chars forces the "" separator.
    val emoji = "😀" // U+1F600, a surrogate pair
    val text = emoji * 40      // 80 JVM chars, no spaces
    val chunks = TextSplitters.recursiveSplit(text, 10, 2)
    assert(chunks.nonEmpty)
    for (c <- chunks) {
      assert(c.length % 2 == 0, s"chunk cut a surrogate pair: ${c.map(_.toInt)}")
      assert(c.grouped(2).forall(_ == emoji))
    }
  }

  test("textTiling chunker: cohesion boundary, single sentence, blank doc") {
    import org.apache.spark.sql.functions.col
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    // s1/s2 share {apple, banana} -> J = 2/4 >= 1/4, cohesive;
    // s2/s3 share nothing -> J = 0 < 1/4, boundary.
    val docs = Seq(
      (1L, "apple banana cherry. apple banana dog. red green blue."),
      (2L, "only one sentence here."),
      (3L, "   ")).toDF("doc_id", "text")
    val out = graft.operators.Chunkers
      .textTiling(docs, "text", cohesionNum = 1, cohesionDen = 4)
      .orderBy(col("doc_id"), col("chunk_index"))
      .select("doc_id", "chunk_index", "chunk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(out == Seq(
      (1L, 1L, "apple banana cherry. apple banana dog."),
      (1L, 2L, "red green blue."),
      (2L, 1L, "only one sentence here.")))
    // threshold 1/1: EVERY gap with J < 1 breaks -> one chunk per sentence
    val perSentence = graft.operators.Chunkers
      .textTiling(docs.filter(col("doc_id") === 1), "text",
        cohesionNum = 1, cohesionDen = 1)
      .count()
    assert(perSentence == 3L)
    intercept[IllegalArgumentException] {
      graft.operators.Chunkers.textTiling(docs, "text", 1, 0)
    }
  }

  test("sentence-window chunker: golden windows, overlap slide, edge inputs") {
    import org.apache.spark.sql.functions.col
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val text = "One is here. Two follows! Three asks? Four ends. Five closes."
    val out = graft.operators.Chunkers.sentences(
        Seq((1L, text)).toDF("doc_id", "text"), "text",
        sentencesPerChunk = 3, overlapSentences = 1)
      .orderBy(col("chunk_index"))
      .select("chunk").as[String].collect().toSeq
    // windows of 3 sliding by 2: [1,2,3], [3,4,5] — the slide would also
    // start a window at sentence 5, but [5] is a strict subset of [3,4,5]
    // (duplicated content in the RAG index) and is skipped (r7 advice fix)
    assert(out == Seq(
      "One is here. Two follows! Three asks?",
      "Three asks? Four ends. Five closes."))
    // a short trailing window with NEW content is still emitted
    val six = text + " Six finishes."
    val tail = graft.operators.Chunkers.sentences(
        Seq((1L, six)).toDF("doc_id", "text"), "text",
        sentencesPerChunk = 3, overlapSentences = 1)
      .orderBy(col("chunk_index")).select("chunk").as[String].collect().toSeq
    assert(tail == Seq(
      "One is here. Two follows! Three asks?",
      "Three asks? Four ends. Five closes.",
      "Five closes. Six finishes."))
    // no-overlap slide partitions exactly
    val flat = graft.operators.Chunkers.sentences(
        Seq((1L, text)).toDF("doc_id", "text"), "text",
        sentencesPerChunk = 2, overlapSentences = 0)
      .orderBy(col("chunk_index")).select("chunk").as[String].collect().toSeq
    assert(flat == Seq("One is here. Two follows!", "Three asks? Four ends.", "Five closes."))
    // null / blank / boundary-less inputs
    val weird = Seq((1L, null.asInstanceOf[String]), (2L, "   "),
      (3L, "no terminal punctuation at all")).toDF("doc_id", "text")
    val byDoc = graft.operators.Chunkers.sentences(weird, "text", 3, 1)
      .select("doc_id", "chunk").as[(Long, String)].collect().toSeq
    assert(byDoc == Seq((3L, "no terminal punctuation at all")))
    // invalid params raise
    intercept[IllegalArgumentException] {
      graft.operators.Chunkers.sentences(weird, "text", 2, 2)
    }
  }

  test("contentDefined: chunks cover the text exactly, local replay agrees") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val rng = new scala.util.Random(7)
    val alpha = "abcdefgh "
    val texts = (1L to 20L).map(i =>
      (i, (0 until 200 + rng.nextInt(300))
        .map(_ => alpha(rng.nextInt(alpha.length))).mkString))
    val out = graft.operators.Chunkers
      .contentDefined(texts.toDF("doc_id", "text"), "text", "doc_id")
      .select("doc_id", "chunk_index", "start_pos", "chunk_len", "chunk")
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // chunks are a dense, gapless cover of each document
    texts.foreach { case (id, txt) =>
      val cs = out(id)
      assert(cs.map(_._2).toSeq == (1L to cs.size).toSeq, s"dense index $id")
      assert(cs.map(_._5).mkString == txt, s"cover $id")
      cs.foreach(c => assert(c._5.length == c._4))
    }
    // local replay of the windowed gear rule
    def boundaries(txt: String): Seq[Int] =
      (16 to txt.length).filter { i =>
        val h = (0 until 16).map { j =>
          ((txt.charAt(i - j - 1).toLong * 2654435761L) % 65536L) * (1L << j)
        }.sum % 65536L
        h % 64 == 0
      }
    texts.take(5).foreach { case (id, txt) =>
      val bs = boundaries(txt)
      val starts = 1L +: bs.map(_ + 1L)
      val exp = starts.zip(bs.map(_.toLong) :+ txt.length.toLong)
        .filter { case (s, e) => e >= s }
      assert(out(id).map(c => (c._3, c._3 + c._4 - 1)).toSeq == exp, s"doc $id")
    }
  }

  test("contentDefined: boundaries re-synchronize after an insertion") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val rng = new scala.util.Random(11)
    val base = (0 until 600).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val edited = base.substring(0, 300) + "INSERTED-BYTES" + base.substring(300)
    val df = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val chunks = graft.operators.Chunkers
      .contentDefined(df, "text", "doc_id")
      .select("doc_id", "chunk").as[(Long, String)].collect()
    val a = chunks.filter(_._1 == 1L).map(_._2).toSet
    val b = chunks.filter(_._1 == 2L).map(_._2).toSet
    // the suffix chunks far from the edit are byte-identical: CDC
    // re-synchronizes, a fixed-size chunker would shift every frame
    val shared = a.intersect(b)
    assert(shared.nonEmpty, "no shared chunks after edit")
    // everything after the edit region (+window slack) should re-sync;
    // demand at least half of each side's chunk mass is shared
    assert(shared.size * 2 >= math.min(a.size, b.size), s"shared=${shared.size} a=${a.size} b=${b.size}")
    // empty and sub-window docs
    val tiny = Seq((1L, ""), (2L, "short")).toDF("doc_id", "text")
    val tc = graft.operators.Chunkers.contentDefined(tiny, "text", "doc_id")
      .select("doc_id", "chunk").as[(Long, String)].collect()
    assert(tc.toSet == Set((2L, "short")))
  }
}
