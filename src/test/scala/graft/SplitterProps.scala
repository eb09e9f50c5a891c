package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.TextSplitters

/** ScalaCheck properties for the chunking kernel (SURVEY §5.3): the
  * invariants that must hold for EVERY input, not just the golden strings —
  * size bound, substring provenance, in-order coverage, dispatch totality.
  */
object SplitterProps extends Properties("TextSplitters") {

  // Text shaped like real documents: words, spaces, newlines, paragraphs.
  private val word: Gen[String] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, Gen.alphaChar).map(_.mkString))
  private val sep: Gen[String] = Gen.frequency(8 -> " ", 2 -> "\n", 1 -> "\n\n")
  private val docText: Gen[String] = for {
    n <- Gen.choose(0, 120)
    ws <- Gen.listOfN(n, word)
    ss <- Gen.listOfN(n, sep)
  } yield ws.zip(ss).map { case (w, s) => w + s }.mkString

  private val sizeAndOverlap: Gen[(Int, Int)] = for {
    size <- Gen.choose(10, 200)
    overlap <- Gen.choose(0, size / 2)
  } yield (size, overlap)

  property("chunks never exceed chunkSize (default separator cascade)") =
    forAll(docText, sizeAndOverlap) { case (text, (size, overlap)) =>
      TextSplitters.recursiveSplit(text, size, overlap).forall(_.length <= size)
    }

  property("every chunk is a stripped contiguous substring of the input") =
    forAll(docText, sizeAndOverlap) { case (text, (size, overlap)) =>
      TextSplitters.recursiveSplit(text, size, overlap)
        .forall(c => c.nonEmpty && c == c.strip() && text.contains(c))
    }

  property("concatenated chunks contain the whole input as a subsequence (no content lost)") =
    forAll(docText, sizeAndOverlap) { case (text, (size, overlap)) =>
      val joined = TextSplitters.recursiveSplit(text, size, overlap).mkString
      val target = text.filterNot(_.isWhitespace)
      var i = 0
      joined.foreach { ch => if (i < target.length && ch == target(i)) i += 1 }
      i == target.length
    }

  property("whitespace-only input yields no chunks") =
    forAll(Gen.listOf(Gen.oneOf(' ', '\n', '\t')).map(_.mkString)) { ws =>
      TextSplitters.recursiveSplit(ws, 50, 10).isEmpty
    }

  private val mdDoc: Gen[String] = for {
    n <- Gen.choose(0, 12)
    parts <- Gen.listOfN(n, Gen.frequency(
      2 -> Gen.oneOf("# Title", "## Section", "### Sub"),
      6 -> word.map(w => w + " body"),
      1 -> Gen.const("```\n# not a header\n```")))
  } yield parts.mkString("\n")

  property("markdown chunks carry only Header 1..3 keys and non-empty content") =
    forAll(mdDoc) { text =>
      TextSplitters.markdownSplit(text).forall { c =>
        c.content.nonEmpty &&
        c.headers.keySet.subsetOf(Set("Header 1", "Header 2", "Header 3"))
      }
    }

  property("adaptive dispatch is total: md-ish goes to markdown, rest to recursive") =
    forAll(Gen.oneOf(docText, mdDoc), sizeAndOverlap) { case (text, (size, overlap)) =>
      val out = TextSplitters.adaptiveSplit(text, size, overlap)
      if (TextSplitters.isMarkdownish(text))
        out == TextSplitters.markdownSplit(text)
      else
        out.map(_.content) == TextSplitters.recursiveSplit(text, size, overlap) &&
          out.forall(_.headers.isEmpty)
    }
}
