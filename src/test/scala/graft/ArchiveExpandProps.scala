package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.sources.{ArchiveExpand, ArchiveFixtures}

/** ScalaCheck properties for archive expansion: round-trip provenance for
  * EVERY entry layout, and the corruption contract — a mutated archive
  * either still parses or throws the NAMED IllegalArgumentException; it
  * must never hang, OOM, or escape with a raw codec exception.
  */
object ArchiveExpandProps extends Properties("ArchiveExpand") {

  private val entryName: Gen[String] = for {
    depth <- Gen.choose(0, 3)
    segs <- Gen.listOfN(depth + 1,
      Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString)))
  } yield segs.mkString("/")

  private val payload: Gen[Array[Byte]] =
    Gen.choose(0, 2000).flatMap(n => Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)))
      .map(_.toArray)

  private val entries: Gen[List[(String, Array[Byte])]] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.zip(entryName, payload)))
      .map(_.groupBy(_._1).map(_._2.head).toList) // unique names

  private def same(a: Seq[(String, Array[Byte])], b: Seq[(String, Array[Byte])]): Boolean =
    a.size == b.size && a.sortBy(_._1).zip(b.sortBy(_._1)).forall {
      case ((n1, d1), (n2, d2)) => n1 == n2 && java.util.Arrays.equals(d1, d2)
    }

  property("tar round-trips arbitrary binary entries") = forAll(entries) { es =>
    same(ArchiveExpand.expand("p.tar", ArchiveFixtures.tar(es)), es)
  }

  property("tar.gz and zip round-trip arbitrary binary entries") = forAll(entries) { es =>
    same(ArchiveExpand.expand("p.tar.gz", ArchiveFixtures.tarGz(es)), es) &&
      same(ArchiveExpand.expand("p.zip", ArchiveFixtures.zip(es)), es)
  }

  property("single-byte corruption parses or fails with the named error") =
    forAll(entries, Gen.choose(0, Int.MaxValue), Gen.choose(1, 255)) { (es, posSeed, flip) =>
      val arc = ArchiveFixtures.tarGz(es)
      val pos = posSeed % arc.length
      arc(pos) = (arc(pos) ^ flip).toByte
      try { ArchiveExpand.expand("p.tar.gz", arc); true }
      catch {
        case e: IllegalArgumentException =>
          e.getMessage != null && e.getMessage.startsWith("graft.ArchiveExpand")
      }
    }

  property("truncation at any point parses a prefix or fails named") =
    forAll(entries, Gen.choose(0, Int.MaxValue)) { (es, cutSeed) =>
      val arc = ArchiveFixtures.tar(es)
      val cut = cutSeed % arc.length
      try {
        val got = ArchiveExpand.expand("p.tar", java.util.Arrays.copyOf(arc, cut))
        // whatever survives must be a prefix of the authored entries
        got.map(_._1).forall(es.map(_._1).contains)
      } catch {
        case e: IllegalArgumentException =>
          e.getMessage != null && e.getMessage.startsWith("graft.ArchiveExpand")
      }
    }

  property("mboxrd framing round-trips any text through the splitter") =
    forAll(Gen.listOf(Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr, Gen.const("From x"), Gen.const(">From y"),
      Gen.const(""), Gen.const(">>From z"))).map(_.mkString("\n")))) { bodies =>
      val msgs = bodies.map(b => "Subject: t\n\n" + b)
      val split = graft.functions.DocumentExtract.mboxMessages(
        ArchiveFixtures.mboxrd(msgs))
      msgs.isEmpty || (split.size == msgs.size &&
        split.zip(msgs).forall { case (got, want) => got.trim == want.trim })
    }
}
