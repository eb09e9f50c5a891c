package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ArchiveExpand, ArchiveFixtures, ArchiveSource}

/** Archive expansion: ustar/gzip/zip walkers, nested recursion, bomb
  * guards — and, per the LZW lesson (SCALE.md round-16), an INDEPENDENT
  * implementation check: archives produced by the system `tar`/`gzip`
  * binaries must parse identically to the in-repo fixture writer's.
  */
class ArchiveExpandSpec extends AnyFunSuite with SparkTestBase {

  private def b(s: String) = s.getBytes(UTF_8)
  private def text(e: Seq[(String, Array[Byte])]) =
    e.map { case (n, d) => (n, new String(d, UTF_8)) }.toMap

  test("tar round trip: multi-entry, subdirectories, UTF-8 names") {
    val entries = Seq(
      "a.txt" -> b("alpha"),
      "sub/dir/b.txt" -> b("beta\nlines"),
      "naïve-ünïcode.txt" -> b("gamma"))
    val out = ArchiveExpand.expand("x.tar", ArchiveFixtures.tar(entries))
    assert(text(out) == Map("a.txt" -> "alpha", "sub/dir/b.txt" -> "beta\nlines",
      "naïve-ünïcode.txt" -> "gamma"))
  }

  test("tar long path > 100 bytes uses the ustar prefix split") {
    val long = "corpus/" + ("d" * 120) + "/part.txt"
    val raw = ArchiveFixtures.tar(Seq(long -> b("x")))
    // the name field must hold ONLY the basename (prefix carries the rest)
    val nameField = new String(raw, 0, 100, UTF_8).takeWhile(_ != 0)
    assert(nameField == "part.txt")
    val prefixField = new String(raw, 345, 155, UTF_8).takeWhile(_ != 0)
    assert(prefixField == "corpus/" + "d" * 120)
    assert(text(ArchiveExpand.expand("x.tar", raw)) == Map(long -> "x"))
  }

  test("tar unsplittable long path uses a GNU 'L' long-name entry") {
    val long = "x" * 260 + ".txt" // no '/': cannot prefix-split
    val raw = ArchiveFixtures.tar(Seq(long -> b("y")))
    assert(new String(raw, 0, 13, UTF_8) == "././@LongLink")
    assert(raw(156) == 'L'.toByte)
    assert(text(ArchiveExpand.expand("x.tar", raw)) == Map(long -> "y"))
  }

  test("INDEPENDENT: system tar + gzip output parses identically") {
    import scala.sys.process._
    val tarBin = Seq("sh", "-c", "command -v tar").!!.trim
    assume(tarBin.nonEmpty, "system tar unavailable")
    val dir = tempDir("graft-systar")
    // deep path: the FILE needs the ustar prefix split (105 > 100 bytes)
    // while the directory entry itself still fits the name field
    Files.createDirectories(dir.resolve("deep/" + "p" * 92))
    Files.writeString(dir.resolve("one.txt"), "first payload")
    Files.writeString(dir.resolve("deep/" + "p" * 92 + "/two.txt"), "second payload")
    val tarPath = dir.resolve("out.tar")
    // --format=ustar pins the prefix-split layout; a second gnu-format run
    // covers the 'L' long-name path real GNU tar emits for >100-byte names
    assert(Seq("tar", "--format=ustar", "-C", dir.toString, "-cf",
      tarPath.toString, "one.txt", "deep").! == 0)
    val viaUstar = text(ArchiveExpand.expand("out.tar", Files.readAllBytes(tarPath)))
    assert(viaUstar("one.txt") == "first payload")
    assert(viaUstar("deep/" + "p" * 92 + "/two.txt") == "second payload")

    for (fmt <- Seq("gnu", "posix")) { // 'L' long names vs pax 'x' headers
      val tarFmt = dir.resolve(s"out-$fmt.tar")
      assert(Seq("tar", s"--format=$fmt", "-C", dir.toString, "-cf",
        tarFmt.toString, "one.txt", "deep").! == 0)
      val viaFmt = text(ArchiveExpand.expand(s"out-$fmt.tar", Files.readAllBytes(tarFmt)))
      assert(viaFmt == viaUstar, fmt)
    }

    assert(Seq("gzip", "-kf", tarPath.toString).! == 0)
    val viaGz = text(ArchiveExpand.expand("out.tar.gz",
      Files.readAllBytes(dir.resolve("out.tar.gz"))))
    assert(viaGz == viaUstar)
  }

  test("INDEPENDENT: the fixture writer's tar is accepted by system tar") {
    import scala.sys.process._
    assume(Seq("sh", "-c", "command -v tar").!!.trim.nonEmpty)
    val dir = tempDir("graft-tarval")
    val long = "corpus/" + ("d" * 120) + "/part.txt"
    val raw = ArchiveFixtures.tar(Seq("a.txt" -> b("alpha"), long -> b("x")))
    val p = dir.resolve("fixture.tar")
    Files.write(p, raw)
    val listing = Seq("tar", "-tf", p.toString).!!.trim.linesIterator.toSeq
    assert(listing.toSet == Set("a.txt", long))
  }

  test("zip and nested archives: outer!inner naming, depth cap") {
    val inner = ArchiveFixtures.zip(Seq("doc.txt" -> b("nested")))
    val outer = ArchiveFixtures.tarGz(Seq("plain.txt" -> b("top"), "inner.zip" -> inner))
    val out = text(ArchiveExpand.expand("docs.tar.gz", outer))
    assert(out == Map("plain.txt" -> "top", "inner.zip!doc.txt" -> "nested"))
    // depth 1: the nested zip stays an opaque leaf
    val shallow = ArchiveExpand.expand("docs.tar.gz", outer, maxDepth = 1)
    assert(shallow.map(_._1).toSet == Set("plain.txt", "inner.zip"))
    assert(shallow.find(_._1 == "inner.zip").get._2.sameElements(inner))
  }

  test("bzip2 / xz / zstd: .tar.<codec>, shorthand, and single-member forms") {
    val es = Seq("a.txt" -> b("alpha"), "dir/b.txt" -> b("beta"))
    val raw = ArchiveFixtures.tar(es)
    for ((enc, suffixes) <- Seq[(Array[Byte] => Array[Byte], Seq[String])](
        ((x: Array[Byte]) => ArchiveFixtures.bzip2(x), Seq("t.tar.bz2", "t.tbz2", "t.tbz")),
        ((x: Array[Byte]) => ArchiveFixtures.xz(x), Seq("t.tar.xz", "t.txz")),
        ((x: Array[Byte]) => ArchiveFixtures.zstd(x), Seq("t.tar.zst", "t.tzst")));
        nm <- suffixes)
      assert(text(ArchiveExpand.expand(nm, enc(raw))) ==
        Map("a.txt" -> "alpha", "dir/b.txt" -> "beta"), nm)
    assert(text(ArchiveExpand.expand("n.txt.bz2", ArchiveFixtures.bzip2(b("bz")))) ==
      Map("n.txt" -> "bz"))
    assert(text(ArchiveExpand.expand("n.txt.xz", ArchiveFixtures.xz(b("xz")))) ==
      Map("n.txt" -> "xz"))
    assert(text(ArchiveExpand.expand("n.txt.zst", ArchiveFixtures.zstd(b("zs")))) ==
      Map("n.txt" -> "zs"))
    // corrupt zstd frame fails loudly with the codec named
    val bad = ArchiveFixtures.zstd(b("payload")); bad(4) = (bad(4) ^ 0x7F).toByte
    val e = intercept[IllegalArgumentException](ArchiveExpand.expand("x.txt.zst", bad))
    assert(e.getMessage.contains("corrupt zstd"))
  }

  test("lz4 / snappy framed codecs: tar and single-member forms; corrupt is loud") {
    val es = Seq("a.txt" -> b("alpha"), "dir/b.txt" -> b("beta"))
    val raw = ArchiveFixtures.tar(es)
    assert(text(ArchiveExpand.expand("t.tar.lz4", ArchiveFixtures.lz4(raw))) ==
      Map("a.txt" -> "alpha", "dir/b.txt" -> "beta"))
    assert(text(ArchiveExpand.expand("t.tar.sz", ArchiveFixtures.snappy(raw))) ==
      Map("a.txt" -> "alpha", "dir/b.txt" -> "beta"))
    assert(text(ArchiveExpand.expand("n.txt.lz4", ArchiveFixtures.lz4(b("l4")))) ==
      Map("n.txt" -> "l4"))
    assert(text(ArchiveExpand.expand("n.txt.sz", ArchiveFixtures.snappy(b("sn")))) ==
      Map("n.txt" -> "sn"))
    assert(text(ArchiveExpand.expand("n.txt.snappy", ArchiveFixtures.snappy(b("sp")))) ==
      Map("n.txt" -> "sp"))
    val bad = ArchiveFixtures.lz4(b("payload")); bad(6) = (bad(6) ^ 0x7F).toByte
    val e = intercept[IllegalArgumentException](ArchiveExpand.expand("x.txt.lz4", bad))
    assert(e.getMessage.contains("corrupt lz4"))
  }

  test("INDEPENDENT: commons-compress TarArchiveOutputStream (POSIX + GNU " +
      "long names) parses identically; our tar parses under commons-compress") {
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream, TarArchiveOutputStream}
    val long = "deep/" + "q" * 130 + "/leaf.txt"
    val entries = Seq("a.txt" -> b("alpha"), long -> b("deep payload"))
    for (mode <- Seq(TarArchiveOutputStream.LONGFILE_POSIX, TarArchiveOutputStream.LONGFILE_GNU)) {
      val bos = new java.io.ByteArrayOutputStream()
      val tos = new TarArchiveOutputStream(bos)
      tos.setLongFileMode(mode)
      entries.foreach { case (n, d) =>
        val e = new TarArchiveEntry(n); e.setSize(d.length)
        tos.putArchiveEntry(e); tos.write(d); tos.closeArchiveEntry()
      }
      tos.close()
      // GNU mode rides an 'L' long-name entry, POSIX mode a pax 'x'
      // extended header with a path= record — both must decode exactly
      val got = text(ArchiveExpand.expand("cc.tar", bos.toByteArray))
      assert(got == entries.map { case (n, d) => (n, new String(d, UTF_8)) }.toMap,
        s"mode $mode")
    }
    // reverse: commons-compress must accept our fixture writer's output
    val ours = ArchiveFixtures.tar(entries)
    val tin = new TarArchiveInputStream(new java.io.ByteArrayInputStream(ours))
    val read = Iterator.continually(tin.getNextEntry).takeWhile(_ != null).map { e =>
      e.getName -> new String(tin.readAllBytes(), UTF_8)
    }.toMap
    assert(read == entries.map { case (n, d) => (n, new String(d, UTF_8)) }.toMap)
  }

  test("single-member .gz strips the suffix; multi-member gzip concatenates") {
    val out = ArchiveExpand.expand("dir/note.txt.gz", ArchiveFixtures.gzip(b("hello")))
    assert(text(out) == Map("note.txt" -> "hello"))
    val multi = ArchiveFixtures.gzipMembers(Seq(b("first|"), b("second")))
    assert(text(ArchiveExpand.expand("m.txt.gz", multi)) == Map("m.txt" -> "first|second"))
  }

  test("guards: expansion bomb, entry cap, truncation, checksum, corrupt gzip") {
    val prev = ArchiveExpand.MaxExpandedBytes
    try {
      ArchiveExpand.MaxExpandedBytes = 16
      val e = intercept[IllegalArgumentException](
        ArchiveExpand.expand("b.tar", ArchiveFixtures.tar(Seq("big.txt" -> b("x" * 64)))))
      assert(e.getMessage.contains("decompression bomb"))
    } finally ArchiveExpand.MaxExpandedBytes = prev

    val prevN = ArchiveExpand.MaxEntries
    try {
      ArchiveExpand.MaxEntries = 2
      val three = ArchiveFixtures.tar(Seq("1" -> b("a"), "2" -> b("b"), "3" -> b("c")))
      val e = intercept[IllegalArgumentException](ArchiveExpand.expand("n.tar", three))
      assert(e.getMessage.contains("entries"))
    } finally ArchiveExpand.MaxEntries = prevN

    val ok = ArchiveFixtures.tar(Seq("a.txt" -> b("alpha")))
    val truncated = java.util.Arrays.copyOf(ok, 512 + 2) // header + torn data
    val t = intercept[IllegalArgumentException](ArchiveExpand.expand("t.tar", truncated))
    assert(t.getMessage.contains("truncated"))

    val corrupt = ok.clone(); corrupt(0) = 'Z'.toByte // name change breaks the checksum
    val c = intercept[IllegalArgumentException](ArchiveExpand.expand("c.tar", corrupt))
    assert(c.getMessage.contains("checksum"))

    val badGz = ArchiveFixtures.gzip(b("payload"))
    badGz(badGz.length - 3) = (badGz(badGz.length - 3) ^ 0x5A).toByte // CRC torn
    val g = intercept[IllegalArgumentException](ArchiveExpand.expand("x.txt.gz", badGz))
    assert(g.getMessage.contains("corrupt gzip"))
  }

  test("bomb budget charges a compressed tar's bytes ONCE, not per layer") {
    // 40 data bytes in a .tar.gz with a 64-byte budget: a double charge
    // (decompress + per-entry) would bill ~512+40+40 and trip; the single
    // charge bills the decompressed stream only
    val prev = ArchiveExpand.MaxExpandedBytes
    try {
      val payload = b("y" * 40)
      val targz = ArchiveFixtures.gzip(ArchiveFixtures.tar(Seq("y.txt" -> payload)))
      // decompressed tar stream = 512 hdr + 512 data-block + 1024 trailer
      ArchiveExpand.MaxExpandedBytes = 3000
      val got = ArchiveExpand.expand("o.tar.gz", targz)
      assert(got.map(e => e._1 -> new String(e._2, "UTF-8")) == Seq("y.txt" -> "y" * 40))
      // and the guard still fires when the stream itself is over budget
      ArchiveExpand.MaxExpandedBytes = 1000
      val e = intercept[IllegalArgumentException](
        ArchiveExpand.expand("o.tar.gz", targz))
      assert(e.getMessage.contains("decompression bomb"))
    } finally ArchiveExpand.MaxExpandedBytes = prev
  }

  test("S1 local_files refuses archives loudly and names the archive source") {
    import graft.sources.LocalFileSource
    val dir = tempDir("graft-arcrefuse")
    Files.write(dir.resolve("bundle.zip"), ArchiveFixtures.zip(Seq("a.txt" -> b("x"))))
    val e = intercept[Exception](LocalFileSource(dir.toString).load(spark).collect())
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("archive"), msg)
  }

  test("S1 ArchiveSource: expands in-scan, per-entry dispatch and fingerprints") {
    val dir = tempDir("graft-arcsrc")
    val arc = ArchiveFixtures.tarGz(Seq(
      "a.txt" -> b("alpha"),
      "b.html" -> b("<html><p>one</p>\n<p>two</p></html>"),
      "skip/" + "q" * 120 + "/deep.txt" -> b("deep"),
      "inner.zip" -> ArchiveFixtures.zip(Seq("c.md" -> b("# gamma")))))
    Files.write(dir.resolve("corpus.tar.gz"), arc)
    Files.write(dir.resolve("single.txt.gz"), ArchiveFixtures.gzip(b("solo")))
    val out = ArchiveSource(dir.toString).load(spark).collect()
    val bySrc = out.map(r => (r.getAs[String]("source"), r.getAs[String]("content"))).toMap
    assert(bySrc.size == 5)
    assert(bySrc.exists { case (s, c) => s.endsWith("corpus.tar.gz!a.txt") && c == "alpha" })
    assert(bySrc.exists { case (s, c) => s.endsWith("!b.html") && c == "one\ntwo" })
    assert(bySrc.exists { case (s, c) => s.endsWith("!inner.zip!c.md") && c == "# gamma" })
    assert(bySrc.exists { case (s, c) => s.endsWith("!single.txt") && c == "solo" })
    // fingerprint = sha256 of the ENTRY bytes, not the archive's
    val fps = out.map(_.getAs[String]("fingerprint"))
    assert(fps.forall(_.length == 64) && fps.distinct.length == fps.length)
  }

  test("S1 ArchiveSource: an unexpandable member skips, never aborting the ingest") {
    val dir = tempDir("graft-arcskip")
    // one good member, one .rar (no offline decoder), and a zip nested
    // past max_depth=1 — the latter two must drop, the job must survive
    val arc = ArchiveFixtures.tarGz(Seq(
      "keep.txt" -> b("kept"),
      "backup.rar" -> b("Rar!rest-of-rar"),
      "deep.zip" -> ArchiveFixtures.zip(Seq("d.txt" -> b("buried")))))
    Files.write(dir.resolve("mixed.tar.gz"), arc)
    val out = ArchiveSource(dir.toString, maxDepth = 1).load(spark).collect()
    val srcs = out.map(_.getAs[String]("source"))
    assert(srcs.length == 1 && srcs.head.endsWith("mixed.tar.gz!keep.txt"))
  }
}
