package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPOutputStream, ZipEntry, ZipOutputStream}

/** Deterministic archive WRITERS for the in-plan round-trip gates and
  * specs (the [[graft.functions.LegacyOfficeFixtures]] discipline: the
  * reader is only certified when an in-repo writer and an independent
  * byte-layout check both agree). ustar headers are hand-packed — mtime 0,
  * uid/gid 0, mode 0644, `ustar\0` magic — so the tar reader's checksum
  * validation, name/prefix split, and GNU long-name path are all
  * exercised against real header bytes, not a mock.
  */
object ArchiveFixtures {

  /** Pack entries as a POSIX ustar stream. Paths longer than 100 bytes
    * split into (prefix, name) at a `/` when possible (the ustar rule);
    * unsplittable long paths emit a GNU `L` long-name entry — exactly
    * what GNU tar itself does.
    */
  def tar(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    entries.foreach { case (path, data) =>
      val pathBytes = path.getBytes(StandardCharsets.UTF_8)
      if (pathBytes.length <= 100) out.write(header(path, "", data.length))
      else {
        // ustar split: longest prefix <= 155 bytes at a '/' leaving a
        // name <= 100 bytes
        def b(s: String) = s.getBytes(StandardCharsets.UTF_8).length
        val cut = (path.length - 1 to 0 by -1).find { i =>
          path.charAt(i) == '/' && b(path.substring(0, i)) <= 155 &&
            b(path.substring(i + 1)) <= 100 && i + 1 < path.length
        }
        cut match {
          case Some(i) =>
            out.write(header(path.substring(i + 1), path.substring(0, i), data.length))
          case None =>
            // GNU long-name: an 'L' entry whose data is the NUL-terminated path
            val nameData = java.util.Arrays.copyOf(pathBytes, pathBytes.length + 1)
            out.write(header("././@LongLink", "", nameData.length, typeflag = 'L'))
            out.write(padded(nameData))
            out.write(header(path.take(100), "", data.length))
        }
      }
      out.write(padded(data))
    }
    out.write(new Array[Byte](1024)) // two zero end-blocks
    out.toByteArray
  }

  private def padded(data: Array[Byte]): Array[Byte] = {
    val rem = data.length % 512
    if (rem == 0) data else java.util.Arrays.copyOf(data, data.length + (512 - rem))
  }

  private def header(name: String, prefix: String, size: Int, typeflag: Char = '0'): Array[Byte] = {
    val h = new Array[Byte](512)
    def put(s: String, off: Int, len: Int): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      require(b.length <= len, s"tar field overflow: '$s' ($len)")
      System.arraycopy(b, 0, h, off, b.length)
    }
    def putOctal(v: Long, off: Int, len: Int): Unit =
      // len-1 octal digits + NUL terminator (the POSIX layout)
      put(("0" * (len - 1) + java.lang.Long.toOctalString(v)).takeRight(len - 1), off, len - 1)
    put(name, 0, 100)
    putOctal(0x1a4, 100, 8)      // mode 0644
    putOctal(0, 108, 8)          // uid
    putOctal(0, 116, 8)          // gid
    putOctal(size.toLong, 124, 12)
    putOctal(0, 136, 12)         // mtime
    h(156) = typeflag.toByte
    put("ustar", 257, 6)         // magic, NUL-terminated by the zero array
    put("00", 263, 2)            // version
    put(prefix, 345, 155)
    // checksum: header summed with the checksum field as spaces,
    // stored as 6 octal digits + NUL + space (the GNU convention)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    h.foreach(b => sum += b & 0xFF)
    put(("000000" + java.lang.Long.toOctalString(sum)).takeRight(6), 148, 6)
    h(154) = 0
    h(155) = ' '.toByte
    h
  }

  /** gzip one payload (JDK deflate; mtime field is 0 in the JDK writer). */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(out, 65536)
    g.write(bytes); g.close()
    out.toByteArray
  }

  /** Concatenate gzip members (the `.warc.gz` / multi-member layout). */
  def gzipMembers(parts: Seq[Array[Byte]]): Array[Byte] =
    parts.map(gzip).foldLeft(new ByteArrayOutputStream()) { (o, p) => o.write(p); o }.toByteArray

  /** Pack entries as a zip (fixed entry time for determinism). */
  def zip(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val z = new ZipOutputStream(out)
    entries.foreach { case (name, data) =>
      val e = new ZipEntry(name)
      e.setTime(315532800000L) // 1980-01-01, the zip epoch
      z.putNextEntry(e)
      z.write(data)
      z.closeEntry()
    }
    z.close()
    out.toByteArray
  }

  def tarGz(entries: Seq[(String, Array[Byte])]): Array[Byte] = gzip(tar(entries))

  /** bzip2/xz/zstd via the same commons-compress writers real tools use.
    *
    * Block size scales to the payload (r17, guide §4.5 "bound per-row
    * allocation"): the writer's work arrays are sized from the block size
    * (~1 MB per 100k block), so the default 900k block allocates ~9 MB
    * per stream even for a 10 KB payload — and the READER allocates from
    * the block size declared in the header, so a small block bounds both
    * sides. Any bzip2 decoder accepts any block size; for payloads over
    * 900k the default maximum applies.
    */
  def bzip2(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val blockSize = math.max(1, math.min(9, (bytes.length + 99999) / 100000))
    val c = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(out, blockSize)
    c.write(bytes); c.close()
    out.toByteArray
  }

  def xz(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val c = new org.apache.commons.compress.compressors.xz.XZCompressorOutputStream(out)
    c.write(bytes); c.close()
    out.toByteArray
  }

  /** One reusable native compression context per thread (r17, guide §4.5
    * "initialise heavyweight state once per task, not per row"): the
    * streaming wrapper allocated a fresh native cctx plus ~128 KB of
    * buffers per CALL, which under 32-way task concurrency turned the
    * archive round-trip gates into allocator churn. Task threads are
    * pooled and reused, so the contexts are bounded by the executor's
    * thread count. Level 3 is the zstd default the streaming wrapper used;
    * the one-shot frame additionally records the content size, which any
    * zstd decoder (including the streaming reader) accepts.
    */
  private val zstdCctx = new ThreadLocal[com.github.luben.zstd.ZstdCompressCtx] {
    override def initialValue(): com.github.luben.zstd.ZstdCompressCtx =
      new com.github.luben.zstd.ZstdCompressCtx().setLevel(3)
  }

  def zstd(bytes: Array[Byte]): Array[Byte] = zstdCctx.get().compress(bytes)

  /** Frame block size scales to the payload (same §4.5 bound as [[bzip2]]):
    * the framed-lz4 writer and reader both allocate the declared block
    * size (default 4 MB) regardless of payload; any lz4-frame decoder
    * accepts any of the four standard block sizes.
    */
  def lz4(bytes: Array[Byte]): Array[Byte] = {
    import org.apache.commons.compress.compressors.lz4.{BlockLZ4CompressorOutputStream => _, _}
    val bs =
      if (bytes.length <= 64 * 1024) FramedLZ4CompressorOutputStream.BlockSize.K64
      else if (bytes.length <= 256 * 1024) FramedLZ4CompressorOutputStream.BlockSize.K256
      else if (bytes.length <= 1024 * 1024) FramedLZ4CompressorOutputStream.BlockSize.M1
      else FramedLZ4CompressorOutputStream.BlockSize.M4
    val out = new ByteArrayOutputStream()
    val c = new FramedLZ4CompressorOutputStream(out,
      new FramedLZ4CompressorOutputStream.Parameters(bs))
    c.write(bytes); c.close()
    out.toByteArray
  }

  def snappy(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val c = new org.apache.commons.compress.compressors.snappy.FramedSnappyCompressorOutputStream(out)
    c.write(bytes); c.close()
    out.toByteArray
  }

  // ------------------------------------------------------- mbox (RFC 4155)
  // The mail world's archive format — writers live here with the other
  // container fixtures so the mbox_parse gate can round-trip IN-PLAN.

  /** Frame messages as mboxrd: a `From ` envelope line before each
    * message, every body/header line matching `^>*From ` quoted with one
    * more `>` (what qmail/mutt write — reversible, unlike mboxo).
    */
  def mboxrd(messages: Seq[String]): String =
    messages.map { m =>
      val escaped = m.split("\n", -1).map { l =>
        val bare = l.dropWhile(_ == '>')
        if (bare.startsWith("From ")) ">" + l else l
      }.mkString("\n")
      "From graft@fixture Thu Jan  1 00:00:00 2026\n" + escaped + "\n"
    }.mkString

  /** Quoted-printable encode (RFC 2045 §6.7) of a string's UTF-8 bytes:
    * printable ASCII minus `=` passes through, newlines stay literal,
    * everything else (including space, so no trailing-whitespace rules
    * apply) becomes `=XX`. No soft line breaks — the in-repo decoder and
    * real MTAs both accept overlong lines.
    */
  def qpEncode(s: String): String = {
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    val sb = new StringBuilder(bytes.length * 2)
    bytes.foreach { b =>
      val c = b & 0xFF
      if (c == '\n') sb += '\n'
      else if (c >= 33 && c <= 126 && c != '=') sb += c.toChar
      else sb ++= f"=$c%02X"
    }
    sb.toString
  }
}
