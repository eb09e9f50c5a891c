package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Pure-Scala text splitters reproducing the chunking semantics of the
  * reference pipeline (dongwonmoon/Yaml-Pipe,
  * `yamlpipe/components/chunkers.py:39-183`), which delegates to langchain's
  * `RecursiveCharacterTextSplitter` / `MarkdownHeaderTextSplitter`. The
  * algorithms here are re-derived from the publicly documented langchain
  * behavior and pinned by the reference's golden boundary tests
  * (`tests/components/test_chunkers.py:19-47`).
  *
  * These are deterministic, allocation-light, driver-independent functions:
  * they run inside executor tasks (wrapped as UDFs and exploded), so chunking
  * parallelism is Spark partition parallelism — the reference's
  * `ProcessPoolExecutor(min(4, cpu))` (`core/pipeline.py:53`) is subsumed.
  */
object TextSplitters {

  /** Default separator cascade: paragraph, line, word, character. */
  val DefaultSeparators: Seq[String] = Seq("\n\n", "\n", " ", "")

  // ---------------------------------------------------------------------------
  // Recursive character splitter (reference chunkers.py:39-87)
  // ---------------------------------------------------------------------------

  /** Split `text` into chunks of at most `chunkSize` characters with
    * `chunkOverlap` characters of overlap, recursively trying coarser
    * separators first. Semantics: keep_separator=true (separator stays
    * attached to the start of the following fragment), strip_whitespace=true.
    *
    * Golden contract (chunk_size=30, overlap=5):
    * "This is a test sentence for our amazing chunker. It is a long sentence."
    * -> ["This is a test sentence for", "for our amazing chunker. It", ...]
    */
  def recursiveSplit(
      text: String,
      chunkSize: Int,
      chunkOverlap: Int,
      separators: Seq[String] = DefaultSeparators): Seq[String] = {
    if (text == null || text.strip().isEmpty) return Seq.empty
    splitRec(text, separators, chunkSize, chunkOverlap)
  }

  private def splitRec(
      text: String,
      separators: Seq[String],
      chunkSize: Int,
      chunkOverlap: Int): Seq[String] = {
    // Pick the first separator that occurs in the text (empty string always
    // matches); the remaining, finer separators drive recursion on oversize
    // fragments.
    var separator = separators.lastOption.getOrElse("")
    var remaining: Seq[String] = Seq.empty
    var found = false
    var i = 0
    while (i < separators.length && !found) {
      val s = separators(i)
      if (s.isEmpty) { separator = s; remaining = Seq.empty; found = true }
      else if (text.contains(s)) {
        separator = s; remaining = separators.drop(i + 1); found = true
      }
      i += 1
    }

    val splits = splitKeepingSeparator(text, separator)
    val finalChunks = ArrayBuffer[String]()
    val good = ArrayBuffer[String]()
    // With keep_separator semantics the merge separator is empty: fragments
    // already carry their leading separator.
    val mergeSep = ""
    splits.foreach { s =>
      if (s.length < chunkSize) good += s
      else {
        if (good.nonEmpty) {
          finalChunks ++= mergeSplits(good.toSeq, mergeSep, chunkSize, chunkOverlap)
          good.clear()
        }
        if (remaining.isEmpty) finalChunks += s
        else finalChunks ++= splitRec(s, remaining, chunkSize, chunkOverlap)
      }
    }
    if (good.nonEmpty)
      finalChunks ++= mergeSplits(good.toSeq, mergeSep, chunkSize, chunkOverlap)
    finalChunks.toSeq
  }

  /** Split on a literal separator, re-attaching each separator occurrence to
    * the start of the fragment that follows it; empty fragments dropped.
    * Empty separator means per-CODE-POINT split (not per JVM char — a
    * per-char split would cut astral-plane surrogate pairs in half, which
    * the reference, operating on Python code-point strings, never does).
    */
  private[functions] def splitKeepingSeparator(text: String, sep: String): Seq[String] = {
    if (sep.isEmpty) {
      val out = ArrayBuffer[String]()
      var i = 0
      while (i < text.length) {
        val cp = text.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      return out.toSeq
    }
    val out = ArrayBuffer[String]()
    val first = text.indexOf(sep)
    if (first < 0) { out += text }
    else {
      if (first > 0) out += text.substring(0, first)
      var pos = first
      while (pos < text.length) {
        val next = text.indexOf(sep, pos + sep.length)
        val end = if (next < 0) text.length else next
        out += text.substring(pos, end)
        pos = end
      }
    }
    out.filter(_.nonEmpty).toSeq
  }

  /** Greedy merge of fragments into chunks of at most `chunkSize` chars,
    * sliding a `chunkOverlap`-char window backward at each chunk boundary.
    */
  private[functions] def mergeSplits(
      splits: Seq[String],
      separator: String,
      chunkSize: Int,
      chunkOverlap: Int): Seq[String] = {
    val sepLen = separator.length
    val docs = ArrayBuffer[String]()
    var current = ArrayBuffer[String]()
    var total = 0
    splits.foreach { d =>
      val len = d.length
      if (total + len + (if (current.nonEmpty) sepLen else 0) > chunkSize) {
        if (current.nonEmpty) {
          val doc = joinDocs(current.toSeq, separator)
          if (doc != null) docs += doc
          // Slide the window: drop leading fragments until within overlap
          // budget and the incoming fragment fits.
          while (total > chunkOverlap ||
                 (total + len + (if (current.nonEmpty) sepLen else 0) > chunkSize && total > 0)) {
            total -= current.head.length + (if (current.length > 1) sepLen else 0)
            current.remove(0)
          }
        }
      }
      current += d
      total += len + (if (current.length > 1) sepLen else 0)
    }
    val doc = joinDocs(current.toSeq, separator)
    if (doc != null) docs += doc
    docs.toSeq
  }

  private def joinDocs(docs: Seq[String], sep: String): String = {
    val text = docs.mkString(sep).strip()
    if (text.isEmpty) null else text
  }

  // ---------------------------------------------------------------------------
  // Markdown header splitter (reference chunkers.py:90-138)
  // ---------------------------------------------------------------------------

  /** A markdown section: content plus the active header path
    * ("Header 1" -> "...", "Header 2" -> "...", "Header 3" -> "...").
    */
  final case class MdChunk(content: String, headers: Map[String, String])

  private val HeaderSpecs: Seq[(String, String, Int)] =
    Seq(("###", "Header 3", 3), ("##", "Header 2", 2), ("#", "Header 1", 1))

  /** Split markdown text on `#`/`##`/`###` headers. Header lines are kept in
    * the chunk content (the reference's golden test asserts
    * `chunks[0].content.startswith("# Header 1")`,
    * `tests/components/test_chunkers.py:38`). Each chunk's headers map holds
    * the active header path; entering a header clears deeper levels. Lines
    * inside ``` / ~~~ code fences are never treated as headers. Blank lines
    * are dropped; content lines are stripped and joined with "\n".
    */
  def markdownSplit(text: String): Seq[MdChunk] = {
    if (text == null || text.strip().isEmpty) return Seq.empty
    val chunks = ArrayBuffer[MdChunk]()
    var headers = Map[String, String]()
    val lines = ArrayBuffer[String]()
    var inFence = false
    var fenceMarker = ""

    def flush(): Unit = {
      if (lines.nonEmpty) {
        chunks += MdChunk(lines.mkString("\n").strip(), headers)
        lines.clear()
      }
    }

    text.split("\n", -1).foreach { raw =>
      val line = raw.strip()
      if (!inFence && (line.startsWith("```") || line.startsWith("~~~"))) {
        inFence = true
        fenceMarker = line.substring(0, 3)
        lines += line
      } else if (inFence) {
        if (line.startsWith(fenceMarker)) inFence = false
        lines += line
      } else {
        val hdr = HeaderSpecs.find { case (marker, _, _) =>
          line.startsWith(marker + " ") || line == marker
        }
        hdr match {
          case Some((marker, name, level)) =>
            flush()
            val title = if (line.length > marker.length) line.substring(marker.length + 1).strip() else ""
            headers = headers.filter { case (k, _) =>
              HeaderSpecs.find(_._2 == k).forall(_._3 < level)
            } + (name -> title)
            lines += line
          case None =>
            if (line.nonEmpty) lines += line
        }
      }
    }
    flush()
    chunks.toSeq
  }

  // ---------------------------------------------------------------------------
  // Adaptive dispatch (reference chunkers.py:141-183)
  // ---------------------------------------------------------------------------

  /** Heuristic from the reference (`chunkers.py:161-171`): content with >= 2
    * occurrences of "\n# ", "\n## ", or "\n### " is markdown-ish.
    */
  def isMarkdownish(text: String): Boolean = {
    if (text == null) return false
    def countOcc(sub: String): Int = {
      var c = 0; var i = text.indexOf(sub)
      while (i >= 0) { c += 1; i = text.indexOf(sub, i + 1) }
      c
    }
    countOcc("\n# ") >= 2 || countOcc("\n## ") >= 2 || countOcc("\n### ") >= 2
  }

  /** Adaptive chunking: markdown-ish docs go through the markdown splitter,
    * everything else through the recursive splitter. Returns chunks in the
    * MdChunk shape (headers empty for the recursive path).
    */
  def adaptiveSplit(text: String, chunkSize: Int, chunkOverlap: Int): Seq[MdChunk] =
    if (isMarkdownish(text)) markdownSplit(text)
    else recursiveSplit(text, chunkSize, chunkOverlap).map(MdChunk(_, Map.empty))
}
