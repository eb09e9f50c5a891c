package graft.functions

import java.nio.charset.StandardCharsets

/** Text extraction for the "plain-text-adjacent" corpus formats a training
  * pipeline meets beside Office containers: Jupyter notebooks (nbformat 3
  * and 4 JSON — reference scope: Yaml-Pipe `yamlpipe/sources/local.py`
  * reads whole files as text; this walks the real cell structure instead),
  * SubRip `.srt` / WebVTT `.vtt` subtitle files (video/audio transcript
  * sidecars), and LaTeX `.tex` sources (arXiv-style dumps).
  *
  * Same discipline as [[DocumentExtract]]: JDK + the Spark-classpath
  * Jackson only, one call per FILE inside the distributed binary scan,
  * loud `IllegalArgumentException`s on structurally broken input, and
  * deterministic output so the in-plan round-trip gates can pin every
  * character against a DuckDB oracle.
  */
object TextualFormats {

  // ------------------------------------------------------------ Jupyter

  /** Jupyter notebook: walk cells in order (nbformat 4 `cells`, nbformat 3
    * `worksheets[].cells`), emitting markdown/raw sources, heading cells as
    * `#`*level markdown, code sources (`source` v4 / `input` v3), and the
    * textual outputs a notebook run left behind (`stream` text,
    * `execute_result`/`display_data`/`pyout` text/plain). Segments join
    * with a blank line — the shape `jupyter nbconvert --to script`-style
    * consumers expect.
    */
  def ipynb(bytes: Array[Byte]): String = {
    val root = Json.parse(new String(bytes, StandardCharsets.UTF_8)) match {
      case m: java.util.Map[_, _] => m.asInstanceOf[java.util.Map[String, Any]]
      case other => throw new IllegalArgumentException(
        s"notebook root is ${if (other == null) "null" else other.getClass.getSimpleName}, not an object")
    }
    val cells: Seq[java.util.Map[String, Any]] =
      if (root.containsKey("cells")) listOf(root.get("cells"))
      else if (root.containsKey("worksheets"))
        listOf(root.get("worksheets")).flatMap(ws => listOf(ws.get("cells")))
      else throw new IllegalArgumentException("notebook has neither 'cells' nor 'worksheets'")

    val segments = cells.flatMap { cell =>
      val tpe = String.valueOf(cell.get("cell_type"))
      tpe match {
        case "markdown" | "raw" => Seq(joined(cell.get("source")))
        case "heading" =>
          val level = cell.get("level") match {
            case n: Number => math.max(1, math.min(6, n.intValue)); case _ => 1
          }
          Seq(("#" * level) + " " + joined(cell.get("source")))
        case "code" =>
          val src = if (cell.containsKey("source")) cell.get("source") else cell.get("input")
          joined(src) +: listOf(cell.get("outputs")).map(outputText)
        case _ => Seq.empty
      }
    }
    segments.filter(_.nonEmpty).mkString("\n\n")
  }

  private def listOf(v: Any): Seq[java.util.Map[String, Any]] = v match {
    case l: java.util.List[_] =>
      scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.toSeq.collect {
        case m: java.util.Map[_, _] => m.asInstanceOf[java.util.Map[String, Any]]
      }
    case _ => Seq.empty
  }

  /** nbformat multiline strings are either one string or a list of line
    * strings (each usually newline-terminated); joining with "" is the
    * nbformat-spec reconstruction.
    */
  private def joined(v: Any): String = v match {
    case null => ""
    case s: String => s
    case l: java.util.List[_] =>
      scala.jdk.CollectionConverters.ListHasAsScala(l).asScala
        .map(String.valueOf).mkString("")
    case other => String.valueOf(other)
  }

  private def outputText(o: java.util.Map[String, Any]): String =
    String.valueOf(o.get("output_type")) match {
      case "stream" => joined(o.get("text"))
      case "execute_result" | "display_data" | "pyout" =>
        o.get("data") match {
          case d: java.util.Map[_, _] =>
            joined(d.asInstanceOf[java.util.Map[String, Any]].get("text/plain"))
          case _ => joined(o.get("text")) // nbformat 3 keeps text inline
        }
      case _ => ""
    }

  // ----------------------------------------------------------- subtitles

  /** Cue markup stripped AFTER joining cues (not per cue) so the strip is
    * ONE regex pass over the final text — the same single pass the DuckDB
    * oracle replays; `[^>]` crossing a newline then behaves identically in
    * both engines. Patterns: HTML-ish cue tags (`<i>`, `<b>`, `<c.cls>`,
    * `<v Name>`, `<00:00:01.000>` karaoke stamps — all angle-bracket runs)
    * and ASS alignment overrides (`{\an8}`).
    */
  private[graft] def stripCueMarkup(s: String): String =
    s.replaceAll("\\{\\\\an[0-9]+\\}", "").replaceAll("<[^>]*>", "")

  /** SubRip: blocks of [index line,] `HH:MM:SS,mmm --> HH:MM:SS,mmm` timing
    * line, then cue text lines until a blank line. Cues join with a single
    * newline; a timing line directly followed by a blank line contributes
    * an EMPTY cue (preserving intentional blank lines in the transcript).
    */
  def srt(raw: String): String = {
    val lines = raw.replace("\r\n", "\n").replace('\r', '\n').split("\n", -1)
    val cues = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    var sawTiming = false
    while (i < lines.length) {
      if (lines(i).trim.isEmpty) i += 1
      else {
        // optional numeric counter line immediately before the timing line
        if (lines(i).trim.matches("[0-9]+") && i + 1 < lines.length &&
          lines(i + 1).contains("-->")) i += 1
        if (lines(i).contains("-->")) {
          sawTiming = true
          i += 1
          val text = scala.collection.mutable.ArrayBuffer.empty[String]
          while (i < lines.length && lines(i).nonEmpty) { text += lines(i); i += 1 }
          cues += text.mkString("\n")
        } else {
          // stray non-cue line (BOM'd header junk): skip its block
          while (i < lines.length && lines(i).nonEmpty) i += 1
        }
      }
    }
    if (!sawTiming) throw new IllegalArgumentException("no '-->' timing line: not an srt file")
    stripCueMarkup(cues.mkString("\n"))
  }

  /** WebVTT: `WEBVTT` signature block, then NOTE/STYLE/REGION blocks are
    * skipped whole; cues may carry an identifier line before the
    * `HH:MM:SS.mmm --> HH:MM:SS.mmm settings` timing line. Join + markup
    * discipline identical to [[srt]].
    */
  def vtt(raw: String): String = {
    val lines = raw.stripPrefix("\ufeff").replace("\r\n", "\n").replace('\r', '\n')
      .split("\n", -1)
    if (lines.isEmpty || !lines(0).startsWith("WEBVTT"))
      throw new IllegalArgumentException("missing WEBVTT signature")
    var i = 0
    while (i < lines.length && lines(i).nonEmpty) i += 1 // signature block
    val cues = scala.collection.mutable.ArrayBuffer.empty[String]
    while (i < lines.length) {
      if (lines(i).trim.isEmpty) i += 1
      else if (lines(i).startsWith("NOTE") || lines(i).startsWith("STYLE") ||
        lines(i).startsWith("REGION")) {
        while (i < lines.length && lines(i).nonEmpty) i += 1
      } else {
        // identifier line: the line right before a timing line
        if (!lines(i).contains("-->") && i + 1 < lines.length &&
          lines(i + 1).contains("-->")) i += 1
        if (lines(i).contains("-->")) {
          i += 1
          val text = scala.collection.mutable.ArrayBuffer.empty[String]
          while (i < lines.length && lines(i).nonEmpty) { text += lines(i); i += 1 }
          cues += text.mkString("\n")
        } else {
          while (i < lines.length && lines(i).nonEmpty) i += 1
        }
      }
    }
    stripCueMarkup(cues.mkString("\n"))
  }

  // -------------------------------------------------------------- LaTeX

  /** Commands whose one brace group is an identifier/path, not prose — the
    * group is consumed whole instead of falling through to the generic
    * "drop braces, keep content" rule.
    */
  private val texDropArg = Set(
    "documentclass", "usepackage", "label", "ref", "eqref", "pageref",
    "cite", "citep", "citet", "includegraphics", "input", "include",
    "bibliography", "bibliographystyle", "vspace", "hspace", "pagestyle")

  /** LaTeX → text, detex-style: comments (`%` to end of line, backslash
    * escapes respected) vanish; if a `\begin{document}` exists only the
    * document body is read; brace groups and math `$` delimiters drop but
    * their content stays; symbol escapes (`\%` `\&` `\$` `\#` `\_` `\{`
    * `\}`, `\textbackslash{}`, `\textasciitilde{}`, `\textasciicircum{}`)
    * decode to their characters; `\\` is a forced line break; `~` is the
    * non-breaking space; known reference-style commands consume their
    * argument; every other command drops its name and keeps its argument
    * text (so `\section{Intro}` yields `Intro`).
    */
  def tex(raw: String): String = {
    val beginTok = "\\begin{document}"
    val b = raw.indexOf(beginTok)
    val e = raw.indexOf("\\end{document}")
    val body =
      if (b >= 0) raw.substring(b + beginTok.length, if (e > b) e else raw.length)
      else raw
    val sb = new StringBuilder(body.length)
    var i = 0
    val n = body.length
    while (i < n) {
      body.charAt(i) match {
        case '\\' if i + 1 < n && !body.charAt(i + 1).isLetter =>
          body.charAt(i + 1) match {
            case c @ ('%' | '&' | '$' | '#' | '_' | '{' | '}') => sb += c
            case '\\' => sb += '\n'
            case ' ' => sb += ' '
            case _ => () // \, \; \[ \] etc drop
          }
          i += 2
        case '\\' =>
          var j = i + 1
          while (j < n && body.charAt(j).isLetter) j += 1
          val cmd = body.substring(i + 1, j)
          if (j < n && body.charAt(j) == '*') j += 1
          cmd match {
            case "textbackslash" => j = skipEmptyGroup(body, j); sb += '\\'
            case "textasciitilde" => j = skipEmptyGroup(body, j); sb += '~'
            case "textasciicircum" => j = skipEmptyGroup(body, j); sb += '^'
            case "ldots" | "dots" => j = skipEmptyGroup(body, j); sb ++= "..."
            case "begin" | "end" => j = skipGroup(body, skipOptions(body, j))
            case c if texDropArg(c) => j = skipGroup(body, skipOptions(body, j))
            case _ =>
              // bare command (\item, \maketitle): gobble trailing blanks the
              // way TeX eats whitespace after a control word — but only when
              // no brace group follows, so `\emph{x}` keeps its argument
              // via the generic brace rule without swallowing spacing
              if (j >= n || body.charAt(j) != '{')
                while (j < n && (body.charAt(j) == ' ' || body.charAt(j) == '\t')) j += 1
          }
          i = j
        case '%' => // comment: swallow through the newline
          while (i < n && body.charAt(i) != '\n') i += 1
          if (i < n) i += 1
        case '{' | '}' | '$' => i += 1
        case '~' => sb += ' '; i += 1
        case c => sb += c; i += 1
      }
    }
    sb.toString.trim
  }

  private def skipEmptyGroup(s: String, j: Int): Int =
    if (j + 1 < s.length && s.charAt(j) == '{' && s.charAt(j + 1) == '}') j + 2 else j

  private def skipOptions(s: String, j0: Int): Int = {
    var j = j0
    while (j < s.length && s.charAt(j) == '[') {
      while (j < s.length && s.charAt(j) != ']') j += 1
      if (j < s.length) j += 1
    }
    j
  }

  private def skipGroup(s: String, j0: Int): Int = {
    var j = j0
    if (j < s.length && s.charAt(j) == '{') {
      var depth = 0
      var done = false
      while (j < s.length && !done) {
        s.charAt(j) match {
          case '{' => depth += 1
          case '}' => depth -= 1; if (depth == 0) done = true
          case _ => ()
        }
        j += 1
      }
    }
    j
  }
}

/** Deterministic fixture WRITERS for [[TextualFormats]]'s round-trip gates
  * and specs (the [[LegacyOfficeFixtures]] discipline): structurally real
  * files — nbformat-shape JSON via Jackson (so any payload character
  * JSON-escapes correctly), CRLF subtitle files with real timing lines,
  * LaTeX with the full symbol-escape map.
  */
object TextualFixtures {

  /** nbformat 4: markdown cell carrying the payload as a REAL list of
    * newline-terminated source lines, a code cell with stream +
    * execute_result outputs, and a raw tail cell.
    */
  def ipynb4(payload: String): Array[Byte] = {
    val nb = new java.util.LinkedHashMap[String, Any]
    nb.put("nbformat", 4: Integer)
    nb.put("nbformat_minor", 5: Integer)
    nb.put("metadata", new java.util.LinkedHashMap[String, Any])
    val cells = new java.util.ArrayList[Any]
    cells.add(cell("markdown", sourceLines(payload)))
    val code = cell("code", "print(1 + 1)")
    val outs = new java.util.ArrayList[Any]
    outs.add(streamOutput(Seq("2\n", "done")))
    val res = new java.util.LinkedHashMap[String, Any]
    res.put("output_type", "execute_result")
    val data = new java.util.LinkedHashMap[String, Any]
    data.put("text/plain", "42")
    res.put("data", data)
    outs.add(res)
    code.put("outputs", outs)
    cells.add(code)
    cells.add(cell("raw", "rawtail"))
    nb.put("cells", cells)
    Json.write(nb).getBytes(StandardCharsets.UTF_8)
  }

  /** nbformat 3: the same content through `worksheets[].cells`, `input`
    * for code, inline `text` on a `pyout` output, and a level-2 heading
    * cell.
    */
  def ipynb3(payload: String): Array[Byte] = {
    val nb = new java.util.LinkedHashMap[String, Any]
    nb.put("nbformat", 3: Integer)
    val cells = new java.util.ArrayList[Any]
    cells.add(cell("markdown", sourceLines(payload)))
    val code = new java.util.LinkedHashMap[String, Any]
    code.put("cell_type", "code")
    code.put("input", "print(1 + 1)")
    val outs = new java.util.ArrayList[Any]
    outs.add(streamOutput(Seq("2\n", "legacy")))
    val py = new java.util.LinkedHashMap[String, Any]
    py.put("output_type", "pyout")
    py.put("text", "7")
    outs.add(py)
    code.put("outputs", outs)
    cells.add(code)
    val heading = new java.util.LinkedHashMap[String, Any]
    heading.put("cell_type", "heading")
    heading.put("level", 2: Integer)
    heading.put("source", "Legacy heading")
    cells.add(heading)
    val ws = new java.util.LinkedHashMap[String, Any]
    ws.put("cells", cells)
    val wss = new java.util.ArrayList[Any]
    wss.add(ws)
    nb.put("worksheets", wss)
    Json.write(nb).getBytes(StandardCharsets.UTF_8)
  }

  private def cell(tpe: String, source: Any): java.util.LinkedHashMap[String, Any] = {
    val c = new java.util.LinkedHashMap[String, Any]
    c.put("cell_type", tpe)
    c.put("source", source)
    c
  }

  private def streamOutput(text: Seq[String]): java.util.LinkedHashMap[String, Any] = {
    val o = new java.util.LinkedHashMap[String, Any]
    o.put("output_type", "stream")
    o.put("name", "stdout")
    val l = new java.util.ArrayList[Any]
    text.foreach(l.add)
    o.put("text", l)
    o
  }

  /** Split into nbformat source shape: list of lines, every line but the
    * last newline-terminated; joining with "" reconstructs the payload.
    */
  private def sourceLines(payload: String): java.util.ArrayList[Any] = {
    val l = new java.util.ArrayList[Any]
    val parts = payload.split("\n", -1)
    parts.zipWithIndex.foreach { case (p, idx) =>
      l.add(if (idx < parts.length - 1) p + "\n" else p)
    }
    l
  }

  /** The constant opening cue both subtitle writers prepend: markup-laden
    * FIXTURE text (never payload — wrapping payload in tags would let a
    * payload's partial `<`/`>` characters merge with writer tags and
    * desync the oracle's replayed strip). Extracts to
    * `opening credits`.
    */
  val subtitleLeadCue = "{\\an8}<i>opening</i> <b>credits</b>"
  val subtitleLeadText = "opening credits"

  /** SubRip file, CRLF line endings: the markup lead cue, then one cue
    * per payload line (empty payload lines become empty cues so blank
    * lines survive the round trip).
    */
  def srt(payloadLines: Seq[String]): String = {
    val blocks = (subtitleLeadCue +: payloadLines).zipWithIndex.map { case (line, i) =>
      val t0 = f"00:${i / 60}%02d:${i % 60}%02d,100"
      val t1 = f"00:${(i + 1) / 60}%02d:${(i + 1) % 60}%02d,000"
      s"${i + 1}\r\n$t0 --> $t1\r\n" + (if (line.isEmpty) "" else s"$line\r\n")
    }
    blocks.mkString("\r\n") + "\r\n"
  }

  /** WebVTT file: signature + metadata header, a NOTE block, a STYLE
    * block, then the cues of [[srt]] with identifier lines, dotted
    * millisecond timings, and cue settings.
    */
  def vtt(payloadLines: Seq[String]): String = {
    val header = "WEBVTT - graft fixture\r\nKind: captions\r\n\r\n" +
      "NOTE\r\nthis block never reaches the transcript\r\n\r\n" +
      "STYLE\r\n::cue { color: cream }\r\n\r\n"
    val blocks = (subtitleLeadCue +: payloadLines).zipWithIndex.map { case (line, i) =>
      val t0 = f"00:${i / 60}%02d:${i % 60}%02d.100"
      val t1 = f"00:${(i + 1) / 60}%02d:${(i + 1) % 60}%02d.000"
      s"cue-${i + 1}\r\n$t0 --> $t1 align:start\r\n" +
        (if (line.isEmpty) "" else s"$line\r\n")
    }
    header + blocks.mkString("\r\n") + "\r\n"
  }

  private def texEscape(payload: String): String = {
    val sb = new StringBuilder(payload.length + 16)
    payload.foreach {
      case '\\' => sb ++= "\\textbackslash{}"
      case '~' => sb ++= "\\textasciitilde{}"
      case '^' => sb ++= "\\textasciicircum{}"
      case c @ ('%' | '&' | '$' | '#' | '_' | '{' | '}') => sb += '\\'; sb += c
      case c => sb += c
    }
    sb.toString
  }

  /** Real article skeleton: comment line, preamble (skipped via the
    * `\begin{document}` body isolation), a starred section header, the
    * escaped payload, and an `\item`-led coda — extraction yields
    * `Header\n<payload>\nlast item`.
    */
  def tex(payload: String): String =
    "% graft tex fixture — the comment rule swallows this line\n" +
      "\\documentclass[11pt]{article}\n" +
      "\\usepackage{amsmath}\n" +
      "\\begin{document}\n" +
      "\\section*{Header}\n" +
      texEscape(payload) + "\n" +
      "\\item last item\n" +
      "\\end{document}\n"
}
