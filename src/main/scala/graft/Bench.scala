package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Per-query: N reps (SPARK_GRAFT_BENCH_REPS, default 3),
  * MEDIAN reported — the first rep doubles as the per-query warm-up and the
  * median discards its codegen/classload cost, making round-over-round
  * deltas attributable to plan changes rather than run-order noise.
  * Per-rep wall AND process-CPU times are persisted to
  * `bench_plans/bench_reps.json` (sha-pinned on the printed line, which
  * also carries the worst max/min rep-wall spread): wall inflating while
  * CPU stays flat marks external box contention, wall and CPU moving
  * together marks a real regression — medians alone cannot tell the two
  * apart when all reps land in the contended window. Each
  * query's physical plan — captured AFTER executing the query's own
  * QueryExecution, i.e. the AQE-FINAL runtime plan including SMJ->broadcast
  * conversions — is normalized (expression ids stripped) and persisted to
  * `bench_plans/<name>.txt` with a digest in the output JSON. A digest
  * change can therefore mean either a code-driven plan change OR a runtime
  * size crossing an AQE threshold; the persisted plan text is what
  * disambiguates the two (the Initial Plan section is printed alongside the
  * Final Plan).
  */
object Bench {

  /** Strip run-varying tokens (expression ids, plan ids, object addresses,
    * codegen stage ids) so the digest is stable across runs of the same
    * logical plan.
    */
  private[graft] def normalizePlan(plan: String): String = {
    val normalized = plan
      .replaceAll("#\\d+", "#N")
      .replaceAll("plan_id=\\d+", "plan_id=N")
      .replaceAll("\\(\\d+\\)", "(N)") // codegen stage ids
      .replaceAll("@[0-9a-fA-F]+", "@X")
      .replaceAll("Statistics\\([^)]*\\)", "Statistics(X)")
      .replaceAll("id=\\d+", "id=N")
      // JVM-run-varying tokens that flapped digests with no plan change:
      // lambda class ids (Lambda$5808/0x7f26...) and AQE query-stage
      // numbers (assigned in runtime completion order).
      .replaceAll("Lambda\\$\\d+/0x[0-9a-fA-F]+", "Lambda\\$N")
      .replaceAll("QueryStage \\d+", "QueryStage N")
      .replaceAll("lambda [a-z]+_\\d+", "lambda v_N") // global lambda-var counter (x_/y_/...)
      // Literal control characters (e.g. the \u0000 null-sentinel literal
      // some operators embed in expressions) would make the dump read as a
      // binary file to grep — print the replacement char instead.
      .replaceAll("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", "�")
      // Long integer-list literals (8+ elements) flap when they carry
      // runtime-measured values — e.g. the distributed prefix sum's
      // per-partition base offsets (curriculum_order), which depend on the
      // row distribution of a localCheckpoint across threads. The list's
      // SHAPE is the plan signal; its values are data, gated by the value
      // oracle, not the digest.
      .replaceAll("\\[-?\\d+(?:,-?\\d+){7,}\\]", "[ints]")
      // Per-run temp fixture dirs (Files.createTempDirectory("graft-…"))
      // leak a random suffix into FileScan Location fields — a path is
      // provenance, not plan shape (r14: change_detection_bucketed
      // flapped on exactly this).
      .replaceAll("/tmp/graft-[0-9a-zA-Z]+", "/tmp/graft-X")
      // Content-addressed IVF-PQ registry paths embed the corpus
      // fingerprint and (since r16) the trainer-recipe version segment
      // (stable per corpus/trainer, but they would churn every digest
      // whenever testdata is regenerated or the recipe bumps —
      // provenance, not plan shape).
      .replaceAll("(r\\d+-)?fp-[0-9a-f]+-[0-9a-f]+", "fp-X")
    // TRUNCATED scan-filter lists flapped digests with no plan change:
    // Spark clips the field at a fixed RAW character count, and the raw
    // width of expression ids (ts#123 vs ts#1234) varies run to run, so
    // the visible prefix ends a character or two earlier or later. Keep
    // a fixed 40-char NORMALIZED prefix (the pushdown evidence the
    // committed plans exist to show) and cut the run-varying tail — the
    // raw 100-char budget can't normalize below ~40, so the kept prefix
    // is identical across runs.
    val truncatedList =
      """(DataFilters|PartitionFilters|PushedFilters): \[([^\]]*)\.\.\., """.r
    val clipped = truncatedList.replaceAllIn(normalized, m =>
      scala.util.matching.Regex.quoteReplacement(
        s"${m.group(1)}: [${m.group(2).take(40)}..., "))
    // Collapse cached-relation subtrees: InMemoryRelation re-prints its
    // entire child plan (at every reference), turning a digest into
    // thousands of lines without adding shape information — the cache
    // CONTENT's plan is already visible where it was first built.
    val lines = clipped.linesIterator.toSeq
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var skipIndent = -1
    lines.foreach { line =>
      val indent = line.indexWhere(c => !" :+-".contains(c)) match {
        case -1 => line.length
        case i => i
      }
      if (skipIndent >= 0 && indent > skipIndent) () // inside a collapsed cache subtree
      else {
        skipIndent = -1
        if (line.contains("InMemoryRelation")) {
          out += line.substring(0, line.indexOf("InMemoryRelation")) +
            "InMemoryRelation [collapsed cached subtree]"
          skipIndent = indent
        } else out += line
      }
    }
    out.mkString("\n")
  }

  private def digest(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
  }

  /** PLACEMENT-INVARIANT canonical form for the second digest
    * (`digests_canonical.json`): AQE re-decides exchange-reuse sites,
    * build sides, and local/coalesced shuffle reads from runtime sizes
    * and stage-completion ORDER, so identical code can swap which of two
    * equal exchanges prints in full and which prints as `ReusedExchange`
    * — moving whole subtrees between parents (and changing how many
    * REUSE MARKERS vs full copies the text holds) and flapping the
    * primary digest ~16-18 times a round with zero semantic change (the
    * documented class). Canonicalization: de-indent every line (subtree
    * position no longer matters), erase the reuse/build-side/read-mode
    * markers, and digest the sorted SET of distinct lines — reuse-site
    * swaps only move or re-count identical line content, never change
    * which distinct lines exist. Deliberately coarser than the primary
    * digest (it forgets tree placement and subtree multiplicity); it
    * exists to FILTER the flap class — a canonical change is a real plan
    * change, a primary-only change is AQE placement noise.
    */
  private[graft] def canonicalizePlan(normalized: String): String =
    normalized.linesIterator.map { line =>
      val deIndented = {
        val t = line.dropWhile(c => " :+-".contains(c))
        if (t.startsWith("*(N) ")) t.drop(5) else t
      }
      if (deIndented.contains("LogicalQueryStage"))
        // AQE's mid-flight logical wrapper (subquery dumps only): its
        // nesting depth and embedded physical sketch vary with stage-
        // completion timing; the surrounding physical lines carry the
        // shape.
        "LogicalQueryStage X"
      else if (deIndented.startsWith("Expand "))
        // The distinct-aggregate rewrite's null-projection groups are
        // ordered by expression id (run-varying); the aggregate lines
        // around the Expand carry the semantic content.
        "Expand [X]"
      else {
        val dropped = deIndented
          // A reuse marker is pure placement: drop the marker (its
          // referenced exchange prints in full at some other site), so a
          // run that reuses one fewer exchange still canonicalizes equal.
          .replaceAll("ReusedExchange \\[[^\\]]*\\], ", "")
          .replaceAll("\\bBuild(Left|Right)\\b", "BuildX")
          .replaceAll("AQEShuffleRead \\S+", "AQEShuffleRead X")
          // A broadcast mode's key ORDINAL is side-specific (input[0] on
          // the compact side vs input[2] on the wide one), so a build-side
          // flip rewrites it with no semantic change; the type/nullability
          // stay and still distinguish genuinely different keys.
          .replaceAll("input\\[\\d+, ", "input[N, ")
          // Whether a window group-limit gets a map-side Partial pass
          // depends on where AQE cut the stage, not on the query: the
          // Final pass always exists, so in the line SET the Partial
          // twin's presence is pure stage-boundary placement.
          .replaceAll("(WindowGroupLimit .*), (?:Partial|Final)$", "$1, X")
          // The distinct-aggregate rewrite numbers its grouping-set ids in
          // expression-id order (run-varying); which COLUMN carries which
          // gid is placement, the filtered aggregate itself is the signal.
          .replaceAll("\\(gid#N = \\d+\\)", "(gid#N = G)")
        // Aggregate key/function/output lists and hash-partitioning args
        // are SETS whose print order follows expression ids (the distinct-
        // aggregate rewrite reorders them run to run): sort the top-level
        // comma segments.
        Seq("keys=[", "functions=[", "output=[", "hashpartitioning(")
          .foldLeft(dropped)(sortListSegment)
      }
    }.toSeq.distinct.sorted.mkString("\n")

  /** Sort the top-level comma-separated tokens of every `marker`-prefixed
    * bracket group in `line` (bracket-matched across nested `[({`), e.g.
    * `keys=[b, a(x, y)]` -> `keys=[a(x, y), b]`.
    */
  private def sortListSegment(line: String, marker: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < line.length) {
      val at = line.indexOf(marker, i)
      if (at < 0) { sb.append(line.substring(i)); i = line.length }
      else {
        sb.append(line.substring(i, at + marker.length))
        var depth = 1
        var j = at + marker.length
        val tokens = scala.collection.mutable.ArrayBuffer.empty[String]
        var tok = new StringBuilder
        while (j < line.length && depth > 0) {
          val c = line.charAt(j)
          if ("[({".contains(c)) depth += 1
          else if ("])}".contains(c)) depth -= 1
          if (depth == 0) ()
          else if (c == ',' && depth == 1) { tokens += tok.toString; tok = new StringBuilder }
          else tok.append(c)
          j += 1
        }
        tokens += tok.toString
        sb.append(tokens.map(_.trim).sorted.mkString(", "))
        if (depth == 0) sb.append(line.charAt(j - 1)) // the closing bracket
        i = j
      }
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default matches the target runtime (local[32], shuffle.partitions=32
    // — the brief's setting and this box's core count). The old default of
    // 4 silently benched a 4-thread cluster whenever the env var was unset
    // — including every DRIVER bench run — and flipped every Exchange's
    // partition count (hence every plan digest) between driver and local
    // close runs.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // Local-iteration filter: comma-separated query names. Unset (driver
    // runs) = full suite.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // AQE coalescing floor (r17, guide §2.2 "fewer, larger reduce
      // partitions" + the scaling block's finding that the suite ran
      // FASTER at 8 cores than 32): the old "1b" floor disabled coalescing
      // entirely so every tiny exchange ran `cpus` tasks, and with ~2-3 ms
      // fixed cost per task launch the many metadata-sized stages paid
      // ~85 ms each for microseconds of work. With parallelismFirst (the
      // Spark default) the target partition size is
      // max(totalBytes/parallelism, THIS floor), so a 64k floor only
      // narrows exchanges carrying < ~64k*width bytes — the audit
      // summaries, count fences, and iteration metadata — while anything
      // data-sized (>= a few MB total) keeps full width. Heavy-compute
      // stages over tiny bytes are NOT exposed: the operators' explicit
      // `repartition(n)` spreads (ensureParallelism/iterationWidth) are
      // user-specified and never coalesced by AQE. Env-overridable so the
      // scaling behavior stays inspectable; results are partition-count
      // independent by the repo's exact-arithmetic discipline (the same
      // invariance the 8-core driver run already exercises).
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the session (codegen, shuffle machinery, parquet reader) so
    // the first timed query doesn't absorb ~3s of JVM/Spark startup.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val plansDir = new java.io.File("bench_plans")
    plansDir.mkdirs()
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    val planDigests = scala.collection.mutable.LinkedHashMap[String, String]()
    val planCanonical = scala.collection.mutable.LinkedHashMap[String, String]()
    // Per-rep attribution (r14 verdict #2): a contended driver box once
    // turned a 12.9 s gate into a 117.8 s headline, and the median alone
    // could not separate a real regression from a noisy neighbor. Record
    // every rep's WALL time and the JVM's PROCESS-CPU delta across it:
    // wall growing while CPU stays flat is the signature of external
    // contention (the process was descheduled, not doing more work);
    // wall and CPU growing together is a real plan/code regression.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def processCpuNs(): Long = osBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
      case _ => -1L // non-HotSpot fallback: cpu_ms reported as null
    }
    val repDetail = scala.collection.mutable.LinkedHashMap[String, Seq[(Double, Double)]]()
    val benched = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    val results = benched.map { case (name, fn) =>
      val times = (1 to reps).flatMap { rep =>
        // Isolate reps from each other: drop leftover cached tables /
        // broadcasts and collect garbage outside the timed window.
        spark.catalog.clearCache()
        System.gc()
        val cpu0 = processCpuNs()
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          df.count()
          val dt = (System.nanoTime() - t0) / 1e9
          val cpuDt = if (cpu0 < 0) -1.0 else (processCpuNs() - cpu0) / 1e9
          repDetail(name) = repDetail.getOrElse(name, Seq.empty) :+ ((dt, cpuDt))
          if (rep == reps) {
            // count() executes its OWN QueryExecution (the aggregate's), so
            // df's plan would still be AQE-initial here. Execute df's own
            // query (untimed — gate results are small by design) so the
            // captured digest reflects the runtime-final plan: AQE
            // SMJ->broadcast conversions and stage coalescing included.
            df.collect()
            val normalized = normalizePlan(df.queryExecution.executedPlan.toString)
            planDigests(name) = digest(normalized)
            planCanonical(name) = digest(canonicalizePlan(normalized))
            val w = new java.io.PrintWriter(new java.io.File(plansDir, s"$name.txt"), "UTF-8")
            try w.write(normalized) finally w.close()
          }
          Some(dt)
        } catch {
          case e: Throwable =>
            if (!failed.contains(name)) {
              failed += name
              System.err.println(s"[bench] FAILED $name: ${e.getMessage}")
              // A stale digest from a previous run must not masquerade as
              // this round's plan for a query that failed to produce one.
              new java.io.File(plansDir, s"$name.txt").delete()
              planDigests.remove(name)
              planCanonical.remove(name)
            }
            None
        }
      }
      // A failed query has NO timing — encode as None (null in the JSON
      // artifacts) instead of a free-looking 0.000 that silently deflates
      // the total (r7 advice: the bench total must cover only queries that
      // actually ran).
      val median =
        if (times.isEmpty) None
        else Some(times.sorted.apply(times.size / 2))
      name -> median
    }
    val ran = results.collect { case (k, Some(v)) => (k, v) }
    if (failed.nonEmpty)
      System.err.println(s"[bench] ${failed.size}/${benched.size} queries FAILED: ${failed.sorted.mkString(", ")}")
    // The driver parses the result JSON out of the LAST ~2000 chars of
    // stdout (BENCH_r04 had parsed:null because the r4 line, carrying 54
    // plan digests, outgrew that window and the tail started mid-line). So:
    // digests go to a file, timings are rounded to ms, and the line is
    // guarded — anything pushing it near the window is a build error we
    // want to see locally, not a silently ungraded round.
    // Under SPARK_GRAFT_BENCH_ONLY the run covers a subset — rewriting the
    // digest index from it would silently drop every other query's digest
    // (the per-query .txt files only overwrite the queries that ran, so
    // they stay).
    // JSON round artifacts write through Files.write, which THROWS on IO
    // failure — a PrintWriter only sets an internal error flag, and a
    // silently stale "self-contained round record" is exactly the failure
    // mode these files exist to prevent.
    def writeArtifact(name: String, content: String): Unit =
      java.nio.file.Files.write(new java.io.File(plansDir, name).toPath,
        content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (only.isEmpty) {
      writeArtifact("digests.json",
        planDigests.map { case (k, v) => s"\"$k\":\"$v\"" }
          .mkString("{", ",", "}"))
      // Second, placement-invariant digest (see [[canonicalizePlan]]):
      // diff THIS file round-over-round to separate real plan changes
      // from AQE reuse-site/build-side placement noise.
      // Sorted by name so the file is byte-comparable with
      // tools.CanonicalDigests regenerations.
      writeArtifact("digests_canonical.json",
        planCanonical.toSeq.sortBy(_._1)
          .map { case (k, v) => s"\"$k\":\"$v\"" }
          .mkString("{", ",", "}"))
    }
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def r2(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def r1(v: Double): String = "%.1f".formatLocal(java.util.Locale.ROOT, v)
    val total = if (ran.nonEmpty) ran.values.sum else 0.0
    // Per-rep attribution artifact + inline contention heuristic (r14
    // verdict #2). The artifact carries EVERY query's per-rep wall and
    // process-CPU milliseconds; the printed line carries its sha plus the
    // worst max/min rep-wall spread so a reader of the round record alone
    // can tell "contended box" (big spread, or wall >> cpu/cores) from
    // "real regression" (tight spread, cpu tracking wall) without
    // re-running. Subset runs skip the artifact (same rule as digests).
    def ms(v: Double): String = if (v < 0) "null" else (v * 1000).round.toString
    // Spread over the STEADY-STATE reps only: rep 1 is the documented
    // warm-up (codegen/classload, cold-registry training) and carries a
    // deterministic 2-30x wall premium — including it would flag every
    // normal run as "contended" and defeat the heuristic. With the full
    // arrays in the artifact a reader can still inspect rep 1.
    def repSpread(ws: Seq[Double]): Double = {
      val steady = if (ws.size >= 3) ws.drop(1) else ws
      if (steady.size < 2 || steady.min <= 0) 1.0 else steady.max / steady.min
    }
    val spreads = repDetail.toSeq.map { case (k, d) => k -> repSpread(d.map(_._1)) }
    val (spreadQ, spreadMax) =
      if (spreads.isEmpty) ("", 1.0) else spreads.maxBy(_._2)
    val repsPin =
      if (only.nonEmpty) ""
      else {
        val repsJson = repDetail.map { case (k, d) =>
          s"""\"$k\":{"wall_ms":[${d.map(x => ms(x._1)).mkString(",")}],""" +
            s""""cpu_ms":[${d.map(x => ms(x._2)).mkString(",")}]}"""
        }.mkString("{", ",", "}")
        writeArtifact("bench_reps.json", repsJson)
        val sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(repsJson.getBytes("UTF-8"))
          .take(8).map("%02x".format(_)).mkString
        s""","rep_spread_max":${r2(spreadMax)},"rep_spread_q":"$spreadQ"""" +
          s""","reps_detail":"bench_plans/bench_reps.json","reps_sha256":"$sha""""
      }
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    def lineAt(fmt: Double => String, extras: Boolean,
               pin: String = ""): String = {
      val qs = ran.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      // `failed` is a load-bearing signal only when non-empty and is shed
      // from the degraded tiers otherwise; `reps` is ~9 chars and makes the
      // median-of-N claim verifiable from the artifact alone, so it rides
      // EVERY tier (r6 verdict #8: the degraded line had dropped it).
      val failedPart = if (extras || failed.nonEmpty) s""","failed":$failedJson""" else ""
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs$failedPart$pin,"reps":$reps,"sf":"$sfDir"}"""
    }
    // The driver parses the tail of stdout; an oversized line can start
    // mid-window and parse as nothing. Degrade stepwise — ms precision,
    // then centiseconds minus the optional keys, then deciseconds — and
    // only as a last resort drop the per-query map. The printed line is
    // always complete JSON within the ~1880-char budget (2000-char tail
    // minus the sbt success footer).
    // Full-precision timings always land in a file (like the plan
    // digests), so the stdout line's degradation never loses data.
    if (only.isEmpty) {
      // Failed queries appear explicitly as null — same key set as the
      // queries that were attempted, so timings.json and digests.json can
      // be joined without guessing which absences mean "failed".
      writeArtifact("timings.json",
        results.map { case (k, v) => s"\"$k\":${v.map(r3).getOrElse("null")}" }
          .mkString("{", ",", "}"))
    }
    // The driver's artifact can only carry a FIXED 2000-char stdout tail
    // (measured across BENCH_r01..r09: len(tail) == 2000 every round), so
    // with a 260+-gate suite the full per-query map can physically never
    // ride the printed line. The COMPLETE, un-degraded JSON line is the
    // canonical round artifact, persisted (and committed) here: same shape
    // the driver would have parsed, full 3dp map, all keys, `failed`
    // inline. EVERY printed tier that fits carries `n_queries` plus the
    // sha256 of this file (the r10 advice: the pin previously rode only
    // the fallback tier), so the driver's round record is verifiably
    // pinned to the exact committed full map. The sha is computed over
    // the pin-free full line — it cannot contain itself. Subset runs
    // never write bench_full.json, so they carry no pointer or sha at
    // all rather than a dangling one.
    val fullLine = lineAt(r3, extras = true)
    val pin =
      (if (only.isEmpty) {
        writeArtifact("bench_full.json", fullLine)
        val sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(fullLine.getBytes("UTF-8"))
          .take(8).map("%02x".format(_)).mkString
        s""","n_queries":${ran.size},"queries_full":"bench_plans/bench_full.json","full_sha256":"$sha""""
      } else s""","n_queries":${ran.size},"subset_run":true""") + repsPin
    val candidates = Seq(
      lineAt(r3, extras = true, pin), lineAt(r2, extras = false, pin),
      lineAt(r1, extras = false, pin))
    val line = candidates.find(_.length <= 1880).getOrElse {
      // Even 1dp over the full suite outgrew the window: keep the SLOWEST
      // queries (the ones perf grading cares about) up to the budget and
      // say how many sub-threshold ones were omitted — their 3dp medians
      // are in bench_plans/timings.json either way. The slowest tier also
      // carries inline per-rep wall arrays ("reps_ms") for the most
      // expensive queries, so a contended-run spike is adjudicable from
      // the round record alone (full arrays: bench_plans/bench_reps.json).
      val byCost = ran.toSeq.sortBy(-_._2)
      val repsInline = byCost.take(10).map { case (k, _) =>
        s"\"$k\":[${repDetail.getOrElse(k, Seq.empty).map(x => ms(x._1)).mkString(",")}]"
      }.mkString("{", ",", "}")
      val keep = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      var len = 300 + pin.length + repsInline.length // fixed keys + slack
      byCost.foreach { case (k, v) =>
        val entryLen = k.length + 9
        if (len + entryLen <= 1800) { keep += ((k, v)); len += entryLen }
      }
      val qs = keep.map { case (k, v) => s"\"" + k + "\":" + r2(v) }
        .mkString("{", ",", "}")
      System.err.println(s"[bench] full map cannot fit the tail window even at 1dp (${candidates.last.length} chars) — emitting the slowest ${keep.size}/${ran.size}; full 3dp map in bench_plans/bench_full.json")
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"queries_omitted":${ran.size - keep.size},"reps_ms":$repsInline$pin,"failed":$failedJson,"reps":$reps,"sf":"$sfDir"}"""
    }
    if (line != candidates.head)
      System.err.println(s"[bench] full line is ${candidates.head.length} chars; emitted a ${line.length}-char degraded form instead")
    // The JSON must be the LAST thing any logger writes (r13 verdict #6):
    // the driver parses a fixed-size output tail, and teardown log noise
    // after the line can push it out of the window. Logs off, flush, then
    // stop — every diagnostic above already printed before this point.
    spark.sparkContext.setLogLevel("OFF")
    System.err.flush()
    println(line)
    System.out.flush()
    spark.stop()
  }
}
