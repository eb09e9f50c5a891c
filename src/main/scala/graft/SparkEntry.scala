package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions, Wordpiece}
import graft.operators._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ the mandated LLM-data-pipeline extensions), each with
  * DuckDB-runnable `oracleSql` where ANSI-SQL-expressible. Column names are
  * aligned between the Spark result and the oracle (the driver sorts columns
  * by name before hashing).
  *
  * Cross-engine parity rules used throughout:
  *  - money/quantity aggregates: exact DECIMAL(18,2) arithmetic, summed
  *    exactly, cast to double only at output;
  *  - float-vector math: cast to double, identical expression shape
  *    (dot / (sqrt(norm_a) * sqrt(norm_b))), left-to-right summation, and
  *    round(..., 6) at output;
  *  - no raw timestamp outputs (engines disagree on sub-second rendering).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Parallelism spreader for gates whose PER-ROW compute dominates (guide
    * §2.5 "input skew — one unsplittable file"): every sf test table is a
    * single-row-group parquet file, so its scan is exactly ONE task and a
    * compute-heavy narrow pipeline serializes on 1 of N cores (measured
    * r16: `archive_expand` spent 16.1 s in one task on a 32-core session).
    * One round-robin exchange of the few input MBs buys N-way parallelism
    * for the downstream codec/HOF/cross-join work. Scale-adaptive by
    * construction ([[Partitioning.ensureParallelism]] targets
    * defaultParallelism and is a NO-OP once the scan already splits — at
    * 100 TB real inputs split at row-group boundaries and this never
    * fires). Applied ONLY to gates where a profiled serial stage
    * dominated; per-row outputs are partitioning-independent, and the
    * touched gates' aggregates keep the repo's exact-arithmetic
    * discipline, so results are unchanged (oracle-verified).
    */
  private def spread(df: DataFrame): DataFrame =
    Partitioning.ensureParallelism(df)

  /** CROSS-SESSION stored-artifact registry for trained IVF-PQ indexes
    * (r13 verdict #1 train-once / audit-many; r14 verdict #3 across
    * sessions): the FIRST gate that needs a (corpus variant, PQ budget)
    * family trains it and SAVES it via [[Similarity.saveIvfPqIndex]];
    * every later gate — in THIS session or any later one on the same box
    * — LOADS the stored artifact: the audits certify the artifact a
    * serving tier would read, and a second session (second JVM) skips
    * coarse-k-means + codebook training entirely. The registry root is
    * stable across JVMs (`GRAFT_IVFPQ_REGISTRY` env override for tests /
    * relocation; versioned dir name so a trainer change orphans old
    * artifacts instead of loading them), and each artifact is
    * content-addressed by [[Similarity.corpusFingerprint]] — fingerprint
    * keying is the staleness rule (see [[Similarity.registryPath]]): a
    * drifted corpus (what the `ivf_incremental` gate's [[Similarity
    * .ivfAssign]] histogram report detects batch-wise) moves the key and
    * can never load the stale index. Within a JVM, coarse centroids and
    * fingerprints are memoized: a second BUDGET over the same corpus
    * re-assigns cells in one narrow pass instead of re-running the coarse
    * k-means (cell structure is PQ-budget-independent, the
    * compressionTradeoff sharedCoarse argument), and the fingerprint agg
    * runs once per (variant, corpus dir).
    */
  private lazy val ivfPqArtifactRoot: String = {
    // Trust boundary: the registry is as trustworthy as this directory's
    // permissions — a production deployment points GRAFT_IVFPQ_REGISTRY
    // at an access-controlled store (the loaders deliberately never
    // revalidate an artifact against the corpus; that is the whole
    // train-once economics). The tmpdir default is for the single-user
    // bench/verify box, so it is created owner-only and REFUSED if some
    // other user owns it (a world-writable shared tmpdir is exactly
    // where a pre-planted artifact could otherwise be certified).
    // Trainer-recipe identity lives in Similarity.registryPath's version
    // segment (TrainerRecipeVersion), not in this directory name.
    val explicit = sys.env.get("GRAFT_IVFPQ_REGISTRY")
    val root = explicit.getOrElse(
      sys.props("java.io.tmpdir") + "/graft-ivfpq-registry-v1")
    val p = java.nio.file.Paths.get(root)
    try {
      val attrs = java.nio.file.attribute.PosixFilePermissions
        .asFileAttribute(java.nio.file.attribute.PosixFilePermissions
          .fromString("rwx------"))
      java.nio.file.Files.createDirectories(p, attrs)
    } catch { // non-POSIX filesystem: plain create, ownership still checked
      case _: UnsupportedOperationException =>
        java.nio.file.Files.createDirectories(p)
    }
    if (explicit.isEmpty) {
      // Ownership probe is best-effort: a filesystem without owner
      // attributes can't be checked (and can't be pre-planted by another
      // local user the same way either) — don't brick the registry on it.
      val owner = scala.util.Try(java.nio.file.Files.getOwner(p).getName)
      owner.foreach { o =>
        val me = sys.props("user.name")
        require(o == me,
          s"graft.SparkEntry: default registry root $root is owned by " +
            s"'$o', not '$me' — refusing to trust it; point " +
            "GRAFT_IVFPQ_REGISTRY at a directory you control")
      }
    }
    root
  }

  /** Publish a freshly-trained artifact staged at `staging` to its final
    * registry `path` with one atomic directory rename, so a concurrent
    * session can never observe (or co-write) a half-written artifact: the
    * loser of the rename race discards its staging copy and reads the
    * winner's — both trained the same content-addressed inputs. A move
    * failure is only treated as a lost race when the destination
    * actually exists; any other cause (permissions, a filesystem that
    * rejects ATOMIC_MOVE on directories) rethrows with the staging copy
    * intact, instead of deleting the fresh artifact and leaving the
    * loader to fail with a misleading path-not-found.
    */
  private def commitStaged(staging: String, path: String): Unit = {
    val src = java.nio.file.Paths.get(staging)
    val dst = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(dst.getParent)
    try
      java.nio.file.Files.move(src, dst,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: java.nio.file.FileSystemException =>
        if (java.nio.file.Files.exists(dst)) // lost the race: clean up
          org.apache.spark.network.util.JavaUtils.deleteRecursively(src.toFile)
        else throw e // a real failure, not a race — keep staging, surface it
    }
  }
  private val ivfPqCoarse =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]
  private val ivfPqFingerprint =
    new java.util.concurrent.ConcurrentHashMap[String, String]
  private val ivfPqLock = new Object

  private def ivfPqArtifact(s: SparkSession, dir: String, variant: String,
                            corpus: => DataFrame, m: Int, kCodes: Int)
      : (DataFrame, Array[Array[Double]], Pq.Codebooks) =
    ivfPqLock.synchronized {
      val coarseKey = s"$variant|$dir"
      val fp = ivfPqFingerprint.computeIfAbsent(coarseKey,
        _ => Similarity.corpusFingerprint(corpus, "embedding", "vec_id"))
      val name = s"$variant-${new java.io.File(dir).getName}"
      val path = Similarity.registryPath(ivfPqArtifactRoot, name, m, kCodes, fp)
      if (!Similarity.ivfPqIndexExists(s, path)) {
        val c = corpus
        val coarse = Option(ivfPqCoarse.get(coarseKey))
          .map(cents => (Similarity.ivfAssign(c, cents), cents))
        val (enc, cents, cb) = Similarity.ivfPqIndex(c, "embedding",
          "vec_id", nCells = 8, m = m, kCodes = kCodes, pqIterations = 2,
          coarse = coarse)
        ivfPqCoarse.putIfAbsent(coarseKey, cents)
        val staging = s"$path.staging-${java.util.UUID.randomUUID().toString.take(8)}"
        Similarity.saveIvfPqIndex(staging, enc, cents, cb)
        commitStaged(staging, path)
      }
      val loaded = Similarity.loadIvfPqIndex(s, path)
      // A later budget over the same corpus reuses the stored artifact's
      // coarse cells even when the TRAINING session is long gone.
      ivfPqCoarse.putIfAbsent(coarseKey, loaded._2)
      loaded
    }

  /** Registry entry for the LEARNED OPQ rotation over a corpus variant
    * (same lifecycle as [[ivfPqArtifact]]): the alternation
    * ([[Similarity.opqRefinedRotation]] — `iterations + 1` distributed PQ
    * trainings plus driver-side d x d SVDs) runs once per corpus version;
    * every later session loads the stored matrix (doubles round-trip
    * parquet exactly, so the rotated corpus, its fingerprint, and its
    * stored index are all stable across sessions).
    */
  private def opqRotationArtifact(s: SparkSession, dir: String,
                                  variant: String, corpus: => DataFrame,
                                  m: Int, kCodes: Int)
      : Array[Array[Double]] =
    ivfPqLock.synchronized {
      val fp = ivfPqFingerprint.computeIfAbsent(s"$variant|$dir",
        _ => Similarity.corpusFingerprint(corpus, "embedding", "vec_id"))
      // OPQ-NP configuration (measured sweep, SCALE.md r15): init = the
      // seed-1234 random rotation (the arm it must beat), 8 alternations,
      // pqIterations = 2 — recall@5 0.26 (PCA init, 3 it) -> 0.40,
      // distortion 0.0451 -> 0.0220 on the sf0.01 spectrum fixture. The
      // name carries the FULL recipe (iterations, init seed, pq
      // iterations, dim) so changing any training knob can never load a
      // rotation trained under the old one.
      val iterations = 8
      val initSeed = 1234L
      val pqIterations = 2
      val dim = 64
      val name = s"opqrot-np$iterations-r$initSeed-pq$pqIterations-d$dim-" +
        s"$variant-${new java.io.File(dir).getName}"
      val path = Similarity.registryPath(ivfPqArtifactRoot, name, m, kCodes, fp)
      if (!Similarity.rotationExists(s, path)) {
        val (rot, _) = Similarity.opqRefinedRotation(corpus, m = m, dim = dim,
          kCodes = kCodes, iterations = iterations, pqIterations = pqIterations,
          init = Some(graft.functions.VectorFunctions.rotationMatrix(dim, initSeed)))
        val staging = s"$path.staging-${java.util.UUID.randomUUID().toString.take(8)}"
        Similarity.saveRotation(s, staging, rot)
        commitStaged(staging, path)
      }
      val loaded = Similarity.loadRotation(s, path)
      // Stash the loaded matrix so oracleSql can inline it as literal
      // CTEs (Verify dumps oracle_sql.json AFTER all queries ran, so the
      // dump always sees the rotation the gate actually used).
      lastOpqRotation.set(loaded)
      loaded
    }

  /** The most recently loaded OPQ rotation artifact — the deterministic
    * stored d x d matrix [[opqRefinedOracle]] inlines into the
    * `pq_opq_refined` oracle. Only the Procrustes SVD TRAINING is
    * driver-side math no SQL engine replays; its output is a stored,
    * content-addressed artifact and therefore an oracle INPUT.
    */
  private val lastOpqRotation =
    new java.util.concurrent.atomic.AtomicReference[Array[Array[Double]]]()

  /** Cosine in double with the exact arithmetic mirrored in the oracle SQL
    * (dot/(sqrt*sqrt), left-to-right accumulation) — the native codegen'd
    * Catalyst expression, bit-identical to the UDF/HOF forms but with no
    * per-row boxing and no codegen fence.
    */
  private def cos(a: Column, b: Column): Column =
    graft.plans.CosineSimilarityExpr.cosine(a, b)

  private val dec = "decimal(18,2)"

  /** Clean text whose [[graft.functions.Mojibake.corrupt]] rendering seeds
    * the mojibake_repair gate — accents, the nbsp pair (a-grave before a
    * space), dashes, the 0x9d-hole right quote, and the 3-char euro.
    */
  private val MojibakeCleanSuffix =
    " caf\u00e9 \u2014 d\u00e9j\u00e0 vu\u2026 25\u00b0 \u201cok\u201d \u20ac5"

  /** Deterministic raw crawl-URL plant shared by the `url_dedup` /
    * `domain_profile` gates: everything CANONICAL varies only with
    * `base = doc_id % 100` (50 sites x 4 public suffixes x path), while
    * case, the https default port, trailing slash, tracking params, and
    * fragments vary with the full doc_id — 5 raw variants per canonical
    * URL. SQL replay in [[plantedCrawlUrlSql]].
    */
  private def plantedCrawlUrl: Column = {
    val base = col("doc_id") % 100
    concat(
      when(col("doc_id") % 2 === 0, lit("HTTPS://WWW.Site"))
        .otherwise(lit("https://www.site")),
      (base % 10).cast("string"),
      lit(".example."),
      element_at(array(lit("com"), lit("co.uk"), lit("org"), lit("com.au")),
        (base % 4 + 1).cast("int")),
      when(col("doc_id") % 3 === 0, lit(":443")).otherwise(lit("")),
      lit("/path/"), base.cast("string"),
      when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
      when(col("doc_id") % 5 < 2,
          concat(lit("?utm_source=s"), lit("&id="), base.cast("string")))
        .otherwise(concat(lit("?id="), base.cast("string"))),
      when(col("doc_id") % 7 === 0, lit("#top")).otherwise(lit("")))
  }

  private val plantedCrawlUrlSql: String =
    """CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.Site' ELSE 'https://www.site' END ||
      | CAST(doc_id % 100 % 10 AS VARCHAR) || '.example.' ||
      | (['com', 'co.uk', 'org', 'com.au'])[CAST(doc_id % 100 % 4 + 1 AS INT)] ||
      | CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END ||
      | '/path/' || CAST(doc_id % 100 AS VARCHAR) ||
      | CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
      | CASE WHEN doc_id % 5 < 2 THEN '?utm_source=s&id=' || CAST(doc_id % 100 AS VARCHAR)
      |      ELSE '?id=' || CAST(doc_id % 100 AS VARCHAR) END ||
      | CASE WHEN doc_id % 7 = 0 THEN '#top' ELSE '' END""".stripMargin

  /** The UrlFunctions.canonicalizeUrl rule chain as DuckDB CTEs — expects a
    * `raw(doc_id, url)` CTE in scope, leaves `c5(doc_id, u)` (canonical).
    */
  private val urlCanonChainSql: String = {
    val track = "(?:utm_[A-Za-z0-9_]*|gclid|fbclid)"
    s"""c1 AS (SELECT doc_id, regexp_replace(url, '#.*', '') AS u FROM raw),
       |c2 AS (SELECT doc_id,
       |  lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*')) ||
       |  substr(u, len(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*')) + 1) AS u
       | FROM c1),
       |c3 AS (SELECT doc_id, regexp_replace(regexp_replace(u,
       |  '^(http://[^/:?#]+):80([/?#].*)?$$', '\\1\\2'),
       |  '^(https://[^/:?#]+):443([/?#].*)?$$', '\\1\\2') AS u FROM c2),
       |c4 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(u,
       |  '&$track=[^&]*', '', 'g'),
       |  '\\?$track=[^&]*&', '?'),
       |  '\\?$track=[^&]*$$', '') AS u FROM c3),
       |c5 AS (SELECT doc_id, regexp_replace(regexp_replace(u,
       |  '^([^?]*)/\\?', '\\1?'), '/$$', '') AS u FROM c4)""".stripMargin
  }

  /** Flagship: the reference's write path end-to-end on sf0.001 — scan ->
    * non-blank filter -> adaptive chunk -> embed -> sink projection
    * (`yamlpipe/core/pipeline.py:51-98` as one lazy Spark lineage).
    */
  def entry(spark: SparkSession): DataFrame = {
    val docs = t(spark, "/root/testdata/sf0.001", "documents")
      .filter(TextFunctions.nonBlank(col("text")))
    val chunked = Chunkers.adaptive(docs, "text", chunkSize = 150, chunkOverlap = 30)
    val embedded = Embed.hashing(chunked, "chunk", dim = 64)
    embedded.select(
      col("chunk").as("text"),
      col("embedding").as("vector"),
      col("source"),
      col("doc_id"),
      col("chunk_index"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -----------------------------------------------------------------------
    // Relational kernel (hosts of the reference's set-oriented operators)
    // -----------------------------------------------------------------------
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount").cast(dec)))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    "q3_top_revenue" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount").cast(dec)))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    "q5_nation_revenue" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val sup = broadcast(t(s, dir, "supplier"))
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount").cast(dec)))
          .cast("double").as("revenue"))
    }),

    "q6_filtered_revenue" -> ((s, dir) => {
      // Pushdown showcase: every predicate reaches the parquet scan
      // (PushedFilters on l_shipdate/l_discount/l_quantity) and only the
      // four referenced columns are read — at 100 TB this is the difference
      // between scanning a year and scanning the whole table.
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
          col("l_discount").between(0.02, 0.06) && col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast(dec) * col("l_discount").cast(dec))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    "q4_order_priority" -> ((s, dir) => {
      // Left-semi join (EXISTS): orders in a quarter with at least one
      // lineitem shipped after the order date. The semi join dedups on the
      // build side and never materializes matched lineitems.
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-04-01")
      val l = t(s, dir, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    "window_top_lineitems" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("rn"))
    }),

    // -----------------------------------------------------------------------
    // Sources / state (SURVEY §2.1, §2.5)
    // -----------------------------------------------------------------------
    "source_scan" -> ((s, dir) => {
      // S1: scan + empty-skip + fingerprint (sources.py:78-96 semantics)
      t(s, dir, "documents")
        .filter(TextFunctions.nonBlank(col("text")))
        .select(col("doc_id"), col("source"), col("text"),
          sha2(col("text"), 256).as("fingerprint"))
    }),

    "legacy_office_roundtrip" -> ((s, dir) => {
      // Round-trip corpus text through REAL legacy-Office binaries
      // IN-PLAN (LegacyOfficeFixtures scaladoc; the jsonl_parse
      // identity-reconstruction discipline): build a two-piece Word 97
      // .doc (mixed cp1252/UTF-16 pieces), a PPT 97 record tree, and a
      // BIFF8 .xls around each document's text, then extract back through
      // the real FIB->PlcPcd, record-tree, and SST walks. The oracle is
      // the identity, so the gate only hash-matches if writer AND parser
      // are faithful for every character. Payload pre-normalizes the
      // chars the extractors canonicalize (CR, cell mark, VT -> \n) and
      // brackets the text so trim is a no-op. The length guard (10k code
      // points, mirrored in the oracle WHERE) keeps every row safely under
      // the fixture writers' require() caps (BIFF8 single-record SST,
      // single-FAT-sector CFB): an oversized future testdata doc drops
      // from the gate instead of aborting the whole job.
      val payload = concat(lit("["),
        translate(col("text"), "\r\u0007\u000B", "\n\n\n"), lit("]"))
      def roundtrip(ext: String, build: String => Array[Byte]) =
        udf((p: String) => graft.functions.DocumentExtract.extract(ext, s"rt.$ext", build(p)))
      val viaDoc = roundtrip("doc", graft.functions.LegacyOfficeFixtures.word97Doc)
      val viaPpt = roundtrip("ppt", graft.functions.LegacyOfficeFixtures.ppt97)
      val viaXls = roundtrip("xls", graft.functions.LegacyOfficeFixtures.biff8Xls)
      t(s, dir, "documents")
        .filter(col("text").isNotNull && length(col("text")) <= 10000)
        .select(col("doc_id"), viaDoc(payload).as("doc_text"),
          viaPpt(payload).as("ppt_text"), viaXls(payload).as("xls_text"))
    }),

    "word95_roundtrip" -> ((s, dir) => {
      // Pre-97 Word (6.0/95) round trip IN-PLAN (word6Text scaladoc): the
      // non-complex contiguous cp1252 text run, the class r14 listed as
      // scrape-only. Word 95 is a single-byte format, so the gate filters
      // to ASCII-printable documents (plus tab/newline/CR) — a row either
      // passes the class check in BOTH engines or drops in both, which is
      // mismatch-proof (unlike a per-char projection, where Java and RE2
      // disagree on astral-char replacement counts). Same payload
      // normalization and length guard as legacy_office_roundtrip (only
      // CR needs mapping here: the ASCII row filter already excludes the
      // BEL/VT cell-mark class).
      val payload = concat(lit("["),
        translate(col("text"), "\r", "\n"), lit("]"))
      val via = udf((p: String) => graft.functions.DocumentExtract.extract(
        "doc", "rt95.doc", graft.functions.LegacyOfficeFixtures.word95Doc(p)))
      t(s, dir, "documents")
        .filter(col("text").isNotNull && length(col("text")) <= 10000 &&
          !col("text").rlike("[^\\x20-\\x7E\\n\\t\\r]"))
        .select(col("doc_id"), via(payload).as("w95_text"))
    }),

    "biff5_roundtrip" -> ((s, dir) => {
      // Pre-97 Excel (BIFF5) round trip IN-PLAN (biff5Xls scaladoc): each
      // document's text becomes one inline-string LABEL cell per LINE in
      // a real "Book"-stream workbook — the pre-97 layout with no SST —
      // and extracts back through the biff5Text record walk. The reader
      // normalizes per CELL (trim, drop empties, join with newline), so
      // the oracle replays exactly that line algebra in SQL rather than a
      // raw identity. Row filters (mirrored verbatim in the oracle) keep
      // the gate on BIFF5's native class: ASCII-printable (cp1252 is a
      // single-byte format — same mismatch-proof stance as
      // word95_roundtrip), every line within the 255-char LABEL cap, and
      // at least one non-whitespace char (an all-blank workbook falls
      // back to the scrape BY DESIGN and would diverge).
      val via = udf((p: String) => graft.functions.DocumentExtract.extract(
        "xls", "rt5.xls",
        graft.functions.LegacyOfficeFixtures.biff5Xls(p.split("\n", -1).toSeq)))
      t(s, dir, "documents")
        .filter(col("text").isNotNull && length(col("text")) <= 10000 &&
          !col("text").rlike("[^\\x20-\\x7E\\n\\t\\r]") &&
          !col("text").rlike("[^\\n]{254}") &&
          col("text").rlike("[^ \\t\\n\\r]"))
        .select(col("doc_id"),
          via(translate(col("text"), "\r", "\n")).as("xls5_text"))
    }),

    "pdf_cmap_roundtrip" -> ((s, dir) => {
      // Subset-font PDF round trip IN-PLAN (LegacyOfficeFixtures.subsetPdf
      // scaladoc): each document's text becomes a Type0 font with a
      // GENERATED ToUnicode CMap and a 2-byte-code content stream; the raw
      // byte fallback would yield garbage, so the identity oracle passes
      // ONLY through the CMap interpreter (pdfFontCmaps/parseCmap). The
      // second column re-packs the SAME document the way a modern
      // (PDF >= 1.5) generator writes it (subsetPdfObjStm scaladoc): font
      // + page dicts inside a compressed /Type /ObjStm, xref as a /XRef
      // stream, the CMap behind an [/ASCII85Decode /FlateDecode] chain and
      // the content behind /LZWDecode — so the identity also pins ObjStm
      // splicing and all three stream filters. The bracket keeps the
      // extractor's trim a no-op; the pdf path performs no other
      // normalization, so the oracle is the verbatim text. Length guard:
      // see legacy_office_roundtrip.
      // r16 third column: the SAME document in the pdfTeX-class predictor
      // layout (subsetPdfObjStmPredictor scaladoc) — PNG-Up-predicted
      // ObjStm (/DecodeParms /Predictor 12), /RunLengthDecode content,
      // array-form DecodeParms with null holes on the CMap chain — so the
      // identity also pins predictor undo, the RunLength decoder, and
      // parms/filter index alignment.
      val payload = concat(lit("["), col("text"), lit("]"))
      val via = udf((p: String) => graft.functions.DocumentExtract.extract("pdf", "rt.pdf",
        graft.functions.LegacyOfficeFixtures.subsetPdf(p)))
      val viaObjStm = udf((p: String) => graft.functions.DocumentExtract.extract("pdf",
        "rt15.pdf", graft.functions.LegacyOfficeFixtures.subsetPdfObjStm(p)))
      val viaPredictor = udf((p: String) => graft.functions.DocumentExtract.extract("pdf",
        "rt15p.pdf", graft.functions.LegacyOfficeFixtures.subsetPdfObjStmPredictor(p)))
      t(s, dir, "documents")
        .filter(col("text").isNotNull && length(col("text")) <= 10000)
        .select(col("doc_id"), via(payload).as("pdf_text"),
          viaObjStm(payload).as("pdf_objstm_text"),
          viaPredictor(payload).as("pdf_predictor_text"))
    }),

    "format_sniff" -> ((s, dir) => {
      // Mislabeled-file robustness (DocumentExtract.sniff scaladoc):
      // every container is handed to extractAuto under the WRONG
      // extension — ODF text as .docx (zip `mimetype` sniff), subset PDF
      // as .docx (%PDF magic), Word 97 as .ppt and BIFF8 as .doc (OLE2
      // directory flavor), WebVTT as .srt (text signature) — and must
      // still extract the payload because content wins over the label.
      // Payload pre-normalization + length guard as
      // legacy_office_roundtrip.
      val payload = concat(lit("["),
        translate(col("text"), "\r\u0007\u000B", "\n\n\n"), lit("]"))
      def mislabeled(declared: String, build: String => Array[Byte]) =
        udf((p: String) => graft.functions.DocumentExtract.extractAuto(
          declared, s"wrong.$declared", build(p)))
      val odtAsDocx = mislabeled("docx", p => graft.functions.OdfFixtures.odt(p))
      val pdfAsDocx = mislabeled("docx", graft.functions.LegacyOfficeFixtures.subsetPdf)
      val docAsPpt = mislabeled("ppt", graft.functions.LegacyOfficeFixtures.word97Doc)
      val xlsAsDoc = mislabeled("doc", graft.functions.LegacyOfficeFixtures.biff8Xls)
      val vttAsSrt = mislabeled("srt", p => graft.functions.TextualFixtures
        .vtt(p.split("\n", -1).toSeq).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      t(s, dir, "documents")
        .filter(col("text").isNotNull && length(col("text")) <= 10000)
        .select(col("doc_id"),
          odtAsDocx(payload).as("odt_as_docx"),
          pdfAsDocx(payload).as("pdf_as_docx"),
          docAsPpt(payload).as("doc_as_ppt"),
          xlsAsDoc(payload).as("xls_as_doc"),
          vttAsSrt(payload).as("vtt_as_srt"))
    }),

    "odf_roundtrip" -> ((s, dir) => {
      // OpenDocument round trip IN-PLAN (OdfFixtures scaladoc): each
      // document's text becomes a real odt, a one-cell ods, and a
      // one-page odp — entity-escaped, tab/newline as <text:tab/> /
      // <text:line-break/> — then extracts back through the shared
      // text:p walk (plus the ods table/row/cell and odp draw:page
      // framings). The identity oracle passes only if escaping, element
      // decode, and the structural walks are faithful for every
      // character. Brackets keep the per-paragraph trim a no-op; CR
      // passes through XML content verbatim so no pre-normalization is
      // needed. Length guard: see legacy_office_roundtrip.
      val payload = concat(lit("["), col("text"), lit("]"))
      val viaOdt = udf((p: String) => graft.functions.DocumentExtract.extract(
        "odt", "rt.odt", graft.functions.OdfFixtures.odt(p)))
      val viaOds = udf((p: String) => graft.functions.DocumentExtract.extract(
        "ods", "rt.ods", graft.functions.OdfFixtures.ods(Seq(Seq(p)))))
      val viaOdp = udf((p: String) => graft.functions.DocumentExtract.extract(
        "odp", "rt.odp", graft.functions.OdfFixtures.odp(Seq(Seq(p)))))
      t(s, dir, "documents")
        .filter(col("text").isNotNull && length(col("text")) <= 10000)
        .select(col("doc_id"), viaOdt(payload).as("odt_text"),
          viaOds(payload).as("ods_text"), viaOdp(payload).as("odp_text"))
    }),

    "archive_expand" -> ((s, dir) => {
      // S1 archive-of-documents ingestion round trip IN-PLAN
      // (ArchiveExpand scaladoc): each document's text packs into a
      // tar.ZST (the modern crawl-dump codec) with four leaves — a plain
      // entry, a long-path entry forcing the ustar prefix split (the
      // 128-byte path below), a NESTED zip member, and a nested
      // single-member .bz2 — then expands back through the real
      // ustar/zstd/zip/bzip2 walkers with `outer!inner` naming. The
      // identity oracle passes only if header checksums, octal sizes,
      // prefix join, multi-codec inflation, and nested recursion are all
      // faithful; entry NAMES are pinned as literals on both sides.
      // Length guard: see legacy_office_roundtrip.
      val longPath = "corpus/" + ("d" * 110) + "/part2.txt"
      val via = udf((p: String) => {
        val payload = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val arc = graft.sources.ArchiveFixtures.zstd(graft.sources.ArchiveFixtures.tar(Seq(
          "part1.txt" -> payload,
          longPath -> payload,
          "inner.zip" -> graft.sources.ArchiveFixtures.zip(Seq("part3.txt" -> payload)),
          "part4.txt.bz2" -> graft.sources.ArchiveFixtures.bzip2(payload),
          // r16: the Hadoop-ecosystem framed block codecs ride the same walk
          "part5.txt.lz4" -> graft.sources.ArchiveFixtures.lz4(payload),
          "part6.txt.sz" -> graft.sources.ArchiveFixtures.snappy(payload))))
        graft.sources.ArchiveExpand.expand("docs.tar.zst", arc).map {
          case (n, b) => (n, new String(b, java.nio.charset.StandardCharsets.UTF_8))
        }
      })
      spread(t(s, dir, "documents")
          .filter(col("text").isNotNull && length(col("text")) <= 10000))
        .select(col("doc_id"),
          explode(via(concat(lit("["), col("text"), lit("]")))).as("e"))
        .select(col("doc_id"), col("e._1").as("entry"), col("e._2").as("entry_text"))
    }),

    "mbox_parse" -> ((s, dir) => {
      // S1 mbox mail-archive round trip IN-PLAN (DocumentExtract.mbox
      // scaladoc): each document becomes a TWO-message mboxrd file —
      // message 1 plain UTF-8, message 2 the same text quoted-printable
      // encoded (ArchiveFixtures.qpEncode) — then extracts back through
      // the envelope splitter + mboxrd unquoting + the full eml MIME
      // stack. The oracle replays subject/body framing verbatim, so the
      // gate only hash-matches if From-line escaping and the QP decode
      // are the identity for every character. CR pre-normalizes to LF
      // (eml canonicalizes CRLF; same discipline as
      // legacy_office_roundtrip); length guard likewise.
      val via = udf((id: String, p: String) => {
        val m1 = s"Subject: s1-$id\nContent-Type: text/plain; charset=utf-8\n\n$p"
        val m2 = s"Subject: s2-$id\nContent-Type: text/plain; charset=utf-8\n" +
          "Content-Transfer-Encoding: quoted-printable\n\n" +
          graft.sources.ArchiveFixtures.qpEncode(p)
        graft.functions.DocumentExtract.extract("mbox", "rt.mbox",
          graft.sources.ArchiveFixtures.mboxrd(Seq(m1, m2))
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      })
      t(s, dir, "documents")
        .filter(col("text").isNotNull && length(col("text")) <= 10000)
        .select(col("doc_id"),
          via(col("doc_id").cast("string"),
            concat(lit("["), translate(col("text"), "\r", "\n"), lit("]")))
            .as("mbox_text"))
    }),

    "notebook_roundtrip" -> ((s, dir) => {
      // Jupyter nbformat round trip IN-PLAN (TextualFormats.ipynb
      // scaladoc): each document's text becomes a REAL nbformat-4 notebook
      // (markdown source in the spec's list-of-newline-terminated-lines
      // shape, a code cell with stream + execute_result outputs, a raw
      // tail) and its nbformat-3 twin (worksheets, `input`, inline pyout
      // text, a heading cell), then extracts back through the Jackson
      // cell walk. The oracle replays the segment framing verbatim, so
      // the gate only matches if JSON escaping, the list-of-lines join,
      // and both version walks are faithful for every character. Length
      // guard: see legacy_office_roundtrip.
      val payload = concat(lit("["), col("text"), lit("]"))
      val via4 = udf((p: String) => graft.functions.DocumentExtract.extract(
        "ipynb", "rt4.ipynb", graft.functions.TextualFixtures.ipynb4(p)))
      val via3 = udf((p: String) => graft.functions.DocumentExtract.extract(
        "ipynb", "rt3.ipynb", graft.functions.TextualFixtures.ipynb3(p)))
      t(s, dir, "documents")
        .filter(col("text").isNotNull && length(col("text")) <= 10000)
        .select(col("doc_id"), via4(payload).as("nb4_text"),
          via3(payload).as("nb3_text"))
    }),

    "subtitle_roundtrip" -> ((s, dir) => {
      // Subtitle round trip IN-PLAN (TextualFormats.srt/vtt scaladoc):
      // each document's lines become CRLF SubRip and WebVTT files — a
      // constant markup-laden lead cue, then one cue per line (blank
      // lines as empty cues), VTT adding identifier lines, NOTE/STYLE
      // blocks, and cue settings — then extract back through the real
      // cue walks. Cue markup strips in ONE regex pass over the joined
      // text, the exact pass the oracle replays with regexp_replace(...,
      // 'g'), so payloads containing partial `<`/`>` runs stay
      // hash-faithful. CR pre-normalizes to LF (payload lines are the
      // cue structure; same discipline as mbox_parse); length guard: see
      // legacy_office_roundtrip.
      val payload = concat(lit("["), translate(col("text"), "\r", "\n"), lit("]"))
      val viaSrt = udf((p: String) => graft.functions.DocumentExtract.extract(
        "srt", "rt.srt", graft.functions.TextualFixtures.srt(p.split("\n", -1).toSeq)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      val viaVtt = udf((p: String) => graft.functions.DocumentExtract.extract(
        "vtt", "rt.vtt", graft.functions.TextualFixtures.vtt(p.split("\n", -1).toSeq)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      t(s, dir, "documents")
        .filter(col("text").isNotNull && length(col("text")) <= 10000)
        .select(col("doc_id"), viaSrt(payload).as("srt_text"),
          viaVtt(payload).as("vtt_text"))
    }),

    "latex_roundtrip" -> ((s, dir) => {
      // LaTeX round trip IN-PLAN (TextualFormats.tex scaladoc): each
      // document's text escapes through the full symbol map
      // (\textbackslash{} and friends) into a real article skeleton —
      // comment line, preamble, starred section, \item coda — then
      // extracts back through the detex-style walk. The identity oracle
      // passes only if comment stripping respects \%, the escape map
      // inverts exactly, braces/math drop while their content stays, and
      // body isolation finds \begin{document}. Length guard: see
      // legacy_office_roundtrip.
      val via = udf((p: String) => graft.functions.DocumentExtract.extract(
        "tex", "rt.tex", graft.functions.TextualFixtures.tex(p)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      t(s, dir, "documents")
        .filter(col("text").isNotNull && length(col("text")) <= 10000)
        .select(col("doc_id"),
          via(concat(lit("["), col("text"), lit("]"))).as("tex_text"))
    }),

    "jsonl_parse" -> ((s, dir) => {
      // JSONL corpus source: serialize each document row to a JSON line
      // with to_json, parse back through JsonlSource's line parser (the
      // load path minus file enumeration, which SourcesSpec covers with
      // real files). The oracle is the identity reconstruction, so Spark
      // must round-trip every character through real JSON to hash-match.
      val lines = t(s, dir, "documents").select(
        to_json(struct(col("text"), col("doc_id").cast("string").as("id"),
          col("lang"))).as("value"),
        lit("mem").as("__file"))
      graft.sources.JsonlSource
        .parseLines(lines, "text", Some("id"), Seq("lang"), strict = true)
        .select(col("source"), col("content"), col("fingerprint"),
          element_at(col("metadata"), "lang").as("meta_lang"))
    }),

    "chat_template" -> ((s, dir) => {
      // SFT prep (ChatTemplate scaladoc): build a 3-turn conversation from
      // each doc (fixed system prompt; user = first ceil(n/2) ws-tokens,
      // assistant = rest), serialize with to_json, then the operator must
      // parse the real JSON back and render the ChatML template. The oracle
      // computes the rendered string directly from the halves — the engine
      // only matches if the JSON round trip and template are faithful.
      val docs = t(s, dir, "documents")
      val parts = split(col("text"), " ", -1)
      val n = size(parts)
      val k = ((n + 1) / 2).cast("int")
      val userHalf = concat_ws(" ", slice(parts, lit(1), k))
      val asstHalf = concat_ws(" ", slice(parts, k + 1, n - k))
      val msgs = array(
        struct(lit("system").as("role"),
          lit("You are a helpful assistant.").as("content")),
        struct(lit("user").as("role"), userHalf.as("content")),
        struct(lit("assistant").as("role"), asstHalf.as("content")))
      val parsed = ChatTemplate.parseMessages(
        docs.select(col("doc_id"), to_json(msgs).as("raw")), "raw")
      ChatTemplate.render(parsed)
        .select(col("doc_id"), col("chat_text"), col("n_turns"), col("roles"))
    }),

    "chat_template_llama" -> ((s, dir) => {
      // The Llama-2 wire format over the SAME 3-turn conversation build
      // as chat_template (renderLlama2 scaladoc): the system turn folds
      // into the first [INST] inside <<SYS>> markers, the (user,
      // assistant) pair renders as one <s>…</s> block. The oracle
      // reconstructs the rendered string from the halves closed-form.
      val docs = t(s, dir, "documents")
      val parts = split(col("text"), " ", -1)
      val n = size(parts)
      val k = ((n + 1) / 2).cast("int")
      val userHalf = concat_ws(" ", slice(parts, lit(1), k))
      val asstHalf = concat_ws(" ", slice(parts, k + 1, n - k))
      val msgs = array(
        struct(lit("system").as("role"),
          lit("You are a helpful assistant.").as("content")),
        struct(lit("user").as("role"), userHalf.as("content")),
        struct(lit("assistant").as("role"), asstHalf.as("content")))
      val parsed = ChatTemplate.parseMessages(
        docs.select(col("doc_id"), to_json(msgs).as("raw")), "raw")
      ChatTemplate.renderLlama2(parsed)
        .select(col("doc_id"), col("chat_text"), col("n_pairs"), col("has_system"))
    }),

    "chat_loss_mask" -> ((s, dir) => {
      // SFT loss masking (ChatTemplate.assistantSpans scaladoc): the same
      // 3-turn conversation as chat_template, but the output is the
      // 1-based char span of the ASSISTANT content inside chat_text — the
      // region a supervised loss keeps. Oracle computes the span
      // arithmetic directly from the halves.
      // Null-text docs are filtered on BOTH sides (the warc_parse
      // posture): a null half would make the conversation malformed and
      // assistantSpans drops those by contract.
      val docs = t(s, dir, "documents").filter(col("text").isNotNull)
      val parts = split(col("text"), " ", -1)
      val n = size(parts)
      val k = ((n + 1) / 2).cast("int")
      val userHalf = concat_ws(" ", slice(parts, lit(1), k))
      val asstHalf = concat_ws(" ", slice(parts, k + 1, n - k))
      val msgs = array(
        struct(lit("system").as("role"),
          lit("You are a helpful assistant.").as("content")),
        struct(lit("user").as("role"), userHalf.as("content")),
        struct(lit("assistant").as("role"), asstHalf.as("content")))
      val parsed = ChatTemplate.parseMessages(
        docs.select(col("doc_id"), to_json(msgs).as("raw")), "raw")
      ChatTemplate.assistantSpans(parsed)
        .select(col("doc_id"), col("turn"), col("span_start"), col("span_len"))
    }),

    "csv_parse" -> ((s, dir) => {
      // CSV corpus source: serialize each document row to a CSV line with
      // to_csv (real quoting), parse back through CsvSource's positional
      // line parser — the load path minus file enumeration (SourcesSpec
      // covers real files, headers, malformed rows). Identity oracle.
      val lines = t(s, dir, "documents").select(
        to_csv(struct(col("text"), col("doc_id").cast("string").as("id"),
            col("lang")),
          Map("escape" -> "\"").asJava).as("value"),
        lit("mem").as("__file"))
      graft.sources.CsvSource
        .parseLines(lines, "text", Some("id"), Seq("lang"), ",", strict = true)
        .select(col("source"), col("content"), col("fingerprint"),
          element_at(col("metadata"), "lang").as("meta_lang"))
    }),

    "warc_parse" -> ((s, dir) => {
      // WARC source: serialize each document as a real ISO-28500 response
      // record (HTTP envelope, HTML body with a script block and an
      // entity, preceded by a request record the parser must SKIP), then
      // parse back through Warc.parseCaptures — the load path minus file
      // enumeration (WarcSpec covers gzip members, chunked bodies,
      // truncation). The oracle reconstructs the expected text directly,
      // so envelope skip, mime parse, tag strip, and entity decode must
      // all be character-faithful to hash-match. Content-Length is the
      // BYTE length (octet_length) — the parser consumes UTF-8 bytes, so
      // a char count would truncate any non-ASCII payload mid-body.
      import s.implicits._
      val id = col("doc_id").cast("string")
      val body = concat(
        lit("<html><head><script>var x = 1;</script></head><body><h1>Doc "),
        id, lit("</h1><p>"), col("text"),
        lit("</p><p>&amp; fin</p></body></html>"))
      val payload = concat(
        lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"),
        body)
      val req = "GET / HTTP/1.1\r\n\r\n"
      val record = concat(
        lit("WARC/1.0\r\nWARC-Type: request\r\nContent-Length: " +
          req.length + "\r\n\r\n" + req + "\r\n\r\n"),
        lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://example.org/doc/"),
        id,
        lit("\r\nWARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: "),
        octet_length(payload).cast("string"), lit("\r\n\r\n"), payload,
        lit("\r\n\r\n"))
      // A null text would null the whole concat and NPE in getBytes —
      // filter first (fixtures carry none; the guard is for robustness,
      // and the oracle applies the same predicate).
      t(s, dir, "documents").filter(col("text").isNotNull)
        .select(record.as("rec")).as[String]
        .flatMap(rec => graft.sources.Warc
          .parseCaptures(rec.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .map(c => (c.url, c.captureTime, c.mime, c.text)))
        .toDF("url", "capture_time", "mime", "content")
    }),

    "change_detection" -> ((s, dir) => {
      // T1: anti-join against a simulated state table. Docs with
      // doc_id%6==0 are unchanged (state fp matches), doc_id%6==3 changed
      // (state holds a stale fp), everything else is new.
      val docs = t(s, dir, "documents")
      val state = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("item_id"),
          when(col("doc_id") % 6 === 0, sha2(col("text"), 256))
            .otherwise(sha2(concat(col("text"), lit("stale")), 256)).as("st_fp"))
      docs.select(col("doc_id"), col("source"), sha2(col("text"), 256).as("fp"))
        .join(broadcast(state),
          col("doc_id") === col("item_id") && col("fp") === col("st_fp"), "left_anti")
        .select(col("doc_id"), col("source"))
    }),

    "corpus_diff" -> ((s, dir) => {
      // Snapshot diff: the 'old' corpus is missing doc_id%5==4 (-> added),
      // holds a stale fingerprint at %5==2 (-> changed), and carries a
      // retired id range (-> removed).
      val docs = t(s, dir, "documents")
      val newSnap = docs.select(col("doc_id"), sha2(col("text"), 256).as("fp"))
      val oldSnap = docs.filter(col("doc_id") % 5 =!= 4)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 2, sha2(concat(col("text"), lit("old")), 256))
            .otherwise(sha2(col("text"), 256)).as("fp"))
        .union(docs.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            sha2(col("text"), 256).as("fp")))
      StateStore.corpusDiff(oldSnap, newSnap, "doc_id", "fp")
    }),

    "scd2_history" -> ((s, dir) => {
      // Temporal twin of corpus_diff over the same planted snapshots: the
      // old snapshot bootstraps the SCD2 history at version 1, the new one
      // applies at version 2 — changed docs close+reopen, removed docs
      // close, added docs open, unchanged docs carry their interval.
      plantedScd2History(s, t(s, dir, "documents"))
    }),

    "scd2_lookup" -> ((s, dir) => {
      // Point-in-time-correct temporal lookup (StateStore.scd2Lookup
      // scaladoc) against the SAME planted history: every doc probed AS OF
      // versions 1 and 2 — changed docs answer with their old fp at v1,
      // v2-only docs null out at v1, removed docs null out at v2.
      val docs = t(s, dir, "documents")
      val probes = docs.select(col("doc_id"))
        .withColumn("v", explode(array(lit(1L), lit(2L))))
      StateStore.scd2Lookup(plantedScd2History(s, docs), probes,
          "doc_id", "v")
        .select(col("doc_id"), col("v"), col("fp"), col("valid_from"),
          col("valid_to"))
    }),

    "state_update" -> ((s, dir) => {
      // T2: fingerprint upsert — new fps win over old on id collision.
      val docs = t(s, dir, "documents")
      val old = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("item_id"),
          sha2(concat(col("text"), lit("old")), 256).as("fp_old"))
      val nw = docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("item_id"), sha2(col("text"), 256).as("fp_new"))
      old.join(nw, Seq("item_id"), "full_outer")
        .select(col("item_id"), coalesce(col("fp_new"), col("fp_old")).as("fingerprint"))
    }),

    "watermark_filter" -> ((s, dir) => {
      // S4/T3: incremental watermark predicate (sources.py:266-272) — only
      // rows newer than the cursor; pushed into the scan by Catalyst.
      // EventTime normalizes ts to epoch micros whichever parquet encoding
      // the fixture carries (the oracle reads the timestamp natively — same
      // row set either way).
      val ev = EventTime.readMicros(s, s"$dir/events.parquet")
      val wm = ev.agg((max(col("ts")) - lit(7L * EventTime.DayMicros)).as("wm"))
      ev.crossJoin(broadcast(wm))
        .filter(col("ts") > col("wm"))
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    }),

    "distinct_sources" -> ((s, dir) =>
      // K3: delete-scope computation (sinks.py:66-72)
      Sink.distinctSources(t(s, dir, "documents"))),

    "fim_transform" -> ((s, dir) =>
      // Character-level fill-in-the-middle training transform
      // (operators/Fim.scala scaladoc): md5-derived doc draw, PSM/SPM mix,
      // md5-derived split points — every output character replays in SQL.
      Fim.transform(t(s, dir, "documents"), "text", "doc_id")
        .select(col("doc_id"), col("fim_mode"), col("fim_text"))),

    "cli_status" -> ((s, dir) => {
      // F6 end-to-end (cli.py status): state built from the documents
      // table, persisted and RELOADED through the real JSON state backend
      // (the reference's default, state_manager.py:38-71), then the status
      // verb's exact projection — watermark row excluded, sorted item ids.
      // The oracle replays the ids directly, so the gate pins the whole
      // save -> load -> filter -> sort loop, closing the last §2 row with
      // no driver-oracle coverage.
      val docs = t(s, dir, "documents")
      val state = docs.select(
          concat(lit("doc-"), col("doc_id").cast("string")).as("item_id"),
          sha2(col("text"), 256).as("fingerprint"),
          lit(null).cast("timestamp").as("updated_at"))
        .unionByName(s.range(1).select(
          lit(graft.operators.StateStore.WatermarkKey).as("item_id"),
          lit(null).cast("string").as("fingerprint"),
          lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("updated_at")))
      val path = java.nio.file.Files.createTempFile("graft_cli_status", ".json")
      java.nio.file.Files.deleteIfExists(path) // manager owns the file
      path.toFile.deleteOnExit() // bench/verify runs must not litter /tmp
      val mgr = graft.state.JsonStateManager(path.toString)
      mgr.save(state)
      Cli.statusItems(mgr.load(s))
    }),

    "skew_join" -> ((s, dir) => {
      // Salted equi-join (hot-key mitigation): result identical to the
      // plain join, so the oracle is the unsalted SQL join.
      val l = t(s, dir, "lineitem")
        .select(col("l_suppkey").as("suppkey"),
          col("l_extendedprice"), col("l_discount"))
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey").as("suppkey"), col("s_name"))
      Skew.saltedEquiJoin(l, sup, "suppkey", numSalts = 8)
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount").cast(dec)))
            .cast("double").as("revenue"))
    }),

    "windowed_events" -> ((s, dir) => {
      // Batch parity of the streaming windowed aggregation
      // (graft.streaming.Streaming.windowedEventCounts): 1-hour tumbling
      // windows over micros event time. Decimal-exact value sums keep
      // the result order-independent and engine-identical.
      EventTime.readMicros(s, s"$dir/events.parquet")
        .groupBy((col("ts") - pmod(col("ts"), lit(EventTime.HourMicros)))
            .as("window_start_us"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(28,6)")).cast("double").as("sum_value"))
    }),

    "streaming_windowed" -> ((s, dir) =>
      // The SAME hourly aggregation as `windowed_events`, but executed by
      // the streaming engine: readStream -> tumbling window ->
      // Trigger.AvailableNow, run to completion. One oracle covers both
      // execution paths.
      graft.streaming.Streaming.runWindowedAvailableNow(s, s"$dir/events.parquet")),

    "streaming_dedup" -> ((s, dir) =>
      // First-seen dedup through the REAL stateful streaming engine
      // (Streaming.runFirstSeenAvailableNow scaladoc): mapGroupsWithState
      // collapses planted exact duplicates to exactly one emission per
      // distinct fingerprint.
      graft.streaming.Streaming.runFirstSeenAvailableNow(
        s, s"$dir/documents.parquet")),

    "streaming_enrich" -> ((s, dir) =>
      // Stream-static dimension join through the streaming engine
      // (Streaming.runEnrichAvailableNow scaladoc): streaming events
      // broadcast-joined to the static customer dimension, aggregated per
      // (segment, event_type). The batch SQL join is the oracle.
      graft.streaming.Streaming.runEnrichAvailableNow(s,
        s"$dir/events.parquet", s"$dir/customer.parquet")),

    "streaming_interval_join" -> ((s, dir) =>
      // STREAM-STREAM interval join through the streaming engine
      // (Streaming.runIntervalJoinAvailableNow scaladoc): each event
      // matched to every later same-user event within 30 minutes, both
      // sides real streaming readers with watermark-driven join-state
      // eviction. Inner joins emit eagerly, so the batch self-join is
      // the oracle value-for-value.
      graft.streaming.Streaming.runIntervalJoinAvailableNow(
        s, s"$dir/events.parquet")),

    "streaming_interval_join_outer" -> ((s, dir) =>
      // LEFT OUTER stream-stream interval join
      // (Streaming.runIntervalJoinOuterAvailableNow scaladoc): clicks
      // with no conversion inside the interval surface as null-extended
      // rows ONCE the watermark passes their window; rows whose window
      // the terminal watermark (max ts - 2 h) never passes stay
      // withheld. The oracle replays the matched self-join plus exactly
      // that "unmatched AND window closed" cutoff — probed emitted-set
      // identical at sf0.001 and sf0.01.
      graft.streaming.Streaming.runIntervalJoinOuterAvailableNow(
        s, s"$dir/events.parquet")),

    "dedup_cluster_histogram" -> ((s, dir) => {
      // Dedup QA report #2: duplicate-cluster size distribution over the
      // planted graph — the "how duplicated is this corpus" histogram
      // (cluster_size -> n_clusters), singletons included as size 1.
      val ids = t(s, dir, "documents").select(col("doc_id"))
      val e1 = ids.filter(col("doc_id") % 7 < 3)
        .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
      val e2 = ids.filter(col("doc_id") % 11 === 0)
        .select(col("doc_id").as("src"), (col("doc_id") + 3).as("dst"))
      val edges = e1.union(e2)
        .join(ids.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
      val comps = Components.connectedComponents(edges, "src", "dst")
      val hist = comps.groupBy(col("component"))
        .agg(count(lit(1)).as("csize"))
        .groupBy(col("csize").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
      // Docs in no pair are size-1 clusters; graph components are always
      // >= 2 nodes, so the buckets never collide.
      val singles = ids.agg(count(lit(1)).as("__nd"))
        .crossJoin(comps.agg(count(lit(1)).as("__nn")))
        .select(lit(1L).as("cluster_size"),
          (col("__nd") - col("__nn")).as("n_clusters"))
      hist.unionByName(singles)
    }),

    "change_detection_bucketed" -> ((s, dir) => {
      // The 10⁹-item-regime READ path (StateStore.changedBucketed
      // scaladoc): change detection against a planted bucketed state
      // table where the state scan is PARTITION-PRUNED to the batch's
      // touched buckets and the anti-join is left to AQE instead of a
      // forced broadcast (which cannot fit at that state size). Same
      // closed-form plant as streaming_state_detect: %5 docs carry stale
      // prior fingerprints, %7 docs are absent. Lazy return so the
      // committed bench plan SHOWS the bucket PartitionFilters.
      val root = java.nio.file.Files.createTempDirectory("graft-cdb")
      val statePath = root.resolve("state").toString
      val docs = t(s, dir, "documents")
      val prior = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id").cast("string").as("item_id"),
          when(col("doc_id") % 5 === 0,
            sha2(concat(col("text"), lit(" stale")), 256))
            .otherwise(sha2(col("text"), 256)).as("fingerprint"),
          lit(null).cast("timestamp").as("updated_at"))
      graft.operators.StateStore.saveBucketed(prior, statePath,
        numBuckets = 8)
      val incoming = docs.select(col("doc_id").cast("string").as("item_id"),
        sha2(col("text"), 256).as("fingerprint"))
      graft.operators.StateStore
        .changedBucketed(s, statePath, incoming, numBuckets = 8)
        .select(col("item_id").cast("long").as("doc_id"),
          col("fingerprint"))
    }),

    "streaming_state_detect" -> ((s, dir) =>
      // Incremental ingest composed end to end THROUGH the streaming
      // engine over the BUCKETED state table (r12 verdict #7;
      // Streaming.runStateDetectAvailableNow scaladoc): per micro-batch
      // change-detect against planted prior state, emit only new-or-
      // changed rows, merge exactly those via upsertBucketed. The
      // detected set and post-merge fingerprints are closed-form, so one
      // oracle covers detection AND merge through the engine.
      graft.streaming.Streaming.runStateDetectAvailableNow(
        s, s"$dir/documents.parquet")),

    "streaming_neardup" -> ((s, dir) =>
      // Stream-static near-dup flags through the REAL streaming engine
      // (stateless band join against a planted reference; Streaming
      // scaladoc). Full oracle (r7), same promotion as dedup_cross_corpus:
      // the verified stream output equals the brute-force batch cross join
      // at the threshold — one oracle covers both execution paths, the
      // streaming_windowed trick.
      graft.streaming.Streaming.runNearDupAvailableNow(s, s"$dir/documents.parquet")
        .select(col("id_new"), col("id_ref"),
          round(col("jaccard_dist"), 6).as("jaccard_dist"))),

    "corpus_curation" -> ((s, dir) => {
      // The operators composed as a curation pipeline in ONE plan: quality
      // gate (length + token floor) -> exact dedup (min-id winner) ->
      // deterministic 50% sample. Narrow filters fuse into the scan; the
      // only shuffle is the dedup's hash partition on the content digest.
      val kept = t(s, dir, "documents")
        .filter(length(col("text")) >= 100 &&
          size(regexp_extract_all(col("text"),
            lit("[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))) >= 20)
      val deduped = Dedup.exactDedup(kept, "text", "doc_id")
      Sampling.hashSample(deduped, "doc_id", 0.5)
        .select(col("doc_id"), col("source"))
    }),

    "range_join_sessions" -> ((s, dir) => {
      // Bucketed range join composed with sessionization: assign each
      // purchase to the click-session interval it falls inside. The grid
      // overlay turns the range predicate into a hash equi-join on
      // (user_id, hour-bucket) — no nested-loop plan at any scale.
      val ev = EventTime.readMicros(s, s"$dir/events.parquet")
      val gapUs = 1800L * EventTime.MicrosPerSecond
      // Pad the interval end by the gap: a session's activity window stays
      // open for `gap` after its last click (otherwise most sessions are
      // instants and the join is trivially empty).
      val intervals = Sessionize.sessionStats(
          ev.filter(col("event_type") === "click"), "user_id", "ts", gapUs)
        .select(col("user_id"), col("session_index"), col("start_us"),
          (col("end_us") + gapUs).as("end_us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      // Adaptive broadcast decision (None): sessions grow with the data, so
      // a pinned broadcast would become a driver-side collect of an
      // unbounded set at 100x — the size-estimate threshold picks broadcast
      // only while the interval side is genuinely dimension-sized.
      RangeJoin.pointInInterval(purchases, intervals, "user_id", "ts",
          "start_us", "end_us", bucketWidth = EventTime.HourMicros)
        .select(col("event_id"), col("user_id"), col("session_index"))
    }),

    "interval_overlap" -> ((s, dir) => {
      // Range x range: which click sessions overlap which view sessions
      // per user (both gap-padded). Grid overlay + the canonical-cell
      // dedup trick (emit from the overlap-start cell only) — hash
      // equi-join, no nested loop, no distinct shuffle.
      val ev = EventTime.readMicros(s, s"$dir/events.parquet")
      val gapUs = 1800L * EventTime.MicrosPerSecond
      def sessIv(tpe: String, p: String) =
        Sessionize.sessionStats(ev.filter(col("event_type") === tpe),
            "user_id", "ts", gapUs)
          .select(col("user_id"), col("session_index").as(s"${p}_session"),
            col("start_us").as(s"${p}_start"),
            (col("end_us") + gapUs).as(s"${p}_end"))
      RangeJoin.intervalOverlap(sessIv("click", "c"), sessIv("view", "v"),
          "c_start", "c_end", "v_start", "v_end",
          bucketWidth = EventTime.HourMicros, keyCols = Seq("user_id"))
        .select(col("user_id"), col("c_session"), col("v_session"),
          greatest(col("c_start"), col("v_start")).as("overlap_start"),
          least(col("c_end"), col("v_end")).as("overlap_end"))
    }),

    "heavy_hitters" -> ((s, dir) => {
      // Custom Misra-Gries TypedImperativeAggregate. Capacity (64) exceeds
      // the distinct-source count, so the sketch degrades to EXACT counts —
      // which is what makes a plain GROUP BY oracle valid. At scale the
      // same aggregate bounds memory at `capacity` entries per group.
      t(s, dir, "documents")
        .agg(graft.plans.HeavyHittersAgg.approxTopItems(col("source"), 64).as("top"))
        .select(explode(col("top")).as(Seq("source", "n_docs")))
    }),

    "asof_enrich" -> ((s, dir) => {
      // Point-in-time enrichment: each purchase gets the user's latest
      // click value at or before it (union+window as-of join — one
      // shuffle, no |L|x|R| range explosion). Micros event time matches
      // DuckDB's native timestamp precision exactly.
      val ev = EventTime.readMicros(s, s"$dir/events.parquet")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("click_value"))
      // No-prior-click rows surface as -1.0 (not NULL): engines and the
      // driver's pandas hash agree on a concrete sentinel unconditionally.
      AsofJoin.leftAsof(purchases, clicks, "user_id", "ts", Seq("click_value"))
        .select(col("event_id"), col("user_id"),
          coalesce(round(col("click_value"), 6), lit(-1.0)).as("last_click_value"))
    }),

    "stratified_split" -> ((s, dir) =>
      // EXACT-count per-language split (Sampling.exactStratifiedSplit):
      // within each lang stratum, hash-ranked rows take train/val/test at
      // exact ceil-cumulative boundaries — the frozen-corpus complement of
      // the append-stable Bernoulli `sample_split`.
      Sampling.exactStratifiedSplit(
          t(s, dir, "documents").select(col("doc_id"), col("lang")),
          "lang", "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("lang"), col("split"))),

    "quality_calibrate" -> ((s, dir) => {
      // Cross-source score calibration (Profile.percentRankBy): each doc's
      // quality becomes its within-source percentile, so one threshold
      // means the same thing on every source. Quality is the 6-dp-rounded
      // TextAnalysis score, making the rank order engine-identical.
      val docs = t(s, dir, "documents")
      val scored = TextAnalysis.qualityFrame(docs, "text", "doc_id")
        .select(col("doc_id"), col("quality"))
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
      Profile.percentRankBy(scored, "source", "quality")
        .select(col("doc_id"), col("source"), col("quality"), col("pct_rank"))
    }),

    "length_outliers" -> ((s, dir) =>
      // Robust per-source length screening (Profile.robustOutliers):
      // median/MAD with a 3-MAD fence — the outlier-resistant replacement
      // for mean/stddev z-scores. p=0.5 interpolation over integer lengths
      // yields exact .0/.5 doubles, so the unrounded fence comparison is
      // engine-identical.
      Profile.robustOutliers(
        t(s, dir, "documents").select(col("source"), col("n_chars")),
        "source", "n_chars")),

    "sample_split" -> ((s, dir) => {
      // Deterministic hash sampling + train/val/test split: membership is a
      // pure function of (doc_id, salt), stable under repartitioning and
      // corpus growth. The oracle runs the same md5-prefix predicate.
      val d = t(s, dir, "documents")
      d.withColumn("split",
          Sampling.splitColumn(col("doc_id"),
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_id"))
    }),

    "event_percentiles" -> ((s, dir) => {
      // Exact interpolated percentiles per group (the latency-SLO pattern).
      // percentile() is a single-pass sort-based aggregate per group; at
      // scale swap for approx_percentile (t-digest) when exactness can bend.
      EventTime.readMicros(s, s"$dir/events.parquet")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.9)"), 6).as("p90"),
          round(expr("percentile(value, 0.99)"), 6).as("p99"))
    }),

    "event_dispersion" -> ((s, dir) => {
      // Burstiness alarm (Drift.dispersion scaladoc): Fano factor of
      // daily event counts per type from exact integer power sums.
      val ev = EventTime.readMicros(s, s"$dir/events.parquet")
      val daily = ev.groupBy(col("event_type"),
          expr(s"ts div ${EventTime.DayMicros}").as("day"))
        .agg(count(lit(1)).as("n"))
      Drift.dispersion(daily, "event_type", "n")
    }),

    "changepoint_cusum" -> ((s, dir) => {
      // WHEN did the metric move: exact integer CUSUM over daily event
      // counts per type (Drift.cusumChangepoint scaladoc).
      val ev = EventTime.readMicros(s, s"$dir/events.parquet")
      val daily = ev.groupBy(col("event_type"),
          expr(s"ts div ${EventTime.DayMicros}").as("day"))
        .agg(count(lit(1)).as("n"))
      Drift.cusumChangepoint(daily, "event_type", "day", "n")
        .withColumnRenamed("changepoint_t", "changepoint_day")
    }),

    "funnel_conversion" -> ((s, dir) =>
      // Strictly-ordered view -> click -> purchase funnel
      // (EventAnalytics.funnel scaladoc): per-stage user counts + HALF_UP
      // 6dp conversion ratios, exact integer event time.
      EventAnalytics.funnel(EventTime.readMicros(s, s"$dir/events.parquet"),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"))),

    "cohort_retention" -> ((s, dir) =>
      // Day-granularity cohort retention (EventAnalytics.cohortRetention
      // scaladoc): first-event day per user, distinct activity per
      // (cohort, day offset 0..7), all integer micros arithmetic.
      EventAnalytics.cohortRetention(
        EventTime.readMicros(s, s"$dir/events.parquet"), "user_id", "ts",
        maxOffsetDays = 7)),

    "sessionize_events" -> ((s, dir) => {
      // Gaps-and-islands sessionization (30-min inactivity gap) over micros
      // event time; one shuffle on user_id for tag + aggregate. Micros are
      // exactly DuckDB's native timestamp precision, so the oracle's
      // epoch_us() sees the identical instants.
      val ev = EventTime.readMicros(s, s"$dir/events.parquet")
      Sessionize.sessionStats(ev, "user_id", "ts",
        1800L * EventTime.MicrosPerSecond)
    }),

    "session_window_events" -> ((s, dir) => {
      // Spark's OWN event-time sessionization — the built-in
      // `session_window` aggregation over NATIVE timestamps (the always-on
      // streaming path, here in batch mode) — against the gaps-and-islands
      // oracle. Boundary semantics differ from sessionize_events by design:
      // session_window merges half-open [ts, ts+gap) windows, so a gap of
      // EXACTLY 30 min starts a new session (>=, not >), and end_us is
      // last_ts + gap (exclusive) rather than last_ts.
      val ev = EventTime.readMicros(s, s"$dir/events.parquet")
      Sessionize.streamingSessionStats(
          EventTime.microsToTimestamp(ev, "ts", "tst")
            .select(col("user_id"), col("tst").as("ts"), col("value")),
          "user_id", "ts", gap = "30 minutes")
        .select(col("user_id"),
          unix_micros(col("session_start")).as("start_us"),
          unix_micros(col("session_end")).as("end_us"),
          col("n_events"), col("sum_value"))
    }),

    "streaming_session_window" -> ((s, dir) =>
      // The SAME session-window aggregation as `session_window_events`, but
      // executed by the STREAMING engine: readStream -> stateful
      // session_window merge -> Trigger.AvailableNow, run to completion.
      // One oracle covers both execution paths (the streaming_windowed
      // promotion pattern).
      graft.streaming.Streaming.runSessionWindowAvailableNow(
        s, s"$dir/events.parquet")),

    "front_matter" -> ((s, dir) => {
      // Jekyll/Hugo front matter (TextFunctions.frontMatterField scaladoc):
      // each doc gains a fenced metadata block — double-quoted title,
      // bare lang, a list-ish tags line — and the pure-regex operator
      // must split metadata from body. The oracle reconstructs every
      // field independently from the source columns (no regex replay),
      // so quote stripping, key anchoring, and the anchored single-strip
      // body rule all have to be exact.
      val docs = t(s, dir, "documents").filter(col("text").isNotNull)
      val fenced = concat(
        lit("---\ntitle: \"T"), col("doc_id"), lit("\"\nlang: "), col("lang"),
        lit("\ntags: corpus, r16\n---\n"), col("text"))
      docs.select(col("doc_id"),
        graft.functions.TextFunctions.frontMatterField(fenced, "title").as("fm_title"),
        graft.functions.TextFunctions.frontMatterField(fenced, "lang").as("fm_lang"),
        graft.functions.TextFunctions.frontMatterField(fenced, "tags").as("fm_tags"),
        graft.functions.TextFunctions.frontMatterField(fenced, "absent").as("fm_absent"),
        graft.functions.TextFunctions.frontMatterBody(fenced).as("body"))
    }),

    "html_main_content" -> ((s, dir) => {
      // Boilerplate removal: the corpus text embedded in a page skeleton
      // with a nav bar (short -> dropped), a link farm (link-dense ->
      // dropped), a tiny footer (short -> dropped), and one genuine extra
      // paragraph. extractMainContent must keep exactly the content
      // blocks (TextFunctions scaladoc).
      val page = concat(
        lit("<div class=\"nav\"><a href=\"/\">Home</a> <a href=\"/about\">About</a></div>\n<p>"),
        col("text"),
        lit("</p>\n<div><a href=\"/l1\">one interesting link label here</a> <a href=\"/l2\">another long link label text</a> and</div>\n" +
          "<p>A second real paragraph with plenty of genuine content words.</p>\n<div>tiny</div>"))
      t(s, dir, "documents").select(col("doc_id"),
        TextFunctions.extractMainContent(page).as("main"))
    }),

    "html_links" -> ((s, dir) => {
      // Outlink extraction (TextFunctions.extractLinks scaladoc) over a
      // page with planted links keyed by doc_id: a relative link, an
      // UPPERCASE-attribute absolute link with inner markup in the anchor,
      // and an href-less <a> that must be skipped.
      val page = concat(
        lit("<p>"), col("text"), lit("</p> <a href=\"/p"),
        col("doc_id").cast("string"), lit("\">first "), col("lang"),
        lit(" page</a> mid <A HREF=\"https://ex"),
        (col("doc_id") % 7).cast("string"), lit(".example.com/x?id="),
        col("doc_id").cast("string"),
        lit("\">Ex <b>bold</b> label</A> tail <a name=\"x\">no href</a>"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(TextFunctions.extractLinks(page)).as(Seq("link_pos", "l")))
        .select(col("doc_id"), col("link_pos").cast("long").as("link_pos"),
          col("l.href").as("href"), col("l.anchor").as("anchor"))
    }),

    "web_normalize" -> ((s, dir) => {
      // S2: strip_html + per-line normalize (sources.py:134-137) over a
      // deterministic HTML wrapping of the corpus text.
      val html = concat(lit("<html>\n<p>"), col("text"),
        lit("</p>\n<script>var x=1;</script>\n<p>tail &amp; more</p>\n</html>"))
      t(s, dir, "documents").select(col("doc_id"),
        TextFunctions.normalizeLines(TextFunctions.stripHtml(html)).as("cleaned"))
    }),

    "text_normalize" -> ((s, dir) => {
      // Unicode canonicalization (functions.Normalize scaladoc) over a
      // deterministic typographic decoration of the corpus text: combining
      // accent -> NFC, curly quotes/dashes/NBSP -> ASCII, zero-width +
      // control strip, ellipsis fold, whitespace collapse. DuckDB's
      // nfc_normalize replays the NFC step -> full oracle.
      val deco = concat(
        lit("Caf\u00e9 \u201Cqu\u2026ote\u201D \u2014\u00A0"), col("text"),
        lit(" e\u0301\u200B end\u0007"))
      t(s, dir, "documents").select(col("doc_id"),
        graft.functions.Normalize.cleanText(deco).as("normalized"))
    }),

    "mojibake_repair" -> ((s, dir) => {
      // ftfy-style encoding repair (functions.Mojibake scaladoc): every 3rd
      // doc gains a suffix rendered the way a UTF-8-as-cp1252 mis-decode
      // would mangle it (accents, nbsp pair, dashes, the 0x9d-hole quote);
      // the repair chain must restore it and leave clean docs untouched.
      val bad = graft.functions.Mojibake.corrupt(MojibakeCleanSuffix)
      val planted = when(col("doc_id") % 3 === 0, concat(col("text"), lit(bad)))
        .otherwise(col("text"))
      val fixed = graft.functions.Mojibake.fixMojibake(planted)
      t(s, dir, "documents").select(col("doc_id"),
        fixed.as("fixed_text"),
        (fixed =!= planted).as("was_mojibake"))
    }),

    "sink_projection" -> ((s, dir) => {
      // K1: fixed text+vector sink schema (dynamic_schemas.py:44-51). The
      // compared output carries scalar digests of the vector (dim + L2 norm)
      // instead of the raw array — the driver's pandas compare can't sort
      // list columns; the full vector schema is pinned by SinkSpec instead.
      val d = t(s, dir, "documents")
      val e = t(s, dir, "embeddings")
      d.join(e, d("doc_id") === e("vec_id"))
        .select(col("text"), col("source"), col("lang"), col("doc_id"),
          size(col("embedding")).cast("long").as("vector_dim"),
          round(VectorFunctions.l2Norm(col("embedding")), 6).as("vector_norm"))
    }),

    "pipeline_e2e" -> ((s, dir) => {
      // The flagship WRITE PATH as ONE lineage (r12 verdict #4 — the
      // composition the per-stage gates prove piecewise, mirroring
      // Pipeline.run / yamlpipe/core/pipeline.py:51-98): scan + non-blank
      // + document fingerprint (source_scan), adaptive chunking
      // (chunk_adaptive's recursive regime — plain single-line docs carry
      // no markdown skeleton), hashing embed attach (embed_hashing), and
      // the text+vector sink projection (sink_projection's scalar vector
      // digests). One narrow stage end to end: scan -> chunk generate ->
      // embed map -> project, no shuffle, no driver hop (pinned in
      // PlanQualitySpec).
      val scanned = t(s, dir, "documents")
        .filter(TextFunctions.nonBlank(col("text")))
        .select(col("doc_id"), col("source"), col("lang"), col("text"),
          sha2(col("text"), 256).as("fingerprint"))
      val chunks = Chunkers.adaptive(scanned, "text",
        chunkSize = 150, chunkOverlap = 30)
      Embed.hashing(chunks, "chunk", dim = 64)
        .select(col("chunk").as("text"), col("source"), col("lang"),
          col("doc_id"), col("chunk_index").cast("long").as("chunk_index"),
          col("fingerprint"),
          size(col("embedding")).cast("long").as("vector_dim"),
          (VectorFunctions.normSq(col("embedding")) > 0).as("has_embedding"))
    }),

    // -----------------------------------------------------------------------
    // Query / eval path (SURVEY §2.6, §2.7)
    // -----------------------------------------------------------------------
    "topk_search" -> ((s, dir) => {
      // Q1: vector top-k. Score rounded to 6dp before ranking so the
      // ordering is engine-stable; vec_id breaks ties.
      val e = t(s, dir, "embeddings")
      val q = broadcast(e.filter(col("vec_id") === 0).select(col("embedding").as("qv")))
      e.crossJoin(q)
        .filter(col("vec_id") =!= 0)
        .withColumn("score", round(cos(col("embedding"), col("qv")), 6))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(10)
        .select(col("vec_id"), col("score"))
    }),

    "maxsim_rerank" -> ((s, dir) => {
      // ColBERT-style late-interaction rerank (MaxSim scaladoc): each
      // label group of the embeddings table plays a "document" whose
      // first 8 vectors (by vec_id) are its token matrix; queries are the
      // first 2 vectors of labels ≡ 0 (mod 4). Score = Σ over query
      // tokens of the best cosine over doc tokens — nested codegen'd HOF
      // arithmetic over a broadcast query side, per-query top-3. FULL
      // oracle: list_dot_product replays the token cosines
      // value-for-value, both engines summing in vec_id order.
      val emb = t(s, dir, "embeddings")
      val docs = MaxSim.tokenMatrix(emb, col("label"), "vec_id", "embedding", 8)
        .select(col("id").as("doc_label"), col("toks").as("d_tokens"))
      val queries = MaxSim.tokenMatrix(emb.filter(col("label") % 4 === 0),
          col("label"), "vec_id", "embedding", 2)
        .select(col("id").as("q_label"), col("toks").as("q_tokens"))
      MaxSim.rerank(queries, "q_label", "q_tokens",
          docs, "doc_label", "d_tokens", k = 3)
        .select(col("q_label"), col("doc_label"),
          round(col("score"), 6).as("score"), col("rank").cast("long").as("rank"))
    }),

    "maxsim_two_stage" -> ((s, dir) => {
      // PLAID/ColBERTv2 deployment shape (MaxSim.rerankPairs scaladoc):
      // stage 1 — single-vector recall on MEAN-POOLED token matrices
      // (cosine rounded to 6dp before ranking, engine-stable) keeps the
      // top-5 candidates per query; stage 2 — exact MaxSim on the
      // surviving pairs only, top-3, with the stage-1 rank riding along
      // so the output shows both orderings. FULL oracle: the pool
      // arithmetic and both rank stages replay value-for-value.
      val emb = t(s, dir, "embeddings")
      val docs = MaxSim.tokenMatrix(emb, col("label"), "vec_id", "embedding", 8)
        .select(col("id").as("doc_label"), col("toks").as("d_tokens"),
          MaxSim.meanPool(col("toks")).as("d_pool"))
      val queries = MaxSim.tokenMatrix(emb.filter(col("label") % 4 === 0),
          col("label"), "vec_id", "embedding", 2)
        .select(col("id").as("q_label"), col("toks").as("q_tokens"),
          MaxSim.meanPool(col("toks")).as("q_pool"))
      val stage1 = docs.crossJoin(broadcast(queries))
        .withColumn("s1", round( // pools are array<double> — HOF cosine, not the float-specialized graft_cosine
          graft.functions.VectorFunctions.cosineSimilarity(col("q_pool"), col("d_pool")), 6))
        .withColumn("stage1_rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("q_label"))
            .orderBy(col("s1").desc, col("doc_label").asc)))
        .filter(col("stage1_rank") <= 5)
      MaxSim.rerankPairs(stage1, "q_label", "q_tokens",
          "doc_label", "d_tokens", k = 3)
        .join(stage1.select(col("q_label"), col("doc_label"), col("stage1_rank")),
          Seq("q_label", "doc_label"))
        .select(col("q_label"), col("doc_label"),
          round(col("score"), 6).as("score"), col("rank").cast("long").as("rank"),
          col("stage1_rank").cast("long").as("stage1_rank"))
    }),

    "hybrid_search_rrf" -> ((s, dir) => {
      // Hybrid retrieval: reciprocal-rank fusion of the vector top-k list
      // (query = vec 0's embedding, as in `topk_search`) with the BM25
      // lexical list (query terms as in `bm25_rank`). Scores rounded to 6dp
      // before ranking so the rank order is engine-stable.
      val e = t(s, dir, "embeddings")
      val q = broadcast(e.filter(col("vec_id") === 0).select(col("embedding").as("qv")))
      val vec = e.crossJoin(q).filter(col("vec_id") =!= 0)
        .select(col("vec_id").as("id"),
          round(cos(col("embedding"), col("qv")), 6).as("score"))
      val lex = Bm25.score(t(s, dir, "documents"), "text", "doc_id",
          Seq("spark", "join", "window"))
        .select(col("doc_id").as("id"), col("bm25").as("score"))
      HybridSearch.rrf(vec, lex, "id", "score", k = 60, perListK = 100, topN = 20)
    }),

    "eval_hitrate" -> ((s, dir) => {
      // A1+A2: hit@k per question -> hit-rate aggregate (evaluation.py:83-109)
      val d = t(s, dir, "documents")
      val e = t(s, dir, "embeddings")
      val corpus = d.join(e, d("doc_id") === e("vec_id"))
        .select(col("vec_id"), col("embedding"), col("source"))
      val queries = corpus.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("source").as("expected_source"))
      val scored = queries.crossJoin(corpus)
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("score", round(cos(col("embedding"), col("qv")), 6))
      val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
      val topk = scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      Search.hitRate(topk, "qid", "source", "expected_source")
    }),

    "eval_mrr" -> ((s, dir) => {
      // Rank-sensitive twin of eval_hitrate over the same top-5 frame:
      // 1/rank of the first relevant result, 0 when absent.
      val d = t(s, dir, "documents")
      val e = t(s, dir, "embeddings")
      val corpus = d.join(e, d("doc_id") === e("vec_id"))
        .select(col("vec_id"), col("embedding"), col("source"))
      val queries = corpus.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("source").as("expected_source"))
      val scored = queries.crossJoin(corpus)
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("score", round(cos(col("embedding"), col("qv")), 6))
      val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
      val topk = scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      Search.mrr(topk, "qid", "source", "expected_source", rankCol = "rn")
    }),

    "eval_ndcg" -> ((s, dir) => {
      // Graded third leg of the retrieval report (hitrate/mrr/ndcg) over the
      // identical top-5 frame. The ideal DCG uses the per-query corpus-wide
      // relevant count (docs sharing the expected source, self excluded) so
      // partial retrieval is penalized honestly.
      val d = t(s, dir, "documents")
      val e = t(s, dir, "embeddings")
      val corpus = d.join(e, d("doc_id") === e("vec_id"))
        .select(col("vec_id"), col("embedding"), col("source"))
      val queries = corpus.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("source").as("expected_source"))
      val scored = queries.crossJoin(corpus)
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("score", round(cos(col("embedding"), col("qv")), 6))
      val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
      val topk = scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      // n_relevant per query = corpus docs with the expected source minus the
      // query doc itself: a per-source count broadcast, not a second scan.
      val bySource = corpus.groupBy(col("source").as("rel_source")).count()
      val totals = queries.join(broadcast(bySource),
          col("expected_source") === col("rel_source"))
        .select(col("qid"), (col("count") - 1).as("n_relevant"))
      Search.ndcg(topk, "qid", "source", "expected_source", rankCol = "rn",
        k = 5, relevantTotals = totals)
    }),

    "eval_rbo" -> ((s, dir) => {
      // Ranker-comparison: how much does the top-10 ordering change when
      // cosine is swapped for raw dot product? One scored frame, two
      // row_number windows, then Search.rbo's exact-rational suffix sum
      // (k=10, p=9/10) — per query: overlap_at_k and the top-weighted RBO.
      val e = t(s, dir, "embeddings")
      val corpus = e.select(col("vec_id"), col("embedding"))
      val queries = corpus.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val scored = queries.crossJoin(corpus)
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("cos_s", round(cos(col("embedding"), col("qv")), 6))
        .withColumn("dot_s",
          round(VectorFunctions.dotProduct(col("embedding"), col("qv")), 6))
      val wc = Window.partitionBy(col("qid"))
        .orderBy(col("cos_s").desc, col("vec_id"))
      val wd = Window.partitionBy(col("qid"))
        .orderBy(col("dot_s").desc, col("vec_id"))
      val ranked = scored
        .withColumn("rank_cos", row_number().over(wc))
        .withColumn("rank_dot", row_number().over(wd))
        .select(col("qid"), col("rank_cos"), col("rank_dot"))
      Search.rbo(ranked, "qid", "rank_cos", "rank_dot",
        k = 10, pNum = 9, pDen = 10)
    }),

    "eval_rouge" -> ((s, dir) => {
      // ROUGE-2 of the lead-20-token extractive baseline against the full
      // document (Search.rougeN scaladoc): clipped bigram counts, P/R/F1
      // each one exact integer division.
      val d = t(s, dir, "documents")
      val pairs = d.select(col("doc_id"),
        array_join(slice(TextAnalysis.toks(col("text")), 1, 20), " ")
          .as("cand"),
        col("text"))
      Search.rougeN(pairs, "doc_id", "cand", "text", n = 2)
    }),

    "bitext_margin" -> ((s, dir) => {
      // Margin-based bitext mining (Similarity.marginBitext scaladoc):
      // even/odd vec_id halves play source/target corpus; ratio margin
      // over knn=4 neighborhoods, best target per source + mutual flag.
      // r17: the r16 gate-level spread() of both halves is REVERTED — the
      // driver's ground truth measured 3.94 -> 4.90 s at 32 cores (0.80x)
      // with the spreads, 1.58 s at 8: on an exchange-bound gate the two
      // added round-robin exchanges cost more than the recompute they
      // saved. The real r16 win (marginFromScored's localCheckpoints of
      // the scored frame, proven by the blocked twin's 2.6x) is inside
      // the operator and stays.
      val e = t(s, dir, "embeddings")
      Similarity.marginBitext(
        e.filter(col("vec_id") % 2 === 0),
        e.filter(col("vec_id") % 2 === 1), knn = 4)
    }),

    "label_agreement" -> ((s, dir) => {
      // Cohen's kappa between two cheap quality raters (char-length
      // buckets vs token-count buckets) — the inter-annotator-agreement
      // audit (Classifier.cohenKappa scaladoc); exact-integer kappa.
      val d = t(s, dir, "documents")
      val wc = size(TextAnalysis.toks(col("text")))
      val rated = d.select(
        when(col("n_chars") < 200, "short")
          .when(col("n_chars") < 380, "medium")
          .otherwise("long").as("rater_len"),
        when(wc < 38, "short")
          .when(wc < 72, "medium")
          .otherwise("long").as("rater_tok"))
      Classifier.cohenKappa(rated, "rater_len", "rater_tok")
    }),

    "t_closeness" -> ((s, dir) =>
      // Third rung of the privacy ladder after k_anonymity / l_diversity
      // (CurationRules.tCloseness scaladoc): per-source language
      // distribution vs the corpus-wide one, exact-integer TVD, t = 0.2.
      CurationRules.tCloseness(t(s, dir, "documents"), Seq("source"), "lang",
        t = 0.2)),

    "drift_psi" -> ((s, dir) => {
      // Population stability index between the even/odd event-id halves
      // (Drift.psi scaladoc): 10 fixed-width value bins over [0, 500),
      // Laplace-smoothed, per-bin terms + the boundary-safe rounded total.
      val e = t(s, dir, "events")
      Drift.psi(e.filter(col("event_id") % 2 === 0),
        e.filter(col("event_id") % 2 === 1), "value",
        bins = 10, lo = 0.0, hi = 500.0)
    }),

    "benford_audit" -> ((s, dir) =>
      // First-digit forensic audit over event values (Profile.benford
      // scaladoc): per-digit counts vs log10(1+1/d) expectations and
      // chi-square terms.
      Profile.benford(t(s, dir, "events"), "value")),

    "brier_decomposition" -> ((s, dir) => {
      // Murphy decomposition of the quality classifier's Brier score over
      // the same calibration deciles (Classifier.brierDecomposition
      // scaladoc): reliability/resolution terms per bin, exact-integer
      // micro-unit arithmetic, global brier + uncertainty repeated.
      val docs = t(s, dir, "documents")
      val feats = TextAnalysis.qualityFrame(docs, "text", "doc_id")
        .select(col("doc_id"), col("mean_token_len"), col("punct_ratio"),
          col("stopword_ratio"))
        .join(docs.select(col("doc_id"),
          when(col("lang") === "en", 1.0).otherwise(0.0).as("label")), "doc_id")
      Classifier.brierDecomposition(
        Classifier.fitScoreLogistic(feats,
          Seq("mean_token_len", "punct_ratio", "stopword_ratio"), "label",
          iterations = 2, lr = 1.0),
        "prob", "label", bins = 100)
    }),

    "rake_keyphrases" -> ((s, dir) =>
      // Per-document RAKE keyphrases (Rake scaladoc): stopword-delimited
      // phrase islands, deg/freq word scores in integer micro-units,
      // top-3 phrases per doc.
      Rake.keyphrases(t(s, dir, "documents"), "text", "doc_id", k = 3)),

    "dedup_jaro" -> ((s, dir) =>
      // Fuzzy entity resolution over planted surname variants
      // (EditDistance.jaroPairs scaladoc): first-letter blocking, standard
      // Jaro-Winkler at >= 0.85. The plant mutates a 10-surname base by
      // doc_id%4: keep / drop 3rd char / swap chars 2-3 / append 'x'.
      // doc_id < 1000 bounds the quadratic same-surname pair families at
      // driver SF bumps (same fence as ssjoin_prefix).
      EditDistance.jaroPairs(
        t(s, dir, "documents").filter(col("doc_id") < 1000)
          .select(col("doc_id"), plantedSurname.as("name")),
        "doc_id", "name", minSim = 0.85)),

    "coreset_kcenter" -> ((s, dir) =>
      // Gonzalez farthest-point coreset over the embeddings
      // (KMeans.kCenter scaladoc): k=6 bounded driver rounds, each one
      // TakeOrderedAndProject argmax; selection curve + coverage radius.
      KMeans.kCenter(t(s, dir, "embeddings"), "embedding", "vec_id", k = 6)),

    "cms_audit" -> ((s, dir) =>
      // Count-min sketch accuracy audit over the token stream
      // (SketchAudit.countMinAudit scaladoc): engine-neutral md5 bucket
      // hashes, depth 3 x width 128, top-20 keys, never-undercounts law.
      SketchAudit.countMinAudit(
        spread(t(s, dir, "documents"))
          .select(explode(TextAnalysis.toks(col("text"))).as("term")),
        "term")),

    "pareto_quality" -> ((s, dir) =>
      // 2-D skyline of the curation trade-off (Profile.paretoFrontier
      // scaladoc): maximize quality score, minimize char cost — no
      // pairwise pass, one window over per-quality minima.
      Profile.paretoFrontier(
        TextAnalysis.qualityFrame(t(s, dir, "documents"), "text", "doc_id")
          .select(col("doc_id"), col("quality"), col("n_chars")),
        "quality", "n_chars")),

    "inclusion_profile" -> ((s, dir) => {
      // Candidate-FK discovery across the warehouse tables
      // (Profile.inclusionDependency scaladoc): three true inclusion
      // dependencies and one deliberate non-FK control pair.
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation")
      val sup = t(s, dir, "supplier")
      Seq(
        Profile.inclusionDependency(li, "l_orderkey", o, "o_orderkey",
          "lineitem.l_orderkey->orders.o_orderkey"),
        Profile.inclusionDependency(o, "o_custkey", c, "c_custkey",
          "orders.o_custkey->customer.c_custkey"),
        Profile.inclusionDependency(c, "c_nationkey", n, "n_nationkey",
          "customer.c_nationkey->nation.n_nationkey"),
        Profile.inclusionDependency(o, "o_custkey", sup, "s_suppkey",
          "orders.o_custkey->supplier.s_suppkey"))
        .reduce(_ unionByName _)
    }),

    "ssjoin_prefix" -> ((s, dir) =>
      // EXACT set-similarity join via prefix filtering
      // (Dedup.prefixFilterJoin scaladoc): rational threshold 4/5, pure
      // integer prefix length + verify predicate; the brute-force oracle
      // proves the zero-false-negative guarantee pair for pair.
      // doc_id < 1000 keeps the oracle's all-pairs side tractable at
      // driver SF bumps.
      Dedup.prefixFilterJoin(
        t(s, dir, "documents").filter(col("doc_id") < 1000),
        "text", "doc_id", tNum = 4, tDen = 5)),

    "outlier_knn" -> ((s, dir) => {
      // k-th-neighbor-distance novelty scores
      // (Similarity.kthNeighborDistance scaladoc): cosine distance to the
      // 5th nearest, flag at >= 0.75 — the sparse-region triage signal.
      val e = t(s, dir, "embeddings")
      Similarity.kthNeighborDistance(e.filter(col("vec_id") < 50), e, k = 5)
    }),

    "downsample_lttb" -> ((s, dir) =>
      // Largest-triangle-three-buckets downsampling, bucket-average
      // variant (EventAnalytics.lttbDownsample scaladoc): per event_type,
      // 100-point buckets, spike-preserving representative points.
      EventAnalytics.lttbDownsample(
        EventTime.readMicros(s, s"$dir/events.parquet"),
        "event_type", "ts", "value", "event_id", bucketSize = 100)),

    "series_corr" -> ((s, dir) => {
      // Correlation matrix between event types' daily-count series —
      // "which metrics move together" (errors tracking clicks = load
      // problem; purchases decoupling from views = funnel break). Daily
      // counts are exact integers; Profile.pearsonByGroup supplies the
      // fixed moment chain per unordered type pair.
      val e = EventTime.readMicros(s, s"$dir/events.parquet")
      val daily = e.filter(col("ts").isNotNull && col("event_type").isNotNull)
        .groupBy(col("event_type"),
          floor(col("ts") / EventTime.DayMicros).cast("long").as("day"))
        .agg(count(lit(1)).as("n"))
      val a = daily.select(col("event_type").as("ta"), col("day"),
        col("n").as("na"))
      val b = daily.select(col("event_type").as("tb"), col("day"),
        col("n").as("nb"))
      val paired = a.join(b, Seq("day")).filter(col("ta") < col("tb"))
        .select(concat_ws("~", col("ta"), col("tb")).as("pair"),
          col("na"), col("nb"))
      Profile.pearsonByGroup(paired, "pair", "na", "nb")
        .filter(col("group") =!= "<pooled>")
    }),

    "mannwhitney_u" -> ((s, dir) => {
      // Mann-Whitney U between the even/odd event-id halves' values —
      // the nonparametric A/B companion to ab_test_z (rank-based, so a
      // heavy tail can't fake significance). Average ranks for ties are
      // exact 0.5-multiples (minrank + (t-1)/2), the rank sum is exact,
      // and z uses the tie-corrected variance in one fixed shape.
      val e = t(s, dir, "events").filter(col("value").isNotNull)
        .select(round(col("value") * 100, 0).cast("long").as("__v"),
          (col("event_id") % 2 === 0).as("__a"))
      val byVal = e.groupBy(col("__v"))
        .agg(count(lit(1)).as("__t"), sum(col("__a").cast("long")).as("__ta"))
      val cum = Window.orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val ranked = byVal
        .withColumn("__below", coalesce(sum(col("__t")).over(cum), lit(0L)))
        .withColumn("__avgrank",
          (col("__below") + 1).cast("double") + (col("__t") - 1) / lit(2.0))
      val agg = ranked.agg(
        sum(col("__ta")).cast("long").as("n_a"),
        (sum(col("__t")) - sum(col("__ta"))).cast("long").as("n_b"),
        sum(col("__ta") * col("__avgrank")).as("__ra"),
        sum(col("__t") * col("__t") * col("__t") - col("__t")).as("__ties"))
      val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
      val nn = na + nb
      val u = col("__ra") - na * (na + 1) / 2
      val sigma2 = na * nb / 12 *
        ((nn + 1) - col("__ties").cast("double") / (nn * (nn - 1)))
      agg.select(col("n_a"), col("n_b"),
        round(u, 6).as("u_a"),
        when(sigma2 > 0,
          round((u - na * nb / 2) / sqrt(sigma2), 6))
          .otherwise(lit(null).cast("double")).as("z"))
    }),

    "ab_test_z" -> ((s, dir) => {
      // Two-proportion z-test between the even/odd user cohorts'
      // purchase conversion — the experiment-readout primitive: pooled
      // proportion, one fixed-shape z. Exact integer counts in.
      val e = t(s, dir, "events")
      val users = e.filter(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(max((col("event_type") === "purchase" && col("value") > 480)
          .cast("long")).as("__conv"))
        .withColumn("__grp",
          when(col("user_id") % 2 === 0, "A").otherwise("B"))
      val g = users.groupBy(col("__grp"))
        .agg(count(lit(1)).as("n"), sum(col("__conv")).as("conv"))
      val a = g.filter(col("__grp") === "A")
        .select(col("n").as("n_a"), col("conv").as("conv_a"))
      val b = g.filter(col("__grp") === "B")
        .select(col("n").as("n_b"), col("conv").as("conv_b"))
      val pa = col("conv_a").cast("double") / col("n_a")
      val pb = col("conv_b").cast("double") / col("n_b")
      val pp = (col("conv_a") + col("conv_b")).cast("double") /
        (col("n_a") + col("n_b"))
      a.crossJoin(b).select(
        col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        round(pa, 6).as("rate_a"), round(pb, 6).as("rate_b"),
        when(pp > 0 && pp < 1,
          round((pa - pb) /
            sqrt(pp * (lit(1.0) - pp) *
              (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 6))
          .otherwise(lit(null).cast("double")).as("z"))
    }),

    "stump_split" -> ((s, dir) => {
      // Best decision-stump split of the quality label on mean token
      // length by exact information gain: sweep every distinct feature
      // value (predict left at x <= t), suffix/prefix sums give exact
      // counts, entropy in fixed double shapes, argmax by (gain, t).
      val docs = t(s, dir, "documents")
      val pts = TextAnalysis.qualityFrame(docs, "text", "doc_id")
        .select(col("doc_id"), col("mean_token_len").as("x"))
        .join(docs.select(col("doc_id"),
          when(col("lang") === "en", 1L).otherwise(0L).as("y")), "doc_id")
      val dist = pts.groupBy(col("x"))
        .agg(count(lit(1)).as("__n"), sum(col("y")).as("__p"))
      val cum = Window.orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      def h(p: Column, n: Column): Column =
        when(p > 0 && p < n,
          -(p.cast("double") / n) * log(p.cast("double") / n) -
            ((n - p).cast("double") / n) * log((n - p).cast("double") / n))
          .otherwise(lit(0.0))
      val swept = dist
        .withColumn("__nl", sum(col("__n")).over(cum).cast("long"))
        .withColumn("__pl", sum(col("__p")).over(cum).cast("long"))
        .withColumn("__nt", sum(col("__n")).over(tot).cast("long"))
        .withColumn("__pt", sum(col("__p")).over(tot).cast("long"))
        .filter(col("__nl") < col("__nt")) // a split must have a right side
        .withColumn("__gain", round(
          h(col("__pt"), col("__nt")) -
            (col("__nl").cast("double") / col("__nt")) *
              h(col("__pl"), col("__nl")) -
            ((col("__nt") - col("__nl")).cast("double") / col("__nt")) *
              h(col("__pt") - col("__pl"), col("__nt") - col("__nl")), 6))
      val pick = Window.orderBy(col("__gain").desc, col("x"))
      swept.withColumn("__rn", row_number().over(pick))
        .filter(col("__rn") === 1)
        .select(col("x").as("split_at"), col("__nl").as("n_left"),
          (col("__nt") - col("__nl")).as("n_right"),
          col("__pl").as("pos_left"),
          (col("__pt") - col("__pl")).as("pos_right"), col("__gain").as("gain"))
    }),

    "gains_curve" -> ((s, dir) => {
      // Cumulative gains / lift by score decile — the campaign-targeting
      // read of the quality classifier ("scoring the top 20% catches
      // what fraction of positives?"): rank by (prob DESC, doc_id),
      // decile = integer rank bucketing, cumulative sums over 10 rows.
      val docs = t(s, dir, "documents")
      val feats = TextAnalysis.qualityFrame(docs, "text", "doc_id")
        .select(col("doc_id"), col("mean_token_len"), col("punct_ratio"),
          col("stopword_ratio"))
        .join(docs.select(col("doc_id"),
          when(col("lang") === "en", 1.0).otherwise(0.0).as("label")), "doc_id")
      val scored = Classifier.fitScoreLogistic(feats,
        Seq("mean_token_len", "punct_ratio", "stopword_ratio"), "label",
        iterations = 2, lr = 1.0)
      val w = Window.orderBy(col("prob").desc, col("doc_id"))
      val ranked = scored
        .withColumn("__rn", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
        // decile d = ceil(10 * rn / n) in pure integers
        .withColumn("decile",
          (((col("__rn") * 10 + col("__n") - 1) / col("__n")).cast("long")))
      val dec0 = ranked.groupBy(col("decile"))
        .agg(count(lit(1)).as("n"),
          sum(col("label").cast("long")).as("n_pos"))
      val cum = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      dec0
        .withColumn("__cp", sum(col("n_pos")).over(cum).cast("long"))
        .withColumn("__cn", sum(col("n")).over(cum).cast("long"))
        .withColumn("__tp", sum(col("n_pos")).over(tot).cast("long"))
        .withColumn("__tn", sum(col("n")).over(tot).cast("long"))
        .select(col("decile"), col("n"), col("n_pos"),
          round(col("__cp").cast("double") / col("__tp"), 6)
            .as("cum_pos_share"),
          round((col("__cp").cast("double") * col("__tn")) /
            (col("__cn").cast("double") * col("__tp")), 6).as("lift"))
    }),

    "set_cover_docs" -> ((s, dir) => {
      // Greedy max-coverage eval-set selection over BIGRAM vocabulary
      // (Sampling.greedySetCover scaladoc) — the unigram vocabulary is
      // tiny enough that one doc covers it; bigrams make coverage a real
      // 5-round selection problem. 5 driver rounds, each one distributed
      // argmax of uncovered-gain.
      val d = t(s, dir, "documents")
      val tk = TextAnalysis.toks(col("text"))
      val bigrams = when(size(tk) >= 2,
        transform(sequence(lit(1), size(tk) - 1),
          i => concat_ws("_", slice(tk, i, lit(2)))))
        .otherwise(array().cast("array<string>"))
      // spread BEFORE the bigram projection: the heavy transform/slice/
      // array_join runs below greedySetCover's own exchange otherwise
      // (profiled 3.0 s single-task at sf0.1, guide §2.5).
      val bigramText = spread(d).select(col("doc_id"),
        array_join(bigrams, " ").as("text"))
      Sampling.greedySetCover(bigramText, "text", "doc_id", k = 5)
    }),

    "fightin_words" -> ((s, dir) => {
      // Monroe et al. distinctive terms: en docs vs the rest
      // (Drift.fightinWords scaladoc) — Dirichlet-smoothed log-odds
      // z-scores over the vocabulary tables.
      val d = t(s, dir, "documents")
      Drift.fightinWords(d.filter(col("lang") === "en"),
        d.filter(col("lang") =!= "en"), "text")
    }),

    "rendezvous_shards" -> ((s, dir) =>
      // Highest-random-weight placement over 8 shards
      // (Partitioning.rendezvousShard scaladoc): the minimal-disruption
      // resharding scheme; per-doc placement + per-shard load.
      t(s, dir, "documents")
        .select(col("doc_id"),
          Partitioning.rendezvousShard(col("doc_id"),
            (0 to 7).map(i => s"shard$i")).as("shard"))),

    "quality_residuals" -> ((s, dir) => {
      // Length-residualized quality: the exact least-squares line of
      // quality on n_chars (micro-lifted moments, fixed double
      // combination) subtracted per doc — which documents are better
      // than their length predicts?
      val q = TextAnalysis.qualityFrame(t(s, dir, "documents"), "text",
        "doc_id")
        .select(col("doc_id"), col("n_chars"),
          round(col("quality") * 1e6, 0).cast("long").as("__qu"))
      val m = q.agg(count(lit(1)).as("__n"), sum(col("n_chars")).as("__sx"),
        sum(col("__qu")).as("__sy"),
        sum(col("n_chars") * col("__qu")).as("__sxy"),
        sum(col("n_chars") * col("n_chars")).as("__sxx"))
      val vx = col("__n").cast("double") * col("__sxx") -
        col("__sx").cast("double") * col("__sx")
      val cov = col("__n").cast("double") * col("__sxy") -
        col("__sx").cast("double") * col("__sy")
      val b = round(cov / vx / 1e6, 9)
      val a = round((col("__sy").cast("double") / col("__n") / 1e6) -
        (cov / vx / 1e6) * (col("__sx").cast("double") / col("__n")), 9)
      q.crossJoin(broadcast(m.select(b.as("__b"), a.as("__a"))))
        .select(col("doc_id"), col("n_chars"),
          round(col("__qu").cast("double") / 1e6, 6).as("quality"),
          (round(col("__qu").cast("double") / 1e6 -
            (col("__a") + col("__b") * col("n_chars")), 6) + lit(0.0))
            .as("residual"))
    }),

    "dwell_time" -> ((s, dir) =>
      // Per-type dwell time to the user's next event
      // (EventAnalytics.dwellTime scaladoc): exact rank-selected median
      // and p90 per event type.
      EventAnalytics.dwellTime(
        EventTime.readMicros(s, s"$dir/events.parquet"),
        "user_id", "event_type", "ts", "event_id")),

    "graph_health" -> ((s, dir) => {
      // Reciprocity + degree assortativity over the shared planted link
      // graph (Graph.healthStats scaladoc).
      val ids = t(s, dir, "documents").select(col("doc_id"))
      val e1 = ids.filter(col("doc_id") % 7 < 3)
        .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
      val e2 = ids.filter(col("doc_id") % 11 === 0)
        .select(col("doc_id").as("src"), (col("doc_id") + 3).as("dst"))
      val edges = e1.union(e2)
        .join(ids.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
      Graph.healthStats(edges, "src", "dst")
    }),

    "pivot_daily" -> ((s, dir) =>
      // The relational pivot surface: day x event-type count matrix via
      // Dataset.pivot with EXPLICIT values (the scale rule — an implicit
      // pivot runs a distinct-values job first and caps at
      // spark.sql.pivotMaxValues; explicit values make one pass).
      EventTime.readMicros(s, s"$dir/events.parquet")
        .filter(col("ts").isNotNull)
        .withColumn("day",
          floor(col("ts") / EventTime.DayMicros).cast("long"))
        .groupBy(col("day"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)),

    "sql_surface" -> ((s, dir) => {
      // The spark.sql entry path: the same engine drives from SQL text
      // over registered views — a user of the reference's YAML/SQL-ish
      // surface can hand the engine a query string.
      t(s, dir, "documents").createOrReplaceTempView("docs_view")
      s.sql("""
        SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS mean_chars
        FROM docs_view
        GROUP BY lang, source""")
    }),

    "rolling_active_users" -> ((s, dir) =>
      // Exact DAU / trailing-7-day WAU / stickiness
      // (EventAnalytics.rollingActiveUsers scaladoc): bounded window
      // fan-out instead of a distinct sketch.
      EventAnalytics.rollingActiveUsers(
        EventTime.readMicros(s, s"$dir/events.parquet"),
        "user_id", "ts")),

    "cluster_exemplars" -> ((s, dir) => {
      // Per-cluster exemplars: the 3 vectors closest to each k-means
      // centroid — the interpretability view of the SemDeDup blocks
      // ("what IS cluster 7?"); one rank window over the assignment.
      val assigned = KMeans.fitAssign(t(s, dir, "embeddings"), "embedding",
        "vec_id", k = 10, iterations = 2)
      val w = Window.partitionBy(col("cluster"))
        .orderBy(col("dist2"), col("vec_id"))
      assigned.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("cluster").cast("long").as("cluster"), col("vec_id"),
          col("dist2"), col("rank"))
    }),

    "autocomplete_index" -> ((s, dir) =>
      // Prefix autocomplete table (Search.autocompleteIndex scaladoc):
      // vocabulary-bounded fan-out, top-3 per prefix.
      Search.autocompleteIndex(t(s, dir, "documents"), "text")),

    "spell_correct" -> ((s, dir) => {
      // Noisy-channel spell correction (EditDistance.spellCorrect
      // scaladoc): queries = every vocab word with its 2nd char dropped,
      // plus one exact hit and one no-suggestion control; candidates via
      // deletion variants, unigram-frequency prior.
      val d = t(s, dir, "documents")
      val vocab = d.select(explode(TextAnalysis.toks(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
      val queries = vocab.select(
          concat(col("w").substr(lit(1), lit(1)),
            col("w").substr(lit(3), lit(100))).as("q"))
        .unionByName(vocab.select(lit("spark").as("q")).limit(1))
        .unionByName(vocab.select(lit("qqqq").as("q")).limit(1))
      EditDistance.spellCorrect(queries, "q", vocab, "w", "n",
        broadcastBest = true) // fixture-small query set: pin the plan (r14 flap)
    }),

    "bm25_merged_stats" -> ((s, dir) => {
      // Incremental-indexing law (Bm25.scoreMergedShards scaladoc):
      // three doc-disjoint shards' tf tables + stat partials merge into
      // scores IDENTICAL to the one-shot index — shares bm25_rank's
      // oracle as the proof.
      val d = t(s, dir, "documents")
      Bm25.scoreMergedShards(
        (0 to 2).map(r => d.filter(col("doc_id") % 3 === r)),
        "text", "doc_id", Seq("spark", "join", "window"))
    }),

    "zorder_index" -> ((s, dir) => {
      // Morton/Z-order layout keys over (user, day)
      // (Partitioning.zorder scaladoc): the multi-dimensional clustering
      // key a lakehouse sorts files by so zone maps prune on either
      // filter dimension.
      val e = EventTime.readMicros(s, s"$dir/events.parquet")
      e.filter(col("ts").isNotNull && col("user_id").isNotNull)
        .select(col("event_id"),
          (col("user_id") % 65536).as("x"),
          floor(col("ts") / EventTime.DayMicros).cast("long").as("y"))
        .withColumn("zvalue", Partitioning.zorder(col("x"), col("y")))
    }),

    "threshold_opt" -> ((s, dir) => {
      // Exact best-F1 cutoff for the quality classifier
      // (Classifier.bestF1Threshold scaladoc): suffix-sum sweep over the
      // distinct-score table, conservative tie-break.
      val docs = t(s, dir, "documents")
      val feats = TextAnalysis.qualityFrame(docs, "text", "doc_id")
        .select(col("doc_id"), col("mean_token_len"), col("punct_ratio"),
          col("stopword_ratio"))
        .join(docs.select(col("doc_id"),
          when(col("lang") === "en", 1.0).otherwise(0.0).as("label")), "doc_id")
      Classifier.bestF1Threshold(
        Classifier.fitScoreLogistic(feats,
          Seq("mean_token_len", "punct_ratio", "stopword_ratio"), "label",
          iterations = 2, lr = 1.0),
        "prob", "label")
    }),

    "stored_queries" -> ((s, dir) =>
      // Percolation / reverse search (Search.percolate scaladoc): a
      // broadcast registry of conjunctive saved searches counted against
      // every document's token set.
      Search.percolate(t(s, dir, "documents"), "text", "doc_id", Seq(
        ("q_join_perf", Seq("join", "fast")),
        ("q_scan_table", Seq("scan", "table")),
        ("q_spark_window", Seq("spark", "window")),
        ("q_sort_merge", Seq("sort", "merge")),
        ("q_hash_key_value", Seq("hash", "key", "value"))))),

    "stored_queries_indexed" -> ((s, dir) => {
      // The SCALE regime of stored_queries (Search.percolateIndexed
      // scaladoc): DataFrame registry, rarest-term inverted-index
      // prefilter, same forall verify. Deliberately shares
      // stored_queries' oracle — row-identity with the broadcast regime
      // IS the claim (the bm25_merged_stats posture).
      import s.implicits._
      val reg = Seq(
        ("q_join_perf", Seq("join", "fast")),
        ("q_scan_table", Seq("scan", "table")),
        ("q_spark_window", Seq("spark", "window")),
        ("q_sort_merge", Seq("sort", "merge")),
        ("q_hash_key_value", Seq("hash", "key", "value")))
        .toDF("query_id", "terms")
      Search.percolateIndexed(t(s, dir, "documents"), "text", "doc_id", reg)
    }),

    "sitemap_parse" -> ((s, dir) => {
      // Sitemap-protocol parse (Sitemap scaladoc): each source group's
      // docs become ONE real <urlset> — locs whose query strings need the
      // &amp; entity, lastmod/priority derived per doc — and a
      // namespace-PREFIXED <sm:sitemapindex> pointer rides through the
      // same parser, pinning local-name matching, entity decode, and the
      // urlset/index split. The oracle reconstructs every field directly
      // from the documents table.
      val docs = t(s, dir, "documents")
      val entryXml = concat(
        lit("<url><loc>https://ex.org/d?id="), col("doc_id"),
        lit("&amp;s="), col("source"),
        lit("</loc><lastmod>2024-01-"),
        lpad(((col("doc_id") % 27) + 1).cast("string"), 2, "0"),
        lit("</lastmod><changefreq>daily</changefreq><priority>0."),
        (col("doc_id") % 10).cast("string"),
        lit("</priority></url>"))
      val grouped = docs.groupBy(col("source"))
        .agg(concat_ws("", collect_list(entryXml)).as("body"))
      val parse = udf((src: String, body: String) => {
        val urlset = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
          "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
          body + "</urlset>"
        val index = "<?xml version=\"1.0\"?>" +
          "<sm:sitemapindex xmlns:sm=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
          s"<sm:sitemap><sm:loc>https://ex.org/sm/$src.xml</sm:loc>" +
          "<sm:lastmod>2024-02-01</sm:lastmod></sm:sitemap></sm:sitemapindex>"
        (graft.sources.Sitemap.parse(urlset) ++ graft.sources.Sitemap.parse(index))
          .map(e => (e.loc, e.lastmod, e.changefreq, e.priority, e.fromIndex))
      })
      grouped
        .select(col("source"), explode(parse(col("source"), col("body"))).as("e"))
        .select(col("source"), col("e._1").as("loc"), col("e._2").as("lastmod"),
          col("e._3").as("changefreq"), col("e._4").as("priority"),
          col("e._5").as("from_index"))
    }),

    "crawl_frontier" -> ((s, dir) => {
      // COMPOSED crawl-frontier build in ONE lineage — the real web-source
      // preparation pipeline: sitemap XML (per source group, entities +
      // uppercase authority + :443 + tracking params + fragments) → real
      // Sitemap.parse → canonicalizeUrl (each URL also appears as its
      // pre-canonicalized twin, so the distinct() provably collapses the
      // tracking variants) → longest-prefix robots gate over planted
      // per-host rulesets ('/'‑allow everywhere, '/sec1/' deny on h%3==0
      // hosts, '/sec1/p' re-allow on h%6==0 — longest match + allow
      // tie-break live). The oracle reconstructs every row closed-form.
      val docs = t(s, dir, "documents")
      val entryXml = concat(
        lit("<url><loc>HTTPS://WWW.SITE"), col("doc_id") % 10,
        lit(".EXAMPLE.COM:443/sec"), col("doc_id") % 3,
        lit("/p"), col("doc_id"),
        lit("/?utm_source=mail&amp;id="), col("doc_id"), lit("#frag</loc></url>"),
        lit("<url><loc>https://www.site"), col("doc_id") % 10,
        lit(".example.com/sec"), col("doc_id") % 3, lit("/p"), col("doc_id"),
        lit("?id="), col("doc_id"), lit("</loc></url>"))
      val grouped = docs.groupBy(col("source"))
        .agg(concat_ws("", collect_list(entryXml)).as("body"))
      val parseLocs = udf((body: String) =>
        graft.sources.Sitemap.parse(
          "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
            body + "</urlset>").map(_.loc))
      val urls = grouped
        .select(explode(parseLocs(col("body"))).as("loc"))
        .select(graft.functions.UrlFunctions.canonicalizeUrl(col("loc")).as("canonical"))
        .distinct()
        .select(col("canonical"),
          graft.functions.UrlFunctions.urlHost(col("canonical")).as("host"),
          regexp_replace(col("canonical"), "^https://[^/]+", "").as("path"))
      import s.implicits._
      val rules = (0 to 9).flatMap { h =>
        val host = s"www.site$h.example.com"
        Seq((host, "/", true)) ++
          (if (h % 3 == 0) Seq((host, "/sec1/", false)) else Nil) ++
          (if (h % 6 == 0) Seq((host, "/sec1/p", true)) else Nil)
      }.toDF("host", "rule", "allow")
      CurationRules.robotsCheck(urls, "host", "path", "canonical",
        broadcast(rules), "host", "rule", "allow")
    }),

    "robots_check" -> ((s, dir) => {
      // Longest-prefix robots.txt evaluation over the planted crawl URLs
      // (CurationRules.robotsCheck scaladoc). Host identity is
      // base % 20 (host = f(base%10, base%4)); rulesets: '/' allow
      // everywhere, '/path/' deny on h%3==0 hosts, '/path/1' re-allow on
      // h%6==0 hosts — exercising longest-match and the allow tie-break.
      val d = t(s, dir, "documents")
      val base = col("doc_id") % 100
      val urls = d.select(col("doc_id"), plantedHost.as("host"),
        concat(lit("/path/"), base.cast("string")).as("path"))
      val hs = d.select((base % 20).as("h")).distinct()
      def hostOfH = concat(lit("www.site"), (col("h") % 10).cast("string"),
        lit(".example."),
        element_at(array(lit("com"), lit("co.uk"), lit("org"), lit("com.au")),
          (col("h") % 4 + 1).cast("int")))
      val rules = hs.select(hostOfH.as("rhost"), lit("/").as("rule"),
          lit(true).as("allow"))
        .unionByName(hs.filter(col("h") % 3 === 0)
          .select(hostOfH.as("rhost"), lit("/path/").as("rule"),
            lit(false).as("allow")))
        .unionByName(hs.filter(col("h") % 6 === 0)
          .select(hostOfH.as("rhost"), lit("/path/1").as("rule"),
            lit(true).as("allow")))
      CurationRules.robotsCheck(urls, "host", "path", "doc_id",
        rules, "rhost", "rule", "allow")
    }),

    "mutual_knn" -> ((s, dir) =>
      // Mutual top-5 cosine pairs (Similarity.mutualKnnPairs scaladoc):
      // the hubness-proof near-dup candidate filter. vec_id < 2500 fences
      // the exact-regime all-pairs cost at driver SF bumps (the
      // ssjoin_prefix discipline).
      Similarity.mutualKnnPairs(
        spread(t(s, dir, "embeddings").filter(col("vec_id") < 1250)), k = 5)),

    "decay_scores" -> ((s, dir) =>
      // Recency-decayed per-user activity, 7-day half-life
      // (EventAnalytics.decayedActivity scaladoc): sorted left-to-right
      // pow-of-2 folds.
      EventAnalytics.decayedActivity(
        EventTime.readMicros(s, s"$dir/events.parquet"),
        "user_id", "ts")),

    "conformal_threshold" -> ((s, dir) => {
      // Split-conformal wrapper on the quality classifier
      // (Classifier.conformalThreshold scaladoc): exact rank-selected
      // 90% nonconformity quantile on the even split, holdout coverage
      // on the odd split.
      val docs = t(s, dir, "documents")
      val feats = TextAnalysis.qualityFrame(docs, "text", "doc_id")
        .select(col("doc_id"), col("mean_token_len"), col("punct_ratio"),
          col("stopword_ratio"))
        .join(docs.select(col("doc_id"),
          when(col("lang") === "en", 1.0).otherwise(0.0).as("label")), "doc_id")
      val scored = Classifier.fitScoreLogistic(feats,
        Seq("mean_token_len", "punct_ratio", "stopword_ratio"), "label",
        iterations = 2, lr = 1.0)
      Classifier.conformalThreshold(scored, "doc_id", "prob", "label",
        calCol = col("doc_id") % 2 === 0)
    }),

    "feature_attribution" -> ((s, dir) => {
      // Per-document linear attribution against the corpus-mean baseline
      // (Classifier.featureAttribution scaladoc): which signal drove the
      // score, decided on the emitted rounded values.
      val docs = t(s, dir, "documents")
      // localCheckpoint: the fit's gradient cache AND the attribution pass
      // both consume this regex-heavy frame (the fitScoreLogistic r16
      // pattern) — materialize it once, bit-identical rows.
      val feats = TextAnalysis.qualityFrame(docs, "text", "doc_id")
        .select(col("doc_id"), col("mean_token_len"), col("punct_ratio"),
          col("stopword_ratio"))
        .join(docs.select(col("doc_id"),
          when(col("lang") === "en", 1.0).otherwise(0.0).as("label")), "doc_id")
        .localCheckpoint()
      val w = Classifier.fitLogistic(feats,
        Seq("mean_token_len", "punct_ratio", "stopword_ratio"), "label",
        iterations = 2, lr = 1.0)
      Classifier.featureAttribution(feats, "doc_id",
        Seq("mean_token_len", "punct_ratio", "stopword_ratio"), w)
    }),

    "sorted_neighborhood" -> ((s, dir) =>
      // Sorted-neighborhood blocking over the planted surnames
      // (EditDistance.sortedNeighborhoodPairs scaladoc): the sliding
      // window catches families a hard block key splits; same doc_id
      // fence as the other linkage gates.
      EditDistance.sortedNeighborhoodPairs(
        t(s, dir, "documents").filter(col("doc_id") < 1000)
          .select(col("doc_id"), plantedSurname.as("name")),
        "doc_id", "name", window = 3, minSim = 0.85)),

    "spearman_corr" -> ((s, dir) => {
      // Rank (Spearman) correlation per event type between the JSON k
      // and the value — monotone association where Pearson sees only
      // linear; min-rank ties (rank()) are deterministic on both engines.
      val e = t(s, dir, "events")
      val base = e.select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        round(col("value") * 100, 0).cast("long").as("cents"))
        .filter(col("event_type").isNotNull && col("k").isNotNull &&
          col("cents").isNotNull)
      val rx = Window.partitionBy(col("event_type")).orderBy(col("k"))
      val ry = Window.partitionBy(col("event_type")).orderBy(col("cents"))
      Profile.pearsonByGroup(
        base.withColumn("rk", rank().over(rx).cast("long"))
          .withColumn("rc", rank().over(ry).cast("long")),
        "event_type", "rk", "rc")
        .filter(col("group") =!= "<pooled>")
    }),

    "activity_heatmap" -> ((s, dir) => {
      // Day-of-week x hour activity matrix over exact event time — the
      // operational heat view; dow 0 = Sunday via the epoch-Thursday +4
      // shift, share one exact division.
      val e = EventTime.readMicros(s, s"$dir/events.parquet")
      val cells = e.filter(col("ts").isNotNull)
        .groupBy(
          ((floor(col("ts") / EventTime.DayMicros) + 4) % 7).cast("long")
            .as("dow"),
          (floor(col("ts") / EventTime.HourMicros) % 24).cast("long")
            .as("hour"))
        .agg(count(lit(1)).as("n"))
      val tot = cells.agg(sum(col("n")).as("__t"))
      cells.crossJoin(broadcast(tot))
        .select(col("dow"), col("hour"), col("n"),
          round(col("n").cast("double") / col("__t"), 6).as("share"))
    }),

    "quantile_diff" -> ((s, dir) => {
      // Decile-by-decile shift between the even/odd event-id halves
      // (Profile.quantileDiff scaladoc): exact rank-selected cents.
      val e = t(s, dir, "events")
        .select(col("event_id"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      Profile.quantileDiff(e.filter(col("event_id") % 2 === 0),
        e.filter(col("event_id") % 2 === 1), "cents", "event_id")
    }),

    "target_encoding" -> ((s, dir) =>
      // Leave-one-out target encoding with additive smoothing
      // (Classifier.targetEncodeLoo scaladoc): exact rational rewrite,
      // one division per row.
      Classifier.targetEncodeLoo(
        t(s, dir, "events").select(col("event_id"), col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_id", "event_type", "cents")),

    "funnel_latency" -> ((s, dir) =>
      // click -> purchase time-to-convert (EventAnalytics.funnelLatency
      // scaladoc): exact rank-selected median and p90, no interpolation.
      EventAnalytics.funnelLatency(
        EventTime.readMicros(s, s"$dir/events.parquet"),
        "user_id", "event_type", "ts", "click", "purchase")),

    "chisq_independence" -> ((s, dir) =>
      // Chi-square independence of lang x source
      // (Profile.chiSquareIndependence scaladoc): per-cell terms + the
      // boundary-safe rounded total and dof.
      Profile.chiSquareIndependence(t(s, dir, "documents"), "lang",
        "source")),

    "group_correlation" -> ((s, dir) => {
      // Exact per-group + pooled Pearson between the JSON k attribute and
      // the event value (Profile.pearsonByGroup scaladoc) — the
      // Simpson's-paradox audit view, integer cents x integer k.
      val e = t(s, dir, "events")
      Profile.pearsonByGroup(
        e.select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "k", "cents")
    }),

    "signal_corr" -> ((s, dir) => {
      // Pairwise exact Pearson between the quality signals (micro-unit
      // lift of the 6-dp frame) — which curation signals are redundant?
      val q = TextAnalysis.qualityFrame(t(s, dir, "documents"), "text",
        "doc_id")
      def m(c: String) = round(col(c) * 1e6, 0).cast("long")
      val pairs = Seq(
        ("mean_token_len~punct_ratio", "mean_token_len", "punct_ratio"),
        ("mean_token_len~stopword_ratio", "mean_token_len", "stopword_ratio"),
        ("mean_token_len~quality", "mean_token_len", "quality"),
        ("punct_ratio~stopword_ratio", "punct_ratio", "stopword_ratio"),
        ("punct_ratio~quality", "punct_ratio", "quality"),
        ("stopword_ratio~quality", "stopword_ratio", "quality"))
      val stacked = pairs.map { case (lbl, a, b) =>
        q.select(lit(lbl).as("pair"), m(a).as("x"), m(b).as("y")) }
        .reduce(_ unionByName _)
      Profile.pearsonByGroup(stacked, "pair", "x", "y")
        .filter(col("group") =!= "<pooled>")
    }),

    "kwic_snippets" -> ((s, dir) =>
      // Keyword-in-context concordance for 'spark'
      // (TextAnalysis.kwic scaladoc): one row per occurrence, 3-token
      // context, edge-clipped.
      TextAnalysis.kwic(t(s, dir, "documents"), "text", "doc_id", "spark")),

    "trend_theilsen" -> ((s, dir) =>
      // Theil-Sen robust daily-count trend per event type
      // (EventAnalytics.theilSenTrend scaladoc): lower median of rounded
      // pairwise slopes under a total order.
      EventAnalytics.theilSenTrend(
        EventTime.readMicros(s, s"$dir/events.parquet"),
        "event_type", "ts")),

    "novelty_rate" -> ((s, dir) =>
      // First-seen novelty decomposition per day
      // (EventAnalytics.noveltyRate scaladoc).
      EventAnalytics.noveltyRate(
        EventTime.readMicros(s, s"$dir/events.parquet"),
        "user_id", "ts")),

    "cdc_apply" -> ((s, dir) =>
      // MERGE-INTO change-log collapse (StateStore.cdcApply scaladoc):
      // last op per user wins, 'error' events are deletes, resurrection
      // flagged.
      StateStore.cdcApply(
        EventTime.readMicros(s, s"$dir/events.parquet"),
        "user_id", "ts", "event_id", "value",
        deleteCol = col("event_type") === "error")),

    "journey_trigrams" -> ((s, dir) =>
      // Top-20 three-step user journeys
      // (EventAnalytics.journeyTrigrams scaladoc).
      EventAnalytics.journeyTrigrams(
        EventTime.readMicros(s, s"$dir/events.parquet"),
        "user_id", "event_type", "ts", "event_id")),

    "embed_drift" -> ((s, dir) => {
      // First-moment embedding drift between the even/odd halves
      // (Drift.embeddingDrift scaladoc): mean-vector cosine + norm ratio
      // from exact micro-unit dimension sums.
      val e = t(s, dir, "embeddings")
      Drift.embeddingDrift(e.filter(col("vec_id") % 2 === 0),
        e.filter(col("vec_id") % 2 === 1))
    }),

    "json_props_stats" -> ((s, dir) =>
      // Schema-on-read promotion of the semi-structured props column:
      // extract $.k per event, typed stats per event_type — the JSON
      // attribute surface (get_json_object == DuckDB json_extract), all
      // exact integers.
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("__k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("__k").isNotNull.cast("long")).as("n_k"),
          min(col("__k")).as("k_min"), max(col("__k")).as("k_max"),
          sum(col("__k")).as("k_sum"))),

    "cooc_window" -> ((s, dir) =>
      // Skip-window co-occurrence PMI, window 2
      // (LangModel.windowedCooccurrence scaladoc) — the embedding-training
      // context statistic beside the adjacent-bigram collocations gate.
      LangModel.windowedCooccurrence(t(s, dir, "documents"), "text",
        "doc_id")),

    "negative_sampling" -> ((s, dir) =>
      // word2vec count^(3/4) negative-sampling distribution
      // (LangModel.negativeSamplingDist scaladoc).
      LangModel.negativeSamplingDist(t(s, dir, "documents"), "text")),

    "fd_audit" -> ((s, dir) =>
      // Functional-dependency audit (Profile.functionalDependency
      // scaladoc): a natural-key FD that holds on the dimension table and
      // two denormalized columns that genuinely violate.
      Seq(
        Profile.functionalDependency(t(s, dir, "nation"), "n_name",
          "n_regionkey", "nation.n_name->n_regionkey"),
        Profile.functionalDependency(t(s, dir, "customer"), "c_nationkey",
          "c_mktsegment", "customer.c_nationkey->c_mktsegment"),
        Profile.functionalDependency(t(s, dir, "documents"), "source",
          "lang", "documents.source->lang"))
        .reduce(_ unionByName _)),

    "domain_tree" -> ((s, dir) =>
      // Reversed-label domain hierarchy rollup over the planted crawl
      // hosts (Profile.domainTree scaladoc).
      Profile.domainTree(
        t(s, dir, "documents").select(plantedHost.as("host")), "host")),

    "hamming_rerank_recall" -> ((s, dir) => {
      // The binarize->shortlist->rerank recipe audited end to end
      // (Similarity.hammingRerankRecall scaladoc): recall@5 of a
      // 20-candidate Hamming shortlist reranked by exact cosine.
      val e = t(s, dir, "embeddings")
      Similarity.hammingRerankRecall(e.filter(col("vec_id") < 20), e,
        shortlist = 20, k = 5)
    }),

    "rolling_7d" -> ((s, dir) =>
      // Trailing 7-day rolling aggregates per event type
      // (EventAnalytics.rollingDaily scaladoc): RANGE-framed on day
      // number so gap days age out; integer-cent value sums.
      EventAnalytics.rollingDaily(
        EventTime.readMicros(s, s"$dir/events.parquet"),
        "event_type", "ts", "value")),

    "ewma_daily" -> ((s, dir) =>
      // Exponentially-weighted daily-count baseline per event type
      // (EventAnalytics.ewmaDaily scaladoc): independent left-to-right
      // prefix folds, alpha = 0.3.
      EventAnalytics.ewmaDaily(
        EventTime.readMicros(s, s"$dir/events.parquet"),
        "event_type", "ts")),

    "rollup_revenue" -> ((s, dir) => {
      // Hierarchical revenue report via ROLLUP(region, nation) — the
      // grouping-sets surface: leaf rows, per-region subtotals, and the
      // grand total in one aggregate pass.
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(sum(col("l_extendedprice").cast(dec) *
            (lit(1) - col("l_discount").cast(dec)))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .select(coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("revenue"), col("n_items"))
    }),

    "q8_market_share" -> ((s, dir) => {
      // TPC-H Q8-flavor deep star join: per order year, each supplier
      // nation's share of ASIA-customer revenue on small parts — 7 tables,
      // every dimension broadcast, exact-decimal revenue, one division
      // for the share.
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem"); val sup = t(s, dir, "supplier")
      val p = broadcast(t(s, dir, "part").filter(col("p_size") < 15)
        .select(col("p_partkey")))
      val nCust = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("__cnk"), col("n_regionkey")))
      val r = broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA"))
      val nSupp = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("__snk"), col("n_name").as("supp_nation")))
      val rev = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(p, l("l_partkey") === p("p_partkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(nCust, c("c_nationkey") === col("__cnk"))
        .join(r, col("n_regionkey") === r("r_regionkey"))
        .join(nSupp, sup("s_nationkey") === col("__snk"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"),
          col("supp_nation"))
        .agg(sum(col("l_extendedprice").cast(dec) *
          (lit(1) - col("l_discount").cast(dec))).as("__revd"))
      val totals = rev.groupBy(col("o_year"))
        .agg(sum(col("__revd")).as("__totd"))
      rev.join(broadcast(totals), "o_year")
        .select(col("o_year"), col("supp_nation"),
          col("__revd").cast("double").as("revenue"),
          round(col("__revd").cast("double") / col("__totd").cast("double"), 6)
            .as("share"))
    }),

    "embed_binarize" -> ((s, dir) =>
      // 1-bit sign quantization packed into 32-dim words
      // (Similarity.binarize scaladoc): 64 dims -> two BIGINTs, exact by
      // construction.
      Similarity.binarize(t(s, dir, "embeddings"))
        .select(col("id").as("vec_id"),
          element_at(col("words"), 1).as("bits_w0"),
          element_at(col("words"), 2).as("bits_w1"), col("n_pos"))),

    "hamming_topk" -> ((s, dir) => {
      // Pure-integer top-5 by Hamming distance over the binarized codes
      // (Similarity.hammingTopK scaladoc) — the shortlist stage of the
      // binarize-then-rerank recipe.
      val codes = Similarity.binarize(t(s, dir, "embeddings"))
      Similarity.hammingTopK(codes.filter(col("id") < 20), codes, k = 5)
    }),

    "hamming_topk_blocked" -> ((s, dir) => {
      // The SCALE regime of hamming_topk (Similarity.hammingTopKBlocked
      // scaladoc): pigeonhole bands over the packed code words,
      // (band, bits) hash-join candidates, exact XOR/popcount re-rank —
      // no cross join anywhere. Full self-search at 8-bit bands (the
      // fixture's planted near-dup embeddings collide; 16-bit bands
      // yield a vacuous 0-candidate run for ids < 20). The band replay
      // is pure integer arithmetic, so the oracle is full.
      val codes = Similarity.binarize(t(s, dir, "embeddings"))
      Similarity.hammingTopKBlocked(codes, codes, k = 5, bandBits = 8)
    }),

    "hamming_banded_recall" -> ((s, dir) => {
      // Measured recall@5 of the banded Hamming regime vs the exact scan
      // (Similarity.hammingBandedRecall scaladoc) — the number that says
      // whether 8-bit bands are safe at this k, in the
      // dedup_simhash_eval posture.
      val codes = Similarity.binarize(t(s, dir, "embeddings"))
      Similarity.hammingBandedRecall(codes.filter(col("id") < 20), codes,
        k = 5, bandBits = 8)
    }),

    "truncation_recall" -> ((s, dir) => {
      // Matryoshka prefix-truncation audit (Similarity.truncationRecall
      // scaladoc): recall@5 of the 16-dim-prefix top-k vs the full
      // 64-dim top-k — the zero-preprocessing 4x compression axis,
      // completing the jl_distortion / hamming_rerank_recall family.
      val e = t(s, dir, "embeddings")
      Similarity.truncationRecall(e.filter(col("vec_id") < 20), e,
        k = 5, dim = 16)
    }),

    "sq8_recall" -> ((s, dir) => {
      // Int8 symmetric scalar quantization audit (Similarity.sq8Recall
      // scaladoc): recall@5 of the quantized-cosine top-k vs the full
      // top-k — the vector-DB-default 4x memory cut, measured against
      // the other three compression axes.
      val e = t(s, dir, "embeddings")
      Similarity.sq8Recall(e.filter(col("vec_id") < 20), e, k = 5)
    }),

    "ivf_pq_recall" -> ((s, dir) => {
      // Recall audit for the COMPOSED IVF-PQ path (Similarity.ivfPqRecall
      // scaladoc): recall@5 of the deployed index shape — 8 coarse cells,
      // nProbe=2, 4x8 PQ codebooks over unit vectors, ADC ranking — vs
      // the exact cosine top-5. The last ANN family whose composition had
      // no measured recall number (components are gated individually by
      // similarity_ivf* / pq_*). The index comes from the per-session
      // STORED artifact (ivfPqArtifact): train once, audit many.
      val e = t(s, dir, "embeddings")
      Similarity.ivfPqRecall(e.filter(col("vec_id") < 20), e, k = 5,
        prebuilt = Some(ivfPqArtifact(s, dir, "base", e, m = 4, kCodes = 8)))
    }),

    "ivf_pq_rerank_recall" -> ((s, dir) => {
      // The IVF-PQ DEPLOYMENT RECIPE (Similarity.ivfPqRerankRecall
      // scaladoc): ADC shortlist-20 per query (compressed scan), exact
      // cosine rerank to 5 — what shortlist depth buys back from the raw
      // ADC ranking measured by ivf_pq_recall. Reads the SAME stored
      // artifact as ivf_pq_recall — two audits of one deployed index.
      val e = t(s, dir, "embeddings")
      Similarity.ivfPqRerankRecall(e.filter(col("vec_id") < 20), e,
        shortlist = 20, k = 5,
        prebuilt = Some(ivfPqArtifact(s, dir, "base", e, m = 4, kCodes = 8)))
    }),

    "ivf_pq_production_recall" -> ((s, dir) => {
      // The PRODUCTION-BUDGET IVF-PQ point (r12 verdict #2): the gate-size
      // code budget (m=4, kCodes=8 = 12 bits/vector) is deliberately tiny
      // so the full training replay stays oracle-tractable, and SCALE.md's
      // "m=8, kCodes=256 is where IVF-PQ earns its keep" was itself
      // folklore until measured. This gate measures the recipe at a real
      // deployment budget — m=8 byte-aligned subspace codes, kCodes=64
      // (6 bits used of each byte), ADC shortlist 20, exact rerank to 5 —
      // with the SAME full training replay (8 codebooks x 64 codes).
      // The production-budget index is a stored artifact too (shared
      // with dataset_card_storage's seventh arm).
      val e = t(s, dir, "embeddings")
      Similarity.ivfPqRerankRecall(e.filter(col("vec_id") < 20), e,
        shortlist = 20, k = 5, m = 8, kCodes = 64,
        prebuilt = Some(ivfPqArtifact(s, dir, "base", e, m = 8, kCodes = 64)))
    }),

    "ivf_pq_nprobe_sweep" -> ((s, dir) => {
      // Multi-probe settlement of IVF-PQ vs the 1-bit tier at equal
      // memory (r13 verdict #5): recall@5 of the PRODUCTION-budget rerank
      // recipe (m=8/kCodes=64, shortlist 20) at nProbe = 2 and 4 over the
      // SAME stored artifact. nProbe is a query-time knob — the sweep
      // audits one deployed index twice, it never retrains — so the
      // marginal cost of each probe point is one more ADC panel, which is
      // exactly the economics a serving tier tunes nProbe under.
      val e = t(s, dir, "embeddings")
      val art = ivfPqArtifact(s, dir, "base", e, m = 8, kCodes = 64)
      // One union plan, deliberately NOT unionOverlapped (r16 probe,
      // reverted): the probe points share the exact arm and the encoded
      // scan, which AQE computes once via ReusedExchange in the single
      // plan; overlapped jobs recomputed the shared subtrees and measured
      // SLOWER (2.4 -> 4.9 s at sf0.1).
      Seq(2, 4).map { np =>
        Similarity.ivfPqRerankRecall(e.filter(col("vec_id") < 20), e,
            shortlist = 20, k = 5, m = 8, kCodes = 64, nProbe = np,
            prebuilt = Some(art))
          .select(lit(np).as("n_probe"), col("qid"), col("n_hit"),
            col("recall"))
      }.reduce(_.unionByName(_))
    }),

    "jl_recall" -> ((s, dir) => {
      // Recall formulation of the JL random-projection axis
      // (Similarity.jlRecall scaladoc): recall@5 of the 64->16 projected
      // cosine top-k vs the full top-k — jl_distortion bounds pairwise
      // distances, this measures what a search stack actually loses.
      val e = t(s, dir, "embeddings")
      Similarity.jlRecall(e.filter(col("vec_id") < 20), e, k = 5)
    }),

    "compression_tradeoff" -> ((s, dir) => {
      // The compression DECISION TABLE (Similarity.compressionTradeoff
      // scaladoc): one row per measured axis (sq8 / jl / truncation /
      // 1-bit+rerank / ivf-pq) with byte-aligned memory ratio and mean
      // recall@5 — the dataset-card artifact the five audits feed, and
      // the proof they compose in one plan. The IVF-PQ arms read the
      // session's stored m=4 artifact instead of retraining in-lineage.
      val e = t(s, dir, "embeddings")
      Similarity.compressionTradeoff(e.filter(col("vec_id") < 20), e, k = 5,
        prebuiltIvfPq = Some(ivfPqArtifact(s, dir, "base", e, 4, 8)))
    }),

    "compression_tradeoff_clustered" -> ((s, dir) => {
      // The decision table on the CLUSTERED fixture
      // (Similarity.clusteredFixture scaladoc): the base embeddings table
      // is isotropic random — the worst case for JL/truncation/PQ — so
      // the card's six recall numbers are re-measured on a deterministic
      // anisotropic variant (75% pull toward 8 sign centroids) to show
      // which rankings are fixture artifacts and which are structural.
      // The fixture is PINNED (eager localCheckpoint, 500 rows): the six
      // arms reference it ~18 times, and without the pin each reference
      // re-runs the parquet scan + transform. Its IVF-PQ index is its own
      // stored artifact (variant "clustered" — a different corpus version
      // is a different registry key).
      val e = Similarity.clusteredFixture(t(s, dir, "embeddings"))
        .localCheckpoint(true)
      Similarity.compressionTradeoff(e.filter(col("vec_id") < 20), e, k = 5,
        prebuiltIvfPq = Some(ivfPqArtifact(s, dir, "clustered", e, 4, 8)))
    }),

    "pq_rotation_tradeoff" -> ((s, dir) => {
      // Rotation-before-PQ ablation (Similarity.pqRotationTradeoff
      // scaladoc) on the AXIS-CONCENTRATED spectrum fixture — the
      // decaying-eigenvalue regime real text embeddings live in, where an
      // m=4 split wastes three codebooks on near-zero variance. The
      // orthonormal pre-rotation (zero memory cost) is measured against
      // the plain index at the same budget: 0.09 -> 0.35 recall@5 at
      // sf0.01. The fixture is PINNED (eager localCheckpoint) like the
      // clustered twin — both arms reference it across panel branches and
      // training rounds.
      val e = Similarity.spectrumFixture(t(s, dir, "embeddings"))
        .localCheckpoint(true)
      // Both arms read per-session stored indexes (the train-once /
      // audit-many lifecycle): "spectrum" and its rotated twin are
      // distinct corpus variants in the artifact registry.
      Similarity.pqRotationTradeoff(e.filter(col("vec_id") < 20), e, k = 5,
        prebuilt = Some(ivfPqArtifact(s, dir, "spectrum", e, 4, 8)),
        prebuiltRotated = Some(ivfPqArtifact(s, dir, "spectrum_rotated",
          Similarity.rotatedTwin(e), 4, 8)))
    }),

    "pq_opq_refined" -> ((s, dir) => {
      // FULL OPQ — the Ge et al. rotation<->codebook ALTERNATION
      // (Similarity.opqRefinedRotation scaladoc; the parametric
      // eigen-allocation as init) measured at the SAME budget, panel, and
      // fixture as pq_rotation_tradeoff's arms, so its row unions into
      // the same decision table (axis ivf_pq_m4_opq). Both the learned
      // rotation and the index over the rotated corpus are cross-session
      // registry artifacts: the alternation trains once per corpus
      // version, every later session loads. The per-round Procrustes SVD
      // is driver-side iterative math no SQL engine replays — but its
      // OUTPUT is a deterministic stored artifact, so opqRefinedOracle
      // inlines the loaded d x d matrix as literal CTEs and DuckDB
      // replays the entire rotated-corpus recall body value-for-value
      // (full oracle; only the training itself stays driver-side).
      val e = Similarity.spectrumFixture(t(s, dir, "embeddings"))
        .localCheckpoint(true)
      val rot = opqRotationArtifact(s, dir, "spectrum", e, 4, 8)
      val eOpq = e.withColumn("embedding",
        graft.functions.VectorFunctions.rotatedVector(col("embedding"), rot))
        .localCheckpoint(true)
      Similarity.pqDecisionRow("ivf_pq_m4_opq", 64.0, k = 5,
        Similarity.ivfPqRecall(eOpq.filter(col("vec_id") < 20), eOpq, k = 5,
          prebuilt = Some(ivfPqArtifact(s, dir, "spectrum_opq", eOpq, 4, 8))))
    }),

    "event_transitions" -> ((s, dir) =>
      // First-order Markov transition matrix over user event streams
      // (EventAnalytics.transitionMatrix scaladoc): consecutive-pair
      // counts + row-stochastic probabilities.
      EventAnalytics.transitionMatrix(
        EventTime.readMicros(s, s"$dir/events.parquet"),
        "user_id", "event_type", "ts", "event_id")),

    "unigram_vocab" -> ((s, dir) =>
      // Unigram-LM tokenizer vocabulary (UnigramLm.trainVocab scaladoc):
      // all single chars + top-40 substrings, integer micro-nat costs.
      graft.functions.UnigramLm.trainVocab(t(s, dir, "documents"), "text")),

    "unigram_segment" -> ((s, dir) => {
      // Viterbi segmentation of every distinct corpus word under the
      // trained vocab (UnigramLm scaladoc) — the combined cost*16+1
      // metric makes optimum value AND piece count one integer DP; the
      // pieces string itself is spec-pinned (SQL backtracking adds
      // nothing the metric doesn't already certify).
      val d = t(s, dir, "documents")
      graft.functions.UnigramLm
        .segment(d, "text", graft.functions.UnigramLm.trainVocab(d, "text"))
        .drop("pieces")
    }),

    "symspell_match" -> ((s, dir) =>
      // SymSpell deletion-variant fuzzy match over the planted surnames
      // (EditDistance.symspellPairs scaladoc): equi-join on variant keys,
      // exact levenshtein verify; the brute-force oracle proves every
      // distance-<=1 pair is found.
      // Same doc_id < 1000 fence as dedup_jaro: the exact-dup families
      // make the OUTPUT quadratic in family size.
      EditDistance.symspellPairs(
        t(s, dir, "documents").filter(col("doc_id") < 1000)
          .select(col("doc_id"), plantedSurname.as("name")),
        "doc_id", "name")),

    "itemset_pairs" -> ((s, dir) =>
      // Frequent event-type pairs per user basket with confidence + lift
      // (EventAnalytics.itemsetPairs scaladoc): domain-bounded pair join,
      // exact-integer rule stats.
      EventAnalytics.itemsetPairs(t(s, dir, "events"), "user_id",
        "event_type")),

    "twap_events" -> ((s, dir) =>
      // Time-weighted average per (type, day)
      // (EventAnalytics.timeWeightedAverage scaladoc): holding-time
      // weights in exact micros, values in integer cents, one division.
      EventAnalytics.timeWeightedAverage(
        EventTime.readMicros(s, s"$dir/events.parquet"),
        "event_type", "ts", "value", "event_id")),

    "hard_negatives" -> ((s, dir) => {
      // Contrastive-training data mining (Search.hardNegatives scaladoc):
      // per query, top-5 same-corpus items from OTHER label groups + the
      // margin over the query's best same-label hit. Exact cross-join
      // baseline like eval_hitrate -> fully oracle-checked.
      val e = t(s, dir, "embeddings")
      val qs = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          col("label").as("qlabel"))
      Search.hardNegatives(qs, e, 5, qGroupCol = "qlabel")
    }),

    "hard_negatives_blocked" -> ((s, dir) => {
      // Scale regime of hard_negatives: banded candidates; the margin
      // baseline is the best positive AMONG CANDIDATES (the production
      // behavior — see Search.hardNegativesBlocked scaladoc). Full oracle
      // via the sign-matrix replay.
      val e = t(s, dir, "embeddings")
      val qs = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          col("label").as("qlabel"))
      Search.hardNegativesBlocked(qs, e, 5, qGroupCol = "qlabel")
    }),

    "mmr_rerank" -> ((s, dir) => {
      // Diversity-aware re-ranking (Search.mmrRerank scaladoc): top-10
      // cosine candidates per query greedily cut to 5 by MMR at
      // lambda=0.7. Deterministic greedy over 6-dp-rounded scores -> full
      // oracle (unrolled selection steps in SQL).
      val e = t(s, dir, "embeddings")
      val qs = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      Search.mmrRerank(qs, e, n = 10, k = 5, lambda = 0.7)
    }),

    "eval_hitrate_blocked" -> ((s, dir) => {
      // Scale path of eval_hitrate: LSH-banded candidate generation instead
      // of the |Q| x |N| cross join. FULL oracle since r9: the hyperplane
      // sign matrix is a compile-time constant, so the oracle replays the
      // banding itself (planesSql scaladoc) — the gate is checked in its
      // real approximate regime, not a proxy.
      val d = t(s, dir, "documents")
      val e = t(s, dir, "embeddings")
      val corpus = d.join(e, d("doc_id") === e("vec_id"))
        .select(col("vec_id"), col("embedding"), col("source"))
      val queries = corpus.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("source").as("expected_source"))
      // LEFT join from the question side (r10 review fix): a question the
      // banding surfaces NO candidates for must still count in the
      // denominator as a miss, or hit_rate inflates exactly when recall
      // fails.
      val cand = Similarity.blockedTopKPerQuery(queries, corpus, 5,
          qidCol = "qid", qvecCol = "qv")
        .filter(col("vec_id") =!= col("qid"))
        .join(corpus.select(col("vec_id"), col("source")), "vec_id")
        .select(col("qid"), col("vec_id"), col("source"))
      val topk = queries.select(col("qid"), col("expected_source"))
        .join(cand, Seq("qid"), "left")
      Search.hitRate(topk, "qid", "source", "expected_source")
    }),

    "eval_mrr_blocked" -> ((s, dir) => {
      // Scale path of eval_mrr: banded candidates (self excluded BEFORE
      // ranking so 1/rank means rank among real results), identical MRR
      // aggregate. Full oracle via the sign-matrix replay.
      val d = t(s, dir, "documents")
      val e = t(s, dir, "embeddings")
      val corpus = d.join(e, d("doc_id") === e("vec_id"))
        .select(col("vec_id"), col("embedding"), col("source"))
      val queries = corpus.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("source").as("expected_source"))
      // Candidate-less questions stay in the denominator (left join from
      // the question side — the r10 review fix, as eval_hitrate_blocked).
      val cand = Similarity.blockedTopKPerQuery(queries, corpus, 5,
          qidCol = "qid", qvecCol = "qv", excludeSelf = true)
        .join(corpus.select(col("vec_id"), col("source")), "vec_id")
        .select(col("qid"), col("vec_id"), col("source"), col("rank"))
      val topk = queries.select(col("qid"), col("expected_source"))
        .join(cand, Seq("qid"), "left")
      Search.mrr(topk, "qid", "source", "expected_source", rankCol = "rank")
    }),

    "eval_ndcg_blocked" -> ((s, dir) => {
      // Scale path of eval_ndcg: banded candidates, honest per-query ideal
      // from the corpus-wide relevant count (same totals join as the exact
      // gate). Full oracle via the sign-matrix replay.
      val d = t(s, dir, "documents")
      val e = t(s, dir, "embeddings")
      val corpus = d.join(e, d("doc_id") === e("vec_id"))
        .select(col("vec_id"), col("embedding"), col("source"))
      val queries = corpus.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("source").as("expected_source"))
      // Same left-join-from-questions shape as the other blocked eval
      // gates (r10 review fix): zero-candidate questions score 0, not
      // absent.
      val cand = Similarity.blockedTopKPerQuery(queries, corpus, 5,
          qidCol = "qid", qvecCol = "qv", excludeSelf = true)
        .join(corpus.select(col("vec_id"), col("source")), "vec_id")
        .select(col("qid"), col("vec_id"), col("source"), col("rank"))
      val topk = queries.select(col("qid"), col("expected_source"))
        .join(cand, Seq("qid"), "left")
      val bySource = corpus.groupBy(col("source").as("rel_source")).count()
      val totals = queries.join(broadcast(bySource),
          col("expected_source") === col("rel_source"))
        .select(col("qid"), (col("count") - 1).as("n_relevant"))
      Search.ndcg(topk, "qid", "source", "expected_source", rankCol = "rank",
        k = 5, relevantTotals = totals)
    }),

    "mutual_knn_blocked" -> ((s, dir) =>
      // Scale regime of mutual_knn (Similarity.mutualKnnPairsBlocked
      // scaladoc): banded candidates, identical rank + mutual join — and
      // NO corpus fence, because nothing here is quadratic. Full oracle
      // via the sign-matrix replay.
      Similarity.mutualKnnPairsBlocked(t(s, dir, "embeddings"), k = 5)),

    "outlier_knn_blocked" -> ((s, dir) => {
      // Scale regime of outlier_knn: k-th distance WITHIN the banded
      // candidate set (upper-biased — banding can only drop neighbors).
      // Full oracle via the sign-matrix replay.
      val e = t(s, dir, "embeddings")
      Similarity.kthNeighborDistanceBlocked(
        e.filter(col("vec_id") < 50), e, k = 5)
    }),

    "bitext_margin_blocked" -> ((s, dir) => {
      // Scale regime of bitext_margin: ONE banded join supplies the
      // candidate pairs and both neighborhood views; identical integer
      // margin algebra. Full oracle via the sign-matrix replay.
      val e = t(s, dir, "embeddings")
      Similarity.marginBitextBlocked(
        e.filter(col("vec_id") % 2 === 0),
        e.filter(col("vec_id") % 2 === 1), knn = 4)
    }),

    "mmr_rerank_blocked" -> ((s, dir) => {
      // Scale regime of mmr_rerank: banded candidate generation, identical
      // top-10 cut, pairwise sims, and greedy selection. Full oracle via
      // the sign-matrix replay + the same unrolled greedy steps.
      val e = t(s, dir, "embeddings")
      val qs = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      Search.mmrRerankBlocked(qs, e, n = 10, k = 5, lambda = 0.7)
    }),

    // -----------------------------------------------------------------------
    // Dedup extensions
    // -----------------------------------------------------------------------
    "dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(t(s, dir, "documents"), "text", "doc_id")),

    "dedup_editdist" -> ((s, dir) =>
      // Character-level near-dup verifier (EditDistance.pairs scaladoc):
      // block on the 24-char normalized head, exact Levenshtein on the
      // first 400 chars, keep pairs within 20% edit ratio — catches the
      // small in-place edits the token-set family only bounds.
      EditDistance.pairs(t(s, dir, "documents"), "doc_id", "text")),

    "corpus_overlap" -> ((s, dir) => {
      // Corpus-level contamination screen (Dedup.corpusOverlap scaladoc):
      // exact distinct-3-gram overlap between the even- and odd-id corpus
      // halves — sizes, intersection, Jaccard, containment. 1 row, full
      // oracle; the KMV sketch scale path is pinned by DedupSpec.
      val d = t(s, dir, "documents")
      Dedup.corpusOverlap(d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 === 1), "text")
    }),

    "dedup_ngram_jaccard" -> ((s, dir) => {
      // Exact word-3-gram Jaccard kernel over consecutive-id pairs (linear,
      // deterministic; the LSH variant below handles the quadratic case).
      val sh = t(s, dir, "documents")
        .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      val a = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
      val b = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
      a.join(b, col("id_b") === col("id_a") + 1)
        .select(col("id_a"), col("id_b"),
          round(Dedup.jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
    }),

    "dedup_cross_corpus" -> ((s, dir) => {
      // Cross-corpus dedup: a synthetic "new crawl" (every 5th document,
      // lightly perturbed, re-keyed) joined ONLY against the reference
      // corpus — each new doc should match exactly its original. Full
      // oracle (r7): the verified output equals the brute-force cross
      // join at the threshold, which DuckDB recomputes with list functions.
      val ref = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val incoming = ref.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" freshly crawled tail")).as("text"))
      Dedup.crossCorpusPairs(incoming, ref, "text", "doc_id",
          maxJaccardDistance = 0.5)
        .select(col("id_new"), col("id_ref"), round(col("jaccard_dist"), 6).as("jaccard_dist"))
    }),

    "dedup_components" -> ((s, dir) => {
      // Duplicate-cluster closure over a deterministic planted pair graph
      // (chains of consecutive ids at %7<3, skip-links at %11==0 — the
      // structure the pair generators emit, minus their non-ANSI hashing):
      // every node resolves to the min id reachable through the graph.
      val ids = t(s, dir, "documents").select(col("doc_id"))
      val e1 = ids.filter(col("doc_id") % 7 < 3)
        .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
      val e2 = ids.filter(col("doc_id") % 11 === 0)
        .select(col("doc_id").as("src"), (col("doc_id") + 3).as("dst"))
      val edges = e1.union(e2)
        .join(ids.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
      Components.connectedComponents(edges, "src", "dst")
        .select(col("id").as("doc_id"), col("component"))
    }),

    "url_canonicalize" -> ((s, dir) => {
      // Crawl-URL normalization over deterministically planted raw URLs
      // (mixed case, default + exotic ports, tracking params, fragments,
      // trailing slashes, two-level public suffixes) — canonical form +
      // registered domain, both pure RE2-safe expression chains
      // (functions/UrlFunctions) the oracle replays.
      import graft.functions.UrlFunctions
      val d = col("doc_id").cast("string")
      val url = concat(
        lit("HTTPS://WWW.Site"), (col("doc_id") % 50).cast("string"),
        lit(".Example."),
        element_at(array(lit("com"), lit("co.uk"), lit("org"), lit("com.au")),
          (col("doc_id") % 4 + 1).cast("int")),
        when(col("doc_id") % 3 === 0, lit(":443"))
          .when(col("doc_id") % 3 === 1, lit(":8080")).otherwise(lit("")),
        lit("/Path/"), d,
        when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
        lit("?utm_source=feed&id="), d, lit("&utm_campaign=x"),
        when(col("doc_id") % 5 === 0, concat(lit("#frag"), d)).otherwise(lit("")))
      t(s, dir, "documents").select(col("doc_id"), url.as("url"))
        .select(col("doc_id"),
          UrlFunctions.canonicalizeUrl(col("url")).as("url_canonical"),
          UrlFunctions.registeredDomain(col("url")).as("registered_domain"))
    }),

    "url_dedup" -> ((s, dir) => {
      // Crawl-frontier dedup: 5 raw variants per canonical URL (case, the
      // https default port, trailing slash, tracking params, fragments all
      // vary with doc_id; everything canonical varies only with
      // base = doc_id % 100) — urlDedupGroups must collapse 500 raws into
      // 100 canonical groups of 5 with keep_id = base.
      Dedup.urlDedupGroups(
        t(s, dir, "documents").select(col("doc_id"), plantedCrawlUrl.as("url")),
        "url", "doc_id")
    }),

    "domain_profile" -> ((s, dir) => {
      // Per-registered-domain curation stats over the same planted crawl
      // URLs: doc count, distinct canonical pages, decimal-exact mean
      // quality — the aggregation a per-domain cap / mixing pass keys on.
      import graft.functions.UrlFunctions
      t(s, dir, "documents")
        .select(UrlFunctions.registeredDomain(plantedCrawlUrl).as("domain"),
          UrlFunctions.canonicalizeUrl(plantedCrawlUrl).as("u"),
          TextAnalysis.qualityScore(col("text")).as("q"))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("u")).as("n_pages"),
          round(sum(col("q").cast("decimal(18,6)")).cast("double") /
            count(lit(1)), 6).as("mean_quality"))
    }),

    "soft_dedup_weights" -> ((s, dir) => {
      // Soft dedup (keep everything, weight clusters down): over the same
      // planted pair graph as `dedup_components`; at alpha=1 each cluster's
      // total weight is exactly 1.0 and singletons keep weight 1.0.
      val ids = t(s, dir, "documents").select(col("doc_id"))
      val e1 = ids.filter(col("doc_id") % 7 < 3)
        .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
      val e2 = ids.filter(col("doc_id") % 11 === 0)
        .select(col("doc_id").as("src"), (col("doc_id") + 3).as("dst"))
      val edges = e1.union(e2)
        .join(ids.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
      val comps = Components.connectedComponents(edges, "src", "dst")
      Components.softDedupWeights(ids, "doc_id", comps, alpha = 1.0)
        .select(col("doc_id"), round(col("weight"), 6).as("weight"))
    }),

    "leakage_safe_split" -> ((s, dir) => {
      // Train/val/test split that never lets a duplicate cluster straddle
      // splits (Sampling.splitByComponent scaladoc) — clusters come from
      // the same deterministic planted pair graph as `dedup_components`.
      val ids = t(s, dir, "documents").select(col("doc_id"))
      val e1 = ids.filter(col("doc_id") % 7 < 3)
        .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
      val e2 = ids.filter(col("doc_id") % 11 === 0)
        .select(col("doc_id").as("src"), (col("doc_id") + 3).as("dst"))
      val edges = e1.union(e2)
        .join(ids.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
      val comps = Components.connectedComponents(edges, "src", "dst")
      Sampling.splitByComponent(t(s, dir, "documents").select(col("doc_id")),
        "doc_id", comps, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    }),

    "link_pagerank" -> ((s, dir) => {
      // Link-graph centrality (3 fixed iterations of unnormalized PageRank)
      // over the same deterministic planted graph as `dedup_components`.
      val ids = t(s, dir, "documents").select(col("doc_id"))
      val e1 = ids.filter(col("doc_id") % 7 < 3)
        .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
      val e2 = ids.filter(col("doc_id") % 11 === 0)
        .select(col("doc_id").as("src"), (col("doc_id") + 3).as("dst"))
      val edges = e1.union(e2)
        .join(ids.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
      PageRank.ranks(edges, "src", "dst", iterations = 3)
        .select(col("id").as("doc_id"), col("pagerank"))
    }),

    "link_hits" -> ((s, dir) => {
      // HITS hubs/authorities (PageRank.hits scaladoc) over the same
      // planted link graph as link_pagerank — 4 max-normalized iterations,
      // fully deterministic -> full oracle.
      val ids = t(s, dir, "documents").select(col("doc_id"))
      val e1 = ids.filter(col("doc_id") % 7 < 3)
        .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
      val e2 = ids.filter(col("doc_id") % 11 === 0)
        .select(col("doc_id").as("src"), (col("doc_id") + 3).as("dst"))
      val edges = e1.union(e2)
        .join(ids.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
      PageRank.hits(edges, "src", "dst", iterations = 4)
        .select(col("id").as("doc_id"), col("hub"), col("authority"))
    }),

    "label_propagation" -> ((s, dir) => {
      // Semi-supervised majority-vote label spread (LabelProp.propagate
      // scaladoc) over the planted link graph: every 13th doc seeds class
      // doc_id % 5; 3 synchronous rounds with deterministic min-label
      // ties. The cheap-corpus-annotation pattern — label a sliver,
      // propagate along the graph.
      val ids = t(s, dir, "documents").select(col("doc_id"))
      val e1 = ids.filter(col("doc_id") % 7 < 3)
        .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
      val e2 = ids.filter(col("doc_id") % 11 === 0)
        .select(col("doc_id").as("src"), (col("doc_id") + 3).as("dst"))
      val edges = e1.union(e2)
        .join(ids.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
      val seeds = ids.filter(col("doc_id") % 13 === 0)
        .select(col("doc_id"), (col("doc_id") % 5).as("class_label"))
      LabelProp.propagate(edges, seeds, "src", "dst", "doc_id",
          "class_label", rounds = 3)
        .select(col("id").as("doc_id"), col("label"), col("seeded"))
    }),

    "hll_union_audit" -> ((s, dir) =>
      // Mergeable-sketch cardinality audit (SketchAudit.hllUnionAudit
      // scaladoc): per (returnflag, ship-month) DataSketches HLL sketches
      // unioned per flag, estimate vs exact countDistinct(l_orderkey)
      // pinned inside the 5% tolerance (~3 standard errors at lgK=12).
      SketchAudit.hllUnionAudit(t(s, dir, "lineitem"), "l_returnflag",
        date_trunc("month", col("l_shipdate")), "l_orderkey")),

    "percentile_sketch_audit" -> ((s, dir) =>
      // Quantile-sketch rank-error audit (SketchAudit.percentileSketchAudit
      // scaladoc): approx_percentile's GK guarantee checked against the
      // actual rank of its answer, exact interpolated percentile alongside.
      SketchAudit.percentileSketchAudit(
        EventTime.readMicros(s, s"$dir/events.parquet"),
        "event_type", "value", Seq(0.5, 0.9, 0.99), accuracy = 1000)),

    "decontamination" -> ((s, dir) => {
      // Eval-set decontamination: docs sharing any 13-gram (GPT-3 appendix-C
      // n) with the synthetic "benchmark" (every 97th document) get flagged
      // — which catches those docs themselves plus their exact/near copies.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val evalSet = docs.filter(col("doc_id") % 97 === 0).select(col("text").as("prompt"))
      Dedup.contaminationFlags(docs, evalSet, "text", "doc_id", "prompt", n = 13)
    }),

    "decontamination_bloom" -> ((s, dir) => {
      // The 100 TB path of the same decontamination: Bloom-filter prefilter
      // (broadcast ~10 bits/gram) + shuffle-join exact verify of survivors.
      // Must produce row-identical output to `decontamination`.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val evalSet = docs.filter(col("doc_id") % 97 === 0).select(col("text").as("prompt"))
      Dedup.contaminationFlagsBloom(docs, evalSet, "text", "doc_id", "prompt", n = 13)
    }),

    "contamination_fraction" -> ((s, dir) => {
      // Overlap-fraction decontamination (Dedup.contaminationFraction):
      // the PaLM/Llama-style dirty-doc criterion over the same planted
      // benchmark as `decontamination` — the eval docs themselves land at
      // fraction 1.0, near-copies high, everything else 0.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val evalSet = docs.filter(col("doc_id") % 97 === 0).select(col("text").as("prompt"))
      Dedup.contaminationFraction(docs, evalSet, "text", "doc_id", "prompt",
        n = 13, dirtyThreshold = 0.2)
    }),

    "dup_span_density" -> ((s, dir) => {
      // Span-level duplication density (distinct 13-gram windows shared
      // with any other doc) over the corpus plus planted %7 copies — the
      // duplicated docs light up near density 1.0, the rest stay low.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text"))
      Dedup.duplicationDensity(docs.unionByName(planted), "text", "doc_id")
    }),

    "span_dedup_spans" -> ((s, dir) => {
      // Exact-substring dedup, span table: merged token ranges to remove
      // (duplicated 20-token windows minus their first occurrence) over the
      // corpus plus planted %7 tail-extended copies.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text"))
      SpanDedup.duplicateSpans(docs.unionByName(planted), "text", "doc_id", w = 20)
    }),

    "span_dedup_clean" -> ((s, dir) => {
      // Exact-substring dedup, applied: cleaned text + removed-token counts
      // for the same corpus (planted copies collapse to their unique tail).
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text"))
      SpanDedup.removeDuplicateSpans(docs.unionByName(planted), "text", "doc_id", w = 20)
    }),

    "minhash_plan" -> ((s, dir) =>
      // LSH tuning report (Dedup.lshPlan scaladoc): the S-curve of every
      // band split of a 128-perm signature + the split recommended for a
      // 0.8 Jaccard target. Closed-form probabilities -> full oracle.
      Dedup.lshPlan(s, numPerms = 128, targetJaccard = 0.8)),

    "hyperplane_plan" -> ((s, dir) =>
      // Banding planner for the cosine/hyperplane family — the minhash_plan
      // analogue for bandedCandidatePairs (Similarity.hyperplanePlan
      // scaladoc): per band split of the 16-plane signature, recall
      // S-curves at cos 0.5/0.7/0.8/0.9 plus the isotropic candidate
      // fraction; recommends the most selective split keeping recall at
      // cos 0.8 >= 0.95. Closed form -> full oracle.
      Similarity.hyperplanePlan(s, numPlanes = 16, minRecall = 0.95)),

    "dedup_minhash_lsh" -> ((s, dir) => {
      // MinHash+LSH near-dup candidates over a corpus with planted
      // near-duplicates (original + token-appended copy). Full oracle (r7):
      // the exact-Jaccard-verified output equals the brute-force all-pairs
      // set at the threshold, recomputed by DuckDB.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text"))
      Dedup.minhashLshPairs(docs.unionByName(planted), "text", "doc_id",
        maxJaccardDistance = 0.5)
        .select(col("id_a"), col("id_b"))
    }),

    "minhash_lsh_eval" -> ((s, dir) => {
      // Recall audit of the banded path against exact inverted-index truth
      // (Dedup.lshRecallAudit scaladoc) over the same planted corpus as
      // dedup_minhash_lsh; the oracle recomputes n_truth and pins
      // recall = 1.0, so a banding regression that drops a true pair
      // surfaces as a metric, not just a diff.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text"))
      Dedup.lshRecallAudit(docs.unionByName(planted), "text", "doc_id",
        maxJaccardDistance = 0.5)
    }),

    "dedup_simhash" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text"))
      Dedup.simhashPairs(docs.unionByName(planted), "text", "doc_id", maxHamming = 12)
    }),

    "dedup_simhash_eval" -> ((s, dir) => {
      // Banding-honesty audit (the minhash_lsh_eval discipline): truth =
      // exact brute-force hamming <= 12 over the fingerprints, found =
      // what the 4x16 quarter banding surfaces. Pigeonhole guarantees the
      // <= 3 regime; this MEASURES the probabilistic tail's recall. Full
      // oracle via the same packed-quarters replay as dedup_simhash.
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text"))
      val docs = base.unionByName(planted)
      val h = Dedup.simhash(docs, "text").select(col("doc_id"), col("simhash"))
      val truth = h.select(col("doc_id").as("id_a"), col("simhash").as("ha"))
        .join(h.select(col("doc_id").as("id_b"), col("simhash").as("hb")),
          col("id_a") < col("id_b"))
        .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= 12)
      val found = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 12)
        .select(col("id_a"), col("id_b"), lit(1L).as("__f"))
      truth.join(found, Seq("id_a", "id_b"), "left")
        .agg(count(lit(1)).as("n_truth"),
          coalesce(sum(col("__f")), lit(0L)).cast("long").as("n_found"),
          (count(lit(1)) - coalesce(sum(col("__f")), lit(0L)))
            .cast("long").as("n_missed"),
          round(coalesce(sum(col("__f")), lit(0L)).cast("double") /
            count(lit(1)), 6).as("recall"))
    }),

    "neardup_cosine" -> ((s, dir) =>
      // Embedding-cosine near-dup, blocked on `label` to bound the join.
      Dedup.cosinePairs(
          t(s, dir, "embeddings"), "embedding", "vec_id", "label", minCosine = -2.0)
        .withColumn("cosine", round(col("cosine"), 6))
        .filter(col("cosine") >= 0.2)),

    // -----------------------------------------------------------------------
    // Similarity-search extensions (scale tiers of Q1)
    // -----------------------------------------------------------------------
    "similarity_lsh" -> ((s, dir) => {
      // Bucketed random-projection LSH (E2LSH scheme) on the in-house
      // replayable Rademacher directions (lshTopK scaladoc): FULL oracle
      // since r10 — the projection matrix is the same compile-time
      // hyperplaneSign family the banded gates inline, so the oracle
      // replays bucketing, candidate filter, and the exact L2 re-rank in
      // the gate's real approximate regime (was †-MLlib before).
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select("embedding").collect()(0).getSeq[Float](0).toArray
      Similarity.lshTopK(e, q, 10).select(col("vec_id"), round(col("dist"), 6).as("dist"))
    }),

    "jl_distortion" -> ((s, dir) => {
      // JL random-projection audit (Similarity.jlProject scaladoc): for
      // every pair among the first 12 vectors, squared distance in the
      // original 64-dim space vs the projected 16-dim space, plus the
      // distortion ratio — the measured number behind "reduce 4x before
      // the ANN index". Full oracle via the shared inline plane table.
      val e = t(s, dir, "embeddings").filter(col("vec_id") < 12)
      val p = Similarity.jlProject(e, "embedding", inDim = 64, outDim = 16)
      val a = p.select(col("vec_id").as("id_a"), col("embedding").as("va"),
        col("embedding_jl").as("pa"))
      val b = p.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
        col("embedding_jl").as("pb"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(VectorFunctions.l2DistanceSq(col("va"), col("vb")), 6)
            .as("d2_orig"),
          round(VectorFunctions.l2DistanceSq(col("pa"), col("pb")), 6)
            .as("d2_proj"))
        .withColumn("ratio",
          when(col("d2_orig") > 0, round(col("d2_proj") / col("d2_orig"), 6)))
    }),

    "similarity_ivf" -> ((s, dir) => {
      // FULL oracle since r10 (was the last †): ivfIndex trains in
      // integer micro-units (its scaladoc), so the ivfSql oracle replays
      // the whole k-means training + assignment + 2-cell probe in the
      // gate's real approximate regime.
      // r16: the coarse quantizer warm-loads from the registry's "base"
      // artifact (the ivfPqArtifact family ivf_registry_staleness
      // certifies cell-for-cell equal to a from-scratch training — same
      // corpus, nCells=8, seed 42, and centroids round-trip parquet
      // exactly in micro-units) instead of re-running the 5-round
      // driver k-means per rep; re-assignment is one narrow pass. The
      // oracle still replays the TRAINING from scratch, so a stale or
      // drifted artifact would hash-mismatch here, not pass silently.
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select("embedding").collect()(0).getSeq[Float](0).toArray
      val (_, centroids, _) = ivfPqArtifact(s, dir, "base", e, 4, 8)
      val indexed = Similarity.ivfAssign(e, centroids)
      Similarity.ivfTopK(indexed, centroids, q, 10, nProbe = 2)
        .select(col("vec_id"), round(col("score"), 6).as("score"))
    }),

    "ivf_incremental" -> ((s, dir) => {
      // Incremental index maintenance (Similarity.ivfAssign scaladoc):
      // train the quantizer on the BASE corpus (vec_id % 10 != 3), then
      // cell-assign base + the simulated new crawl batch against the SAME
      // centroids — the daily-crawl path that never retrains. The output
      // cell histogram (n_base, n_new) is the drift report a retrain
      // trigger reads. Full oracle: the shared ivfCtes replay with the
      // training filter, tail = the histogram.
      val e = t(s, dir, "embeddings")
      val base = e.filter(col("vec_id") % 10 =!= 3)
      val (_, centroids) = Similarity.ivfIndex(base, nCells = 8)
      val assigned = Similarity.ivfAssign(
        e.withColumn("is_new", col("vec_id") % 10 === 3), centroids)
      assigned.groupBy(col("cell"))
        .agg(sum(when(!col("is_new"), 1L).otherwise(0L)).as("n_base"),
          sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"))
    }),

    "ivf_registry_staleness" -> ((s, dir) => {
      // Registry staleness probe — the ivfAssign drift report pointed at
      // a STORED artifact: load the registry index, re-assign the live
      // corpus against its loaded centroids (one narrow pass, the
      // daily-batch path), and join the stored codes' per-cell histogram
      // with the fresh one. Equal columns certify the artifact fresh for
      // this corpus; a drifted corpus shows n_fresh moving off n_stored —
      // the retrain trigger a production registry runs on a sampled
      // basis. Under content-addressed fingerprint keying this is
      // defense-in-depth: a drifted corpus cannot even RESOLVE the stale
      // path. Full oracle: the ivfCtes training replay's assign histogram
      // feeds both columns, so the gate only matches if the stored
      // artifact's cells equal a from-scratch training's.
      val e = t(s, dir, "embeddings")
      val (enc, cents, _) = ivfPqArtifact(s, dir, "base", e, 4, 8)
      val stored = enc.groupBy(col("cell")).agg(count(lit(1)).as("n_stored"))
      val fresh = Similarity.ivfAssign(e, cents)
        .groupBy(col("cell")).agg(count(lit(1)).as("n_fresh"))
      stored.join(fresh, Seq("cell"), "full_outer")
        .select(col("cell"),
          coalesce(col("n_stored"), lit(0L)).as("n_stored"),
          coalesce(col("n_fresh"), lit(0L)).as("n_fresh"))
    }),

    "similarity_ivf_exact" -> ((s, dir) => {
      // The SAME IVF code path in its exactness regime: probing every
      // cell (nProbe = nCells) makes the approximate search brute force,
      // promoting it to a full oracle — the production `similarity_ivf`
      // gate keeps the approximate parameters, this one pins the scan +
      // rank machinery itself. Cross-engine stable because the cosine is
      // the shared expression shape (left-to-right summation) both
      // engines evaluate bit-identically.
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select("embedding").collect()(0).getSeq[Float](0).toArray
      val (indexed, centroids) = Similarity.ivfIndex(e, nCells = 8)
      Similarity.ivfTopK(indexed, centroids, q, 10, nProbe = 8)
        .select(col("vec_id"), round(col("score"), 6).as("score"))
    }),

    "similarity_lsh_exact" -> ((s, dir) => {
      // The banded hyperplane-LSH search pinned VALUE-FOR-VALUE: the sign
      // matrix is a compile-time constant of (seed, plane, dim), so the
      // oracle replays the exact banding, candidate join, and ranking —
      // strictly stronger than a full-probe parameterization, because the
      // machinery is checked in its real approximate regime (the
      // `similarity_lsh` euclidean tier replays the same way since r10).
      // Self included: the query vector ranks first at ~1.0, the
      // same convention as similarity_ivf_exact.
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      Similarity.blockedTopKPerQuery(q, e, 10, qidCol = "qid", qvecCol = "qv")
        .select(col("vec_id"), round(col("score"), 6).as("score"))
    }),

    "similarity_prebanded" -> ((s, dir) => {
      // Incremental band-index path (Similarity.bandedSignatures scaladoc):
      // the corpus band table is built once and PERSISTED; the query batch
      // only computes its own signatures and joins the index. Shares
      // similarity_lsh_exact's oracle — row-identity IS the incremental
      // claim (the bm25_merged_stats discipline).
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val index = Similarity.bandedSignatures(e, "vec_id", "embedding")
      Similarity.blockedTopKPerQueryPrebanded(q, index, e, 10,
          qidCol = "qid", qvecCol = "qv")
        .select(col("vec_id"), round(col("score"), 6).as("score"))
    }),

    "similarity_multiprobe" -> ((s, dir) => {
      // Multi-probe banded search at the SELECTIVE split (bandBits=4 —
      // 23% isotropic candidate fraction per hyperplane_plan, vs 90% at
      // the recall-heavy default): 1-bit-flip probes on the query side
      // recover the recall the coarse split gives up (Lv et al. 2007).
      // Full oracle — the sign-matrix replay plus the probe xor.
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      Similarity.blockedTopKPerQuery(q, e, 10, qidCol = "qid", qvecCol = "qv",
          bandBits = 4, multiprobe = true)
        .select(col("vec_id"), round(col("score"), 6).as("score"))
    }),

    // -----------------------------------------------------------------------
    // Text-analysis extensions
    // -----------------------------------------------------------------------
    "lang_id" -> ((s, dir) =>
      TextAnalysis.langIdFrame(t(s, dir, "documents"), "text", "doc_id")),

    "dataset_card" -> ((s, dir) =>
      // The publishable corpus summary (Profile.datasetCard scaladoc):
      // size/emptiness/volume counts, exact-text dup rate, language
      // shares, mean quality — one (metric, value) row each, every value
      // composed from oracle-proven kernels.
      Profile.datasetCard(t(s, dir, "documents"))),

    "dataset_card_storage" -> ((s, dir) => {
      // The card extended with its STORAGE section (r12 verdict #8): the
      // measured compression decision table reshaped into (metric, value)
      // rows — the single release report covering content stats AND the
      // serving-compression menu. The base card stays its own cheap gate;
      // this one pays the decision table's training-audit cost, INCLUDING
      // the opt-in production IVF-PQ arm (m=8/kCodes=64 rerank) — the
      // release report must show the deployable recipe, not just the
      // oracle-toy budget.
      // Both IVF-PQ budgets read the session's stored artifacts (r13
      // verdict #1): the release report audits the deployed indexes, it
      // does not retrain them.
      val e = t(s, dir, "embeddings")
      // materializeArms (r16): the seven audit arms are independent but
      // unioned into one tree they executed as a ~140-stage mostly-
      // sequential chain — the gate's wall tracked stage count
      // (~85 ms/stage), not task work. The flag runs each arm as its own
      // overlapped job and unions the materialized one-row summaries
      // (guide §2.6 + §3.3); per-arm plans and values are unchanged.
      val tr = Similarity.compressionTradeoff(
        e.filter(col("vec_id") < 20), e, k = 5,
        includeProductionIvfPq = true,
        prebuiltIvfPq = Some(ivfPqArtifact(s, dir, "base", e, 4, 8)),
        prebuiltProductionIvfPq =
          Some(ivfPqArtifact(s, dir, "base", e, 8, 64)),
        materializeArms = true)
      Profile.datasetCard(t(s, dir, "documents"), storage = Some(tr))
    }),

    "quality_score" -> ((s, dir) =>
      TextAnalysis.qualityFrame(t(s, dir, "documents"), "text", "doc_id")),

    "token_count" -> ((s, dir) =>
      TextAnalysis.tokenCountFrame(t(s, dir, "documents"), "text", "doc_id")),

    "char_entropy" -> ((s, dir) =>
      // Character-level Shannon entropy (bits/char) — the cheap gibberish /
      // boilerplate curation signal; sorted-distinct fold so the floating
      // sum is order-deterministic and DuckDB-replayable.
      TextAnalysis.entropyFrame(t(s, dir, "documents"), "text", "doc_id")),

    "lexical_diversity" -> ((s, dir) =>
      // Gopher-style unique-word-fraction family: type-token ratio + hapax
      // legomena per document, pure HOFs over the tokenizer contract.
      TextAnalysis.lexicalDiversityFrame(t(s, dir, "documents"), "text", "doc_id")),

    "oov_rate" -> ((s, dir) =>
      // Tokenizer-vocab coverage (TextAnalysis.oovRateFrame scaladoc): the
      // corpus's own top-25 vocabulary, then per-doc out-of-vocabulary
      // token count and rate. The ~40-term fixture vocab makes ~top-25 a
      // real cutoff: every doc carries both in- and out-of-vocab mass.
      TextAnalysis.oovRateFrame(t(s, dir, "documents"), "text", "doc_id",
        vocabSize = 25)),

    "bpe_merge_count" -> ((s, dir) =>
      // Exact BPE token counts under the pinned merge table (functions/Bpe)
      // — the real budgeting unit for the packing operators, vs the regex
      // estimate in `token_count`. Oracle: DuckDB recursive CTE replaying
      // the merge loop (one lowest-rank merge per step) over distinct words.
      t(s, dir, "documents").select(col("doc_id"),
        graft.functions.Bpe.count(col("text")).as("bpe_tokens"))),

    "tokenizer_fertility" -> ((s, dir) =>
      // Per-language tokenizer capacity report (TextAnalysis.fertilityFrame
      // scaladoc): exact-BPE tokens per word and chars per token from the
      // group sums — the sequence-budget planning input for CorpusMix.
      TextAnalysis.fertilityFrame(t(s, dir, "documents"), "lang", "text",
        graft.functions.Bpe.count(col("text")))),

    "wordpiece_stats" -> ((s, dir) =>
      // WordPiece-family greedy longest-match tokenization (Wordpiece
      // scaladoc): top-200 corpus substrings as the vocab, per-doc piece
      // and UNK counts. The oracle replays the greedy walk with a bounded
      // recursive CTE (one longest-match step per recursion level).
      Wordpiece.docStats(t(s, dir, "documents"), "text", "doc_id",
        vocabSize = 200, maxPieceLen = 6)),

    "bpe_train_merges" -> ((s, dir) =>
      // TRAIN a 12-merge BPE table on the corpus (functions/Bpe.trainMerges:
      // most-frequent pair per round, ties to the lexicographically smallest
      // — the deterministic Sennrich learner). Oracle: 12 unrolled DuckDB
      // stages over the word-frequency table, each replaying one
      // pair-count -> argmax -> merge-apply round on delimiter-encoded
      // symbol strings.
      graft.functions.Bpe.trainMerges(t(s, dir, "documents"), "text", 12)),

    "pii_redact" -> ((s, dir) => {
      // PII scrubbing over documents with deterministically planted PII
      // (emails / dotted quads / SSN-shaped ids / phone numbers keyed off
      // doc_id) — redacted text + per-category counts.
      val planted = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" contact admin"), col("doc_id").cast("string"),
          lit("@example.com or 10.0."), (col("doc_id") % 256).cast("string"),
          lit(".7, ssn 123-45-6789, call +1 (415) 555-01"),
          lpad((col("doc_id") % 100).cast("string"), 2, "0")).as("pii_text"))
      TextAnalysis.piiFrame(planted, "pii_text", "doc_id")
    }),

    "class_balance" -> ((s, dir) =>
      // Dataset-card class-balance report (Profile.classBalance scaladoc)
      // over the embeddings labels: majority share + label-order-pinned
      // normalized entropy.
      Profile.classBalance(t(s, dir, "embeddings"), "label")),

    "gini_concentration" -> ((s, dir) =>
      // Corpus concentration: Gini over per-source character mass
      // (Profile.giniConcentration scaladoc) — the one-number diversity
      // audit beside the per-source profile slices.
      Profile.giniConcentration(
        t(s, dir, "documents").groupBy(col("source"))
          .agg(sum(col("n_chars")).as("w")), "w")),

    "fk_orphans" -> ((s, dir) =>
      // Referential-integrity audit (Profile.fkOrphans scaladoc):
      // orders.o_custkey -> customer.c_custkey row/key orphan counts +
      // key coverage — the post-load data-quality staple.
      Profile.fkOrphans(t(s, dir, "orders"), "o_custkey",
        t(s, dir, "customer"), "c_custkey")),

    "script_profile" -> ((s, dir) => {
      // Unicode-script routing profile (TextAnalysis.scriptProfileFrame
      // scaladoc) over text with planted non-Latin runs keyed by doc_id —
      // verifies Java's \p{IsX} and RE2's \p{X} bind the same scripts.
      val planted = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 4 === 0, lit(" привет мир"))
            .when(col("doc_id") % 4 === 1, lit(" 你好世界"))
            .when(col("doc_id") % 4 === 2, lit(" مرحبا بالعالم"))
            .otherwise(lit(""))).as("mixed"))
      TextAnalysis.scriptProfileFrame(planted, "mixed", "doc_id")
    }),

    "k_anonymity" -> ((s, dir) =>
      // Release-side privacy audit (CurationRules.kAnonymity scaladoc):
      // (nation, market-segment) as the quasi-identifier pair over
      // customer, k=10 — groups below k are the re-identification risk.
      CurationRules.kAnonymity(t(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"), k = 10)),

    "repetition_signals" -> ((s, dir) => {
      // Gopher-style repetition rules over documents with planted duplicate
      // lines appended.
      val planted = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit("\nrepeat me\nrepeat me\nunique tail")).as("rep_text"))
      TextAnalysis.repetitionFrame(planted, "rep_text", "doc_id")
    }),

    "doc_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprintFrame(t(s, dir, "documents"), "text", "doc_id")),

    "paragraph_dedup" -> ((s, dir) => {
      // RefinedWeb/C4-style boilerplate removal: a banner paragraph planted
      // into every document recurs corpus-wide and must be stripped from
      // each, while the documents' own paragraphs survive in order.
      val planted = t(s, dir, "documents").select(col("doc_id"),
        concat(lit("Cookie notice: we use cookies\n\n"), col("text")).as("p_text"))
      Paragraphs.removeBoilerplate(planted, "p_text", "doc_id", minRepeats = 5)
    }),

    "data_profile" -> ((s, dir) =>
      // Single-pass profiling report over lineitem's numeric columns
      // (exact-distinct regime so the oracle can mirror it).
      Profile.numeric(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"), exactDistinct = true)),

    "profile_by_lang" -> ((s, dir) =>
      // Stratified profile: the per-language slice report (exact regime).
      Profile.numericBy(t(s, dir, "documents"), "lang",
        Seq("doc_id", "n_chars"), exactDistinct = true)),

    "phrase_search" -> ((s, dir) =>
      // Quoted-query adjacency search (Bm25.phraseMatches scaladoc) for
      // "hash join": ~27 fixture docs contain the bigram, one twice —
      // match count and 1-based first position both exercised.
      Bm25.phraseMatches(spread(t(s, dir, "documents")), "text", "doc_id",
        Seq("hash", "join"))),

    "prf_expansion" -> ((s, dir) =>
      // RM1 pseudo-relevance feedback over the bm25_rank query
      // (Bm25.prfExpansionTerms scaladoc): top-15 expansion terms from the
      // BM25 top-10 feedback docs. Decimal-exact weight sums -> full
      // oracle.
      Bm25.prfExpansionTerms(t(s, dir, "documents"), "text", "doc_id",
        Seq("spark", "join", "window"), topDocs = 10, topTerms = 15)),

    "token_drift" -> ((s, dir) => {
      // Distribution drift between the en and de sub-corpora (Drift
      // scaladoc): JSD over token frequencies plus the vocab/total audit —
      // the frequency-mix complement of lang_similarity's set overlap.
      val docs = t(s, dir, "documents")
      Drift.tokenDistributionDrift(
        docs.filter(col("lang") === "en"),
        docs.filter(col("lang") === "de"), "text")
    }),

    "length_drift" -> ((s, dir) => {
      // KS distance between en and de document-length (token count)
      // distributions — the numeric-feature drift probe beside
      // token_drift's JSD, with the max-gap location as evidence.
      val docs = t(s, dir, "documents")
      def lens(l: String) = docs.filter(col("lang") === l)
        .select(size(TextAnalysis.toks(col("text"))).as("len"))
      Drift.ksDistance(lens("en"), lens("de"), "len")
    }),

    "lang_similarity" -> ((s, dir) => {
      // Pairwise corpus-similarity matrix from per-group KMV sketches
      // (plans.KmvSketchAgg scaladoc): each language reduces to 64 hashes
      // BEFORE any pairing — no pairwise raw-data join at any corpus size.
      // The sketch contents are deterministic (min-k of md5) -> full oracle.
      val sk = t(s, dir, "documents")
        .select(col("lang"), explode(TextAnalysis.toks(col("text"))).as("__t"))
        .select(col("lang"), md5(col("__t")).as("__h"))
        .groupBy(col("lang"))
        .agg(graft.plans.KmvSketchAgg.kmvSketch(col("__h"), 64).as("__sk"))
      val a = sk.select(col("lang").as("lang_a"), col("__sk").as("__ska"))
      val b = sk.select(col("lang").as("lang_b"), col("__sk").as("__skb"))
      a.join(b, col("lang_a") < col("lang_b"))
        .select(col("lang_a"), col("lang_b"),
          graft.plans.KmvSketchAgg.jaccardEstimate(
            col("__ska"), col("__skb"), 64).as("jaccard_est"))
    }),

    "zipf_fit" -> ((s, dir) =>
      // Corpus-health intake QA: OLS fit of ln(freq) on ln(rank) over the
      // vocabulary (Profile.zipfFit scaladoc) — 1 row, full oracle.
      Profile.zipfFit(t(s, dir, "documents"), "text")),

    "shard_manifest" -> ((s, dir) => {
      // Deterministic 16-way shard assignment (hex digit of a salted md5 —
      // the Sampling.shardOf key math) + the per-shard manifest an export
      // job publishes: docs, tokens, id range, language count.
      val d = t(s, dir, "documents")
      d.select(col("doc_id"), col("lang"),
          TextAnalysis.bpeTokens(col("text")).as("__toks"),
          Sampling.shardOf(col("doc_id"), 16, ":shard").as("shard"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("__toks")).cast("long").as("n_tokens"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
          count_distinct(col("lang")).as("n_langs"))
    }),

    "dsir_budget_pack" -> ((s, dir) => {
      // Composition: DSIR importance weights drive the per-language
      // token-budget pack — select the most target-like documents until
      // each language's budget fills (the published DSIR selection with a
      // budget instead of a fraction). One weights plan + one pack window.
      val d = t(s, dir, "documents")
      val w = Dsir.importanceWeights(d, d.filter(col("doc_id") % 5 === 0),
        "text", "doc_id")
      val docs = d.select(col("doc_id"), col("lang"),
          TextAnalysis.bpeTokens(col("text")).as("bpe_tokens"))
        .join(w.select(col("doc_id"), col("log_weight")), "doc_id")
      CorpusMix.packToBudget(docs, "lang", "bpe_tokens",
        budgetPerGroup = 3000,
        orderBy = Seq(col("log_weight").desc, col("doc_id")))
    }),

    "token_budget_pack" -> ((s, dir) => {
      // Corpus mixing: pack each language up to a 5k-token budget in
      // quality order. Single scan (quality + token estimate are narrow
      // expressions), one shuffle for the per-language window.
      val docs = t(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        TextAnalysis.bpeTokens(col("text")).as("bpe_tokens"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      CorpusMix.packToBudget(docs, "lang", "bpe_tokens", budgetPerGroup = 5000,
        orderBy = Seq(col("quality").desc, col("doc_id")))
    }),

    "token_budget_pack_hist" -> ((s, dir) => {
      // The SCALE path of corpus packing: histogram-threshold selection
      // (no corpus sort, broadcast threshold join) — deterministic, so it
      // gets a full oracle, not just the spec parity pin.
      val docs = t(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        TextAnalysis.bpeTokens(col("text")).as("bpe_tokens"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      CorpusMix.packToBudgetHistogram(docs, "lang", "bpe_tokens", "quality",
        budgetPerGroup = 5000, buckets = 100)
    }),

    "temperature_mix" -> ((s, dir) =>
      // T5/mT5 temperature sampling across languages (alpha=0.5 up-weights
      // low-resource langs; CorpusMix.temperatureSample scaladoc). The
      // md5-of-id order makes the in-group draw deterministic + unbiased.
      CorpusMix.temperatureSample(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "lang", alpha = 0.5, budget = 300,
        orderBy = Seq(md5(col("doc_id").cast("string")), col("doc_id")))),

    "corpus_shuffle" -> ((s, dir) =>
      // Deterministic epoch shuffle: 0-based training-order position via
      // the distributed prefix sum (no global window, no rand(seed)).
      Sampling.deterministicShuffle(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        keyCols = Seq("doc_id"), salt = "epoch0")),

    "curriculum_order" -> ((s, dir) =>
      // Easy-to-hard curriculum with round-robin source interleave
      // (Sampling.curriculumOrder scaladoc); difficulty proxy = n_chars.
      // Global position via the distributed prefix sum — no global window.
      Sampling.curriculumOrder(
        t(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars")),
        "source", "n_chars", "doc_id")),

    "padding_waste" -> ((s, dir) => {
      // Length-bucketed batching audit (SequencePack.paddingWasteReport
      // scaladoc): per 64-token bucket, tokens paid for vs tokens carried —
      // the padding-vs-packing decision as a report.
      val docs = t(s, dir, "documents").select(
        col("doc_id"), TextAnalysis.bpeTokens(col("text")).as("bpe_tokens"))
      SequencePack.paddingWasteReport(docs, "bpe_tokens", bucketWidth = 64)
    }),

    "corpus_checksum" -> ((s, dir) =>
      // Order-independent corpus release fingerprint: (n_docs, total
      // chars, sum of per-doc rolling hashes) — equal corpora report equal
      // checksums regardless of partitioning or row order; any added,
      // dropped, or edited doc moves it. The reproducibility stamp for a
      // dataset release manifest.
      Partitioning.ensureParallelism(t(s, dir, "documents"))
        .select(TextAnalysis.rollingHash(col("text")).as("__h"), col("n_chars"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(col("__h")).as("corpus_checksum"))),

    "sequence_pack" -> ((s, dir) => {
      // Concat-and-chunk sequence packing: map every document to its global
      // token offset and 2048-token training-sequence coordinates via the
      // two-pass distributed prefix sum (no global window).
      val docs = t(s, dir, "documents").select(
        col("doc_id"), TextAnalysis.bpeTokens(col("text")).as("bpe_tokens"))
      SequencePack.assignments(docs, "bpe_tokens", seqLen = 2048,
        orderBy = Seq(col("doc_id")))
    }),

    "pack_fragmentation" -> ((s, dir) => {
      // The concat-and-chunk quality report: how many documents span k
      // training sequences (fragmented docs lose coherence at the cut).
      // One aggregate over the assignments — tiny output, any corpus size.
      val docs = t(s, dir, "documents").select(
        col("doc_id"), TextAnalysis.bpeTokens(col("text")).as("bpe_tokens"))
      SequencePack.assignments(docs, "bpe_tokens", seqLen = 2048,
          orderBy = Seq(col("doc_id")))
        .filter(col("bpe_tokens") > 0)
        .groupBy(col("n_seqs"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("bpe_tokens")).cast("long").as("n_tokens"))
    }),

    "sequence_pieces" -> ((s, dir) => {
      // Per-(document × sequence) slices of the packed stream — what a
      // shard writer would emit. Narrow explode over the assignments.
      val docs = t(s, dir, "documents").select(
        col("doc_id"), TextAnalysis.bpeTokens(col("text")).as("bpe_tokens"))
      val assigned = SequencePack.assignments(docs, "bpe_tokens",
        seqLen = 2048, orderBy = Seq(col("doc_id")))
      SequencePack.pieces(assigned, "bpe_tokens", seqLen = 2048, "doc_id")
    }),

    "domain_cap" -> ((s, dir) => {
      // C4/Gopher-style per-domain contribution cap: each source keeps its
      // 10 best documents by quality.
      val docs = t(s, dir, "documents").select(
        col("doc_id"), col("source"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      CorpusMix.capPerGroup(docs, "source", maxPerGroup = 10,
        orderBy = Seq(col("quality").desc, col("doc_id")))
    }),

    "tfidf_terms" -> ((s, dir) =>
      TfIdf.topTerms(t(s, dir, "documents"), "text", "doc_id", k = 3)),

    "winnow_fingerprints" -> ((s, dir) =>
      // MOSS winnowing (Dedup.winnowFingerprints scaladoc): min-hash of
      // each sliding gram window, distinct, digested set-stably. Pure
      // HOF expressions -> full oracle.
      Dedup.winnowFingerprints(t(s, dir, "documents"), "text", "doc_id")),

    "gopher_rules" -> ((s, dir) =>
      // Gopher §A1.1 document-quality rules (CurationRules scaladoc):
      // per-rule metrics + combined pass flag, paper-default thresholds.
      CurationRules.gopherFlags(t(s, dir, "documents"), "text", "doc_id")),

    "code_quality" -> ((s, dir) =>
      // The Stack / StarCoder source-file filters (stackCodeFlags
      // scaladoc): line geometry, alnum fraction, autogen banners, data
      // blobs — planted structure: every 7th doc gains a 150-char data
      // blob line, every 13th an autogen banner, so both detectors and
      // the keep flag flip on real rows.
      CurationRules.stackCodeFlags(
        t(s, dir, "documents").filter(col("text").isNotNull && length(col("text")) > 0)
          .withColumn("text",
            when(col("doc_id") % 13 === 0,
              concat(lit("// This file is auto-generated. Do not edit.\n"), col("text")))
              .when(col("doc_id") % 7 === 0,
                concat(col("text"), lit("\ndata = \""), rpad(lit("QUJD"), 150, "="), lit("\"")))
              .otherwise(col("text"))),
        "text", "doc_id")),

    "c4_clean" -> ((s, dir) =>
      // C4 §2.2 line-level cleaning over a corpus with planted structure:
      // every 3rd doc gains a bulleted/short-line block, every 11th a
      // brace (doc-level drop).
      CurationRules.c4Clean(
        t(s, dir, "documents").withColumn("text",
          when(col("doc_id") % 11 === 0, concat(col("text"), lit(" {code}")))
            .when(col("doc_id") % 3 === 0,
              concat(col("text"), lit(".\nshort line\n- bullet item\nA proper sentence with enough words here.")))
            .otherwise(concat(col("text"), lit(".")))),
        "text", "doc_id")),

    "boilerplate_prefix" -> ((s, dir) => {
      // Template detection by shared document head (sharedPrefixFlags
      // scaladoc): half the docs gain a per-source subscription header, so
      // each source forms one large prefix group; unplanted word-salad
      // prefixes stay unique.
      val docs = t(s, dir, "documents")
      val planted = docs.withColumn("text",
        when(col("doc_id") % 4 < 2,
          concat(lit("Subscribe to "), col("source"), lit(" updates! "), col("text")))
          .otherwise(col("text")))
      CurationRules.sharedPrefixFlags(planted, "text", "doc_id", "source",
        prefixLen = 30, minShared = 3)
    }),

    "blocklist_filter" -> ((s, dir) => {
      // C4 §2.2 bad-word document gate via the broadcast-join scale path
      // (the narrow literal-array path is pinned equal by CurationSpec).
      // 'slow' is corpus-common, 'dup' rare, 'deadlock' absent — the gate
      // exercises hit, miss, and threshold (>2 occurrences) in one run.
      import s.implicits._
      val terms = Seq("slow", "dup", "deadlock").toDF("term")
      CurationRules.blocklistFlagsJoin(t(s, dir, "documents"), "text", "doc_id",
        terms, maxFlagged = 2L)
    }),

    "lm_unigram_score" -> ((s, dir) =>
      // CCNet-style quality signal: self-trained unigram LM, per-doc mean
      // token log-prob + perplexity (LangModel scaladoc). Deterministic
      // weighted-mean formulation -> full oracle.
      LangModel.unigramScore(t(s, dir, "documents"), "text", "doc_id")),

    "ccnet_band" -> ((s, dir) => {
      // CCNet head/middle/tail perplexity banding per language
      // (LangModel.perplexityBands scaladoc) over the self-trained unigram
      // scores — the standard "train on the middle band" curation split.
      val docs = t(s, dir, "documents")
      val scored = LangModel.unigramScore(docs, "text", "doc_id")
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      LangModel.perplexityBands(scored, "doc_id", "lang")
        .select(col("doc_id"), col("lang"), col("perplexity"),
          col("band").cast("long").as("band"), col("band_label"),
          col("keep_middle"))
    }),

    "lm_bigram_score" -> ((s, dir) =>
      // Bigram conditional LM (LangModel.bigramScore): the repetition-
      // sensitive twin of lm_unigram_score. Same weighted-mean trick ->
      // full oracle.
      LangModel.bigramScore(t(s, dir, "documents"), "text", "doc_id")),

    "collocations_pmi" -> ((s, dir) =>
      // Top-50 PMI collocations (LangModel.collocations): the
      // Church–Hanks phrase-mining signal over corpus bigrams, min pair
      // count 5. Deterministic (rounded pmi, w1, w2) total order ->
      // full oracle.
      LangModel.collocations(t(s, dir, "documents"), "text", k = 50)),

    "lm_kneser_ney" -> ((s, dir) =>
      // Interpolated Kneser–Ney bigram LM (LangModel.kneserNeyBigramScore):
      // the absolute-discount + continuation-probability smoothing real
      // CCNet-style filters use. Same weighted-mean trick -> full oracle.
      LangModel.kneserNeyBigramScore(t(s, dir, "documents"), "text", "doc_id")),

    "dsir_weights" -> ((s, dir) => {
      // DSIR data selection (Dsir scaladoc): importance-weight every doc
      // against a trusted target subset (doc_id%5==0 stands in for the
      // in-domain corpus), keep the top quarter. Raw (unhashed) features
      // -> fully oracle-checked, weights AND the exact keep set.
      val d = t(s, dir, "documents")
      val w = Dsir.importanceWeights(d, d.filter(col("doc_id") % 5 === 0),
        "text", "doc_id")
      Dsir.selectTopFraction(w, "doc_id", 0.25)
    }),

    "quality_classifier" -> ((s, dir) => {
      // fastText-style quality filter: train logistic regression on the
      // rounded TextAnalysis quality signals (label: lang == 'en', which
      // genuinely correlates with the English stopword ratio), then score
      // the corpus. Per-iteration weight rounding makes train + score
      // fully oracle-checked (Classifier scaladoc).
      val docs = t(s, dir, "documents")
      val feats = TextAnalysis.qualityFrame(docs, "text", "doc_id")
        .select(col("doc_id"), col("mean_token_len"), col("punct_ratio"),
          col("stopword_ratio"))
        .join(docs.select(col("doc_id"),
          when(col("lang") === "en", 1.0).otherwise(0.0).as("label")), "doc_id")
      Classifier.fitScoreLogistic(feats,
          Seq("mean_token_len", "punct_ratio", "stopword_ratio"), "label",
          iterations = 2, lr = 1.0)
        .select(col("doc_id"), col("label"), col("prob"), col("predicted"))
    }),

    "classifier_auc" -> ((s, dir) => {
      // ROC-AUC of the quality classifier: rank-sum with exact tie
      // handling over the per-distinct-prob distribution (Classifier
      // .aucFrame scaladoc) — the eval metric a filter-threshold decision
      // reads.
      val docs = t(s, dir, "documents")
      val feats = TextAnalysis.qualityFrame(docs, "text", "doc_id")
        .select(col("doc_id"), col("mean_token_len"), col("punct_ratio"),
          col("stopword_ratio"))
        .join(docs.select(col("doc_id"),
          when(col("lang") === "en", 1.0).otherwise(0.0).as("label")), "doc_id")
      Classifier.aucFrame(
        Classifier.fitScoreLogistic(feats,
          Seq("mean_token_len", "punct_ratio", "stopword_ratio"), "label",
          iterations = 2, lr = 1.0),
        "prob", "label")
    }),

    "classifier_calibration" -> ((s, dir) => {
      // Reliability bins of the same quality classifier (Classifier
      // .calibrationFrame scaladoc): per-decile count, decimal-exact mean
      // predicted prob, empirical positive rate, |gap|.
      val docs = t(s, dir, "documents")
      val feats = TextAnalysis.qualityFrame(docs, "text", "doc_id")
        .select(col("doc_id"), col("mean_token_len"), col("punct_ratio"),
          col("stopword_ratio"))
        .join(docs.select(col("doc_id"),
          when(col("lang") === "en", 1.0).otherwise(0.0).as("label")), "doc_id")
      Classifier.calibrationFrame(
        Classifier.fitScoreLogistic(feats,
          Seq("mean_token_len", "punct_ratio", "stopword_ratio"), "label",
          iterations = 2, lr = 1.0),
        "prob", "label")
    }),

    "bm25_rank" -> ((s, dir) =>
      // Lexical retrieval: BM25 scores for a fixed 3-term query over the
      // corpus (k1/b = Lucene defaults). Deterministic formula -> full
      // oracle.
      Bm25.score(t(s, dir, "documents"), "text", "doc_id",
        Seq("spark", "join", "window"))),

    "ql_dirichlet" -> ((s, dir) =>
      // Language-model retrieval baseline (Bm25.dirichletScore scaladoc):
      // Dirichlet-smoothed query likelihood for the SAME 3-term query —
      // rank-equivalent decomposition, one extra 1-row aggregate over
      // BM25's plan, full oracle.
      Bm25.dirichletScore(t(s, dir, "documents"), "text", "doc_id",
        Seq("spark", "join", "window"), mu = 2000.0)),

    // -----------------------------------------------------------------------
    // Chunkers + embed (SURVEY §2.2, §2.3 — not ANSI-SQL-expressible; pinned
    // by ScalaTest goldens instead, per the driver contract)
    // -----------------------------------------------------------------------
    "chunk_recursive" -> ((s, dir) =>
      // FULL oracle since r9: on this single-line, single-spaced fixture
      // the separator cascade resolves to the word level, where the
      // splitter is a greedy prefix-sum merge with a 30-char back-off
      // window — recursiveChunkSql replays it as an unrolled per-chunk
      // CTE chain (the kcenterSql pattern), chunk text recovered as a
      // trimmed substring of the original document.
      Chunkers.recursive(
          t(s, dir, "documents").filter(TextFunctions.nonBlank(col("text"))),
          "text", chunkSize = 150, chunkOverlap = 30)
        .select(col("doc_id"), col("chunk_index").cast("long").as("chunk_index"),
          col("chunk"))),

    "chunk_sentences" -> ((s, dir) =>
      // Sentence-window chunking (Chunkers.sentences scaladoc). Full oracle
      // (r7): the lookbehind split `(?<=[.!?])\s+` is equivalent to the
      // RE2-safe replace `([.!?])\s+ -> \1<SEP>` + split on <SEP>, so
      // DuckDB can replay the whole chunker with list functions.
      Chunkers.sentences(
          t(s, dir, "documents").filter(TextFunctions.nonBlank(col("text"))),
          "text", sentencesPerChunk = 3, overlapSentences = 1)
        .select(col("doc_id"), col("chunk_index"), col("chunk"))),

    "chunk_texttiling" -> ((s, dir) => {
      // Lexical-cohesion topic chunking (Chunkers.textTiling scaladoc).
      // Corpus text has no sentence punctuation, so the gate synthesizes
      // sentences: every 8 words become one period-terminated sentence
      // (the chunk_markdown skeleton trick); the chunker then breaks at
      // every gap whose adjacent-sentence token-set Jaccard < 1/4 —
      // exact integer cross-multiplication, fully replayed by the oracle
      // (sentence split, token sets, boundary flags, chunk assembly).
      val toks = filter(split(col("text"), " "), t => length(t) > 0)
      val ng = floor((size(toks) + 7) / lit(8)).cast("int")
      val syn = concat(array_join(
        transform(sequence(lit(0), ng - 1),
          g => array_join(slice(toks, g * 8 + 1, lit(8)), " ")), ". "), lit("."))
      val docs = t(s, dir, "documents")
        .filter(size(filter(split(col("text"), " "), t => length(t) > 0)) > 0)
        .select(col("doc_id"), syn.as("text"))
      Chunkers.textTiling(docs, "text", cohesionNum = 1, cohesionDen = 4)
        .select(col("doc_id"), col("chunk_index"), col("chunk"))
    }),

    "chunk_markdown" -> ((s, dir) => {
      // Corpus text has no headers; wrap it in a deterministic md skeleton.
      // The headers map is projected to scalar header1..3 columns (the
      // driver's pandas compare can't sort map columns) — which also makes
      // the whole result oracle-expressible: every doc yields exactly the
      // chunks (# Doc N + intro), (## Body + text), (### Notes + tail).
      val md = concat(lit("# Doc "), col("doc_id"), lit("\n\nintro\n\n## Body\n\n"),
        col("text"), lit("\n\n### Notes\n\ntail"))
      Chunkers.markdown(t(s, dir, "documents").withColumn("text", md), "text")
        .select(col("doc_id"), col("chunk_index").cast("long").as("chunk_index"),
          col("chunk"),
          element_at(col("headers"), "Header 1").as("header1"),
          element_at(col("headers"), "Header 2").as("header2"),
          element_at(col("headers"), "Header 3").as("header3"))
    }),

    "chunk_adaptive" -> ((s, dir) => {
      val md = concat(lit("intro\n# A\n"), col("text"), lit("\n# B\ntail\n# C\nend"))
      val mixed = t(s, dir, "documents")
        .withColumn("text", when(col("doc_id") % 5 === 0, md).otherwise(col("text")))
      Chunkers.adaptive(mixed, "text", chunkSize = 150, chunkOverlap = 30)
        .select(col("doc_id"), col("chunk_index").cast("long").as("chunk_index"),
          col("chunk"),
          element_at(col("headers"), "Header 1").as("header1"),
          element_at(col("headers"), "Header 2").as("header2"),
          element_at(col("headers"), "Header 3").as("header3"))
    }),

    "embed_hashing" -> ((s, dir) =>
      // Compared output is a scalar digest (dim + nonzero-ness — both
      // oracle-expressible); the vector VALUES are pinned by EmbedSpec
      // goldens (the hashing projection itself is not ANSI-SQL).
      Embed.hashing(t(s, dir, "documents"), "text", dim = 64)
        .select(col("doc_id"),
          size(col("embedding")).cast("long").as("dim"),
          (VectorFunctions.normSq(col("embedding")) > 0).as("has_embedding"))),

    "embed_quantize" -> ((s, dir) => {
      // int8 symmetric quantization of the embeddings table — per-vector
      // scale, clamped half-up rounding, reconstruction-error metric. All
      // pure double arithmetic with pinned evaluation order, so the full
      // row (not just a digest) hash-matches the oracle.
      // internal name: an output alias `qscale` in the same select would
      // capture col("__qscale") references LATERALLY (Spark resolves
      // sibling aliases first), silently computing the error against the
      // ROUNDED scale.
      val withScale = t(s, dir, "embeddings")
        .withColumn("__qscale", VectorFunctions.int8Scale(col("embedding")))
      withScale
        .withColumn("__q", VectorFunctions.quantizeInt8(col("embedding"), col("__qscale")))
        .select(col("vec_id"),
          round(col("__qscale"), 6).as("qscale"),
          aggregate(col("__q"), lit(0L), (acc, q) => acc + q.cast("long")).as("sum_q"),
          round(VectorFunctions.dequantMeanAbsError(
            col("embedding"), col("__q"), col("__qscale")), 6).as("mean_abs_err"))
    }),

    "embed_mean_pool" -> ((s, dir) =>
      // Chunk-to-document pooling shape: per-dimension mean per group
      // (here the planted label), exploded (group, dim, value) layout.
      Embed.meanPoolExploded(t(s, dir, "embeddings"), "label", "embedding")
        .select(col("label").cast("long").as("label"),
          col("dim").cast("long").as("dim"), col("value"))),

    "dedup_keep_best" -> ((s, dir) => {
      // Quality-aware cluster representative: same planted pair graph as
      // dedup_components, but each duplicate cluster keeps its HIGHEST-
      // quality member (ties -> lowest id) instead of the min id.
      val docs = t(s, dir, "documents")
      val ids = docs.select(col("doc_id"))
      val e1 = ids.filter(col("doc_id") % 7 < 3)
        .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
      val e2 = ids.filter(col("doc_id") % 11 === 0)
        .select(col("doc_id").as("src"), (col("doc_id") + 3).as("dst"))
      val edges = e1.union(e2)
        .join(ids.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
      val comps = Components.connectedComponents(edges, "src", "dst")
      val scored = docs.select(col("doc_id"), col("source"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      Components.keepBest(scored, "doc_id", comps, Seq(col("quality").desc))
    }),

    "embed_project" -> ((s, dir) => {
      // Signed random projection 64 -> 16 (JL/Achlioptas): a codegen'd
      // literal-sign expression chain, no UDF; the oracle embeds the SAME
      // sign literals, so each coordinate is engine-exact (see
      // VectorFunctions.signMatrix).
      val signs = VectorFunctions.signMatrix(dim = 64, outDim = 16)
      val cols = signs.indices.map(j =>
        round(VectorFunctions.projectedCoord(col("embedding"), signs, j), 6)
          .as(f"p$j%02d"))
      t(s, dir, "embeddings").select(col("vec_id") +: cols: _*)
    }),

    "embed_covariance" -> ((s, dir) =>
      // PCA moment pass (Pca scaladoc): upper-triangle covariance of the
      // first 16 embedding coordinates from ONE wide aggregate (no explode,
      // no per-pair shuffle); the eigen/whitening tail is driver-side d x d
      // math pinned by PcaSpec.
      Pca.covarianceFrame(t(s, dir, "embeddings"), "embedding", 16)),

    "kmeans_assign" -> ((s, dir) =>
      // Distributed Lloyd's k-means (KMeans scaladoc): deterministic
      // lowest-id seeds, left-to-right double distances, per-iteration
      // centroid rounding — the full (id, cluster, dist2) row hash-matches
      // the unrolled-CTE oracle.
      KMeans.fitAssign(t(s, dir, "embeddings"), "embedding", "vec_id",
          k = 10, iterations = 2)
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
          col("dist2"))),

    "semantic_dedup" -> ((s, dir) =>
      // SemDeDup: k-means clusters as blocks, then greedy keep-lowest-id
      // within each cluster at cosine >= 0.3 (Dedup.cosinePairs kernel).
      KMeans.semanticDedup(t(s, dir, "embeddings"), "embedding", "vec_id",
          k = 10, iterations = 2, minCosine = 0.3)
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"))),

    "pq_encode" -> ((s, dir) => {
      // Product quantization codes (operators/Pq): 4 subspaces x 16 dims,
      // 8 codes each, codebooks from the deterministic per-subspace
      // KMeans.fit — exploded to (vec_id, subspace, code) scalars. Oracle:
      // the kmeans_assign unrolled-CTE machinery, once per subspace slice.
      val e = t(s, dir, "embeddings")
      val cb = Pq.train(e, "embedding", "vec_id", m = 4, k = 8, iterations = 2)
      Pq.encode(e, "embedding", "vec_id", cb)
        .select(col("vec_id"), posexplode(col("codes")).as(Seq("subspace", "code")))
        .select(col("vec_id"), col("subspace").cast("long").as("subspace"),
          col("code").cast("long").as("code"))
    }),

    "pq_adc_topk" -> ((s, dir) => {
      // ADC search over the PQ codes: the exact query (vec_id 0's vector)
      // builds the m x k distance table driver-side; every corpus row is
      // scored by m lookups + adds in a codegen'd expression, then top-10.
      val e = t(s, dir, "embeddings")
      val cb = Pq.train(e, "embedding", "vec_id", m = 4, k = 8, iterations = 2)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>")).head()
        .getSeq[Double](0).toArray
      Pq.adcTopK(Pq.encode(e, "embedding", "vec_id", cb), cb, q, topK = 10)
    }),

    // -----------------------------------------------------------------------
    // Multimodal extensions (decode is a documented stub; plumbing is real)
    // -----------------------------------------------------------------------
    "multimodal_features" -> ((s, dir) =>
      // Compared output: scalar digests of the feature vector (dim +
      // nonzero-ness); vector values pinned by MultimodalSpec.
      Multimodal.extractFeatures(
          Multimodal.fromText(t(s, dir, "documents"), "text", "doc_id"), dim = 16)
        .select(col("media_id"), col("mime"), col("n_bytes"),
          size(col("features")).cast("long").as("feat_dim"),
          (VectorFunctions.normSq(col("features")) > 0).as("feat_nonzero"))),

    "image_dhash" -> ((s, dir) => {
      // Real end-to-end image pipeline with a FULL oracle: a deterministic
      // 9x8 gray BMP is generated per doc (real 54-byte-header BMP bytes),
      // decoded by real javax.imageio, and dHash'd
      // (Multimodal.dHashBits scaladoc). Because the image is exactly the
      // dHash grid size, sampling is identity and the oracle recomputes
      // the expected bits analytically from the pixel formula — the gate
      // fails if ANY stage (encode, decode, luminance, bit packing) drifts.
      val mk = udf((id: Long) => Multimodal.syntheticBmp(id, 9, 8))
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), mk(col("doc_id")).as("payload"))
      Multimodal.imageDHashFrame(media)
        .select(col("media_id").as("doc_id"), col("dhash_hi"), col("dhash_lo"))
    }),

    "image_resize" -> ((s, dir) => {
      // Real pixel-level resize through the real decode path
      // (Multimodal.imageResizeFrame scaladoc): the 9x8 synthetic BMPs
      // resample to a 4x4 luminance grid via the dHash center-sample
      // nearest-neighbor mapping — the oracle recomputes every output
      // pixel analytically from the BMP pixel formula, so the gate fails
      // if decode, mapping, clamping, or the luminance integerization
      // drifts.
      val mk = udf((id: Long) => Multimodal.syntheticBmp(id, 9, 8))
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), mk(col("doc_id")).as("payload"))
      Multimodal.imageResizeFrame(media, outW = 4, outH = 4)
        .select(col("media_id").as("doc_id"), col("x"), col("y"), col("lum"))
    }),

    "audio_fingerprint" -> ((s, dir) => {
      // The audio twin of image_dhash: a REAL 16-bit PCM WAV generated per
      // doc (2080 samples = 65 windows x 32), decoded by real
      // javax.sound, energy-envelope fingerprinted
      // (Multimodal.audioEnvelopeBits scaladoc). 16-bit PCM decodes to
      // exact dyadic floats, so the oracle replays the bits with pure
      // INTEGER window sums of squared samples.
      val mk = udf((id: Long) => Multimodal.syntheticWav(id, 2080))
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), mk(col("doc_id")).as("payload"))
      Multimodal.audioFingerprintFrame(media)
        .select(col("media_id").as("doc_id"), col("afp_hi"), col("afp_lo"))
    }),

    "audio_resample" -> ((s, dir) => {
      // Real audio downsample through the real decode path
      // (Multimodal.audioResampleFrame scaladoc): the 2080-sample WAVs
      // box-average 32:1 to 65 integer levels — the oracle replays every
      // level as an exact integer window sum with floor division.
      val mk = udf((id: Long) => Multimodal.syntheticWav(id, 2080))
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), mk(col("doc_id")).as("payload"))
      Multimodal.audioResampleFrame(media, factor = 32)
        .select(col("media_id").as("doc_id"), col("j"), col("level"))
    }),

    "video_frames" -> ((s, dir) => {
      // Real end-to-end VIDEO pipeline with a FULL oracle (r13 verdict
      // #2 — the last multimodal stub made real): a deterministic
      // DIB-in-AVI clip is generated per doc (2 + doc_id % 3 frames of
      // the 8x6 gray pattern), container-walked and per-frame-decoded by
      // Multimodal.decodeAviFrames (RIFF chunk walk + real ImageIO), and
      // reported as exact integer per-frame luminance sums the oracle
      // recomputes analytically. Every %5 doc instead carries a
      // RIFF/WAVE payload — RIFF but NOT an AVI — pinning the
      // undecodable-container null contract in the same gate.
      val mk = udf((id: Long) =>
        if (id % 5 == 0) Multimodal.syntheticWav(id, 64)
        else Multimodal.syntheticAvi(id, (2 + id % 3).toInt, 8, 6))
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), mk(col("doc_id")).as("payload"))
      Multimodal.videoFrameLuminanceFrame(media)
        .select(col("media_id").as("doc_id"), col("frame_index"),
          col("width"), col("height"), col("lum_sum"))
    }),

    "multimodal_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(
          Multimodal.fromText(t(s, dir, "documents"), "text", "doc_id"),
          nFrames = 4, dim = 8)
        .select(col("media_id"), col("frame_index").cast("long").as("frame_index"),
          size(col("frame_features")).cast("long").as("frame_dim"),
          (VectorFunctions.normSq(col("frame_features")) > 0).as("frame_nonzero"))),

    // -- wave 3: graph cohesion, release audits, deterministic sampling ------

    "link_triangles" -> ((s, dir) => {
      // Per-node triangle participation + local clustering coefficient
      // (Graph.triangleCounts scaladoc: degree-ordered compact-forward,
      // O(|E|^1.5) wedge bound). The planted graph is denser than
      // link_pagerank's — successor, skip-2, and skip-3 edges — so closed
      // wedges actually occur and the clustering column is non-trivial.
      Graph.triangleCounts(
          plantedDenseEdges(t(s, dir, "documents").select(col("doc_id"))),
          "src", "dst")
        .select(col("id").as("doc_id"), col("degree"), col("triangles"),
          col("clustering"))
    }),

    "l_diversity" -> ((s, dir) => {
      // Homogeneity-attack audit (CurationRules.lDiversity scaladoc):
      // a (event_type, day) group can be k-anonymous yet expose its
      // members if every row shares one sensitive value. user_id as the
      // sensitive column, l=5, day from integer-micros event time.
      val ev = EventTime.readMicros(s, s"$dir/events.parquet")
        .withColumn("day", expr(s"ts div ${EventTime.DayMicros}"))
      CurationRules.lDiversity(ev, Seq("event_type", "day"), "user_id", l = 5)
    }),

    "event_anomaly_mad" -> ((s, dir) => {
      // Row-level robust anomaly flags (Profile.robustFlags scaladoc)
      // over daily event counts: WHICH days spiked (exact median/MAD,
      // 3-MAD fence), the per-day companion of changepoint_cusum.
      val ev = EventTime.readMicros(s, s"$dir/events.parquet")
      val daily = ev.groupBy(col("event_type"),
          expr(s"ts div ${EventTime.DayMicros}").as("day"))
        .agg(count(lit(1)).as("n"))
      Profile.robustFlags(daily, "event_type", "n", k = 3.0)
        .select(col("event_type"), col("day"), col("n"), col("med_v"),
          col("mad_v"), col("is_outlier"))
    }),

    "tail_index" -> ((s, dir) =>
      // Hill tail-exponent estimate over the doc-length distribution
      // (Profile.hillTailIndex scaladoc): top-101 order statistics only —
      // a TakeOrderedAndProject, never a global sort.
      Profile.hillTailIndex(t(s, dir, "documents"), "n_chars", k = 100)),

    "source_lang_mi" -> ((s, dir) =>
      // Source<->language dependence audit (Profile.mutualInformation
      // scaladoc): high MI = language coverage is hostage to specific
      // sources; the corpus-mix planning signal.
      Profile.mutualInformation(t(s, dir, "documents"), "source", "lang")),

    "weighted_sample" -> ((s, dir) =>
      // Efraimidis-Spirakis weighted sample without replacement
      // (Sampling.weightedSample scaladoc): 100 docs, length-weighted,
      // md5-derived priorities -> TakeOrderedAndProject, engine-stable.
      Sampling.weightedSample(t(s, dir, "documents"), "doc_id", "n_chars",
          k = 100, salt = "wsamp")
        .select(col("doc_id"), col("n_chars"))),

    "group_reservoir" -> ((s, dir) =>
      // Exactly-k-per-group deterministic sample (Sampling.groupReservoir
      // scaladoc): 20 docs per language by lowest md5 hash — the eval-set
      // construction contract.
      Sampling.groupReservoir(t(s, dir, "documents"), "lang", "doc_id", k = 20)
        .select(col("lang"), col("doc_id"))),

    "quality_deciles" -> ((s, dir) => {
      // Exact decile binning of the quality score (Sampling.rankBuckets
      // scaladoc: global positions via the SequencePack machinery, not an
      // ntile single-partition window), then per-decile population stats.
      val scored = t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"), col("n_chars"))
      Sampling.rankBuckets(scored, "quality", "doc_id", buckets = 10)
        .groupBy(col("bucket").as("decile"))
        .agg(count(lit(1)).as("n"),
          min(col("quality")).as("min_q"), max(col("quality")).as("max_q"),
          round(avg(col("n_chars")), 6).as("mean_chars"))
    }),

    "readability" -> ((s, dir) =>
      // Flesch reading ease + FK grade per doc (TextAnalysis
      // .readabilityFrame scaladoc): toks words, [.!?]+ sentences,
      // vowel-run syllables — pure codegen'd expressions.
      TextAnalysis.readabilityFrame(t(s, dir, "documents"), "text", "doc_id")),

    "dup_ngrams" -> ((s, dir) =>
      // Boilerplate radar (Profile.topDuplicatedNgrams scaladoc): top-50
      // duplicated word 5-grams with occurrence + document counts,
      // (n_occ desc, ngram) total order -> deterministic cut.
      Profile.topDuplicatedNgrams(t(s, dir, "documents"), "text", "doc_id",
        n = 5, minCount = 2, k = 50)),

    "winsorize_events" -> ((s, dir) =>
      // Outlier-robust event-value means (Profile.winsorizedStats
      // scaladoc): exact [5%, 95%] fences pinned to 6dp, decimal-exact
      // sums — raw vs winsorized mean per event type plus clip counts.
      Profile.winsorizedStats(t(s, dir, "events"), "event_type", "value",
        pLo = 0.05, pHi = 0.95)),

    "pii_luhn" -> ((s, dir) => {
      // Card-number PLAUSIBILITY check (TextFunctions.luhnValid scaladoc):
      // mod-10 fold as pure HOF expressions. Two planted 16-digit runs
      // per doc (id-derived, so validity varies pseudo-randomly); the
      // oracle replays the fold digit-by-digit in SQL.
      val ca = lpad(col("doc_id").cast("string"), 16, "4")
      val cb = concat(lit("5"),
        lpad((col("doc_id") * 7919 % 1000000000L).cast("string"), 15, "0"))
      t(s, dir, "documents").select(col("doc_id"),
        graft.functions.TextFunctions.luhnValid(ca).as("luhn_a"),
        graft.functions.TextFunctions.luhnValid(cb).as("luhn_b"))
    }),

    "anchor_text" -> ((s, dir) => {
      // Anchor-text aggregation per link target (Graph.anchorTexts
      // scaladoc) over REAL extraction: each doc links to one of 11
      // planted domains with a (lang, id%3)-keyed anchor; targets then
      // collect their sorted, capped distinct anchor sets.
      val page = concat(lit("<p>pad</p><a href=\"https://site"),
        (col("doc_id") % 11).cast("string"),
        lit(".example.com/\">anchor "), col("lang"), lit(" "),
        (col("doc_id") % 3).cast("string"), lit("</a>"))
      val links = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          explode(graft.functions.TextFunctions.extractLinks(page)).as("l"))
        .select(col("doc_id"), col("l.href").as("href"),
          col("l.anchor").as("anchor"))
      Graph.anchorTexts(links, "href", "anchor", "doc_id", maxAnchors = 10)
    }),

    "chunk_cdc" -> ((s, dir) =>
      // Content-defined chunking (Chunkers.contentDefined scaladoc):
      // strictly-windowed gear hash, mask 2^6 -> ~64-char chunks whose
      // boundaries survive byte edits — the byte-level dedup chunker,
      // pure codegen'd expressions end to end.
      Chunkers.contentDefined(t(s, dir, "documents"), "text", "doc_id")
        .select(col("doc_id"), col("chunk_index"), col("start_pos"),
          col("chunk_len"), col("chunk"))),

    "dedup_cdc_containment" -> ((s, dir) =>
      // Byte-level near-dup pairs over CDC chunk fingerprints
      // (Dedup.cdcContainment scaladoc): containment vs min(|A|,|B|),
      // boilerplate fingerprints (>50 docs) fenced before pairing.
      Dedup.cdcContainment(t(s, dir, "documents"), "text", "doc_id",
        minShared = 2, minContainment = 0.4)),

    "kmeans_silhouette" -> ((s, dir) =>
      // Centroid-based simplified silhouette per cluster
      // (KMeans.silhouetteFrame scaladoc): O(n*k), both distances from
      // one broadcast-centroid scan — the cluster-quality audit for the
      // SemDeDup blocking.
      KMeans.silhouetteFrame(t(s, dir, "embeddings"), "embedding", "vec_id",
          k = 10, iterations = 2)
        .select(col("cluster").cast("long").as("cluster"), col("n"),
          col("mean_a"), col("mean_b"), col("mean_silhouette"),
          col("n_misassigned"))),

    "link_ppr" -> ((s, dir) => {
      // Personalized PageRank / random walk with restart
      // (PageRank.personalized scaladoc): teleport only to every-13th-doc
      // seeds over the link_pagerank planted graph — the seed-expansion
      // signal ("more pages like these trusted ones").
      val ids = t(s, dir, "documents").select(col("doc_id"))
      val e1 = ids.filter(col("doc_id") % 7 < 3)
        .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
      val e2 = ids.filter(col("doc_id") % 11 === 0)
        .select(col("doc_id").as("src"), (col("doc_id") + 3).as("dst"))
      val edges = e1.union(e2)
        .join(ids.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
      val seeds = ids.filter(col("doc_id") % 13 === 0)
      PageRank.personalized(edges, seeds, "src", "dst", "doc_id",
          iterations = 3)
        .select(col("id").as("doc_id"), col("ppr"))
    }),

    "streaming_anomaly" -> ((s, dir) =>
      // The SAME median/MAD daily-count flags as `event_anomaly_mad`, but
      // flagged by the streaming engine against batch-trained broadcast
      // fences (Streaming.runAnomalyAvailableNow scaladoc) — the
      // fences-offline / flag-online deployment shape; one shared oracle.
      graft.streaming.Streaming.runAnomalyAvailableNow(s,
        s"$dir/events.parquet")),

    "link_kcore" -> ((s, dir) =>
      // 2-core by 6 synchronous peeling rounds (Graph.kCore scaladoc):
      // low-degree tendrils dissolve, the interlinked core survives with
      // its residual degree — the link-graph noise filter.
      Graph.kCore(plantedDenseEdges(t(s, dir, "documents")
          .select(col("doc_id"))), "src", "dst", k = 2, rounds = 6)
        .select(col("id").as("doc_id"), col("core_degree"))),

    "dedup_minhash_incremental" -> ((s, dir) => {
      // The daily-crawl incremental near-dup pass
      // (Dedup.minhashLshIncrementalPairs scaladoc): the reference corpus
      // contributes only its PRE-BANDED signature table; the planted batch
      // is banded fresh. Work scales with the batch — and the result still
      // equals the brute-force truth restricted to pairs touching a new id.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val batch = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text"))
      val sigs = Dedup.signatures(docs, "text", "doc_id")
      Dedup.minhashLshIncrementalPairs(batch, docs, "text", "doc_id", sigs,
          maxJaccardDistance = 0.5)
        .select(col("id_a"), col("id_b"))
    }),

    "vocab_coverage" -> ((s, dir) =>
      // Token-mass coverage of the top-k word types (Profile.vocabCoverage
      // scaladoc) at k = 10/25/100 — the vocab-size planning curve.
      Profile.vocabCoverage(t(s, dir, "documents"), "text",
        ks = Seq(10, 25, 100))),

    "streaming_heavy_hitters" -> ((s, dir) =>
      // The custom Misra-Gries TypedImperativeAggregate through the REAL
      // streaming engine (Streaming.runHeavyHittersAvailableNow scaladoc):
      // exact regime -> the batch GROUP BY oracle covers both paths.
      graft.streaming.Streaming.runHeavyHittersAvailableNow(s,
        s"$dir/documents.parquet")),

    "pii_iban" -> ((s, dir) => {
      // IBAN mod-97 plausibility (TextFunctions.ibanValid scaladoc): the
      // fold IS the big-integer mod, as pure HOF expressions. Planted
      // 16-char DE IBANs with id-derived check digits — validity varies
      // pseudo-randomly; the oracle replays the fold via list_reduce.
      val iban = concat(lit("DE"),
        lpad((col("doc_id") % 100).cast("string"), 2, "0"),
        lpad((col("doc_id") * 37 % 1000000000000L).cast("string"), 12, "0"))
      t(s, dir, "documents").select(col("doc_id"),
        graft.functions.TextFunctions.ibanValid(iban).as("iban_valid"))
    }),

    "embed_truncation" -> ((s, dir) => {
      // Matryoshka truncation audit (Similarity.truncationAudit scaladoc):
      // overlap of the full-dim top-10 vs search on the first 8/16/32
      // components — the store-fewer-floats decision curve.
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select("embedding").collect()(0).getSeq[Float](0).toArray
      Similarity.truncationAudit(e, q, k = 10, dims = Seq(8, 16, 32))
    }),

    "dedup_components_incremental" -> ((s, dir) => {
      // Incremental closure (Components.incrementalComponents scaladoc):
      // the %7-chain half of the planted pair graph is "yesterday's"
      // standing assignment (collapsed to stars); the %11 skip-links are
      // today's batch. The fold must reproduce the FULL-graph closure —
      // one oracle covers both paths.
      val ids = t(s, dir, "documents").select(col("doc_id"))
      val e1 = ids.filter(col("doc_id") % 7 < 3)
        .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
      val e2 = ids.filter(col("doc_id") % 11 === 0)
        .select(col("doc_id").as("src"), (col("doc_id") + 3).as("dst"))
        .join(ids.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
      val prev = Components.connectedComponents(
        e1.join(ids.select(col("doc_id").as("dst")), Seq("dst"), "left_semi"),
        "src", "dst")
      Components.incrementalComponents(prev, e2, "src", "dst")
        .select(col("id").as("doc_id"), col("component"))
    })
  )

  /** The planted two-version SCD2 history shared by `scd2_history` and
    * `scd2_lookup`: old snapshot (docs except %5==4, %5==2 fingerprints
    * altered, plus +1M ghosts every 50th) at version 1, the real corpus
    * at version 2.
    */
  private def plantedScd2History(s: SparkSession, docs: DataFrame): DataFrame = {
    val newSnap = docs.select(col("doc_id"), sha2(col("text"), 256).as("fp"))
    val oldSnap = docs.filter(col("doc_id") % 5 =!= 4)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 2, sha2(concat(col("text"), lit("old")), 256))
          .otherwise(sha2(col("text"), 256)).as("fp"))
      .union(docs.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          sha2(col("text"), 256).as("fp")))
    val boot = StateStore.scd2Apply(
      StateStore.scd2Empty(s, "doc_id", "fp"), oldSnap, "doc_id", "fp", 1L)
    StateStore.scd2Apply(boot, newSnap, "doc_id", "fp", 2L)
  }

  /** Wave-3 planted link graph: successor edges on `doc_id % 7 < 3`,
    * skip-2 on `% 5 < 2`, skip-3 on `% 11 == 0`, destinations clipped to
    * existing ids — deterministic, triangle-bearing, same left-semi clip
    * idiom as the `link_pagerank` family.
    */
  private def plantedDenseEdges(ids: DataFrame): DataFrame = {
    val e1 = ids.filter(col("doc_id") % 7 < 3)
      .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
    val e2 = ids.filter(col("doc_id") % 5 < 2)
      .select(col("doc_id").as("src"), (col("doc_id") + 2).as("dst"))
    val e3 = ids.filter(col("doc_id") % 11 === 0)
      .select(col("doc_id").as("src"), (col("doc_id") + 3).as("dst"))
    e1.union(e2).union(e3)
      .join(ids.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
  }

  // ---------------------------------------------------------------------------
  // Oracle SQL (DuckDB dialect) — exact mirrors of the Spark computations.
  // ---------------------------------------------------------------------------

  private val cosSql =
    "list_dot_product(%A::DOUBLE[], %B::DOUBLE[]) / (sqrt(list_dot_product(%A::DOUBLE[], %A::DOUBLE[])) * sqrt(list_dot_product(%B::DOUBLE[], %B::DOUBLE[])))"

  private def cosOf(a: String, b: String): String =
    cosSql.replace("%A", a).replace("%B", b)

  /** The hyperplane-LSH sign matrix (seed=42, 16 planes, 64 dims) as a
    * DuckDB literal plane table — a PURE compile-time constant
    * ([[Similarity.hyperplaneSign]]), which is what lets the oracle replay
    * the blocked gates' banded candidate generation value-for-value: the
    * per-plane dot is ±1 times the (exactly-representable) float
    * components, accumulated left-to-right by both engines'
    * list_dot_product/while-loop, so the >= 0 sign bits — and hence bands,
    * candidates, and ranks — are bit-identical. Yields CTE `planes(p, s)`.
    */
  private lazy val planesSql: String =
    s"planes(p, s) AS (SELECT * FROM (VALUES ${signsSqlRows(42, 16, 64)}) v(p, s))"

  /** ±1 sign-matrix rows `(i, [±1,...]::DOUBLE[])` as a DuckDB VALUES
    * literal — the ONE sign-inlining builder (r13 review: it existed
    * twice), bit-matched to [[Similarity.hyperplaneSign]]'s `> 0`
    * convention. Serves the hyperplane plane table (seed 42) and the
    * clustered-fixture centroid table (seed 777).
    */
  private def signsSqlRows(seed: Int, nRows: Int, dim: Int): String =
    (0 until nRows).map { p =>
      val signs = (0 until dim)
        .map(j => if (Similarity.hyperplaneSign(seed, p, j) > 0) "1" else "-1")
        .mkString(",")
      s"($p, [$signs]::DOUBLE[])"
    }.mkString(",\n ")

  /** Unrolled replay of the recursive character splitter (chunkSize=150,
    * overlap=30) in the regime this fixture exercises: single-line,
    * single-spaced text resolves the separator cascade to the word level,
    * where the splitter is EXACTLY a greedy prefix-sum merge — chunk k
    * spans fragments [si..je] with `je = max j : P(j) - P(si-1) <= 150`,
    * and the next window starts at
    * `max(si, 1 + min m : P(m) >= P(je) - 30)` (the 30-char back-off; the
    * fixed point of mergeSplits' drop-head loop for fragments < 120
    * chars — fixture words are <= 8). Chunk text is a trimmed substring
    * of the original document, so the replay is character-faithful. The
    * kcenterSql unroll pattern; `rounds` bounds chunks per doc (max text
    * 577 chars -> <= 6 chunks; 8 gives headroom). Leaves CTE
    * `rec(doc_id, chunk_index, chunk)`.
    */
  private def recursiveChunkSql(filterSql: String, rounds: Int = 8): String = {
    // Per-doc prefix-sum LIST + lambda filters: after `base`, every round
    // is pure scalar list arithmetic on one row per live doc — no joins in
    // the iteration (an inequality-join formulation measured 40-190 s at
    // sf0.1; this one is sub-second).
    val steps = (1 to rounds).map { r =>
      s"""s$r AS (
         | SELECT *, len(list_filter(pl, x -> x <= ps + 150)) AS je
         | FROM (SELECT *, CASE WHEN si = 1 THEN CAST(0 AS BIGINT)
         |    ELSE pl[CAST(si - 1 AS INT)] END AS ps FROM c$r)),
         |em$r AS (
         | SELECT doc_id, ci AS chunk_index,
         |  trim(substr(text, CAST(ps + 1 AS INT),
         |    CAST(pl[CAST(je AS INT)] - ps AS INT))) AS chunk
         | FROM s$r),
         |c${r + 1} AS (
         | SELECT doc_id, text, pl, ci + 1 AS ci,
         |  greatest(si, CAST(len(list_filter(pl,
         |    x -> x < pl[CAST(je AS INT)] - 30)) + 2 AS BIGINT)) AS si
         | FROM s$r WHERE je < len(pl))""".stripMargin
    }.mkString(",\n")
    s"""words AS (
       | SELECT doc_id, text, string_split(text, ' ') AS ws
       | FROM documents WHERE $filterSql),
       |frags AS (
       | SELECT doc_id, i,
       |  CASE WHEN i = 1 THEN len(ws[i]) ELSE len(ws[i]) + 1 END AS l
       | FROM words, unnest(range(1, len(ws) + 1)) AS u(i)),
       |pls AS MATERIALIZED (
       | SELECT doc_id, list(CAST(p AS BIGINT) ORDER BY i) AS pl FROM (
       |  SELECT doc_id, i, sum(l) OVER (PARTITION BY doc_id ORDER BY i) AS p
       |  FROM frags) GROUP BY doc_id),
       |c1 AS (
       | SELECT w.doc_id, w.text, p.pl, 1 AS ci, CAST(1 AS BIGINT) AS si
       | FROM words w JOIN pls p USING (doc_id)),
       |$steps,
       |rec AS (${(1 to rounds)
           .map(r => s"SELECT doc_id, chunk_index, chunk FROM em$r")
           .mkString(" UNION ALL ")}
       | UNION ALL
       | SELECT doc_id, ci AS chunk_index,
       |  error(concat('recursiveChunkSql: unroll exhausted after $rounds rounds, doc ',
       |    CAST(doc_id AS VARCHAR), ' still live')) AS chunk
       | FROM c${rounds + 1})""".stripMargin
  }

  /** Banded-signature CTE over `src` for the blocked-gate oracles: one row
    * per (id, band) with the 2-bit band value (bits packed LSB-first, the
    * `(sig >>> 2b) & 3` layout of Similarity.bandedCandidatePairs).
    * Requires [[planesSql]] in scope.
    */
  private def bandsSql(name: String, src: String, id: String,
                       vec: String): String = bandsSqlAt(name, src, id, vec, 2)

  /** [[bandsSql]] at an arbitrary band width (the multiprobe gate uses the
    * selective bandBits=4 split).
    */
  private def bandsSqlAt(name: String, src: String, id: String, vec: String,
                         bandBits: Int): String =
    s"""$name AS (
       | SELECT t.$id AS id, CAST(p.p // $bandBits AS INT) AS band,
       |  sum(CASE WHEN list_dot_product(t.$vec::DOUBLE[], p.s) >= 0
       |      THEN 1 ELSE 0 END * (1 << (p.p % $bandBits))) AS bits
       | FROM $src t, planes p GROUP BY 1, 2)""".stripMargin

  /** Sign-matrix replay of the banded single-query search — shared by the
    * `similarity_lsh_exact` gate and its row-identical pre-banded-index
    * twin `similarity_prebanded`.
    */
  private lazy val similarityLshExactSql: String =
    s"""WITH $planesSql,
       |e AS (SELECT vec_id, embedding FROM embeddings),
       |q AS (SELECT vec_id AS qid, embedding AS qv
       | FROM embeddings WHERE vec_id = 0),
       |${bandsSql("qb", "q", "qid", "qv")},
       |${bandsSql("cb", "e", "vec_id", "embedding")},
       |cand AS (SELECT DISTINCT qb.id AS qid, cb.id AS cid
       | FROM qb JOIN cb USING (band, bits))
       |SELECT c.cid AS vec_id,
       | round(${cosOf("co.embedding", "q.qv")}, 6) AS score
       |FROM cand c JOIN q ON q.qid = c.qid
       | JOIN e co ON co.vec_id = c.cid
       |ORDER BY ${cosOf("co.embedding", "q.qv")} DESC, c.cid LIMIT 10""".stripMargin

  /** Full engine-neutral replay of `Similarity.ivfIndex` + `ivfTopK`
    * (the r10 † closure): unit vectors quantize to integer micro-units
    * (`floor(x * (1/sqrt(dot)) * 1e6 + 0.5)`), so the training sample
    * order (md5 of quantized components + id + seed), the farthest-point
    * init, every Lloyd assignment (EXACT integer distances — no float
    * accumulation order anywhere), the per-cluster integer component
    * sums, and the fixed-dimension-order mean/renormalize/requantize all
    * replay value-for-value. The probe-cell ranking and the final cosine
    * re-rank then use the same left-to-right double arithmetic as every
    * other gate. All iterative CTEs are MATERIALIZED (DuckDB otherwise
    * inlines the chain exponentially).
    */
  private def ivfSql(nCells: Int, maxIter: Int, nProbe: Int, k: Int,
                     dim: Int, seed: Long): String = {
    val dims = dim + 1
    // NB: ivfCtes is already margin-stripped and contains `||` — it must
    // be CONCATENATED, never interpolated into another stripMargin string
    // (stripMargin would eat the first pipe of a line-leading `||`).
    s"WITH ${ivfCtes(nCells, maxIter, dim, seed)},\n" +
    s"""uq AS (SELECT list_transform(dv, x ->
       |   x / sqrt(list_dot_product(dv, dv))) AS u
       | FROM e WHERE vec_id = 0),
       |cd AS (SELECT cell,
       |  list_transform(cq, x -> CAST(x AS DOUBLE) / 1000000.0) AS c
       | FROM cents$maxIter),
       |probe AS (SELECT cell FROM (
       | SELECT cd.cell, list_dot_product(
       |   list_transform(range(1, $dims), j ->
       |     cd.c[CAST(j AS INT)] - uq.u[CAST(j AS INT)]),
       |   list_transform(range(1, $dims), j ->
       |     cd.c[CAST(j AS INT)] - uq.u[CAST(j AS INT)])) AS d
       | FROM cd CROSS JOIN uq) ORDER BY d, cell LIMIT $nProbe),
       |qlit AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
       |SELECT em.vec_id, round(${cosOf("em.embedding", "q.qe")}, 6) AS score
       |FROM embeddings em
       | JOIN assign a ON a.vec_id = em.vec_id
       | JOIN probe p ON p.cell = a.cell
       | CROSS JOIN qlit q
       |ORDER BY ${cosOf("em.embedding", "q.qe")} DESC, em.vec_id
       |LIMIT $k""".stripMargin
  }

  /** The shared IVF replay CTE chain (see [[ivfSql]]'s scaladoc above):
    * quantized unit vectors `qv`, the hash-ordered training sample `smp`
    * restricted to `trainFilter`, farthest-point init, `maxIter` Lloyd
    * iterations ending at `cents{maxIter}`, and the full-corpus `assign`.
    * Tails compose on top (top-k probe for `similarity_ivf`, cell
    * histogram for `ivf_incremental`).
    */
  private def ivfCtes(nCells: Int, maxIter: Int, dim: Int, seed: Long,
                      trainFilter: String = "TRUE",
                      src: String = "embeddings"): String = {
    val dims = dim + 1
    def d2(a: String, b: String): String =
      s"CAST(list_sum(list_transform(range(1, $dims), " +
        s"j -> ($a[CAST(j AS INT)] - $b[CAST(j AS INT)]) * " +
        s"($a[CAST(j AS INT)] - $b[CAST(j AS INT)]))) AS DOUBLE)"
    val kcRounds = (2 to nCells).map { r =>
      s"""kc$r AS MATERIALIZED (SELECT q AS cq FROM kd${r - 1}
         | ORDER BY dm DESC, pos LIMIT 1),
         |kd$r AS MATERIALIZED (SELECT d.pos, d.q,
         |  least(d.dm, ${d2("d.q", "c.cq")}) AS dm
         | FROM kd${r - 1} d CROSS JOIN kc$r c)""".stripMargin
    }.mkString(",\n")
    val cents0 = (1 to nCells)
      .map(r => s"SELECT ${r - 1} AS cell, cq FROM kc$r")
      .mkString(" UNION ALL ")
    val lloyd = (1 to maxIter).map { t =>
      s"""la$t AS MATERIALIZED (
         | SELECT pos, q, cell FROM (
         |  SELECT s.pos, s.q, c.cell,
         |   row_number() OVER (PARTITION BY s.pos
         |     ORDER BY ${d2("s.q", "c.cq")}, c.cell) AS rn
         |  FROM smp s CROSS JOIN cents${t - 1} c) WHERE rn = 1),
         |lm$t AS MATERIALIZED (
         | SELECT cell, list(m ORDER BY j) AS ml FROM (
         |  SELECT cell, j, CAST(sum(q[CAST(j AS INT)]) AS DOUBLE) / count(*) AS m
         |  FROM la$t CROSS JOIN range(1, $dims) r(j) GROUP BY cell, j)
         | GROUP BY cell),
         |ln$t AS (
         | SELECT cell, list_transform(range(1, $dims), j ->
         |   CAST(floor(ml[CAST(j AS INT)] * (1.0 / sqrt(list_dot_product(ml, ml)))
         |     * 1000000.0 + 0.5) AS BIGINT)) AS cq
         | FROM lm$t WHERE list_dot_product(ml, ml) > 0),
         |cents$t AS MATERIALIZED (
         | SELECT p.cell, coalesce(n.cq, p.cq) AS cq
         | FROM cents${t - 1} p LEFT JOIN ln$t n USING (cell))""".stripMargin
    }.mkString(",\n")
    s"""e AS (SELECT vec_id, embedding, embedding::DOUBLE[] AS dv
       |  FROM $src),
       |qv AS MATERIALIZED (
       | SELECT vec_id, list_transform(dv, x ->
       |   CAST(floor(x * (1.0 / sqrt(list_dot_product(dv, dv)))
       |     * 1000000.0 + 0.5) AS BIGINT)) AS q
       | FROM e
       | WHERE vec_id IS NOT NULL AND len(dv) > 0
       |   AND list_dot_product(dv, dv) > 0),
       |smp AS MATERIALIZED (
       | SELECT q, pos FROM (
       |  SELECT q, row_number() OVER (ORDER BY
       |    md5(array_to_string(q, ',') || ':' || CAST(vec_id AS VARCHAR)
       |      || ':$seed')) AS pos
       |  FROM qv WHERE $trainFilter) WHERE pos <= 20000),
       |kc1 AS MATERIALIZED (SELECT q AS cq FROM smp WHERE pos = 1),
       |kd1 AS MATERIALIZED (SELECT s.pos, s.q, ${d2("s.q", "c.cq")} AS dm
       | FROM smp s CROSS JOIN kc1 c),
       |$kcRounds,
       |cents0 AS MATERIALIZED ($cents0),
       |$lloyd,
       |assign AS MATERIALIZED (
       | SELECT vec_id, cell FROM (
       |  SELECT v.vec_id, c.cell,
       |   row_number() OVER (PARTITION BY v.vec_id
       |     ORDER BY ${d2("v.q", "c.cq")}, c.cell) AS rn
       |  FROM qv v CROSS JOIN cents$maxIter c) WHERE rn = 1
       | UNION ALL
       | SELECT vec_id, 0 AS cell FROM e
       | WHERE embedding IS NOT NULL
       |   AND coalesce(list_dot_product(dv, dv), 0) = 0)""".stripMargin
  }

  /** Exact RBO suffix coefficients (k=10, p=9/10) — the SAME table the
    * `eval_rbo` Spark gate uses, so the oracle replays identical integer
    * arithmetic.
    */
  private lazy val rboCoefs = Search.rboSuffixCoefs(10, 9, 10)

  /** Deterministic surname plant for the `dedup_jaro` gate: base surname
    * from `doc_id % 10`, mutated by `doc_id % 4` (keep / drop 3rd char /
    * swap chars 2-3 / append 'x') — every mutation keeps the first letter,
    * so first-letter blocking never splits a variant family. SQL replay in
    * the gate's oracle.
    */
  /** Unrolled greedy k-center CTE chain mirroring `KMeans.kCenter` on the
    * embeddings table: `c1` = lowest vec_id; round r: `cr` = the
    * (dm DESC, vec_id) argmax over `d(r-1)`, then
    * `dr.dm = least(d(r-1).dm, round(d2(., cr), 6))`. Distance arithmetic
    * is the shared [[kmeansD2]] zip-fold.
    */
  private def kcenterSql(k: Int, dim: Int): String = {
    val rounds = (2 to k).map { r =>
      s"""c$r AS (SELECT vec_id, v, dm FROM d${r - 1}
         | ORDER BY dm DESC, vec_id LIMIT 1),
         |d$r AS (SELECT d.vec_id, d.v,
         |  least(d.dm, round(${kmeansD2(s"d", s"c$r", dim)}, 6)) AS dm
         | FROM d${r - 1} d CROSS JOIN c$r)""".stripMargin
    }.mkString(",\n")
    val sel = (2 to k)
      .map(r => s"UNION ALL SELECT $r, vec_id, dm FROM c$r")
      .mkString("\n")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
       |d1 AS (SELECT e.vec_id, e.v, round(${kmeansD2("e", "c1", dim)}, 6) AS dm
       | FROM e CROSS JOIN c1),
       |$rounds,
       |sel AS (
       | SELECT 1 AS rank, vec_id, 0.0 AS d2 FROM c1
       | $sel),
       |cov AS (SELECT max(dm) AS coverage_d2 FROM d$k)
       |SELECT CAST(sel.rank AS BIGINT) AS rank,
       | CAST(sel.vec_id AS BIGINT) AS id, CAST(sel.d2 AS DOUBLE) AS d2,
       | cov.coverage_d2
       |FROM sel CROSS JOIN cov""".stripMargin
  }

  /** Unigram-LM CTE chain: substring candidates from occurrence-weighted
    * distinct words, single-chars + top-`topK` vocabulary with integer
    * micro-nat costs (ending at `vc`), then the Viterbi DP over the
    * combined `cost*16 + 1` metric UNROLLED position by position (`b1` ..
    * `b<maxWordLen>`) — pure integer arithmetic end to end, shared by the
    * `unigram_vocab` and `unigram_segment` oracles.
    */
  private def unigramSqlCtes(topK: Int, maxPieceLen: Int,
                             maxWordLen: Int): String = {
    val rounds = (1 to maxWordLen).map { i =>
      val cands = (1 to math.min(maxPieceLen, i)).map { l =>
        s"""SELECT b.w, b.m + vc.cost_micro * 16 + 1 AS m
           | FROM b${i - l} b JOIN vc ON vc.piece = b.w[${i - l + 1}:$i]
           | WHERE len(b.w) >= $i""".stripMargin
      }.mkString("\n UNION ALL\n")
      s"""b$i AS MATERIALIZED (SELECT w, min(m) AS m FROM (\n$cands\n ) GROUP BY w)"""
    }.mkString(",\n")
    s"""uw AS MATERIALIZED (SELECT t AS w, CAST(count(*) AS BIGINT) AS n FROM
       | (SELECT unnest($toksSql) AS t FROM documents) q GROUP BY t),
       |cand AS (SELECT piece, sum(n) AS n FROM (
       | SELECT unnest(flatten(list_transform(range(1, least(len(w), $maxPieceLen) + 1),
       |   l -> list_transform(range(1, len(w) - l + 2), i -> w[i:i+l-1])))) AS piece, n
       | FROM uw) q GROUP BY piece),
       |vsel AS (
       | SELECT piece, n FROM cand WHERE len(piece) = 1
       | UNION ALL
       | SELECT piece, n FROM (
       |  SELECT piece, n, row_number() OVER (ORDER BY n DESC, piece) AS rk
       |  FROM cand WHERE len(piece) > 1) q WHERE rk <= $topK),
       |tot AS (SELECT sum(n) AS total FROM vsel),
       |vc AS MATERIALIZED (SELECT piece, CAST(n AS BIGINT) AS n,
       |  CAST(round(-ln(CAST(n AS DOUBLE) / tot.total) * 1000000, 0) AS BIGINT) AS cost_micro
       | FROM vsel CROSS JOIN tot),
       |b0 AS MATERIALIZED (SELECT w, 0 AS m FROM uw),
       |$rounds""".stripMargin
  }

  /** 1-bit sign packing of `embeddings` into 32-dim words — the SELECT
    * body shared by the `embed_binarize` / `hamming_topk` oracles,
    * mirroring `Similarity.binarize`'s word/bit layout exactly.
    */
  private def binarizeSelectOver(src: String): String =
    s"""SELECT vec_id,
       |  list_transform(range(0, CAST(floor((len(embedding) - 1) / 32) AS INT) + 1),
       |   w -> CAST(list_sum(list_transform(range(0, 32),
       |     i -> CASE WHEN w * 32 + i < len(embedding)
       |        AND embedding[CAST(w * 32 + i + 1 AS INT)] > 0
       |       THEN CAST(pow(2, i) AS BIGINT) ELSE 0 END)) AS BIGINT)) AS words
       | FROM $src""".stripMargin

  private val binarizeSqlSelect: String = binarizeSelectOver("embeddings")

  /** Unrolled greedy set-cover rounds mirroring `Sampling.greedySetCover`
    * (k rounds; round r picks argmax uncovered-gain with id ties, folds
    * the pick's tokens into the covered list). Materialized per round —
    * the k-center/Viterbi CTE discipline.
    */
  private def setCoverSql(k: Int): String = {
    val rounds = (1 to k).map { r =>
      s"""g$r AS (SELECT st.id, st.s,
         |  len(list_filter(st.s, x -> NOT list_contains(p${r - 1}.cov, x))) AS gain
         | FROM sets st CROSS JOIN p${r - 1}),
         |p$r AS MATERIALIZED (
         | SELECT q.id, list_distinct(list_concat(pp.cov, q.s)) AS cov, q.gain
         | FROM (SELECT *, row_number() OVER (ORDER BY gain DESC, id) AS rn
         |       FROM g$r WHERE gain > 0) q
         |  CROSS JOIN p${r - 1} pp
         | WHERE q.rn = 1)""".stripMargin
    }.mkString(",\n")
    val sel = (1 to k).map(r =>
      s"SELECT $r AS rank, id, gain AS n_new_terms, len(cov) AS n_covered_total FROM p$r")
      .mkString("\nUNION ALL\n")
    s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |bg AS (SELECT doc_id, list_distinct(list_transform(
       |   range(1, greatest(len(toks), 1)),
       |   i -> toks[i] || '_' || toks[i + 1])) AS s
       | FROM tk),
       |sets AS MATERIALIZED (
       | SELECT doc_id AS id, s FROM bg WHERE len(s) > 0),
       |p0 AS (SELECT CAST([] AS VARCHAR[]) AS cov),
       |$rounds
       |SELECT CAST(rank AS BIGINT) AS rank, CAST(id AS BIGINT) AS id,
       | CAST(n_new_terms AS BIGINT) AS n_new_terms,
       | CAST(n_covered_total AS BIGINT) AS n_covered_total
       |FROM ($sel) z""".stripMargin
  }

  /** RAKE's fixed stoplist as a SQL IN-list — one source of truth
    * ([[graft.operators.Rake.Stopwords]]) for both engines.
    */
  private lazy val rakeStopSql: String =
    Rake.Stopwords.map(w => s"'$w'").mkString(", ")

  private val JaroSurnames = Seq("martinez", "anderson", "thompson",
    "richardson", "henderson", "williams", "johnson", "peterson",
    "sullivan", "mitchell")

  private def plantedSurname: Column = {
    val base = element_at(array(JaroSurnames.map(lit): _*),
      (col("doc_id") % 10 + 1).cast("int"))
    val m = col("doc_id") % 4
    when(m === 1, concat(substring(base, 1, 2), substring(base, 4, 100)))
      .when(m === 2, concat(substring(base, 1, 1), substring(base, 3, 1),
        substring(base, 2, 1), substring(base, 4, 100)))
      .when(m === 3, concat(base, lit("x")))
      .otherwise(base)
  }

  /** The host portion of [[plantedCrawlUrl]], already canonical-lowercase
    * — the `domain_tree` gate's input (50 hosts over 4 public suffixes).
    */
  private def plantedHost: Column = {
    val base = col("doc_id") % 100
    concat(lit("www.site"), (base % 10).cast("string"), lit(".example."),
      element_at(array(lit("com"), lit("co.uk"), lit("org"), lit("com.au")),
        (base % 4 + 1).cast("int")))
  }

  /** The [[plantedSurname]] plant as CTEs ending at `nm(doc_id, name)` —
    * shared by the `dedup_jaro` and `symspell_match` oracles.
    */
  private lazy val plantedSurnameSqlCtes: String =
    s"""named AS (SELECT doc_id,
       |  ([${JaroSurnames.map(s => s"'$s'").mkString(", ")}])[CAST(doc_id % 10 + 1 AS INT)] AS base
       | FROM documents WHERE doc_id < 1000),
       |nm AS (SELECT doc_id,
       |  CASE WHEN doc_id % 4 = 1 THEN substr(base, 1, 2) || substr(base, 4, 100)
       |   WHEN doc_id % 4 = 2 THEN substr(base, 1, 1) || substr(base, 3, 1) ||
       |     substr(base, 2, 1) || substr(base, 4, 100)
       |   WHEN doc_id % 4 = 3 THEN base || 'x'
       |   ELSE base END AS name
       | FROM named)""".stripMargin

  /** Squared-L2 between row vector `$e.v` and centroid `$c.v` with the same
    * arithmetic as `KMeans.dist2`: per-dimension diffs, then a sequential
    * left-to-right sum of squares.
    */
  private def kmeansD2(e: String, c: String, dim: Int): String = {
    val diff = s"list_transform(range(1, ${dim + 1}), i -> $e.v[i] - $c.v[i])"
    s"list_dot_product($diff, $diff)"
  }

  /** Unrolled Lloyd's-iteration CTE chain mirroring `KMeans.fit` (same
    * lowest-id seeds, same distance, same per-iteration `round(avg, 6)`
    * centroids, empty clusters carry forward). Leaves `e` (non-null
    * double vectors) and `c<iters>` (final centroids) in scope.
    */
  private def kmeansCtes(k: Int, iters: Int, dim: Int): String =
    kmeansCtesOver("", "embedding::DOUBLE[]", k, iters, dim)

  /** [[kmeansCtes]] generalized to a PREFIXED name space over an arbitrary
    * vector expression (e.g. a subspace slice for the PQ oracles) and an
    * arbitrary source relation (`from` — a prior CTE for the unit-vector
    * PQ oracles; it must expose `vec_id` and `embedding`). Leaves
    * `<p>e` (non-null double vectors) and `<p>c<iters>` (final centroids)
    * in scope.
    */
  private def kmeansCtesOver(p: String, vExpr: String, k: Int, iters: Int,
                             dim: Int,
                             from: String = "embeddings"): String = {
    val head =
      s"""${p}e AS (SELECT vec_id, $vExpr AS v FROM $from
         |  WHERE embedding IS NOT NULL),
         |${p}c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v
         |  FROM (SELECT * FROM ${p}e ORDER BY vec_id LIMIT $k))""".stripMargin
    val rounds = (1 to iters).map { t =>
      s"""${p}a$t AS (SELECT vec_id, cluster FROM (
         |  SELECT e.vec_id, c.cluster, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${kmeansD2("e", "c", dim)} ASC, c.cluster ASC) AS rn
         |  FROM ${p}e e CROSS JOIN ${p}c${t - 1} c) WHERE rn = 1),
         |${p}m$t AS (SELECT a.cluster, t.d, round(avg(list_extract(e.v, t.d)), 6) AS m
         |  FROM ${p}a$t a JOIN ${p}e e USING (vec_id) CROSS JOIN range(1, ${dim + 1}) t(d)
         |  GROUP BY a.cluster, t.d),
         |${p}c$t AS (SELECT c.cluster, coalesce(n.v, c.v) AS v
         |  FROM ${p}c${t - 1} c LEFT JOIN (SELECT cluster, list(m ORDER BY d) AS v
         |    FROM ${p}m$t GROUP BY cluster) n USING (cluster))""".stripMargin
    }
    (head +: rounds).mkString(",\n")
  }

  /** Shared PQ-oracle pieces (m=4 subspaces x 16 dims, k=8, 2 iterations —
    * the gates' configuration): per-subspace codebook training CTEs plus
    * `cd<j>(vec_id, code)` assignments.
    */
  private def pqCodeCtes(): String = {
    val books = (0 until 4).map(j =>
      kmeansCtesOver(s"s${j}_",
        s"(embedding::DOUBLE[])[${j * 16 + 1}:${(j + 1) * 16}]", 8, 2, 16))
      .mkString(",\n")
    val cds = (0 until 4).map(j =>
      s"""cd$j AS (SELECT vec_id, cluster AS code FROM (
         |  SELECT e.vec_id, c.cluster, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${kmeansD2("e", "c", 16)} ASC, c.cluster ASC) AS rn
         |  FROM s${j}_e e CROSS JOIN s${j}_c2 c) WHERE rn = 1)""".stripMargin)
      .mkString(",\n")
    s"$books,\n$cds"
  }

  private def pqCodeSelect(): String =
    (0 until 4).map(j =>
      s"SELECT vec_id, CAST($j AS BIGINT) AS subspace, CAST(code AS BIGINT) AS code FROM cd$j")
      .mkString("\nUNION ALL\n")


  // ---------------------------------------------------------------------
  // Shared recall-audit oracle bodies: referenced by their own gates AND
  // wrapped as subqueries by the compression_tradeoff decision table.
  // ---------------------------------------------------------------------

  private lazy val hammingRerankRecallSqlStr: String =
    hammingRerankRecallSql("embeddings")

  private def hammingRerankRecallSql(src: String): String =
    s"""WITH codes AS (${binarizeSelectOver(src)}),
       |qs AS (SELECT vec_id AS qid, words AS qw FROM codes WHERE vec_id < 20),
       |hshort AS (SELECT qid, id FROM (
       | SELECT qs.qid, c.vec_id AS id,
       |  row_number() OVER (PARTITION BY qs.qid ORDER BY
       |   CAST(list_sum(list_transform(range(1, len(qs.qw) + 1),
       |     j -> bit_count(xor(qs.qw[j], c.words[j])))) AS BIGINT), c.vec_id) AS rn
       | FROM qs, codes c WHERE c.vec_id <> qs.qid) q WHERE rn <= 20),
       |qv AS (SELECT vec_id AS qid, embedding AS v FROM $src
       | WHERE vec_id < 20),
       |cv AS (SELECT vec_id AS id, embedding AS v FROM $src),
       |approx AS (SELECT qid, id FROM (
       | SELECT h.qid, h.id, row_number() OVER (PARTITION BY h.qid ORDER BY
       |   round(${cosOf("qv.v", "cv.v")}, 6) DESC, h.id) AS rn
       | FROM hshort h JOIN qv ON qv.qid = h.qid JOIN cv ON cv.id = h.id) q
       | WHERE rn <= 5),
       |exact AS (SELECT qid, id FROM (
       | SELECT qv.qid, cv.id, row_number() OVER (PARTITION BY qv.qid ORDER BY
       |   round(${cosOf("qv.v", "cv.v")}, 6) DESC, cv.id) AS rn
       | FROM qv, cv WHERE cv.id <> qv.qid) q WHERE rn <= 5)
       |SELECT e.qid,
       | CAST(coalesce(sum(CASE WHEN a.id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_hit,
       | round(CAST(coalesce(sum(CASE WHEN a.id IS NOT NULL THEN 1 END), 0) AS DOUBLE) / 5, 6) AS recall
       |FROM exact e LEFT JOIN approx a ON a.qid = e.qid AND a.id = e.id
       |GROUP BY e.qid""".stripMargin

  private lazy val truncationRecallSqlStr: String =
    truncationRecallSql("embeddings")

  private def truncationRecallSql(src: String): String =
    s"""WITH qv AS (SELECT vec_id AS qid, embedding AS v FROM $src
       | WHERE vec_id < 20),
       |cv AS (SELECT vec_id AS id, embedding AS v FROM $src),
       |exact AS (SELECT qid, id FROM (
       | SELECT qv.qid, cv.id, row_number() OVER (PARTITION BY qv.qid ORDER BY
       |   round(${cosOf("qv.v", "cv.v")}, 6) DESC, cv.id) AS rn
       | FROM qv, cv WHERE cv.id <> qv.qid) q WHERE rn <= 5),
       |approx AS (SELECT qid, id FROM (
       | SELECT qv.qid, cv.id, row_number() OVER (PARTITION BY qv.qid ORDER BY
       |   round(${cosOf("(qv.v[1:16])", "(cv.v[1:16])")}, 6) DESC, cv.id) AS rn
       | FROM qv, cv WHERE cv.id <> qv.qid) q WHERE rn <= 5)
       |SELECT e.qid,
       | CAST(coalesce(sum(CASE WHEN a.id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_hit,
       | round(CAST(coalesce(sum(CASE WHEN a.id IS NOT NULL THEN 1 END), 0) AS DOUBLE) / 5, 6) AS recall
       |FROM exact e LEFT JOIN approx a ON a.qid = e.qid AND a.id = e.id
       |GROUP BY e.qid""".stripMargin

  /** [[graft.operators.Similarity.jlRecall]] replay: the jl_distortion
    * projection CTEs (16 Rademacher planes, 6-dp-rounded projections),
    * then the standard recall tail — projected-cosine top-5 vs the full
    * top-5.
    */
  private lazy val jlRecallSqlStr: String = jlRecallSql("embeddings")

  private def jlRecallSql(src: String): String =
    s"""WITH $planesSql,
       |qe AS (SELECT vec_id AS qid, embedding AS v, embedding::DOUBLE[] AS dv
       | FROM $src WHERE vec_id < 20),
       |ce AS (SELECT vec_id AS id, embedding AS v, embedding::DOUBLE[] AS dv
       | FROM $src),
       |qpv AS (SELECT qid, list(y ORDER BY j) AS pv FROM (
       | SELECT qe.qid, p.p AS j,
       |  round(list_dot_product(qe.dv, p.s) * (1.0 / sqrt(16.0)), 6) AS y
       | FROM qe CROSS JOIN planes p WHERE p.p < 16) GROUP BY qid),
       |cpv AS (SELECT id, list(y ORDER BY j) AS pv FROM (
       | SELECT ce.id, p.p AS j,
       |  round(list_dot_product(ce.dv, p.s) * (1.0 / sqrt(16.0)), 6) AS y
       | FROM ce CROSS JOIN planes p WHERE p.p < 16) GROUP BY id),
       |exact AS (SELECT qid, id FROM (
       | SELECT qe.qid, ce.id, row_number() OVER (PARTITION BY qe.qid ORDER BY
       |   round(${cosOf("qe.v", "ce.v")}, 6) DESC, ce.id) AS rn
       | FROM qe, ce WHERE ce.id <> qe.qid) q WHERE rn <= 5),
       |approx AS (SELECT qid, id FROM (
       | SELECT qp.qid, cp.id, row_number() OVER (PARTITION BY qp.qid ORDER BY
       |   round(${cosOf("qp.pv", "cp.pv")}, 6) DESC, cp.id) AS rn
       | FROM qpv qp, cpv cp WHERE cp.id <> qp.qid) q WHERE rn <= 5)
       |SELECT e.qid,
       | CAST(coalesce(sum(CASE WHEN a.id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_hit,
       | round(CAST(coalesce(sum(CASE WHEN a.id IS NOT NULL THEN 1 END), 0) AS DOUBLE) / 5, 6) AS recall
       |FROM exact e LEFT JOIN approx a ON a.qid = e.qid AND a.id = e.id
       |GROUP BY e.qid""".stripMargin

  private lazy val ivfPqRecallSqlStr: String =
    ivfPqRecallSql(nQueries = 20, k = 5, nProbe = 2)

  private lazy val ivfPqRerankRecallSqlStr: String =
    ivfPqRecallSql(nQueries = 20, k = 5, nProbe = 2,
      rerankShortlist = Some(20))

  /** [[graft.operators.Similarity.compressionTradeoff]] replay: each
    * per-axis recall oracle wrapped as a subquery, aggregated to one
    * `(axis, memory_ratio, n_queries, mean_recall)` row — full oracle by
    * construction since every arm IS its gate's oracle body.
    */
  private lazy val compressionTradeoffSql: String =
    compressionTradeoffSqlOver("embeddings")

  private def compressionTradeoffSqlOver(
      src: String, includeProduction: Boolean = false): String = {
    def arm(axis: String, ratio: String, body: String): String =
      s"SELECT '$axis' AS axis, $ratio AS memory_ratio,\n" +
        " CAST(count(*) AS BIGINT) AS n_queries,\n" +
        " round(CAST(coalesce(sum(n_hit), 0) AS DOUBLE) / (count(*) * 5), 6)" +
        " AS mean_recall\nFROM (\n" + body + "\n) t"
    (Seq(
      arm("sq8", "4.0", sq8RecallSql(src)),
      arm("jl_16", "4.0", jlRecallSql(src)),
      arm("truncate_16", "4.0", truncationRecallSql(src)),
      arm("binary_rerank", "32.0", hammingRerankRecallSql(src)),
      arm("ivf_pq_m4", "64.0", ivfPqRecallSql(20, 5, 2, src = src)),
      arm("ivf_pq_m4_rerank", "64.0",
        ivfPqRecallSql(20, 5, 2, rerankShortlist = Some(20), src = src))
    ) ++ (if (!includeProduction) Nil else Seq(
      arm("ivf_pq_m8_rerank", "32.0",
        ivfPqRecallSql(20, 5, 2, rerankShortlist = Some(20), src = src,
          m = 8, kCodes = 64))))
    ).mkString("\nUNION ALL\n")
  }

  /** The [[graft.operators.Similarity.clusteredFixture]] transform as
    * outer CTEs ending at `cemb(vec_id, embedding)`: the 8x64 ±1 sign
    * centroids (seed 777) inlined as a literal table (the planesSql
    * discipline), then `float32(round(0.75*s + 0.25*x, 6))` per component
    * — both weights exactly representable, so the float arrays are
    * bit-identical across engines and every downstream per-axis replay
    * holds unchanged over the clustered column.
    */
  private lazy val clusteredEmbSqlCtes: String = {
    val rows = signsSqlRows(777, 8, 64)
    s"""csigns(g, s) AS (SELECT * FROM (VALUES $rows) v(g, s)),
       |cemb AS MATERIALIZED (SELECT e.vec_id,
       |  CASE WHEN e.embedding IS NULL THEN NULL ELSE
       |   list_transform(range(1, 65), i ->
       |    CAST(round(0.75::DOUBLE * cl.s[CAST(i AS INT)] +
       |      0.25::DOUBLE * CAST(e.embedding[CAST(i AS INT)] AS DOUBLE), 6)
       |     AS FLOAT)) END AS embedding
       | FROM embeddings e JOIN csigns cl ON cl.g = e.vec_id % 8)""".stripMargin
  }

  /** `compression_tradeoff_clustered` replay: the same six arm bodies,
    * rebased from the raw isotropic `embeddings` onto the clustered `cemb`
    * CTE — full oracle by construction, like the base table.
    */
  private lazy val compressionTradeoffClusteredSql: String =
    s"WITH $clusteredEmbSqlCtes\n" + compressionTradeoffSqlOver("cemb")

  /** The [[graft.operators.Similarity.spectrumFixture]] transform as a CTE
    * ending at `semb(vec_id, embedding)`: the per-dimension decay weights
    * `exp(-d/8)` inlined as one DOUBLE[] literal (StrictMath on the Scala
    * side, so the text round-trips to the identical doubles), then
    * `float32(round(x * w, 6))` per component — the clusteredEmb
    * discipline over a multiplicative weight instead of a centroid pull.
    */
  private lazy val spectrumEmbSqlCtes: String = {
    val w = (0 until 64).map(d => StrictMath.exp(-d.toDouble / 8.0))
      .mkString(",")
    s"""swt(w) AS (SELECT [$w]::DOUBLE[]),
       |semb AS MATERIALIZED (SELECT e.vec_id,
       |  CASE WHEN e.embedding IS NULL THEN NULL ELSE
       |   list_transform(range(1, 65), i ->
       |    CAST(round(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) *
       |      s.w[CAST(i AS INT)], 6) AS FLOAT)) END AS embedding
       | FROM embeddings e CROSS JOIN swt s)""".stripMargin
  }

  /** The [[graft.functions.VectorFunctions.rotationMatrix]](64, 1234)
    * rotation as CTEs over `semb`, ending at `remb(vec_id, embedding)`:
    * the orthonormal rows inlined as a VALUES table (the sign-inlining
    * discipline at full double precision — `Double.toString` text
    * round-trips exactly), each rotated coordinate one sequential
    * `list_dot_product` (= the engine UDF's left-to-right accumulation),
    * rounded to 6dp and cast to float32.
    */
  private lazy val rotatedEmbSqlCtes: String = {
    val mat = graft.functions.VectorFunctions.rotationMatrix(64, 1234L)
    val rows = (0 until 64).map(r => s"($r, [${mat(r).mkString(",")}]::DOUBLE[])")
      .mkString(",\n ")
    s"""rmat(r, w) AS (SELECT * FROM (VALUES $rows) v(r, w)),
       |remb AS MATERIALIZED (SELECT e.vec_id,
       |  list(CAST(round(list_dot_product(m.w, e.v), 6) AS FLOAT)
       |    ORDER BY m.r) AS embedding
       | FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |       FROM semb WHERE embedding IS NOT NULL) e
       | CROSS JOIN rmat m GROUP BY e.vec_id)""".stripMargin
  }

  /** `pq_rotation_tradeoff` replay: the composed IVF-PQ recall body over
    * the spectrum fixture as-is (`semb`) and over its rotated twin
    * (`remb`), each aggregated to one decision-table row — full oracle by
    * construction (the arm bodies ARE the ivf_pq_recall oracle).
    */
  /** One [[graft.operators.Similarity.pqDecisionRow]] as SQL over a
    * recall body — shared by `pq_rotation_tradeoff`'s two arms and
    * `pq_opq_refined`.
    */
  private def pqDecisionArmSql(axis: String, body: String): String =
    s"SELECT '$axis' AS axis, 64.0 AS memory_ratio,\n" +
      " CAST(count(*) AS BIGINT) AS n_queries,\n" +
      " round(CAST(coalesce(sum(n_hit), 0) AS DOUBLE) / (count(*) * 5), 6)" +
      " AS mean_recall\nFROM (\n" + body + "\n) t"

  private lazy val pqRotationTradeoffSql: String =
    s"WITH $spectrumEmbSqlCtes,\n$rotatedEmbSqlCtes\n" +
      pqDecisionArmSql("ivf_pq_m4", ivfPqRecallSql(20, 5, 2, src = "semb")) +
      "\nUNION ALL\n" +
      pqDecisionArmSql("ivf_pq_m4_rotated", ivfPqRecallSql(20, 5, 2, src = "remb"))

  /** `pq_opq_refined` oracle, available once the gate has run in this
    * process: the LEARNED OPQ rotation is a deterministic,
    * content-addressed stored artifact, so its d x d values inline as a
    * literal VALUES table (the [[rotatedEmbSqlCtes]] discipline —
    * `Double.toString` round-trips exactly) and DuckDB replays the
    * entire rotated-corpus IVF-PQ recall body value-for-value. Until
    * the gate runs the key is omitted (the driver contract's rows-only
    * fallback); [[Verify]] and `tools.VerifyOne` both dump
    * oracle_sql.json AFTER running the queries, so the driver's compare
    * always sees the full oracle.
    */
  private def opqRefinedOracle: Map[String, String] =
    Option(lastOpqRotation.get).map { mat =>
      val rows = mat.indices.map(r =>
        s"($r, [${mat(r).mkString(",")}]::DOUBLE[])").mkString(",\n ")
      val ctes =
        s"""omat(r, w) AS (SELECT * FROM (VALUES $rows) v(r, w)),
           |oemb AS MATERIALIZED (SELECT e.vec_id,
           |  list(CAST(round(list_dot_product(m.w, e.v), 6) AS FLOAT)
           |    ORDER BY m.r) AS embedding
           | FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           |       FROM semb WHERE embedding IS NOT NULL) e
           | CROSS JOIN omat m GROUP BY e.vec_id)""".stripMargin
      "pq_opq_refined" ->
        (s"WITH $spectrumEmbSqlCtes,\n$ctes\n" +
          pqDecisionArmSql("ivf_pq_m4_opq",
            ivfPqRecallSql(20, 5, 2, src = "oemb")))
    }.toMap

  /** Profile.datasetCard replay: the quality CTEs (shared with
    * quality_score), the lang_id pick chain, exact count aggregates,
    * DECIMAL-summed quality mean, and the fixed language-share rows —
    * factored out so `dataset_card_storage` can wrap the same body.
    */
  private lazy val datasetCardSqlStr: String = {
    val langVals = (TextAnalysis.LangMarkers.map(_._1) :+ "unknown")
      .map(l => s"('$l')").mkString(", ")
    s"""WITH $qualitySqlCtes,
       |${langPickCtes("")},
       |base AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(coalesce(sum(CASE WHEN text IS NULL OR len(trim(text)) = 0
       |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_empty,
       |  CAST(coalesce(sum(CASE WHEN text IS NOT NULL
       |    THEN len($toksSql) ELSE 0 END), 0) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(sum(CASE WHEN text IS NOT NULL
       |    THEN len(text) ELSE 0 END), 0) AS BIGINT) AS n_chars,
       |  CAST(count(DISTINCT text) AS BIGINT) AS n_distinct,
       |  CAST(coalesce(sum(CASE WHEN text IS NOT NULL THEN 1 ELSE 0 END),
       |    0) AS BIGINT) AS n_nonnull
       | FROM documents),
       |qagg AS (SELECT
       |  CAST(sum(CAST(s.quality AS DECIMAL(18,6))) AS DOUBLE) AS qsum,
       |  CAST(count(s.quality) AS BIGINT) AS qn
       | FROM qscore s JOIN qt USING (doc_id) WHERE qt.text IS NOT NULL),
       |lc AS (SELECT predicted_lang, CAST(count(*) AS BIGINT) AS n
       | FROM pick GROUP BY 1)
       |SELECT 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM base
       |UNION ALL SELECT 'n_empty_docs', CAST(n_empty AS DOUBLE) FROM base
       |UNION ALL SELECT 'n_tokens', CAST(n_tokens AS DOUBLE) FROM base
       |UNION ALL SELECT 'mean_doc_tokens', CASE WHEN n_docs > 0
       |  THEN round(CAST(n_tokens AS DOUBLE) / n_docs, 6) END FROM base
       |UNION ALL SELECT 'mean_doc_chars', CASE WHEN n_docs > 0
       |  THEN round(CAST(n_chars AS DOUBLE) / n_docs, 6) END FROM base
       |UNION ALL SELECT 'exact_text_dup_rate', CASE WHEN n_nonnull > 0
       |  THEN round(CAST(n_nonnull - n_distinct AS DOUBLE) / n_nonnull, 6)
       |  END FROM base
       |UNION ALL SELECT 'mean_quality', CASE WHEN qn > 0
       |  THEN round(qsum / qn, 6) END FROM base CROSS JOIN qagg
       |UNION ALL SELECT 'lang_share_' || l.l,
       |  CASE WHEN b.n_docs > 0
       |   THEN round(CAST(coalesce(c.n, 0) AS DOUBLE) / b.n_docs, 6) END
       | FROM (VALUES $langVals) l(l)
       |  LEFT JOIN lc c ON c.predicted_lang = l.l CROSS JOIN base b""".stripMargin
  }

  private lazy val sq8RecallSqlStr: String = sq8RecallSql("embeddings")

  private def sq8RecallSql(src: String): String =
    s"""WITH qv AS (SELECT vec_id AS qid, embedding AS v FROM $src
       | WHERE vec_id < 20),
       |cv AS (SELECT vec_id AS id, embedding AS v FROM $src),
       |mq AS (SELECT qid, v,
       |  list_max(list_transform(v, x -> abs(CAST(x AS DOUBLE)))) AS mx
       | FROM qv),
       |mc AS (SELECT id, v,
       |  list_max(list_transform(v, x -> abs(CAST(x AS DOUBLE)))) AS mx
       | FROM cv),
       |cq AS (SELECT qid, CASE WHEN mx > 0 THEN
       |   list_transform(v, x -> CAST(round(CAST(x AS DOUBLE) * 127 / mx) AS BIGINT))
       |  ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS c FROM mq),
       |cc AS (SELECT id, CASE WHEN mx > 0 THEN
       |   list_transform(v, x -> CAST(round(CAST(x AS DOUBLE) * 127 / mx) AS BIGINT))
       |  ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS c FROM mc),
       |exact AS (SELECT qid, id FROM (
       | SELECT qv.qid, cv.id, row_number() OVER (PARTITION BY qv.qid ORDER BY
       |   round(${cosOf("qv.v", "cv.v")}, 6) DESC, cv.id) AS rn
       | FROM qv, cv WHERE cv.id <> qv.qid) q WHERE rn <= 5),
       |approx AS (SELECT qid, id FROM (
       | SELECT cq.qid, cc.id, row_number() OVER (PARTITION BY cq.qid ORDER BY
       |   round(CASE WHEN list_dot_product(cq.c, cq.c) > 0
       |      AND list_dot_product(cc.c, cc.c) > 0 THEN
       |     CAST(list_dot_product(cq.c, cc.c) AS DOUBLE) /
       |      (sqrt(CAST(list_dot_product(cq.c, cq.c) AS DOUBLE)) *
       |       sqrt(CAST(list_dot_product(cc.c, cc.c) AS DOUBLE))) END, 6)
       |    DESC, cc.id) AS rn
       | FROM cq, cc WHERE cc.id <> cq.qid) q WHERE rn <= 5)
       |SELECT e.qid,
       | CAST(coalesce(sum(CASE WHEN a.id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_hit,
       | round(CAST(coalesce(sum(CASE WHEN a.id IS NOT NULL THEN 1 END), 0) AS DOUBLE) / 5, 6) AS recall
       |FROM exact e LEFT JOIN approx a ON a.qid = e.qid AND a.id = e.id
       |GROUP BY e.qid""".stripMargin

  /** Full replay of [[graft.operators.Similarity.ivfPqRecall]] — the
    * COMPOSED IVF-PQ search path: [[ivfCtes]]'s micro-unit IVF training +
    * `assign`, per-subspace round-6 k-means codebooks over the EXACT
    * unit-normalized vectors ([[kmeansCtesOver]] with `from = unitv`, the
    * `Pq.train(__unit)` arm of `ivfPqIndex`), per-query probe-cell
    * ranking, left-to-right ADC sums over code lookups, and the recall
    * join against the exact cosine top-k (self excluded both arms).
    * Returns pre-stripped SQL — concatenate, never re-stripMargin (the
    * `||` hazard).
    */
  private def ivfPqRecallSql(nQueries: Int, k: Int, nProbe: Int,
                             rerankShortlist: Option[Int] = None,
                             src: String = "embeddings",
                             m: Int = 4, kCodes: Int = 8): String = {
    val subDim = 64 / m
    require(m * subDim == 64, s"m=$m must divide dim 64")
    val maxIter = 5
    val unit =
      s"""unitv AS MATERIALIZED (SELECT vec_id, embedding,
         | list_transform(embedding::DOUBLE[], x ->
         |   x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS u
         | FROM $src WHERE embedding IS NOT NULL)""".stripMargin
    val books = (0 until m).map(j =>
      kmeansCtesOver(s"u${j}_", s"u[${j * subDim + 1}:${(j + 1) * subDim}]",
        kCodes, 2, subDim, from = "unitv")).mkString(",\n")
    val cds = (0 until m).map(j =>
      s"""ucd$j AS (SELECT vec_id, cluster AS code FROM (
         |  SELECT e.vec_id, c.cluster, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${kmeansD2("e", "c", subDim)} ASC, c.cluster ASC) AS rn
         |  FROM u${j}_e e CROSS JOIN u${j}_c2 c) WHERE rn = 1)""".stripMargin)
      .mkString(",\n")
    val adcs = (0 until m).map { j =>
      val off = j * subDim
      val diff = s"list_transform(range(1, ${subDim + 1}), i -> " +
        s"q.u[CAST(i AS INT) + $off] - c.v[CAST(i AS INT)])"
      s"""adc$j AS (SELECT q.qid, c.cluster AS code,
         |  list_dot_product($diff, $diff) AS d
         | FROM qsv q CROSS JOIN u${j}_c2 c)""".stripMargin
    }.mkString(",\n")
    val probeDiff = "list_transform(range(1, 65), j -> " +
      "cdt.c[CAST(j AS INT)] - q.u[CAST(j AS INT)])"
    val qsv =
      s"qsv AS (SELECT vec_id AS qid, u FROM unitv WHERE vec_id < $nQueries)"
    val codeCols = (0 until m)
      .map(j => s"c$j.code AS k$j").mkString(", ")
    val codeJoins = (1 until m)
      .map(j => s"JOIN ucd$j c$j USING (vec_id)").mkString("\n  ")
    val adcJoins = (0 until m)
      .map(j => s"JOIN adc$j a$j ON a$j.qid = p.qid AND a$j.code = kk.k$j")
      .mkString("\n  ")
    val adcSum = (0 until m).map(j => s"a$j.d").mkString(" + ")
    val tail =
      s"""codes AS (SELECT c0.vec_id, $codeCols
         | FROM ucd0 c0 $codeJoins),
         |cdt AS (SELECT cell,
         |  list_transform(cq, x -> CAST(x AS DOUBLE) / 1000000.0) AS c
         | FROM cents$maxIter),
         |probe AS (SELECT qid, cell FROM (
         | SELECT q.qid, cdt.cell, row_number() OVER (PARTITION BY q.qid
         |   ORDER BY list_dot_product($probeDiff, $probeDiff), cdt.cell) AS rn
         | FROM cdt CROSS JOIN qsv q) WHERE rn <= $nProbe),
         |scored AS (SELECT p.qid, kk.vec_id,
         |  round($adcSum, 6) AS adc
         | FROM codes kk JOIN assign a ON a.vec_id = kk.vec_id
         |  JOIN probe p ON p.cell = a.cell
         |  $adcJoins
         | WHERE kk.vec_id <> p.qid),
         |${rerankShortlist match {
           case None =>
             s"""apx AS (SELECT qid, vec_id AS id FROM (
                | SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
                |   ORDER BY adc, vec_id) AS rn FROM scored) WHERE rn <= $k)"""
               .stripMargin
           case Some(s) =>
             // ADC shortlist of `s`, then exact-cosine rerank to k — the
             // ivfPqRerankRecall deployment recipe.
             s"""shortl AS (SELECT qid, vec_id AS id FROM (
                | SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
                |   ORDER BY adc, vec_id) AS rn FROM scored) WHERE rn <= $s),
                |apx AS (SELECT qid, id FROM (
                | SELECT sl.qid, sl.id, row_number() OVER (PARTITION BY sl.qid
                |   ORDER BY round(${cosOf("qe.embedding", "ce.embedding")}, 6)
                |    DESC, sl.id) AS rn
                | FROM shortl sl JOIN $src qe ON qe.vec_id = sl.qid
                |  JOIN $src ce ON ce.vec_id = sl.id) q WHERE rn <= $k)"""
               .stripMargin
         }},
         |eqv AS (SELECT vec_id AS qid, embedding AS v FROM $src
         | WHERE vec_id < $nQueries AND embedding IS NOT NULL),
         |ecv AS (SELECT vec_id AS id, embedding AS v FROM $src
         | WHERE embedding IS NOT NULL),
         |exct AS (SELECT qid, id FROM (
         | SELECT eqv.qid, ecv.id, row_number() OVER (PARTITION BY eqv.qid
         |   ORDER BY round(${cosOf("eqv.v", "ecv.v")}, 6) DESC, ecv.id) AS rn
         | FROM eqv, ecv WHERE ecv.id <> eqv.qid) q WHERE rn <= $k)
         |SELECT e.qid,
         | CAST(coalesce(sum(CASE WHEN a.id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_hit,
         | round(CAST(coalesce(sum(CASE WHEN a.id IS NOT NULL THEN 1 END), 0) AS DOUBLE) / $k, 6) AS recall
         |FROM exct e LEFT JOIN apx a ON a.qid = e.qid AND a.id = e.id
         |GROUP BY e.qid""".stripMargin
    s"WITH ${ivfCtes(8, maxIter, 64, 42L, src = src)},\n" + unit + ",\n" +
      books + ",\n" + cds + ",\n" + qsv + ",\n" + adcs + ",\n" + tail
  }

  private val toksSql =
    "list_filter(string_split(lower(text), ' '), x -> len(x) > 0)"

  /** CTE chain replaying [[graft.plans.SimhashExpr]] over the planted
    * simhash corpus, ending in `quarters(doc_id, q0..q3)` — the four
    * PACKED 16-bit fingerprint quarters (exact integer bit votes from the
    * md5-derived token hash). Shared by the `dedup_simhash` pair oracle
    * and the `dedup_simhash_eval` recall audit; the packed form keeps the
    * all-pairs scan at two BIGINT ops per pair, sf0.1-replayable in
    * sub-second time where a per-bit join is ~64x the volume.
    */
  private lazy val simhashQuartersSql: String =
    s"""corpus AS (SELECT doc_id, text FROM documents
       | UNION ALL
       | SELECT doc_id + 100000, text || ' extra' FROM documents WHERE doc_id % 7 = 0),
       |tk AS (SELECT doc_id, unnest($toksSql) AS tok FROM corpus),
       |th AS (SELECT doc_id,
       |  CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h1,
       |  CAST(('0x' || substr(md5(tok), 9, 8)) AS BIGINT) AS h2 FROM tk),
       |votes AS (SELECT doc_id, j,
       |  sum(CASE WHEN (CASE WHEN j < 32 THEN h2 >> j ELSE h1 >> (j - 32) END) & 1 = 1
       |      THEN 1 ELSE -1 END) AS v
       | FROM th CROSS JOIN range(0, 64) r(j) GROUP BY 1, 2),
       |bits AS (
       | SELECT c.doc_id, r.j AS j,
       |  CASE WHEN coalesce(v.v, 0) > 0 THEN 1 ELSE 0 END AS bit
       | FROM corpus c CROSS JOIN range(0, 64) r(j)
       | LEFT JOIN votes v ON v.doc_id = c.doc_id AND v.j = r.j),
       |quarters AS MATERIALIZED (
       | SELECT doc_id,
       |  CAST(sum(CASE WHEN j < 16 THEN bit << j ELSE 0 END) AS BIGINT) AS q0,
       |  CAST(sum(CASE WHEN j >= 16 AND j < 32 THEN bit << (j - 16) ELSE 0 END) AS BIGINT) AS q1,
       |  CAST(sum(CASE WHEN j >= 32 AND j < 48 THEN bit << (j - 32) ELSE 0 END) AS BIGINT) AS q2,
       |  CAST(sum(CASE WHEN j >= 48 THEN bit << (j - 48) ELSE 0 END) AS BIGINT) AS q3
       | FROM bits GROUP BY doc_id)""".stripMargin

  /** CTE chain computing the TextAnalysis.qualityScore formula, ending in
    * `qscore(doc_id, quality)` — shared by the corpus-mix oracles so the
    * ranking arithmetic stays byte-identical with `quality_score`'s.
    */
  /** DSIR importance-weight CTE chain ending in `w(doc_id, n_feats,
    * log_weight)` — the exact mirror of `Dsir.importanceWeights` on
    * `documents` with target = `doc_id % 5 = 0`, shared by the
    * `dsir_weights` and `dsir_budget_pack` oracles.
    */
  /** Shared by `session_window_events` (batch) and
    * `streaming_session_window` (streaming engine) — identical output
    * contract, one oracle for both execution paths.
    */
  private lazy val sessionWindowSql: String =
    """WITH flagged AS (
      | SELECT user_id, epoch_us(ts) AS tsu, value,
      |  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_s
      | FROM events
      | WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))),
      |sess AS (
      | SELECT user_id, tsu, value,
      |  CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tsu ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      | FROM flagged)
      |SELECT user_id, MIN(tsu) AS start_us, MAX(tsu) + 1800000000 AS end_us,
      | COUNT(*) AS n_events,
      | CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      |FROM sess GROUP BY user_id, sid""".stripMargin

  private lazy val dsirWeightsSqlCtes: String =
    s"""t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |f AS (SELECT doc_id, f FROM (
       |  SELECT doc_id, list_concat(
       |    list_transform(toks, x -> 'u:' || x),
       |    list_transform(range(1, len(toks)), i -> 'b:' || toks[i] || ' ' || toks[i + 1])
       |  ) AS fs FROM t), UNNEST(fs) AS u(f)),
       |tf AS (SELECT doc_id, f, count(*) AS tf FROM f GROUP BY 1, 2),
       |rawc AS (SELECT f, sum(tf) AS cr FROM tf GROUP BY 1),
       |tgtc AS (SELECT f, count(*) AS ct FROM f WHERE doc_id % 5 = 0 GROUP BY 1),
       |tot AS (SELECT (SELECT sum(cr) FROM rawc) AS tr,
       |  (SELECT sum(ct) FROM tgtc) AS tt,
       |  (SELECT count(*) FROM (SELECT f FROM rawc UNION SELECT f FROM tgtc)) AS v),
       |w AS (SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_feats,
       |  round(sum(tf.tf * (ln((coalesce(tgtc.ct, 0) + 0.5) / (tot.tt + tot.v * 0.5))
       |    - ln((rawc.cr + 0.5) / (tot.tr + tot.v * 0.5)))), 6) AS log_weight
       | FROM tf JOIN rawc USING (f) LEFT JOIN tgtc USING (f) CROSS JOIN tot
       | GROUP BY 1)""".stripMargin

  /** Shared language-pick replay (TextAnalysis.langId): CTEs
    * `<p>lt(doc_id, toks)`, `<p>lh(doc_id, hits_*)`, and
    * `<p>pick(doc_id, predicted_lang)` — used by BOTH the lang_id and
    * dataset_card oracles, so the marker list / tie-break / unknown
    * handling is edited in exactly one place (the qualitySqlCtes
    * precedent).
    */
  private def langPickCtes(p: String): String = {
    val markers = TextAnalysis.LangMarkers
    val hitCols = markers.map { case (lang, ms) =>
      val list = ms.map(m => s"'$m'").mkString(", ")
      s"len(list_filter(toks, x -> x IN ($list))) AS hits_$lang"
    }.mkString(",\n  ")
    val langs = markers.map(_._1)
    val greatestExpr = s"greatest(${langs.map("hits_" + _).mkString(", ")})"
    val caseArms = langs.map(l => s"WHEN hits_$l = $greatestExpr THEN '$l'")
      .mkString("\n  ")
    s"""${p}lt AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |${p}lh AS (SELECT doc_id,
       |  $hitCols
       | FROM ${p}lt),
       |${p}pick AS (SELECT doc_id, CASE WHEN $greatestExpr = 0 THEN 'unknown'
       |  $caseArms
       |  ELSE 'unknown' END AS predicted_lang FROM ${p}lh)""".stripMargin
  }

  private val qualitySqlCtes = {
    val stop = graft.operators.TextAnalysis.QualityStopwords.map(w => s"'$w'").mkString(", ")
    s"""qt AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
       |qm AS (SELECT doc_id,
       |  CAST(len(text) AS DOUBLE) AS n_chars,
       |  CAST(len(toks) AS DOUBLE) AS n_toks,
       |  CAST(list_reduce(list_prepend(0, list_transform(toks, x -> len(x))), (a, b) -> a + b) AS DOUBLE) AS tok_chars,
       |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) AS punct,
       |  CAST(len(list_filter(toks, x -> x IN ($stop))) AS DOUBLE) AS stop_hits
       | FROM qt),
       |qr AS (SELECT doc_id, n_chars,
       |  CASE WHEN n_toks > 0 THEN tok_chars / n_toks ELSE 0.0 END AS mean_tok_len,
       |  CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0.0 END AS punct_ratio,
       |  CASE WHEN n_toks > 0 THEN stop_hits / n_toks ELSE 0.0 END AS stop_ratio
       | FROM qm),
       |qscore AS (SELECT doc_id,
       |  round(least(n_chars / 500.0, 1.0) * 0.4 +
       |   (CASE WHEN mean_tok_len >= 3.0 AND mean_tok_len <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.3 +
       |   (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.2 +
       |   least(stop_ratio * 5.0, 1.0) * 0.1, 6) AS quality
       | FROM qr)""".stripMargin
  }

  /** Unrolled logistic-regression training + scoring CTEs mirroring
    * `Classifier.fitLogistic`/`scoreLogistic` (feature CTEs byte-identical
    * to the quality_score oracle; zero init, left-to-right z,
    * round(w - lr*g, 6) per iteration), ending at `scored(doc_id, y, prob)`
    * — shared by `quality_classifier` and `classifier_auc`.
    */
  private val classifierScoredSqlCtes: String = {
    val stop = graft.operators.TextAnalysis.QualityStopwords
      .map(w => s"'$w'").mkString(", ")
    def zf(w: String) = s"($w.b + $w.w1 * x1 + $w.w2 * x2 + $w.w3 * x3)"
    def step(n: Int): String = {
      val prev = s"w${n - 1}"
      s"""g$n AS (SELECT avg(s - y) AS g0, avg((s - y) * x1) AS g1,
         |  avg((s - y) * x2) AS g2, avg((s - y) * x3) AS g3
         | FROM (SELECT y, x1, x2, x3,
         |    1.0 / (1.0 + exp(-${zf(prev)})) AS s
         |   FROM f CROSS JOIN $prev)),
         |w$n AS (SELECT round($prev.b - 1.0 * g$n.g0, 6) AS b,
         |  round($prev.w1 - 1.0 * g$n.g1, 6) AS w1,
         |  round($prev.w2 - 1.0 * g$n.g2, 6) AS w2,
         |  round($prev.w3 - 1.0 * g$n.g3, 6) AS w3
         | FROM $prev CROSS JOIN g$n)""".stripMargin
    }
    s"""t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
       |m AS (SELECT doc_id,
       |  CAST(len(text) AS DOUBLE) AS n_chars,
       |  CAST(len(toks) AS DOUBLE) AS n_toks,
       |  CAST(list_reduce(list_prepend(0, list_transform(toks, x -> len(x))), (a, b) -> a + b) AS DOUBLE) AS tok_chars,
       |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) AS punct,
       |  CAST(len(list_filter(toks, x -> x IN ($stop))) AS DOUBLE) AS stop_hits
       | FROM t),
       |r AS (SELECT doc_id,
       |  CASE WHEN n_toks > 0 THEN tok_chars / n_toks ELSE 0.0 END AS mean_tok_len,
       |  CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0.0 END AS punct_ratio,
       |  CASE WHEN n_toks > 0 THEN stop_hits / n_toks ELSE 0.0 END AS stop_ratio
       | FROM m),
       |f AS (SELECT r.doc_id, round(mean_tok_len, 6) AS x1,
       |  round(punct_ratio, 6) AS x2, round(stop_ratio, 6) AS x3,
       |  CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END AS y
       | FROM r JOIN documents d USING (doc_id)),
       |w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
       |${step(1)},
       |${step(2)},
       |scored AS (SELECT f.doc_id, y, round(1.0 / (1.0 + exp(-${zf("w2")})), 6) AS prob
       | FROM f CROSS JOIN w2)""".stripMargin
  }

  /** GPT-3-appendix-C 13-gram decontamination — shared by the exact
    * (`decontamination`) and Bloom-prefiltered (`decontamination_bloom`)
    * gates, which must agree row for row.
    */
  /** Shared BM25 oracle pieces (used by `bm25_rank` and the RRF hybrid):
    * the CTE chain ends at per-(doc, term) tf + per-term doc frequency; the
    * select applies the Lucene idf and k1/b = 1.2/0.75 saturation.
    */
  private val bm25Ctes =
    s"""tk AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
       |dl AS (SELECT d.doc_id, CAST(count(t.term) AS INT) AS dlen
       | FROM documents d LEFT JOIN tk t USING (doc_id) GROUP BY d.doc_id),
       |stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
       |  coalesce(avg(dlen), 0.0) AS avgdl FROM dl),
       |tfq AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       | FROM tk WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2),
       |dfreq AS (SELECT term, count(*) AS doc_freq FROM tfq GROUP BY 1)""".stripMargin

  private val bm25Select =
    """SELECT tfq.doc_id, CAST(count(*) AS BIGINT) AS matched_terms,
      |  round(sum(ln((stats.n_docs - dfreq.doc_freq + 0.5)
      |      / (dfreq.doc_freq + 0.5) + 1.0)
      |    * (tfq.tf * 2.2) / (tfq.tf + 1.2 * (0.25 + 0.75 * dl.dlen / stats.avgdl))
      |  ), 6) AS bm25
      |FROM tfq JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
      |GROUP BY tfq.doc_id""".stripMargin

  /** Shared CTE chain for the exact-substring span-dedup oracles: corpus +
    * planted %7 copies -> 20-token window md5 fingerprints with positions ->
    * non-first duplicated windows -> gaps-and-islands interval merge.
    */
  private val spanDedupCtes = {
    val catW = (0 until 20).map(k => s"toks[i+$k]").mkString(" || ' ' || ")
    s"""WITH docs AS (SELECT doc_id, text FROM documents
       | UNION ALL
       | SELECT doc_id + 100000, text || ' extra' FROM documents WHERE doc_id % 7 = 0),
       |t AS (SELECT doc_id, $toksSql AS toks FROM docs),
       |wins AS (SELECT doc_id, i - 1 AS s, md5($catW) AS fp
       |  FROM t, UNNEST(range(1, len(toks) - 18)) AS u(i)),
       |ranked AS (SELECT doc_id, s, count(*) OVER (PARTITION BY fp) AS n,
       |  row_number() OVER (PARTITION BY fp ORDER BY doc_id, s) AS rn FROM wins),
       |marked AS (SELECT doc_id, s AS st, s + 20 AS fin
       |  FROM ranked WHERE n >= 2 AND rn > 1),
       |pm AS (SELECT doc_id, st, fin, max(fin) OVER (PARTITION BY doc_id
       |   ORDER BY st, fin ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
       |  FROM marked),
       |isl AS (SELECT doc_id, st, fin,
       |  sum(CASE WHEN st > coalesce(prev_max, -1) THEN 1 ELSE 0 END)
       |   OVER (PARTITION BY doc_id ORDER BY st, fin ROWS UNBOUNDED PRECEDING) AS island
       |  FROM pm),
       |spans AS (SELECT doc_id, CAST(min(st) AS BIGINT) AS span_start,
       |   CAST(max(fin) AS BIGINT) AS span_end FROM isl GROUP BY doc_id, island)""".stripMargin
  }

  private val spanDedupSpansSql =
    spanDedupCtes + "\nSELECT doc_id, span_start, span_end FROM spans"

  private val decontaminationSql = {
    val catTerms = (0 until 13).map(k => s"toks[i+$k]").mkString(" || ' ' || ")
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |s AS (SELECT doc_id, list_distinct(
       |  CASE WHEN len(toks) >= 13
       |   THEN list_transform(range(1, len(toks) - 11), i -> $catTerms)
       |   ELSE []::VARCHAR[] END) AS sh FROM t),
       |e AS (SELECT DISTINCT unnest(sh) AS g FROM s WHERE doc_id % 97 = 0),
       |dg AS (SELECT doc_id, unnest(sh) AS g FROM s),
       |m AS (SELECT dg.doc_id, count(DISTINCT dg.g) AS matched
       |      FROM dg JOIN e ON dg.g = e.g GROUP BY dg.doc_id)
       |SELECT d.doc_id, coalesce(m.matched, 0) AS matched_grams,
       | coalesce(m.matched, 0) > 0 AS contaminated
       |FROM (SELECT DISTINCT doc_id FROM documents) d
       |LEFT JOIN m ON d.doc_id = m.doc_id""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_revenue" ->
      """SELECT o.o_orderkey,
        | CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY o.o_orderkey
        |ORDER BY revenue DESC, o.o_orderkey
        |LIMIT 10""".stripMargin,

    "q5_nation_revenue" ->
      """SELECT n.n_name,
        | CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |GROUP BY n.n_name""".stripMargin,

    "q6_filtered_revenue" ->
      """SELECT
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        | AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
        | AND EXISTS (SELECT 1 FROM lineitem l
        |             WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin,

    "window_top_lineitems" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, rn FROM (
        | SELECT l_suppkey, l_orderkey, l_linenumber,
        |  row_number() OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
        | FROM lineitem) WHERE rn <= 3""".stripMargin,

    "source_scan" ->
      """SELECT doc_id, source, text, sha256(text) AS fingerprint
        |FROM documents WHERE len(trim(text)) > 0""".stripMargin,

    "jsonl_parse" ->
      """SELECT 'mem#' || CAST(doc_id AS VARCHAR) AS source, text AS content,
        | sha256(text) AS fingerprint, lang AS meta_lang
        |FROM documents WHERE len(trim(text)) > 0""".stripMargin,

    // Direct-rendered mirror of ChatTemplate.render over the same halves:
    // the engine's JSON round trip must be character-faithful to match.
    "chat_template" ->
      """WITH p AS (SELECT doc_id, string_split(text, ' ') AS parts FROM documents),
        |d AS (SELECT doc_id, parts, len(parts) AS n,
        |  CAST(floor((len(parts) + 1) / 2.0) AS INT) AS k FROM p)
        |SELECT doc_id,
        | '<|im_start|>system' || chr(10) || 'You are a helpful assistant.<|im_end|>' || chr(10)
        |  || '<|im_start|>user' || chr(10) || array_to_string(parts[1:k], ' ')
        |  || '<|im_end|>' || chr(10)
        |  || '<|im_start|>assistant' || chr(10) || array_to_string(parts[k+1:n], ' ')
        |  || '<|im_end|>' || chr(10) AS chat_text,
        | CAST(3 AS BIGINT) AS n_turns,
        | 'system,user,assistant' AS roles
        |FROM d""".stripMargin,

    // renderLlama2 replay: the single <s>…</s> block with the system fold.
    "chat_template_llama" ->
      """WITH p AS (SELECT doc_id, string_split(text, ' ') AS parts FROM documents),
        |d AS (SELECT doc_id, parts, len(parts) AS n,
        |  CAST(floor((len(parts) + 1) / 2.0) AS INT) AS k FROM p)
        |SELECT doc_id,
        | '<s>[INST] <<SYS>>' || chr(10) || 'You are a helpful assistant.'
        |  || chr(10) || '<</SYS>>' || chr(10) || chr(10)
        |  || array_to_string(parts[1:k], ' ') || ' [/INST] '
        |  || array_to_string(parts[k+1:n], ' ') || ' </s>' AS chat_text,
        | CAST(1 AS BIGINT) AS n_pairs, true AS has_system
        |FROM d""".stripMargin,

    // Span arithmetic from the conversation halves: turn overhead is 24
    // chars (sentinels + newlines), content starts 13 + len(role) + 1
    // chars into its turn. before(assistant) = 58 (system turn) +
    // 28 + len(user half); start = before + 23.
    "chat_loss_mask" ->
      """WITH p AS (SELECT doc_id, string_split(text, ' ') AS parts
        |  FROM documents WHERE text IS NOT NULL),
        |d AS (SELECT doc_id, parts, len(parts) AS n,
        |  CAST(floor((len(parts) + 1) / 2.0) AS INT) AS k FROM p),
        |h AS (SELECT doc_id,
        |  len(array_to_string(parts[1:k], ' ')) AS lu,
        |  len(array_to_string(parts[k+1:n], ' ')) AS la
        | FROM d)
        |SELECT doc_id, CAST(3 AS BIGINT) AS turn,
        | CAST(58 + 28 + lu + 23 AS BIGINT) AS span_start,
        | CAST(la AS BIGINT) AS span_len
        |FROM h""".stripMargin,

    // Identity oracle like jsonl_parse: the engine must round-trip every
    // character through real CSV quoting (to_csv -> from_csv) to match.
    "csv_parse" ->
      """SELECT 'mem#' || CAST(doc_id AS VARCHAR) AS source, text AS content,
        | sha256(text) AS fingerprint, lang AS meta_lang
        |FROM documents WHERE len(trim(text)) > 0""".stripMargin,

    // Identity reconstruction of the WARC round trip: skipping the request
    // record, parsing the HTTP envelope, stripping the script block +
    // tags, and decoding &amp; must all be faithful for the content
    // column to match.
    "warc_parse" ->
      """SELECT 'https://example.org/doc/' || CAST(doc_id AS VARCHAR) AS url,
        | '2024-01-01T00:00:00Z' AS capture_time,
        | 'text/html' AS mime,
        | 'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || text || chr(10) || '& fin' AS content
        |FROM documents WHERE text IS NOT NULL""".stripMargin,

    "change_detection" ->
      """WITH state AS (
        | SELECT doc_id AS item_id,
        |  CASE WHEN doc_id % 6 = 0 THEN sha256(text) ELSE sha256(text || 'stale') END AS st_fp
        | FROM documents WHERE doc_id % 3 = 0)
        |SELECT d.doc_id, d.source FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM state s
        |  WHERE s.item_id = d.doc_id AND s.st_fp = sha256(d.text))""".stripMargin,

    "corpus_diff" ->
      """WITH newsnap AS (SELECT doc_id, sha256(text) AS fp, TRUE AS in_new
        |  FROM documents),
        |oldsnap AS (
        | SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 2 THEN sha256(text || 'old') ELSE sha256(text) END AS fp,
        |  TRUE AS in_old
        | FROM documents WHERE doc_id % 5 <> 4
        | UNION ALL
        | SELECT doc_id + 1000000, sha256(text), TRUE FROM documents WHERE doc_id % 50 = 0)
        |SELECT doc_id, status FROM (
        | SELECT doc_id,
        |  CASE WHEN in_old IS NULL THEN 'added'
        |   WHEN in_new IS NULL THEN 'removed'
        |   WHEN o.fp IS DISTINCT FROM n.fp THEN 'changed'
        |   ELSE 'unchanged' END AS status
        | FROM oldsnap o FULL OUTER JOIN newsnap n USING (doc_id))
        |WHERE status <> 'unchanged'""".stripMargin,

    // Mirrors StateStore.scd2Apply over the corpus_diff snapshots: closes
    // (changed/removed at version 2), opens (added/changed), carries
    // (unchanged keep valid_from=1, open-ended). Null-safe fp compare.
    "scd2_history" ->
      s"""WITH $scd2SqlCtes
         |SELECT * FROM hist""".stripMargin,

    "scd2_lookup" ->
      s"""WITH $scd2SqlCtes,
         |probes AS (SELECT doc_id, v FROM documents,
         |  UNNEST([CAST(1 AS BIGINT), CAST(2 AS BIGINT)]) AS u(v))
         |SELECT p.doc_id, p.v, h.fp, h.valid_from, h.valid_to
         |FROM probes p LEFT JOIN hist h ON h.doc_id = p.doc_id
         | AND h.valid_from <= p.v
         | AND (h.valid_to IS NULL OR h.valid_to > p.v)""".stripMargin,

    "state_update" ->
      """WITH old AS (
        | SELECT doc_id AS item_id, sha256(text || 'old') AS fp_old
        | FROM documents WHERE doc_id % 3 = 0),
        |nw AS (
        | SELECT doc_id AS item_id, sha256(text) AS fp_new
        | FROM documents WHERE doc_id % 2 = 0)
        |SELECT COALESCE(old.item_id, nw.item_id) AS item_id,
        | COALESCE(nw.fp_new, old.fp_old) AS fingerprint
        |FROM old FULL OUTER JOIN nw ON old.item_id = nw.item_id""".stripMargin,

    "watermark_filter" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE ts > (SELECT max(ts) - INTERVAL 7 DAY FROM events)""".stripMargin,

    "distinct_sources" ->
      "SELECT DISTINCT source FROM documents",

    // Exact character replay of the FIM transform: same md5 windows for
    // the doc/mode draws (hex-prefix fractions, thresholds from
    // Sampling.hexThreshold(0.5) = '8000') and the two mod-(len+1) split
    // points, same sentinel concatenation.
    "fim_transform" ->
      """WITH h AS (SELECT doc_id, text, len(text) AS n,
        |  md5(CAST(doc_id AS VARCHAR) || 'graft-fim') AS hx FROM documents),
        |p AS (SELECT *,
        |  CAST(CAST(('0x' || substr(hx, 1, 8)) AS BIGINT) % (n + 1) AS INT) AS p1,
        |  CAST(CAST(('0x' || substr(hx, 9, 8)) AS BIGINT) % (n + 1) AS INT) AS p2
        | FROM h),
        |q AS (SELECT doc_id, text, n, hx,
        |  least(p1, p2) AS lo, greatest(p1, p2) AS hi FROM p)
        |SELECT doc_id,
        | CASE WHEN text IS NULL OR hx IS NULL
        |        OR NOT (substr(hx, 17, 4) < '8000') THEN 'none'
        |      WHEN substr(hx, 21, 4) < '8000' THEN 'spm' ELSE 'psm' END AS fim_mode,
        | CASE WHEN text IS NULL OR hx IS NULL
        |        OR NOT (substr(hx, 17, 4) < '8000') THEN text
        |      WHEN substr(hx, 21, 4) < '8000' THEN
        |        '<SUF>' || substr(text, hi + 1, n - hi) || '<PRE>' ||
        |        substr(text, 1, lo) || '<MID>' || substr(text, lo + 1, hi - lo)
        |      ELSE
        |        '<PRE>' || substr(text, 1, lo) || '<SUF>' ||
        |        substr(text, hi + 1, n - hi) || '<MID>' || substr(text, lo + 1, hi - lo)
        | END AS fim_text
        |FROM q""".stripMargin,

    // The status verb's id list survives the JSON backend round trip
    // verbatim; the watermark row is filtered before display.
    "cli_status" ->
      """SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS item_id
        |FROM documents ORDER BY 1""".stripMargin,

    "skew_join" ->
      """SELECT s.s_name,
        | COUNT(*) AS n_items,
        | CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |GROUP BY s.s_name""".stripMargin,

    "windowed_events" ->
      """SELECT (epoch_us(ts) - epoch_us(ts) % 3600000000) AS window_start_us,
        | event_type,
        | COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // The interval self-join replayed in plain SQL: inner stream-stream
    // joins emit exactly the batch-join rows (watermarks only bound
    // state), so this is value-for-value.
    "streaming_interval_join" ->
      """SELECT a.user_id, epoch_us(a.ts) AS a_ts_us, epoch_us(b.ts) AS b_ts_us,
        |  a.event_type AS a_type, b.event_type AS b_type
        |FROM events a JOIN events b
        |ON a.user_id = b.user_id AND b.ts > a.ts
        |  AND epoch_us(b.ts) <= epoch_us(a.ts) + 1800000000""".stripMargin,

    // Outer twin: the matched pairs PLUS null-extended left rows whose
    // join window closed under the terminal watermark max(ts) - 2 h
    // (strict <, the engine's eviction boundary — probe-verified).
    "streaming_interval_join_outer" ->
      """WITH mx AS (SELECT max(epoch_us(ts)) AS m FROM events)
        |SELECT a.user_id, epoch_us(a.ts) AS a_ts_us, epoch_us(b.ts) AS b_ts_us,
        |  a.event_type AS a_type, b.event_type AS b_type
        |FROM events a JOIN events b
        |ON a.user_id = b.user_id AND b.ts > a.ts
        |  AND epoch_us(b.ts) <= epoch_us(a.ts) + 1800000000
        |UNION ALL
        |SELECT a.user_id, epoch_us(a.ts), CAST(NULL AS BIGINT),
        |  a.event_type, CAST(NULL AS VARCHAR)
        |FROM events a, mx
        |WHERE NOT EXISTS (SELECT 1 FROM events b
        |   WHERE b.user_id = a.user_id AND b.ts > a.ts
        |    AND epoch_us(b.ts) <= epoch_us(a.ts) + 1800000000)
        | AND epoch_us(a.ts) + 1800000000 < mx.m - 7200000000""".stripMargin,

    "streaming_windowed" ->
      """SELECT (epoch_us(ts) - epoch_us(ts) % 3600000000) AS window_start_us,
        | event_type,
        | COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // Closed-form oracle for the streaming change-detect + bucketed-merge
    // composition: the plant makes every %5 doc stale in prior state and
    // every %7 doc absent, so detected = exactly that union with the
    // CURRENT sha256 both at emit time and in the post-merge state.
    // `text IS NOT NULL` encodes the hash-failure-is-unchanged contract
    // (changedBucketed drops null fingerprints) rather than relying on
    // the fixture having no null-text %5/%7 docs (r13 advice).
    "streaming_state_detect" ->
      """SELECT doc_id, sha256(text) AS fingerprint, sha256(text) AS fp_after
        |FROM documents
        |WHERE (doc_id % 5 = 0 OR doc_id % 7 = 0) AND text IS NOT NULL""".stripMargin,

    // Same plant, detection only (no merge column): the pruned batch
    // read path must find exactly the stale and absent ids. Null-text
    // guard as in streaming_state_detect.
    "change_detection_bucketed" ->
      """SELECT doc_id, sha256(text) AS fingerprint
        |FROM documents
        |WHERE (doc_id % 5 = 0 OR doc_id % 7 = 0) AND text IS NOT NULL""".stripMargin,

    // Batch-parity oracle for the streaming near-dup path: the stream's
    // verified flags equal the brute-force docs-x-reference cross join at
    // the 0.5 distance threshold (the planted reference is every 7th doc,
    // re-keyed +100000, with a one-word suffix).
    "streaming_neardup" ->
      s"""WITH tn AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |tr AS (SELECT doc_id + 100000 AS doc_id,
         |  list_filter(string_split(lower(text || ' extra'), ' '), x -> len(x) > 0) AS toks
         | FROM documents WHERE doc_id % 7 = 0),
         |sn AS MATERIALIZED (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
         |  THEN list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         |  ELSE []::VARCHAR[] END) AS sh FROM tn),
         |sr AS MATERIALIZED (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
         |  THEN list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         |  ELSE []::VARCHAR[] END) AS sh FROM tr),
         |lnn AS (SELECT doc_id, len(sh) AS l FROM sn),
         |lnr AS (SELECT doc_id, len(sh) AS l FROM sr),
         |en AS (SELECT doc_id, unnest(sh) AS g FROM sn),
         |er AS (SELECT doc_id, unnest(sh) AS g FROM sr),
         |inter AS (SELECT en.doc_id AS id_new, er.doc_id AS id_ref, CAST(count(*) AS DOUBLE) AS ic
         | FROM en JOIN er ON en.g = er.g GROUP BY 1, 2),
         |pairs AS (SELECT x.id_new, x.id_ref,
         |  x.ic / (CAST(a.l + b.l AS DOUBLE) - x.ic) AS sim
         | FROM inter x JOIN lnn a ON a.doc_id = x.id_new JOIN lnr b ON b.doc_id = x.id_ref)
         |SELECT id_new, id_ref, round(1.0 - sim, 6) AS jaccard_dist
         |FROM pairs WHERE 1.0 - sim <= 0.5""".stripMargin,

    "corpus_curation" ->
      """WITH kept AS (
        | SELECT doc_id, source, text FROM documents
        | WHERE len(text) >= 100
        |  AND len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\s]')) >= 20),
        |winners AS (
        | SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text))
        |SELECT k.doc_id, k.source
        |FROM kept k JOIN winners w ON k.doc_id = w.doc_id
        |WHERE substr(md5(CAST(k.doc_id AS VARCHAR) || 'graft'), 1, 4) < '8000'""".stripMargin,

    "range_join_sessions" ->
      """WITH flagged AS (
        | SELECT user_id, epoch_us(ts) AS tsu,
        |  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
        | FROM events WHERE event_type = 'click'
        | WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))),
        |sess AS (
        | SELECT user_id, tsu,
        |  CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tsu ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_index
        | FROM flagged),
        |iv AS (
        | SELECT user_id, session_index, MIN(tsu) AS start_us,
        |  MAX(tsu) + 1800000000 AS end_us
        | FROM sess GROUP BY user_id, session_index)
        |SELECT p.event_id, p.user_id, iv.session_index
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS tsu
        |      FROM events WHERE event_type = 'purchase') p
        |JOIN iv ON p.user_id = iv.user_id AND p.tsu BETWEEN iv.start_us AND iv.end_us""".stripMargin,

    "interval_overlap" -> {
      def sessCtes(tpe: String, p: String) =
        s"""${p}f AS (
           | SELECT user_id, epoch_us(ts) AS tsu,
           |  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
           |        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
           | FROM events WHERE event_type = '$tpe'
           | WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))),
           |${p}s AS (
           | SELECT user_id, tsu,
           |  CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tsu ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_index
           | FROM ${p}f),
           |${p}iv AS (
           | SELECT user_id, session_index, MIN(tsu) AS start_us,
           |  MAX(tsu) + 1800000000 AS end_us
           | FROM ${p}s GROUP BY user_id, session_index)""".stripMargin
      s"""WITH ${sessCtes("click", "c")},
         |${sessCtes("view", "v")}
         |SELECT c.user_id, c.session_index AS c_session, v.session_index AS v_session,
         | greatest(c.start_us, v.start_us) AS overlap_start,
         | least(c.end_us, v.end_us) AS overlap_end
         |FROM civ c JOIN viv v ON c.user_id = v.user_id
         | AND c.start_us <= v.end_us AND v.start_us <= c.end_us""".stripMargin
    },

    "heavy_hitters" ->
      "SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source",
    "streaming_heavy_hitters" ->
      "SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source",

    // Brute-force truth restricted to pairs touching a NEW id (all new ids
    // exceed 100000, so "touches new" is exactly id_b >= 100000 after
    // normalization) — the incremental path must find the same set while
    // only banding the batch.
    "dedup_minhash_incremental" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents
         | UNION ALL
         | SELECT doc_id + 100000, text || ' extra' FROM documents WHERE doc_id % 7 = 0),
         |t AS (SELECT doc_id, $toksSql AS toks FROM corpus),
         |s AS MATERIALIZED (SELECT doc_id, list_distinct(
         |  CASE WHEN len(toks) >= 3
         |   THEN list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         |   ELSE []::VARCHAR[] END) AS sh FROM t),
         |ln AS (SELECT doc_id, len(sh) AS l FROM s),
         |e AS (SELECT doc_id, unnest(sh) AS g FROM s),
         |inter AS (SELECT a.doc_id AS ida, b.doc_id AS idb, CAST(count(*) AS DOUBLE) AS i
         | FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT x.ida AS id_a, x.idb AS id_b
         |FROM inter x JOIN ln la ON la.doc_id = x.ida JOIN ln lb ON lb.doc_id = x.idb
         |WHERE x.i >= 0.5 * (CAST(la.l + lb.l AS DOUBLE) - x.i)
         | AND x.idb >= 100000""".stripMargin,

    "pii_iban" ->
      """WITH c AS (SELECT doc_id,
        |  'DE' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ||
        |  lpad(CAST((doc_id * 37) % 1000000000000 AS VARCHAR), 12, '0')
        |    AS iban FROM documents),
        |r AS (SELECT doc_id, iban,
        |  substr(iban, 5) || substr(iban, 1, 4) AS rot FROM c)
        |SELECT doc_id,
        | regexp_matches(iban, '^[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}$') AND
        | list_reduce(
        |   list_prepend(CAST(0 AS BIGINT),
        |     list_transform(range(1, len(rot) + 1),
        |       i -> CAST(ascii(substr(rot, CAST(i AS INT), 1)) AS BIGINT))),
        |   (acc, v) -> CASE WHEN v BETWEEN 48 AND 57
        |     THEN (acc * 10 + (v - 48)) % 97
        |     ELSE (acc * 100 + (v - 55)) % 97 END) = 1 AS iban_valid
        |FROM r""".stripMargin,

    "embed_truncation" -> {
      def sliced(d: Int, a: String, b: String) =
        cosOf(s"($a::DOUBLE[])[1:$d]", s"($b::DOUBLE[])[1:$d]")
      val perDim = Seq(8, 16, 32).map { d =>
        s"""SELECT CAST($d AS BIGINT) AS dim,
           | CAST(count(*) AS BIGINT) AS k_eff,
           | CAST(sum(CASE WHEN vec_id IN (SELECT vec_id FROM fullk)
           |   THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
           |FROM (SELECT vec_id FROM embeddings, q
           |      ORDER BY ${sliced(d, "embedding", "qv")} DESC, vec_id
           |      LIMIT 10)""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |fullk AS MATERIALIZED (SELECT vec_id FROM embeddings, q
         |  ORDER BY ${cosOf("embedding", "qv")} DESC, vec_id LIMIT 10),
         |perdim AS ($perDim)
         |SELECT dim, k_eff, n_overlap,
         | round(CAST(n_overlap AS DOUBLE) / k_eff, 6) AS overlap
         |FROM perdim""".stripMargin
    },

    "vocab_coverage" -> {
      val perK = Seq(10, 25, 100).map { k =>
        s"""SELECT CAST($k AS BIGINT) AS k,
           | CAST(count(*) AS BIGINT) AS n_top_types,
           | CAST(sum(c) AS BIGINT) AS covered_tokens
           |FROM r WHERE rn <= $k""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
         |c AS (SELECT u AS term, count(*) AS c FROM t, UNNEST(toks) AS x(u)
         |      GROUP BY 1),
         |tot AS (SELECT sum(c) AS tot, CAST(count(*) AS BIGINT) AS n_types
         |        FROM c),
         |r AS (SELECT term, c,
         |       row_number() OVER (ORDER BY c DESC, term) AS rn FROM c),
         |perk AS ($perK)
         |SELECT perk.k, perk.n_top_types, perk.covered_tokens,
         | CAST(tot.tot AS BIGINT) AS total_tokens, tot.n_types,
         | round(CAST(perk.covered_tokens AS DOUBLE) / tot.tot, 6) AS coverage
         |FROM perk, tot""".stripMargin
    },

    "asof_enrich" ->
      """WITH l AS (
        | SELECT event_id, user_id, epoch_us(ts) AS tsu
        | FROM events WHERE event_type = 'purchase'),
        |r AS (
        | SELECT user_id, epoch_us(ts) AS tsu, max(value) AS click_value
        | FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id,
        | coalesce(round(r.click_value, 6), -1.0) AS last_click_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.tsu >= r.tsu""".stripMargin,

    // Same hash rank, same ceil-cumulative boundaries (the double product
    // 0.8 * n is IEEE-identical in both engines, so the ceil agrees even
    // at representation edges like 0.8 * 50).
    "stratified_split" ->
      """WITH r AS (
        | SELECT doc_id, lang,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR) || 'graft'), doc_id) AS rn,
        |  count(*) OVER (PARTITION BY lang) AS n
        | FROM documents)
        |SELECT doc_id, lang,
        | CASE WHEN rn <= CAST(ceil(0.8 * n) AS BIGINT) THEN 'train'
        |      WHEN rn <= CAST(ceil(0.9 * n) AS BIGINT) THEN 'val'
        |      ELSE 'test' END AS split
        |FROM r""".stripMargin,

    // Same quality CTE chain as quality_score; percent_rank has identical
    // (rank-1)/(n-1) tie-sharing semantics in both engines, over the
    // 6-dp-rounded quality so the order agrees exactly.
    "quality_calibrate" ->
      s"""WITH $qualitySqlCtes
         |SELECT q.doc_id, d.source, q.quality,
         | round(percent_rank() OVER (PARTITION BY d.source ORDER BY q.quality), 6) AS pct_rank
         |FROM qscore q JOIN documents d ON q.doc_id = d.doc_id""".stripMargin,

    // Same two-phase median/MAD joins; quantile_cont == Spark's
    // interpolated percentile, and at p=0.5 over integer data the
    // interpolation lands on exact .0/.5 doubles, so the unrounded
    // 3-MAD fence agrees bitwise.
    "length_outliers" ->
      """WITH b AS (SELECT source, CAST(n_chars AS DOUBLE) AS v FROM documents),
        |med AS (SELECT source, quantile_cont(v, 0.5) AS med FROM b GROUP BY 1),
        |mad AS (SELECT b.source, max(med.med) AS med2,
        |  quantile_cont(abs(b.v - med.med), 0.5) AS mad
        | FROM b JOIN med USING (source) GROUP BY b.source)
        |SELECT b.source, count(*) AS n,
        | round(max(mad.med2), 6) AS med_v,
        | round(max(mad.mad), 6) AS mad_v,
        | CAST(sum(CASE WHEN abs(b.v - mad.med2) > 3.0 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        | round(CAST(sum(CASE WHEN abs(b.v - mad.med2) > 3.0 * mad.mad THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS outlier_frac
        |FROM b JOIN mad USING (source) GROUP BY b.source""".stripMargin,

    "sample_split" ->
      """WITH h AS (
        | SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 4) AS hp
        | FROM documents)
        |SELECT CASE WHEN hp < 'cccc' THEN 'train'
        |            WHEN hp < 'e666' THEN 'val'
        |            ELSE 'test' END AS split,
        | COUNT(*) AS n_docs, MIN(doc_id) AS min_id
        |FROM h GROUP BY 1""".stripMargin,

    "corpus_shuffle" ->
      """SELECT doc_id, lang,
        | row_number() OVER (
        |   ORDER BY md5(CAST(doc_id AS VARCHAR) || ' ' || 'epoch0'), doc_id) - 1
        |   AS shuffle_pos
        |FROM documents""".stripMargin,

    "event_percentiles" ->
      """SELECT event_type, COUNT(*) AS n,
        | round(quantile_cont(value, 0.5), 6) AS p50,
        | round(quantile_cont(value, 0.9), 6) AS p90,
        | round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type""".stripMargin,

    "event_dispersion" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |  CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS np,
        |  CAST(sum(n) AS BIGINT) AS s, CAST(sum(n * n) AS BIGINT) AS s2
        | FROM daily GROUP BY 1)
        |SELECT event_type, np AS n_points,
        | round(CAST(s AS DOUBLE) / np, 6) AS mean,
        | CASE WHEN np > 1
        |  THEN round(CAST(np * s2 - s * s AS DOUBLE) / (np * (np - 1)), 6)
        |  ELSE 0.0 END AS variance,
        | CASE WHEN np > 1 AND s > 0
        |  THEN round(CAST(np * s2 - s * s AS DOUBLE) / (np * (np - 1)) /
        |    (CAST(s AS DOUBLE) / np), 6)
        |  ELSE 0.0 END AS fano
        |FROM a""".stripMargin,

    "changepoint_cusum" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |  CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, day,
        |  count(*) OVER (PARTITION BY event_type) *
        |   sum(n) OVER (PARTITION BY event_type ORDER BY day
        |     ROWS UNBOUNDED PRECEDING) -
        |  row_number() OVER (PARTITION BY event_type ORDER BY day) *
        |   sum(n) OVER (PARTITION BY event_type) AS stat,
        |  count(*) OVER (PARTITION BY event_type) AS np
        | FROM daily),
        |r AS (SELECT event_type, day, stat, np, row_number() OVER (
        |  PARTITION BY event_type ORDER BY abs(stat) DESC, day ASC) AS rk FROM s)
        |SELECT event_type, day AS changepoint_day,
        | CAST(stat AS BIGINT) AS cusum_scaled, CAST(np AS BIGINT) AS n_points
        |FROM r WHERE rk = 1""".stripMargin,

    "funnel_conversion" ->
      """WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t FROM events e
        |  JOIN s1 ON s1.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= s1.t GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t FROM events e
        |  JOIN s2 ON s2.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s2.t GROUP BY 1),
        |c AS (SELECT (SELECT count(*) FROM s1) AS n1,
        |  (SELECT count(*) FROM s2) AS n2, (SELECT count(*) FROM s3) AS n3)
        |SELECT CAST(1 AS BIGINT) AS stage_index, 'view' AS event_type,
        | CAST(n1 AS BIGINT) AS n_users, CAST(1.0 AS DOUBLE) AS conversion FROM c
        |UNION ALL
        |SELECT 2, 'click', CAST(n2 AS BIGINT),
        | round(CASE WHEN n1 = 0 THEN 0.0 ELSE CAST(n2 AS DOUBLE) / n1 END, 6) FROM c
        |UNION ALL
        |SELECT 3, 'purchase', CAST(n3 AS BIGINT),
        | round(CASE WHEN n2 = 0 THEN 0.0 ELSE CAST(n3 AS DOUBLE) / n2 END, 6) FROM c""".stripMargin,

    "cohort_retention" ->
      """WITH d AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |c AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY 1),
        |a AS (SELECT DISTINCT d.user_id, c.cohort, d.day - c.cohort AS off
        | FROM d JOIN c ON c.user_id = d.user_id WHERE d.day - c.cohort <= 7)
        |SELECT cohort AS cohort_day, off AS day_offset,
        | CAST(count(*) AS BIGINT) AS n_active
        |FROM a GROUP BY 1, 2""".stripMargin,

    "sessionize_events" ->
      """WITH flagged AS (
        | SELECT user_id, epoch_us(ts) AS tsu, value,
        |  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))),
        |sess AS (
        | SELECT user_id, tsu, value,
        |  CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tsu ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_index
        | FROM flagged)
        |SELECT user_id, session_index, COUNT(*) AS n_events,
        | MIN(tsu) AS start_us, MAX(tsu) AS end_us,
        | CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, session_index""".stripMargin,

    // session_window boundary semantics: a gap of exactly `gap` STARTS a
    // new session (half-open window merge), and end = last_ts + gap. The
    // streaming twin runs the identical aggregation through the streaming
    // engine — one oracle covers both execution paths.
    "session_window_events" -> sessionWindowSql,
    "streaming_session_window" -> sessionWindowSql,

    // frontMatterField/Body replay by independent reconstruction: the
    // planted fenced block's fields from the source columns directly.
    "front_matter" ->
      """SELECT doc_id, 'T' || doc_id AS fm_title, lang AS fm_lang,
        | 'corpus, r16' AS fm_tags, CAST(NULL AS VARCHAR) AS fm_absent,
        | text AS body
        |FROM documents WHERE text IS NOT NULL""".stripMargin,

    "html_main_content" -> {
      def stripSql(in: String): String =
        s"""replace(replace(replace(replace(replace(replace(regexp_replace(regexp_replace(regexp_replace($in, '(?is)<script[^>]*>.*?</script>', '', 'g'), '(?is)<style[^>]*>.*?</style>', '', 'g'), '<[^>]*>', '', 'g'), '&nbsp;', ' '), '&amp;', '&'), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39))"""
      s"""WITH p AS (SELECT doc_id,
         | '<div class="nav"><a href="/">Home</a> <a href="/about">About</a></div>' || chr(10) || '<p>' || text
         |  || '</p>' || chr(10)
         |  || '<div><a href="/l1">one interesting link label here</a> <a href="/l2">another long link label text</a> and</div>' || chr(10)
         |  || '<p>A second real paragraph with plenty of genuine content words.</p>' || chr(10) || '<div>tiny</div>' AS page
         | FROM documents),
         |b AS (SELECT doc_id,
         |  string_split_regex(page, '(?i)</p>|</div>|</li>|</h[1-6]>|<br */?>') AS blocks
         | FROM p),
         |s AS (SELECT doc_id, list_transform(blocks, x -> struct_pack(
         |    t := regexp_replace(${stripSql("x")}, '^\\s+|\\s+$$', '', 'g'),
         |    lc := CAST(list_reduce(list_prepend(0, list_transform(
         |      regexp_extract_all(x, '(?is)<a[^>]*>(.*?)</a>', 1), y -> len(y))),
         |      (a, b) -> a + b) AS DOUBLE))) AS sc
         | FROM b)
         |SELECT doc_id, array_to_string(list_transform(list_filter(sc, e ->
         |  len(e.t) >= 25 AND
         |  (CASE WHEN len(e.t) > 0 THEN e.lc / CAST(len(e.t) AS DOUBLE) ELSE 1.0 END) <= 0.3),
         |  e -> e.t), chr(10)) AS main
         |FROM s""".stripMargin
    },

    // Same planted page; parallel unnest keeps the tag and its 0-based
    // page-order position in lockstep. DuckDB regexp_replace needs the
    // explicit 'g' flag to match Spark's global default.
    "html_links" ->
      """WITH page AS (SELECT doc_id,
        |  '<p>' || text || '</p> <a href="/p' || CAST(doc_id AS VARCHAR) ||
        |  '">first ' || lang || ' page</a> mid <A HREF="https://ex' ||
        |  CAST(doc_id % 7 AS VARCHAR) || '.example.com/x?id=' ||
        |  CAST(doc_id AS VARCHAR) ||
        |  '">Ex <b>bold</b> label</A> tail <a name="x">no href</a>' AS html
        | FROM documents),
        |tags AS (SELECT doc_id,
        |  regexp_extract_all(html, '(?is)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>', 0) AS ts
        | FROM page),
        |e AS (SELECT doc_id, unnest(range(len(ts))) AS link_pos, unnest(ts) AS tag FROM tags)
        |SELECT doc_id, CAST(link_pos AS BIGINT) AS link_pos,
        | regexp_extract(tag, '(?is)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>', 1) AS href,
        | regexp_replace(regexp_replace(
        |   regexp_extract(tag, '(?is)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>', 2),
        |   '<[^>]*>', ' ', 'g'), '^\s+|\s+$', '', 'g') AS anchor
        |FROM e""".stripMargin,

    "web_normalize" ->
      """SELECT doc_id,
        | array_to_string(list_filter(list_transform(string_split(
        |   replace(replace(replace(replace(replace(replace(
        |     regexp_replace(regexp_replace(regexp_replace(
        |       '<html>' || chr(10) || '<p>' || text || '</p>' || chr(10) || '<script>var x=1;</script>' || chr(10) || '<p>tail &amp; more</p>' || chr(10) || '</html>',
        |       '(?is)<script[^>]*>.*?</script>', '', 'g'),
        |       '(?is)<style[^>]*>.*?</style>', '', 'g'),
        |       '<[^>]*>', '', 'g'),
        |     '&nbsp;', ' '), '&amp;', '&'), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
        |   chr(10)), x -> trim(x)), x -> len(x) > 0), chr(10)) AS cleaned
        |FROM documents""".stripMargin,

    // Mirrors Normalize.cleanText step for step: control strip, zero-width
    // strip, NFC (DuckDB nfc_normalize == java.text.Normalizer NFC),
    // typographic translate, ellipsis fold, whitespace collapse. The
    // zero-width strip moved BEFORE the normalizer in r16 (idempotence fix,
    // Normalize scaladoc step 2) — mirrored here in the same move. Special
    // chars spelled chr() so the SQL stays ASCII.
    "text_normalize" ->
      """SELECT doc_id, trim(regexp_replace(
        |  replace(
        |   translate(
        |    nfc_normalize(regexp_replace(regexp_replace(
        |      'Caf' || chr(233) || ' ' || chr(8220) || 'qu' || chr(8230) || 'ote' || chr(8221) || ' ' || chr(8212) || chr(160)
        |        || text || ' e' || chr(769) || chr(8203) || ' end' || chr(7),
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
        |     '[' || chr(8203) || '-' || chr(8205) || chr(65279) || ']', '', 'g')),
        |    chr(8220) || chr(8221) || chr(8216) || chr(8217) || chr(8212) || chr(8211) || chr(160) || chr(8199) || chr(8239),
        |    '""' || chr(39) || chr(39) || '--   '),
        |   chr(8230), '...'),
        |  '\s+', ' ', 'g')) AS normalized
        |FROM documents""".stripMargin,

    // Generated from Mojibake.table (one source of truth): plant the
    // corrupted suffix, run the identical ordered replace chain, flag docs
    // the chain changed. Every character travels as chr(N).
    "mojibake_repair" -> {
      val bad = graft.functions.Mojibake.corrupt(MojibakeCleanSuffix)
      val planted = s"(CASE WHEN doc_id % 3 = 0 THEN text || " +
        s"${graft.functions.Mojibake.sqlStringExpr(bad)} ELSE text END)"
      val fixed = graft.functions.Mojibake.sqlRepairExpr(planted)
      s"""SELECT doc_id, $fixed AS fixed_text,
         | $fixed <> $planted AS was_mojibake
         |FROM documents""".stripMargin
    },

    "sink_projection" ->
      """SELECT d.text AS text, d.source, d.lang, d.doc_id,
        | CAST(len(e.embedding) AS BIGINT) AS vector_dim,
        | round(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])), 6) AS vector_norm
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id""".stripMargin,

    // Composed write-path replay: the recursive-chunk CTE over non-blank
    // docs (the adaptive chunker's regime on this single-line fixture),
    // joined back to the document row for the scan stage's fingerprint
    // and pass-through metadata, with embed_hashing's scalar digests.
    "pipeline_e2e" ->
      s"""WITH ${recursiveChunkSql("len(trim(text)) > 0")}
         |SELECT r.chunk AS text, d.source, d.lang, d.doc_id,
         | CAST(r.chunk_index AS BIGINT) AS chunk_index,
         | sha256(d.text) AS fingerprint,
         | CAST(64 AS BIGINT) AS vector_dim,
         | regexp_matches(r.chunk, '[\\p{L}\\p{N}]') AS has_embedding
         |FROM rec r JOIN documents d USING (doc_id)""".stripMargin,

    "topk_search" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, round(${cosOf("embedding", "qv")}, 6) AS score
         |FROM embeddings, q WHERE vec_id <> 0
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    // Selection runs on the UNROUNDED cosine in both engines (identical
    // expression shape -> bit-identical doubles), vec_id tie-break; the
    // query vector itself ranks first at score 1.0.
    "similarity_ivf_exact" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, round(${cosOf("embedding", "qv")}, 6) AS score
         |FROM embeddings, q
         |ORDER BY ${cosOf("embedding", "qv")} DESC, vec_id LIMIT 10""".stripMargin,

    // FULL training-regime replay (ivfSql scaladoc): micro-unit quantized
    // spherical k-means — sample order, farthest-point init, 5 Lloyd
    // iterations, corpus assignment, probe-cell ranking, cosine re-rank,
    // all value-for-value. Promoted from † in r10: zero no-oracle gates
    // remain.
    "similarity_ivf" -> ivfSql(nCells = 8, maxIter = 5, nProbe = 2,
      k = 10, dim = 64, seed = 42L),

    // JL projection replay: the 16 Rademacher directions are the first 16
    // rows of the shared inline plane table; projections are 6-dp rounded
    // before the pairwise d2, and the ratio divides the two exact 1e-6
    // multiples.
    "jl_distortion" ->
      s"""WITH $planesSql,
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS dv FROM embeddings
         | WHERE vec_id < 12),
         |pj AS (SELECT e.vec_id, p.p AS j,
         |  round(list_dot_product(e.dv, p.s) * (1.0 / sqrt(16.0)), 6) AS y
         | FROM e CROSS JOIN planes p WHERE p.p < 16),
         |pv AS (SELECT vec_id, list(y ORDER BY j) AS pvv FROM pj GROUP BY vec_id),
         |pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  a.dv AS va, b.dv AS vb, pa.pvv AS pa, pb.pvv AS pb
         | FROM e a JOIN e b ON a.vec_id < b.vec_id
         |  JOIN pv pa ON pa.vec_id = a.vec_id
         |  JOIN pv pb ON pb.vec_id = b.vec_id),
         |d AS (SELECT id_a, id_b,
         |  round(list_dot_product(
         |    list_transform(range(1, 65), i -> va[CAST(i AS INT)] - vb[CAST(i AS INT)]),
         |    list_transform(range(1, 65), i -> va[CAST(i AS INT)] - vb[CAST(i AS INT)])), 6) AS d2_orig,
         |  round(list_dot_product(
         |    list_transform(range(1, 17), i -> pa[CAST(i AS INT)] - pb[CAST(i AS INT)]),
         |    list_transform(range(1, 17), i -> pa[CAST(i AS INT)] - pb[CAST(i AS INT)])), 6) AS d2_proj
         | FROM pr)
         |SELECT id_a, id_b, d2_orig, d2_proj,
         | CASE WHEN d2_orig > 0 THEN round(d2_proj / d2_orig, 6) END AS ratio
         |FROM d""".stripMargin,

    // Same ivfCtes replay with the base-corpus training filter; the tail
    // is the per-cell base/new histogram the drift trigger reads.
    // (Concatenated, not interpolated under stripMargin — ivfSql's note.)
    "ivf_incremental" ->
      (s"WITH ${ivfCtes(nCells = 8, maxIter = 5, dim = 64, seed = 42L,
           trainFilter = "vec_id % 10 <> 3")}\n" +
        """SELECT a.cell,
          | CAST(sum(CASE WHEN a.vec_id % 10 <> 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
          | CAST(sum(CASE WHEN a.vec_id % 10 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
          |FROM assign a GROUP BY a.cell""".stripMargin),

    // The stored registry artifact's per-cell histogram vs a fresh
    // re-assignment: both columns replay from the SAME from-scratch
    // training, so the gate only matches if the stored artifact's cell
    // structure equals a clean retrain's (the staleness-probe law).
    "ivf_registry_staleness" ->
      (s"WITH ${ivfCtes(nCells = 8, maxIter = 5, dim = 64, seed = 42L)}\n" +
        """SELECT a.cell, CAST(count(*) AS BIGINT) AS n_stored,
          | CAST(count(*) AS BIGINT) AS n_fresh
          |FROM assign a GROUP BY a.cell""".stripMargin),

    "eval_hitrate" ->
      s"""WITH corpus AS (
         | SELECT e.vec_id, e.embedding, d.source
         | FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
         |qs AS (
         | SELECT vec_id AS qid, embedding AS qv, source AS expected_source
         | FROM corpus WHERE vec_id < 20),
         |scored AS (
         | SELECT qs.qid, qs.expected_source, c.vec_id, c.source,
         |  round(${cosOf("c.embedding", "qs.qv")}, 6) AS score
         | FROM qs, corpus c WHERE c.vec_id <> qs.qid),
         |topk AS (
         | SELECT * FROM (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
         |  FROM scored) WHERE rn <= 5),
         |hits AS (
         | SELECT qid, max(CASE WHEN source = expected_source THEN 1 ELSE 0 END) AS hit
         | FROM topk GROUP BY qid)
         |SELECT round(CAST(sum(hit) AS DOUBLE) * 100.0 / count(*), 6) AS hit_rate,
         | count(*) AS total_questions, CAST(sum(hit) AS BIGINT) AS hits
         |FROM hits""".stripMargin,

    "eval_mrr" ->
      s"""WITH corpus AS (
         | SELECT e.vec_id, e.embedding, d.source
         | FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
         |qs AS (
         | SELECT vec_id AS qid, embedding AS qv, source AS expected_source
         | FROM corpus WHERE vec_id < 20),
         |scored AS (
         | SELECT qs.qid, qs.expected_source, c.vec_id, c.source,
         |  round(${cosOf("c.embedding", "qs.qv")}, 6) AS score
         | FROM qs, corpus c WHERE c.vec_id <> qs.qid),
         |topk AS (
         | SELECT * FROM (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
         |  FROM scored) WHERE rn <= 5),
         |firsts AS (
         | SELECT qid, min(CASE WHEN source = expected_source THEN rn END) AS first_hit
         | FROM topk GROUP BY qid)
         |SELECT round(avg(CASE WHEN first_hit IS NOT NULL
         |   THEN 1.0 / first_hit ELSE 0.0 END), 6) AS mrr,
         | count(*) AS total_questions,
         | CAST(sum(CASE WHEN first_hit IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS answered
         |FROM firsts""".stripMargin,

    // Same corpus/top-5 CTEs as eval_mrr; the ideal DCG comes from the
    // per-source corpus count minus self, capped at k=5, mirroring
    // Search.ndcg's relevantTotals join. Per-query ratio and the final mean
    // both rounded to 6 dp on both sides.
    "eval_ndcg" ->
      s"""WITH corpus AS (
         | SELECT e.vec_id, e.embedding, d.source
         | FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
         |qs AS (
         | SELECT vec_id AS qid, embedding AS qv, source AS expected_source
         | FROM corpus WHERE vec_id < 20),
         |scored AS (
         | SELECT qs.qid, qs.expected_source, c.vec_id, c.source,
         |  round(${cosOf("c.embedding", "qs.qv")}, 6) AS score
         | FROM qs, corpus c WHERE c.vec_id <> qs.qid),
         |topk AS (
         | SELECT * FROM (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
         |  FROM scored) WHERE rn <= 5),
         |dcg AS (
         | SELECT qid, sum(CASE WHEN source = expected_source
         |   THEN 1.0 / log2(rn + 1) ELSE 0.0 END) AS dcg
         | FROM topk GROUP BY qid),
         |rel AS (
         | SELECT qs.qid, least(5, cnt.n - 1) AS m
         | FROM qs JOIN (SELECT source, count(*) AS n FROM corpus GROUP BY source) cnt
         |  ON cnt.source = qs.expected_source),
         |series AS (SELECT i FROM generate_series(1, 5) t(i)),
         |idcg AS (
         | SELECT r.qid, sum(1.0 / log2(s.i + 1)) AS idcg
         | FROM rel r JOIN series s ON s.i <= r.m GROUP BY r.qid),
         |perq AS (
         | SELECT d.qid, CASE WHEN i.idcg > 0 THEN round(d.dcg / i.idcg, 6)
         |   ELSE 0.0 END AS ndcg
         | FROM dcg d LEFT JOIN idcg i ON d.qid = i.qid)
         |SELECT round(avg(ndcg), 6) AS ndcg, count(*) AS total_questions
         |FROM perq""".stripMargin,

    // Sign-matrix replay of the banded search (planesSql scaladoc): bands,
    // candidate join, and the unrounded-cosine rank are recomputed exactly,
    // so the gate is checked in its REAL approximate regime. Self rides
    // through the rank (Spark filters it after the top-5 cut) — replayed.
    "eval_hitrate_blocked" ->
      s"""WITH $planesSql,
         |corpus AS (
         | SELECT e.vec_id, e.embedding, d.source
         | FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
         |qs AS (
         | SELECT vec_id AS qid, embedding AS qv, source AS expected_source
         | FROM corpus WHERE vec_id < 20),
         |${bandsSql("qb", "qs", "qid", "qv")},
         |${bandsSql("cb", "corpus", "vec_id", "embedding")},
         |cand AS (SELECT DISTINCT qb.id AS qid, cb.id AS cid
         | FROM qb JOIN cb USING (band, bits)),
         |scored AS (
         | SELECT c.qid, c.cid, ${cosOf("co.embedding", "qs.qv")} AS s
         | FROM cand c JOIN qs ON qs.qid = c.qid
         |  JOIN corpus co ON co.vec_id = c.cid),
         |topk AS (SELECT * FROM (
         | SELECT qid, cid,
         |  row_number() OVER (PARTITION BY qid ORDER BY s DESC, cid) AS rn
         | FROM scored) WHERE rn <= 5),
         |fil AS (
         | SELECT t.qid, co.source
         | FROM topk t JOIN corpus co ON co.vec_id = t.cid
         | WHERE t.cid <> t.qid),
         |hits AS (
         | SELECT qs.qid, max(CASE WHEN f.source = qs.expected_source
         |   THEN 1 ELSE 0 END) AS hit
         | FROM qs LEFT JOIN fil f ON f.qid = qs.qid GROUP BY qs.qid)
         |SELECT round(CAST(sum(hit) AS DOUBLE) * 100.0 / count(*), 6) AS hit_rate,
         | count(*) AS total_questions, CAST(sum(hit) AS BIGINT) AS hits
         |FROM hits""".stripMargin,

    // Same replay, self excluded BEFORE the rank (excludeSelf = true on the
    // Spark side) so 1/rank counts real results only.
    "eval_mrr_blocked" ->
      s"""WITH $planesSql,
         |corpus AS (
         | SELECT e.vec_id, e.embedding, d.source
         | FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
         |qs AS (
         | SELECT vec_id AS qid, embedding AS qv, source AS expected_source
         | FROM corpus WHERE vec_id < 20),
         |${bandsSql("qb", "qs", "qid", "qv")},
         |${bandsSql("cb", "corpus", "vec_id", "embedding")},
         |cand AS (SELECT DISTINCT qb.id AS qid, cb.id AS cid
         | FROM qb JOIN cb USING (band, bits) WHERE qb.id <> cb.id),
         |scored AS (
         | SELECT c.qid, c.cid, qs.expected_source, co.source,
         |  ${cosOf("co.embedding", "qs.qv")} AS s
         | FROM cand c JOIN qs ON qs.qid = c.qid
         |  JOIN corpus co ON co.vec_id = c.cid),
         |topk AS (SELECT * FROM (
         | SELECT *,
         |  row_number() OVER (PARTITION BY qid ORDER BY s DESC, cid) AS rn
         | FROM scored) WHERE rn <= 5),
         |firsts AS (
         | SELECT qs.qid, min(CASE WHEN t.source = qs.expected_source
         |   THEN t.rn END) AS first_hit
         | FROM qs LEFT JOIN topk t ON t.qid = qs.qid GROUP BY qs.qid)
         |SELECT round(avg(CASE WHEN first_hit IS NOT NULL
         |   THEN 1.0 / first_hit ELSE 0.0 END), 6) AS mrr,
         | count(*) AS total_questions,
         | CAST(sum(CASE WHEN first_hit IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS answered
         |FROM firsts""".stripMargin,

    // Same replay as eval_mrr_blocked; ideal DCG from the corpus-wide
    // per-source counts exactly as eval_ndcg.
    "eval_ndcg_blocked" ->
      s"""WITH $planesSql,
         |corpus AS (
         | SELECT e.vec_id, e.embedding, d.source
         | FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
         |qs AS (
         | SELECT vec_id AS qid, embedding AS qv, source AS expected_source
         | FROM corpus WHERE vec_id < 20),
         |${bandsSql("qb", "qs", "qid", "qv")},
         |${bandsSql("cb", "corpus", "vec_id", "embedding")},
         |cand AS (SELECT DISTINCT qb.id AS qid, cb.id AS cid
         | FROM qb JOIN cb USING (band, bits) WHERE qb.id <> cb.id),
         |scored AS (
         | SELECT c.qid, c.cid, qs.expected_source, co.source,
         |  ${cosOf("co.embedding", "qs.qv")} AS s
         | FROM cand c JOIN qs ON qs.qid = c.qid
         |  JOIN corpus co ON co.vec_id = c.cid),
         |topk AS (SELECT * FROM (
         | SELECT *,
         |  row_number() OVER (PARTITION BY qid ORDER BY s DESC, cid) AS rn
         | FROM scored) WHERE rn <= 5),
         |dcg AS (
         | SELECT qs.qid, sum(CASE WHEN t.source = qs.expected_source
         |   THEN 1.0 / log2(t.rn + 1) ELSE 0.0 END) AS dcg
         | FROM qs LEFT JOIN topk t ON t.qid = qs.qid GROUP BY qs.qid),
         |rel AS (
         | SELECT qs.qid, least(5, cnt.n - 1) AS m
         | FROM qs JOIN (SELECT source, count(*) AS n FROM corpus GROUP BY source) cnt
         |  ON cnt.source = qs.expected_source),
         |series AS (SELECT i FROM generate_series(1, 5) t(i)),
         |idcg AS (
         | SELECT r.qid, sum(1.0 / log2(s.i + 1)) AS idcg
         | FROM rel r JOIN series s ON s.i <= r.m GROUP BY r.qid),
         |perq AS (
         | SELECT d.qid, CASE WHEN i.idcg > 0 THEN round(d.dcg / i.idcg, 6)
         |   ELSE 0.0 END AS ndcg
         | FROM dcg d LEFT JOIN idcg i ON d.qid = i.qid)
         |SELECT round(avg(ndcg), 6) AS ndcg, count(*) AS total_questions
         |FROM perq""".stripMargin,

    // Sign-matrix replay of mutualKnnPairsBlocked: banded candidates (both
    // directions fall out of the symmetric join), rounded-cosine rank,
    // mutual join — the exact mutual_knn oracle with its all-pairs CTE
    // swapped for the banding.
    "mutual_knn_blocked" ->
      s"""WITH $planesSql,
         |e AS (SELECT vec_id, embedding FROM embeddings),
         |${bandsSql("eb", "e", "vec_id", "embedding")},
         |cand AS (SELECT DISTINCT a.id AS qa, b.id AS qb
         | FROM eb a JOIN eb b USING (band, bits) WHERE a.id <> b.id),
         |scored AS (
         | SELECT c.qa, c.qb,
         |  round(${cosOf("ea.embedding", "eb2.embedding")}, 6) AS c
         | FROM cand c JOIN e ea ON ea.vec_id = c.qa
         |  JOIN e eb2 ON eb2.vec_id = c.qb),
         |ranked AS (SELECT qa, qb, c,
         |  row_number() OVER (PARTITION BY qa ORDER BY c DESC, qb) AS rk
         | FROM scored),
         |topk AS (SELECT * FROM ranked WHERE rk <= 5),
         |fwd AS (SELECT qa AS id_a, qb AS id_b, c AS cos,
         |  CAST(rk AS BIGINT) AS rank_ab FROM topk WHERE qa < qb),
         |bwd AS (SELECT qb AS id_a, qa AS id_b,
         |  CAST(rk AS BIGINT) AS rank_ba FROM topk WHERE qa > qb)
         |SELECT f.id_a, f.id_b, f.cos, f.rank_ab, b.rank_ba
         |FROM fwd f JOIN bwd b USING (id_a, id_b)""".stripMargin,

    // Sign-matrix replay of kthNeighborDistanceBlocked: the k-th distance
    // within the banded candidate set (queries with < k candidates emit no
    // row, mirrored by the rn = 5 filter).
    "outlier_knn_blocked" ->
      s"""WITH $planesSql,
         |corpus AS (SELECT vec_id, embedding FROM embeddings),
         |qs AS (SELECT vec_id AS qid, embedding AS qv
         | FROM corpus WHERE vec_id < 50),
         |${bandsSql("qb", "qs", "qid", "qv")},
         |${bandsSql("cb", "corpus", "vec_id", "embedding")},
         |cand AS (SELECT DISTINCT qb.id AS qid, cb.id AS cid
         | FROM qb JOIN cb USING (band, bits) WHERE qb.id <> cb.id),
         |scored AS (
         | SELECT c.qid, c.cid,
         |  round(1.0 - (${cosOf("co.embedding", "qs.qv")}), 6) AS d
         | FROM cand c JOIN qs ON qs.qid = c.qid
         |  JOIN corpus co ON co.vec_id = c.cid),
         |ranked AS (SELECT qid, d,
         |  row_number() OVER (PARTITION BY qid ORDER BY d, cid) AS rn
         | FROM scored)
         |SELECT qid AS vec_id, d AS kth_dist, (d >= 0.75) AS is_outlier
         |FROM ranked WHERE rn = 5""".stripMargin,

    // Sign-matrix replay of marginBitextBlocked: one banded join supplies
    // the candidate pairs; the integer margin algebra, best-per-source cut,
    // and mutual flag are the exact bitext_margin oracle verbatim.
    "bitext_margin_blocked" ->
      s"""WITH $planesSql,
         |src AS (SELECT vec_id AS src_id, embedding AS sv
         | FROM embeddings WHERE vec_id % 2 = 0),
         |tgt AS (SELECT vec_id AS tgt_id, embedding AS tv
         | FROM embeddings WHERE vec_id % 2 = 1),
         |${bandsSql("sb", "src", "src_id", "sv")},
         |${bandsSql("tb", "tgt", "tgt_id", "tv")},
         |cand AS (SELECT DISTINCT sb.id AS src_id, tb.id AS tgt_id
         | FROM sb JOIN tb USING (band, bits)),
         |scored AS (
         | SELECT c.src_id, c.tgt_id,
         |  CAST(round(round(${cosOf("s.sv", "t.tv")}, 6) * 1000000, 0) AS BIGINT) AS cu
         | FROM cand c JOIN src s ON s.src_id = c.src_id
         |  JOIN tgt t ON t.tgt_id = c.tgt_id),
         |asrc AS (
         | SELECT src_id, sum(cu) AS ssum, CAST(count(*) AS BIGINT) AS sn FROM (
         |  SELECT src_id, cu,
         |   row_number() OVER (PARTITION BY src_id ORDER BY cu DESC, tgt_id) AS rn
         |  FROM scored) WHERE rn <= 4 GROUP BY src_id),
         |atgt AS (
         | SELECT tgt_id, sum(cu) AS tsum, CAST(count(*) AS BIGINT) AS tn FROM (
         |  SELECT tgt_id, cu,
         |   row_number() OVER (PARTITION BY tgt_id ORDER BY cu DESC, src_id) AS rn
         |  FROM scored) WHERE rn <= 4 GROUP BY tgt_id),
         |m AS (
         | SELECT s.src_id, s.tgt_id,
         |  round(CAST(2 * s.cu * asrc.sn * atgt.tn AS DOUBLE) /
         |   (asrc.ssum * atgt.tn + atgt.tsum * asrc.sn), 6) AS margin
         | FROM scored s JOIN asrc USING (src_id) JOIN atgt USING (tgt_id)),
         |bs AS (SELECT src_id, tgt_id, margin FROM (
         | SELECT *, row_number() OVER (PARTITION BY src_id
         |   ORDER BY margin DESC, tgt_id) AS rn FROM m) WHERE rn = 1),
         |bt AS (SELECT src_id AS bsrc, tgt_id AS btgt FROM (
         | SELECT *, row_number() OVER (PARTITION BY tgt_id
         |   ORDER BY margin DESC, src_id) AS rn FROM m) WHERE rn = 1)
         |SELECT bs.src_id, bs.tgt_id, bs.margin,
         | (bt.bsrc IS NOT NULL) AS mutual
         |FROM bs LEFT JOIN bt
         | ON bs.src_id = bt.bsrc AND bs.tgt_id = bt.btgt""".stripMargin,

    // Projection-matrix replay of the euclidean bucketed-LSH search
    // (Similarity.lshTopK scaladoc): the ±1 directions are the first 4
    // rows of the same inlined plane table, bucket = floor(dot / 2.0),
    // candidate = any-table bucket match, then the exact L2 re-rank —
    // the squared-diff list dotted with itself replays the zip_with
    // left-to-right accumulation bit-for-bit. Promoted from † in r10.
    "similarity_lsh" ->
      s"""WITH $planesSql,
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
         |qb AS (SELECT p.p AS t,
         |  CAST(floor(list_dot_product(qv, p.s) / 2.0) AS BIGINT) AS b
         | FROM q CROSS JOIN planes p WHERE p.p < 4),
         |cb AS (SELECT vec_id, p.p AS t,
         |  CAST(floor(list_dot_product(v, p.s) / 2.0) AS BIGINT) AS b
         | FROM e CROSS JOIN planes p WHERE p.p < 4),
         |cand AS (SELECT DISTINCT vec_id FROM cb JOIN qb USING (t, b)),
         |d AS (SELECT e.vec_id,
         |  sqrt(list_dot_product(
         |    list_transform(range(1, len(v) + 1), i -> v[i] - qv[i]),
         |    list_transform(range(1, len(v) + 1), i -> v[i] - qv[i]))) AS d0
         | FROM cand JOIN e USING (vec_id) CROSS JOIN q)
         |SELECT vec_id, round(d0, 6) AS dist
         |FROM d ORDER BY d0, vec_id LIMIT 10""".stripMargin,

    // Sign-matrix replay of the banded single-query search: the gate that
    // pins the hyperplane-LSH machinery value-for-value in its real
    // approximate regime (comment on the Spark side).
    "similarity_lsh_exact" -> similarityLshExactSql,

    // The pre-banded index path is row-identical to the direct banded
    // search BY CONSTRUCTION (same signatures, same candidate join, same
    // rank) — sharing the oracle verbatim is the claim under test, the
    // bm25_merged_stats discipline.
    "similarity_prebanded" -> similarityLshExactSql,

    // Sign-matrix replay of the multiprobe banded search: the bandBits=4
    // band table plus the query-side 1-bit-flip probe xor, then the same
    // unrounded-cosine rank.
    "similarity_multiprobe" ->
      s"""WITH $planesSql,
         |e AS (SELECT vec_id, embedding FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qv
         | FROM embeddings WHERE vec_id = 0),
         |${bandsSqlAt("qb0", "q", "qid", "qv", 4)},
         |qb AS (SELECT id, band, xor(bits, f.flip) AS bits
         | FROM qb0, unnest([0, 1, 2, 4, 8]) AS f(flip)),
         |${bandsSqlAt("cb", "e", "vec_id", "embedding", 4)},
         |cand AS (SELECT DISTINCT qb.id AS qid, cb.id AS cid
         | FROM qb JOIN cb USING (band, bits))
         |SELECT c.cid AS vec_id,
         | round(${cosOf("co.embedding", "q.qv")}, 6) AS score
         |FROM cand c JOIN q ON q.qid = c.qid
         | JOIN e co ON co.vec_id = c.cid
         |ORDER BY ${cosOf("co.embedding", "q.qv")} DESC, c.cid LIMIT 10""".stripMargin,

    // Search.rbo's exact-rational suffix-coefficient replay: each item
    // contributes suffix(max(rank_cos, rank_dot)); coefficients and the
    // common denominator come from the SAME rboSuffixCoefs call the Spark
    // side uses, so the single final division is bit-identical.
    "eval_rbo" ->
      s"""WITH corpus AS (SELECT vec_id, embedding FROM embeddings),
         |qs AS (SELECT vec_id AS qid, embedding AS qv
         | FROM corpus WHERE vec_id < 20),
         |scored AS (
         | SELECT qs.qid, c.vec_id,
         |  round(${cosOf("c.embedding", "qs.qv")}, 6) AS cos_s,
         |  round(list_dot_product(c.embedding::DOUBLE[], qs.qv::DOUBLE[]), 6) AS dot_s
         | FROM qs, corpus c WHERE c.vec_id <> qs.qid),
         |ranked AS (
         | SELECT qid,
         |  row_number() OVER (PARTITION BY qid ORDER BY cos_s DESC, vec_id) AS ra,
         |  row_number() OVER (PARTITION BY qid ORDER BY dot_s DESC, vec_id) AS rb
         | FROM scored),
         |contrib AS (
         | SELECT qid,
         |  ([${rboCoefs._1.mkString(", ")}])[CAST(greatest(ra, rb) AS INT)] AS w
         | FROM ranked WHERE greatest(ra, rb) <= 10)
         |SELECT qid, CAST(count(*) AS BIGINT) AS overlap_at_k,
         | round(CAST(sum(w) AS DOUBLE) / ${10L * rboCoefs._2}, 6) AS rbo
         |FROM contrib GROUP BY qid""".stripMargin,

    // Clipped-bigram ROUGE replay: the candidate is the lead-20 token
    // slice (retokenizing the joined string is a no-op), P/R/F1 are the
    // same single exact integer divisions as Search.rougeN.
    "eval_rouge" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sliced AS (SELECT doc_id, toks[1:20] AS cand, toks FROM tk),
         |cg AS (
         | SELECT doc_id, unnest(list_transform(range(1, len(cand)),
         |   i -> cand[i] || ' ' || cand[i + 1])) AS gram
         | FROM sliced),
         |rg AS (
         | SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         |   i -> toks[i] || ' ' || toks[i + 1])) AS gram
         | FROM sliced),
         |cc AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS n
         | FROM cg GROUP BY doc_id, gram),
         |rc AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS n
         | FROM rg GROUP BY doc_id, gram),
         |ov AS (
         | SELECT cc.doc_id, sum(least(cc.n, rc.n)) AS ov
         | FROM cc JOIN rc USING (doc_id, gram) GROUP BY cc.doc_id),
         |totals AS (
         | SELECT doc_id, CAST(greatest(len(cand) - 1, 0) AS BIGINT) AS n_cand,
         |  CAST(greatest(len(toks) - 1, 0) AS BIGINT) AS n_ref
         | FROM sliced)
         |SELECT t.doc_id, t.n_cand, t.n_ref,
         | CAST(coalesce(ov.ov, 0) AS BIGINT) AS overlap,
         | CASE WHEN t.n_cand > 0
         |   THEN round(CAST(coalesce(ov.ov, 0) AS DOUBLE) / t.n_cand, 6)
         |   ELSE 0.0 END AS precision,
         | CASE WHEN t.n_ref > 0
         |   THEN round(CAST(coalesce(ov.ov, 0) AS DOUBLE) / t.n_ref, 6)
         |   ELSE 0.0 END AS recall,
         | CASE WHEN t.n_cand + t.n_ref > 0
         |   THEN round(2.0 * coalesce(ov.ov, 0) / (t.n_cand + t.n_ref), 6)
         |   ELSE 0.0 END AS f1
         |FROM totals t LEFT JOIN ov USING (doc_id)""".stripMargin,

    // Similarity.marginBitext replay: 6-dp cosines lifted to exact integer
    // micro-units, knn=4 neighborhood sums and the ratio margin all in
    // BIGINT with ONE final division (no float summation — a rounded
    // float avg measurably ulp-drifted across engines), ties by id,
    // mutual = the pair survives the best-per-target window too.
    "bitext_margin" ->
      s"""WITH src AS (SELECT vec_id AS src_id, embedding AS sv
         | FROM embeddings WHERE vec_id % 2 = 0),
         |tgt AS (SELECT vec_id AS tgt_id, embedding AS tv
         | FROM embeddings WHERE vec_id % 2 = 1),
         |scored AS (
         | SELECT src_id, tgt_id,
         |  CAST(round(round(${cosOf("sv", "tv")}, 6) * 1000000, 0) AS BIGINT) AS cu
         | FROM src, tgt),
         |asrc AS (
         | SELECT src_id, sum(cu) AS ssum, CAST(count(*) AS BIGINT) AS sn FROM (
         |  SELECT src_id, cu,
         |   row_number() OVER (PARTITION BY src_id ORDER BY cu DESC, tgt_id) AS rn
         |  FROM scored) WHERE rn <= 4 GROUP BY src_id),
         |atgt AS (
         | SELECT tgt_id, sum(cu) AS tsum, CAST(count(*) AS BIGINT) AS tn FROM (
         |  SELECT tgt_id, cu,
         |   row_number() OVER (PARTITION BY tgt_id ORDER BY cu DESC, src_id) AS rn
         |  FROM scored) WHERE rn <= 4 GROUP BY tgt_id),
         |m AS (
         | SELECT s.src_id, s.tgt_id,
         |  round(CAST(2 * s.cu * asrc.sn * atgt.tn AS DOUBLE) /
         |   (asrc.ssum * atgt.tn + atgt.tsum * asrc.sn), 6) AS margin
         | FROM scored s JOIN asrc USING (src_id) JOIN atgt USING (tgt_id)),
         |bs AS (SELECT src_id, tgt_id, margin FROM (
         | SELECT *, row_number() OVER (PARTITION BY src_id
         |   ORDER BY margin DESC, tgt_id) AS rn FROM m) WHERE rn = 1),
         |bt AS (SELECT src_id AS bsrc, tgt_id AS btgt FROM (
         | SELECT *, row_number() OVER (PARTITION BY tgt_id
         |   ORDER BY margin DESC, src_id) AS rn FROM m) WHERE rn = 1)
         |SELECT bs.src_id, bs.tgt_id, bs.margin,
         | (bt.bsrc IS NOT NULL) AS mutual
         |FROM bs LEFT JOIN bt
         | ON bs.src_id = bt.bsrc AND bs.tgt_id = bt.btgt""".stripMargin,

    // Classifier.cohenKappa replay: identical rater bucketing, exact
    // BIGINT cells/marginals, kappa as one division; degenerate-marginal
    // convention (pe = 1 -> kappa = 0) mirrored.
    "label_agreement" ->
      s"""WITH rated AS (
         | SELECT CASE WHEN n_chars < 200 THEN 'short'
         |   WHEN n_chars < 380 THEN 'medium' ELSE 'long' END AS ra,
         |  CASE WHEN len($toksSql) < 38 THEN 'short'
         |   WHEN len($toksSql) < 72 THEN 'medium' ELSE 'long' END AS rb
         | FROM documents),
         |cells AS (SELECT ra, rb, CAST(count(*) AS BIGINT) AS nc
         | FROM rated GROUP BY ra, rb),
         |ma AS (SELECT ra AS label, sum(nc) AS na FROM cells GROUP BY ra),
         |mb AS (SELECT rb AS label, sum(nc) AS nb FROM cells GROUP BY rb),
         |sp AS (SELECT coalesce(sum(na * nb), 0) AS sum_prod
         | FROM ma JOIN mb USING (label)),
         |tt AS (SELECT sum(nc) AS n,
         |  sum(CASE WHEN ra = rb THEN nc ELSE 0 END) AS agree FROM cells)
         |SELECT CAST(tt.n AS BIGINT) AS n,
         | round(CAST(tt.agree AS DOUBLE) / tt.n, 6) AS po,
         | round(CAST(sp.sum_prod AS DOUBLE) / (tt.n * tt.n), 6) AS pe,
         | CASE WHEN tt.n * tt.n = sp.sum_prod THEN 0.0
         |  ELSE round(CAST(tt.n * tt.agree - sp.sum_prod AS DOUBLE) /
         |   (tt.n * tt.n - sp.sum_prod), 6) END AS kappa
         |FROM tt CROSS JOIN sp""".stripMargin,

    // Drift.psi replay: identical bin expression, Laplace-smoothed exact
    // integer ratios, identical (p_r - p_c) * ln(p_r/p_c) shape; the total
    // is the window sum of the ROUNDED terms (each a 1e-6 multiple, so the
    // final round cannot straddle a boundary).
    "drift_psi" ->
      """WITH rc AS (
        | SELECT CAST(least(greatest(floor((value - 0.0) / 50.0), 0), 9) AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n_ref
        | FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL GROUP BY 1),
        |cc AS (
        | SELECT CAST(least(greatest(floor((value - 0.0) / 50.0), 0), 9) AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n_cur
        | FROM events WHERE event_id % 2 = 1 AND value IS NOT NULL GROUP BY 1),
        |bins AS (SELECT CAST(i AS BIGINT) AS bin FROM generate_series(0, 9) t(i)),
        |j AS (SELECT b.bin, coalesce(rc.n_ref, 0) AS n_ref,
        |  coalesce(cc.n_cur, 0) AS n_cur
        | FROM bins b LEFT JOIN rc USING (bin) LEFT JOIN cc USING (bin)),
        |tot AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM j),
        |terms AS (
        | SELECT bin, n_ref, n_cur,
        |  round((CAST(n_ref + 1 AS DOUBLE) / (tot.tr + 10) -
        |         CAST(n_cur + 1 AS DOUBLE) / (tot.tc + 10)) *
        |   ln((CAST(n_ref + 1 AS DOUBLE) / (tot.tr + 10)) /
        |      (CAST(n_cur + 1 AS DOUBLE) / (tot.tc + 10))), 6) AS psi_term
        | FROM j CROSS JOIN tot)
        |SELECT bin, n_ref, n_cur, psi_term,
        | round(sum(psi_term) OVER (), 6) AS psi_total
        |FROM terms""".stripMargin,

    // Profile.benford replay: same first-digit extraction with the 10->1
    // clamp, expected from the ROUNDED log10 probability, chi-square from
    // the ROUNDED expected — every division shape identical.
    "benford_audit" ->
      """WITH d AS (
        | SELECT CASE WHEN raw = 10 THEN 1 ELSE raw END AS digit FROM (
        |  SELECT CAST(floor(value / pow(10, floor(log10(value)))) AS BIGINT) AS raw
        |  FROM events WHERE value IS NOT NULL AND value > 0) q),
        |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
        |t AS (SELECT sum(n) AS nt FROM c),
        |sel AS (SELECT digit, n,
        |  round(t.nt * round(log10(1 + 1.0 / digit), 6), 6) AS expected
        | FROM c CROSS JOIN t)
        |SELECT digit, n, expected,
        | round((n - expected) * (n - expected) / expected, 6) AS chi2_term
        |FROM sel""".stripMargin,

    // Classifier.brierDecomposition replay over the shared trained-scored
    // CTEs: micro-unit lifts, exact-integer numerators, identical division
    // chains for rel/res/brier/uncertainty.
    "brier_decomposition" ->
      s"""WITH $classifierScoredSqlCtes,
         |rws AS (SELECT CAST(least(floor(prob * 100), 99) AS BIGINT) AS bin,
         |  CAST(round(prob * 1000000, 0) AS BIGINT) AS pu,
         |  CAST(y AS BIGINT) AS yi FROM scored),
         |pb AS (SELECT bin, CAST(count(*) AS BIGINT) AS n, sum(pu) AS sp,
         |  sum(yi) AS sy,
         |  sum(CAST(pu - 1000000 * yi AS DOUBLE) * (pu - 1000000 * yi)) AS sq
         | FROM rws GROUP BY bin),
         |gl AS (SELECT sum(n) AS nt, sum(sy) AS syt, sum(sq) AS sqt FROM pb)
         |SELECT bin, n,
         | round(CAST(sp - 1000000 * sy AS DOUBLE) * (sp - 1000000 * sy)
         |   / n / 1000000000000.0 / gl.nt, 6) AS rel_term,
         | round(CAST(sy * gl.nt - gl.syt * n AS DOUBLE) * (sy * gl.nt - gl.syt * n)
         |   / n / gl.nt / gl.nt / gl.nt, 6) AS res_term,
         | round(gl.sqt / gl.nt / 1000000000000.0, 6) AS brier,
         | round(CAST(gl.syt * (gl.nt - gl.syt) AS DOUBLE) / (gl.nt * gl.nt), 6)
         |  AS uncertainty
         |FROM pb CROSS JOIN gl""".stripMargin,

    // Rake.keyphrases replay: same fixed stoplist, gaps-and-islands
    // phrases, deg/freq micro-unit word scores, integer phrase sums,
    // (score DESC, phrase) rank.
    "rake_keyphrases" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |pt AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
         |   i -> {'pos': i, 'tok': toks[i]})) AS u FROM tk),
         |ct AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM pt
         | WHERE u.tok NOT IN ($rakeStopSql)),
         |isl AS (SELECT doc_id, pos, tok,
         |  pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         | FROM ct),
         |ph AS (SELECT doc_id, grp, string_agg(tok, ' ' ORDER BY pos) AS phrase,
         |  CAST(count(*) AS BIGINT) AS plen
         | FROM isl GROUP BY doc_id, grp),
         |wstats AS (SELECT i.doc_id, i.tok,
         |  CAST(count(*) AS BIGINT) AS freq, sum(p.plen) AS deg
         | FROM isl i JOIN ph p USING (doc_id, grp) GROUP BY i.doc_id, i.tok),
         |wu AS (SELECT doc_id, tok,
         |  CAST(round(deg * 1000000 / freq, 0) AS BIGINT) AS wu FROM wstats),
         |su AS (SELECT i.doc_id, i.grp, sum(w.wu) AS su
         | FROM isl i JOIN wu w ON w.doc_id = i.doc_id AND w.tok = i.tok
         | GROUP BY i.doc_id, i.grp),
         |ps AS (SELECT DISTINCT s.doc_id, p.phrase, p.plen, s.su
         | FROM su s JOIN ph p ON p.doc_id = s.doc_id AND p.grp = s.grp),
         |rk AS (SELECT doc_id, phrase, plen, su,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY su DESC, phrase) AS rnk
         | FROM ps)
         |SELECT doc_id, phrase, plen AS n_words,
         | round(CAST(su AS DOUBLE) / 1000000, 6) AS score,
         | CAST(rnk AS BIGINT) AS rank
         |FROM rk WHERE rnk <= 3""".stripMargin,

    // EditDistance.jaroPairs replay: identical surname plant, first-letter
    // blocks, DuckDB's standard jaro_winkler_similarity (verified
    // term-for-term against the engine's kernel: 0/1600 mismatches at
    // 6 dp on this plant's variant space).
    "dedup_jaro" ->
      s"""WITH $plantedSurnameSqlCtes,
         |b AS (SELECT doc_id AS id, lower(name) AS nmv,
         |  substr(lower(name), 1, 1) AS blk FROM nm),
         |p AS (SELECT a.id AS id_a, c.id AS id_b, a.nmv AS name_a,
         |  c.nmv AS name_b,
         |  round(jaro_winkler_similarity(a.nmv, c.nmv), 6) AS jw
         | FROM b a JOIN b c ON a.blk = c.blk AND a.id < c.id)
         |SELECT id_a, id_b, name_a, name_b, jw
         |FROM p WHERE jw >= 0.85""".stripMargin,

    // KMeans.kCenter replay: unrolled greedy rounds — seed = min vec_id,
    // each next center the (rounded-d2 DESC, vec_id) argmax of the running
    // least of per-center rounded distances; identical zip-fold distance
    // arithmetic as the kmeans oracles.
    "coreset_kcenter" -> kcenterSql(6, 64),

    // SketchAudit.countMinAudit replay: identical md5-hex bucket hash,
    // depth 3 x width 128 cells, min-over-rows estimate, top-20 keys.
    "cms_audit" ->
      s"""WITH ks AS (SELECT unnest($toksSql) AS k FROM documents),
         |tc AS (SELECT k, CAST(count(*) AS BIGINT) AS n_true
         | FROM ks GROUP BY k),
         |jx AS (SELECT CAST(i AS BIGINT) AS j FROM generate_series(0, 2) t(i)),
         |sk AS (SELECT j,
         |  CAST(('0x' || substr(md5(k || '#' || CAST(j AS VARCHAR)), 1, 8)) AS BIGINT) % 128 AS b,
         |  CAST(count(*) AS BIGINT) AS cell
         | FROM ks CROSS JOIN jx GROUP BY 1, 2),
         |aud AS (SELECT k, n_true FROM tc ORDER BY n_true DESC, k LIMIT 20),
         |est AS (SELECT a.k, min(sk.cell) AS n_est
         | FROM aud a CROSS JOIN jx
         | JOIN sk ON sk.j = jx.j AND sk.b =
         |  CAST(('0x' || substr(md5(a.k || '#' || CAST(jx.j AS VARCHAR)), 1, 8)) AS BIGINT) % 128
         | GROUP BY a.k)
         |SELECT a.k AS key, a.n_true, e.n_est,
         | e.n_est - a.n_true AS overestimate,
         | (e.n_est >= a.n_true) AS never_undercounts
         |FROM aud a JOIN est e USING (k)""".stripMargin,

    // Profile.paretoFrontier replay over the shared quality CTEs: group to
    // per-quality minima, one running-min window (peers excluded via ROWS
    // ... 1 PRECEDING on the distinct-quality table), semi-join back.
    "pareto_quality" ->
      s"""WITH $qualitySqlCtes,
         |base AS (SELECT q.doc_id, q.quality, d.n_chars
         | FROM qscore q JOIN documents d USING (doc_id)),
         |g AS (SELECT quality, min(n_chars) AS gl FROM base GROUP BY quality),
         |f AS (SELECT quality, gl, min(gl) OVER (ORDER BY quality DESC
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev FROM g),
         |fr AS (SELECT quality, gl FROM f WHERE prev IS NULL OR gl < prev)
         |SELECT b.doc_id, b.quality, CAST(b.n_chars AS BIGINT) AS n_chars
         |FROM base b JOIN fr ON b.quality = fr.quality AND b.n_chars = fr.gl""".stripMargin,

    // Profile.inclusionDependency replay: distinct-value containment per
    // declared pair, exact division, flag on the rounded value.
    "inclusion_profile" -> Seq(
        ("lineitem", "l_orderkey", "orders", "o_orderkey",
          "lineitem.l_orderkey->orders.o_orderkey"),
        ("orders", "o_custkey", "customer", "c_custkey",
          "orders.o_custkey->customer.c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey",
          "customer.c_nationkey->nation.n_nationkey"),
        ("orders", "o_custkey", "supplier", "s_suppkey",
          "orders.o_custkey->supplier.s_suppkey"))
      .map { case (ct, cc, pt, pc, label) =>
        s"""SELECT '$label' AS pair,
           | CAST(count(*) AS BIGINT) AS n_child_distinct,
           | CAST(coalesce(sum(hit), 0) AS BIGINT) AS n_contained,
           | round(CAST(coalesce(sum(hit), 0) AS DOUBLE) / count(*), 6) AS containment,
           | (round(CAST(coalesce(sum(hit), 0) AS DOUBLE) / count(*), 6) >= 0.95) AS fk_candidate
           |FROM (
           | SELECT c.v, CASE WHEN p.v IS NOT NULL THEN 1 ELSE 0 END AS hit
           | FROM (SELECT DISTINCT CAST($cc AS VARCHAR) AS v FROM $ct
           |        WHERE $cc IS NOT NULL) c
           | LEFT JOIN (SELECT DISTINCT CAST($pc AS VARCHAR) AS v FROM $pt
           |        WHERE $pc IS NOT NULL) p USING (v)) q""".stripMargin }
      .mkString("", "\nUNION ALL\n", ""),

    // BRUTE-FORCE all-pairs oracle for Dedup.prefixFilterJoin — no prefix
    // filter at all, so a hash match PROVES the zero-false-negative
    // guarantee. Same integer verify predicate (inter*5 >= union*4).
    "ssjoin_prefix" ->
      s"""WITH tk AS (SELECT doc_id, list_distinct($toksSql) AS s
         | FROM documents WHERE doc_id < 1000),
         |nz AS (SELECT doc_id, s, len(s) AS n FROM tk WHERE len(s) > 0),
         |p AS (
         | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_inter,
         |  CAST(a.n + b.n - len(list_intersect(a.s, b.s)) AS BIGINT) AS n_union
         | FROM nz a JOIN nz b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, n_inter, n_union,
         | round(CAST(n_inter AS DOUBLE) / n_union, 6) AS jaccard
         |FROM p WHERE n_inter * 5 >= n_union * 4""".stripMargin,

    // Similarity.kthNeighborDistance replay: 6-dp cosine distance, rank-5
    // by (dist, corpus id), flag at >= 0.75.
    "outlier_knn" ->
      s"""WITH corpus AS (SELECT vec_id, embedding FROM embeddings),
         |qs AS (SELECT vec_id AS qid, embedding AS qv
         | FROM corpus WHERE vec_id < 50),
         |scored AS (
         | SELECT qs.qid, c.vec_id,
         |  round(1.0 - (${cosOf("c.embedding", "qs.qv")}), 6) AS d
         | FROM qs, corpus c WHERE c.vec_id <> qs.qid),
         |ranked AS (SELECT qid, d,
         |  row_number() OVER (PARTITION BY qid ORDER BY d, vec_id) AS rn
         | FROM scored)
         |SELECT qid AS vec_id, d AS kth_dist, (d >= 0.75) AS is_outlier
         |FROM ranked WHERE rn = 5""".stripMargin,

    // EventAnalytics.lttbDownsample replay: identical bucket assignment
    // (row_number over (ts, id) div 100), exact-sum bucket averages
    // (BIGINT timestamps, DECIMAL values), identical cross-product area
    // rounded for the argmax, first/last anchors.
    "downsample_lttb" ->
      """WITH pts AS (
        | SELECT event_type AS key, epoch_us(ts) AS tsu, value, event_id AS id,
        |  row_number() OVER (PARTITION BY event_type
        |    ORDER BY epoch_us(ts), event_id) - 1 AS rn
        | FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |bp AS (SELECT *, CAST(floor(rn / 100) AS BIGINT) AS bucket FROM pts),
        |aggs AS (
        | SELECT key, bucket, min(rn) AS lo, max(rn) AS hi,
        |  CAST(sum(tsu) AS DOUBLE) / count(*) AS ax,
        |  CAST(sum(CAST(value AS DECIMAL(24,6))) AS DOUBLE) / count(*) AS ay
        | FROM bp GROUP BY key, bucket),
        |ctx AS (
        | SELECT *, lag(ax) OVER w AS px, lag(ay) OVER w AS py,
        |  lead(ax) OVER w AS nx, lead(ay) OVER w AS ny,
        |  max(bucket) OVER (PARTITION BY key) AS maxb
        | FROM aggs WINDOW w AS (PARTITION BY key ORDER BY bucket)),
        |joined AS (
        | SELECT b.key, b.bucket, b.id, b.tsu, b.value, b.rn, c.lo, c.hi,
        |  c.maxb,
        |  round(abs((c.px - c.nx) * (b.value - c.py) -
        |    (c.px - CAST(b.tsu AS DOUBLE)) * (c.ny - c.py)), 6) AS area
        | FROM bp b JOIN ctx c USING (key, bucket)),
        |picked AS (
        | SELECT *, row_number() OVER (PARTITION BY key, bucket
        |    ORDER BY area DESC, id) AS pick,
        |  CASE WHEN bucket = 0 THEN 'first'
        |   WHEN bucket = maxb THEN 'last' ELSE 'lttb' END AS reason
        | FROM joined)
        |SELECT key, bucket, id, tsu AS ts, value, reason
        |FROM picked
        |WHERE (reason = 'first' AND rn = lo)
        |   OR (reason = 'last' AND rn = hi)
        |   OR (reason = 'lttb' AND pick = 1)""".stripMargin,

    // Daily-series Pearson per unordered type pair: same day-inner-join
    // and moment chain.
    "series_corr" ->
      """WITH daily AS (
        | SELECT event_type,
        |  CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        | GROUP BY 1, 2),
        |paired AS (
        | SELECT a.event_type || '~' || b.event_type AS grp,
        |  a.n AS x, b.n AS y
        | FROM daily a JOIN daily b
        |  ON a.day = b.day AND a.event_type < b.event_type),
        |m AS (SELECT grp, CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
        |  sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx,
        |  sum(y * y) AS syy
        | FROM paired GROUP BY grp)
        |SELECT grp AS "group", n,
        | CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
        |   AND CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
        |  THEN round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
        |   (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
        |    sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
        |  ELSE NULL END AS r
        |FROM m""".stripMargin,

    // Mann-Whitney replay: distinct-value rank table, exact average
    // ranks, tie-corrected variance in the identical shape.
    "mannwhitney_u" ->
      """WITH e AS (SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
        |  (event_id % 2 = 0) AS a
        | FROM events WHERE value IS NOT NULL),
        |bv AS (SELECT v, CAST(count(*) AS BIGINT) AS t,
        |  CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ta
        | FROM e GROUP BY v),
        |rk AS (SELECT v, t, ta,
        |  CAST(coalesce(sum(t) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |   AS below
        | FROM bv),
        |ag AS (SELECT CAST(sum(ta) AS BIGINT) AS n_a,
        |  CAST(sum(t) - sum(ta) AS BIGINT) AS n_b,
        |  sum(ta * (CAST(below + 1 AS DOUBLE) + (t - 1) / 2.0)) AS ra,
        |  CAST(sum(t * t * t - t) AS BIGINT) AS ties
        | FROM rk)
        |SELECT n_a, n_b,
        | round(ra - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1) / 2, 6)
        |  AS u_a,
        | CASE WHEN CAST(n_a AS DOUBLE) * n_b / 12 *
        |   ((CAST(n_a AS DOUBLE) + n_b + 1) -
        |    CAST(ties AS DOUBLE) / ((CAST(n_a AS DOUBLE) + n_b) *
        |     (CAST(n_a AS DOUBLE) + n_b - 1))) > 0
        |  THEN round((ra - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1) / 2
        |    - CAST(n_a AS DOUBLE) * n_b / 2) /
        |   sqrt(CAST(n_a AS DOUBLE) * n_b / 12 *
        |    ((CAST(n_a AS DOUBLE) + n_b + 1) -
        |     CAST(ties AS DOUBLE) / ((CAST(n_a AS DOUBLE) + n_b) *
        |      (CAST(n_a AS DOUBLE) + n_b - 1)))), 6)
        |  ELSE NULL END AS z
        |FROM ag""".stripMargin,

    // Two-proportion z replay: per-user conversion, pooled proportion,
    // identical shape.
    "ab_test_z" ->
      """WITH users AS (
        | SELECT user_id,
        |  CAST(max(CASE WHEN event_type = 'purchase' AND value > 480
        |    THEN 1 ELSE 0 END) AS BIGINT) AS conv,
        |  CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS grp
        | FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
        |g AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(conv) AS BIGINT) AS conv FROM users GROUP BY grp),
        |a AS (SELECT n AS n_a, conv AS conv_a FROM g WHERE grp = 'A'),
        |b AS (SELECT n AS n_b, conv AS conv_b FROM g WHERE grp = 'B')
        |SELECT n_a, conv_a, n_b, conv_b,
        | round(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
        | round(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
        | CASE WHEN CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b) > 0
        |    AND CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b) < 1
        |  THEN round((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b) /
        |   sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
        |    (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
        |    (1.0 / n_a + 1.0 / n_b)), 6)
        |  ELSE NULL END AS z
        |FROM a CROSS JOIN b""".stripMargin,

    // Stump replay over the shared quality features: distinct-value
    // sweep, suffix/prefix sums, identical entropy shapes.
    "stump_split" ->
      s"""WITH $qualitySqlCtes,
         |pts AS (SELECT q.doc_id, round(qr.mean_tok_len, 6) AS x,
         |  CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
         | FROM qr JOIN documents d USING (doc_id)
         |  JOIN qscore q ON q.doc_id = qr.doc_id),
         |dist AS (SELECT x, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(y) AS BIGINT) AS p FROM pts GROUP BY x),
         |sw AS (SELECT x,
         |  CAST(sum(n) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nl,
         |  CAST(sum(p) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pl,
         |  CAST(sum(n) OVER () AS BIGINT) AS nt,
         |  CAST(sum(p) OVER () AS BIGINT) AS pt
         | FROM dist),
         |gains AS (SELECT x, nl, pl, nt, pt,
         |  round(
         |   (CASE WHEN pt > 0 AND pt < nt
         |     THEN -(CAST(pt AS DOUBLE)/nt)*ln(CAST(pt AS DOUBLE)/nt)
         |          -(CAST(nt-pt AS DOUBLE)/nt)*ln(CAST(nt-pt AS DOUBLE)/nt)
         |     ELSE 0.0 END)
         |   - (CAST(nl AS DOUBLE)/nt) *
         |    (CASE WHEN pl > 0 AND pl < nl
         |      THEN -(CAST(pl AS DOUBLE)/nl)*ln(CAST(pl AS DOUBLE)/nl)
         |           -(CAST(nl-pl AS DOUBLE)/nl)*ln(CAST(nl-pl AS DOUBLE)/nl)
         |      ELSE 0.0 END)
         |   - (CAST(nt-nl AS DOUBLE)/nt) *
         |    (CASE WHEN pt-pl > 0 AND pt-pl < nt-nl
         |      THEN -(CAST(pt-pl AS DOUBLE)/(nt-nl))*ln(CAST(pt-pl AS DOUBLE)/(nt-nl))
         |           -(CAST((nt-nl)-(pt-pl) AS DOUBLE)/(nt-nl))*ln(CAST((nt-nl)-(pt-pl) AS DOUBLE)/(nt-nl))
         |      ELSE 0.0 END), 6) AS gain
         | FROM sw WHERE nl < nt),
         |pick AS (SELECT *, row_number() OVER (ORDER BY gain DESC, x) AS rn
         | FROM gains)
         |SELECT x AS split_at, nl AS n_left, nt - nl AS n_right,
         | pl AS pos_left, pt - pl AS pos_right, gain
         |FROM pick WHERE rn = 1""".stripMargin,

    // Gains/lift replay over the trained-scored CTEs: identical integer
    // decile bucketing and cumulative sums.
    "gains_curve" ->
      s"""WITH $classifierScoredSqlCtes,
         |rk AS (SELECT y,
         |  row_number() OVER (ORDER BY prob DESC, doc_id) AS rn,
         |  CAST(count(*) OVER () AS BIGINT) AS n FROM scored),
         |dec AS (SELECT (rn * 10 + n - 1) // n AS decile,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(y AS BIGINT)) AS BIGINT) AS n_pos
         | FROM rk GROUP BY 1),
         |cum AS (SELECT decile, n, n_pos,
         |  CAST(sum(n_pos) OVER (ORDER BY decile
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cp,
         |  CAST(sum(n) OVER (ORDER BY decile
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn,
         |  CAST(sum(n_pos) OVER () AS BIGINT) AS tp,
         |  CAST(sum(n) OVER () AS BIGINT) AS tn
         | FROM dec)
         |SELECT CAST(decile AS BIGINT) AS decile, n, n_pos,
         | round(CAST(cp AS DOUBLE) / tp, 6) AS cum_pos_share,
         | round((CAST(cp AS DOUBLE) * tn) / (CAST(cn AS DOUBLE) * tp), 6)
         |  AS lift
         |FROM cum""".stripMargin,

    // Sampling.greedySetCover replay: unrolled materialized rounds.
    "set_cover_docs" -> setCoverSql(5),

    // Drift.fightinWords replay: vocabulary count tables, identical
    // prior/log-odds/variance shapes.
    "fightin_words" ->
      s"""WITH ca AS (SELECT t AS term, CAST(count(*) AS BIGINT) AS ya
         | FROM (SELECT unnest($toksSql) AS t FROM documents
         |        WHERE lang = 'en') q GROUP BY t),
         |cb AS (SELECT t AS term, CAST(count(*) AS BIGINT) AS yb
         | FROM (SELECT unnest($toksSql) AS t FROM documents
         |        WHERE lang <> 'en') q GROUP BY t),
         |j AS (SELECT coalesce(ca.term, cb.term) AS term,
         |  coalesce(ya, 0) AS n_a, coalesce(yb, 0) AS n_b
         | FROM ca FULL OUTER JOIN cb ON ca.term = cb.term),
         |tot AS (SELECT sum(n_a) AS na, sum(n_b) AS nb,
         |  sum(n_a) + sum(n_b) AS np FROM j),
         |sc AS (SELECT term, n_a, n_b,
         |  100.0 * CAST(n_a + n_b AS DOUBLE) / tot.np AS aw,
         |  tot.na AS na, tot.nb AS nb
         | FROM j CROSS JOIN tot)
         |SELECT term, n_a, n_b,
         | round(ln((n_a + aw) / (na + 100.0 - n_a - aw)) -
         |   ln((n_b + aw) / (nb + 100.0 - n_b - aw)), 6) AS delta,
         | round((ln((n_a + aw) / (na + 100.0 - n_a - aw)) -
         |   ln((n_b + aw) / (nb + 100.0 - n_b - aw))) /
         |  sqrt(1.0 / (n_a + aw) + 1.0 / (n_b + aw)), 6) AS z
         |FROM sc""".stripMargin,

    // Partitioning.rendezvousShard replay: per-shard md5 scores, argmax
    // by (hash, shard).
    "rendezvous_shards" ->
      """WITH sc AS (
        | SELECT d.doc_id, sh.s,
        |  CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '|' || sh.s), 1, 8)) AS BIGINT) AS h
        | FROM documents d CROSS JOIN (
        |  SELECT 'shard' || CAST(i AS VARCHAR) AS s
        |  FROM generate_series(0, 7) t(i)) sh),
        |rk AS (SELECT doc_id, s,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, s DESC) AS rn
        | FROM sc)
        |SELECT doc_id, s AS shard FROM rk WHERE rn = 1""".stripMargin,

    // Exact least-squares residuals over the shared quality CTEs:
    // micro-lifted moments, 9-dp slope/intercept, 6-dp outputs.
    "quality_residuals" ->
      s"""WITH $qualitySqlCtes,
         |qq AS (SELECT q.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars,
         |  CAST(round(q.quality * 1000000, 0) AS BIGINT) AS qu
         | FROM qscore q JOIN documents d USING (doc_id)),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(n_chars) AS sx,
         |  sum(qu) AS sy, sum(n_chars * qu) AS sxy,
         |  sum(n_chars * n_chars) AS sxx FROM qq),
         |ab AS (SELECT
         |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
         |    (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) / 1000000.0, 9) AS b,
         |  round((CAST(sy AS DOUBLE) / n / 1000000.0) -
         |    ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
         |     (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) / 1000000.0) *
         |    (CAST(sx AS DOUBLE) / n), 9) AS a
         | FROM m)
         |SELECT qq.doc_id, qq.n_chars,
         | round(CAST(qq.qu AS DOUBLE) / 1000000.0, 6) AS quality,
         | round(CAST(qq.qu AS DOUBLE) / 1000000.0 -
         |   (ab.a + ab.b * qq.n_chars), 6) + 0.0 AS residual
         |FROM qq CROSS JOIN ab""".stripMargin,

    // EventAnalytics.dwellTime replay: per-user lead gaps, per-type rank
    // selection.
    "dwell_time" ->
      """WITH ev AS (
        | SELECT user_id, event_type, epoch_us(ts) AS tsu, event_id
        | FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |  AND ts IS NOT NULL),
        |g AS (SELECT event_type,
        |  lead(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) - tsu
        |   AS gg, event_id
        | FROM ev),
        |gaps AS (SELECT event_type, gg, event_id FROM g WHERE gg IS NOT NULL),
        |r AS (SELECT event_type, gg,
        |  row_number() OVER (PARTITION BY event_type ORDER BY gg, event_id) AS rn,
        |  CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        | FROM gaps),
        |med AS (SELECT event_type, n AS n_gaps, gg AS median_us FROM r
        | WHERE rn = (n + 1) // 2),
        |p90 AS (SELECT event_type, gg AS p90_us FROM r
        | WHERE rn = (n * 9 + 9) // 10)
        |SELECT med.event_type, med.n_gaps, med.median_us, p90.p90_us
        |FROM med JOIN p90 USING (event_type)""".stripMargin,

    // Graph.healthStats replay over the same planted edges: reversed
    // semi-join reciprocity, total-degree moments, the fixed Pearson
    // combination shape.
    "graph_health" ->
      """WITH ids AS (SELECT doc_id FROM documents),
        |e0 AS (
        | SELECT doc_id AS s, doc_id + 1 AS d FROM ids WHERE doc_id % 7 < 3
        | UNION ALL
        | SELECT doc_id, doc_id + 3 FROM ids WHERE doc_id % 11 = 0),
        |e AS (SELECT DISTINCT s, d FROM e0
        | WHERE d IN (SELECT doc_id FROM ids)),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM (
        | SELECT s AS v FROM e UNION SELECT d FROM e) q),
        |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
        | SELECT s AS v FROM e UNION ALL SELECT d FROM e) q GROUP BY v),
        |rc AS (SELECT CAST(count(*) AS BIGINT) AS n_reciprocal
        | FROM e WHERE EXISTS (SELECT 1 FROM e r WHERE r.s = e.d AND r.d = e.s)),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_edges,
        |  sum(dx.deg) AS sx, sum(dy.deg) AS sy,
        |  sum(dx.deg * dy.deg) AS sxy, sum(dx.deg * dx.deg) AS sxx,
        |  sum(dy.deg * dy.deg) AS syy
        | FROM e JOIN deg dx ON dx.v = e.s JOIN deg dy ON dy.v = e.d)
        |SELECT nn.n_nodes, m.n_edges, rc.n_reciprocal,
        | round(CAST(rc.n_reciprocal AS DOUBLE) / m.n_edges, 6) AS reciprocity,
        | CASE WHEN CAST(m.n_edges AS DOUBLE) * m.sxx - CAST(m.sx AS DOUBLE) * m.sx > 0
        |   AND CAST(m.n_edges AS DOUBLE) * m.syy - CAST(m.sy AS DOUBLE) * m.sy > 0
        |  THEN round((CAST(m.n_edges AS DOUBLE) * m.sxy - CAST(m.sx AS DOUBLE) * m.sy) /
        |   (sqrt(CAST(m.n_edges AS DOUBLE) * m.sxx - CAST(m.sx AS DOUBLE) * m.sx) *
        |    sqrt(CAST(m.n_edges AS DOUBLE) * m.syy - CAST(m.sy AS DOUBLE) * m.sy)), 6)
        |  ELSE NULL END AS assortativity
        |FROM m CROSS JOIN nn CROSS JOIN rc""".stripMargin,

    // Dataset.pivot == conditional aggregation (the portable form).
    "pivot_daily" ->
      """SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
        | CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        | CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        | CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        | CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        | CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY 1""".stripMargin,

    // The spark.sql gate's text, near-verbatim.
    "sql_surface" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(n_chars) AS BIGINT) AS total_chars,
        | round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS mean_chars
        |FROM documents GROUP BY lang, source""".stripMargin,

    // EventAnalytics.rollingActiveUsers replay: distinct (user, day),
    // 7-window membership fan-out, distinct count per window, one
    // division. Only days with DAU emit (inner join).
    "rolling_active_users" ->
      """WITH ud AS (
        | SELECT DISTINCT user_id AS u,
        |  CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day
        | FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
        | FROM ud GROUP BY day),
        |wau AS (SELECT day, CAST(count(*) AS BIGINT) AS wau FROM (
        | SELECT DISTINCT * FROM (
        |  SELECT u, unnest(range(day, day + 7)) AS day FROM ud) z) q
        | GROUP BY day)
        |SELECT dau.day, dau.dau, wau.wau,
        | round(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
        |FROM dau JOIN wau USING (day)""".stripMargin,

    // Per-cluster top-3 by distance over the shared k-means CTEs.
    "cluster_exemplars" ->
      s"""WITH ${kmeansCtes(10, 2, 64)},
         |asg AS (SELECT vec_id, cluster, round(d2, 6) AS dist2 FROM (
         |  SELECT e.vec_id, c.cluster, ${kmeansD2("e", "c", 64)} AS d2,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${kmeansD2("e", "c", 64)} ASC, c.cluster ASC) AS rn
         |  FROM e CROSS JOIN c2 c) q WHERE rn = 1),
         |rk AS (SELECT cluster, vec_id, dist2,
         |  row_number() OVER (PARTITION BY cluster
         |    ORDER BY dist2, vec_id) AS r
         | FROM asg)
         |SELECT CAST(cluster AS BIGINT) AS cluster, vec_id, dist2,
         | CAST(r AS BIGINT) AS rank
         |FROM rk WHERE r <= 3""".stripMargin,

    // Search.autocompleteIndex replay: vocabulary counts, prefix fan-out,
    // (n DESC, token) rank windows.
    "autocomplete_index" ->
      s"""WITH counts AS (SELECT t AS token, CAST(count(*) AS BIGINT) AS n
         | FROM (SELECT unnest($toksSql) AS t FROM documents) q GROUP BY t),
         |pf AS (SELECT token, n,
         |  unnest(list_transform(range(1, least(len(token), 4) + 1),
         |    i -> token[1:i])) AS prefix
         | FROM counts),
         |rk AS (SELECT prefix, token, n,
         |  row_number() OVER (PARTITION BY prefix ORDER BY n DESC, token) AS r
         | FROM pf)
         |SELECT prefix, token, n, CAST(r AS BIGINT) AS rank
         |FROM rk WHERE r <= 3""".stripMargin,

    // EditDistance.spellCorrect replay: identical deletion-variant
    // generation on both sides, (dist, freq DESC, word) ranking,
    // left-join null for no suggestion.
    "spell_correct" ->
      s"""WITH vocab AS (SELECT t AS w, CAST(count(*) AS BIGINT) AS n
         | FROM (SELECT unnest($toksSql) AS t FROM documents) q GROUP BY t),
         |qs AS (
         | SELECT DISTINCT substr(w, 1, 1) || substr(w, 3, 100) AS query
         | FROM vocab
         | UNION SELECT 'spark' UNION SELECT 'qqqq'),
         |qv AS (SELECT query, unnest(list_distinct(list_prepend(query,
         |   list_transform(range(1, len(query) + 1),
         |     i -> query[1:i-1] || query[i+1:len(query)])))) AS v
         | FROM qs),
         |vv AS (SELECT w, n, unnest(list_distinct(list_prepend(w,
         |   list_transform(range(1, len(w) + 1),
         |     i -> w[1:i-1] || w[i+1:len(w)])))) AS v
         | FROM vocab),
         |cands AS (
         | SELECT DISTINCT qv.query, vv.w, vv.n FROM qv JOIN vv USING (v)),
         |vd AS (SELECT query, w, n,
         |  CAST(levenshtein(query, w) AS BIGINT) AS d
         | FROM cands WHERE levenshtein(query, w) <= 1),
         |best AS (SELECT query, w AS correction, n AS freq, d AS dist FROM (
         | SELECT *, row_number() OVER (PARTITION BY query
         |   ORDER BY d, n DESC, w) AS rn FROM vd) z WHERE rn = 1)
         |SELECT q.query, b.correction, b.freq, b.dist
         |FROM qs q LEFT JOIN best b USING (query)""".stripMargin,

    // Partitioning.zorder replay: identical bit-extraction/shift fold.
    "zorder_index" ->
      """WITH base AS (
        | SELECT event_id, user_id % 65536 AS x,
        |  CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS y
        | FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL)
        |SELECT event_id, x, y,
        | CAST(list_sum(list_transform(range(0, 16), i ->
        |   (CAST(floor(x / pow(2, i)) AS BIGINT) % 2) * CAST(pow(2, 2 * i) AS BIGINT) +
        |   (CAST(floor(y / pow(2, i)) AS BIGINT) % 2) * CAST(pow(2, 2 * i + 1) AS BIGINT)
        |  )) AS BIGINT) AS zvalue
        |FROM base""".stripMargin,

    // Classifier.bestF1Threshold replay over the trained-scored CTEs:
    // distinct-score suffix sums, exact-integer F1, conservative ties.
    "threshold_opt" ->
      s"""WITH $classifierScoredSqlCtes,
         |dist AS (SELECT prob AS p,
         |  CAST(sum(CAST(y AS BIGINT)) AS BIGINT) AS np,
         |  CAST(sum(1 - CAST(y AS BIGINT)) AS BIGINT) AS nn
         | FROM scored GROUP BY prob),
         |sw AS (SELECT p,
         |  CAST(sum(np) OVER (ORDER BY p DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
         |  CAST(sum(nn) OVER (ORDER BY p DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fp,
         |  CAST(sum(np) OVER () AS BIGINT) AS pos
         | FROM dist),
         |fs AS (SELECT p, tp, fp, pos - tp AS fn, pos,
         |  CASE WHEN 2 * tp + fp + (pos - tp) > 0
         |   THEN round(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + (pos - tp)), 6)
         |   ELSE 0.0 END AS f1
         | FROM sw),
         |pick AS (SELECT *, row_number() OVER (ORDER BY f1 DESC, p DESC) AS rn
         | FROM fs)
         |SELECT p AS threshold, tp, fp, fn,
         | CASE WHEN tp + fp > 0 THEN round(CAST(tp AS DOUBLE) / (tp + fp), 6)
         |  ELSE 0.0 END AS precision,
         | CASE WHEN pos > 0 THEN round(CAST(tp AS DOUBLE) / pos, 6)
         |  ELSE 0.0 END AS recall, f1
         |FROM pick WHERE rn = 1""".stripMargin,

    // Search.percolate replay: list_has_all == the forall verify.
    "stored_queries" ->
      s"""WITH docs AS (SELECT doc_id, list_distinct($toksSql) AS s
         | FROM documents),
         |reg AS (
         | SELECT 'q_join_perf' AS query_id, ['join', 'fast'] AS terms,
         |  'join fast' AS query_terms
         | UNION ALL SELECT 'q_scan_table', ['scan', 'table'], 'scan table'
         | UNION ALL SELECT 'q_spark_window', ['spark', 'window'], 'spark window'
         | UNION ALL SELECT 'q_sort_merge', ['sort', 'merge'], 'sort merge'
         | UNION ALL SELECT 'q_hash_key_value', ['hash', 'key', 'value'],
         |  'hash key value')
         |SELECT r.query_id, r.query_terms,
         | CAST(sum(CASE WHEN list_has_all(d.s, r.terms) THEN 1 ELSE 0 END) AS BIGINT) AS n_matches
         |FROM docs d CROSS JOIN reg r
         |GROUP BY r.query_id, r.query_terms""".stripMargin,

    // Search.percolateIndexed must be ROW-IDENTICAL to the broadcast
    // regime — the rarest-term prefilter loses nothing for conjunctive
    // queries — so it replays the same conjunctive count.
    "stored_queries_indexed" ->
      s"""WITH docs AS (SELECT doc_id, list_distinct($toksSql) AS s
         | FROM documents),
         |reg AS (
         | SELECT 'q_join_perf' AS query_id, ['join', 'fast'] AS terms,
         |  'join fast' AS query_terms
         | UNION ALL SELECT 'q_scan_table', ['scan', 'table'], 'scan table'
         | UNION ALL SELECT 'q_spark_window', ['spark', 'window'], 'spark window'
         | UNION ALL SELECT 'q_sort_merge', ['sort', 'merge'], 'sort merge'
         | UNION ALL SELECT 'q_hash_key_value', ['hash', 'key', 'value'],
         |  'hash key value')
         |SELECT r.query_id, r.query_terms,
         | CAST(sum(CASE WHEN list_has_all(d.s, r.terms) THEN 1 ELSE 0 END) AS BIGINT) AS n_matches
         |FROM docs d CROSS JOIN reg r
         |GROUP BY r.query_id, r.query_terms""".stripMargin,

    // CurationRules.robotsCheck replay: same host/rule plants, prefix
    // match via starts_with, longest-match window with allow tie-break.
    // Sitemap.parse replay: every urlset field reconstructed from the
    // documents row that produced it, plus one index pointer per source.
    "sitemap_parse" ->
      """SELECT source,
        | 'https://ex.org/d?id=' || doc_id || '&s=' || source AS loc,
        | '2024-01-' || lpad(CAST(doc_id % 27 + 1 AS VARCHAR), 2, '0') AS lastmod,
        | 'daily' AS changefreq,
        | '0.' || CAST(doc_id % 10 AS VARCHAR) AS priority,
        | false AS from_index
        |FROM documents
        |UNION ALL
        |SELECT DISTINCT source, 'https://ex.org/sm/' || source || '.xml',
        | '2024-02-01', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), true
        |FROM documents""".stripMargin,

    // crawl_frontier replay, closed-form: the canonical URL (scheme/host
    // lowered, :443 and tracking and fragment gone, /? collapsed), its
    // host/path split, and the longest-match robots verdict.
    "crawl_frontier" ->
      """WITH u AS (
        | SELECT 'www.site' || (doc_id % 10) || '.example.com' AS host,
        |  '/sec' || (doc_id % 3) || '/p' || doc_id || '?id=' || doc_id AS path,
        |  (doc_id % 10) AS h, (doc_id % 3) AS s
        | FROM documents)
        |SELECT 'https://' || host || path AS canonical, host, path,
        | CASE WHEN s = 1 AND h % 3 = 0 THEN
        |   CASE WHEN h % 6 = 0 THEN '/sec1/p' ELSE '/sec1/' END
        |  ELSE '/' END AS matched_rule,
        | NOT (s = 1 AND h % 3 = 0 AND h % 6 <> 0) AS allowed
        |FROM u""".stripMargin,

    "robots_check" ->
      """WITH urls AS (
        | SELECT doc_id,
        |  'www.site' || CAST(doc_id % 100 % 10 AS VARCHAR) || '.example.' ||
        |   (['com', 'co.uk', 'org', 'com.au'])[CAST(doc_id % 100 % 4 + 1 AS INT)] AS host,
        |  '/path/' || CAST(doc_id % 100 AS VARCHAR) AS path
        | FROM documents),
        |hs AS (SELECT DISTINCT doc_id % 100 % 20 AS h FROM documents),
        |hh AS (SELECT h,
        |  'www.site' || CAST(h % 10 AS VARCHAR) || '.example.' ||
        |   (['com', 'co.uk', 'org', 'com.au'])[CAST(h % 4 + 1 AS INT)] AS rhost
        | FROM hs),
        |rules AS (
        | SELECT rhost, '/' AS rule, true AS allow FROM hh
        | UNION ALL SELECT rhost, '/path/', false FROM hh WHERE h % 3 = 0
        | UNION ALL SELECT rhost, '/path/1', true FROM hh WHERE h % 6 = 0),
        |matched AS (
        | SELECT u.doc_id, u.host, u.path, r.rule, r.allow,
        |  row_number() OVER (PARTITION BY u.doc_id
        |    ORDER BY len(r.rule) DESC, r.allow DESC, r.rule) AS rn
        | FROM urls u JOIN rules r
        |  ON u.host = r.rhost AND starts_with(u.path, r.rule)),
        |best AS (SELECT doc_id, rule AS matched_rule, allow AS allowed
        | FROM matched WHERE rn = 1)
        |SELECT u.doc_id, u.host, u.path, b.matched_rule,
        | coalesce(b.allowed, true) AS allowed
        |FROM urls u LEFT JOIN best b USING (doc_id)""".stripMargin,

    // Similarity.mutualKnnPairs replay: 6-dp cosines, per-side rank
    // windows, mutual join with id_a < id_b.
    "mutual_knn" ->
      s"""WITH corpus AS (SELECT vec_id, embedding FROM embeddings
         | WHERE vec_id < 1250),
         |scored AS (
         | SELECT a.vec_id AS qa, b.vec_id AS qb,
         |  round(${cosOf("a.embedding", "b.embedding")}, 6) AS c
         | FROM corpus a, corpus b WHERE a.vec_id <> b.vec_id),
         |ranked AS (SELECT qa, qb, c,
         |  row_number() OVER (PARTITION BY qa ORDER BY c DESC, qb) AS rk
         | FROM scored),
         |topk AS (SELECT * FROM ranked WHERE rk <= 5),
         |fwd AS (SELECT qa AS id_a, qb AS id_b, c AS cos,
         |  CAST(rk AS BIGINT) AS rank_ab FROM topk WHERE qa < qb),
         |bwd AS (SELECT qb AS id_a, qa AS id_b,
         |  CAST(rk AS BIGINT) AS rank_ba FROM topk WHERE qa > qb)
         |SELECT f.id_a, f.id_b, f.cos, f.rank_ab, b.rank_ba
         |FROM fwd f JOIN bwd b USING (id_a, id_b)""".stripMargin,

    // EventAnalytics.decayedActivity replay: sorted list_reduce fold of
    // identical pow-of-2 terms, 7-day half-life.
    "decay_scores" ->
      """WITH base AS (
        | SELECT user_id AS u, epoch_us(ts) AS tsu FROM events
        | WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |tm AS (SELECT max(tsu) AS tmax FROM base),
        |g AS (SELECT u AS user, CAST(count(*) AS BIGINT) AS n_events,
        |  max(tsu) AS last_ts, list(tsu ORDER BY tsu) AS tss
        | FROM base GROUP BY u)
        |SELECT g.user, g.n_events, g.last_ts,
        | round(list_reduce(
        |   list_transform(g.tss,
        |     t -> pow(2.0, -(CAST(tm.tmax - t AS DOUBLE) / 604800000000.0))),
        |   (a, b) -> a + b), 6) AS score
        |FROM g CROSS JOIN tm""".stripMargin,

    // Classifier.conformalThreshold replay over the trained-scored CTEs:
    // micro nonconformity, integer rank ceil((n+1)*9/10) clamped, holdout
    // coverage.
    "conformal_threshold" ->
      s"""WITH $classifierScoredSqlCtes,
         |sc AS (SELECT doc_id,
         |  CAST(round(abs(y - prob) * 1000000, 0) AS BIGINT) AS su,
         |  (doc_id % 2 = 0) AS cal FROM scored),
         |ranked AS (SELECT su,
         |  row_number() OVER (ORDER BY su, doc_id) AS rn,
         |  CAST(count(*) OVER () AS BIGINT) AS n FROM sc WHERE cal),
         |thr AS (SELECT n AS n_cal, su AS thr FROM ranked
         | WHERE rn = least(n, ((n + 1) * 9 + 9) // 10)),
         |ev AS (SELECT su FROM sc WHERE NOT cal)
         |SELECT thr.n_cal,
         | round(CAST(thr.thr AS DOUBLE) / 1000000.0, 6) AS threshold,
         | CAST(count(*) AS BIGINT) AS n_eval,
         | round(CAST(sum(CASE WHEN ev.su <= thr.thr THEN 1 ELSE 0 END) AS DOUBLE)
         |   / count(*), 6) AS coverage
         |FROM ev CROSS JOIN thr GROUP BY thr.n_cal, thr.thr""".stripMargin,

    // Classifier.featureAttribution replay: same trained weights (w2),
    // decimal-exact rounded means, argmax on the ROUNDED contributions
    // with name-priority ties (c1 < c2 < c3 alphabetically).
    "feature_attribution" ->
      s"""WITH $classifierScoredSqlCtes,
         |mm AS (SELECT
         |  round(CAST(sum(CAST(x1 AS DECIMAL(24,6))) AS DOUBLE) / count(*), 6) AS m1,
         |  round(CAST(sum(CAST(x2 AS DECIMAL(24,6))) AS DOUBLE) / count(*), 6) AS m2,
         |  round(CAST(sum(CAST(x3 AS DECIMAL(24,6))) AS DOUBLE) / count(*), 6) AS m3
         | FROM f),
         |cc AS (SELECT f.doc_id,
         |  round(w2.w1 * (f.x1 - mm.m1), 6) AS c1,
         |  round(w2.w2 * (f.x2 - mm.m2), 6) AS c2,
         |  round(w2.w3 * (f.x3 - mm.m3), 6) AS c3,
         |  round(w2.b + w2.w1 * f.x1 + w2.w2 * f.x2 + w2.w3 * f.x3, 6) AS logit
         | FROM f CROSS JOIN w2 CROSS JOIN mm)
         |SELECT doc_id,
         | CASE WHEN abs(c1) >= abs(c2) AND abs(c1) >= abs(c3)
         |   THEN 'mean_token_len'
         |  WHEN abs(c2) >= abs(c3) THEN 'punct_ratio'
         |  ELSE 'stopword_ratio' END AS top_feature,
         | CASE WHEN abs(c1) >= abs(c2) AND abs(c1) >= abs(c3) THEN c1
         |  WHEN abs(c2) >= abs(c3) THEN c2 ELSE c3 END AS contribution,
         | logit
         |FROM cc""".stripMargin,

    // EditDistance.sortedNeighborhoodPairs replay: lexicographic distinct
    // ranks, band join within 3, DuckDB's verified-identical JW kernel,
    // id expansion.
    "sorted_neighborhood" ->
      s"""WITH $plantedSurnameSqlCtes,
         |nmd AS (SELECT doc_id AS id, lower(name) AS nmv FROM nm),
         |rk AS (SELECT nmv, row_number() OVER (ORDER BY nmv) AS r
         | FROM (SELECT DISTINCT nmv FROM nmd) q),
         |np AS (
         | SELECT a.nmv AS na, b.nmv AS nb,
         |  round(jaro_winkler_similarity(a.nmv, b.nmv), 6) AS jw
         | FROM rk a JOIN rk b ON b.r - a.r >= 0 AND b.r - a.r <= 3
         | WHERE round(jaro_winkler_similarity(a.nmv, b.nmv), 6) >= 0.85),
         |np2 AS (SELECT na, nb, jw FROM np
         | UNION ALL SELECT nb, na, jw FROM np WHERE na <> nb)
         |SELECT la.id AS id_a, lb.id AS id_b, np2.na AS name_a,
         | np2.nb AS name_b, np2.jw
         |FROM np2 JOIN nmd la ON la.nmv = np2.na
         | JOIN nmd lb ON lb.nmv = np2.nb
         |WHERE la.id < lb.id""".stripMargin,

    // Spearman = Pearson on min-rank ties; identical window + moment
    // chain shapes.
    "spearman_corr" ->
      """WITH base AS (
        | SELECT event_type AS g,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |  CAST(round(value * 100, 0) AS BIGINT) AS cents
        | FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
        |  AND CAST(json_extract(props, '$.k') AS BIGINT) IS NOT NULL),
        |rks AS (SELECT g,
        |  CAST(rank() OVER (PARTITION BY g ORDER BY k) AS BIGINT) AS x,
        |  CAST(rank() OVER (PARTITION BY g ORDER BY cents) AS BIGINT) AS y
        | FROM base),
        |m AS (
        | SELECT g AS grp, CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
        |  sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx,
        |  sum(y * y) AS syy
        | FROM rks GROUP BY g)
        |SELECT grp AS "group", n,
        | CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
        |   AND CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
        |  THEN round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
        |   (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
        |    sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
        |  ELSE NULL END AS r
        |FROM m""".stripMargin,

    // Exact dow/hour cells from epoch micros; share one division.
    "activity_heatmap" ->
      """WITH cells AS (
        | SELECT CAST((floor(epoch_us(ts) / 86400000000) + 4) % 7 AS BIGINT) AS dow,
        |  CAST(floor(epoch_us(ts) / 3600000000) % 24 AS BIGINT) AS hour,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT sum(n) AS t FROM cells)
        |SELECT dow, hour, n, round(CAST(n AS DOUBLE) / tot.t, 6) AS share
        |FROM cells CROSS JOIN tot""".stripMargin,

    // Profile.quantileDiff replay: rank-selected deciles per half under
    // (value, id), exact integer gaps.
    "quantile_diff" ->
      """WITH ha AS (SELECT event_id,
        |  CAST(round(value * 100, 0) AS BIGINT) AS cents
        | FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL),
        |hb AS (SELECT event_id,
        |  CAST(round(value * 100, 0) AS BIGINT) AS cents
        | FROM events WHERE event_id % 2 = 1 AND value IS NOT NULL),
        |ra AS (SELECT cents, row_number() OVER (ORDER BY cents, event_id) AS rn,
        |  CAST(count(*) OVER () AS BIGINT) AS n FROM ha),
        |rb AS (SELECT cents, row_number() OVER (ORDER BY cents, event_id) AS rn,
        |  CAST(count(*) OVER () AS BIGINT) AS n FROM hb),
        |qs AS (SELECT CAST(i AS BIGINT) AS q FROM generate_series(1, 9) t(i)),
        |da AS (SELECT qs.q, ra.cents AS x_a FROM qs JOIN ra
        | ON ra.rn = (qs.q * ra.n + 9) // 10),
        |db AS (SELECT qs.q, rb.cents AS x_b FROM qs JOIN rb
        | ON rb.rn = (qs.q * rb.n + 9) // 10)
        |SELECT da.q, da.x_a, db.x_b, db.x_b - da.x_a AS diff
        |FROM da JOIN db USING (q)""".stripMargin,

    // Classifier.targetEncodeLoo replay: identical rational rewrite and
    // double shapes, m = 10.
    "target_encoding" ->
      """WITH base AS (
        | SELECT event_id, event_type AS category,
        |  CAST(round(value * 100, 0) AS BIGINT) AS y
        | FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |cats AS (SELECT category, CAST(count(*) AS BIGINT) AS nc,
        |  sum(y) AS sc FROM base GROUP BY category),
        |gl AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(y) AS sy FROM base)
        |SELECT b.event_id, b.category, b.y,
        | round((CAST(c.sc - b.y AS DOUBLE) * gl.n +
        |   CAST(10 AS DOUBLE) * gl.sy) /
        |  (CAST(gl.n AS DOUBLE) * (c.nc - 1 + 10)), 6) AS enc
        |FROM base b JOIN cats c USING (category) CROSS JOIN gl""".stripMargin,

    // EventAnalytics.funnelLatency replay: first-A / first-B-after joins,
    // integer rank selection for median and p90.
    "funnel_latency" ->
      """WITH base AS (
        | SELECT user_id AS u, event_type AS t, epoch_us(ts) AS tsu
        | FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |fa AS (SELECT u, min(tsu) AS ta FROM base WHERE t = 'click'
        | GROUP BY u),
        |fb AS (SELECT b.u, fa.ta, min(b.tsu) AS tb
        | FROM base b JOIN fa USING (u)
        | WHERE b.t = 'purchase' AND b.tsu >= fa.ta GROUP BY b.u, fa.ta),
        |d AS (SELECT u, tb - ta AS dd FROM fb),
        |r AS (SELECT dd, row_number() OVER (ORDER BY dd, u) AS rn,
        |  CAST(count(*) OVER () AS BIGINT) AS ncv FROM d),
        |na AS (SELECT CAST(count(*) AS BIGINT) AS n_a FROM fa),
        |med AS (SELECT dd AS median_us, ncv AS n_converted FROM r
        | WHERE rn = (ncv + 1) // 2),
        |p90 AS (SELECT dd AS p90_us FROM r WHERE rn = (ncv * 9 + 9) // 10)
        |SELECT na.n_a, med.n_converted,
        | round(CAST(med.n_converted AS DOUBLE) / na.n_a, 6) AS conv_rate,
        | med.median_us, p90.p90_us
        |FROM na CROSS JOIN med CROSS JOIN p90""".stripMargin,

    // Profile.chiSquareIndependence replay: cell/marginal tables, rounded
    // expectations, window-summed rounded terms.
    "chisq_independence" ->
      """WITH cells AS (
        | SELECT lang AS a, source AS b, CAST(count(*) AS BIGINT) AS n
        | FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
        | GROUP BY 1, 2),
        |ra AS (SELECT a, sum(n) AS ra FROM cells GROUP BY a),
        |cb AS (SELECT b, sum(n) AS cb FROM cells GROUP BY b),
        |tot AS (SELECT sum(n) AS nt,
        |  CAST(count(DISTINCT a) AS BIGINT) AS ka,
        |  CAST(count(DISTINCT b) AS BIGINT) AS kb FROM cells),
        |t1 AS (SELECT c.a, c.b, c.n, tot.ka, tot.kb,
        |  round(CAST(ra.ra * cb.cb AS DOUBLE) / tot.nt, 6) AS expected
        | FROM cells c JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN tot),
        |t2 AS (SELECT a, b, n, ka, kb, expected,
        |  round((n - expected) * (n - expected) / expected, 6) AS chi2_term
        | FROM t1)
        |SELECT a, b, n, expected, chi2_term,
        | round(sum(chi2_term) OVER (), 6) AS chi2_total,
        | (ka - 1) * (kb - 1) AS dof
        |FROM t2""".stripMargin,

    // Profile.pearsonByGroup replay: exact BIGINT moment sums, double
    // combination chain, per-group + pooled rows.
    "group_correlation" ->
      """WITH xy AS (
        | SELECT event_type AS g,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS x,
        |  CAST(round(value * 100, 0) AS BIGINT) AS y
        | FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
        |  AND CAST(json_extract(props, '$.k') AS BIGINT) IS NOT NULL),
        |m AS (
        | SELECT g AS grp, CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
        |  sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx,
        |  sum(y * y) AS syy
        | FROM xy GROUP BY g
        | UNION ALL
        | SELECT '<pooled>', CAST(count(*) AS BIGINT), sum(x), sum(y),
        |  sum(x * y), sum(x * x), sum(y * y)
        | FROM xy)
        |SELECT grp AS "group", n,
        | CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
        |   AND CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
        |  THEN round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
        |   (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
        |    sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
        |  ELSE NULL END AS r
        |FROM m""".stripMargin,

    // Pairwise signal Pearson over the shared quality CTEs: micro-unit
    // lifts of the 6-dp signals, same moment chain per pair label.
    "signal_corr" ->
      s"""WITH $qualitySqlCtes,
         |sig AS (
         | SELECT q.doc_id,
         |  CAST(round(round(qr.mean_tok_len, 6) * 1000000, 0) AS BIGINT) AS mtl,
         |  CAST(round(round(qr.punct_ratio, 6) * 1000000, 0) AS BIGINT) AS pr,
         |  CAST(round(round(qr.stop_ratio, 6) * 1000000, 0) AS BIGINT) AS sr,
         |  CAST(round(q.quality * 1000000, 0) AS BIGINT) AS ql
         | FROM qr JOIN qscore q USING (doc_id)),
         |stack AS (
         | SELECT 'mean_token_len~punct_ratio' AS grp, mtl AS x, pr AS y FROM sig
         | UNION ALL SELECT 'mean_token_len~stopword_ratio', mtl, sr FROM sig
         | UNION ALL SELECT 'mean_token_len~quality', mtl, ql FROM sig
         | UNION ALL SELECT 'punct_ratio~stopword_ratio', pr, sr FROM sig
         | UNION ALL SELECT 'punct_ratio~quality', pr, ql FROM sig
         | UNION ALL SELECT 'stopword_ratio~quality', sr, ql FROM sig),
         |m AS (
         | SELECT grp, CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
         |  sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx,
         |  sum(y * y) AS syy
         | FROM stack GROUP BY grp)
         |SELECT grp AS "group", n,
         | CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
         |   AND CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
         |  THEN round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
         |   (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
         |    sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
         |  ELSE NULL END AS r
         |FROM m""".stripMargin,

    // TextAnalysis.kwic replay: per-occurrence window slice, 1-based
    // positions, edge clipping.
    "kwic_snippets" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |hits AS (
         | SELECT doc_id, toks, u.pos AS p1 FROM (
         |  SELECT doc_id, toks,
         |   unnest(list_transform(range(1, len(toks) + 1),
         |     i -> {'pos': i, 'tok': toks[i]})) AS u
         |  FROM tk) q WHERE u.tok = 'spark')
         |SELECT doc_id, CAST(p1 AS BIGINT) AS pos,
         | array_to_string(toks[greatest(p1 - 3, 1):least(len(toks), p1 + 3)], ' ') AS snippet,
         | CAST(least(len(toks), p1 + 3) - greatest(p1 - 3, 1) + 1 AS BIGINT) AS n_window
         |FROM hits""".stripMargin,

    // EventAnalytics.theilSenTrend replay: exact-division slopes rounded
    // 6 dp, lower median under the (slope, d1, d2) order.
    "trend_theilsen" ->
      """WITH daily AS (
        | SELECT event_type AS key,
        |  CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |nd AS (SELECT key, CAST(count(*) AS BIGINT) AS n_days
        | FROM daily GROUP BY key),
        |sl AS (
        | SELECT a.key, a.day AS d1, b.day AS d2,
        |  round(CAST(b.n - a.n AS DOUBLE) / (b.day - a.day), 6) AS s
        | FROM daily a JOIN daily b ON a.key = b.key AND a.day < b.day),
        |rk AS (SELECT key, s,
        |  row_number() OVER (PARTITION BY key ORDER BY s, d1, d2) AS rn,
        |  CAST(count(*) OVER (PARTITION BY key) AS BIGINT) AS np
        | FROM sl),
        |med AS (SELECT key, np AS n_pairs, s AS slope FROM rk
        | WHERE rn = (np + 1) // 2)
        |SELECT nd.key, nd.n_days, coalesce(med.n_pairs, 0) AS n_pairs,
        | med.slope
        |FROM nd LEFT JOIN med USING (key)""".stripMargin,

    // EventAnalytics.noveltyRate replay: distinct (user, day), first-day
    // join-back, exact ratio.
    "novelty_rate" ->
      """WITH ud AS (
        | SELECT DISTINCT user_id AS u,
        |  CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day
        | FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |fst AS (SELECT u, min(day) AS fd FROM ud GROUP BY u)
        |SELECT ud.day, CAST(count(*) AS BIGINT) AS n_active,
        | CAST(sum(CASE WHEN ud.day = fst.fd THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        | round(CAST(sum(CASE WHEN ud.day = fst.fd THEN 1 ELSE 0 END) AS DOUBLE)
        |   / count(*), 6) AS new_ratio
        |FROM ud JOIN fst USING (u)
        |GROUP BY ud.day""".stripMargin,

    // StateStore.cdcApply replay: last-op-wins via a descending
    // row_number, per-key op/delete counts, integer cents.
    "cdc_apply" ->
      """WITH lg AS (
        | SELECT user_id AS k, epoch_us(ts) AS tsu, event_id AS id,
        |  CAST(round(value * 100, 0) AS BIGINT) AS cents,
        |  (event_type = 'error') AS del
        | FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |wn AS (SELECT *,
        |  row_number() OVER (PARTITION BY k ORDER BY tsu DESC, id DESC) AS rnd,
        |  CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n_ops,
        |  CAST(sum(CASE WHEN del THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY k) AS BIGINT) AS n_del
        | FROM lg)
        |SELECT k AS key, round(CAST(cents AS DOUBLE) / 100.0, 6) AS value,
        | tsu AS last_ts, n_ops, n_ops - n_del AS n_upserts,
        | n_del AS n_deletes, (n_del > 0) AS resurrected
        |FROM wn WHERE rnd = 1 AND NOT del""".stripMargin,

    // EventAnalytics.journeyTrigrams replay: two leads, path concat,
    // TakeOrdered top-20.
    "journey_trigrams" ->
      """WITH ev AS (
        | SELECT user_id, event_type, epoch_us(ts) AS tsu, event_id
        | FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |  AND ts IS NOT NULL),
        |w AS (SELECT event_type AS t1,
        |  lead(event_type, 1) OVER (PARTITION BY user_id
        |    ORDER BY tsu, event_id) AS t2,
        |  lead(event_type, 2) OVER (PARTITION BY user_id
        |    ORDER BY tsu, event_id) AS t3
        | FROM ev)
        |SELECT t1 || '>' || t2 || '>' || t3 AS path,
        | CAST(count(*) AS BIGINT) AS n
        |FROM w WHERE t3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,

    // Drift.embeddingDrift replay: micro-unit dimension sums, identical
    // contraction shape, scale-invariant cosine on the sum vectors.
    "embed_drift" ->
      """WITH ha AS (SELECT embedding FROM embeddings WHERE vec_id % 2 = 0),
        |hb AS (SELECT embedding FROM embeddings WHERE vec_id % 2 = 1),
        |sa AS (SELECT u.d AS d, sum(u.s) AS s FROM (
        | SELECT unnest(list_transform(range(1, len(embedding) + 1),
        |   i -> {'d': i,
        |         's': CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000.0, 0) AS BIGINT)})) AS u
        | FROM ha) q GROUP BY 1),
        |sb AS (SELECT u.d AS d, sum(u.s) AS s FROM (
        | SELECT unnest(list_transform(range(1, len(embedding) + 1),
        |   i -> {'d': i,
        |         's': CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000.0, 0) AS BIGINT)})) AS u
        | FROM hb) q GROUP BY 1),
        |na AS (SELECT CAST(count(*) AS BIGINT) AS n_a FROM ha),
        |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b FROM hb),
        |j AS (SELECT coalesce(sa.s, 0) AS va, coalesce(sb.s, 0) AS vb
        | FROM sa FULL OUTER JOIN sb USING (d)),
        |c AS (SELECT sum(CAST(va AS DOUBLE) * vb) AS dot,
        |  sum(CAST(va AS DOUBLE) * va) AS a2,
        |  sum(CAST(vb AS DOUBLE) * vb) AS b2 FROM j)
        |SELECT na.n_a, nb.n_b,
        | CASE WHEN c.a2 > 0 AND c.b2 > 0
        |  THEN round(c.dot / (sqrt(c.a2) * sqrt(c.b2)), 6) ELSE NULL END
        |  AS mean_cosine,
        | CASE WHEN c.b2 > 0 AND na.n_a > 0
        |  THEN round(sqrt(c.a2) * nb.n_b / (sqrt(c.b2) * na.n_a), 6)
        |  ELSE NULL END AS norm_ratio
        |FROM c CROSS JOIN na CROSS JOIN nb""".stripMargin,

    // get_json_object == json_extract + BIGINT cast; exact-integer stats.
    "json_props_stats" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_k,
        | CAST(min(k) AS BIGINT) AS k_min, CAST(max(k) AS BIGINT) AS k_max,
        | CAST(sum(k) AS BIGINT) AS k_sum
        |FROM (SELECT event_type,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events) q
        |GROUP BY event_type""".stripMargin,

    // LangModel.windowedCooccurrence replay: position-band pair join,
    // unordered normalization, fixed-shape PMI product chain.
    "cooc_window" ->
      s"""WITH pos AS (
         | SELECT doc_id, u.pos AS p, u.tok AS w FROM (
         |  SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
         |    i -> {'pos': i, 'tok': toks[i]})) AS u
         |  FROM (SELECT doc_id, $toksSql AS toks FROM documents) t) q),
         |pairs AS (
         | SELECT least(a.w, b.w) AS w1, greatest(a.w, b.w) AS w2,
         |  CAST(count(*) AS BIGINT) AS pair_count
         | FROM pos a JOIN pos b
         |  ON a.doc_id = b.doc_id AND b.p - a.p BETWEEN 1 AND 2
         | GROUP BY 1, 2),
         |occ AS (SELECT w, CAST(count(*) AS BIGINT) AS nw FROM pos GROUP BY w),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pos),
         |tt AS (SELECT sum(pair_count) AS t FROM pairs)
         |SELECT p.w1, p.w2, p.pair_count,
         | round(ln(CAST(p.pair_count AS DOUBLE) * nt.n * nt.n /
         |   (CAST(tt.t AS DOUBLE) * oa.nw * ob.nw)), 6) AS pmi
         |FROM pairs p JOIN occ oa ON oa.w = p.w1 JOIN occ ob ON ob.w = p.w2
         | CROSS JOIN nt CROSS JOIN tt
         |WHERE p.pair_count >= 5""".stripMargin,

    // LangModel.negativeSamplingDist replay: pow rounded first, DECIMAL
    // normalizer sum, one division each.
    "negative_sampling" ->
      s"""WITH occ AS (
         | SELECT t AS token, CAST(count(*) AS BIGINT) AS n,
         |  round(pow(CAST(count(*) AS DOUBLE), 0.75), 6) AS pw
         | FROM (SELECT unnest($toksSql) AS t FROM documents) q GROUP BY t),
         |tot AS (SELECT sum(n) AS nt,
         |  CAST(sum(CAST(pw AS DECIMAL(24,6))) AS DOUBLE) AS z FROM occ)
         |SELECT token, n, round(CAST(n AS DOUBLE) / tot.nt, 6) AS p_raw,
         | round(pw / tot.z, 6) AS p_neg
         |FROM occ CROSS JOIN tot""".stripMargin,

    // Profile.functionalDependency replay per declared dependency.
    "fd_audit" -> Seq(
        ("nation", "n_name", "n_regionkey", "nation.n_name->n_regionkey"),
        ("customer", "c_nationkey", "c_mktsegment",
          "customer.c_nationkey->c_mktsegment"),
        ("documents", "source", "lang", "documents.source->lang"))
      .map { case (tbl, lhs, rhs, label) =>
        s"""SELECT '$label' AS dependency,
           | CAST(count(*) AS BIGINT) AS n_lhs,
           | CAST(sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
           | CAST(max(nr) AS BIGINT) AS max_rhs_per_lhs,
           | (sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) = 0) AS holds
           |FROM (SELECT l, count(*) AS nr FROM (
           | SELECT DISTINCT $lhs AS l, $rhs AS r FROM $tbl
           | WHERE $lhs IS NOT NULL AND $rhs IS NOT NULL) q GROUP BY l) g""".stripMargin }
      .mkString("", "\nUNION ALL\n", ""),

    // Profile.domainTree replay: reversed labels, prefix nodes, counts.
    "domain_tree" ->
      """WITH hosts AS (
        | SELECT 'www.site' || CAST(doc_id % 100 % 10 AS VARCHAR) ||
        |  '.example.' ||
        |  (['com', 'co.uk', 'org', 'com.au'])[CAST(doc_id % 100 % 4 + 1 AS INT)] AS host
        | FROM documents),
        |lab AS (SELECT list_reverse(string_split(lower(host), '.')) AS ls
        | FROM hosts),
        |nodes AS (SELECT unnest(list_transform(range(1, len(ls) + 1),
        |   d -> {'node': array_to_string(ls[1:d], '.'), 'depth': d})) AS u
        | FROM lab)
        |SELECT u.node AS node, CAST(u.depth AS BIGINT) AS depth,
        | CAST(count(*) AS BIGINT) AS n_urls
        |FROM nodes GROUP BY 1, 2""".stripMargin,

    // Similarity.hammingRerankRecall replay: Hamming shortlist over the
    // binarize CTE, exact-cosine rerank, recall vs the exact top-5.
    "hamming_rerank_recall" -> hammingRerankRecallSqlStr,

    // Similarity.truncationRecall replay: 16-dim-prefix cosine top-5 vs
    // the full top-5, per-query hit count, one exact division.
    "truncation_recall" -> truncationRecallSqlStr,

    // Similarity.sq8Recall replay: per-vector max-abs int8 quantization,
    // INTEGER dot products, one division + 6dp round per pair.
    "sq8_recall" -> sq8RecallSqlStr,

    // Similarity.ivfPqRecall replay (ivfPqRecallSql scaladoc): micro-unit
    // IVF training + assignment, unit-vector PQ codebooks per subspace,
    // per-query probe ranking + left-to-right ADC sums, recall vs the
    // exact cosine top-5.
    "ivf_pq_recall" -> ivfPqRecallSqlStr,

    // Similarity.ivfPqRerankRecall replay: same CTE chain with the
    // shortlist + exact-cosine rerank arm.
    "ivf_pq_rerank_recall" -> ivfPqRerankRecallSqlStr,

    // Similarity.jlRecall replay (jlRecallSqlStr scaladoc): the recall
    // formulation of the random-projection axis.
    "jl_recall" -> jlRecallSqlStr,

    // Similarity.compressionTradeoff replay: the five per-axis recall
    // oracles wrapped + aggregated (compressionTradeoffSql scaladoc).
    "compression_tradeoff" -> compressionTradeoffSql,
    "compression_tradeoff_clustered" -> compressionTradeoffClusteredSql,

    "pq_rotation_tradeoff" -> pqRotationTradeoffSql,

    // The identity: the engine only matches if the legacy-Office writers
    // AND the real binary walks (Word 97 piece table, PPT record tree,
    // BIFF8 SST) round-trip every character. The payload pre-normalizes
    // CR / cell-mark / VT to \n (what the extractors canonicalize) and
    // brackets the text so trim is a no-op.
    "legacy_office_roundtrip" -> {
      val p = "'[' || replace(replace(replace(text, chr(13), chr(10)), " +
        "chr(7), chr(10)), chr(11), chr(10)) || ']'"
      s"""SELECT doc_id, $p AS doc_text, $p AS ppt_text, $p AS xls_text
         |FROM documents WHERE text IS NOT NULL AND length(text) <= 10000""".stripMargin
    },

    // The pre-97 Word walk's identity, over the ASCII-printable slice
    // (Word 95 is a single-byte format — the row-level class filter is
    // mismatch-proof across engines, see the gate comment).
    "word95_roundtrip" ->
      ("SELECT doc_id, '[' || replace(text, chr(13), chr(10)) || ']' " +
        "AS w95_text FROM documents WHERE text IS NOT NULL " +
        "AND length(text) <= 10000 AND NOT regexp_matches(text, " +
        "'[^ -~' || chr(10) || chr(9) || chr(13) || ']')"),

    // The BIFF5 walk's per-cell line algebra (one LABEL per line; the
    // reader trims each cell, drops empties, joins with newline), over
    // the ASCII-printable / line-capped / non-blank slice — filters
    // mirror the gate verbatim so a row passes or drops in BOTH engines.
    "biff5_roundtrip" ->
      ("SELECT doc_id, array_to_string(list_filter(list_transform(" +
        "string_split(replace(text, chr(13), chr(10)), chr(10)), " +
        "x -> trim(x, ' ' || chr(9))), x -> x <> ''), chr(10)) AS xls5_text " +
        "FROM documents WHERE text IS NOT NULL AND length(text) <= 10000 " +
        "AND NOT regexp_matches(text, '[^ -~' || chr(10) || chr(9) || chr(13) || ']') " +
        "AND NOT regexp_matches(text, '[^' || chr(10) || ']{254}') " +
        "AND regexp_matches(text, '[^ ' || chr(9) || chr(10) || chr(13) || ']')"),

    // Verbatim identity, twice: the classic subset-font layout AND the
    // modern ObjStm/xref-stream/filter-chain re-pack of the same document
    // — the engine only matches through the ToUnicode CMap walk plus (for
    // the second column) ObjStm splicing and the Flate/LZW/A85 filters.
    "pdf_cmap_roundtrip" ->
      """SELECT doc_id, '[' || text || ']' AS pdf_text,
        |  '[' || text || ']' AS pdf_objstm_text,
        |  '[' || text || ']' AS pdf_predictor_text
        |FROM documents WHERE text IS NOT NULL AND length(text) <= 10000""".stripMargin,

    // Content-over-label identity: four container columns are the plain
    // payload; the vtt column additionally rides the subtitle markup
    // strip (same replay as subtitle_roundtrip).
    "format_sniff" -> {
      val p = "'[' || replace(replace(replace(text, chr(13), chr(10)), " +
        "chr(7), chr(10)), chr(11), chr(10)) || ']'"
      s"""SELECT doc_id, $p AS odt_as_docx, $p AS pdf_as_docx,
         | $p AS doc_as_ppt, $p AS xls_as_doc,
         | 'opening credits' || chr(10) || regexp_replace(regexp_replace(
         |   $p, '\\{\\\\an[0-9]+\\}', '', 'g'), '<[^>]*>', '', 'g') AS vtt_as_srt
         |FROM documents WHERE text IS NOT NULL AND length(text) <= 10000""".stripMargin
    },

    // Verbatim identity through the ODF writers + extractors, three
    // container shapes at once.
    "odf_roundtrip" ->
      """SELECT doc_id, '[' || text || ']' AS odt_text,
        |  '[' || text || ']' AS ods_text,
        |  '[' || text || ']' AS odp_text
        |FROM documents WHERE text IS NOT NULL AND length(text) <= 10000""".stripMargin,

    // Identity through the tar.zst/zip/bz2 expansion: the four leaf names
    // are pinned as literals (including the ustar-prefix-split long path
    // and the nested `!` members), the payload verbatim.
    "archive_expand" ->
      ("SELECT d.doc_id, e.entry, '[' || d.text || ']' AS entry_text " +
        "FROM documents d CROSS JOIN (VALUES ('part1.txt'), " +
        s"('corpus/${"d" * 110}/part2.txt'), ('inner.zip!part3.txt'), " +
        "('part4.txt.bz2!part4.txt'), ('part5.txt.lz4!part5.txt'), " +
        "('part6.txt.sz!part6.txt')) " +
        "AS e(entry) WHERE d.text IS NOT NULL AND length(d.text) <= 10000"),

    // Identity through the two-message mboxrd framing: subject + blank +
    // body per message, messages joined by a blank line — exactly what
    // mbox()/eml() emit when splitting and MIME decode are faithful.
    "mbox_parse" ->
      ("SELECT doc_id, 's1-' || doc_id || chr(10) || chr(10) || p || " +
        "chr(10) || chr(10) || 's2-' || doc_id || chr(10) || chr(10) || p " +
        "AS mbox_text FROM (SELECT doc_id, " +
        "'[' || replace(text, chr(13), chr(10)) || ']' AS p FROM documents " +
        "WHERE text IS NOT NULL AND length(text) <= 10000)"),

    // Identity through both nbformat walks: segment framing (source, code,
    // stream text, result text, tail cell) replayed as literals.
    "notebook_roundtrip" ->
      ("SELECT doc_id, " +
        "p || b || 'print(1 + 1)' || b || '2' || chr(10) || 'done' || b || " +
        "'42' || b || 'rawtail' AS nb4_text, " +
        "p || b || 'print(1 + 1)' || b || '2' || chr(10) || 'legacy' || b || " +
        "'7' || b || '## Legacy heading' AS nb3_text " +
        "FROM (SELECT doc_id, '[' || text || ']' AS p, " +
        "chr(10) || chr(10) AS b FROM documents " +
        "WHERE text IS NOT NULL AND length(text) <= 10000)"),

    // Identity through the cue walks: the lead cue's stripped text, then
    // the payload through the SAME one-pass markup strip the extractor
    // applies to the joined transcript ('g' = global, matching Spark).
    "subtitle_roundtrip" ->
      ("SELECT doc_id, s AS srt_text, s AS vtt_text FROM (" +
        "SELECT doc_id, 'opening credits' || chr(10) || " +
        "regexp_replace(regexp_replace(" +
        "'[' || replace(text, chr(13), chr(10)) || ']', " +
        "'\\{\\\\an[0-9]+\\}', '', 'g'), '<[^>]*>', '', 'g') AS s " +
        "FROM documents WHERE text IS NOT NULL AND length(text) <= 10000)"),

    // Identity through the LaTeX escape map + detex walk: section header,
    // payload, \item coda.
    "latex_roundtrip" ->
      """SELECT doc_id, 'Header' || chr(10) || '[' || text || ']' ||
        |  chr(10) || 'last item' AS tex_text
        |FROM documents WHERE text IS NOT NULL AND length(text) <= 10000""".stripMargin,

    "ivf_pq_production_recall" ->
      ivfPqRecallSql(20, 5, 2, rerankShortlist = Some(20), m = 8,
        kCodes = 64),

    // Similarity.ivfPqRerankRecall replay at the production budget for
    // nProbe in {2, 4} — two full training replays differing only in the
    // probe-cell cut. Concatenated, never re-stripMargin'd (the inner SQL
    // carries `||`).
    "ivf_pq_nprobe_sweep" ->
      ("SELECT 2 AS n_probe, q.* FROM (" +
        ivfPqRecallSql(20, 5, 2, rerankShortlist = Some(20), m = 8,
          kCodes = 64) +
        ") q UNION ALL SELECT 4 AS n_probe, q.* FROM (" +
        ivfPqRecallSql(20, 5, 4, rerankShortlist = Some(20), m = 8,
          kCodes = 64) + ") q"),

    // EventAnalytics.rollingDaily replay: RANGE-framed day window,
    // integer-cent sums, identical division shapes.
    "rolling_7d" ->
      """WITH daily AS (
        | SELECT event_type AS key,
        |  CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
        |  CAST(count(*) AS BIGINT) AS n,
        |  sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
        | FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        | GROUP BY 1, 2),
        |roll AS (
        | SELECT key, day, n,
        |  CAST(sum(n) OVER w AS BIGINT) AS rolling_n,
        |  CAST(sum(cents) OVER w AS BIGINT) AS rc
        | FROM daily
        | WINDOW w AS (PARTITION BY key ORDER BY day
        |   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT key, day, n, rolling_n,
        | round(CAST(rc AS DOUBLE) / 100.0, 6) AS rolling_value,
        | round(CAST(rc AS DOUBLE) / (100.0 * rolling_n), 6) AS rolling_avg
        |FROM roll""".stripMargin,

    // EventAnalytics.ewmaDaily replay: per-day independent left-to-right
    // list_reduce folds seeded with the first element — the exact op
    // sequence of the engine's aggregate() fold.
    "ewma_daily" ->
      """WITH daily AS (
        | SELECT event_type AS key,
        |  CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |series AS (
        | SELECT key, list(day ORDER BY day) AS days,
        |  list(CAST(n AS DOUBLE) ORDER BY day) AS xs
        | FROM daily GROUP BY key),
        |expl AS (
        | SELECT key, unnest(list_transform(range(1, len(xs) + 1),
        |   i -> {'day': days[i], 'n': xs[i],
        |         'ewma': round(list_reduce(xs[1:i],
        |            (acc, x) -> 0.3 * x + 0.7 * acc), 6)})) AS u
        | FROM series)
        |SELECT key, u.day AS day, CAST(u.n AS BIGINT) AS n, u.ewma AS ewma
        |FROM expl""".stripMargin,

    // Spark rollup == DuckDB GROUP BY ROLLUP; subtotal nulls coalesce to
    // 'ALL' on both sides, revenue exact-decimal.
    "rollup_revenue" ->
      """SELECT coalesce(r.r_name, 'ALL') AS region,
        | coalesce(n.n_name, 'ALL') AS nation,
        | CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        | CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY ROLLUP(r.r_name, n.n_name)""".stripMargin,

    // Q8-flavor market share: same 7-table join, exact-decimal revenues,
    // share as one double division.
    "q8_market_share" ->
      """WITH rev AS (
        | SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |  n2.n_name AS supp_nation,
        |  SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS revd
        | FROM lineitem l
        | JOIN orders o ON l.l_orderkey = o.o_orderkey
        | JOIN customer c ON o.o_custkey = c.c_custkey
        | JOIN part p ON l.l_partkey = p.p_partkey AND p.p_size < 15
        | JOIN supplier s ON l.l_suppkey = s.s_suppkey
        | JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        | JOIN region r ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
        | JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        | GROUP BY 1, 2),
        |tot AS (SELECT o_year, sum(revd) AS totd FROM rev GROUP BY o_year)
        |SELECT rev.o_year, rev.supp_nation,
        | CAST(rev.revd AS DOUBLE) AS revenue,
        | round(CAST(rev.revd AS DOUBLE) / CAST(tot.totd AS DOUBLE), 6) AS share
        |FROM rev JOIN tot USING (o_year)""".stripMargin,

    // Similarity.binarize replay: identical 32-bit word packing (2^i
    // accumulated in double, exact below 2^32), bit_count totals.
    "embed_binarize" ->
      s"""WITH codes AS ($binarizeSqlSelect)
         |SELECT vec_id, words[1] AS bits_w0, words[2] AS bits_w1,
         | CAST(list_sum(list_transform(words, x -> bit_count(x))) AS BIGINT) AS n_pos
         |FROM codes""".stripMargin,

    // Similarity.hammingTopK replay: per-word XOR popcount sums, rank by
    // (hamming, id).
    "hamming_topk" ->
      s"""WITH codes AS ($binarizeSqlSelect),
         |qs AS (SELECT vec_id AS qid, words AS qw FROM codes WHERE vec_id < 20),
         |scored AS (
         | SELECT qs.qid, c.vec_id AS id,
         |  CAST(list_sum(list_transform(range(1, len(qs.qw) + 1),
         |    j -> bit_count(xor(qs.qw[j], c.words[j])))) AS BIGINT) AS hamming
         | FROM qs, codes c WHERE c.vec_id <> qs.qid),
         |ranked AS (SELECT qid, id, hamming,
         |  row_number() OVER (PARTITION BY qid ORDER BY hamming, id) AS rn
         | FROM scored)
         |SELECT qid, id, hamming, CAST(rn AS BIGINT) AS rank
         |FROM ranked WHERE rn <= 5""".stripMargin,

    // Similarity.hammingTopKBlocked replay: 8-bit bands per 32-bit word
    // (band b -> word b//4, shift (b%4)*8), candidates = any-band
    // agreement, exact XOR-popcount re-rank — integer arithmetic end to
    // end.
    "hamming_topk_blocked" ->
      s"""WITH codes AS ($binarizeSqlSelect),
         |bands AS (
         | SELECT vec_id, unnest(list_transform(range(0, 4 * len(words)),
         |   b -> {'band': b,
         |     'bits': (words[CAST(b // 4 + 1 AS INT)]
         |       >> CAST((b % 4) * 8 AS INT)) & 255})) AS u
         | FROM codes),
         |bb AS (SELECT vec_id, u.band AS band, u.bits AS bits FROM bands),
         |cand AS (
         | SELECT DISTINCT q.vec_id AS qid, c.vec_id AS id
         | FROM bb q JOIN bb c ON q.band = c.band AND q.bits = c.bits
         | WHERE c.vec_id <> q.vec_id),
         |scored AS (
         | SELECT cand.qid, cand.id,
         |  CAST(list_sum(list_transform(range(1, len(qc.words) + 1),
         |    j -> bit_count(xor(qc.words[j], cc.words[j])))) AS BIGINT) AS hamming
         | FROM cand JOIN codes qc ON qc.vec_id = cand.qid
         |  JOIN codes cc ON cc.vec_id = cand.id),
         |ranked AS (SELECT qid, id, hamming,
         |  row_number() OVER (PARTITION BY qid ORDER BY hamming, id) AS rn
         | FROM scored)
         |SELECT qid, id, hamming, CAST(rn AS BIGINT) AS rank
         |FROM ranked WHERE rn <= 5""".stripMargin,

    // Similarity.hammingBandedRecall replay: exact Hamming top-5 LEFT
    // JOIN the banded top-5, per-query hit count, one exact division.
    "hamming_banded_recall" ->
      s"""WITH codes AS ($binarizeSqlSelect),
         |qs AS (SELECT vec_id AS qid, words AS qw FROM codes WHERE vec_id < 20),
         |exact AS (SELECT qid, id FROM (
         | SELECT qs.qid, c.vec_id AS id,
         |  row_number() OVER (PARTITION BY qs.qid ORDER BY
         |   CAST(list_sum(list_transform(range(1, len(qs.qw) + 1),
         |     j -> bit_count(xor(qs.qw[j], c.words[j])))) AS BIGINT), c.vec_id) AS rn
         | FROM qs, codes c WHERE c.vec_id <> qs.qid) q WHERE rn <= 5),
         |bands AS (
         | SELECT vec_id, unnest(list_transform(range(0, 4 * len(words)),
         |   b -> {'band': b,
         |     'bits': (words[CAST(b // 4 + 1 AS INT)]
         |       >> CAST((b % 4) * 8 AS INT)) & 255})) AS u
         | FROM codes),
         |bb AS (SELECT vec_id, u.band AS band, u.bits AS bits FROM bands),
         |cand AS (
         | SELECT DISTINCT q.vec_id AS qid, c.vec_id AS id
         | FROM bb q JOIN bb c ON q.band = c.band AND q.bits = c.bits
         | WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
         |approx AS (SELECT qid, id FROM (
         | SELECT cand.qid, cand.id,
         |  row_number() OVER (PARTITION BY cand.qid ORDER BY
         |   CAST(list_sum(list_transform(range(1, len(qc.words) + 1),
         |     j -> bit_count(xor(qc.words[j], cc.words[j])))) AS BIGINT),
         |   cand.id) AS rn
         | FROM cand JOIN codes qc ON qc.vec_id = cand.qid
         |  JOIN codes cc ON cc.vec_id = cand.id) q WHERE rn <= 5)
         |SELECT e.qid,
         | CAST(coalesce(sum(CASE WHEN a.id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_hit,
         | round(CAST(coalesce(sum(CASE WHEN a.id IS NOT NULL THEN 1 END), 0) AS DOUBLE) / 5, 6) AS recall
         |FROM exact e LEFT JOIN approx a ON a.qid = e.qid AND a.id = e.id
         |GROUP BY e.qid""".stripMargin,

    // EventAnalytics.transitionMatrix replay: lead over (ts, id) per user,
    // |types|^2 counts, one exact division.
    "event_transitions" ->
      """WITH ev AS (
        | SELECT user_id, event_type, epoch_us(ts) AS tsu, event_id FROM events
        | WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |  AND ts IS NOT NULL),
        |p AS (SELECT event_type AS from_type,
        |  lead(event_type) OVER (PARTITION BY user_id
        |    ORDER BY tsu, event_id) AS to_type
        | FROM ev),
        |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        | FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |ft AS (SELECT from_type, sum(n) AS nf FROM c GROUP BY from_type)
        |SELECT c.from_type, c.to_type, c.n,
        | round(CAST(c.n AS DOUBLE) / ft.nf, 6) AS prob
        |FROM c JOIN ft USING (from_type)""".stripMargin,

    // UnigramLm.trainVocab replay: the shared CTE chain's vocabulary.
    "unigram_vocab" ->
      s"""WITH ${unigramSqlCtes(40, 4, 12)}
         |SELECT piece, n, cost_micro FROM vc""".stripMargin,

    // UnigramLm.segment replay: the unrolled integer Viterbi; decode the
    // combined metric into piece count and micro-nat cost.
    "unigram_segment" ->
      s"""WITH ${unigramSqlCtes(40, 4, 12)},
         |res AS (
         |${(1 to 12).map(i =>
             s" SELECT uw.w, uw.n, b$i.m FROM uw JOIN b$i ON uw.w = b$i.w AND len(uw.w) = $i")
             .mkString("\n UNION ALL\n")}
         |)
         |SELECT w AS word, n AS n_occurrences,
         | CAST(m % 16 AS BIGINT) AS n_pieces,
         | CAST(m // 16 AS BIGINT) AS cost_micro
         |FROM res""".stripMargin,

    // BRUTE-FORCE all-pairs levenshtein oracle for
    // EditDistance.symspellPairs — proves the deletion-variant candidate
    // generation misses no distance-<=1 pair.
    "symspell_match" ->
      s"""WITH $plantedSurnameSqlCtes,
         |b AS (SELECT doc_id AS id, lower(name) AS nmv FROM nm)
         |SELECT a.id AS id_a, c.id AS id_b, a.nmv AS name_a, c.nmv AS name_b,
         | CAST(levenshtein(a.nmv, c.nmv) AS BIGINT) AS dist
         |FROM b a JOIN b c ON a.id < c.id
         |WHERE levenshtein(a.nmv, c.nmv) <= 1""".stripMargin,

    // EventAnalytics.itemsetPairs replay: distinct baskets, per-user pair
    // join, exact-integer confidence and lift.
    "itemset_pairs" ->
      """WITH baskets AS (
        | SELECT DISTINCT user_id AS u, event_type AS t FROM events
        | WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |nu AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n_users FROM baskets),
        |singles AS (SELECT t, CAST(count(*) AS BIGINT) AS n
        | FROM baskets GROUP BY t),
        |p AS (SELECT a.t AS type_a, b.t AS type_b,
        |  CAST(count(*) AS BIGINT) AS n_ab
        | FROM baskets a JOIN baskets b ON a.u = b.u AND a.t < b.t
        | GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b, sa.n AS n_a, sb.n AS n_b, p.n_ab,
        | round(CAST(p.n_ab AS DOUBLE) / sa.n, 6) AS confidence,
        | round(CAST(p.n_ab * nu.n_users AS DOUBLE) / (sa.n * sb.n), 6) AS lift
        |FROM p JOIN singles sa ON sa.t = p.type_a
        | JOIN singles sb ON sb.t = p.type_b CROSS JOIN nu""".stripMargin,

    // EventAnalytics.timeWeightedAverage replay: identical holding-time
    // weights (lead over (ts, id)), integer cents, one division; the
    // day's last event carries no weight, single-event days null.
    "twap_events" ->
      """WITH pts AS (
        | SELECT event_type AS key, epoch_us(ts) AS tsu, value, event_id AS id,
        |  CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day
        | FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |ww AS (SELECT key, day,
        |  lead(tsu) OVER (PARTITION BY key, day ORDER BY tsu, id) - tsu AS w,
        |  CAST(round(value * 100, 0) AS BIGINT) AS cents
        | FROM pts)
        |SELECT key, day, CAST(count(*) AS BIGINT) AS n_events,
        | CASE WHEN coalesce(sum(w), 0) > 0
        |  THEN round(CAST(sum(cents * w) AS DOUBLE) / (100.0 * sum(w)), 6)
        |  ELSE NULL END AS twap
        |FROM ww GROUP BY key, day""".stripMargin,

    // CurationRules.tCloseness replay: exact-BIGINT TVD numerator
    // (in-group |n_gv*N - nv*n_g| terms plus the absent-value mass), one
    // division, flag compared on the rounded value. The sensitive column
    // folds nulls into the same sentinel level as the Scala side so null
    // rows count in the distance (no-op on this null-free fixture).
    "t_closeness" ->
      """WITH cells AS (SELECT source, coalesce(lang, chr(0) || '<null>') AS lang,
        |  CAST(count(*) AS BIGINT) AS n_gv
        | FROM documents GROUP BY 1, 2),
        |gd AS (SELECT coalesce(lang, chr(0) || '<null>') AS lang,
        |  CAST(count(*) AS BIGINT) AS nv
        | FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |g AS (SELECT source, sum(n_gv) AS n_g FROM cells GROUP BY source),
        |agg AS (
        | SELECT c.source, g.n_g, t.n,
        |  sum(abs(c.n_gv * t.n - gl.nv * g.n_g)) AS sum_abs,
        |  sum(gl.nv) AS sum_nv_in
        | FROM cells c JOIN gd gl USING (lang) JOIN g USING (source)
        |  CROSS JOIN tot t
        | GROUP BY c.source, g.n_g, t.n)
        |SELECT source, CAST(n_g AS BIGINT) AS n_rows,
        | round(CAST(sum_abs + (n - sum_nv_in) * n_g AS DOUBLE) /
        |   (2 * n * n_g), 6) AS tvd,
        | (round(CAST(sum_abs + (n - sum_nv_in) * n_g AS DOUBLE) /
        |   (2 * n * n_g), 6) <= 0.2) AS t_close
        |FROM agg""".stripMargin,

    // Same 6-dp-rounded cosine, same (score DESC, vec_id) rank order, same
    // one-pass best-positive window as Search.hardNegatives.
    "hard_negatives" ->
      s"""WITH qs AS (
         | SELECT vec_id AS qid, embedding AS qv, label AS qlabel
         | FROM embeddings WHERE vec_id % 50 = 0),
         |scored AS (
         | SELECT qs.qid, qs.qlabel, e.vec_id, e.label,
         |  round(${cosOf("e.embedding", "qs.qv")}, 6) AS score
         | FROM qs, embeddings e WHERE e.vec_id <> qs.qid),
         |withpos AS (
         | SELECT *, max(CASE WHEN label = qlabel THEN score END)
         |   OVER (PARTITION BY qid) AS best_pos
         | FROM scored)
         |SELECT qid, vec_id, rank, score, round(score - best_pos, 6) AS margin
         |FROM (
         | SELECT qid, vec_id, score, best_pos,
         |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
         | FROM withpos WHERE label <> qlabel)
         |WHERE rank <= 5""".stripMargin,

    // Sign-matrix replay of hardNegativesBlocked: banded candidates, then
    // the identical best-positive window + negative rank (best_pos is
    // band-local by design — the production margin baseline).
    "hard_negatives_blocked" ->
      s"""WITH $planesSql,
         |qs AS (
         | SELECT vec_id AS qid, embedding AS qv, label AS qlabel
         | FROM embeddings WHERE vec_id % 50 = 0),
         |${bandsSql("qb", "qs", "qid", "qv")},
         |${bandsSql("cb", "embeddings", "vec_id", "embedding")},
         |bcand AS (SELECT DISTINCT qb.id AS qid, cb.id AS cid
         | FROM qb JOIN cb USING (band, bits) WHERE qb.id <> cb.id),
         |scored AS (
         | SELECT b.qid, qs.qlabel, e.vec_id, e.label,
         |  round(${cosOf("e.embedding", "qs.qv")}, 6) AS score
         | FROM bcand b JOIN qs ON qs.qid = b.qid
         |  JOIN embeddings e ON e.vec_id = b.cid),
         |withpos AS (
         | SELECT *, max(CASE WHEN label = qlabel THEN score END)
         |   OVER (PARTITION BY qid) AS best_pos
         | FROM scored)
         |SELECT qid, vec_id, rank, score, round(score - best_pos, 6) AS margin
         |FROM (
         | SELECT qid, vec_id, score, best_pos,
         |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
         | FROM withpos WHERE label <> qlabel)
         |WHERE rank <= 5""".stripMargin,

    // Unrolled greedy MMR mirroring Search.mmrRerank: same 6-dp-rounded
    // cosine relevance/pair sims, same double arithmetic (0.7 and 1.0-0.7
    // CAST to DOUBLE so the literals are the same IEEE doubles as Scala's),
    // same (value DESC, vec_id) argmax per step. Steps 2..5 are generated by
    // the Scala loop below — each picks the best not-yet-selected candidate
    // against the accumulated picked set.
    "mmr_rerank" -> {
      val lam = "CAST(0.7 AS DOUBLE)"
      val oml = "(CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE))"
      val steps = (2 to 5).map { i =>
        s"""val$i AS (
           | SELECT c.qid, c.vec_id, c.rel,
           |  round($lam * c.rel - $oml * max(s.sim), 7) + 0.0 AS v
           | FROM cand c JOIN sym s ON s.qid = c.qid AND s.a = c.vec_id
           | WHERE s.b IN (SELECT p.vec_id FROM picked${i - 1} p WHERE p.qid = c.qid)
           |  AND c.vec_id NOT IN (SELECT p.vec_id FROM picked${i - 1} p WHERE p.qid = c.qid)
           | GROUP BY c.qid, c.vec_id, c.rel),
           |sel$i AS (
           | SELECT qid, vec_id, rel, v AS mmr, $i AS mmr_rank FROM (
           |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY v DESC, vec_id) AS rn
           |  FROM val$i) WHERE rn = 1),
           |picked$i AS MATERIALIZED (SELECT * FROM picked${i - 1} UNION ALL SELECT * FROM sel$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH qs AS (
         | SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0),
         |scored AS (
         | SELECT qs.qid, e.vec_id, e.embedding,
         |  round(${cosOf("e.embedding", "qs.qv")}, 6) AS rel
         | FROM qs, embeddings e WHERE e.vec_id <> qs.qid),
         |cand AS MATERIALIZED (
         | SELECT qid, vec_id, embedding, rel, rn FROM (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, vec_id) AS rn
         |  FROM scored WHERE rel IS NOT NULL) WHERE rn <= 10),
         |pairs AS (
         | SELECT c1.qid, c1.vec_id AS a, c2.vec_id AS b,
         |  round(${cosOf("c1.embedding", "c2.embedding")}, 6) AS sim
         | FROM cand c1 JOIN cand c2 ON c1.qid = c2.qid AND c1.vec_id < c2.vec_id),
         |sym AS MATERIALIZED (
         | SELECT qid, a, b, sim FROM pairs
         | UNION ALL SELECT qid, b AS a, a AS b, sim FROM pairs),
         |sel1 AS (
         | SELECT qid, vec_id, rel, round($lam * rel, 7) + 0.0 AS mmr, 1 AS mmr_rank
         | FROM cand WHERE rn = 1),
         |picked1 AS (SELECT * FROM sel1),
         |$steps
         |SELECT qid, vec_id, mmr_rank, rel, mmr FROM picked5""".stripMargin
    },

    // Sign-matrix replay of mmrRerankBlocked: the exact mmr_rerank oracle
    // with its query x corpus scored CTE swapped for the banded candidate
    // set; the top-10 cut, pairwise sims, and unrolled greedy steps are
    // verbatim (pair sims are n-per-query, computed AFTER the cut, so they
    // are complete in both regimes).
    "mmr_rerank_blocked" -> {
      val lam = "CAST(0.7 AS DOUBLE)"
      val oml = "(CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE))"
      val steps = (2 to 5).map { i =>
        s"""val$i AS (
           | SELECT c.qid, c.vec_id, c.rel,
           |  round($lam * c.rel - $oml * max(s.sim), 7) + 0.0 AS v
           | FROM cand c JOIN sym s ON s.qid = c.qid AND s.a = c.vec_id
           | WHERE s.b IN (SELECT p.vec_id FROM picked${i - 1} p WHERE p.qid = c.qid)
           |  AND c.vec_id NOT IN (SELECT p.vec_id FROM picked${i - 1} p WHERE p.qid = c.qid)
           | GROUP BY c.qid, c.vec_id, c.rel),
           |sel$i AS (
           | SELECT qid, vec_id, rel, v AS mmr, $i AS mmr_rank FROM (
           |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY v DESC, vec_id) AS rn
           |  FROM val$i) WHERE rn = 1),
           |picked$i AS MATERIALIZED (SELECT * FROM picked${i - 1} UNION ALL SELECT * FROM sel$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH $planesSql,
         |qs AS (
         | SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0),
         |${bandsSql("qb", "qs", "qid", "qv")},
         |${bandsSql("cb", "embeddings", "vec_id", "embedding")},
         |bcand AS (SELECT DISTINCT qb.id AS qid, cb.id AS cid
         | FROM qb JOIN cb USING (band, bits) WHERE qb.id <> cb.id),
         |scored AS (
         | SELECT b.qid, e.vec_id, e.embedding,
         |  round(${cosOf("e.embedding", "qs.qv")}, 6) AS rel
         | FROM bcand b JOIN qs ON qs.qid = b.qid
         |  JOIN embeddings e ON e.vec_id = b.cid),
         |cand AS MATERIALIZED (
         | SELECT qid, vec_id, embedding, rel, rn FROM (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, vec_id) AS rn
         |  FROM scored WHERE rel IS NOT NULL) WHERE rn <= 10),
         |pairs AS (
         | SELECT c1.qid, c1.vec_id AS a, c2.vec_id AS b,
         |  round(${cosOf("c1.embedding", "c2.embedding")}, 6) AS sim
         | FROM cand c1 JOIN cand c2 ON c1.qid = c2.qid AND c1.vec_id < c2.vec_id),
         |sym AS MATERIALIZED (
         | SELECT qid, a, b, sim FROM pairs
         | UNION ALL SELECT qid, b AS a, a AS b, sim FROM pairs),
         |sel1 AS (
         | SELECT qid, vec_id, rel, round($lam * rel, 7) + 0.0 AS mmr, 1 AS mmr_rank
         | FROM cand WHERE rn = 1),
         |picked1 AS (SELECT * FROM sel1),
         |$steps
         |SELECT qid, vec_id, mmr_rank, rel, mmr FROM picked5""".stripMargin
    },

    // Same closed-form S-curve arithmetic as Similarity.hyperplanePlan:
    // agreement probability p = round(1 - acos(c)/pi, 6) FIRST (the round
    // collapses any libm acos ulp difference before pow sees it), then the
    // banding S-curve over identical doubles; recommended = most selective
    // (largest band_bits) split with recall at cos 0.8 >= 0.95.
    "hyperplane_plan" -> {
      def curve(p: String) =
        s"round(CAST(1.0 AS DOUBLE) - pow(CAST(1.0 AS DOUBLE) - pow($p, band_bits), n_bands), 6) + 0.0"
      def pa(c: String) = s"round(CAST(1.0 AS DOUBLE) - acos(CAST($c AS DOUBLE)) / pi(), 6)"
      def curveMp(p: String) =
        s"""round(CAST(1.0 AS DOUBLE) - pow(CAST(1.0 AS DOUBLE) -
           | (pow($p, band_bits) + band_bits * pow($p, band_bits - 1) *
           |  (CAST(1.0 AS DOUBLE) - $p)), n_bands), 6) + 0.0""".stripMargin
      s"""WITH d AS (
         | SELECT CAST(i AS BIGINT) AS band_bits, CAST(16 // i AS BIGINT) AS n_bands
         | FROM generate_series(1, 16) t(i) WHERE 16 % i = 0),
         |s AS (
         | SELECT band_bits, n_bands,
         |  ${curve(pa("0.5"))} AS p_at_05,
         |  ${curve(pa("0.7"))} AS p_at_07,
         |  ${curve(pa("0.8"))} AS p_at_08,
         |  ${curve(pa("0.9"))} AS p_at_09,
         |  ${curve("CAST(0.5 AS DOUBLE)")} AS rand_frac,
         |  ${curveMp(pa("0.8"))} AS p_at_08_mp,
         |  ${curveMp("CAST(0.5 AS DOUBLE)")} AS rand_frac_mp
         | FROM d),
         |r AS (
         | SELECT *, row_number() OVER (
         |   ORDER BY (p_at_08 >= 0.95) DESC, band_bits DESC) AS rn
         | FROM s)
         |SELECT band_bits, n_bands, p_at_05, p_at_07, p_at_08, p_at_09,
         | rand_frac, p_at_08_mp, rand_frac_mp,
         | (rn = 1 AND p_at_08 >= 0.95) AS recommended
         |FROM r""".stripMargin
    },

    // Same closed-form S-curve arithmetic as Dedup.lshPlan: double pow over
    // the divisor frame, 6-dp rounds (+0.0 folds), argmin of the rounded
    // |s50 - 0.8| with a fewer-bands tiebreak.
    "minhash_plan" ->
      """WITH d AS (
        | SELECT CAST(i AS BIGINT) AS bands, CAST(128 // i AS BIGINT) AS rows_per_band
        | FROM generate_series(1, 128) t(i) WHERE 128 % i = 0),
        |s AS (
        | SELECT bands, rows_per_band,
        |  round(pow(CAST(1.0 AS DOUBLE) / bands, CAST(1.0 AS DOUBLE) / rows_per_band), 6) + 0.0 AS s50,
        |  round(CAST(1.0 AS DOUBLE) - pow(CAST(1.0 AS DOUBLE) - pow(CAST(0.5 AS DOUBLE), rows_per_band), bands), 6) + 0.0 AS p_at_05,
        |  round(CAST(1.0 AS DOUBLE) - pow(CAST(1.0 AS DOUBLE) - pow(CAST(0.7 AS DOUBLE), rows_per_band), bands), 6) + 0.0 AS p_at_07,
        |  round(CAST(1.0 AS DOUBLE) - pow(CAST(1.0 AS DOUBLE) - pow(CAST(0.8 AS DOUBLE), rows_per_band), bands), 6) + 0.0 AS p_at_08,
        |  round(CAST(1.0 AS DOUBLE) - pow(CAST(1.0 AS DOUBLE) - pow(CAST(0.9 AS DOUBLE), rows_per_band), bands), 6) + 0.0 AS p_at_09
        | FROM d),
        |r AS (
        | SELECT *, row_number() OVER (
        |   ORDER BY round(abs(s50 - CAST(0.8 AS DOUBLE)), 6), bands) AS rn
        | FROM s)
        |SELECT bands, rows_per_band, s50, p_at_05, p_at_07, p_at_08, p_at_09,
        | rn = 1 AS recommended
        |FROM r""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY md5(text)""".stripMargin,

    // Mirrors EditDistance.pairs: same prefix blocking, same capped
    // lowercased window, DuckDB's levenshtein is the same classic
    // unit-cost DP as Spark's, same 6-dp round (+0.0 fold) on the ratio.
    "dedup_editdist" ->
      """WITH b AS (SELECT doc_id, substr(lower(text), 1, 24) AS pfx,
        |  substr(lower(text), 1, 400) AS t
        | FROM documents WHERE doc_id IS NOT NULL),
        |p AS (SELECT a.doc_id AS id_a, c.doc_id AS id_b,
        |  levenshtein(a.t, c.t) AS d, greatest(len(a.t), len(c.t)) AS ln
        | FROM b a JOIN b c ON a.pfx = c.pfx AND a.doc_id < c.doc_id),
        |r AS (SELECT id_a, id_b, CAST(d AS BIGINT) AS dist,
        |  round(CASE WHEN ln = 0 THEN 0.0
        |   ELSE CAST(d AS DOUBLE) / ln END, 6) + 0.0 AS ratio FROM p)
        |SELECT id_a, id_b, dist, ratio FROM r WHERE ratio <= 0.2""".stripMargin,

    // Same shingle formulation as dedup_ngram_jaccard, corpus-level sets.
    "corpus_overlap" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, CASE WHEN len(toks) >= 3
         |   THEN list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         |   ELSE []::VARCHAR[] END AS sh FROM t),
         |ga AS (SELECT DISTINCT g FROM s, UNNEST(sh) AS u(g) WHERE doc_id % 2 = 0),
         |gb AS (SELECT DISTINCT g FROM s, UNNEST(sh) AS u(g) WHERE doc_id % 2 = 1),
         |st AS (SELECT (SELECT count(*) FROM ga) AS na,
         |  (SELECT count(*) FROM gb) AS nb,
         |  (SELECT count(*) FROM ga JOIN gb USING (g)) AS i)
         |SELECT na AS n_a, nb AS n_b, i AS n_intersect,
         | CASE WHEN na + nb - i = 0 THEN 0.0
         |  ELSE round(CAST(i AS DOUBLE) / (na + nb - i), 6) END AS jaccard,
         | CASE WHEN na = 0 THEN 0.0
         |  ELSE round(CAST(i AS DOUBLE) / na, 6) END AS containment_a
         |FROM st""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, list_distinct(
         |  CASE WHEN len(toks) >= 3
         |   THEN list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         |   ELSE []::VARCHAR[] END) AS sh FROM t)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         | round(CASE WHEN CAST(len(a.sh) + len(b.sh) AS DOUBLE) - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) = 0 THEN 0.0
         |  ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |   (CAST(len(a.sh) + len(b.sh) AS DOUBLE) - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)) END, 6) AS jaccard
         |FROM s a JOIN s b ON b.doc_id = a.doc_id + 1""".stripMargin,

    // The LSH BANDING isn't ANSI-expressible, but the engine's OUTPUT is:
    // banded candidates are verified with exact shingle Jaccard, and on this
    // corpus the verified set equals the brute-force all-pairs set at the
    // same threshold (100% recall — planted near-dups sit far inside the
    // banding's collision curve). The oracle recomputes that brute-force
    // set; a banding regression that drops a true pair now fails the gate
    // instead of hiding behind a rows-only check.
    // Exact-equivalent of the brute-force all-pairs check, bounded for
    // oracle tractability at any fixture SF: Jaccard >= 0.5 requires at
    // least one SHARED shingle, so every qualifying pair appears in the
    // inverted-index self-join — and because the shingle lists are
    // list_distinct, COUNT(*) over that join IS |A∩B|, so no per-pair
    // list_intersect is ever evaluated (the all-pairs form ran >10 min at
    // sf0.1; the count form runs in seconds).
    "dedup_minhash_lsh" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents
         | UNION ALL
         | SELECT doc_id + 100000, text || ' extra' FROM documents WHERE doc_id % 7 = 0),
         |t AS (SELECT doc_id, $toksSql AS toks FROM corpus),
         |s AS MATERIALIZED (SELECT doc_id, list_distinct(
         |  CASE WHEN len(toks) >= 3
         |   THEN list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         |   ELSE []::VARCHAR[] END) AS sh FROM t),
         |ln AS (SELECT doc_id, len(sh) AS l FROM s),
         |e AS (SELECT doc_id, unnest(sh) AS g FROM s),
         |inter AS (SELECT a.doc_id AS ida, b.doc_id AS idb, CAST(count(*) AS DOUBLE) AS i
         | FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT x.ida AS id_a, x.idb AS id_b
         |FROM inter x JOIN ln la ON la.doc_id = x.ida JOIN ln lb ON lb.doc_id = x.idb
         |WHERE x.i >= 0.5 * (CAST(la.l + lb.l AS DOUBLE) - x.i)""".stripMargin,

    // The recall audit's truth set is the SAME bounded inverted-index
    // enumeration as dedup_minhash_lsh (J >= 0.5 needs a shared shingle);
    // recall is pinned to exactly 1.0 — the engine's banding must find
    // every true pair on this corpus or the gate fails.
    "minhash_lsh_eval" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents
         | UNION ALL
         | SELECT doc_id + 100000, text || ' extra' FROM documents WHERE doc_id % 7 = 0),
         |t AS (SELECT doc_id, $toksSql AS toks FROM corpus),
         |s AS MATERIALIZED (SELECT doc_id, list_distinct(
         |  CASE WHEN len(toks) >= 3
         |   THEN list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         |   ELSE []::VARCHAR[] END) AS sh FROM t),
         |ln AS (SELECT doc_id, len(sh) AS l FROM s),
         |e AS (SELECT doc_id, unnest(sh) AS g FROM s),
         |inter AS (SELECT a.doc_id AS ida, b.doc_id AS idb, CAST(count(*) AS DOUBLE) AS i
         | FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |truth AS (SELECT x.ida, x.idb
         | FROM inter x JOIN ln la ON la.doc_id = x.ida JOIN ln lb ON lb.doc_id = x.idb
         | WHERE x.i >= 0.5 * (CAST(la.l + lb.l AS DOUBLE) - x.i))
         |SELECT CAST(count(*) AS BIGINT) AS n_truth,
         | CAST(count(*) AS BIGINT) AS n_found,
         | CAST(0 AS BIGINT) AS n_missed,
         | CAST(1.0 AS DOUBLE) AS recall
         |FROM truth""".stripMargin,

    // Same promotion as dedup_minhash_lsh: the incoming-x-reference verified
    // pair set equals the brute-force cross join at the threshold, and the
    // emitted jaccard_dist is plain 1 - i/u double arithmetic both engines
    // compute identically. Bounded the same way too: dist <= 0.5 implies a
    // shared shingle, so the inverted-index candidate join loses no pair.
    "dedup_cross_corpus" ->
      s"""WITH tr AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |ti AS (SELECT doc_id + 100000 AS doc_id,
         |  list_filter(string_split(lower(text || ' freshly crawled tail'), ' '), x -> len(x) > 0) AS toks
         | FROM documents WHERE doc_id % 5 = 0),
         |sr AS MATERIALIZED (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
         |  THEN list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         |  ELSE []::VARCHAR[] END) AS sh FROM tr),
         |si AS MATERIALIZED (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
         |  THEN list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         |  ELSE []::VARCHAR[] END) AS sh FROM ti),
         |lr AS (SELECT doc_id, len(sh) AS l FROM sr),
         |li AS (SELECT doc_id, len(sh) AS l FROM si),
         |er AS (SELECT doc_id, unnest(sh) AS g FROM sr),
         |ei AS (SELECT doc_id, unnest(sh) AS g FROM si),
         |inter AS (SELECT ei.doc_id AS id_new, er.doc_id AS id_ref, CAST(count(*) AS DOUBLE) AS ic
         | FROM ei JOIN er ON ei.g = er.g GROUP BY 1, 2),
         |pairs AS (SELECT x.id_new, x.id_ref,
         |  x.ic / (CAST(li.l + lr.l AS DOUBLE) - x.ic) AS sim
         | FROM inter x JOIN li ON li.doc_id = x.id_new JOIN lr ON lr.doc_id = x.id_ref)
         |SELECT id_new, id_ref, round(1.0 - sim, 6) AS jaccard_dist
         |FROM pairs WHERE 1.0 - sim <= 0.5""".stripMargin,

    // One emission per distinct fingerprint, whatever the batch order.
    "streaming_dedup" ->
      "SELECT DISTINCT sha256(text) AS fingerprint FROM documents",

    // Stream-static join in complete mode is batch-equivalent; the plain
    // SQL join is the oracle (same promotion as streaming_windowed).
    "streaming_enrich" ->
      """SELECT c_mktsegment, event_type, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment, event_type""".stripMargin,

    // Same closure as dedup_components, aggregated to the size histogram;
    // singleton docs (in no pair) are the size-1 bucket.
    "dedup_cluster_histogram" ->
      """WITH RECURSIVE ids AS (SELECT doc_id FROM documents),
        |e0 AS (
        | SELECT doc_id AS src, doc_id + 1 AS dst FROM ids WHERE doc_id % 7 < 3
        | UNION ALL
        | SELECT doc_id, doc_id + 3 FROM ids WHERE doc_id % 11 = 0),
        |ek AS (SELECT src, dst FROM e0 WHERE dst IN (SELECT doc_id FROM ids)),
        |edges AS (SELECT src, dst FROM ek UNION SELECT dst, src FROM ek),
        |reach(id, comp) AS (
        | SELECT DISTINCT src, src FROM edges
        | UNION
        | SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id),
        |comp AS (SELECT id, min(comp) AS component FROM reach GROUP BY id),
        |sizes AS (SELECT component, count(*) AS csize FROM comp GROUP BY 1),
        |hist AS (SELECT CAST(csize AS BIGINT) AS cluster_size,
        |  CAST(count(*) AS BIGINT) AS n_clusters FROM sizes GROUP BY 1)
        |SELECT cluster_size, n_clusters FROM hist
        |UNION ALL
        |SELECT CAST(1 AS BIGINT),
        | (SELECT count(*) FROM documents) - (SELECT count(*) FROM comp)""".stripMargin,

    "dedup_components" -> componentsSql,
    // The incremental fold must reproduce the FULL-graph closure exactly —
    // the same recursive-CTE truth grades both paths.
    "dedup_components_incremental" -> componentsSql,

    // Replays the plant + the UrlFunctions canonicalization chain rule for
    // rule (DuckDB regexp_replace needs explicit 'g' for the one global
    // rule and \1 replacement syntax; everything else is anchored).
    "url_canonicalize" -> {
      val track = "(?:utm_[A-Za-z0-9_]*|gclid|fbclid)"
      s"""WITH raw AS (SELECT doc_id,
         | 'HTTPS://WWW.Site' || CAST(doc_id % 50 AS VARCHAR) || '.Example.' ||
         | (['com', 'co.uk', 'org', 'com.au'])[CAST(doc_id % 4 + 1 AS INT)] ||
         | CASE WHEN doc_id % 3 = 0 THEN ':443' WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END ||
         | '/Path/' || CAST(doc_id AS VARCHAR) ||
         | CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
         | '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR) || '&utm_campaign=x' ||
         | CASE WHEN doc_id % 5 = 0 THEN '#frag' || CAST(doc_id AS VARCHAR) ELSE '' END AS url
         | FROM documents),
         |c1 AS (SELECT doc_id, url, regexp_replace(url, '#.*', '') AS u FROM raw),
         |c2 AS (SELECT doc_id, url,
         |  lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*')) ||
         |  substr(u, len(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*')) + 1) AS u
         | FROM c1),
         |c3 AS (SELECT doc_id, url, regexp_replace(regexp_replace(u,
         |  '^(http://[^/:?#]+):80([/?#].*)?$$', '\\1\\2'),
         |  '^(https://[^/:?#]+):443([/?#].*)?$$', '\\1\\2') AS u FROM c2),
         |c4 AS (SELECT doc_id, url, regexp_replace(regexp_replace(regexp_replace(u,
         |  '&$track=[^&]*', '', 'g'),
         |  '\\?$track=[^&]*&', '?'),
         |  '\\?$track=[^&]*$$', '') AS u FROM c3),
         |c5 AS (SELECT doc_id, url, regexp_replace(regexp_replace(u,
         |  '^([^?]*)/\\?', '\\1?'), '/$$', '') AS u FROM c4),
         |h AS (SELECT doc_id, url, u,
         |  lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?([^/:?#]+)', 1)) AS host
         | FROM c5),
         |p AS (SELECT doc_id, u, host, string_split(host, '.') AS parts FROM h),
         |q AS (SELECT doc_id, u, host, parts, len(parts) AS n,
         |  CASE WHEN len(parts) > 2 AND (parts[-2] || '.' || parts[-1]) IN
         |   ('co.uk', 'org.uk', 'ac.uk', 'gov.uk', 'co.jp', 'com.au', 'net.au',
         |    'com.br', 'co.in', 'com.cn', 'co.kr', 'co.za', 'com.mx', 'com.ar',
         |    'com.tr', 'co.id') THEN 3 ELSE 2 END AS take
         | FROM p)
         |SELECT doc_id, u AS url_canonical,
         | CASE WHEN host = '' OR host IS NULL THEN NULL
         |      WHEN n <= take THEN host
         |      ELSE array_to_string(parts[n - take + 1:n], '.') END AS registered_domain
         |FROM q""".stripMargin
    },

    // Replays the 5-variants-per-base plant, the same canonicalization
    // chain as url_canonicalize, then the group-collapse: 100 canonical
    // URLs, keep_id = base, n_dups = 5 each.
    "url_dedup" ->
      s"""WITH raw AS (SELECT doc_id, $plantedCrawlUrlSql AS url FROM documents),
         |$urlCanonChainSql
         |SELECT u AS url_canonical, min(doc_id) AS keep_id, count(*) AS n_dups
         |FROM c5 GROUP BY u""".stripMargin,

    // Plant + canonicalization chain + the registered-domain rules (as in
    // url_canonicalize), then decimal-exact per-domain aggregation joined
    // with the quality CTE chain.
    "domain_profile" ->
      s"""WITH raw AS (SELECT doc_id, $plantedCrawlUrlSql AS url FROM documents),
         |$urlCanonChainSql,
         |h AS (SELECT c5.doc_id, c5.u,
         |  lower(regexp_extract(raw.url, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?([^/:?#]+)', 1)) AS host
         | FROM c5 JOIN raw USING (doc_id)),
         |p AS (SELECT doc_id, u, host, string_split(host, '.') AS parts FROM h),
         |q AS (SELECT doc_id, u, host, parts, len(parts) AS n,
         |  CASE WHEN len(parts) > 2 AND (parts[-2] || '.' || parts[-1]) IN
         |   ('co.uk', 'org.uk', 'ac.uk', 'gov.uk', 'co.jp', 'com.au', 'net.au',
         |    'com.br', 'co.in', 'com.cn', 'co.kr', 'co.za', 'com.mx', 'com.ar',
         |    'com.tr', 'co.id') THEN 3 ELSE 2 END AS take
         | FROM p),
         |dom AS (SELECT doc_id, u,
         |  CASE WHEN host = '' OR host IS NULL THEN NULL
         |       WHEN n <= take THEN host
         |       ELSE array_to_string(parts[n - take + 1:n], '.') END AS domain
         | FROM q),
         |$qualitySqlCtes
         |SELECT d.domain, count(*) AS n_docs, count(DISTINCT d.u) AS n_pages,
         | round(CAST(sum(CAST(s.quality AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean_quality
         |FROM dom d JOIN qscore s USING (doc_id)
         |GROUP BY d.domain""".stripMargin,

    // Same RECURSIVE closure as dedup_components, then cluster sizes ->
    // pow(size, -1) weights; singletons (no component row) weigh 1.0.
    "soft_dedup_weights" ->
      """WITH RECURSIVE ids AS (SELECT doc_id FROM documents),
        |e0 AS (
        | SELECT doc_id AS src, doc_id + 1 AS dst FROM ids WHERE doc_id % 7 < 3
        | UNION ALL
        | SELECT doc_id, doc_id + 3 FROM ids WHERE doc_id % 11 = 0),
        |ek AS (SELECT src, dst FROM e0 WHERE dst IN (SELECT doc_id FROM ids)),
        |edges AS (SELECT src, dst FROM ek UNION SELECT dst, src FROM ek),
        |reach(id, comp) AS (
        | SELECT DISTINCT src, src FROM edges
        | UNION
        | SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id),
        |comp AS (SELECT id AS doc_id, CAST(min(comp) AS BIGINT) AS component
        | FROM reach GROUP BY id),
        |sizes AS (SELECT component, count(*) AS csize FROM comp GROUP BY component)
        |SELECT d.doc_id,
        | round(CAST(CASE WHEN c.component IS NULL THEN 1.0
        |                 ELSE pow(s.csize, -1.0) END AS DOUBLE), 6) AS weight
        |FROM ids d LEFT JOIN comp c USING (doc_id)
        | LEFT JOIN sizes s USING (component)""".stripMargin,

    // Same RECURSIVE closure as dedup_components, then the sample_split
    // md5-prefix arithmetic over coalesce(component, doc_id) — DuckDB
    // recomputes both halves, so a split that lets a cluster straddle
    // train/test hash-mismatches.
    "leakage_safe_split" ->
      """WITH RECURSIVE ids AS (SELECT doc_id FROM documents),
        |e0 AS (
        | SELECT doc_id AS src, doc_id + 1 AS dst FROM ids WHERE doc_id % 7 < 3
        | UNION ALL
        | SELECT doc_id, doc_id + 3 FROM ids WHERE doc_id % 11 = 0),
        |ek AS (SELECT src, dst FROM e0 WHERE dst IN (SELECT doc_id FROM ids)),
        |edges AS (SELECT src, dst FROM ek UNION SELECT dst, src FROM ek),
        |reach(id, comp) AS (
        | SELECT DISTINCT src, src FROM edges
        | UNION
        | SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id),
        |comp AS (SELECT id AS doc_id, CAST(min(comp) AS BIGINT) AS component
        | FROM reach GROUP BY id),
        |keyed AS (SELECT d.doc_id,
        |  substr(md5(CAST(coalesce(c.component, d.doc_id) AS VARCHAR) || 'graft'), 1, 4) AS hp
        | FROM ids d LEFT JOIN comp c USING (doc_id))
        |SELECT doc_id, CASE WHEN hp < 'cccc' THEN 'train'
        |                    WHEN hp < 'e666' THEN 'val'
        |                    ELSE 'test' END AS split
        |FROM keyed""".stripMargin,

    "span_dedup_spans" -> spanDedupSpansSql,

    "span_dedup_clean" ->
      s"""$spanDedupCtes,
         |tokpos AS (SELECT doc_id, i, toks[i] AS tok
         |  FROM t, UNNEST(range(1, len(toks) + 1)) AS u(i)),
         |kept AS (SELECT tp.doc_id, tp.i, tp.tok FROM tokpos tp
         |  LEFT JOIN spans sp ON tp.doc_id = sp.doc_id
         |   AND tp.i - 1 >= sp.span_start AND tp.i - 1 < sp.span_end
         |  WHERE sp.doc_id IS NULL),
         |ct AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text
         |  FROM kept GROUP BY doc_id),
         |rem AS (SELECT doc_id, CAST(sum(span_end - span_start) AS BIGINT) AS removed
         |  FROM spans GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(ct.clean_text, '') AS clean_text,
         | coalesce(rem.removed, 0) AS removed_tokens
         |FROM docs d LEFT JOIN ct USING (doc_id) LEFT JOIN rem USING (doc_id)""".stripMargin,

    "dup_span_density" -> {
      val catTerms = (0 until 13).map(k => s"toks[i+$k]").mkString(" || ' ' || ")
      s"""WITH docs AS (SELECT doc_id, text FROM documents
         | UNION ALL
         | SELECT doc_id + 100000, text || ' extra' FROM documents WHERE doc_id % 7 = 0),
         |t AS (SELECT doc_id, $toksSql AS toks FROM docs),
         |s AS (SELECT doc_id, list_distinct(
         |  CASE WHEN len(toks) >= 13
         |   THEN list_transform(range(1, len(toks) - 11), i -> $catTerms)
         |   ELSE []::VARCHAR[] END) AS sh FROM t),
         |dg AS (SELECT doc_id, unnest(sh) AS g FROM s),
         |gf AS (SELECT g, count(*) AS dfreq FROM dg GROUP BY g),
         |p AS (SELECT dg.doc_id, CAST(count(*) AS BIGINT) AS total_grams,
         |   CAST(sum(CASE WHEN gf.dfreq >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams
         |  FROM dg JOIN gf USING (g) GROUP BY dg.doc_id)
         |SELECT d.doc_id, coalesce(p.total_grams, 0) AS total_grams,
         | coalesce(p.dup_grams, 0) AS dup_grams,
         | round(CASE WHEN coalesce(p.total_grams, 0) = 0 THEN 0.0
         |  ELSE CAST(p.dup_grams AS DOUBLE) / p.total_grams END, 6) AS dup_density
         |FROM (SELECT doc_id FROM docs) d LEFT JOIN p USING (doc_id)""".stripMargin
    },

    "link_pagerank" -> {
      // Three unrolled iterations of rank = (1-d) + d * sum(in-rank/deg),
      // every literal cast to DOUBLE so DuckDB's decimal literals don't
      // change the arithmetic relative to Spark's doubles. The teleport
      // term is spelled 1.0 - 0.85, NOT 0.15: Spark computes
      // lit(1.0 - damping) = 0.150000000000000002 and a literal 0.15
      // differs by 1 ulp — enough to flip a round(...,6) half-boundary.
      val iterCtes = (1 to 3).map { k =>
        s"""c$k AS MATERIALIZED (SELECT e.dst AS id, sum(r.rank / d.outdeg) AS s
           | FROM edges e JOIN deg d ON e.src = d.src
           | JOIN r${k - 1} r ON r.id = e.src GROUP BY 1),
           |r$k AS MATERIALIZED (SELECT n.id,
           |  (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
           |   + CAST(0.85 AS DOUBLE) * coalesce(c$k.s, 0) AS rank
           | FROM nodes n LEFT JOIN c$k USING (id))""".stripMargin
      }.mkString(",\n")
      s"""WITH ids AS (SELECT doc_id FROM documents),
         |e0 AS (
         | SELECT doc_id AS src, doc_id + 1 AS dst FROM ids WHERE doc_id % 7 < 3
         | UNION ALL
         | SELECT doc_id, doc_id + 3 FROM ids WHERE doc_id % 11 = 0),
         |edges AS (SELECT src, dst FROM e0 WHERE dst IN (SELECT doc_id FROM ids)),
         |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
         |nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
         |r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM nodes),
         |$iterCtes
         |SELECT id AS doc_id, round(rank, 6) AS pagerank FROM r3""".stripMargin
    },

    // Personalized PageRank: the link_pagerank unroll with the teleport
    // term scaled by the seed indicator (id % 13 = 0) and seed-indicator
    // initialization — same 1.0 - 0.85 literal-ulp discipline.
    "link_ppr" -> {
      val iterCtes = (1 to 3).map { k =>
        s"""c$k AS MATERIALIZED (SELECT e.dst AS id, sum(r.rank / d.outdeg) AS s
           | FROM edges e JOIN deg d ON e.src = d.src
           | JOIN r${k - 1} r ON r.id = e.src GROUP BY 1),
           |r$k AS MATERIALIZED (SELECT n.id,
           |  (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * n.seed
           |   + CAST(0.85 AS DOUBLE) * coalesce(c$k.s, 0) AS rank
           | FROM nodes n LEFT JOIN c$k USING (id))""".stripMargin
      }.mkString(",\n")
      s"""WITH ids AS (SELECT doc_id FROM documents),
         |e0 AS (
         | SELECT doc_id AS src, doc_id + 1 AS dst FROM ids WHERE doc_id % 7 < 3
         | UNION ALL
         | SELECT doc_id, doc_id + 3 FROM ids WHERE doc_id % 11 = 0),
         |edges AS (SELECT src, dst FROM e0 WHERE dst IN (SELECT doc_id FROM ids)),
         |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
         |n0 AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
         |nodes AS (SELECT id,
         |  CASE WHEN id % 13 = 0 THEN CAST(1.0 AS DOUBLE)
         |    ELSE CAST(0.0 AS DOUBLE) END AS seed FROM n0),
         |r0 AS (SELECT id, seed AS rank FROM nodes),
         |$iterCtes
         |SELECT id AS doc_id, round(rank, 6) AS ppr FROM r3""".stripMargin
    },

    // Four unrolled HITS iterations mirroring PageRank.hits: per-side sums
    // over in/out-edges (in-degree <= 2 in the planted graph, so the float
    // sums are order-safe), max normalization (order-independent by
    // construction), absent sides coalesce to 0.0.
    "link_hits" -> {
      val iterCtes = (1 to 4).map { k =>
        s"""a${k}r AS MATERIALIZED (SELECT e.dst AS id, sum(h.h) AS s
           | FROM edges e JOIN h${k - 1} h ON h.id = e.src GROUP BY 1),
           |a${k}m AS (SELECT max(s) AS m FROM a${k}r),
           |a$k AS MATERIALIZED (SELECT n.id, coalesce(r.s / t.m, CAST(0.0 AS DOUBLE)) AS a
           | FROM nodes n LEFT JOIN a${k}r r USING (id) CROSS JOIN a${k}m t),
           |h${k}r AS MATERIALIZED (SELECT e.src AS id, sum(a.a) AS s
           | FROM edges e JOIN a$k a ON a.id = e.dst GROUP BY 1),
           |h${k}m AS (SELECT max(s) AS m FROM h${k}r),
           |h$k AS MATERIALIZED (SELECT n.id, coalesce(r.s / t.m, CAST(0.0 AS DOUBLE)) AS h
           | FROM nodes n LEFT JOIN h${k}r r USING (id) CROSS JOIN h${k}m t)""".stripMargin
      }.mkString(",\n")
      s"""WITH ids AS (SELECT doc_id FROM documents),
         |e0 AS (
         | SELECT doc_id AS src, doc_id + 1 AS dst FROM ids WHERE doc_id % 7 < 3
         | UNION ALL
         | SELECT doc_id, doc_id + 3 FROM ids WHERE doc_id % 11 = 0),
         |edges AS (SELECT src, dst FROM e0 WHERE dst IN (SELECT doc_id FROM ids)),
         |nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
         |h0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS h FROM nodes),
         |$iterCtes
         |SELECT h4.id AS doc_id, round(h4.h, 6) AS hub, round(a4.a, 6) AS authority
         |FROM h4 JOIN a4 USING (id)""".stripMargin
    },

    // 3 unrolled synchronous LPA rounds, matching LabelProp.propagate
    // exactly: majority neighbor label, ties -> smallest, seeds immutable,
    // unreached nodes keep null.
    "label_propagation" -> {
      val roundCtes = (1 to 3).map { k =>
        s"""v$k AS (SELECT u.dst AS id, l.label, count(*) AS c
           | FROM und u JOIN l${k - 1} l ON l.id = u.src AND l.label IS NOT NULL
           | GROUP BY 1, 2),
           |w$k AS (SELECT id, label FROM (
           |  SELECT id, label, row_number() OVER (
           |    PARTITION BY id ORDER BY c DESC, label ASC) AS rn FROM v$k)
           | WHERE rn = 1),
           |l$k AS MATERIALIZED (SELECT p.id,
           |  coalesce(s.slabel, w.label, p.label) AS label
           | FROM l${k - 1} p LEFT JOIN w$k w USING (id)
           | LEFT JOIN seeds s USING (id))""".stripMargin
      }.mkString(",\n")
      s"""WITH ids AS (SELECT doc_id FROM documents),
         |e0 AS (
         | SELECT doc_id AS src, doc_id + 1 AS dst FROM ids WHERE doc_id % 7 < 3
         | UNION ALL
         | SELECT doc_id, doc_id + 3 FROM ids WHERE doc_id % 11 = 0),
         |ed AS (SELECT src, dst FROM e0 WHERE dst IN (SELECT doc_id FROM ids)),
         |und AS (SELECT src, dst FROM ed UNION ALL SELECT dst, src FROM ed),
         |seeds AS (SELECT doc_id AS id, doc_id % 5 AS slabel FROM ids WHERE doc_id % 13 = 0),
         |nodes AS (SELECT DISTINCT src AS id FROM und UNION SELECT id FROM seeds),
         |l0 AS (SELECT n.id, s.slabel AS label FROM nodes n LEFT JOIN seeds s USING (id)),
         |$roundCtes
         |SELECT l3.id AS doc_id, l3.label, s.id IS NOT NULL AS seeded
         |FROM l3 LEFT JOIN seeds s USING (id)""".stripMargin
    },

    // The sketch estimate itself is implementation-defined and not
    // emitted; the oracle checks the exact side plus the pinned-TRUE
    // tolerance verdicts — a sketch drifting past its bound fails here.
    "hll_union_audit" ->
      """SELECT l_returnflag,
        | CAST(count(DISTINCT date_trunc('month', l_shipdate)) AS BIGINT) AS n_shards,
        | count(DISTINCT l_orderkey) AS n_exact,
        | TRUE AS sketch_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "percentile_sketch_audit" ->
      """SELECT event_type, CAST(0.5 AS DOUBLE) AS p,
        | round(quantile_cont(value, 0.5), 6) AS x_exact, TRUE AS rank_ok
        |FROM events GROUP BY event_type
        |UNION ALL
        |SELECT event_type, CAST(0.9 AS DOUBLE),
        | round(quantile_cont(value, 0.9), 6), TRUE
        |FROM events GROUP BY event_type
        |UNION ALL
        |SELECT event_type, CAST(0.99 AS DOUBLE),
        | round(quantile_cont(value, 0.99), 6), TRUE
        |FROM events GROUP BY event_type""".stripMargin,

    "decontamination" -> decontaminationSql,

    // Same 13-gram CTEs as decontamination; the fraction divides by the
    // doc's DISTINCT gram total (dg rows are unique per doc because s is
    // list_distinct, so count(*) = matched distinct grams). `dirty`
    // thresholds the unrounded ratio, exactly as the engine does.
    "contamination_fraction" -> {
      val catTerms = (0 until 13).map(k => s"toks[i+$k]").mkString(" || ' ' || ")
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS MATERIALIZED (SELECT doc_id, list_distinct(
         |  CASE WHEN len(toks) >= 13
         |   THEN list_transform(range(1, len(toks) - 11), i -> $catTerms)
         |   ELSE []::VARCHAR[] END) AS sh FROM t),
         |e AS (SELECT DISTINCT unnest(sh) AS g FROM s WHERE doc_id % 97 = 0),
         |dg AS (SELECT doc_id, unnest(sh) AS g FROM s),
         |m AS (SELECT dg.doc_id, count(*) AS matched
         |      FROM dg JOIN e ON dg.g = e.g GROUP BY dg.doc_id),
         |tot AS (SELECT doc_id, len(sh) AS total FROM s)
         |SELECT tot.doc_id, CAST(tot.total AS BIGINT) AS total_grams,
         | CAST(coalesce(m.matched, 0) AS BIGINT) AS matched_grams,
         | round(CASE WHEN tot.total = 0 THEN 0.0
         |  ELSE CAST(coalesce(m.matched, 0) AS DOUBLE) / tot.total END, 6) AS overlap_fraction,
         | tot.total > 0 AND CAST(coalesce(m.matched, 0) AS DOUBLE) / tot.total > 0.2 AS dirty
         |FROM tot LEFT JOIN m ON tot.doc_id = m.doc_id""".stripMargin
    },

    // Bloom prefilter + exact verify must be row-identical to the exact
    // broadcast-join formulation — one oracle covers both paths.
    "decontamination_bloom" -> decontaminationSql,

    // Full bit-vote replay of the SimhashExpr kernel (its scaladoc): the
    // per-token hash is the first 16 hex chars of md5, so the oracle
    // recomputes every ±1 vote, fingerprint bit, quarter band, and hamming
    // distance from scratch — brute force over all pairs (the 4x16-bit
    // banding only DROPS pairs with no exact-quarter match, which is the
    // `any quarter equal` predicate here). Promoted from rows-only in r10.
    // The pair scan runs over PACKED 16-bit quarter values (bit_count of
    // xor), not per-bit rows — the per-bit formulation is ~64x the join
    // volume and breaks the sub-minute full sf0.1 oracle replay.
    "dedup_simhash" ->
      s"""WITH $simhashQuartersSql
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         | CAST(bit_count(xor(a.q0, b.q0)) + bit_count(xor(a.q1, b.q1))
         |  + bit_count(xor(a.q2, b.q2)) + bit_count(xor(a.q3, b.q3)) AS INTEGER) AS hamming
         |FROM quarters a JOIN quarters b ON a.doc_id < b.doc_id
         |WHERE (a.q0 = b.q0 OR a.q1 = b.q1 OR a.q2 = b.q2 OR a.q3 = b.q3)
         | AND bit_count(xor(a.q0, b.q0)) + bit_count(xor(a.q1, b.q1))
         |  + bit_count(xor(a.q2, b.q2)) + bit_count(xor(a.q3, b.q3)) <= 12""".stripMargin,

    // Banding-honesty audit for simhash (the minhash_lsh_eval discipline):
    // truth = ALL pairs at hamming <= 12 (exact brute force over the
    // packed quarters), found = pairs the 4x16 banding surfaces (any
    // quarter equal). Pigeonhole guarantees recall 1.0 up to hamming 3;
    // this gate REPORTS the measured recall of the probabilistic tail
    // instead of hand-waving it.
    "dedup_simhash_eval" ->
      s"""WITH $simhashQuartersSql,
         |truth AS (
         | SELECT (a.q0 = b.q0 OR a.q1 = b.q1 OR a.q2 = b.q2 OR a.q3 = b.q3) AS found
         | FROM quarters a JOIN quarters b ON a.doc_id < b.doc_id
         | WHERE bit_count(xor(a.q0, b.q0)) + bit_count(xor(a.q1, b.q1))
         |  + bit_count(xor(a.q2, b.q2)) + bit_count(xor(a.q3, b.q3)) <= 12)
         |SELECT CAST(count(*) AS BIGINT) AS n_truth,
         | CAST(sum(CASE WHEN found THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
         | CAST(sum(CASE WHEN found THEN 0 ELSE 1 END) AS BIGINT) AS n_missed,
         | round(CAST(sum(CASE WHEN found THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS recall
         |FROM truth""".stripMargin,

    "neardup_cosine" ->
      s"""SELECT a.label AS block, a.vec_id AS id_a, b.vec_id AS id_b,
         | round(${cosOf("a.embedding", "b.embedding")}, 6) AS cosine
         |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE round(${cosOf("a.embedding", "b.embedding")}, 6) >= 0.2""".stripMargin,

    "lang_id" -> {
      val langs = TextAnalysis.LangMarkers.map(_._1)
      s"""WITH ${langPickCtes("")}
         |SELECT h.doc_id, ${langs.map("h.hits_" + _).mkString(", ")},
         | p.predicted_lang
         |FROM lh h JOIN pick p USING (doc_id)""".stripMargin
    },

    // Profile.datasetCard replay: the quality CTEs (shared with
    // quality_score), the lang_id pick chain under lt/lh names, exact
    // count aggregates, DECIMAL-summed quality mean, and the fixed
    // language-share rows.
    "dataset_card" -> datasetCardSqlStr,

    // Card + storage section: the card body plus the decision table
    // reshaped to (metric, value), the table computed ONCE in a
    // materialized CTE. Concatenated (NOT re-stripMargined) because both
    // parts are pre-stripped SQL containing `||`.
    "dataset_card_storage" ->
      ("WITH stor AS MATERIALIZED (\n" +
        compressionTradeoffSqlOver("embeddings", includeProduction = true) +
        "\n)\n" +
        "SELECT * FROM (\n" + datasetCardSqlStr + "\n) c\n" +
        "UNION ALL\nSELECT 'storage_memory_ratio_' || axis AS metric, " +
        "memory_ratio AS value FROM stor\n" +
        "UNION ALL\nSELECT 'storage_mean_recall_' || axis AS metric, " +
        "CAST(mean_recall AS DOUBLE) AS value FROM stor"),


    "quality_score" -> {
      val stop = TextAnalysis.QualityStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |m AS (SELECT doc_id,
         |  CAST(len(text) AS DOUBLE) AS n_chars,
         |  CAST(len(toks) AS DOUBLE) AS n_toks,
         |  CAST(list_reduce(list_prepend(0, list_transform(toks, x -> len(x))), (a, b) -> a + b) AS DOUBLE) AS tok_chars,
         |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) AS punct,
         |  CAST(len(list_filter(toks, x -> x IN ($stop))) AS DOUBLE) AS stop_hits
         | FROM t),
         |r AS (SELECT doc_id, n_chars, n_toks,
         |  CASE WHEN n_toks > 0 THEN tok_chars / n_toks ELSE 0.0 END AS mean_tok_len,
         |  CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0.0 END AS punct_ratio,
         |  CASE WHEN n_toks > 0 THEN stop_hits / n_toks ELSE 0.0 END AS stop_ratio
         | FROM m)
         |SELECT doc_id,
         | CAST(n_chars AS BIGINT) AS n_chars,
         | CAST(n_toks AS BIGINT) AS n_tokens,
         | round(mean_tok_len, 6) AS mean_token_len,
         | round(punct_ratio, 6) AS punct_ratio,
         | round(stop_ratio, 6) AS stopword_ratio,
         | round(least(n_chars / 500.0, 1.0) * 0.4 +
         |  (CASE WHEN mean_tok_len >= 3.0 AND mean_tok_len <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.3 +
         |  (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.2 +
         |  least(stop_ratio * 5.0, 1.0) * 0.1, 6) AS quality
         |FROM r""".stripMargin
    },

    "token_count" ->
      """SELECT doc_id,
        | CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT) AS ws_tokens,
        | CAST(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens
        |FROM documents""".stripMargin,

    // DuckDB replay of the pinned-merge-table BPE: the recursive CTE applies
    // ONE lowest-rank merge (leftmost occurrence) per step over DISTINCT
    // words — equivalent to the all-occurrences form because a merged token
    // only participates in later-rank rules — then occurrence counts join
    // back per document. The merge literal is generated from Bpe.merges so
    // engine and oracle can never hold different tables.
    "bpe_merge_count" -> {
      val ml = graft.functions.Bpe.merges
        .map { case (a, b) => s"'$a $b'" }.mkString(", ")
      def ranks(tk: String) =
        s"list_transform(range(1, len($tk)), i -> coalesce(list_position([$ml], $tk[i] || ' ' || $tk[i+1]), 0))"
      s"""WITH RECURSIVE
         |docs AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS toks FROM documents),
         |occ AS (SELECT doc_id, unnest(toks) AS word FROM docs),
         |words AS (SELECT DISTINCT word FROM occ),
         |init AS (SELECT word, list_transform(range(1, len(word) + 1), i -> word[i]) AS tk FROM words),
         |rec(word, tk) AS (
         | SELECT word, tk FROM init
         | UNION ALL
         | SELECT word, list_concat(list_concat(tk[1:pos-1], [tk[pos] || tk[pos+1]]), tk[pos+2:]) AS tk
         | FROM (
         |  SELECT word, tk,
         |   list_position(${ranks("tk")},
         |    CASE WHEN len(list_filter(${ranks("tk")}, r -> r > 0)) > 0
         |     THEN list_aggregate(list_filter(${ranks("tk")}, r -> r > 0), 'min') END) AS pos
         |  FROM rec) WHERE pos IS NOT NULL AND pos > 0),
         |final AS (SELECT word, len(tk) AS ntok FROM rec
         | WHERE len(list_filter(${ranks("tk")}, r -> r > 0)) = 0),
         |counts AS (SELECT o.doc_id, sum(f.ntok) AS n FROM occ o JOIN final f USING (word) GROUP BY o.doc_id)
         |SELECT d.doc_id, CAST(coalesce(c.n, 0) AS BIGINT) AS bpe_tokens
         |FROM documents d LEFT JOIN counts c USING (doc_id)""".stripMargin
    },

    // Same pinned-merge-table BPE replay as bpe_merge_count, then the
    // per-language sums: fertility = sum(bpe)/sum(words),
    // chars_per_token = sum(len(text))/sum(bpe) — both 6-dp + 0.0-folded.
    // Replays the vocabulary build (top-200 substrings by weighted count,
    // ties to the smaller piece) and the greedy longest-match walk: one
    // recursion level per emitted piece, the 6 LEFT JOINs probe piece
    // lengths 6..1 (string equality enforces the length, so a truncated
    // tail substr can only match its true remaining length).
    "wordpiece_stats" -> {
      val lenCase = (6 to 2 by -1).map(l =>
        s"WHEN p$l.piece IS NOT NULL THEN $l").mkString(" ")
      val probes = (6 to 1 by -1).map(l =>
        s"LEFT JOIN vocab p$l ON p$l.piece = substr(k.w, k.pos, $l)").mkString("\n ")
      val allNull = (6 to 1 by -1).map(l => s"p$l.piece IS NULL").mkString(" AND ")
      s"""WITH RECURSIVE t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |ex AS MATERIALIZED (SELECT doc_id, unnest(toks) AS w FROM t),
         |words AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM ex GROUP BY w),
         |sub AS (SELECT cnt, unnest(flatten(list_transform(range(1, len(w) + 1), i ->
         |  list_transform(range(1, least(6, len(w) - i + 1) + 1), l ->
         |    substr(w, CAST(i AS INT), CAST(l AS INT)))))) AS piece FROM words),
         |vocab AS MATERIALIZED (SELECT piece, CAST(sum(cnt) AS BIGINT) AS total
         | FROM sub GROUP BY piece ORDER BY total DESC, piece LIMIT 200),
         |dw AS (SELECT DISTINCT w FROM ex),
         |walk(w, pos, np, nu) AS (
         | SELECT w, 1, CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM dw
         | UNION ALL
         | SELECT k.w,
         |  k.pos + CASE $lenCase ELSE 1 END,
         |  k.np + 1,
         |  k.nu + CASE WHEN $allNull THEN 1 ELSE 0 END
         | FROM walk k
         | $probes
         | WHERE k.pos <= len(k.w)),
         |fin AS (SELECT w, np, nu FROM walk WHERE pos > len(w)),
         |agg AS (SELECT ex.doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(f.np) AS BIGINT) AS n_pieces, CAST(sum(f.nu) AS BIGINT) AS n_unk
         | FROM ex JOIN fin f ON ex.w = f.w GROUP BY ex.doc_id)
         |SELECT d.doc_id, coalesce(a.n_words, 0) AS n_words,
         | coalesce(a.n_pieces, 0) AS n_pieces, coalesce(a.n_unk, 0) AS n_unk
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin
    },

    "tokenizer_fertility" -> {
      val ml = graft.functions.Bpe.merges
        .map { case (a, b) => s"'$a $b'" }.mkString(", ")
      def ranks(tk: String) =
        s"list_transform(range(1, len($tk)), i -> coalesce(list_position([$ml], $tk[i] || ' ' || $tk[i+1]), 0))"
      s"""WITH RECURSIVE
         |docs AS (SELECT doc_id, lang, len(text) AS chars,
         |  list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS toks FROM documents),
         |occ AS (SELECT doc_id, unnest(toks) AS word FROM docs),
         |words AS (SELECT DISTINCT word FROM occ),
         |init AS (SELECT word, list_transform(range(1, len(word) + 1), i -> word[i]) AS tk FROM words),
         |rec(word, tk) AS (
         | SELECT word, tk FROM init
         | UNION ALL
         | SELECT word, list_concat(list_concat(tk[1:pos-1], [tk[pos] || tk[pos+1]]), tk[pos+2:]) AS tk
         | FROM (
         |  SELECT word, tk,
         |   list_position(${ranks("tk")},
         |    CASE WHEN len(list_filter(${ranks("tk")}, r -> r > 0)) > 0
         |     THEN list_aggregate(list_filter(${ranks("tk")}, r -> r > 0), 'min') END) AS pos
         |  FROM rec) WHERE pos IS NOT NULL AND pos > 0),
         |final AS (SELECT word, len(tk) AS ntok FROM rec
         | WHERE len(list_filter(${ranks("tk")}, r -> r > 0)) = 0),
         |counts AS (SELECT o.doc_id, sum(f.ntok) AS n FROM occ o JOIN final f USING (word) GROUP BY o.doc_id),
         |per AS (SELECT d.lang, d.chars, len(d.toks) AS words, coalesce(c.n, 0) AS bpe
         | FROM docs d LEFT JOIN counts c USING (doc_id))
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(words) AS BIGINT) AS n_words,
         | CAST(sum(bpe) AS BIGINT) AS n_tokens,
         | round(CASE WHEN sum(words) = 0 THEN 0.0
         |  ELSE CAST(sum(bpe) AS DOUBLE) / sum(words) END, 6) + 0.0 AS fertility,
         | round(CASE WHEN sum(bpe) = 0 THEN 0.0
         |  ELSE CAST(sum(chars) AS DOUBLE) / sum(bpe) END, 6) + 0.0 AS chars_per_token
         |FROM per GROUP BY lang""".stripMargin
    },

    // Replays the TRAINING loop (not just application): 12 unrolled rounds,
    // each computing pair counts over the delimiter-encoded vocab (chr(1)
    // token-open, chr(2) token-close, chr(3) pair separator — all below any
    // word byte, so ORDER BY the joined pair string == ORDER BY (lhs, rhs)),
    // taking the argmax with the same count-desc-then-lex tie-break, and
    // applying the merge via left-to-right non-overlapping replace() —
    // exactly the engine kernel's semantics.
    //
    // Every per-round CTE is MATERIALIZED: DuckDB inlines CTEs by default,
    // and with w{k} and b{k} each referenced twice the inlined chain
    // re-evaluates w0 O(2^rounds) times — at sf0.1 this oracle ran for
    // >10 minutes (the round-7 driver-check starvation); materialized it
    // is linear in rounds and finishes in seconds at any fixture SF.
    "bpe_train_merges" -> {
      val n = 12
      val (tl, tr, sep) = ("chr(1)", "chr(2)", "chr(3)")
      val sb = new StringBuilder(
        s"""WITH occ AS (SELECT unnest($toksSql) AS word FROM documents),
           |wc AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM occ GROUP BY word),
           |w0 AS MATERIALIZED (SELECT regexp_replace(word, '(.)', $tl || '\\1' || $tr, 'g') AS enc, cnt FROM wc)""")
      for (k <- 1 to n) {
        sb.append(s""",
           |p$k AS (SELECT pair, CAST(sum(cnt) AS BIGINT) AS pc FROM (
           |  SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || $sep || toks[i+1])) AS pair, cnt
           |  FROM (SELECT string_split(trim(enc, $tl || $tr), $tr || $tl) AS toks, cnt FROM w${k - 1})
           | ) GROUP BY pair),
           |b$k AS MATERIALIZED (SELECT string_split(pair, $sep)[1] AS lhs, string_split(pair, $sep)[2] AS rhs, pc
           |  FROM p$k ORDER BY pc DESC, pair ASC LIMIT 1),
           |w$k AS MATERIALIZED (SELECT replace(w.enc, $tl || b.lhs || $tr || $tl || b.rhs || $tr, $tl || b.lhs || b.rhs || $tr) AS enc, cnt
           |  FROM w${k - 1} w CROSS JOIN b$k b)""")
      }
      sb.append("\n" + (1 to n).map(k =>
        s"""SELECT $k AS "rank", lhs, rhs, pc AS pair_count FROM b$k""")
        .mkString("\nUNION ALL\n"))
      sb.toString.stripMargin
    },

    "lexical_diversity" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |d AS (SELECT doc_id, toks, list_distinct(toks) AS dis FROM t)
         |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         | CAST(len(dis) AS BIGINT) AS n_distinct,
         | CAST(len(list_filter(dis, x -> len(list_filter(toks, y -> y = x)) = 1)) AS BIGINT) AS n_hapax,
         | CAST(CASE WHEN len(toks) = 0 THEN 0.0
         |   ELSE round(CAST(len(dis) AS DOUBLE) / len(toks), 6) END AS DOUBLE) AS ttr,
         | CAST(CASE WHEN len(toks) = 0 THEN 0.0
         |   ELSE round(CAST(len(list_filter(dis, x -> len(list_filter(toks, y -> y = x)) = 1)) AS DOUBLE) / len(toks), 6) END AS DOUBLE) AS hapax_ratio
         |FROM d""".stripMargin,

    // Same tokenizer, same (count desc, token asc) vocab ranking, same
    // left-join OOV flagging as TextAnalysis.oovRateFrame.
    "oov_rate" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |cf AS (SELECT tok, count(*) AS cf FROM tk GROUP BY tok),
         |vocab AS (SELECT tok FROM (
         |  SELECT tok, row_number() OVER (ORDER BY cf DESC, tok) AS rk FROM cf)
         | WHERE rk <= 25),
         |agg AS (SELECT t.doc_id, count(*) AS n,
         |  sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS oov
         | FROM tk t LEFT JOIN vocab v ON t.tok = v.tok GROUP BY t.doc_id)
         |SELECT d.doc_id,
         | CAST(coalesce(a.n, 0) AS BIGINT) AS n_tokens,
         | CAST(coalesce(a.oov, 0) AS BIGINT) AS n_oov,
         | CAST(CASE WHEN coalesce(a.n, 0) > 0
         |   THEN round(CAST(a.oov AS DOUBLE) / a.n, 6) ELSE 0.0 END AS DOUBLE) AS oov_rate
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin,

    // Same sorted-distinct fold, same (p * ln p) / ln 2 shape and add order.
    "char_entropy" -> {
      val p = "(CAST(len(list_filter(chars, c -> c = d)) AS DOUBLE) / len(chars))"
      s"""WITH ch AS (SELECT doc_id, len(text) AS nt,
         |  list_transform(range(1, len(text) + 1), i -> text[i]) AS chars
         | FROM documents)
         |SELECT doc_id, CAST(CASE WHEN nt = 0 THEN 0.0 ELSE
         | round(-list_reduce(list_prepend(0.0,
         |   list_transform(list_sort(list_distinct(chars)),
         |     d -> $p * ln($p) / ln(2.0))), (a, b) -> a + b), 6)
         | END AS DOUBLE) AS char_entropy
         |FROM ch""".stripMargin
    },

    "doc_fingerprint" ->
      """SELECT doc_id,
        | list_reduce(list_prepend(CAST(0 AS BIGINT),
        |   list_transform(range(1, len(text) + 1), i -> CAST(ascii(text[i]) AS BIGINT))),
        |  (acc, c) -> (acc * 31 + c) % 1000000007) AS rolling_hash
        |FROM documents""".stripMargin,

    "paragraph_dedup" ->
      """WITH p AS (SELECT doc_id,
        |  'Cookie notice: we use cookies' || chr(10) || chr(10) || text AS t FROM documents),
        |a AS (SELECT doc_id, regexp_split_to_array(t, '\n\n+') AS arr FROM p),
        |e AS (SELECT doc_id, unnest(range(len(arr))) AS pos, trim(unnest(arr)) AS para FROM a),
        |e2 AS (SELECT doc_id, pos, para FROM e WHERE len(para) > 0),
        |c AS (SELECT para, count(*) AS n FROM e2 GROUP BY 1)
        |SELECT doc_id,
        | coalesce(string_agg(CASE WHEN n < 5 THEN para END, chr(10) || chr(10) ORDER BY pos), '') AS text,
        | count(CASE WHEN n < 5 THEN 1 END) AS n_kept,
        | count(CASE WHEN n >= 5 THEN 1 END) AS n_dropped
        |FROM e2 JOIN c USING (para)
        |GROUP BY doc_id""".stripMargin,

    // Entropy fold runs in label-ascending order in BOTH engines (list
    // ORDER BY l == sort_array of (label, count) structs), so the
    // floating sum is bit-identical.
    "class_balance" ->
      """WITH c AS (SELECT label AS l, CAST(count(*) AS BIGINT) AS c
        |  FROM embeddings GROUP BY 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(sum(c) AS BIGINT) AS n_rows, CAST(max(c) AS BIGINT) AS mx,
        |  list(c ORDER BY l) AS arr FROM c)
        |SELECT n_classes, n_rows,
        | round(CAST(mx AS DOUBLE) / n_rows, 6) AS max_share,
        | CASE WHEN n_classes > 1 THEN
        |  round(-list_reduce(list_prepend(0.0, list_transform(arr, x ->
        |    (CAST(x AS DOUBLE) / n_rows) * ln(CAST(x AS DOUBLE) / n_rows))),
        |   (a, b) -> a + b) / ln(CAST(n_classes AS DOUBLE)), 6)
        | ELSE 0.0 END AS entropy_norm
        |FROM a""".stripMargin,

    // Σ i·x is tie-invariant, so ORDER BY x alone is deterministic enough.
    "gini_concentration" ->
      """WITH w AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS x
        |  FROM documents GROUP BY source),
        |r AS (SELECT x, CAST(row_number() OVER (ORDER BY x) AS BIGINT) AS i FROM w)
        |SELECT CAST(count(*) AS BIGINT) AS n_groups,
        | CAST(sum(x) AS BIGINT) AS total_weight,
        | round(2.0 * sum(i * x) / (count(*) * sum(x)) -
        |   (count(*) + 1.0) / count(*), 6) AS gini
        |FROM r""".stripMargin,

    "fk_orphans" ->
      """WITH o AS (SELECT o_custkey FROM orders
        |  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
        |SELECT (SELECT count(*) FROM orders) AS n_child_rows,
        | (SELECT count(DISTINCT o_custkey) FROM orders) AS n_child_keys,
        | CAST((SELECT count(*) FROM o) AS BIGINT) AS n_orphan_rows,
        | CAST((SELECT count(DISTINCT o_custkey) FROM o) AS BIGINT) AS n_orphan_keys,
        | round(CAST((SELECT count(DISTINCT o_custkey) FROM orders) -
        |   (SELECT count(DISTINCT o_custkey) FROM o) AS DOUBLE) /
        |  (SELECT count(DISTINCT o_custkey) FROM orders), 6) AS key_coverage""".stripMargin,

    "script_profile" ->
      """WITH m AS (SELECT doc_id, text ||
        |  CASE WHEN doc_id % 4 = 0 THEN ' привет мир'
        |       WHEN doc_id % 4 = 1 THEN ' 你好世界'
        |       WHEN doc_id % 4 = 2 THEN ' مرحبا بالعالم'
        |       ELSE '' END AS mixed FROM documents),
        |c AS (SELECT doc_id,
        |  CAST(length(regexp_replace(mixed, '[^\p{Latin}]', '', 'g')) AS BIGINT) AS n_latin,
        |  CAST(length(regexp_replace(mixed, '[^\p{Cyrillic}]', '', 'g')) AS BIGINT) AS n_cyrillic,
        |  CAST(length(regexp_replace(mixed, '[^\p{Han}]', '', 'g')) AS BIGINT) AS n_han,
        |  CAST(length(regexp_replace(mixed, '[^\p{Arabic}]', '', 'g')) AS BIGINT) AS n_arabic
        | FROM m)
        |SELECT doc_id, n_latin, n_cyrillic, n_han, n_arabic,
        | CASE WHEN n_latin + n_cyrillic + n_han + n_arabic > 0
        |  THEN round(CAST(n_cyrillic + n_han + n_arabic AS DOUBLE) /
        |    (n_latin + n_cyrillic + n_han + n_arabic), 6)
        |  ELSE 0.0 END AS non_latin_frac
        |FROM c""".stripMargin,

    "k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment, COUNT(*) AS n_rows,
        | COUNT(*) >= 10 AS k_anonymous
        |FROM customer GROUP BY c_nationkey, c_mktsegment""".stripMargin,

    "pii_redact" -> {
      // Generated from TextAnalysis.PiiPatterns so Spark and the oracle use
      // byte-identical regexes, applied in the same progressive order.
      val pats = TextAnalysis.PiiPatterns
      val planted = "text || ' contact admin' || CAST(doc_id AS VARCHAR) || " +
        "'@example.com or 10.0.' || CAST(doc_id % 256 AS VARCHAR) || " +
        "'.7, ssn 123-45-6789, call +1 (415) 555-01' || " +
        "lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')"
      val sb = new StringBuilder(s"WITH p0 AS (SELECT doc_id, $planted AS t FROM documents)")
      pats.zipWithIndex.foreach { case ((name, re, tag), i) =>
        val carry = pats.take(i).map(x => s"n_${x._1}").mkString(", ")
        val carryCols = if (carry.isEmpty) "" else carry + ", "
        sb.append(s",\np${i + 1} AS (SELECT doc_id, ${carryCols}" +
          s"len(regexp_extract_all(t, '$re')) AS n_$name, " +
          s"regexp_replace(t, '$re', '$tag', 'g') AS t FROM p$i)")
      }
      sb.append(s"\nSELECT doc_id, ${pats.map(x => s"n_${x._1}").mkString(", ")}, " +
        s"t AS redacted FROM p${pats.size}")
      sb.toString
    },

    "repetition_signals" ->
      """WITH p AS (SELECT doc_id,
        |  text || chr(10) || 'repeat me' || chr(10) || 'repeat me' || chr(10) || 'unique tail' AS t
        | FROM documents),
        |l AS (SELECT doc_id,
        |  list_filter(list_transform(string_split(t, chr(10)), x -> trim(x)), x -> len(x) > 0) AS lines,
        |  list_filter(string_split(lower(t), ' '), x -> len(x) > 0) AS toks
        | FROM p),
        |m AS (SELECT doc_id, lines, toks,
        |  CAST(list_sum(list_transform(lines, x -> len(x))) AS DOUBLE) AS total_chars,
        |  CAST(list_sum(list_transform(list_distinct(lines), x -> len(x))) AS DOUBLE) AS distinct_chars
        | FROM l)
        |SELECT doc_id,
        | CAST(len(lines) AS BIGINT) AS n_lines,
        | round(CASE WHEN len(lines) > 0
        |   THEN 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines) ELSE 0.0 END, 6)
        |   AS dup_line_fraction,
        | round(CASE WHEN total_chars > 0
        |   THEN (total_chars - distinct_chars) / total_chars ELSE 0.0 END, 6)
        |   AS dup_line_char_fraction,
        | round(CASE WHEN len(toks) > 0
        |   THEN 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE 0.0 END, 6)
        |   AS dup_token_fraction
        |FROM m""".stripMargin,

    "data_profile" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
      cols.map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n,
           | count(*) FILTER ($c IS NULL) AS n_null,
           | count(DISTINCT $c) AS n_distinct,
           | CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n")
    },

    "profile_by_lang" -> {
      Seq("doc_id", "n_chars").map { c =>
        s"""SELECT lang, '$c' AS col_name, count(*) AS n,
           | count(*) FILTER ($c IS NULL) AS n_null,
           | count(DISTINCT $c) AS n_distinct,
           | CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v
           |FROM documents GROUP BY lang""".stripMargin
      }.mkString("\nUNION ALL\n")
    },

    // Exact mirror of the KMV construction: min-64 of distinct md5(token)
    // per language, union re-truncated to 64, membership in both sketches.
    // Mirrors Bm25.phraseMatches: same 1-based candidate starts, same
    // adjacency compare over the shared tokenizer.
    "phrase_search" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |h AS (SELECT doc_id, list_filter(range(1, len(toks)), i ->
         |  toks[i] = 'hash' AND toks[i+1] = 'join') AS hits FROM t)
         |SELECT doc_id, CAST(len(hits) AS BIGINT) AS n_matches,
         | CAST(hits[1] AS BIGINT) AS first_pos
         |FROM h WHERE len(hits) > 0""".stripMargin,

    // Mirrors Bm25.prfExpansionTerms: the shared BM25 CTE chain feeds the
    // top-10 cut, the feedback-mass total is an exact DECIMAL(18,6) sum,
    // per-(doc, term) contributions round at 9 dp into DECIMAL(18,9), and
    // the final 6-dp round happens IN DECIMAL before the double cast — the
    // same arithmetic Spark runs, so no float-sum or boundary drift.
    "prf_expansion" ->
      s"""WITH $bm25Ctes,
         |bscored AS ($bm25Select),
         |top AS (SELECT doc_id, bm25 FROM bscored ORDER BY bm25 DESC, doc_id LIMIT 10),
         |tot AS (SELECT CAST(sum(CAST(bm25 AS DECIMAL(18,6))) AS DOUBLE) AS total FROM top),
         |dtk AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |expd AS (SELECT e.doc_id, top.bm25, len(e.tk) AS dl, unnest(e.tk) AS term
         | FROM dtk e JOIN top ON top.doc_id = e.doc_id),
         |tfc AS (SELECT doc_id, term, bm25, dl, count(*) AS tf
         | FROM expd WHERE term NOT IN ('spark', 'join', 'window')
         | GROUP BY 1, 2, 3, 4),
         |contrib AS (SELECT term,
         |  CAST(round(CAST(tf AS DOUBLE) / dl * (bm25 / tot.total), 9)
         |   AS DECIMAL(18,9)) AS c
         | FROM tfc CROSS JOIN tot)
         |SELECT term, CAST(count(*) AS BIGINT) AS df_top,
         | CAST(round(sum(c), 6) AS DOUBLE) AS weight
         |FROM contrib GROUP BY term
         |ORDER BY weight DESC, term LIMIT 15""".stripMargin,

    // Mirrors Drift.ksDistance on token counts: same ECDF running sums over
    // the joined distinct-value table, same 6-dp round + min-value
    // tie-break selecting the argmax row.
    "length_drift" ->
      s"""WITH pv AS (SELECT len($toksSql) AS v FROM documents WHERE lang = 'en'),
         |qv AS (SELECT len($toksSql) AS v FROM documents WHERE lang = 'de'),
         |pc AS (SELECT v, count(*) AS cp FROM pv GROUP BY v),
         |qc AS (SELECT v, count(*) AS cq FROM qv GROUP BY v),
         |j AS (SELECT coalesce(pc.v, qc.v) AS v,
         |  coalesce(cp, 0) AS cp, coalesce(cq, 0) AS cq
         | FROM pc FULL OUTER JOIN qc ON pc.v = qc.v),
         |tot AS (SELECT sum(cp) AS tp, sum(cq) AS tq FROM j),
         |c AS (SELECT v, tp, tq,
         |  CASE WHEN tp > 0 THEN CAST(sum(cp) OVER
         |    (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / tp
         |   ELSE 0.0 END AS fp,
         |  CASE WHEN tq > 0 THEN CAST(sum(cq) OVER
         |    (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / tq
         |   ELSE 0.0 END AS fq
         | FROM j CROSS JOIN tot),
         |d AS (SELECT v, round(abs(fp - fq), 6) AS ks, tp, tq FROM c)
         |SELECT CAST(ks + 0.0 AS DOUBLE) AS ks, CAST(v AS BIGINT) AS ks_at,
         | CAST(tp AS BIGINT) AS n_p, CAST(tq AS BIGINT) AS n_q
         |FROM d ORDER BY ks DESC, v LIMIT 1""".stripMargin,

    // Mirrors Drift.tokenDistributionDrift en-vs-de: same full-outer vocab
    // join, same 12-dp-rounded DECIMAL(28,12) contribution sum (order-
    // independent), same ln-based JSD with the ln(2) bits conversion.
    "token_drift" ->
      s"""WITH pt AS (SELECT unnest($toksSql) AS t FROM documents WHERE lang = 'en'),
         |qt AS (SELECT unnest($toksSql) AS t FROM documents WHERE lang = 'de'),
         |pc AS (SELECT t, count(*) AS cp FROM pt GROUP BY t),
         |qc AS (SELECT t, count(*) AS cq FROM qt GROUP BY t),
         |j AS (SELECT coalesce(pc.t, qc.t) AS t,
         |  coalesce(cp, 0) AS cp, coalesce(cq, 0) AS cq
         | FROM pc FULL OUTER JOIN qc ON pc.t = qc.t),
         |tot AS (SELECT sum(cp) AS tp, sum(cq) AS tq FROM j),
         |c AS (SELECT cp, cq,
         |  CASE WHEN tp > 0 THEN CAST(cp AS DOUBLE) / tp ELSE 0.0 END AS pi,
         |  CASE WHEN tq > 0 THEN CAST(cq AS DOUBLE) / tq ELSE 0.0 END AS qi
         | FROM j CROSS JOIN tot),
         |k AS (SELECT cp, cq, CAST(round(
         |   0.5 * (CASE WHEN pi > 0 THEN pi * ln(pi / ((pi + qi) / 2)) ELSE 0.0 END)
         | + 0.5 * (CASE WHEN qi > 0 THEN qi * ln(qi / ((pi + qi) / 2)) ELSE 0.0 END),
         |  12) AS DECIMAL(28,12)) AS contrib FROM c)
         |SELECT
         | CAST(round(CAST(sum(contrib) AS DOUBLE), 6) + 0.0 AS DOUBLE) AS jsd_nats,
         | CAST(round(CAST(sum(contrib) AS DOUBLE) / ln(2), 6) + 0.0 AS DOUBLE) AS jsd_bits,
         | CAST(sum(CASE WHEN cp > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_p,
         | CAST(sum(CASE WHEN cq > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_q,
         | CAST(sum(CASE WHEN cp > 0 AND cq > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_shared,
         | CAST(sum(cp) AS BIGINT) AS total_p,
         | CAST(sum(cq) AS BIGINT) AS total_q
         |FROM k""".stripMargin,

    "lang_similarity" ->
      s"""WITH tk AS (SELECT lang, unnest($toksSql) AS t FROM documents),
         |s AS (SELECT lang, (list_sort(list(DISTINCT md5(t))))[1:64] AS sk
         | FROM tk GROUP BY lang)
         |SELECT lang_a, lang_b,
         | CASE WHEN len(u) = 0 THEN 0.0
         |  ELSE round(CAST(len(list_intersect(u, ab)) AS DOUBLE) / len(u), 6)
         | END AS jaccard_est
         |FROM (
         | SELECT a.lang AS lang_a, b.lang AS lang_b,
         |  (list_sort(list_distinct(list_concat(a.sk, b.sk))))[1:64] AS u,
         |  list_intersect(a.sk, b.sk) AS ab
         | FROM s a JOIN s b ON a.lang < b.lang)""".stripMargin,

    // Same OLS moments over ln(rank)/ln(freq), same guards, slope left
    // unrounded inside the intercept/r2 arithmetic — mirrors Profile.zipfFit.
    "zipf_fit" ->
      s"""WITH tk AS (SELECT unnest($toksSql) AS t FROM documents),
         |cf AS (SELECT t, count(*) AS cf FROM tk GROUP BY t),
         |pts AS (SELECT ln(CAST(row_number() OVER (ORDER BY cf DESC, t) AS DOUBLE)) AS x,
         |  ln(CAST(cf AS DOUBLE)) AS y FROM cf),
         |s AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
         |  sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy FROM pts)
         |SELECT CAST(n AS BIGINT) AS n_terms,
         | CASE WHEN n * sxx - sx * sx > 0
         |   THEN round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) END AS slope,
         | CASE WHEN n * sxx - sx * sx > 0
         |   THEN round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) END AS intercept,
         | CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
         |   THEN round((n * sxy - sx * sy) * (n * sxy - sx * sy) /
         |     ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) END AS r2
         |FROM s""".stripMargin,

    // Same hex-digit shard math (md5 of key||salt), same manifest columns
    // as the shard_manifest gate.
    "shard_manifest" ->
      s"""WITH d AS (SELECT doc_id, lang,
         | CAST(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS toks,
         | CAST(strpos('0123456789abcdef',
         |   substr(md5(CAST(doc_id AS VARCHAR) || ':shard'), 1, 1)) - 1 AS INTEGER) AS shard
         |FROM documents)
         |SELECT shard, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens,
         | min(doc_id) AS min_id, max(doc_id) AS max_id,
         | CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
         |FROM d GROUP BY shard""".stripMargin,

    "token_budget_pack" ->
      s"""WITH $qualitySqlCtes,
         |tok AS (SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens
         | FROM documents),
         |j AS (SELECT d.doc_id, d.lang, tok.bpe_tokens, qscore.quality
         | FROM documents d JOIN qscore USING (doc_id) JOIN tok USING (doc_id)),
         |c AS (SELECT doc_id, lang, bpe_tokens, quality,
         |  CAST(SUM(bpe_tokens) OVER (PARTITION BY lang ORDER BY quality DESC, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         | FROM j)
         |SELECT doc_id, lang, bpe_tokens, quality, cum_tokens FROM c
         |WHERE cum_tokens <= 5000""".stripMargin,

    "token_budget_pack_hist" ->
      s"""WITH $qualitySqlCtes,
         |tok AS (SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens
         | FROM documents),
         |j AS (SELECT d.doc_id, d.lang, tok.bpe_tokens, qscore.quality,
         |  CAST(floor(qscore.quality * 100) AS INT) AS bkt
         | FROM documents d JOIN qscore USING (doc_id) JOIN tok USING (doc_id)),
         |hist AS (SELECT lang, bkt, SUM(bpe_tokens) AS bkt_tokens
         | FROM j GROUP BY lang, bkt),
         |cum AS (SELECT lang, bkt,
         |  SUM(bkt_tokens) OVER (PARTITION BY lang ORDER BY bkt DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
         | FROM hist),
         |thr AS (SELECT lang, MIN(bkt) AS thr_bkt
         | FROM cum WHERE cum_tokens <= 5000 GROUP BY lang)
         |SELECT j.doc_id, j.lang, j.bpe_tokens, j.quality
         |FROM j JOIN thr USING (lang) WHERE j.bkt >= thr.thr_bkt""".stripMargin,

    "curriculum_order" ->
      """WITH r AS (SELECT doc_id, source, n_chars,
        |  CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS BIGINT) AS stratum_rank
        | FROM documents)
        |SELECT doc_id, source, n_chars, stratum_rank,
        | CAST(row_number() OVER (ORDER BY stratum_rank, source, doc_id) - 1 AS BIGINT) AS curriculum_pos
        |FROM r""".stripMargin,

    "padding_waste" ->
      """WITH tok AS (SELECT
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens
        | FROM documents),
        |b AS (SELECT bpe_tokens,
        |  ((greatest(bpe_tokens, 1) - 1) // 64 + 1) * 64 AS bucket_max FROM tok),
        |g AS (SELECT bucket_max, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(bpe_tokens) AS BIGINT) AS total_tokens FROM b GROUP BY 1)
        |SELECT CAST(bucket_max AS BIGINT) AS bucket_max, n_docs, total_tokens,
        | CAST(bucket_max * n_docs AS BIGINT) AS padded_tokens,
        | round(1.0 - CAST(total_tokens AS DOUBLE) / (bucket_max * n_docs), 6) AS waste_ratio
        |FROM g""".stripMargin,

    // Same rolling-hash formulation as doc_fingerprint, aggregated
    // order-independently (sum is commutative over the per-doc hashes).
    "corpus_checksum" ->
      """WITH h AS (SELECT n_chars, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |   list_transform(range(1, len(text) + 1), i -> CAST(ascii(text[i]) AS BIGINT))),
        |  (acc, c) -> (acc * 31 + c) % 1000000007) AS rh FROM documents)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS total_chars,
        | CAST(sum(rh) AS BIGINT) AS corpus_checksum
        |FROM h""".stripMargin,

    "sequence_pack" ->
      s"""WITH tok AS (SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens
         | FROM documents),
         |c AS (SELECT doc_id, bpe_tokens,
         |  CAST(COALESCE(SUM(bpe_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_token
         | FROM tok)
         |SELECT doc_id, bpe_tokens, start_token,
         | start_token // 2048 AS seq_id,
         | start_token % 2048 AS offset_in_seq,
         | CAST(CASE WHEN bpe_tokens > 0
         |   THEN (start_token + bpe_tokens - 1) // 2048 - start_token // 2048 + 1
         |   ELSE 0 END AS BIGINT) AS n_seqs
         |FROM c""".stripMargin,

    // Same prefix-sum CTEs as sequence_pieces, collapsed to the per-doc
    // sequence-span count.
    "pack_fragmentation" ->
      s"""WITH tok AS (SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens
         | FROM documents),
         |c AS (SELECT doc_id, bpe_tokens,
         |  CAST(COALESCE(SUM(bpe_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_token
         | FROM tok WHERE bpe_tokens > 0),
         |frag AS (SELECT doc_id, bpe_tokens,
         |  ((start_token + bpe_tokens - 1) // 2048) - (start_token // 2048) + 1 AS n_seqs
         | FROM c)
         |SELECT n_seqs, count(*) AS n_docs, CAST(sum(bpe_tokens) AS BIGINT) AS n_tokens
         |FROM frag GROUP BY 1""".stripMargin,

    "sequence_pieces" ->
      s"""WITH tok AS (SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens
         | FROM documents),
         |c AS (SELECT doc_id, bpe_tokens,
         |  CAST(COALESCE(SUM(bpe_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_token
         | FROM tok WHERE bpe_tokens > 0),
         |x AS (SELECT doc_id, bpe_tokens, start_token,
         |  unnest(generate_series(start_token // 2048,
         |                         (start_token + bpe_tokens - 1) // 2048)) AS seq
         | FROM c),
         |s AS (SELECT doc_id, seq,
         |  greatest(start_token, seq * 2048) AS slice_from,
         |  least(start_token + bpe_tokens, (seq + 1) * 2048) AS slice_to,
         |  start_token
         | FROM x)
         |SELECT doc_id, seq,
         | slice_from - start_token AS take_from,
         | slice_to - slice_from AS take_len,
         | slice_from % 2048 AS pos_in_seq
         |FROM s""".stripMargin,

    "domain_cap" ->
      s"""WITH $qualitySqlCtes,
         |j AS (SELECT d.doc_id, d.source, qscore.quality
         | FROM documents d JOIN qscore USING (doc_id)),
         |r AS (SELECT doc_id, source, quality,
         |  row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rnk
         | FROM j)
         |SELECT doc_id, source, quality, CAST(rnk AS BIGINT) AS rank FROM r
         |WHERE rnk <= 10""".stripMargin,

    "tfidf_terms" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tfq AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         | FROM tk GROUP BY doc_id, term),
         |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS doc_freq,
         |  CAST(sum(tf) AS BIGINT) AS cf
         | FROM tfq GROUP BY term),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (SELECT tfq.doc_id, tfq.term, tfq.tf, dfreq.doc_freq, dfreq.cf,
         |  round(tfq.tf * (ln((n.n_docs + 1.0) / (dfreq.doc_freq + 1.0)) + 1.0), 6) AS tfidf
         | FROM tfq JOIN dfreq USING (term) CROSS JOIN n),
         |ranked AS (SELECT doc_id, term, tf, doc_freq, cf, tfidf,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
         | FROM scored)
         |SELECT doc_id, term, tf, doc_freq, cf, tfidf, CAST(rnk AS BIGINT) AS rank
         |FROM ranked WHERE rnk <= 3""".stripMargin,

    "temperature_mix" ->
      """WITH sizes AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n
        |  FROM documents GROUP BY lang),
        |z AS (SELECT sum(pow(n, 0.5)) AS z FROM sizes),
        |tg AS (SELECT lang, least(CAST(n AS BIGINT),
        |  CAST(floor(round(pow(n, 0.5) / z.z * 300, 6)) AS BIGINT)) AS target
        | FROM sizes CROSS JOIN z),
        |r AS (SELECT doc_id, lang,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rank
        | FROM documents)
        |SELECT r.doc_id, r.lang, CAST(r.rank AS BIGINT) AS rank, tg.target
        |FROM r JOIN tg USING (lang) WHERE r.rank <= tg.target""".stripMargin,

    "winnow_fingerprints" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |g AS (SELECT doc_id,
         |  CASE WHEN len(toks) >= 5 THEN
         |    list_transform(range(1, len(toks) - 3), i ->
         |      md5(array_to_string(list_slice(toks, i, i + 4), ' ')))
         |  ELSE CAST([] AS VARCHAR[]) END AS grams
         | FROM t),
         |f AS (SELECT doc_id, len(grams) AS n_grams,
         |  CASE WHEN len(grams) >= 4 THEN
         |    list_distinct(list_transform(range(1, len(grams) - 2), i ->
         |      list_min(list_slice(grams, i, i + 3))))
         |  ELSE CAST([] AS VARCHAR[]) END AS fps
         | FROM g)
         |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
         | CAST(len(fps) AS BIGINT) AS n_fingerprints,
         | md5(array_to_string(list_sort(fps), '')) AS fp_digest
         |FROM f""".stripMargin,

    "gopher_rules" -> {
      val stop = TextAnalysis.QualityStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |m AS (SELECT doc_id,
         |  CAST(len(toks) AS DOUBLE) AS n_toks,
         |  CAST(list_reduce(list_prepend(0, list_transform(toks, x -> len(x))), (a, b) -> a + b) AS DOUBLE) AS tok_chars,
         |  CAST((len(text) - len(replace(text, '#', ''))) / 1 AS BIGINT)
         |   + CAST((len(text) - len(replace(text, '...', ''))) / 3 AS BIGINT) AS symbols,
         |  list_filter(string_split(text, chr(10)), l -> len(trim(l)) > 0) AS lines,
         |  CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) AS alpha_words,
         |  CAST(len(list_filter(toks, x -> x IN ($stop))) AS BIGINT) AS stop_hits
         | FROM t),
         |r AS (SELECT doc_id, n_toks, stop_hits,
         |  CASE WHEN n_toks > 0 THEN tok_chars / n_toks ELSE 0.0 END AS mean_word_len,
         |  CASE WHEN n_toks > 0 THEN CAST(symbols AS DOUBLE) / n_toks ELSE 0.0 END AS symbol_ratio,
         |  CAST(len(lines) AS DOUBLE) AS n_lines,
         |  CAST(len(list_filter(lines, l -> starts_with(ltrim(l), '- ')
         |    OR starts_with(ltrim(l), '* ') OR starts_with(ltrim(l), '•'))) AS DOUBLE) AS bullets,
         |  CAST(len(list_filter(lines, l -> ends_with(rtrim(l), '...')
         |    OR ends_with(rtrim(l), '…'))) AS DOUBLE) AS ellipses,
         |  alpha_words
         | FROM m),
         |f AS (SELECT doc_id, n_toks, mean_word_len, symbol_ratio, stop_hits,
         |  CASE WHEN n_lines > 0 THEN bullets / n_lines ELSE 0.0 END AS bullet_frac,
         |  CASE WHEN n_lines > 0 THEN ellipses / n_lines ELSE 0.0 END AS ellipsis_frac,
         |  CASE WHEN n_toks > 0 THEN alpha_words / n_toks ELSE 0.0 END AS alpha_frac
         | FROM r)
         |SELECT doc_id, CAST(n_toks AS BIGINT) AS word_count,
         | round(mean_word_len, 6) AS mean_word_len,
         | round(symbol_ratio, 6) AS symbol_ratio,
         | round(bullet_frac, 6) AS bullet_frac,
         | round(ellipsis_frac, 6) AS ellipsis_frac,
         | round(alpha_frac, 6) AS alpha_frac,
         | stop_hits,
         | (n_toks >= 50 AND n_toks <= 100000
         |  AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
         |  AND symbol_ratio <= 0.1
         |  AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3
         |  AND alpha_frac >= 0.8 AND stop_hits >= 2) AS passes
         |FROM f""".stripMargin
    },

    // stackCodeFlags replay: same planted blob/banner rows, same line
    // geometry over string_split, same regexes (RE2 and Java agree on
    // these ASCII classes), same round(.,6) emission.
    "code_quality" ->
      """WITH d AS (SELECT doc_id,
        |  CASE WHEN doc_id % 13 = 0
        |    THEN '// This file is auto-generated. Do not edit.' || chr(10) || text
        |   WHEN doc_id % 7 = 0
        |    THEN text || chr(10) || 'data = "' || rpad('QUJD', 150, '=') || '"'
        |   ELSE text END AS text
        | FROM documents WHERE text IS NOT NULL AND length(text) > 0),
        |m AS (SELECT doc_id, text, string_split(text, chr(10)) AS ls FROM d),
        |g AS (SELECT doc_id, text,
        |  CAST(len(ls) AS BIGINT) AS n_lines,
        |  CAST(list_max(list_transform(ls, x -> length(x))) AS BIGINT) AS max_line_len,
        |  CAST(list_reduce(list_prepend(0, list_transform(ls, x -> length(x))), (a, b) -> a + b) AS DOUBLE) AS total_chars,
        |  CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS DOUBLE) AS alnum,
        |  CAST(len(list_filter(ls, x -> length(x) > 120)) AS BIGINT) AS n_long_lines,
        |  regexp_matches(text, '(?i)(auto[- ]generated|automatically generated|do not edit)') AS has_autogen,
        |  regexp_matches(text, '[A-Za-z0-9+/=]{64,}') AS has_data_blob
        | FROM m)
        |SELECT doc_id, n_lines, max_line_len,
        | round(total_chars / n_lines, 6) AS mean_line_len,
        | round(alnum / length(text), 6) AS alnum_frac,
        | n_long_lines, has_autogen, has_data_blob,
        | (max_line_len <= 1000 AND total_chars / n_lines <= 100.0
        |  AND alnum / length(text) >= 0.25 AND NOT has_autogen) AS keep
        |FROM g""".stripMargin,

    "c4_clean" ->
      """WITH docs AS (SELECT doc_id,
        |  CASE WHEN doc_id % 11 = 0 THEN text || ' {code}'
        |   WHEN doc_id % 3 = 0 THEN text || '.' || chr(10) || 'short line'
        |     || chr(10) || '- bullet item' || chr(10)
        |     || 'A proper sentence with enough words here.'
        |   ELSE text || '.' END AS text
        | FROM documents),
        |k AS (SELECT doc_id, text,
        |  list_filter(string_split(text, chr(10)), l ->
        |    len(list_filter(string_split(l, ' '), w -> len(w) > 0)) >= 5
        |    AND (ends_with(rtrim(l), '.') OR ends_with(rtrim(l), '!')
        |      OR ends_with(rtrim(l), '?') OR ends_with(rtrim(l), '"'))
        |    AND NOT contains(lower(l), 'javascript')) AS kept
        | FROM docs),
        |d AS (SELECT doc_id, kept,
        |  (contains(lower(text), 'lorem ipsum') OR contains(text, '{')
        |   OR len(kept) < 1) AS dropped
        | FROM k)
        |SELECT doc_id,
        | CASE WHEN dropped THEN '' ELSE array_to_string(kept, chr(10)) END AS clean_text,
        | CASE WHEN dropped THEN 0 ELSE len(kept) END AS n_lines_kept,
        | dropped AS doc_dropped
        |FROM d""".stripMargin,

    // Mirrors CurationRules.sharedPrefixFlags over the planted headers:
    // same 30-char prefix key, same per-(source, prefix) count window.
    "boilerplate_prefix" ->
      """WITH p AS (SELECT doc_id, source,
        |  CASE WHEN doc_id % 4 < 2
        |   THEN 'Subscribe to ' || source || ' updates! ' || text
        |   ELSE text END AS text
        | FROM documents)
        |SELECT doc_id, source, substring(text, 1, 30) AS prefix,
        | count(*) OVER (PARTITION BY source, substring(text, 1, 30)) AS prefix_count,
        | count(*) OVER (PARTITION BY source, substring(text, 1, 30)) >= 3 AS is_boilerplate
        |FROM p""".stripMargin,

    // Mirrors CurationRules.blocklistFlagsJoin: lowercase [a-z0-9]+ tokens,
    // occurrence count + sorted-distinct comma-joined evidence, blocked
    // when n_flagged > 2. Zero-hit docs restored by the left join.
    "blocklist_filter" ->
      """WITH bl AS (SELECT unnest(['slow', 'dup', 'deadlock']) AS term),
        |toks AS (SELECT doc_id,
        |  unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        | FROM documents),
        |hits AS (SELECT t.doc_id, t.tok FROM toks t JOIN bl b ON t.tok = b.term),
        |agg AS (SELECT doc_id, count(*) AS n,
        |  string_agg(DISTINCT tok, ',' ORDER BY tok) AS terms
        | FROM hits GROUP BY doc_id)
        |SELECT d.doc_id,
        | CAST(coalesce(a.n, 0) AS BIGINT) AS n_flagged,
        | coalesce(a.terms, '') AS flagged_terms,
        | coalesce(a.n, 0) > 2 AS blocked
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin,

    "lm_unigram_score" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tfq AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY doc_id, term),
         |cfq AS (SELECT term, sum(tf) AS cf FROM tfq GROUP BY term),
         |tot AS (SELECT sum(cf) AS t, count(*) AS v FROM cfq)
         |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_toks,
         | round(sum(wlp) / sum(tf), 6) AS avg_logprob,
         | round(exp(-(sum(wlp) / sum(tf))), 6) AS perplexity
         |FROM (SELECT tfq.doc_id, tfq.tf,
         |   tfq.tf * ln((cfq.cf + 0.5) / (tot.t + 0.5 * tot.v)) AS wlp
         |  FROM tfq JOIN cfq USING (term) CROSS JOIN tot) s
         |GROUP BY doc_id""".stripMargin,

    // Same unigram-perplexity CTEs, then CCNet's per-language ntile(3) on
    // the ROUNDED perplexity with the id tie-break (rank-determinism rule).
    "ccnet_band" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tfq AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY doc_id, term),
         |cfq AS (SELECT term, sum(tf) AS cf FROM tfq GROUP BY term),
         |tot AS (SELECT sum(cf) AS t, count(*) AS v FROM cfq),
         |scored AS (
         | SELECT doc_id, round(exp(-(sum(wlp) / sum(tf))), 6) AS perplexity
         | FROM (SELECT tfq.doc_id, tfq.tf,
         |    tfq.tf * ln((cfq.cf + 0.5) / (tot.t + 0.5 * tot.v)) AS wlp
         |   FROM tfq JOIN cfq USING (term) CROSS JOIN tot) s
         | GROUP BY doc_id),
         |b AS (
         | SELECT s.doc_id, d.lang, s.perplexity,
         |  ntile(3) OVER (PARTITION BY d.lang ORDER BY s.perplexity, s.doc_id) AS band
         | FROM scored s JOIN documents d ON s.doc_id = d.doc_id)
         |SELECT doc_id, lang, perplexity, CAST(band AS BIGINT) AS band,
         | CASE band WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS band_label,
         | band = 2 AS keep_middle
         |FROM b""".stripMargin,

    "lm_bigram_score" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
         |  FROM t, UNNEST(range(1, len(toks))) AS u(i)),
         |tf2 AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY 1, 2, 3),
         |cf2 AS (SELECT w1, w2, sum(tf) AS c2 FROM tf2 GROUP BY 1, 2),
         |c1t AS (SELECT w1, sum(tf) AS c1 FROM tf2 GROUP BY 1),
         |vv AS (SELECT count(DISTINCT w2) AS v FROM tf2)
         |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
         | round(sum(wlp) / sum(tf), 6) AS avg_logprob,
         | round(exp(-(sum(wlp) / sum(tf))), 6) AS perplexity
         |FROM (SELECT tf2.doc_id, tf2.tf,
         |   tf2.tf * ln((cf2.c2 + 0.5) / (c1t.c1 + 0.5 * vv.v)) AS wlp
         |  FROM tf2 JOIN cf2 USING (w1, w2) JOIN c1t USING (w1) CROSS JOIN vv) s
         |GROUP BY doc_id""".stripMargin,

    // Same bigram counts; pmi = ln(c2*N/(cl*cr)) with identical cast
    // shape, rank by the ROUNDED pmi with (w1,w2) tie-break — a total
    // order both engines sort identically.
    "collocations_pmi" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |bg AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
         |  FROM t, UNNEST(range(1, len(toks))) AS u(i)),
         |cf2 AS MATERIALIZED (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
         |cl AS (SELECT w1, sum(c2) AS cl FROM cf2 GROUP BY 1),
         |cr AS (SELECT w2, sum(c2) AS cr FROM cf2 GROUP BY 1),
         |tot AS (SELECT sum(c2) AS n FROM cf2)
         |SELECT cf2.w1, cf2.w2, cf2.c2 AS pair_count,
         | round(ln((CAST(cf2.c2 AS DOUBLE) * tot.n) / (CAST(cl.cl AS DOUBLE) * cr.cr)), 6) AS pmi
         |FROM cf2 JOIN cl USING (w1) JOIN cr USING (w2) CROSS JOIN tot
         |WHERE cf2.c2 >= 5
         |ORDER BY pmi DESC, cf2.w1, cf2.w2 LIMIT 50""".stripMargin,

    // Interpolated KN with D=0.75: max(c2-D,0) discount mass redistributed
    // via continuation probability N1+(*,w2)/B; N1+ counts are row counts
    // of the bigram-TYPE table, exactly as the engine derives them from
    // cf2. Identical expression shape left-to-right.
    "lm_kneser_ney" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
         |  FROM t, UNNEST(range(1, len(toks))) AS u(i)),
         |tf2 AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY 1, 2, 3),
         |cf2 AS MATERIALIZED (SELECT w1, w2, sum(tf) AS c2 FROM tf2 GROUP BY 1, 2),
         |c1t AS (SELECT w1, sum(c2) AS c1, count(*) AS n1f FROM cf2 GROUP BY 1),
         |cont AS (SELECT w2, count(*) AS n1b FROM cf2 GROUP BY 1),
         |bt AS (SELECT count(*) AS b FROM cf2)
         |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
         | round(sum(wlp) / sum(tf), 6) AS avg_logprob,
         | round(exp(-(sum(wlp) / sum(tf))), 6) AS perplexity
         |FROM (SELECT tf2.doc_id, tf2.tf,
         |   tf2.tf * ln((greatest(cf2.c2 - CAST(0.75 AS DOUBLE), CAST(0.0 AS DOUBLE))
         |     + CAST(0.75 AS DOUBLE) * c1t.n1f * (cont.n1b / bt.b)) / c1t.c1) AS wlp
         |  FROM tf2 JOIN cf2 USING (w1, w2) JOIN c1t USING (w1)
         |  JOIN cont USING (w2) CROSS JOIN bt) s
         |GROUP BY doc_id""".stripMargin,

    // Same feature build (u:/b:-prefixed unigrams+bigrams), same add-k
    // log-ratio, same union-vocabulary smoothing as Dsir.importanceWeights;
    // ranking runs over the 6-dp-rounded weight with doc_id tie-break in
    // both engines, so the exact keep set hashes identically.
    "dsir_weights" ->
      s"""WITH $dsirWeightsSqlCtes
         |SELECT doc_id, n_feats, log_weight,
         | row_number() OVER (ORDER BY log_weight DESC, doc_id)
         |   <= CAST(ceil(0.25 * (SELECT count(*) FROM w)) AS BIGINT) AS selected
         |FROM w""".stripMargin,

    // DSIR weights (shared CTEs) driving the token-budget pack window —
    // same order key (weight DESC, doc_id), same cumulative-sum cutoff as
    // CorpusMix.packToBudget.
    "dsir_budget_pack" ->
      s"""WITH $dsirWeightsSqlCtes,
         |tok AS (SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens
         | FROM documents),
         |j AS (SELECT d.doc_id, d.lang, tok.bpe_tokens, w.log_weight
         | FROM documents d JOIN w USING (doc_id) JOIN tok USING (doc_id)),
         |c AS (SELECT doc_id, lang, bpe_tokens, log_weight,
         |  CAST(SUM(bpe_tokens) OVER (PARTITION BY lang ORDER BY log_weight DESC, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         | FROM j)
         |SELECT doc_id, lang, bpe_tokens, log_weight, cum_tokens FROM c
         |WHERE cum_tokens <= 3000""".stripMargin,

    "quality_classifier" ->
      s"""WITH $classifierScoredSqlCtes
         |SELECT doc_id, y AS label, prob, prob >= 0.5 AS predicted
         |FROM scored""".stripMargin,

    // Rank-sum AUC with exact tie handling over the scored distribution:
    // rows collapse to per-distinct-prob (n_pos, n_neg) first, the
    // cumulative below-count runs over that table, and every accumulated
    // term is an exact multiple of 0.5 — order-independent, so the engine's
    // shuffle order can't drift the hash.
    "classifier_auc" ->
      s"""WITH $classifierScoredSqlCtes,
         |dist AS (SELECT prob, sum(y) AS npos, sum(1.0 - y) AS nneg
         | FROM scored GROUP BY prob),
         |cum AS (SELECT prob, npos, nneg,
         |  coalesce(sum(nneg) OVER (ORDER BY prob
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS below
         | FROM dist)
         |SELECT round(sum(npos * (below + nneg / 2.0)) / (sum(npos) * sum(nneg)), 6) AS auc,
         | CAST(sum(npos) AS BIGINT) AS n_pos, CAST(sum(nneg) AS BIGINT) AS n_neg
         |FROM cum""".stripMargin,

    // Same decile binning, same decimal-exact mean-prob sum, same rounded
    // gap arithmetic as Classifier.calibrationFrame.
    "classifier_calibration" ->
      s"""WITH $classifierScoredSqlCtes,
         |bins AS (
         | SELECT CAST(least(floor(prob * 10), 9) AS BIGINT) AS bin,
         |  count(*) AS n,
         |  round(CAST(sum(CAST(prob AS DECIMAL(16,6))) AS DOUBLE) / count(*), 6) AS mean_prob,
         |  round(sum(y) / count(*), 6) AS pos_rate
         | FROM scored GROUP BY 1)
         |SELECT bin, n, mean_prob, pos_rate,
         | round(abs(mean_prob - pos_rate), 6) AS gap
         |FROM bins""".stripMargin,

    "bm25_rank" ->
      s"""WITH $bm25Ctes
         |$bm25Select""".stripMargin,

    // Same oracle as bm25_rank ON PURPOSE: the merged-shard path must be
    // row-identical to the one-shot index — that equality IS the
    // incremental-indexing claim.
    "bm25_merged_stats" ->
      s"""WITH $bm25Ctes
         |$bm25Select""".stripMargin,

    // Dirichlet QL in the same rank-equivalent decomposition as the engine:
    // matched-term sum + |q_eff| * length penalty, collection stats from
    // the shared token CTEs.
    "ql_dirichlet" ->
      s"""WITH $bm25Ctes,
         |ctoks AS (SELECT CAST(count(*) AS BIGINT) AS ct FROM tk),
         |cf AS (SELECT term, sum(tf) AS cfreq FROM tfq GROUP BY 1),
         |nq AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cf)
         |SELECT tfq.doc_id, CAST(count(*) AS BIGINT) AS matched_terms,
         | round(sum(ln(1.0 + tfq.tf / (2000.0 * cf.cfreq / ctoks.ct)))
         |   + max(nq.n) * ln(2000.0 / (max(dl.dlen) + 2000.0)), 6)
         |   AS ql_score
         |FROM tfq JOIN cf USING (term) JOIN dl USING (doc_id)
         |CROSS JOIN ctoks CROSS JOIN nq
         |GROUP BY tfq.doc_id""".stripMargin,

    // MaxSim.rerank replay: token matrices as ordered list-of-list slices,
    // the same Σ-max cosine arithmetic left-to-right (list_reduce over
    // list_transform), same rank tie-break.
    "maxsim_rerank" ->
      s"""WITH d AS (
         | SELECT label AS doc_label,
         |  list_slice(list(embedding ORDER BY vec_id), 1, 8) AS d_toks
         | FROM embeddings GROUP BY label),
         |q AS (
         | SELECT label AS q_label,
         |  list_slice(list(embedding ORDER BY vec_id), 1, 2) AS q_toks
         | FROM embeddings WHERE label % 4 = 0 GROUP BY label),
         |s AS (
         | SELECT q.q_label, d.doc_label,
         |  list_reduce(list_prepend(0.0, list_transform(q.q_toks, qt ->
         |    list_reduce(list_prepend(CAST('-infinity' AS DOUBLE),
         |      list_transform(d.d_toks, dt -> ${cosOf("qt", "dt")})),
         |     (a, b) -> greatest(a, b)))),
         |   (a, b) -> a + b) AS score
         | FROM q CROSS JOIN d),
         |r AS (SELECT q_label, doc_label, score,
         |  row_number() OVER (PARTITION BY q_label
         |    ORDER BY score DESC, doc_label) AS rank FROM s)
         |SELECT q_label, doc_label, round(score, 6) AS score,
         | CAST(rank AS BIGINT) AS rank
         |FROM r WHERE rank <= 3""".stripMargin,

    // MaxSim two-stage replay: mean-pool arithmetic (per-dimension
    // left-to-right sum / n), rounded stage-1 cosine rank, candidate cut,
    // then the Σ-max rerank over survivors only.
    "maxsim_two_stage" ->
      s"""WITH d AS (
         | SELECT label AS doc_label,
         |  list_slice(list(embedding ORDER BY vec_id), 1, 8) AS d_toks
         | FROM embeddings GROUP BY label),
         |q AS (
         | SELECT label AS q_label,
         |  list_slice(list(embedding ORDER BY vec_id), 1, 2) AS q_toks
         | FROM embeddings WHERE label % 4 = 0 GROUP BY label),
         |dp AS (SELECT doc_label, d_toks,
         |  list_transform(range(1, len(d_toks[1]) + 1), i ->
         |   list_reduce(list_prepend(0.0, list_transform(d_toks,
         |     t -> CAST(t[i] AS DOUBLE))), (a, b) -> a + b)
         |   / len(d_toks)) AS d_pool FROM d),
         |qp AS (SELECT q_label, q_toks,
         |  list_transform(range(1, len(q_toks[1]) + 1), i ->
         |   list_reduce(list_prepend(0.0, list_transform(q_toks,
         |     t -> CAST(t[i] AS DOUBLE))), (a, b) -> a + b)
         |   / len(q_toks)) AS q_pool FROM q),
         |s1 AS (SELECT q_label, doc_label, q_toks, d_toks,
         |  round(${cosOf("q_pool", "d_pool")}, 6) AS s1
         | FROM qp CROSS JOIN dp),
         |r1 AS (SELECT *, row_number() OVER (PARTITION BY q_label
         |   ORDER BY s1 DESC, doc_label) AS stage1_rank FROM s1),
         |c AS (SELECT * FROM r1 WHERE stage1_rank <= 5),
         |s2 AS (SELECT q_label, doc_label, stage1_rank,
         |  list_reduce(list_prepend(0.0, list_transform(q_toks, qt ->
         |    list_reduce(list_prepend(CAST('-infinity' AS DOUBLE),
         |      list_transform(d_toks, dt -> ${cosOf("qt", "dt")})),
         |     (a, b) -> greatest(a, b)))),
         |   (a, b) -> a + b) AS score
         | FROM c),
         |r2 AS (SELECT q_label, doc_label, stage1_rank, score,
         |  row_number() OVER (PARTITION BY q_label
         |    ORDER BY score DESC, doc_label) AS rank FROM s2)
         |SELECT q_label, doc_label, round(score, 6) AS score,
         | CAST(rank AS BIGINT) AS rank, CAST(stage1_rank AS BIGINT) AS stage1_rank
         |FROM r2 WHERE rank <= 3""".stripMargin,

    "hybrid_search_rrf" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |vscored AS (SELECT vec_id AS id, round(${cosOf("embedding", "qv")}, 6) AS score
         | FROM embeddings, q WHERE vec_id <> 0),
         |vtop AS (SELECT id, score FROM vscored ORDER BY score DESC, id LIMIT 100),
         |vrank AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS r FROM vtop),
         |$bm25Ctes,
         |bscored AS ($bm25Select),
         |btop AS (SELECT doc_id AS id, bm25 AS score FROM bscored
         | ORDER BY score DESC, id LIMIT 100),
         |brank AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS r FROM btop)
         |SELECT coalesce(v.id, b.id) AS id,
         | round(coalesce(CAST(1.0 AS DOUBLE) / (60 + v.r), 0)
         |  + coalesce(CAST(1.0 AS DOUBLE) / (60 + b.r), 0), 6) AS rrf_score
         |FROM vrank v FULL OUTER JOIN brank b ON v.id = b.id
         |ORDER BY rrf_score DESC, id LIMIT 20""".stripMargin,

    // Scalar-digest oracles for the vector-valued operators: dims and
    // nonzero-ness are exactly SQL-expressible; the vector values themselves
    // are pinned by ScalaTest goldens (EmbedSpec/MultimodalSpec/SinkSpec).
    "embed_hashing" ->
      """SELECT doc_id, CAST(64 AS BIGINT) AS dim,
        | regexp_matches(text, '[\p{L}\p{N}]') AS has_embedding
        |FROM documents""".stripMargin,

    "embed_quantize" ->
      """WITH x AS (SELECT vec_id,
        |  list_transform(embedding, v -> CAST(v AS DOUBLE)) AS xs FROM embeddings),
        |s AS (SELECT vec_id, xs,
        |  list_reduce(list_prepend(0.0, list_transform(xs, v -> abs(v))),
        |    (a, b) -> greatest(a, b)) / 127.0 AS qscale FROM x),
        |q AS (SELECT vec_id, xs, qscale,
        |  CASE WHEN qscale = 0.0 THEN list_transform(xs, v -> 0)
        |   ELSE list_transform(xs, v ->
        |     CAST(least(greatest(floor(v / qscale + 0.5), -127.0), 127.0) AS INT))
        |  END AS qs FROM s)
        |SELECT vec_id, round(qscale, 6) AS qscale,
        | CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |   list_transform(qs, v -> CAST(v AS BIGINT))), (a, b) -> a + b) AS BIGINT) AS sum_q,
        | round(CASE WHEN len(xs) = 0 THEN 0.0
        |  ELSE list_reduce(list_prepend(0.0,
        |    list_transform(range(1, len(xs) + 1), i -> abs(xs[i] - qs[i] * qscale))),
        |   (a, b) -> a + b) / len(xs) END, 6) AS mean_abs_err
        |FROM q""".stripMargin,

    "embed_mean_pool" ->
      """SELECT CAST(label AS BIGINT) AS label, i - 1 AS dim,
        | round(avg(embedding[i]::DOUBLE), 6) AS value
        |FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
        |GROUP BY 1, 2""".stripMargin,

    "dedup_keep_best" -> {
      val stop = TextAnalysis.QualityStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH RECURSIVE ids AS (SELECT doc_id FROM documents),
         |e0 AS (
         | SELECT doc_id AS src, doc_id + 1 AS dst FROM ids WHERE doc_id % 7 < 3
         | UNION ALL
         | SELECT doc_id, doc_id + 3 FROM ids WHERE doc_id % 11 = 0),
         |ek AS (SELECT src, dst FROM e0 WHERE dst IN (SELECT doc_id FROM ids)),
         |edges AS (SELECT src, dst FROM ek UNION SELECT dst, src FROM ek),
         |reach(id, comp) AS (
         | SELECT DISTINCT src, src FROM edges
         | UNION
         | SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id),
         |cmp AS (SELECT id AS doc_id, min(comp) AS component FROM reach GROUP BY id),
         |t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |m AS (SELECT doc_id,
         |  CAST(len(text) AS DOUBLE) AS n_chars,
         |  CAST(len(toks) AS DOUBLE) AS n_toks,
         |  CAST(list_reduce(list_prepend(0, list_transform(toks, x -> len(x))), (a, b) -> a + b) AS DOUBLE) AS tok_chars,
         |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) AS punct,
         |  CAST(len(list_filter(toks, x -> x IN ($stop))) AS DOUBLE) AS stop_hits
         | FROM t),
         |r AS (SELECT doc_id, n_chars,
         |  CASE WHEN n_toks > 0 THEN tok_chars / n_toks ELSE 0.0 END AS mean_tok_len,
         |  CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0.0 END AS punct_ratio,
         |  CASE WHEN n_toks > 0 THEN stop_hits / n_toks ELSE 0.0 END AS stop_ratio
         | FROM m),
         |q AS (SELECT r.doc_id, d.source,
         |  round(least(r.n_chars / 500.0, 1.0) * 0.4 +
         |   (CASE WHEN mean_tok_len >= 3.0 AND mean_tok_len <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.3 +
         |   (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.2 +
         |   least(stop_ratio * 5.0, 1.0) * 0.1, 6) AS quality
         | FROM r JOIN documents d USING (doc_id)),
         |members AS (SELECT q.doc_id, q.source, q.quality, c.component
         | FROM q JOIN cmp c USING (doc_id)),
         |best AS (SELECT doc_id, source, quality FROM (
         |  SELECT doc_id, source, quality,
         |   row_number() OVER (PARTITION BY component ORDER BY quality DESC, doc_id) AS rn
         |  FROM members) WHERE rn = 1)
         |SELECT doc_id, source, quality FROM q
         | WHERE doc_id NOT IN (SELECT doc_id FROM cmp)
         |UNION ALL
         |SELECT doc_id, source, quality FROM best""".stripMargin
    },

    "embed_project" -> {
      val signs = graft.functions.VectorFunctions.signMatrix(dim = 64, outDim = 16)
      val cols = signs.indices.map { j =>
        val terms = signs(j).zipWithIndex.map { case (sgn, i) =>
          val v = s"embedding[${i + 1}]::DOUBLE"
          if (i == 0) { if (sgn > 0) v else s"-$v" }
          else { if (sgn > 0) s" + $v" else s" - $v" }
        }.mkString
        f"round(($terms) / sqrt(16.0), 6) AS p$j%02d"
      }
      s"SELECT vec_id,\n ${cols.mkString(",\n ")}\nFROM embeddings"
    },

    // Same per-element double casts, same (sxy - sx*sy/n)/n arithmetic as
    // Pca.covarianceFrame; 6-dp rounding absorbs summation-order drift
    // (the embed-gate convention).
    "embed_covariance" ->
      """WITH pairs AS (
        |  SELECT a.i AS i, b.i AS j
        |  FROM range(0, 16) AS a(i), range(0, 16) AS b(i) WHERE a.i <= b.i),
        |s AS (
        |  SELECT p.i, p.j,
        |   sum(CAST(e.embedding[p.i + 1] AS DOUBLE) * CAST(e.embedding[p.j + 1] AS DOUBLE)) AS sxy,
        |   sum(CAST(e.embedding[p.i + 1] AS DOUBLE)) AS sx,
        |   sum(CAST(e.embedding[p.j + 1] AS DOUBLE)) AS sy,
        |   CAST(count(*) AS DOUBLE) AS n
        |  FROM pairs p CROSS JOIN embeddings e GROUP BY 1, 2)
        |SELECT i, j, round((sxy - sx * sy / n) / n, 6) + 0.0 AS cov FROM s""".stripMargin,

    "kmeans_assign" ->
      s"""WITH ${kmeansCtes(10, 2, 64)}
         |SELECT vec_id, cluster, round(d2, 6) AS dist2 FROM (
         |  SELECT e.vec_id, c.cluster, ${kmeansD2("e", "c", 64)} AS d2,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${kmeansD2("e", "c", 64)} ASC, c.cluster ASC) AS rn
         |  FROM e CROSS JOIN c2 c) WHERE rn = 1""".stripMargin,

    // Per-subspace replay of the PQ codebook training + code assignment:
    // the kmeans_assign unrolled-CTE machinery over each 16-dim slice.
    "pq_encode" -> s"WITH ${pqCodeCtes()}\n${pqCodeSelect()}",

    // ...then ADC: each row's distance is the sum over subspaces of the
    // exact-query-to-assigned-centroid distance — the same m lookups the
    // engine's literal table provides, in the same left-to-right add order.
    "pq_adc_topk" -> {
      val qs = (0 until 4).map(j =>
        s"q$j AS (SELECT (embedding::DOUBLE[])[${j * 16 + 1}:${(j + 1) * 16}] AS v" +
          " FROM embeddings WHERE vec_id = 0)").mkString(",\n")
      val ts = (0 until 4).map(j =>
        s"""t$j AS (SELECT cd.vec_id, ${kmeansD2("q", "c", 16)} AS d
           |  FROM cd$j cd JOIN s${j}_c2 c ON c.cluster = cd.code CROSS JOIN q$j q)""".stripMargin)
        .mkString(",\n")
      s"""WITH ${pqCodeCtes()},
         |$qs,
         |$ts
         |SELECT vec_id, round(t0.d + t1.d + t2.d + t3.d, 6) AS adc_dist2
         |FROM t0 JOIN t1 USING (vec_id) JOIN t2 USING (vec_id) JOIN t3 USING (vec_id)
         |ORDER BY adc_dist2 ASC, vec_id ASC LIMIT 10""".stripMargin
    },

    "kmeans_silhouette" ->
      s"""WITH ${kmeansCtes(10, 2, 64)},
         |d AS (SELECT e.vec_id, c.cluster, ${kmeansD2("e", "c", 64)} AS d2,
         |   row_number() OVER (PARTITION BY e.vec_id
         |     ORDER BY ${kmeansD2("e", "c", 64)} ASC, c.cluster ASC) AS rn
         | FROM e CROSS JOIN c2 c),
         |ab AS (SELECT vec_id,
         |   max(CASE WHEN rn = 1 THEN cluster END) AS cluster,
         |   sqrt(max(CASE WHEN rn = 1 THEN d2 END)) AS a,
         |   sqrt(max(CASE WHEN rn = 2 THEN d2 END)) AS b
         | FROM d WHERE rn <= 2 GROUP BY 1),
         |sv AS (SELECT cluster, a, b,
         |   CASE WHEN greatest(a, b) > 0 THEN (b - a) / greatest(a, b)
         |     ELSE 0.0 END AS s
         | FROM ab)
         |SELECT CAST(cluster AS BIGINT) AS cluster,
         | CAST(count(*) AS BIGINT) AS n,
         | round(avg(a), 6) AS mean_a, round(avg(b), 6) AS mean_b,
         | round(avg(s), 6) AS mean_silhouette,
         | CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_misassigned
         |FROM sv GROUP BY 1""".stripMargin,

    "semantic_dedup" ->
      s"""WITH ${kmeansCtes(10, 2, 64)},
         |af AS (SELECT vec_id, cluster FROM (
         |  SELECT e.vec_id, c.cluster, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${kmeansD2("e", "c", 64)} ASC, c.cluster ASC) AS rn
         |  FROM e CROSS JOIN c2 c) WHERE rn = 1)
         |SELECT a.vec_id, a.cluster FROM af a JOIN e ea USING (vec_id)
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM af b JOIN e eb ON eb.vec_id = b.vec_id
         |  WHERE b.cluster = a.cluster AND b.vec_id < a.vec_id
         |    AND ${cosOf("ea.v", "eb.v")} >= 0.3)""".stripMargin,

    // Analytic mirror of the BMP test pattern: gray pixel value
    // v(x,y) = (doc_id*7 + x*13 + y*31) % 256 survives the real
    // encode/decode/luminance path exactly, so the dHash bit is just the
    // neighbor comparison on the formula.
    "image_dhash" ->
      """WITH g AS (SELECT doc_id, y, x
        | FROM documents, range(0, 8) t1(y), range(0, 8) t2(x)),
        |bits AS (SELECT doc_id, y * 8 + x AS k,
        |  CASE WHEN (doc_id * 7 + x * 13 + y * 31) % 256 <
        |            (doc_id * 7 + (x + 1) * 13 + y * 31) % 256
        |   THEN 1 ELSE 0 END AS b
        | FROM g)
        |SELECT doc_id,
        | CAST(sum(CASE WHEN k >= 32 THEN b * (CAST(1 AS BIGINT) << (k - 32)) ELSE 0 END) AS BIGINT) AS dhash_hi,
        | CAST(sum(CASE WHEN k < 32 THEN b * (CAST(1 AS BIGINT) << k) ELSE 0 END) AS BIGINT) AS dhash_lo
        |FROM bits GROUP BY doc_id""".stripMargin,

    // Analytic replay of the 9x8 -> 4x4 nearest-neighbor resize: source
    // pixel sx = floor((2*gx+1)*9/8) clamped to 8, sy = 2*gy+1; gray
    // pixels make the Rec.601 luminance the pixel value itself.
    "image_resize" ->
      """WITH g AS (SELECT doc_id, y, x
        | FROM documents, range(0, 4) t1(y), range(0, 4) t2(x)),
        |px AS (SELECT doc_id, x, y,
        |  LEAST(((2 * x + 1) * 9) // 8, 8) AS sx,
        |  LEAST(((2 * y + 1) * 8) // 8, 7) AS sy
        | FROM g)
        |SELECT doc_id, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
        | CAST((doc_id * 7 + sx * 13 + sy * 31) % 256 AS BIGINT) AS lum
        |FROM px""".stripMargin,

    // Integer replay of the WAV probe: bit k compares window k's and
    // k+1's integer sums of a(i)^2, a(i) = (doc_id*7 + i*13) % 2001 - 1000
    // over i in [w*32, w*32+32).
    "audio_fingerprint" ->
      """WITH s AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
        |  (doc_id * 7 + i * 13) % 2001 - 1000 AS a
        | FROM documents, range(0, 2080) t(i)),
        |e AS (SELECT doc_id, i // 32 AS w, sum(a * a) AS energy
        | FROM s GROUP BY 1, 2),
        |bits AS (SELECT l.doc_id, l.w AS k,
        |  CASE WHEN l.energy < r.energy THEN 1 ELSE 0 END AS b
        | FROM e l JOIN e r ON r.doc_id = l.doc_id AND r.w = l.w + 1)
        |SELECT doc_id,
        | CAST(sum(CASE WHEN k >= 32 THEN b * (CAST(1 AS BIGINT) << (k - 32)) ELSE 0 END) AS BIGINT) AS afp_hi,
        | CAST(sum(CASE WHEN k < 32 THEN b * (CAST(1 AS BIGINT) << k) ELSE 0 END) AS BIGINT) AS afp_lo
        |FROM bits GROUP BY doc_id""".stripMargin,

    // Integer replay of the 32:1 box downsample: level(j) = floor-div of
    // the window's raw-sample sum, a(i) = (doc_id*7 + i*13) % 2001 - 1000.
    "audio_resample" ->
      """WITH s AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
        |  (doc_id * 7 + i * 13) % 2001 - 1000 AS a
        | FROM documents, range(0, 2080) t(i))
        |SELECT doc_id, i // 32 AS j,
        | CAST(floor(sum(a) / 32.0) AS BIGINT) AS level
        |FROM s GROUP BY doc_id, i // 32""".stripMargin,

    // Analytic replay of the DIB-in-AVI decode: frame f of doc d holds
    // the 8x6 gray pattern v = (d*7 + 13x + 31y + 97f) % 256, whose
    // integer Rec.601 luminance is v itself, so lum_sum = sum(v). %5 docs
    // carry a RIFF/WAVE (not AVI) payload -> one all-null row each.
    "video_frames" ->
      """WITH fr AS (SELECT doc_id, f.f AS f
        | FROM documents, range(0, 4) f(f)
        | WHERE doc_id % 5 <> 0 AND f.f < 2 + doc_id % 3),
        |px AS (SELECT x.x AS x, y.y AS y
        | FROM range(0, 8) x(x), range(0, 6) y(y))
        |SELECT fr.doc_id, CAST(fr.f AS BIGINT) AS frame_index,
        | CAST(8 AS BIGINT) AS width, CAST(6 AS BIGINT) AS height,
        | CAST(sum((fr.doc_id * 7 + 13 * px.x + 31 * px.y + 97 * fr.f) % 256)
        |   AS BIGINT) AS lum_sum
        |FROM fr, px GROUP BY 1, 2
        |UNION ALL
        |SELECT doc_id, NULL, NULL, NULL, NULL FROM documents
        |WHERE doc_id % 5 = 0""".stripMargin,

    "multimodal_features" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id, 'text/plain' AS mime,
        | CAST(length(text) AS BIGINT) AS n_bytes,
        | CAST(16 AS BIGINT) AS feat_dim,
        | strlen(text) > 0 AS feat_nonzero
        |FROM documents""".stripMargin,

    "multimodal_frames" ->
      """WITH d AS (
        | SELECT CAST(doc_id AS BIGINT) AS media_id, strlen(text) AS nb
        | FROM documents WHERE strlen(text) > 0),
        |f AS (SELECT media_id, nb, unnest(range(4)) AS frame_index FROM d)
        |SELECT media_id, CAST(frame_index AS BIGINT) AS frame_index,
        | CAST(8 AS BIGINT) AS frame_dim,
        | least(frame_index * greatest(1, nb // 4), nb)
        |   < least((frame_index + 1) * greatest(1, nb // 4), nb) AS frame_nonzero
        |FROM f""".stripMargin,

    // recursiveChunkSql replay (see its scaladoc): greedy prefix-sum merge
    // with the 30-char back-off window, chunk text a trimmed substring of
    // the document — character-faithful, promoted from golden-pinned to a
    // full oracle in r9.
    "chunk_recursive" ->
      s"""WITH ${recursiveChunkSql("len(trim(text)) > 0")}
         |SELECT doc_id, CAST(chunk_index AS BIGINT) AS chunk_index, chunk
         |FROM rec""".stripMargin,

    // Adaptive = markdown path for the planted %5=0 docs (their header
    // skeleton is fixed, so those four chunks are closed-form) + the
    // recursiveChunkSql replay for the rest; headers null off the
    // markdown path exactly as Chunkers.adaptive emits.
    "chunk_adaptive" ->
      s"""WITH ${recursiveChunkSql("doc_id % 5 <> 0 AND len(trim(text)) > 0")},
         |md AS (
         | SELECT doc_id, u.ci AS chunk_index, u.c AS chunk, u.h1 AS header1
         | FROM documents,
         |  unnest([
         |   {'ci': 1, 'c': 'intro', 'h1': CAST(NULL AS VARCHAR)},
         |   {'ci': 2, 'c': '# A' || chr(10) || text, 'h1': 'A'},
         |   {'ci': 3, 'c': '# B' || chr(10) || 'tail', 'h1': 'B'},
         |   {'ci': 4, 'c': '# C' || chr(10) || 'end', 'h1': 'C'}]) AS t(u)
         | WHERE doc_id % 5 = 0)
         |SELECT doc_id, CAST(chunk_index AS BIGINT) AS chunk_index, chunk,
         | CAST(NULL AS VARCHAR) AS header1, CAST(NULL AS VARCHAR) AS header2,
         | CAST(NULL AS VARCHAR) AS header3
         |FROM rec
         |UNION ALL
         |SELECT doc_id, CAST(chunk_index AS BIGINT), chunk, header1,
         | CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
         |FROM md""".stripMargin,

    // Replays Chunkers.sentences exactly: the Java lookbehind split
    // `(?<=[.!?])\s+` == RE2-safe `regexp_replace('([.!?])\s+' -> '\1<SEP>')`
    // + split on <SEP>; window starts slide by per-overlap=2 and a start
    // s > 1 is emitted only when s < len(sents) (the r7 subset-chunk rule).
    // Full replay of the TextTiling chunker: synthesized 8-word sentences,
    // RE2-safe sentence split, distinct-token-set Jaccard boundary flags
    // (exact integer cross-multiplication inter*4 < union), start-list
    // chunk assembly — every step a list lambda (the chunk_sentences /
    // recursiveChunkSql discipline).
    "chunk_texttiling" ->
      s"""WITH w AS (
         | SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 0) AS toks
         | FROM documents
         | WHERE len(list_filter(string_split(text, ' '), t -> len(t) > 0)) > 0),
         |syn AS (
         | SELECT doc_id, array_to_string(list_transform(
         |   range(0, CAST(floor((len(toks) + 7) / 8) AS INT)),
         |   g -> array_to_string(toks[CAST(g * 8 + 1 AS INT) : CAST(g * 8 + 8 AS INT)], ' ')),
         |  '. ') || '.' AS text
         | FROM w),
         |sp AS (SELECT doc_id, list_filter(list_transform(
         |   string_split(regexp_replace(text, '([.!?])\\s+', '\\1' || chr(1), 'g'), chr(1)),
         |   x -> trim(x)), x -> len(x) > 0) AS sents
         | FROM syn),
         |ts AS (SELECT doc_id, sents, list_transform(sents,
         |   s -> list_distinct(list_filter(string_split(lower(s), ' '), t -> len(t) > 0))) AS tsets
         | FROM sp WHERE len(sents) > 0),
         |bd AS (SELECT doc_id, sents,
         |  CASE WHEN len(sents) > 1 THEN list_transform(range(1, len(sents)), g ->
         |    (len(list_filter(tsets[CAST(g AS INT)],
         |       x -> list_contains(tsets[CAST(g + 1 AS INT)], x))) * 4
         |     < 1 * (len(tsets[CAST(g AS INT)]) + len(tsets[CAST(g + 1 AS INT)])
         |        - len(list_filter(tsets[CAST(g AS INT)],
         |            x -> list_contains(tsets[CAST(g + 1 AS INT)], x))))))
         |   ELSE []::BOOLEAN[] END AS bounds
         | FROM ts),
         |st AS (SELECT doc_id, sents,
         |  list_filter(range(1, len(sents) + 1),
         |    j -> j = 1 OR bounds[CAST(j - 1 AS INT)]) AS starts
         | FROM bd),
         |ch AS (SELECT doc_id, list_transform(range(1, len(starts) + 1), k ->
         |   array_to_string(sents[CAST(starts[CAST(k AS INT)] AS INT) :
         |     CAST(CASE WHEN k < len(starts) THEN starts[CAST(k + 1 AS INT)] - 1
         |          ELSE len(sents) END AS INT)], ' ')) AS chunks
         | FROM st)
         |SELECT doc_id, CAST(i AS BIGINT) AS chunk_index,
         | chunks[CAST(i AS INT)] AS chunk
         |FROM ch, UNNEST(range(1, len(chunks) + 1)) AS u(i)""".stripMargin,

    "chunk_sentences" ->
      s"""WITH d AS (SELECT doc_id, text FROM documents WHERE len(trim(text)) > 0),
         |sp AS (SELECT doc_id,
         |  list_filter(list_transform(
         |    string_split(regexp_replace(text, '([.!?])\\s+', '\\1' || chr(1), 'g'), chr(1)),
         |    x -> trim(x)), x -> len(x) > 0) AS sents
         | FROM d),
         |st AS (SELECT doc_id, sents,
         |  list_filter(range(1, len(sents) + 1, 2), s -> s = 1 OR s < len(sents)) AS starts
         | FROM sp WHERE len(sents) > 0),
         |ch AS (SELECT doc_id,
         |  list_transform(starts, s -> array_to_string(sents[s:s+2], ' ')) AS chunks
         | FROM st)
         |SELECT doc_id, i AS chunk_index, chunks[i] AS chunk
         |FROM ch, UNNEST(range(1, len(chunks) + 1)) AS u(i)""".stripMargin,

    "chunk_markdown" ->
      """WITH n AS (
        | SELECT doc_id, trim(text) AS body FROM documents)
        |SELECT doc_id, CAST(1 AS BIGINT) AS chunk_index,
        | '# Doc ' || doc_id || chr(10) || 'intro' AS chunk,
        | 'Doc ' || doc_id AS header1, CAST(NULL AS VARCHAR) AS header2,
        | CAST(NULL AS VARCHAR) AS header3
        |FROM n
        |UNION ALL
        |SELECT doc_id, CAST(2 AS BIGINT) AS chunk_index,
        | '## Body' || CASE WHEN len(body) = 0 THEN '' ELSE chr(10) || body END AS chunk,
        | 'Doc ' || doc_id AS header1, 'Body' AS header2, CAST(NULL AS VARCHAR) AS header3
        |FROM n
        |UNION ALL
        |SELECT doc_id, CAST(3 AS BIGINT) AS chunk_index,
        | '### Notes' || chr(10) || 'tail' AS chunk,
        | 'Doc ' || doc_id AS header1, 'Body' AS header2, 'Notes' AS header3
        |FROM n""".stripMargin,

    // -- wave 3 ----------------------------------------------------------

    "link_triangles" ->
      """WITH ids AS (SELECT doc_id FROM documents),
        |raw AS (
        | SELECT doc_id AS src, doc_id + 1 AS dst FROM ids WHERE doc_id % 7 < 3
        | UNION ALL
        | SELECT doc_id, doc_id + 2 FROM ids WHERE doc_id % 5 < 2
        | UNION ALL
        | SELECT doc_id, doc_id + 3 FROM ids WHERE doc_id % 11 = 0),
        |e AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |      FROM raw WHERE src <> dst AND dst IN (SELECT doc_id FROM ids)),
        |deg AS (SELECT id, COUNT(*) AS degree
        |        FROM (SELECT u AS id FROM e UNION ALL SELECT v FROM e)
        |        GROUP BY id),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |        FROM e e1
        |        JOIN e e2 ON e2.u = e1.u AND e1.v < e2.v
        |        JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
        |per AS (SELECT id, COUNT(*) AS triangles
        |        FROM (SELECT a AS id FROM tri UNION ALL
        |              SELECT b FROM tri UNION ALL SELECT c FROM tri)
        |        GROUP BY id)
        |SELECT deg.id AS doc_id, deg.degree,
        | COALESCE(per.triangles, 0) AS triangles,
        | CASE WHEN deg.degree > 1
        |   THEN round(2.0 * COALESCE(per.triangles, 0) /
        |        (deg.degree * (deg.degree - 1)), 6)
        |   ELSE 0.0 END AS clustering
        |FROM deg LEFT JOIN per ON per.id = deg.id""".stripMargin,

    "l_diversity" ->
      """SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        | CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS n_sensitive,
        | count(DISTINCT user_id) >= 5 AS l_diverse
        |FROM events GROUP BY 1, 2""".stripMargin,

    "event_anomaly_mad" -> anomalyMadSql,
    "streaming_anomaly" -> anomalyMadSql,

    // k-core: 6 unrolled synchronous peel rounds over the wave-3 planted
    // graph (degree -> qualify -> semi-filter both endpoints), mirroring
    // Graph.kCore's loop exactly.
    "link_kcore" -> {
      val rounds = (1 to 6).map { r =>
        s"""d$r AS MATERIALIZED (SELECT id, count(*) AS degree FROM (
           |  SELECT u AS id FROM e${r - 1} UNION ALL SELECT v FROM e${r - 1})
           |  GROUP BY id),
           |q$r AS MATERIALIZED (SELECT id FROM d$r WHERE degree >= 2),
           |e$r AS MATERIALIZED (SELECT e.u, e.v FROM e${r - 1} e
           |  JOIN q$r qu ON qu.id = e.u JOIN q$r qv ON qv.id = e.v)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH ids AS MATERIALIZED (SELECT doc_id FROM documents),
         |raw AS (
         | SELECT doc_id AS src, doc_id + 1 AS dst FROM ids WHERE doc_id % 7 < 3
         | UNION ALL
         | SELECT doc_id, doc_id + 2 FROM ids WHERE doc_id % 5 < 2
         | UNION ALL
         | SELECT doc_id, doc_id + 3 FROM ids WHERE doc_id % 11 = 0),
         |e0 AS MATERIALIZED (
         |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
         |  FROM raw JOIN ids ON ids.doc_id = raw.dst WHERE src <> dst),
         |$rounds
         |SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS core_degree
         |FROM (SELECT u AS id FROM e6 UNION ALL SELECT v FROM e6)
         |GROUP BY id""".stripMargin
    },

    "tail_index" ->
      """WITH top AS (SELECT CAST(n_chars AS DOUBLE) AS x FROM documents
        |  WHERE n_chars > 0 ORDER BY x DESC LIMIT 101),
        |s AS (SELECT count(*) AS n, min(x) AS xt, sum(ln(x)) AS slog FROM top)
        |SELECT CAST(n - 1 AS BIGINT) AS k, round(xt, 6) AS x_tail,
        | round((slog - n * ln(xt)) / (n - 1), 6) AS gamma,
        | CASE WHEN slog - n * ln(xt) > 0
        |   THEN round((n - 1) / (slog - n * ln(xt)), 6) END AS alpha
        |FROM s""".stripMargin,

    "source_lang_mi" ->
      """WITH joint AS (SELECT CAST(source AS VARCHAR) AS a,
        |  CAST(lang AS VARCHAR) AS b, CAST(count(*) AS BIGINT) AS c
        | FROM documents GROUP BY 1, 2),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_cells, sum(c) AS nr
        |        FROM joint),
        |ma AS (SELECT a, sum(c) AS ca FROM joint GROUP BY 1),
        |mb AS (SELECT b, sum(c) AS cb FROM joint GROUP BY 1),
        |ea AS (SELECT CAST(count(*) AS BIGINT) AS n_a,
        |        -sum((ca / nr) * ln(ca / nr)) AS ha FROM ma, tot),
        |eb AS (SELECT CAST(count(*) AS BIGINT) AS n_b,
        |        -sum((cb / nr) * ln(cb / nr)) AS hb FROM mb, tot),
        |mi AS (SELECT sum(c * (ln(CAST(c AS DOUBLE)) + ln(CAST(nr AS DOUBLE))
        |         - ln(CAST(ca AS DOUBLE)) - ln(CAST(cb AS DOUBLE)))) AS misum
        |       FROM joint JOIN ma USING (a) JOIN mb USING (b), tot)
        |SELECT tot.n_cells, ea.n_a, eb.n_b, CAST(tot.nr AS BIGINT) AS n_rows,
        | round(ea.ha, 6) AS h_a, round(eb.hb, 6) AS h_b,
        | round(mi.misum / tot.nr, 6) AS mi_nats,
        | CASE WHEN least(ea.ha, eb.hb) > 0
        |   THEN round((mi.misum / tot.nr) / least(ea.ha, eb.hb), 6)
        |   ELSE 0.0 END AS mi_norm
        |FROM tot, ea, eb, mi""".stripMargin,

    "weighted_sample" ->
      """WITH h AS (SELECT doc_id, n_chars,
        |  substr(md5(CAST(doc_id AS VARCHAR) || 'wsamp'), 1, 4) AS hx
        | FROM documents WHERE n_chars > 0),
        |u AS (SELECT doc_id, n_chars,
        |  ((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 4096 +
        |   (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 256 +
        |   (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16 +
        |   (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) + 1) / 65536.0 AS uu
        | FROM h)
        |SELECT doc_id, n_chars FROM u
        |ORDER BY pow(uu, 1.0 / n_chars) DESC, doc_id
        |LIMIT 100""".stripMargin,

    "group_reservoir" ->
      """SELECT lang, doc_id FROM (
        | SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
        |   ORDER BY md5(CAST(doc_id AS VARCHAR) || 'graft'), doc_id) AS rn
        | FROM documents) WHERE rn <= 20""".stripMargin,

    "quality_deciles" -> {
      s"""WITH $qualitySqlCtes,
         |pos AS (SELECT q.doc_id, q.quality, d.n_chars,
         |  row_number() OVER (ORDER BY q.quality, q.doc_id) - 1 AS p,
         |  count(*) OVER () AS nn
         | FROM qscore q JOIN documents d USING (doc_id))
         |SELECT CAST((p * 10) // nn AS INTEGER) AS decile,
         | CAST(count(*) AS BIGINT) AS n,
         | min(quality) AS min_q, max(quality) AS max_q,
         | round(avg(n_chars), 6) AS mean_chars
         |FROM pos GROUP BY 1""".stripMargin
    },

    "readability" ->
      s"""WITH c AS (SELECT doc_id,
         |  CAST(len($toksSql) AS BIGINT) AS n_words,
         |  CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
         |    AS n_sents,
         |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
         |    AS n_syll
         | FROM documents)
         |SELECT doc_id, n_words, n_sents, n_syll,
         | round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
         |   - 84.6 * (CAST(n_syll AS DOUBLE) / n_words), 6) AS reading_ease,
         | round(0.39 * (CAST(n_words AS DOUBLE) / n_sents)
         |   + 11.8 * (CAST(n_syll AS DOUBLE) / n_words) - 15.59, 6) AS fk_grade
         |FROM c WHERE n_words > 0""".stripMargin,

    "dup_ngrams" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |ng AS (SELECT doc_id, array_to_string(toks[i:i+4], ' ') AS ngram
         |       FROM tk, UNNEST(range(1, len(toks) - 3)) AS u(i)
         |       WHERE len(toks) >= 5)
         |SELECT ngram, CAST(count(*) AS BIGINT) AS n_occ,
         | CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         |FROM ng GROUP BY 1 HAVING count(*) >= 2
         |ORDER BY n_occ DESC, ngram LIMIT 50""".stripMargin,

    "winsorize_events" ->
      """WITH f AS (SELECT event_type,
        |  round(quantile_cont(value, 0.05), 6) AS lo,
        |  round(quantile_cont(value, 0.95), 6) AS hi
        | FROM events GROUP BY 1),
        |j AS (SELECT e.event_type, e.value AS v, f.lo, f.hi,
        |  greatest(least(e.value, f.hi), f.lo) AS w
        | FROM events e JOIN f USING (event_type))
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_clipped_lo,
        | CAST(sum(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_clipped_hi,
        | min(lo) AS fence_lo, min(hi) AS fence_hi,
        | round(CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
        |   AS mean_raw,
        | round(CAST(sum(CAST(w AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
        |   AS mean_winsorized
        |FROM j GROUP BY 1""".stripMargin,

    "pii_luhn" ->
      """WITH c AS (SELECT doc_id,
        |  lpad(CAST(doc_id AS VARCHAR), 16, '4') AS ca,
        |  '5' || lpad(CAST((doc_id * 7919) % 1000000000 AS VARCHAR), 15, '0')
        |    AS cb
        | FROM documents)
        |SELECT doc_id,
        | list_aggregate(list_transform(range(1, 17), i ->
        |   CASE WHEN (16 - i) % 2 = 1
        |     THEN CASE WHEN CAST(substr(ca, CAST(i AS INT), 1) AS INT) * 2 > 9
        |       THEN CAST(substr(ca, CAST(i AS INT), 1) AS INT) * 2 - 9
        |       ELSE CAST(substr(ca, CAST(i AS INT), 1) AS INT) * 2 END
        |     ELSE CAST(substr(ca, CAST(i AS INT), 1) AS INT) END),
        |   'sum') % 10 = 0 AS luhn_a,
        | list_aggregate(list_transform(range(1, 17), i ->
        |   CASE WHEN (16 - i) % 2 = 1
        |     THEN CASE WHEN CAST(substr(cb, CAST(i AS INT), 1) AS INT) * 2 > 9
        |       THEN CAST(substr(cb, CAST(i AS INT), 1) AS INT) * 2 - 9
        |       ELSE CAST(substr(cb, CAST(i AS INT), 1) AS INT) * 2 END
        |     ELSE CAST(substr(cb, CAST(i AS INT), 1) AS INT) END),
        |   'sum') % 10 = 0 AS luhn_b
        |FROM c""".stripMargin,

    "anchor_text" ->
      """WITH l AS (SELECT doc_id,
        |  'https://site' || (doc_id % 11) || '.example.com/' AS href,
        |  'anchor ' || lang || ' ' || (doc_id % 3) AS anchor
        | FROM documents)
        |SELECT href AS target, CAST(count(*) AS BIGINT) AS n_links,
        | CAST(count(DISTINCT doc_id) AS BIGINT) AS n_sources,
        | array_to_string(list_sort(list_distinct(list(anchor)))[1:10], ' | ')
        |   AS anchors
        |FROM l GROUP BY 1""".stripMargin,

    "chunk_cdc" ->
      s"""WITH $cdcSqlCtes
         |SELECT doc_id, CAST(k AS BIGINT) AS chunk_index,
         | CAST(starts[CAST(k AS INT)] AS BIGINT) AS start_pos,
         | CAST(ends[CAST(k AS INT)] - starts[CAST(k AS INT)] + 1 AS BIGINT)
         |   AS chunk_len,
         | substr(text, CAST(starts[CAST(k AS INT)] AS INT),
         |   CAST(ends[CAST(k AS INT)] - starts[CAST(k AS INT)] + 1 AS INT))
         |   AS chunk
         |FROM c, UNNEST(range(1, len(starts) + 1)) AS u(k)
         |WHERE ends[CAST(k AS INT)] >= starts[CAST(k AS INT)]""".stripMargin,

    "dedup_cdc_containment" ->
      s"""WITH $cdcSqlCtes,
         |ch AS (SELECT DISTINCT doc_id, md5(substr(text,
         |   CAST(starts[CAST(k AS INT)] AS INT),
         |   CAST(ends[CAST(k AS INT)] - starts[CAST(k AS INT)] + 1 AS INT)))
         |   AS fp
         | FROM c, UNNEST(range(1, len(starts) + 1)) AS u(k)
         | WHERE ends[CAST(k AS INT)] >= starts[CAST(k AS INT)]),
         |keepfp AS (SELECT fp FROM ch GROUP BY fp HAVING count(*) <= 50),
         |fch AS (SELECT ch.doc_id, ch.fp FROM ch JOIN keepfp USING (fp)),
         |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nfp
         |       FROM fch GROUP BY 1),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |   CAST(count(*) AS BIGINT) AS shared
         | FROM fch a JOIN fch b ON a.fp = b.fp AND a.doc_id < b.doc_id
         | GROUP BY 1, 2 HAVING count(*) >= 2)
         |SELECT p.id_a, p.id_b, p.shared, sa.nfp AS nfp_a, sb.nfp AS nfp_b,
         | round(CAST(p.shared AS DOUBLE) / least(sa.nfp, sb.nfp), 6)
         |   AS containment
         |FROM p
         |JOIN sz sa ON sa.doc_id = p.id_a
         |JOIN sz sb ON sb.doc_id = p.id_b
         |WHERE round(CAST(p.shared AS DOUBLE) / least(sa.nfp, sb.nfp), 6)
         |  >= 0.4""".stripMargin
  ) ++ opqRefinedOracle

  /** Min-reachable-id closure over the planted pair graph — ONE oracle for
    * the from-scratch closure (`dedup_components`) and the star-compressed
    * incremental fold (`dedup_components_incremental`).
    */
  private val componentsSql: String =
    """WITH RECURSIVE ids AS (SELECT doc_id FROM documents),
      |e0 AS (
      | SELECT doc_id AS src, doc_id + 1 AS dst FROM ids WHERE doc_id % 7 < 3
      | UNION ALL
      | SELECT doc_id, doc_id + 3 FROM ids WHERE doc_id % 11 = 0),
      |ek AS (SELECT src, dst FROM e0 WHERE dst IN (SELECT doc_id FROM ids)),
      |edges AS (SELECT src, dst FROM ek UNION SELECT dst, src FROM ek),
      |reach(id, comp) AS (
      | SELECT DISTINCT src, src FROM edges
      | UNION
      | SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id)
      |SELECT id AS doc_id, CAST(min(comp) AS BIGINT) AS component
      |FROM reach GROUP BY id""".stripMargin

  /** The planted two-version SCD2 build as DuckDB CTEs ending at
    * `hist(doc_id, fp, valid_from, valid_to, is_current)` — shared by
    * `scd2_history` and `scd2_lookup`.
    */
  private val scd2SqlCtes: String =
    """newsnap AS (SELECT doc_id, sha256(text) AS fp, TRUE AS in_new
      |  FROM documents),
      |oldsnap AS (
      | SELECT doc_id,
      |  CASE WHEN doc_id % 5 = 2 THEN sha256(text || 'old') ELSE sha256(text) END AS fp,
      |  TRUE AS in_old
      | FROM documents WHERE doc_id % 5 <> 4
      | UNION ALL
      | SELECT doc_id + 1000000, sha256(text), TRUE FROM documents WHERE doc_id % 50 = 0),
      |j AS (
      | SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, o.fp AS ofp, n.fp AS nfp,
      |  o.in_old, n.in_new
      | FROM oldsnap o FULL OUTER JOIN newsnap n ON o.doc_id = n.doc_id),
      |hist AS (
      | SELECT doc_id, ofp AS fp, CAST(1 AS BIGINT) AS valid_from,
      |  CAST(2 AS BIGINT) AS valid_to, FALSE AS is_current
      | FROM j WHERE in_old IS NOT NULL
      |  AND (in_new IS NULL OR ofp IS DISTINCT FROM nfp)
      | UNION ALL
      | SELECT doc_id, nfp, CAST(2 AS BIGINT), CAST(NULL AS BIGINT), TRUE
      | FROM j WHERE in_old IS NULL
      |  OR (in_new IS NOT NULL AND ofp IS DISTINCT FROM nfp)
      | UNION ALL
      | SELECT doc_id, ofp, CAST(1 AS BIGINT), CAST(NULL AS BIGINT), TRUE
      | FROM j WHERE in_old IS NOT NULL AND in_new IS NOT NULL
      |  AND ofp IS NOT DISTINCT FROM nfp)""".stripMargin

  /** Exact median/MAD daily-count anomaly flags — ONE oracle for both the
    * batch gate (`event_anomaly_mad`) and the streaming execution of the
    * same semantics (`streaming_anomaly`), the `sessionWindowSql`
    * discipline.
    */
  private val anomalyMadSql: String =
    """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |  CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
      |med AS (SELECT event_type, quantile_cont(n, 0.5) AS m
      |        FROM daily GROUP BY 1),
      |ad AS (SELECT daily.event_type, daily.day, daily.n, med.m
      |       FROM daily JOIN med USING (event_type)),
      |mad AS (SELECT event_type, quantile_cont(abs(n - m), 0.5) AS md
      |        FROM ad GROUP BY 1)
      |SELECT ad.event_type, ad.day, ad.n,
      | round(ad.m, 6) AS med_v, round(mad.md, 6) AS mad_v,
      | abs(ad.n - ad.m) > 3.0 * mad.md AS is_outlier
      |FROM ad JOIN mad USING (event_type)""".stripMargin

  /** Content-defined chunking CTE chain (DuckDB) ending at
    * `c(doc_id, text, starts, ends)` — byte-identical replay of
    * `Chunkers.contentDefined(window=16, maskBits=6)`: gear table,
    * 16-term windowed sum (generated to match the Spark fold), mask 64.
    * Shared by `chunk_cdc` and `dedup_cdc_containment`.
    */
  private lazy val cdcSqlCtes: String = {
    val gearSum = (0 until 16)
      .map(j => s"gs[CAST(i - $j AS INT)] * ${1L << j}")
      .mkString(" + ")
    s"""t0 AS (SELECT doc_id, text, len(text) AS L FROM documents
       |  WHERE len(text) >= 1),
       |g AS (SELECT doc_id, text, L,
       |  list_transform(range(1, L + 1), p ->
       |    (ascii(substr(text, CAST(p AS INT), 1)) * 2654435761) % 65536)
       |    AS gs
       | FROM t0),
       |b AS (SELECT doc_id, text, L,
       |  list_filter(range(16, L + 1),
       |    i -> (($gearSum) % 65536) % 64 = 0) AS bs
       | FROM g),
       |c AS (SELECT doc_id, text,
       |  list_prepend(CAST(1 AS BIGINT), list_transform(bs, x -> x + 1))
       |    AS starts,
       |  list_append(bs, CAST(L AS BIGINT)) AS ends
       | FROM b)""".stripMargin
  }
}
