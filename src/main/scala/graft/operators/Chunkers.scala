package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextSplitters
import graft.functions.TextSplitters.MdChunk

/** DataFrame-level chunking operators: 1->N flatMap transforms expressed as
  * (UDF returning array) + `posexplode`, so chunking runs partition-parallel
  * inside a single narrow stage — no shuffle, no driver materialization
  * (unlike the reference, which gathers every document on the driver and fans
  * out to a local process pool, `yamlpipe/core/pipeline.py:53-79`).
  *
  * Contract preserved from the reference (`yamlpipe/components/chunkers.py`):
  *  - empty/whitespace docs produce no chunks (`chunkers.py:70-74,113-117`)
  *  - `chunk_index` is 1-based and dense per document (`chunkers.py:82`)
  *  - markdown chunks carry "Header 1/2/3" path metadata
  *    (`chunkers.py:122-128`)
  *  - adaptive dispatch heuristic: >=2 of "\n# "/"\n## "/"\n### "
  *    (`chunkers.py:161-171`)
  */
object Chunkers {

  private val recursiveUdf =
    udf((text: String, size: Int, overlap: Int) =>
      TextSplitters.recursiveSplit(text, size, overlap))

  private val markdownUdf =
    udf((text: String) =>
      TextSplitters.markdownSplit(text).map(c => (c.content, c.headers)))

  private val adaptiveUdf =
    udf((text: String, size: Int, overlap: Int) =>
      TextSplitters.adaptiveSplit(text, size, overlap).map(c => (c.content, c.headers)))

  /** Output columns every chunker adds; inputs must not already carry them. */
  private val reservedOut = Seq("chunk", "chunk_index", "headers")

  private def requireNoCollision(df: DataFrame, produced: Seq[String]): Unit = {
    val clash = df.columns.toSet.intersect(produced.toSet)
    require(clash.isEmpty,
      s"chunker output column(s) ${clash.mkString(", ")} already exist in the input; rename them first")
  }

  /** Recursive-character chunking. Input: a DataFrame with `textCol`.
    * Output: one row per chunk with `chunk` (text) and `chunk_index`
    * (1-based); all other columns carried through.
    */
  def recursive(df: DataFrame, textCol: String, chunkSize: Int = 100, chunkOverlap: Int = 20): DataFrame = {
    requireNoCollision(df, Seq("chunk", "chunk_index"))
    Partitioning.ensureParallelism(df).select(
        col("*"),
        posexplode(recursiveUdf(col(textCol), lit(chunkSize), lit(chunkOverlap)))
          .as(Seq("__graft_pos", "chunk")))
      .withColumn("chunk_index", col("__graft_pos") + 1)
      .drop("__graft_pos")
  }

  /** Markdown-header chunking. Adds `chunk`, `chunk_index`, and a `headers`
    * map column ("Header 1" -> ...).
    */
  def markdown(df: DataFrame, textCol: String): DataFrame = {
    requireNoCollision(df, reservedOut)
    Partitioning.ensureParallelism(df).select(
        col("*"),
        posexplode(markdownUdf(col(textCol))).as(Seq("__graft_pos", "__graft_c")))
      .withColumn("chunk", col("__graft_c._1"))
      .withColumn("headers", col("__graft_c._2"))
      .withColumn("chunk_index", col("__graft_pos") + 1)
      .drop("__graft_pos", "__graft_c")
  }

  private val sentencesUdf = udf((text: String, per: Int, overlap: Int) => {
    if (text == null) Seq.empty[String]
    else {
      val sents = text.split("(?<=[.!?])\\s+").map(_.trim).filter(_.nonEmpty).toSeq
      if (sents.isEmpty) Seq.empty[String]
      else {
        val step = math.max(1, per - overlap)
        // A window starting at i > 0 only reaches NEW content when it
        // extends past its predecessor's coverage, which ends at i + overlap
        // (predecessor starts at i - step and spans per = step + overlap).
        // Without the guard a short trailing window can be a strict subset
        // of the previous chunk (per=3, overlap=1 over 5 sentences: windows
        // [0..2], [2..4], [4] — the last duplicates content into the RAG
        // index; r7 advice fix).
        (0 until sents.length by step)
          .filter(i => i == 0 || i + overlap < sents.length)
          .map(i => sents.slice(i, i + per).mkString(" "))
      }
    }
  })

  /** Sentence-window chunking — the RAG "sentence window" strategy the
    * character chunkers can't express: segment at sentence boundaries
    * (`[.!?]` + whitespace), emit windows of `sentencesPerChunk` sentences
    * sliding by `sentencesPerChunk - overlapSentences`. Trailing windows
    * may be short (standard sliding semantics). Same narrow
    * UDF + posexplode shape as the other chunkers — zero shuffles.
    * (No SQL oracle: the boundary regex needs lookbehind, absent from
    * RE2 — pinned by TextSplittersSpec goldens like `chunk_recursive`.)
    */
  def sentences(df: DataFrame, textCol: String, sentencesPerChunk: Int = 5,
                overlapSentences: Int = 1): DataFrame = {
    require(sentencesPerChunk > 0, "sentencesPerChunk must be positive")
    require(overlapSentences >= 0 && overlapSentences < sentencesPerChunk,
      "overlapSentences must be in [0, sentencesPerChunk)")
    requireNoCollision(df, Seq("chunk", "chunk_index"))
    Partitioning.ensureParallelism(df).select(
        col("*"),
        posexplode(sentencesUdf(col(textCol), lit(sentencesPerChunk),
          lit(overlapSentences))).as(Seq("__graft_pos", "chunk")))
      .withColumn("chunk_index", col("__graft_pos") + 1)
      .drop("__graft_pos")
  }

  /** Lexical-cohesion topic chunking (TextTiling, Hearst CL 1997 — the
    * deterministic core of "semantic chunking": modern pipelines swap the
    * cohesion signal for embedding cosine, the boundary rule is the same):
    * segment at sentence boundaries, then start a NEW chunk at every gap
    * whose adjacent-sentence lexical cohesion falls below
    * `cohesionNum / cohesionDen` — cohesion is the Jaccard similarity of
    * the two sentences' distinct lowercase token sets, and the threshold
    * compare is exact integer cross-multiplication
    * (`inter * den < num * union`), so no float-ceil boundary can disagree
    * across engines. A topic shift (low word overlap) breaks the chunk;
    * cohesive runs stay together regardless of length.
    *
    * Pure codegen'd HOF expressions end to end (the CDC chunker's
    * discipline): sentence split is the RE2-safe
    * `replace "([.!?])\s+" -> "\1<SEP>"` + split (the exact equivalence
    * the chunk_sentences oracle already relies on), boundaries and chunk
    * assembly are array lambdas — no UDF, no shuffle, fully SQL-replayable
    * (gate `chunk_texttiling`). Empty/whitespace docs produce no chunks;
    * `chunk_index` is 1-based and dense.
    */
  def textTiling(df: DataFrame, textCol: String,
                 cohesionNum: Long = 1, cohesionDen: Long = 4): DataFrame = {
    require(cohesionNum >= 0 && cohesionDen > 0,
      s"cohesion threshold must be a non-negative rational, " +
        s"got $cohesionNum/$cohesionDen")
    requireNoCollision(df, Seq("chunk", "chunk_index"))
    val sep = ""
    val sents = filter(
      transform(split(regexp_replace(col(textCol), "([.!?])\\s+", "$1" + sep),
        java.util.regex.Pattern.quote(sep)), s => trim(s)),
      s => length(s) > 0)
    val chunksOf = {
      val tsets = transform(col("__sents"),
        s => array_distinct(filter(split(lower(s), " "), t => length(t) > 0)))
      val n = size(col("__sents"))
      // boundary flag per gap g (1..n-1): Jaccard(T_g, T_{g+1}) < num/den,
      // cross-multiplied in exact integers.
      val bounds = when(n > 1, transform(sequence(lit(1), n - 1), g => {
        val a = element_at(col("__tsets"), g)
        val b = element_at(col("__tsets"), g + 1)
        val inter = size(array_intersect(a, b)).cast("long")
        val uni = size(a).cast("long") + size(b).cast("long") - inter
        inter * lit(cohesionDen) < lit(cohesionNum) * uni
      })).otherwise(array().cast("array<boolean>"))
      val starts = filter(sequence(lit(1), n),
        j => (j === 1) || element_at(col("__bounds"), j - 1))
      val chunks = transform(sequence(lit(1), size(col("__starts"))), k => {
        val s = element_at(col("__starts"), k)
        val e = when(k < size(col("__starts")),
          element_at(col("__starts"), k + 1) - 1).otherwise(n)
        array_join(slice(col("__sents"), s, e - s + 1), " ")
      })
      (tsets, bounds, starts, chunks)
    }
    Partitioning.ensureParallelism(df)
      .withColumn("__sents", sents)
      .filter(size(col("__sents")) > 0)
      .withColumn("__tsets", chunksOf._1)
      .withColumn("__bounds", chunksOf._2)
      .withColumn("__starts", chunksOf._3)
      .select(col("*"),
        posexplode(chunksOf._4).as(Seq("__graft_pos", "chunk")))
      .withColumn("chunk_index", (col("__graft_pos") + 1).cast("long"))
      .drop("__graft_pos", "__sents", "__tsets", "__bounds", "__starts")
  }

  /** Adaptive chunking: per-row dispatch between markdown and recursive based
    * on the reference heuristic; single pass, no branching plans.
    */
  def adaptive(df: DataFrame, textCol: String, chunkSize: Int = 100, chunkOverlap: Int = 20): DataFrame = {
    requireNoCollision(df, reservedOut)
    Partitioning.ensureParallelism(df).select(
        col("*"),
        posexplode(adaptiveUdf(col(textCol), lit(chunkSize), lit(chunkOverlap)))
          .as(Seq("__graft_pos", "__graft_c")))
      .withColumn("chunk", col("__graft_c._1"))
      .withColumn("headers", col("__graft_c._2"))
      .withColumn("chunk_index", col("__graft_pos") + 1)
      .drop("__graft_pos", "__graft_c")
  }

  /** Content-defined chunking (CDC) — boundaries placed where a rolling
    * hash of the last `window` characters hits a mask, NOT at fixed
    * offsets. The property that matters for dedup: inserting or deleting
    * a byte only reshuffles the chunks NEAR the edit — every boundary
    * more than `window` chars away re-synchronizes, so byte-level
    * near-duplicate detection over chunk fingerprints survives edits that
    * shift all fixed-size chunk frames (the rsync/LBFS/FastCDC idea).
    *
    * This variant keeps the hash STRICTLY windowed (a position's
    * boundary-ness depends on exactly the `window` chars ending there,
    * gear table `G(c) = c·2654435761 mod 2^16`, weight `2^j`, mask
    * `2^maskBits`): no min/max clamping, hence no sequential dependency —
    * every position decides independently, the whole operator is pure
    * codegen'd HOF expressions (no UDF, unlike the reference's chunkers),
    * and the boundary rule is replayable in plain SQL. Expected chunk
    * length is `2^maskBits` chars. Empty docs produce no chunks;
    * `chunk_index` is 1-based and dense (a boundary AT the final char
    * would produce an empty tail chunk — dropped, index still dense).
    *
    * Scale shape: narrow generator stage end to end — O(window) work per
    * char, no shuffle, no driver involvement.
    */
  def contentDefined(df: DataFrame, textCol: String, idCol: String,
                     window: Int = 16, maskBits: Int = 6): DataFrame = {
    require(window >= 2 && window <= 64, "window must be in [2, 64]")
    require(maskBits >= 1 && maskBits <= 20, "maskBits must be in [1, 20]")
    requireNoCollision(df, Seq("chunk", "chunk_index", "start_pos", "chunk_len"))
    val t = col(textCol)
    val len = length(t)
    val gs = when(len >= 1,
        transform(sequence(lit(1), len),
          p => (ascii(t.substr(p, lit(1))).cast("long") * 2654435761L) % 65536L))
      .otherwise(array().cast("array<bigint>"))
    val idxs = when(len >= window, sequence(lit(window), len))
      .otherwise(array().cast("array<int>"))
    val mask = 1L << maskBits
    val bs = filter(idxs, i => {
      val h = (0 until window).map { j =>
        element_at(col("__gs"), (i - lit(j)).cast("int")) * lit(1L << j)
      }.reduce(_ + _) % 65536L
      (h % mask) === 0L
    })
    val starts = concat(array(lit(1)), transform(col("__bs"), b => b + 1))
    val ends = concat(col("__bs"), array(len))
    val chunks = zip_with(starts, ends,
      (st, en) => struct(st.as("s"), (en - st + 1).as("l"),
        t.substr(st, greatest(en - st + 1, lit(0))).as("c")))
    Partitioning.ensureParallelism(df)
      .withColumn("__gs", gs)
      .withColumn("__bs", bs)
      .select(col("*"), posexplode(chunks).as(Seq("__pos", "__ck")))
      .filter(col("__ck.l") > 0)
      .withColumn("chunk_index", (col("__pos") + 1).cast("long"))
      .withColumn("start_pos", col("__ck.s").cast("long"))
      .withColumn("chunk_len", col("__ck.l").cast("long"))
      .withColumn("chunk", col("__ck.c"))
      .drop("__gs", "__bs", "__pos", "__ck")
  }
}
