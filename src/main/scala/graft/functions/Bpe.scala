package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Byte-pair-encoding token counting against a PINNED merge table — the real
  * thing training pipelines budget with, as opposed to the `~4 chars/token`
  * regex estimate (`TextAnalysis.bpeTokens` / `graft_bpe_count`), which
  * remains the zero-setup approximation.
  *
  * This is the public GPT-2 BPE algorithm (Sennrich et al. 2016 merges;
  * openai/gpt-2 `encoder.py` applies them by rank): a word starts as its
  * character sequence, and the lowest-rank adjacent pair present is merged
  * (leftmost occurrence first) until no pair is in the table. Like a real
  * tokenizer release, the merge table is a pinned ARTIFACT, not code: this
  * one was trained once (standard BPE training — most-frequent pair, ties
  * to the lexicographically smallest — over the deterministic sf0.001
  * documents fixture) and committed. Swapping in a production `merges.txt`
  * is a data change, not a code change.
  *
  * Pre-tokenization follows the repo-wide tokenizer contract (lowercase,
  * split on single spaces, drop empties — `Dedup.spaceTokens`), and words
  * split into Unicode code points, matching how the DuckDB oracle indexes
  * characters. The merge loop applies ONE merge per step; this equals the
  * all-occurrences-per-rank formulation because a merged token can only
  * participate in LATER merges (a rule mentioning it must postdate the rule
  * that created it), so remaining occurrences of the current best rank stay
  * the best until exhausted.
  *
  * Scale shape: a per-row UDF (a justified algorithm kernel, like the
  * minhash signature) with a bounded per-executor word→count memo — corpus
  * word frequencies are Zipfian, so the cache turns the merge loop into a
  * hash lookup for almost every occurrence. Reference capability:
  * `yamlpipe/components/splitters.py` sizes chunks by token counts; this
  * supplies the exact-BPE variant for the packing/budget operators
  * ([[graft.operators.CorpusMix.packToBudget]],
  * [[graft.operators.SequencePack.assignments]] — pass any column computed
  * with [[count]] as their `tokensCol`).
  */
object Bpe {

  /** The pinned merge table, highest priority first. */
  val merges: Vector[(String, String)] = Vector(
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"), ("l", "u"),
    ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"), ("a", "n"), ("c", "an"),
    ("s", "can"), ("c", "o"), ("co", "lu"), ("colu", "m"), ("colum", "n"),
    ("d", "ow"), ("in", "dow"), ("w", "indow"), ("d", "er"), ("or", "der"),
    ("or", "t"), ("s", "ort"), ("par", "t"), ("u", "p"), ("a", "g"),
    ("ag", "g"), ("a", "lu"), ("alu", "e"), ("v", "alue"), ("in", "e"),
    ("l", "ine"), ("e", "y"), ("k", "ey"), ("j", "o"), ("jo", "in"),
    ("g", "e"), ("mer", "ge"), ("er", "y"), ("g", "r"), ("gr", "o"),
    ("gro", "up"), ("q", "u"), ("qu", "ery"), ("c", "t"), ("ct", "or"),
    ("e", "ctor"), ("v", "ector"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("l", "ow"), ("s", "low"), ("a", "m"), ("e", "am"), ("r", "eam"),
    ("st", "ream"), ("f", "i"), ("fi", "l"), ("fil", "t"), ("filt", "er"),
    ("a", "st"), ("f", "ast"), ("at", "c"), ("atc", "h"), ("b", "atch"),
    ("h", "e"), ("par", "k"), ("s", "park"), ("t", "he"), ("a", "b"),
    ("ab", "l"), ("abl", "e"), ("t", "able"), ("a", "l"), ("al", "l"),
    ("m", "all"), ("s", "mall"), ("at", "a"))

  private val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + " " + b, i) }
    m
  }

  /** Encode one word (merge loop over code points); returns the tokens. */
  private[graft] def encodeWord(word: String): Array[String] =
    encodeWith(rank, word)

  private def encodeWith(rank: java.util.HashMap[String, Integer],
                         word: String): Array[String] = {
    var tk: Array[String] = {
      val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        val n = Character.charCount(cp)
        out += word.substring(i, i + n)
        i += n
      }
      out.toArray
    }
    var done = tk.length < 2
    while (!done) {
      var best = Int.MaxValue; var pos = -1; var i = 0
      while (i < tk.length - 1) {
        val r = rank.get(tk(i) + " " + tk(i + 1))
        if (r != null && r < best) { best = r; pos = i }
        i += 1
      }
      if (pos < 0) done = true
      else {
        val out = new Array[String](tk.length - 1)
        System.arraycopy(tk, 0, out, 0, pos)
        out(pos) = tk(pos) + tk(pos + 1)
        System.arraycopy(tk, pos + 2, out, pos + 1, tk.length - pos - 2)
        tk = out
        done = tk.length < 2
      }
    }
    tk
  }

  /** Per-executor word→count memo. Bounded: past the cap new words are
    * counted without caching (results stay identical, only speed changes).
    */
  private val cacheCap = 1 << 16
  private val wordCounts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private def countWord(w: String): Int = {
    val hit = wordCounts.get(w)
    if (hit != null) hit.intValue()
    else {
      val n = encodeWord(w).length
      if (wordCounts.size() < cacheCap) wordCounts.put(w, n)
      n
    }
  }

  // Same contract as Dedup.spaceTokens — lowercase, split ' ', drop empties.
  private def spaceTokens(text: String): Array[String] =
    if (text == null) Array.empty[String]
    else text.toLowerCase(java.util.Locale.ROOT).split(' ').filter(_.nonEmpty)

  private val countUdf = udf((text: String) => {
    var n = 0L
    spaceTokens(text).foreach(w => n += countWord(w))
    n
  })

  private val tokensUdf = udf((text: String) =>
    spaceTokens(text).flatMap(encodeWord).toSeq)

  /** Exact BPE token count of `textCol` under the pinned merge table. */
  def count(textCol: Column): Column = countUdf(textCol)

  /** The BPE token sequence itself (debugging / piece-level consumers). */
  def tokens(textCol: Column): Column = tokensUdf(textCol)

  /** [[count]]/[[tokens]] for an ARBITRARY merge table — e.g. one just
    * produced by [[trainMerges]]; the pinned-table functions above are the
    * special case `tableFor(Bpe.merges)`. No per-executor memo (a freshly
    * trained table is usually applied once; the pinned table is the
    * steady-state hot path).
    */
  final class Table(val table: Vector[(String, String)]) extends Serializable {
    private val rk: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](table.length * 2)
      table.zipWithIndex.foreach { case ((a, b), i) => m.put(a + " " + b, i) }
      m
    }
    private[graft] def encodeWord(word: String): Array[String] = encodeWith(rk, word)
    private lazy val cUdf = udf((text: String) => {
      var n = 0L
      spaceTokens(text).foreach(w => n += encodeWith(rk, w).length)
      n
    })
    private lazy val tUdf = udf((text: String) =>
      spaceTokens(text).flatMap(encodeWith(rk, _)).toSeq)
    def count(textCol: Column): Column = cUdf(textCol)
    def tokens(textCol: Column): Column = tUdf(textCol)
  }

  def tableFor(merges: Seq[(String, String)]): Table = new Table(merges.toVector)

  /** TRAIN a merge table on a corpus — the distributed Sennrich et al. 2016
    * BPE learner (most-frequent adjacent pair wins each round; ties break to
    * the lexicographically smallest `(left, right)` so training is
    * deterministic — exactly how the pinned [[merges]] artifact was built).
    * Returns one row per learned merge: `(rank, lhs, rhs, pair_count)`,
    * rank 1 = first/highest-priority merge; stops early if the vocabulary
    * runs out of adjacent pairs.
    *
    * Scale shape: ONE corpus scan aggregates word frequencies; every later
    * step runs on the vocabulary-sized `(symbols, count)` table — the same
    * reduction every production BPE trainer exploits (corpus size doesn't
    * matter past the word count, and vocabularies are ~millions of rows even
    * at 100 TB, so the per-round shuffle is small). Each round is one
    * pair-count aggregation at a measured shuffle width + a 1-row argmax
    * collect (bounded driver state, like KMeans' centroid updates), then a
    * narrow merge-apply map over the vocab, `localCheckpoint`ed so lineage
    * stays flat across rounds (the [[graft.operators.Components]] pattern).
    * The merge-apply is left-to-right non-overlapping — the same pass
    * `replace` semantics the DuckDB oracle replays.
    */
  def trainMerges(df: org.apache.spark.sql.DataFrame, textCol: String,
                  numMerges: Int): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    require(numMerges > 0, "numMerges must be positive")
    val toks = filter(split(lower(col(textCol)), " "), x => length(x) > 0)
    // NB: `functions.count`, NOT the enclosing object's BPE `count` UDF,
    // which shadows it here.
    var vocab = df.select(explode(toks).as("w"))
      .groupBy("w").agg(org.apache.spark.sql.functions.count(lit(1)).as("cnt"))
      .select(split(col("w"), "").as("syms"), col("cnt"))
      .localCheckpoint()
    val width = graft.operators.Partitioning.iterationWidth(spark, vocab.count())
    val learned = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    graft.operators.Partitioning.withShuffleWidth(spark, width) {
      var k = 1
      var exhausted = false
      while (k <= numMerges && !exhausted) {
        val n = size(col("syms"))
        val best = vocab.filter(n > 1)
          .select(col("cnt"), explode(arrays_zip(
            slice(col("syms"), lit(1), n - 1).as("a"),
            slice(col("syms"), lit(2), n - 1).as("b"))).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("cnt")).as("pc"))
          .orderBy(col("pc").desc, col("a").asc, col("b").asc)
          .limit(1).collect()
        if (best.isEmpty) exhausted = true
        else {
          val a = best(0).getString(0)
          val b = best(0).getString(1)
          learned += ((k, a, b, best(0).getLong(2)))
          val applyMerge = udf((syms: Seq[String]) => {
            val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                out += a + b; i += 2
              } else { out += syms(i); i += 1 }
            }
            out.toSeq
          })
          val next = vocab.select(applyMerge(col("syms")).as("syms"), col("cnt"))
            .localCheckpoint() // flat lineage; superseded rounds are
                               // released by the ContextCleaner
          vocab.unpersist()
          vocab = next
          k += 1
        }
      }
    }
    vocab.unpersist()
    spark.createDataFrame(learned.toSeq)
      .toDF("rank", "lhs", "rhs", "pair_count")
  }
}
