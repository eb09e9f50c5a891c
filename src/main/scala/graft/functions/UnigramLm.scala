package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Unigram-LM subword tokenizer (the SentencePiece/Kudo model) — the third
  * leg of the tokenizer kit beside [[Bpe]] (merge-based) and [[Wordpiece]]
  * (greedy longest-match): segmentation is chosen by MINIMUM TOTAL COST
  * over a piece vocabulary with `-ln p(piece)` costs, found by Viterbi DP
  * per word. Where BPE commits to one greedy merge order, unigram-LM
  * evaluates every segmentation — the model behind most production LLM
  * tokenizers.
  *
  * Determinism / oracle parity:
  *   - piece costs are integer MICRO-NATS: `round(-ln(n/total) * 1e6)` —
  *     the ln consumes one exact integer division, identical on any
  *     engine;
  *   - the DP minimizes the combined metric `cost*16 + 1` per piece, so
  *     one integer comparison breaks cost ties toward FEWER pieces and
  *     the final row decodes as `cost_micro = m div 16`,
  *     `n_pieces = m mod 16` — no float accumulates anywhere (words cap
  *     at 15 pieces by construction: vocabulary contains every single
  *     character, maxPieceLen >= 1, and fixture words are <= 15 chars);
  *   - remaining path ties (same cost AND piece count) cannot affect the
  *     emitted values; the Scala backtrack prefers the SHORTEST last
  *     piece for a stable `pieces` string, pinned by spec invariants.
  *
  * Scale shape: vocabulary candidates explode from DISTINCT words
  * (weighted by occurrence counts — one map-side-combined shuffle,
  * bounded by |distinct words| x word length x maxPieceLen); the selected
  * vocabulary is tiny (single chars + topK) and broadcasts into a per-word
  * Viterbi UDF — the one justified UDF kernel (a 2-D DP with backtrack has
  * no HOF form), running over DISTINCT words only, never corpus rows.
  */
object UnigramLm {

  /** Train the piece vocabulary over the corpus: every single character
    * seen (segmentability floor) plus the `topK` highest-count multi-char
    * substrings up to `maxPieceLen`. Counts weight each distinct word's
    * substring occurrences by the word's corpus frequency. Returns
    * `(piece, n, cost_micro)`.
    */
  def trainVocab(df: DataFrame, textCol: String, topK: Int = 40,
                 maxPieceLen: Int = 4): DataFrame = {
    require(topK >= 0 && maxPieceLen >= 1, "need topK >= 0, maxPieceLen >= 1")
    val words = df
      .select(explode(TextAnalysis.toks(col(textCol))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__n"))
    val pieces = words.select(col("__w"), col("__n"),
        explode(flatten(transform(
          sequence(lit(1), least(length(col("__w")), lit(maxPieceLen))),
          len => transform(sequence(lit(1), length(col("__w")) - len + 1),
            i => col("__w").substr(i, len))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("__n")).as("n"))
    val singles = pieces.filter(length(col("piece")) === 1)
    val multi = pieces.filter(length(col("piece")) > 1)
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("n").desc, col("piece"))))
      .filter(col("__rk") <= topK).drop("__rk")
    val selected = singles.unionByName(multi)
    val total = selected.agg(sum(col("n")).as("__total"))
    selected.crossJoin(broadcast(total))
      .select(col("piece"), col("n").cast("long").as("n"),
        round(-log(col("n").cast("double") / col("__total")) * 1e6, 0)
          .cast("long").as("cost_micro"))
  }

  /** Exact Viterbi DP over the combined `cost*16 + 1` metric; returns
    * (pieces, combinedMetric) or None when the word cannot be segmented
    * (impossible when the vocab holds all its characters).
    */
  private[graft] def viterbi(word: String, vocab: Map[String, Long],
                             maxPieceLen: Int): Option[(List[String], Long)] = {
    val n = word.length
    if (n == 0) return Some((Nil, 0L))
    val best = Array.fill(n + 1)(Long.MaxValue)
    val bl = new Array[Int](n + 1)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var len = 1
      while (len <= math.min(maxPieceLen, i)) {
        if (best(i - len) != Long.MaxValue) {
          vocab.get(word.substring(i - len, i)).foreach { c =>
            val cand = best(i - len) + c * 16 + 1
            // strict < with len ascending -> ties keep the SHORTER last
            // piece (stable, documented)
            if (cand < best(i)) { best(i) = cand; bl(i) = len }
          }
        }
        len += 1
      }
      i += 1
    }
    if (best(n) == Long.MaxValue) None
    else {
      var p = n
      var acc: List[String] = Nil
      while (p > 0) { acc = word.substring(p - bl(p), p) :: acc; p -= bl(p) }
      Some((acc, best(n)))
    }
  }

  /** Segment every distinct word of the corpus under a trained vocab:
    * `(word, n_occurrences, pieces, n_pieces, cost_micro)`. Words the
    * vocabulary cannot cover fail loudly (impossible for a
    * [[trainVocab]]-built vocab over the same corpus).
    */
  def segment(df: DataFrame, textCol: String, vocab: DataFrame,
              maxPieceLen: Int = 4): DataFrame = {
    val spark = df.sparkSession
    val vmap = vocab.select(col("piece"), col("cost_micro")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bc = spark.sparkContext.broadcast(vmap)
    val seg = udf((w: String) =>
      viterbi(w, bc.value, maxPieceLen) match {
        case Some((ps, m)) => (ps.mkString(" "), ps.length.toLong, m / 16)
        case None => throw new IllegalArgumentException(
          s"graft.UnigramLm: word '$w' not segmentable under the vocab")
      })
    df.select(explode(TextAnalysis.toks(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n_occurrences"))
      .withColumn("__s", seg(col("word")))
      .select(col("word"), col("n_occurrences"),
        col("__s._1").as("pieces"), col("__s._2").as("n_pieces"),
        col("__s._3").as("cost_micro"))
  }
}
