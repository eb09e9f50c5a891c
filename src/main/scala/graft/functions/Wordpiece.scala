package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece-family tokenizer: greedy longest-match-first segmentation
  * against a corpus-derived substring vocabulary — the inference algorithm
  * of BERT-style tokenizers, complementing [[Bpe]]'s merge-rule family
  * (BPE segments by replaying learned merges; WordPiece segments by
  * longest known piece at each position, per-character UNK fallback).
  *
  * Everything is deterministic and engine-replayable: the vocabulary is
  * top-V substrings by (weighted count DESC, piece ASC) and the greedy
  * walk has no data-dependent tie (at each position exactly one longest
  * in-vocab piece exists or none).
  *
  * Scale shape: vocabulary building shuffles (distinct words) then
  * (substring, count) partial aggregates — both vocab-bounded, never
  * corpus-row-bounded past the first tokenize. The greedy walk runs ONCE
  * per DISTINCT word (the [[Bpe.trainMerges]] vocab-table discipline) with
  * the V-piece set broadcast in the UDF closure; per-document stats are a
  * broadcast join of the word-stats table back onto the exploded corpus.
  */
object Wordpiece {

  /** Top-`vocabSize` substrings (length <= `maxPieceLen`) of the
    * whitespace-lowercase tokens, weighted by token occurrence count;
    * substring occurrences inside a word count with multiplicity. Returns
    * (piece, total) ordered by (total DESC, piece ASC).
    */
  def vocabulary(df: DataFrame, textCol: String, vocabSize: Int = 200,
                 maxPieceLen: Int = 6): DataFrame = {
    require(vocabSize > 0 && maxPieceLen > 0, "vocabSize/maxPieceLen must be positive")
    val toks = filter(split(lower(col(textCol)), " "), x => length(x) > 0)
    val words = df.select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val pieces = flatten(transform(sequence(lit(1), length(col("w"))), i =>
      transform(sequence(lit(1), least(lit(maxPieceLen), length(col("w")) - i + 1)),
        l => col("w").substr(i, l))))
    words.select(col("cnt"), explode(pieces).as("piece"))
      .groupBy("piece").agg(sum(col("cnt")).as("total"))
      .orderBy(col("total").desc, col("piece").asc)
      .limit(vocabSize)
  }

  /** Per-document WordPiece stats under the corpus-derived vocabulary:
    * `(idCol, n_words, n_pieces, n_unk)`. Docs with no tokens report
    * zeros. The greedy segmentation: at each position take the longest
    * vocab piece (<= `maxPieceLen`); if none matches, emit one UNK piece
    * and advance one character.
    */
  def docStats(df: DataFrame, textCol: String, idCol: String,
               vocabSize: Int = 200, maxPieceLen: Int = 6): DataFrame = {
    // V is bounded by construction — the collect is the same driver-side
    // model-table pattern as KMeans centroids / BPE merge rules.
    val vocabSet = vocabulary(df, textCol, vocabSize, maxPieceLen)
      .collect().map(_.getString(0)).toSet
    val maxLen = maxPieceLen
    val greedy = udf((w: String) => {
      var pos = 0; var nPieces = 0L; var nUnk = 0L
      while (pos < w.length) {
        var l = math.min(maxLen, w.length - pos)
        var found = 0
        while (l >= 1 && found == 0) {
          if (vocabSet.contains(w.substring(pos, pos + l))) found = l
          else l -= 1
        }
        nPieces += 1
        if (found == 0) { nUnk += 1; pos += 1 } else pos += found
      }
      (nPieces, nUnk)
    })
    val toks = filter(split(lower(col(textCol)), " "), x => length(x) > 0)
    val exploded = df.select(col(idCol), explode(toks).as("w"))
    val wordStats = exploded.select("w").distinct()
      .select(col("w"), greedy(col("w")).as("__s"))
      .select(col("w"), col("__s._1").as("__p"), col("__s._2").as("__u"))
    val agg = exploded.join(broadcast(wordStats), "w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__p")).as("n_pieces"),
        sum(col("__u")).as("n_unk"))
    df.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        coalesce(col("n_unk"), lit(0L)).as("n_unk"))
  }
}
