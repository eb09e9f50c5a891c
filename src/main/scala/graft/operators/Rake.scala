package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RAKE keyphrase extraction (Rose et al., 2010, "Automatic Keyword
  * Extraction from Individual Documents") — the per-document companion to
  * [[TfIdf.topTerms]] (corpus-global single terms) and the collocation PMI
  * gate (corpus-global bigrams): RAKE surfaces multi-word phrases from ONE
  * document with no corpus statistics at all, which is what a
  * metadata-enrichment pass wants while documents stream through.
  *
  * Algorithm: candidate phrases are maximal runs of non-stopword tokens
  * (stopwords/delimiters split, never appear in output); each word scores
  * `deg(w)/freq(w)` within the document (deg = summed length of the
  * phrases each occurrence sits in — co-occurrence degree; freq =
  * occurrence count), and a phrase scores the sum over its word
  * occurrences. Long phrases of rare-but-clustered words win — the RAKE
  * bias toward technical multi-word terms.
  *
  * Determinism: word scores lift to exact integer micro-units
  * (`round(deg * 1e6 / freq)` — one fixed division of exact integers, then
  * a half-up round to integer), phrase scores are INTEGER sums of those,
  * and the output score is the single exact division by 1e6. No float
  * accumulation anywhere, so summation order cannot drift an ulp
  * (the bitext-margin lesson). Ties rank by phrase text.
  *
  * Scale shape: everything is per-document — posexplode, a gaps-and-islands
  * window partitioned by doc, two (doc, word) aggregates, one top-k window
  * per doc. Shuffles are all keyed by doc (+word); no corpus-global state,
  * no collect, no UDF — the whole pipeline is codegen'd expressions and
  * windows.
  */
object Rake {

  /** The fixed delimiter vocabulary: a deliberately small, stable English
    * function-word list (RAKE quality is insensitive to the exact list;
    * determinism and oracle parity require it be FIXED). Kept sorted for
    * readability; membership is what matters.
    */
  val Stopwords: Seq[String] = Seq(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "from",
    "if", "in", "is", "it", "of", "on", "or", "that", "the", "this", "to",
    "was", "were", "with")

  /** Top-`k` RAKE keyphrases per document:
    * `(id, phrase, n_words, score, rank)` with `score` in exact 1e-6
    * units. Duplicate phrase texts within a document collapse to one row
    * (they share words, hence score); documents whose every token is a
    * stopword produce no rows.
    */
  def keyphrases(df: DataFrame, textCol: String, idCol: String,
                 k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // (doc, pos, tok) for content tokens only; islands of consecutive
    // positions (pos - dense content rank) are the candidate phrases, and
    // (doc, island) is the phrase-OCCURRENCE key everything downstream
    // joins on.
    val toks = df.select(col(idCol),
      posexplode(TextAnalysis.toks(col(textCol))).as(Seq("__pos", "__tok")))
      .filter(!col("__tok").isin(Stopwords: _*))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val islands = toks
      .withColumn("__grp", col("__pos") - row_number().over(byDoc))
    // One row per phrase occurrence, keeping the ordered word list.
    val phrases = islands
      .groupBy(col(idCol), col("__grp"))
      .agg(array_sort(collect_list(struct(col("__pos"), col("__tok"))))
        .as("__ws"))
      .select(col(idCol), col("__grp"),
        transform(col("__ws"), w => w("__tok")).as("__words"))
      .withColumn("__plen", size(col("__words")))
    // Word stats over phrase occurrences: freq = occurrences, deg = summed
    // length of containing phrases (each occurrence contributes its
    // phrase's length — the standard RAKE degree), lifted to micro-units.
    val occWords = phrases.select(col(idCol), col("__grp"), col("__plen"),
      concat_ws(" ", col("__words")).as("phrase"),
      explode(col("__words")).as("__w"))
    val stats = occWords.groupBy(col(idCol), col("__w"))
      .agg(count(lit(1)).as("__freq"), sum(col("__plen")).as("__deg"))
      .withColumn("__wu",
        round(col("__deg") * lit(1000000L) / col("__freq"), 0).cast("long"))
    // Phrase score = integer sum of member word micro-scores (with
    // multiplicity); identical phrase texts then collapse per doc.
    val phraseScores = occWords
      .join(stats.select(col(idCol), col("__w"), col("__wu")),
        Seq(idCol, "__w"))
      .groupBy(col(idCol), col("__grp"), col("phrase"), col("__plen"))
      .agg(sum(col("__wu")).as("__su"))
      .select(col(idCol), col("phrase"), col("__plen"), col("__su"))
      .distinct()
    val rank = Window.partitionBy(col(idCol))
      .orderBy(col("__su").desc, col("phrase"))
    phraseScores
      .withColumn("rank", row_number().over(rank).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("phrase"), col("__plen").cast("long").as("n_words"),
        round(col("__su").cast("double") / 1000000L, 6).as("score"),
        col("rank"))
  }
}
