package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring deduplication at span granularity: find every `w`-token
  * window that occurs more than once in the corpus, keep its FIRST
  * occurrence (lexicographic (doc, position) order), and remove all later
  * occurrences from their documents — the span-level companion of whole-doc
  * dedup ([[Dedup.exactDedup]]) and the remove-side of the flag-only
  * [[Dedup.duplicationDensity]] signal. (The single-machine formulation
  * builds a corpus suffix array; the windowed-fingerprint form below is the
  * standard shuffle-friendly equivalent for fixed span length.)
  *
  * Scale shape:
  *   1. ONE corpus scan emits (doc, start, fingerprint) per window — the
  *      fingerprint is `md5` of the window string, projected BEFORE the
  *      shuffle so window text never moves;
  *   2. first-occurrence winners: min (doc, start) struct per fingerprint,
  *      map-side combined; duplicated-window survivors join back at
  *      fingerprint granularity (the vocabulary-scale shuffle inherent to
  *      any corpus-global statistic);
  *   3. per-doc interval merge (gaps-and-islands over a doc-partitioned
  *      window) shuffles only the duplicated spans — tiny by construction;
  *   4. text reconstruction joins the merged spans back to the corpus on
  *      doc id and strips token ranges in one narrow pass per document.
  */
object SpanDedup {

  /** All `w`-token windows of `text` in order (NOT distinct — position is
    * identity here). Shares [[Dedup.spaceTokens]]/[[Dedup.wordWindows]], the
    * single definition of the tokenizer + window contract.
    */
  private[graft] val windowsUdf = udf((text: String, w: Int) =>
    Dedup.wordWindows(Dedup.spaceTokens(text), w).toSeq)

  /** Merged token spans `[span_start, span_end)` to REMOVE per document:
    * every `w`-token window whose content appears elsewhere in the corpus
    * (or earlier in the same document), minus each content's single
    * first-occurrence winner, with overlapping/adjacent windows coalesced.
    */
  def duplicateSpans(df: DataFrame, textCol: String, idCol: String,
                     w: Int = 50): DataFrame = {
    val wins = Partitioning.ensureParallelism(df)
      .select(col(idCol),
        posexplode(windowsUdf(col(textCol), lit(w))).as(Seq("__start", "__win")))
      .select(col(idCol), col("__start"), md5(col("__win")).as("__fp"))
    // One aggregate yields both the dup test (count) and the winner (min
    // struct): windows are identified by (doc, start), so the min struct is
    // the global first occurrence.
    val firsts = wins.groupBy(col("__fp")).agg(
      count(lit(1)).as("__n"),
      min(struct(col(idCol), col("__start"))).as("__first"))
    val marked = wins.join(firsts.filter(col("__n") >= 2), "__fp")
      .filter(!(col(idCol) === col(s"__first.$idCol") &&
        col("__start") === col("__first.__start")))
      .select(col(idCol), col("__start"), (col("__start") + w).as("__end"))
    // Gaps-and-islands merge: a window starts a new island when it begins
    // after everything seen so far ends.
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("__start"), col("__end"))
    val prevMax = max(col("__end"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    marked
      .withColumn("__island",
        sum(when(col("__start") > coalesce(prevMax, lit(Long.MinValue)), 1)
          .otherwise(0)).over(byDoc))
      .groupBy(col(idCol), col("__island"))
      .agg(min(col("__start")).cast("long").as("span_start"),
        max(col("__end")).cast("long").as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"))
  }

  /** Strip token ranges from text: one pass per document over the tokens,
    * keeping every token outside all of its `[start, end)` spans. Tokens
    * are re-joined with single spaces (the tokenizer's normal form — the
    * operator contract is token-level, not byte-level).
    */
  private[graft] val stripSpansUdf =
    udf((text: String, spans: Seq[org.apache.spark.sql.Row]) => {
      if (text == null) null
      else {
        val toks = Dedup.spaceTokens(text)
        if (spans == null || spans.isEmpty) toks.mkString(" ")
        else {
          val ranges = spans.map(r => (r.getLong(0), r.getLong(1)))
          val sb = new java.lang.StringBuilder()
          var i = 0
          while (i < toks.length) {
            if (!ranges.exists(r => i >= r._1 && i < r._2)) {
              if (sb.length > 0) sb.append(' ')
              sb.append(toks(i))
            }
            i += 1
          }
          sb.toString
        }
      }
    })

  /** The full dedup: documents with every duplicated `w`-token span (except
    * its corpus-wide first occurrence) removed. Output: `(id, clean_text,
    * removed_tokens)`. The merged span table is collected PER DOCUMENT into
    * an array column (spans per doc are few by construction — they cover at
    * most the document itself) and joined back on doc id only.
    */
  def removeDuplicateSpans(df: DataFrame, textCol: String, idCol: String,
                           w: Int = 50): DataFrame = {
    val spans = duplicateSpans(df, textCol, idCol, w)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans"),
        sum(col("span_end") - col("span_start")).as("__removed"))
    df.join(spans, Seq(idCol), "left")
      .select(col(idCol),
        stripSpansUdf(col(textCol), col("__spans")).as("clean_text"),
        coalesce(col("__removed"), lit(0L)).as("removed_tokens"))
  }
}
