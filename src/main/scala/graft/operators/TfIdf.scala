package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-wide TF-IDF: per-document term weights against global document
  * frequencies, and the top-k characteristic terms per document. The
  * classic keyword-extraction / topic-fingerprinting step of a training-
  * data pipeline (and the first corpus-global text statistic the engine
  * exposes — everything in [[TextAnalysis]] is per-row).
  *
  * Smoothed formula: `tf * (ln((N + 1) / (df + 1)) + 1)` — never divides
  * by zero, never goes negative.
  *
  * Scale shape (all aggregates map-side combined):
  *   1. explode tokens -> groupBy(doc, term): shuffle on (doc, term);
  *   2. groupBy(term) over the already-distinct (doc, term) pairs: a plain
  *      count, shuffle of the term vocabulary only;
  *   3. doc-frequency join back on term: vocabulary-sized build side — AQE
  *      broadcasts it when it fits, shuffles otherwise;
  *   4. top-k per doc: row_number window on doc — one shuffle, then an
  *      early rank filter.
  * N (corpus size) is a 1-row aggregate, broadcast. No collect, no UDF.
  */
object TfIdf {

  /** Per-(doc, term) TF-IDF scores: `doc, term, tf, doc_freq, cf, tfidf`
    * (`cf` = corpus-wide collection frequency of the term). `tfidf` is
    * rounded to 6 decimals so downstream rankings are stable across
    * platforms.
    *
    * `cf` also serves a plan purpose: because the doc-frequency aggregate
    * consumes `tf` (not just the bare term column), Catalyst cannot prune
    * it down to a distinct-(doc, term) subtree — both sides of the
    * frequency join share the IDENTICAL scan→explode→partial-agg→shuffle
    * subtree, which ReusedExchange then executes ONCE. Without it the
    * corpus is scanned and exploded twice.
    */
  def score(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val terms = df.select(col(idCol),
      explode(TextAnalysis.toks(col(textCol))).as("term"))
    val tf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("doc_freq"), sum(col("tf")).as("cf"))
    val nDocs = df.agg(count(lit(1)).as("__n_docs"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * (log((col("__n_docs") + lit(1)).cast("double") /
          (col("doc_freq") + lit(1))) + lit(1.0)), 6))
      .select(col(idCol), col("term"), col("tf"), col("doc_freq"), col("cf"),
        col("tfidf"))
  }

  /** Top-`k` terms per document by TF-IDF (ties broken by term, so the
    * result is deterministic): `doc, term, tf, doc_freq, cf, tfidf, rank`.
    */
  def topTerms(df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    score(df, textCol, idCol)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
