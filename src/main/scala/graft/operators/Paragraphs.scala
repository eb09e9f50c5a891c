package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Paragraph-level exact deduplication — the boilerplate-removal step of a
  * web-scale curation pipeline (RefinedWeb/C4 style): a paragraph that
  * recurs across many documents (cookie banners, nav headers, license
  * footers) carries no training signal and is stripped from EVERY document,
  * while document-unique paragraphs survive in place.
  *
  * No direct reference counterpart (the reference stops at whole-document
  * fingerprints, `yamlpipe/utils/state_manager.py:140-151`); this is the
  * finer-grained sibling of [[Dedup.exactGroups]].
  *
  * Scale shape:
  *   1. split + posexplode: narrow, no shuffle;
  *   2. paragraph counts: groupBy on `md5(paragraph)` — the shuffle carries
  *      32-char digests, never paragraph text; map-side partial agg makes
  *      the shuffled row count ≤ distinct-paragraphs-per-partition;
  *   3. count join back on the digest: the count table is
  *      distinct-paragraph-sized; AQE broadcasts it when it fits, shuffles
  *      otherwise;
  *   4. reassembly: one groupBy on the doc id (collect kept paragraphs,
  *      sort by position, join with the separator).
  * Two shuffles of the exploded corpus total (digest, then doc id) — the
  * same budget as a word-count. No collect, no UDF, no all-pairs anything.
  */
object Paragraphs {

  val Separator = "\n\n"

  /** Explode `textCol` into trimmed non-empty paragraphs:
    * `(idCol, pos, para)` with `pos` the 0-based paragraph position.
    * Documents with no non-empty paragraph emit nothing.
    */
  def explodeParagraphs(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), posexplode(split(col(textCol), "\n\n+")).as(Seq("pos", "para")))
      .withColumn("para", trim(col("para")))
      .filter(length(col("para")) > 0)

  /** Strip every paragraph that occurs at least `minRepeats` times across
    * the corpus (counting one occurrence per appearance, including repeats
    * inside one document), and reassemble each document from its surviving
    * paragraphs in original order.
    *
    * Emits one row per input document that had at least one non-empty
    * paragraph: `(idCol, text, n_kept, n_dropped)` — `text` is the
    * reassembled document (empty string when everything was boilerplate).
    *
    * Occurrence equality is exact on the trimmed paragraph via its md5
    * digest (a 128-bit collision over a corpus is vanishingly unlikely and
    * at worst drops a unique paragraph as boilerplate — the same tradeoff
    * every hash-keyed dedup in [[Dedup]] makes).
    */
  def removeBoilerplate(df: DataFrame, textCol: String, idCol: String,
                        minRepeats: Long): DataFrame = {
    require(minRepeats >= 2, "graft.Paragraphs: minRepeats must be >= 2 " +
      "(1 would drop every paragraph)")
    val paras = explodeParagraphs(df, textCol, idCol)
      .withColumn("__h", md5(col("para")))
    val counts = paras.groupBy(col("__h")).agg(count(lit(1)).as("__n"))
    val kept: Column = col("__n") < minRepeats
    paras.join(counts, "__h")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(when(kept, struct(col("pos"), col("para"))))),
            s => s("para")),
          Separator).as("text"),
        count(when(kept, 1)).as("n_kept"),
        count(when(!kept, 1)).as("n_dropped"))
  }
}
