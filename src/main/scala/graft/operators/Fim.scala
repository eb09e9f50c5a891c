package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fill-in-the-middle (FIM) training-example transformation (Bavarian et
  * al. 2022; character-level variant as in open code-model pipelines,
  * e.g. SantaCoder): rewrite a fraction of documents as
  * `prefix / middle / suffix` permutations with sentinel tokens so an
  * autoregressive model learns infilling from ordinary left-to-right
  * training.
  *
  *  - A deterministic per-document draw (md5 hex-prefix fraction, the
  *    [[Sampling.keepRow]] machinery) decides whether a doc is
  *    transformed at all (`fimRate`) and, among transformed docs, which
  *    get SPM order instead of PSM (`spmRate` — the paper trains a mix).
  *  - The two split points are md5-derived uniform positions in
  *    `[0, len]` (two independent 32-bit hex windows reduced mod len+1,
  *    order-normalized), so the same corpus always yields the same
  *    examples and a SQL oracle replays every character of the output.
  *  - PSM: `<PRE> prefix <SUF> suffix <MID> middle`; SPM:
  *    `<SUF> suffix <PRE> prefix <MID> middle` (the sentinel strings are
  *    parameters — swap in tokenizer-specific sentinels downstream).
  *    Untransformed docs pass through as mode `none` with `fim_text` =
  *    the original text, so the output column feeds packing directly.
  *
  * One narrow codegen'd projection — no UDF, no shuffle, survives any
  * partitioning; work is O(corpus bytes).
  */
object Fim {

  /** Add `fim_mode` (`psm` / `spm` / `none`) and `fim_text` columns. */
  def transform(df: DataFrame, textCol: String, idCol: String,
                fimRate: Double = 0.5, spmRate: Double = 0.5,
                preTok: String = "<PRE>", midTok: String = "<MID>",
                sufTok: String = "<SUF>",
                salt: String = "graft-fim"): DataFrame = {
    require(fimRate >= 0.0 && fimRate <= 1.0, s"fimRate in [0,1], got $fimRate")
    require(spmRate >= 0.0 && spmRate <= 1.0, s"spmRate in [0,1], got $spmRate")
    val text = col(textCol)
    val len = length(text)
    val h = md5(concat(col(idCol).cast("string"), lit(salt)))
    // Two independent uniform positions in [0, len] from disjoint 32-bit
    // hex windows; mod (len+1) admits the empty prefix/suffix/middle
    // edges the paper keeps.
    def pos(from: Int): Column =
      (conv(substring(h, from, 8), 16, 10).cast("long") % (len + 1)).cast("int")
    val (p1, p2) = (pos(1), pos(9))
    val lo = least(p1, p2)
    val hi = greatest(p1, p2)
    val prefix = text.substr(lit(1), lo)
    val middle = text.substr(lo + 1, hi - lo)
    val suffix = text.substr(hi + 1, len - hi)
    // Mode draws: the doc-level fim draw uses hex chars 17-20, the
    // psm/spm draw 21-24 — all windows disjoint from the position hashes.
    def draw(from: Int, rate: Double): Column =
      substring(h, from, Sampling.HexDigits) < lit(Sampling.hexThreshold(rate))
    // A null id nulls the md5 draw; coalesce pins it to false so the row
    // passes through as mode `none` instead of falling through every
    // when() branch to a null-text psm (the document would silently
    // vanish from the training mix).
    val isFim = coalesce(draw(17, fimRate), lit(false)) && text.isNotNull
    val isSpm = draw(21, spmRate)
    val psm = concat(lit(preTok), prefix, lit(sufTok), suffix, lit(midTok), middle)
    val spm = concat(lit(sufTok), suffix, lit(preTok), prefix, lit(midTok), middle)
    df.withColumn("fim_mode",
        when(!isFim, lit("none")).when(isSpm, lit("spm")).otherwise(lit("psm")))
      .withColumn("fim_text",
        when(!isFim, text).when(isSpm, spm).otherwise(psm))
  }
}
