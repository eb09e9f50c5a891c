package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.TextAnalysis

/** SQL registration for the engine's scalar surface: every per-row signal
  * the library exposes as a Column becomes a `graft_*` SQL function, so a
  * pure-SQL user (`spark.sql(...)`, Thrift server, notebook SQL cells) can
  * run the curation expressions without touching the Scala API. The Column
  * trees are built once per call site from the SAME definitions the
  * operators use — no duplicate formulas to drift.
  *
  * Register per session with [[GraftFunctions.register]] or fleet-wide via
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` (which now
  * installs these alongside `graft_cosine` / `approx_top_items`).
  */
object GraftFunctions {

  private def unary(name: String, doc: String)(f: Column => Column)
    : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    val builder: Seq[Expression] => Expression = { children =>
      require(children.length == 1, s"$name expects 1 argument")
      GraftSqlBridge.resolvableExpression(f(GraftSqlBridge.column(children.head)))
    }
    (FunctionIdentifier(name),
      new ExpressionInfo(GraftFunctions.getClass.getName, null, name, doc, ""),
      builder)
  }

  private def binary(name: String, doc: String)(f: (Column, Column) => Column)
    : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    val builder: Seq[Expression] => Expression = { children =>
      require(children.length == 2, s"$name expects 2 arguments")
      GraftSqlBridge.resolvableExpression(f(GraftSqlBridge.column(children.head),
        GraftSqlBridge.column(children(1))))
    }
    (FunctionIdentifier(name),
      new ExpressionInfo(GraftFunctions.getClass.getName, null, name, doc, ""),
      builder)
  }

  /** The registry: one entry per scalar signal. */
  private[plans] val all = Seq(
    unary("graft_quality",
      "_FUNC_(text) - heuristic document quality score in [0,1]")(
      TextAnalysis.qualityScore),
    unary("graft_lang_id",
      "_FUNC_(text) - marker-based language guess (en/de/fr/es/unknown)")(
      TextAnalysis.langId),
    unary("graft_redact_pii",
      "_FUNC_(text) - text with emails/IPv4s/SSNs/phones replaced by tags")(
      TextAnalysis.redactPii),
    unary("graft_bpe_count",
      "_FUNC_(text) - BPE-ish token count (alpha runs <=4, digit runs, symbols)")(
      TextAnalysis.bpeTokens),
    unary("graft_bpe_merge_count",
      "_FUNC_(text) - exact BPE token count under the pinned merge table")(
      graft.functions.Bpe.count),
    unary("graft_url_canonical",
      "_FUNC_(url) - canonical URL (case, default ports, fragments, tracking params)")(
      graft.functions.UrlFunctions.canonicalizeUrl),
    unary("graft_url_domain",
      "_FUNC_(url) - registered domain of the URL's host")(
      graft.functions.UrlFunctions.registeredDomain),
    unary("graft_rolling_hash",
      "_FUNC_(text) - 64-bit rolling-hash document fingerprint (long)")(
      TextAnalysis.rollingHash),
    unary("graft_char_entropy",
      "_FUNC_(text) - character-level Shannon entropy in bits/char (double)")(
      TextAnalysis.charEntropy),
    unary("graft_strip_html",
      "_FUNC_(html) - tags/scripts/entities stripped to text")(
      TextFunctions.stripHtml),
    unary("graft_clean_text",
      "_FUNC_(text) - Unicode NFC canonicalization: control/zero-width " +
        "strip, typographic->ASCII punctuation, whitespace collapse")(
      c => graft.functions.Normalize.cleanText(c)),
    unary("graft_fix_mojibake",
      "_FUNC_(text) - repair UTF-8-as-cp1252 mojibake (ftfy-style ordered " +
        "replace chain over the top ~34 sequences)")(
      c => graft.functions.Mojibake.fixMojibake(c)),
    unary("graft_l2_norm",
      "_FUNC_(vec) - L2 norm of a float/double array in double")(
      VectorFunctions.l2Norm),
    binary("graft_dot",
      "_FUNC_(a, b) - dot product of two float/double arrays in double")(
      VectorFunctions.dotProduct))

  /** Register every `graft_*` scalar in the session's function registry. */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    CosineSimilarityExpr.register(spark)
    AggRegistration.register(spark)
  }
}
