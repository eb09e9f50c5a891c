package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the most recent
  * right row with `right.ts <= left.ts` within the same key — the canonical
  * time-series enrichment (latest price at trade time, last login before an
  * event, feature value as of a training example's timestamp).
  *
  * Spark has no native ASOF JOIN; the naive range join
  * (`l.ts >= r.ts` + window-max) explodes to |L|x|R| per key. This is the
  * union trick instead: tag both sides, union, ONE shuffle on
  * (key, ts, side), and a running `last_value(ignoreNulls)` window carries
  * the latest right payload forward onto each left row. Cost is a single
  * sort-shuffle of |L|+|R| rows — the same shape at 100 TB, with keys
  * hash-distributed across the cluster and no skew beyond the key
  * distribution itself.
  *
  * Right rows must be unique per (key, ts) — pre-aggregate if not — which
  * also makes results engine-deterministic (DuckDB's native ASOF JOIN picks
  * the greatest ts <= left.ts; unique ts makes that row unique).
  */
object AsofJoin {

  /** Left as-of join. `valueCols` are the right-side payload columns to
    * carry; left rows with no prior right row get NULLs (LEFT semantics).
    * Ties (right.ts == left.ts) match — the "at or before" contract.
    */
  def leftAsof(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
               valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // Tag sides; right sorts before left at equal ts so ties are visible.
    val l = left.withColumn("__side", lit(1))
    // Wrap the right payload in ONE struct per right row. The struct is
    // non-null for every right row even when individual payload fields are
    // NULL, so `last(ignoreNulls)` picks the most recent right ROW — a
    // per-column last() would skip genuine NULL payloads and resurrect an
    // older value, diverging from DuckDB ASOF JOIN semantics.
    val r = right.select((keyCol +: tsCol +: valueCols).map(col): _*)
      .withColumn("__r_payload", struct(valueCols.map(col): _*))
      .select(col(keyCol), col(tsCol), col("__r_payload"))
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn(
      "__asof_payload", last(col("__r_payload"), ignoreNulls = true).over(w))
    val out = filled.filter(col("__side") === 1)
    // getField addresses the struct member by name without parsing, so
    // payload columns containing dots/backticks resolve correctly.
    out.select(
      leftCols.map(col) ++
        valueCols.map(c => col("__asof_payload").getField(c).as(c)): _*)
  }
}
