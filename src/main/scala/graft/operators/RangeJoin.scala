package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range join: match point rows to interval rows
  * (`start <= point <= end`), optionally within a key.
  *
  * Spark plans a raw range predicate as BroadcastNestedLoopJoin (or a
  * cartesian product) — O(|P| x |I|) compares. This operator instead
  * overlays a fixed grid: every interval is exploded to the buckets it
  * overlaps, every point maps to exactly one bucket, and the join key
  * becomes (key, bucket) — an ordinary hash equi-join whose cost scales
  * with true overlap density, then the exact range predicate re-filters.
  * Identical results to the naive join for any bucket width; width tunes
  * the replication factor (intervals span ~len/width buckets) against
  * bucket collision width.
  */
object RangeJoin {

  /** Join `points` (with `pointCol`) to `intervals` (with `startCol`,
    * `endCol`, inclusive ends) on `start <= p <= end`, both sides also
    * matching on `keyCol`. All range columns are numeric (long). Inner
    * semantics: unmatched points drop.
    *
    * `broadcastIntervals`: when the interval side is dimension-sized
    * (calendars, SLA windows), broadcasting it makes the whole join a
    * narrow stage over the (usually much larger) point side — no shuffle
    * at all. `Some(false)` forces the shuffle equi-join. The default
    * (`None`) decides ADAPTIVELY from Catalyst's size estimate of the
    * interval side against `broadcastThresholdBytes`: interval sets that
    * grow with the data (sessions at 100x) exceed the threshold and take
    * the scale-safe shuffle path; true dimensions stay broadcast. This
    * keeps a fixed `Some(true)` from turning into an unbounded driver-side
    * collect as the data grows.
    *
    * COST NOTE: the adaptive default runs one small agg job over the
    * interval side AT PLAN-CONSTRUCTION TIME (to measure the explode
    * replication) whenever the byte estimate is under the threshold. If
    * the interval side has an expensive lineage or the join is re-planned
    * repeatedly, pass an explicit `Some(...)` to skip it.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keyCol: String, pointCol: String,
                      startCol: String, endCol: String,
                      bucketWidth: Long,
                      broadcastIntervals: Option[Boolean] = None,
                      broadcastThresholdBytes: Long = 10L << 20): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val exploded = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        floor(col(endCol) / bucketWidth).cast("long"))))
    val doBroadcast = broadcastIntervals.getOrElse {
      // The broadcast hint bypasses AQE's own size checks, and explode
      // replicates each interval by ~len/width — UNBOUNDED by the byte
      // estimate (a 5 MB table of month-long intervals at 1-hour buckets
      // explodes ~720x into a multi-GB relation). So gate on the
      // POST-explosion size: if the un-exploded side is already under the
      // threshold it is cheap to measure the true replication factor with
      // one tiny agg job, and only broadcast when size x replication still
      // fits.
      val preSize = intervals.queryExecution.optimizedPlan.stats.sizeInBytes
      preSize <= broadcastThresholdBytes && {
        val repl = Option(intervals
            .select(avg((col(endCol) - col(startCol)) / bucketWidth + 1))
            .first().get(0))
          .map(_.asInstanceOf[Double]).getOrElse(1.0)
        BigDecimal(preSize) * math.max(1.0, repl) <= BigDecimal(broadcastThresholdBytes)
      }
    }
    val ivals = if (doBroadcast) broadcast(exploded) else exploded
    val pts = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    pts.join(ivals, Seq(keyCol, "__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Interval-OVERLAP join (range x range): pairs where
    * `[ls, le]` and `[rs, re]` intersect (inclusive ends). Same grid
    * overlay as [[pointInInterval]], with the classic dedup trick: a pair
    * sharing several grid cells is emitted only from the cell containing
    * the OVERLAP START (`greatest(ls, rs)`) — a narrow post-join filter,
    * so no distinct shuffle is ever needed. No nested loop at any size;
    * cost scales with true overlap density x replication (~len/width per
    * side). Column names must be disjoint across the two inputs.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      leftStart: String, leftEnd: String,
                      rightStart: String, rightEnd: String,
                      bucketWidth: Long,
                      keyCols: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def cells(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__cell", explode(sequence(
        floor(col(s) / bucketWidth).cast("long"),
        floor(col(e) / bucketWidth).cast("long"))))
    val l = cells(left, leftStart, leftEnd)
    val r = cells(right, rightStart, rightEnd)
    l.join(r, keyCols :+ "__cell")
      .filter(col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd))
      .filter(col("__cell") ===
        floor(greatest(col(leftStart), col(rightStart)) / bucketWidth).cast("long"))
      .drop("__cell")
  }
}
