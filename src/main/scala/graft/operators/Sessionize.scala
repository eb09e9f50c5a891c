package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization of event streams: group a user's events into sessions
  * separated by inactivity gaps — the standard first step of behavioral /
  * training-log analytics over the `events` table.
  *
  * Two formulations with identical results, picked by execution mode:
  *  - BATCH: gaps-and-islands over window functions (lag -> new-session flag
  *    -> running sum). One shuffle on the user key; sessions of one user
  *    never cross partitions, so the plan scales with users, not events.
  *  - STREAMING: the built-in `session_window` aggregation (incremental
  *    state merge under a watermark) for always-on pipelines.
  *
  * Timestamps are long nanoseconds (the `events.parquet` ts encoding under
  * `spark.sql.legacy.parquet.nanosAsLong=true`) so the arithmetic is exact
  * integer math in both Spark and the DuckDB oracle.
  */
object Sessionize {

  /** Tag each event with its 1-based `session_index` within the user:
    * a session breaks when the gap to the previous event exceeds `gapNanos`.
    * Tie timestamps land in the same session regardless of intra-tie order,
    * so per-session aggregates are deterministic even with duplicate ts.
    */
  def tagSessions(events: DataFrame, userCol: String, tsCol: String,
                  gapNanos: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    events
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull || col(tsCol) - col("__prev_ts") > gapNanos, 1)
          .otherwise(0))
      .withColumn("session_index",
        sum(col("__new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev_ts", "__new_session")
  }

  /** Per-session aggregate: event count, start/end (nanos), exact value sum.
    * The session key reuses the user-key shuffle from [[tagSessions]] —
    * Catalyst plans the window + groupBy as a single exchange on `userCol`.
    */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   gapNanos: Long, valueCol: String = "value"): DataFrame =
    tagSessions(events, userCol, tsCol, gapNanos)
      .groupBy(col(userCol), col("session_index"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ns"),
        max(col(tsCol)).as("end_ns"),
        sum(col(valueCol).cast("decimal(28,6)")).cast("double").as("sum_value"))

  /** Streaming/batch sessionization via the built-in `session_window`
    * aggregation over a real timestamp column: incremental state, watermark
    * `delay` bounds lateness. Results per (user, session) match
    * [[sessionStats]] when the gap and inputs agree.
    */
  def streamingSessionStats(events: DataFrame, userCol: String, tsCol: String,
                            gap: String, delay: String = "10 minutes",
                            valueCol: String = "value"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark(tsCol, delay) else events
    withWm
      .groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(28,6)")).cast("double").as("sum_value"))
      .select(col(userCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))
  }
}
