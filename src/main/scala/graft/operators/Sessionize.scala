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
  * Timestamps are exact integer longs in ONE unit chosen by the caller —
  * the engine's convention is epoch MICROSECONDS ([[EventTime.tsMicros]]),
  * which is lossless for the fixture encodings and matches DuckDB's native
  * timestamp precision — so the arithmetic is exact integer math in both
  * Spark and the oracle.
  */
object Sessionize {

  /** Tag each event with its 1-based `session_index` within the user:
    * a session breaks when the gap to the previous event exceeds `gap`
    * (same unit as `tsCol`). Tie timestamps land in the same session
    * regardless of intra-tie order, so per-session aggregates are
    * deterministic even with duplicate ts.
    */
  def tagSessions(events: DataFrame, userCol: String, tsCol: String,
                  gap: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    events
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull || col(tsCol) - col("__prev_ts") > gap, 1)
          .otherwise(0))
      .withColumn("session_index",
        sum(col("__new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev_ts", "__new_session")
  }

  /** Per-session aggregate: event count, start/end (micros by the engine's
    * convention), exact value sum. The session key reuses the user-key
    * shuffle from [[tagSessions]] — Catalyst plans the window + groupBy as
    * a single exchange on `userCol`.
    */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   gap: Long, valueCol: String = "value"): DataFrame =
    tagSessions(events, userCol, tsCol, gap)
      .groupBy(col(userCol), col("session_index"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_us"),
        max(col(tsCol)).as("end_us"),
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
