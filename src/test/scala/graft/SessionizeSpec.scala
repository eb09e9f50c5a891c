package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sessionize

/** Sessionization: hand-checked gaps-and-islands semantics plus parity
  * between the batch (window-function) and session_window formulations.
  */
class SessionizeSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("tagSessions breaks exactly on gaps > gap; index is 1-based dense") {
    val gap = 100L
    val events = Seq(
      (1L, 0L), (1L, 50L), (1L, 150L),   // diffs 50, 100 -> same session (<= gap)
      (1L, 251L),                        // diff 101 -> new session
      (2L, 10L), (2L, 500L)              // user 2: two sessions
    ).toDF("user_id", "ts")
    val got = Sessionize.tagSessions(events, "user_id", "ts", gap)
      .select("user_id", "ts", "session_index")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (1L, 0L, 1L), (1L, 50L, 1L), (1L, 150L, 1L), (1L, 251L, 2L),
      (2L, 10L, 1L), (2L, 500L, 2L)))
  }

  test("tie timestamps land in one session with identical aggregates") {
    val events = Seq((1L, 0L, 1.0), (1L, 0L, 2.0), (1L, 300L, 4.0))
      .toDF("user_id", "ts", "value")
    val stats = Sessionize.sessionStats(events, "user_id", "ts", gap = 100L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(5))).toSet
    assert(stats == Set((1L, 2L, 3.0), (2L, 1L, 4.0)))
  }

  test("batch gaps-and-islands matches session_window on real event data") {
    // EventTime normalizes ts to epoch micros for the batch formulation and
    // to a real timestamp for session_window, whichever parquet encoding
    // the fixture carries — both formulations see identical instants.
    val events = graft.operators.EventTime
      .readMicros(spark, "/root/testdata/sf0.001/events.parquet")
      .withColumn("tst", timestamp_micros(col("ts")))
    val gapUs = 1800L * 1000 * 1000

    val batch = Sessionize.sessionStats(
        events.select(col("user_id"), col("ts"), col("value")),
        "user_id", "ts", gapUs)
      .select(col("user_id"), col("start_us"), col("n_events"), col("sum_value"))
    val sw = Sessionize.streamingSessionStats(
        events.select(col("user_id"), col("tst").as("ts"), col("value")),
        "user_id", "ts", gap = "30 minutes")
      .select(col("user_id"), unix_micros(col("session_start")).as("start_us"),
        col("n_events"), col("sum_value"))

    val b = batch.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val s = sw.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(b.nonEmpty && b == s)
  }
}
