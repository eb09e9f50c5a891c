package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Event-time normalization for the `events` table.
  *
  * The driver's fixtures have shipped `ts` under two parquet encodings:
  * INT64 TIMESTAMP(NANOS) (which Spark 4 only reads through the
  * `spark.sql.legacy.parquet.nanosAsLong` shim, as raw long nanos) and
  * native `timestamp[us]` (which Spark reads as TIMESTAMP_NTZ). Every
  * event-time operator in the engine does exact integer arithmetic in ONE
  * unit — epoch MICROSECONDS — and this object is the single place that
  * maps either physical encoding onto it, so a fixture regeneration can't
  * break seven gates at once again.
  *
  * The reference's watermark semantics (its ingest cursor over a timestamp
  * column) are unit-agnostic; micros are chosen because they are lossless
  * for the native encoding and DuckDB's `epoch_us()` — the oracle side —
  * is exact at the same precision.
  */
object EventTime {

  /** Microseconds per second/hour/day and the gap/watermark constants the
    * event gates share.
    */
  val MicrosPerSecond: Long = 1000L * 1000
  val HourMicros: Long = 3600L * MicrosPerSecond
  val DayMicros: Long = 24L * HourMicros

  /** Read `events.parquet` with `ts` normalized to epoch micros (long). */
  def readMicros(s: SparkSession, path: String): DataFrame = {
    // Required to read the legacy INT64(NANOS) encoding at all (Spark 4
    // refuses it otherwise); a no-op for the native micros encoding.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tsMicros(s.read.parquet(path), "ts")
  }

  /** Normalize one timestamp-ish column to epoch micros (long), in place.
    * Integer `div` for the nanos case (double math loses precision above
    * 2^53); `timestampdiff` for NTZ so the conversion is machine- and
    * session-timezone independent (NTZ values are UTC wall-clock in the
    * fixtures, and `timestampdiff` never consults a zone).
    */
  def tsMicros(df: DataFrame, c: String): DataFrame = df.schema(c).dataType match {
    case LongType      => df.withColumn(c, expr(s"`$c` div 1000"))
    case TimestampType => df.withColumn(c, unix_micros(col(c)))
    case TimestampNTZType =>
      df.withColumn(c,
        expr(s"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `$c`)"))
    case other =>
      throw new IllegalArgumentException(
        s"EventTime.tsMicros: column `$c` has unsupported type $other " +
          "(expected long nanos, timestamp, or timestamp_ntz)")
  }

  /** The micros column re-expressed as a real TIMESTAMP (for Spark's own
    * event-time operators: `window()`, `session_window()`, watermarks).
    * Session timezone should be UTC (Verify/Bench set it) so renderings
    * agree with the oracle.
    */
  def microsToTimestamp(df: DataFrame, c: String, out: String): DataFrame =
    df.withColumn(out, timestamp_micros(col(c)))
}
