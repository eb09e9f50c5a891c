package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventTime

/** EventTime: the single mapping from either events-fixture encoding onto
  * epoch-microsecond arithmetic. Every branch of the type sniff is pinned —
  * a fixture regeneration flipping the parquet encoding again must land in
  * a covered path, not an analysis error.
  */
class EventTimeSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // 2024-03-01T12:34:56.789012Z in the three encodings.
  private val micros = 1709296496789012L

  test("long column is treated as legacy nanos: integer div to micros") {
    val df = Seq(micros * 1000L, micros * 1000L + 999L).toDF("ts")
    val got = EventTime.tsMicros(df, "ts").as[Long].collect().toSeq
    // sub-micro digits truncate (integer div), never round
    assert(got == Seq(micros, micros))
  }

  test("timestamp column converts via unix_micros exactly") {
    val df = Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    assert(df.schema("ts").dataType == TimestampType)
    assert(EventTime.tsMicros(df, "ts").as[Long].head() == micros)
  }

  test("timestamp_ntz converts timezone-independently") {
    val df = Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(df.schema("ts").dataType == TimestampNTZType)
    // session TZ is UTC here, so the NTZ wall-clock IS the UTC instant;
    // timestampdiff must reproduce the exact micros.
    assert(EventTime.tsMicros(df, "ts").as[Long].head() == micros)
    // and the conversion must not consult the session zone: flipping it
    // changes nothing because timestampdiff is zone-free on NTZ.
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      assert(EventTime.tsMicros(df, "ts").as[Long].head() == micros)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("unsupported column type fails loudly") {
    val df = Seq("2024-03-01").toDF("ts")
    val e = intercept[IllegalArgumentException](EventTime.tsMicros(df, "ts"))
    assert(e.getMessage.contains("EventTime"))
  }

  test("readMicros normalizes the real fixture and microsToTimestamp round-trips") {
    val ev = EventTime.readMicros(spark, "/root/testdata/sf0.001/events.parquet")
    assert(ev.schema("ts").dataType == LongType)
    val n = ev.count()
    assert(n > 0)
    val rt = EventTime.microsToTimestamp(ev, "ts", "tst")
      .filter(unix_micros(col("tst")) =!= col("ts")).count()
    assert(rt == 0, "timestamp round-trip must be lossless at micros")
  }
}
