package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-event analytics over the events stream: funnel conversion and
  * cohort retention — the two queries every product/event warehouse runs,
  * here in exact integer event-time (epoch micros via
  * [[EventTime.readMicros]]) so the oracle replays them with plain
  * arithmetic.
  *
  * Scale shape: both are user-keyed aggregations — every shuffle is on the
  * user id (or the small cohort key), partial-aggregated map-side, output
  * bounded by |stages| or |cohorts x offsets| regardless of event volume.
  */
object EventAnalytics {

  /** Strictly-ordered funnel: stage k counts users whose earliest stage-k
    * event happens AT OR AFTER their earliest qualifying stage-(k-1)
    * event. Emits one row per stage: `(stage_index, event_type, n_users,
    * conversion)` where conversion is n / n_of_previous_stage (1.0 for
    * stage 1), rounded to 6dp.
    *
    * Each stage is one filtered user-keyed min aggregate joined to the
    * previous stage's per-user frontier — k stages = k bounded shuffles on
    * the user key, never a self-cross-join.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    // per-stage per-user earliest qualifying ts, chained
    var frontier = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
      .localCheckpoint()
    val counts = scala.collection.mutable.ArrayBuffer[Long](frontier.count())
    stages.drop(1).foreach { st =>
      frontier = events.filter(col(typeCol) === st)
        .join(frontier.select(col(userCol), col("__t").as("__prev")), userCol)
        .filter(col(tsCol) >= col("__prev"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
        .localCheckpoint()
      counts += frontier.count()
    }
    val rows = stages.zipWithIndex.map { case (st, i) =>
      // HALF_UP to match SQL round() semantics exactly
      val conv =
        if (i == 0) 1.0
        else if (counts(i - 1) == 0) 0.0
        else BigDecimal(counts(i).toDouble / counts(i - 1))
          .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
      (i + 1L, st, counts(i), conv)
    }
    rows.toDF("stage_index", "event_type", "n_users", "conversion")
  }

  /** Day-granularity cohort retention: a user's cohort is the day of
    * their first event; `(cohort_day, day_offset, n_active)` counts
    * cohort members with any event `day_offset` days after their cohort
    * day, for offsets `0..maxOffsetDays`. Days are exact integer
    * `micros div day` — no timezone, no calendar.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      maxOffsetDays: Int = 7): DataFrame = {
    require(maxOffsetDays >= 0, "maxOffsetDays must be >= 0")
    val day = EventTime.DayMicros
    // integer div — exact at any epoch, no double rounding
    val withDay = events.select(col(userCol),
      expr(s"`$tsCol` div $day").as("__day"))
    val cohort = withDay.groupBy(col(userCol))
      .agg(min(col("__day")).as("__cohort"))
    withDay.join(cohort, userCol)
      .select(col(userCol), col("__cohort"),
        (col("__day") - col("__cohort")).as("__off"))
      .filter(col("__off") <= maxOffsetDays)
      .distinct()
      .groupBy(col("__cohort").as("cohort_day"), col("__off").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
  }
}
