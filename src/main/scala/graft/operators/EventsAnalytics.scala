package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log analytics beyond the reference's surface (log processing any
  * training-data pipeline needs): gap-based sessionization and as-of /
  * carry-forward joins. Both are single-shuffle window formulations —
  * partition by user, order by the unique event_id — no self-joins, no
  * state; at 100 TB the shuffle is one hash partitioning on user_id.
  */
object EventsAnalytics {

  /** Gap-based sessionization: a new session starts when the gap to the
    * user's previous event exceeds `gapMinutes`. Emits one row per
    * session with bounds, event count and exact value sum. The session id
    * is a running sum of session-start flags over the per-user ordering —
    * the classic two-window formulation. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val gapSec = gapMinutes * 60L
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("v"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        (col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec).cast("long"))
      .withColumn("session_idx", sum(col("new_session")).over(byUser))
      .groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        sum(col("v")).cast("double").as("total_value"))
      .orderBy("user_id", "session_idx")
  }

  /** Wide-format pivot: per-day event counts, one column per event type.
    * The value list is explicit, so the output schema is static (a
    * values-less pivot would scan once just to discover columns — never at
    * 100 TB) and the plan is a single hash aggregate with conditional
    * counts. */
  def dailyTypePivot(events: DataFrame, types: Seq[String]): DataFrame =
    events
      .select(to_date(col("ts")).as("day"), col("event_type"))
      .groupBy("day")
      .pivot("event_type", types)
      .count()
      .na.fill(0L, types)
      .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
      .orderBy("day")

  /** Rolling 7-day minutes per user — a RANGE window frame over the
    * day-number ordering, so silent days still bound the window correctly
    * (a ROWS frame would slide over gaps). One shuffle on user_id. */
  def rollingWeeklyMinutes(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("dayn"))
      .rangeBetween(-6, Window.currentRow)
    events
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy("day", "user_id")
      .agg((lit(5) * count(lit(1))).as("minutes"))
      .withColumn("dayn", datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))
      .withColumn("rolling_minutes", sum(col("minutes")).over(w))
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("user_id"), col("minutes"), col("rolling_minutes"))
      .orderBy("day", "user_id")
  }

  /** As-of semantics as carry-forward: each event is annotated with the
    * value of the same user's most recent `markerType` event at-or-before
    * it (NULL before the first marker) — `last_value IGNORE NULLS` over
    * the per-user order, the declarative equivalent of an as-of join of a
    * stream against itself. */
  def asofCarryForward(events: DataFrame, markerType: String = "purchase"): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .withColumn("marker_value",
        last(when(col("event_type") === markerType, col("value")), ignoreNulls = true)
          .over(byUser))
      .orderBy("event_id")
  }
}
