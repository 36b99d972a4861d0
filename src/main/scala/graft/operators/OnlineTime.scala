package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Online-time accumulation family (SURVEY.md §2.9, §2.4 J3/J4, §2.5 A2/A3).
  *
  * The reference's `/online` pipeline (etl.dart:292-307) samples online
  * players every 5 minutes and credits +5 minutes per sighting into a
  * per-(day, player) accumulator (etl.dart:371), then refreshes 7/30/365-day
  * sliding rollups (etl.dart:397-424). Its stateful read-modify-write merge
  * (J3, full-outer on name) is re-expressed as a pure aggregation over the
  * append-only sample log: `minutes = 5 * count(*)` per (day, user) —
  * equivalent given the one-sample-per-tick invariant (SURVEY.md §7.4) and
  * embarrassingly parallel: map-side partial counts, one shuffle on the
  * group key, no per-key state. The "latest observed attribute" (level /
  * world — etl.dart:372,412-413) is `max_by` over the unique event_id, not a
  * second window pass.
  *
  * At 100 TB the sample log is date-partitioned; a period rollup prunes to
  * its date range before the scan (Catalyst partition pruning) and the
  * aggregate shuffles |users| rows, not |samples|.
  */
object OnlineTime {

  /** Per-(day, user) accumulated minutes + last seen attribute for the day.
    * Mirrors `_getOnlineTimeToday` (etl.dart:360-382). */
  def daily(events: DataFrame): DataFrame =
    events
      .select(to_date(col("ts")).as("day"), col("user_id"), col("event_type"), col("event_id"))
      .groupBy("day", "user_id")
      .agg(
        (lit(5) * count(lit(1))).as("minutes"),
        max_by(col("event_type"), col("event_id")).as("last_event_type"))
      .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
      .orderBy("day", "user_id")

  /** Calendar gap-fill (X2's `DT.tibia.range` — SURVEY.md §2.8): per-day
    * activity over the FULL calendar between the first and last observed
    * day, with zero rows for silent days. The reference iterates a Dart
    * date range and skips missing snapshots (etl.dart:400-419); here the
    * calendar is `sequence(min_day, max_day)` exploded and left-joined —
    * one broadcast of the (tiny) calendar frame, one aggregation. */
  def dailyActivityGapfill(events: DataFrame): DataFrame = {
    val daily = events
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))
    val calendar = daily
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    calendar
      .join(daily, Seq("day"), "left_outer")
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
      .orderBy("day")
  }

  /** Sliding period rollup (J4/A2/A3, etl.dart:397-424): total minutes per
    * user over the last `days` game-days (inclusive of the latest), plus the
    * latest day each user was seen, ranked by the reference's composite
    * order — time desc, then recency desc (etl.dart:339-342) — with user_id
    * as the deterministic tiebreak. */
  def period(events: DataFrame, days: Int): DataFrame = {
    val daily0 = events
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy("day", "user_id")
      .agg((lit(5) * count(lit(1))).as("minutes"))
    val bound = broadcast(daily0.agg(max(col("day")).as("end_day")))
    val agg = daily0
      .join(bound, col("day") >= date_sub(col("end_day"), days - 1))
      .groupBy("user_id")
      .agg(sum(col("minutes")).as("minutes"), max(col("day")).as("last_day"))
    // Distributed global rank (one row per active user — unbounded at
    // scale): range-partitioned rank instead of a single-partition window.
    RankUtils
      .globalRowNumber(agg,
        Seq(col("minutes").desc, col("last_day").desc, col("user_id").asc), "rank")
      .withColumn("last_day", date_format(col("last_day"), "yyyy-MM-dd"))
      .select("rank", "user_id", "minutes", "last_day")
      .orderBy("rank")
  }
}
