package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming upgrade of the online-time pipeline (SURVEY.md
  * §2.9): the reference's 5-minute cron tick becomes a streaming source;
  * the per-(day, user) accumulator becomes either
  *  - a watermarked tumbling-window aggregation ([[dailyMinutes]]), or
  *  - explicit keyed state via mapGroupsWithState ([[runningMinutes]]) —
  *    the shape the reference's read-modify-write merge (etl.dart:360-382)
  *    actually has.
  *
  * Late data: the reference cannot observe late samples (they are created
  * at read time); we allow a 10-minute watermark so a real deployment
  * tolerates executor lag without unbounded state.
  */
object OnlineTimeStream {

  /** Tumbling 1-game-day accumulation: 5 minutes credit per sighting.
    * Works on a streaming OR batch DataFrame with (ts, user_id). */
  def dailyMinutes(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 day").as("day_window"), col("user_id"))
      .agg((lit(5) * count(lit(1))).as("minutes"))
      .select(
        to_date(col("day_window.start")).as("day"),
        col("user_id"),
        col("minutes"))

  final case class Sample(user_id: Long, ts: java.sql.Timestamp)
  final case class UserMinutes(user_id: Long, minutes: Long)

  /** Explicit keyed state: cumulative minutes per user across all
    * micro-batches — the direct analogue of the reference's persisted
    * accumulator row (`time += 5`, etl.dart:371). Emits the running total
    * on every batch that touches the key. */
  def runningMinutes(samples: Dataset[Sample]): Dataset[UserMinutes] = {
    import samples.sparkSession.implicits._
    samples
      .groupByKey(_.user_id)
      .mapGroupsWithState[Long, UserMinutes](GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Sample], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + 5L * batch.size
          state.update(total)
          UserMinutes(user, total)
      }
  }

  /** Streaming exactly-once dedup: drop re-delivered events by `event_id`
    * within the watermark horizon — the idempotency layer an at-least-once
    * ingestion needs (the reference gets this implicitly from its
    * `_exists` guards + upserts; a stream needs bounded state).
    *
    * `dropDuplicatesWithinWatermark` is the form whose state the watermark
    * actually evicts: plain `dropDuplicates("event_id")` without the
    * event-time column in the key set keeps every key forever (unbounded
    * state growth on a real stream). */
  def dedupEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Convenience: wire [[dailyMinutes]] to a memory sink for tests/demos. */
  def startToMemory(events: DataFrame, queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
    dailyMinutes(events).writeStream
      .outputMode(OutputMode.Update)
      .format("memory")
      .queryName(queryName)
      .start()
}
