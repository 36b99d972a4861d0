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

  /** Hopping-window accumulation — the SLIDING shape [[dailyMinutes]]'s
    * tumbling window can't express (a rolling "minutes in the last day,
    * refreshed every 12 hours" engagement feed): `window(ts, width,
    * slide)` assigns every event to width/slide = 2 epoch-aligned
    * windows by ROW EXPANSION before the aggregation, so the shuffle
    * carries 2× rows but per-group state stays bounded and the watermark
    * evicts each window independently. Works on a streaming OR batch
    * DataFrame with (ts, user_id); per-(window, user) output keeps the
    * aggregation single-phase — streaming-legal in every output mode
    * (a per-window distinct would need a second stateful aggregation,
    * which Structured Streaming disallows). */
  def hoppingMinutes(events: DataFrame,
                     width: String = "1 day", slide: String = "12 hours"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), width, slide).as("win"), col("user_id"))
      .agg((lit(5) * count(lit(1))).as("minutes"))
      .select(col("win.start").as("wstart"), col("user_id"), col("minutes"))

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

  /** Pipeline tail (L3 + J3 in streaming form, etl.dart:271, :360-382):
    * stream [[dailyMinutes]] into the date-partitioned snapshot store as a
    * keyed merge-upsert. Update mode emits the new TOTAL per touched
    * (day, user) each micro-batch; foreachBatch keeps untouched users of
    * the same day (left-anti on the key) and replaces exactly the touched
    * day partitions via dynamic partition overwrite. Re-running a batch
    * rewrites the same totals — at-least-once delivery + idempotent write
    * = effectively-once end to end.
    *
    * Scale notes: the store read is partition-pruned to the batch's days
    * (a literal isin pushed to the partition index), and the days-per-batch
    * list is watermark-bounded — the collect is O(active days), not data.
    * foreachBatch is the sanctioned imperative seam in Structured
    * Streaming; everything inside it is still declarative Spark. */
  def startToStore(events: DataFrame, path: String, checkpoint: String,
                   trigger: org.apache.spark.sql.streaming.Trigger =
                     org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)): org.apache.spark.sql.streaming.StreamingQuery =
    dailyMinutes(events).writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val b = batch.withColumn("day", col("day").cast("string"))
        val days = b.select("day").distinct().collect().map(_.getString(0))
        if (days.nonEmpty) {
          val fs = new org.apache.hadoop.fs.Path(path)
            .getFileSystem(spark.sessionState.newHadoopConf())
          val merged =
            if (fs.exists(new org.apache.hadoop.fs.Path(path))) {
              val existing = spark.read.parquet(path)
                .withColumn("day", col("day").cast("string"))
                .filter(col("day").isin(days.toIndexedSeq: _*))
              existing.join(b, Seq("day", "user_id"), "left_anti").unionByName(b)
            } else b
          graft.sinks.SnapshotStore.upsertDays(merged, path)
        }
        ()
      }
      .start()

  final case class DaySample(day: String, user_id: Long)
  final case class DayDistinct(day: String, n_hll: Long)

  /** Streaming distinct-user estimation: the per-day HyperLogLog register
    * vector lives in keyed state ([[graft.operators.Sketches]]) and each
    * micro-batch folds its rows in by register max — 512 ints per day
    * REGARDLESS of traffic, where exact streaming distinct would grow
    * state by every unseen user. Emits the day's updated estimate every
    * batch it is touched. The register update and estimator are the SAME
    * arithmetic as the batch sketch, so the stream converges to exactly
    * the batch answer ([[graft.operators.Sketches.hllDistinct]]) — the
    * sketch tier's stream-equals-batch gate. */
  def streamingDistinctUsers(events: DataFrame): Dataset[DayDistinct] = {
    import events.sparkSession.implicits._
    events
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
      .as[DaySample]
      .groupByKey(_.day)
      .mapGroupsWithState[Array[Int], DayDistinct](GroupStateTimeout.NoTimeout) {
        (day: String, batch: Iterator[DaySample], state: GroupState[Array[Int]]) =>
          val regs = state.getOption.getOrElse(
            new Array[Int](graft.operators.Sketches.HllM))
          batch.foreach(s =>
            graft.operators.Sketches.updateRegisters(regs, s.user_id.toString))
          state.update(regs)
          DayDistinct(day, graft.operators.Sketches.estimateFromRegisters(regs))
      }
  }

  final case class WinSample(wstart: String, user_id: Long)
  final case class WinDistinct(wstart: String, n_hll: Long)

  /** Hopping-window DISTINCT-user estimation — the streaming × sketch
    * composition: [[hoppingMinutes]]'s sliding `window(ts, width, slide)`
    * row expansion (each event → width/slide epoch-aligned windows)
    * feeds the SAME per-key HLL register state as
    * [[streamingDistinctUsers]]. A per-window exact distinct would be a
    * second stateful aggregation (illegal in Structured Streaming) or
    * per-key unbounded user sets; the register vector is 512 ints per
    * OPEN window regardless of traffic, and the fold
    * ([[graft.operators.Sketches.updateRegisters]] /
    * [[graft.operators.Sketches.estimateFromRegisters]]) is the same
    * arithmetic as the batch register pipeline
    * ([[graft.operators.Sketches.hllDistinct]]), so any micro-batch
    * slicing converges to exactly the batch answer (spec-gated), and the
    * batch run of this very function is DuckDB-oracle-gated
    * (`hopping_hll_distinct`). Works on a streaming OR batch DataFrame
    * with (ts, user_id). */
  def hoppingDistinctUsers(events: DataFrame,
                           width: String = "1 day", slide: String = "12 hours"): Dataset[WinDistinct] = {
    import events.sparkSession.implicits._
    events
      .select(
        date_format(window(col("ts"), width, slide)("start"),
          "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("user_id"))
      .as[WinSample]
      .groupByKey(_.wstart)
      .mapGroupsWithState[Array[Int], WinDistinct](GroupStateTimeout.NoTimeout) {
        (wstart: String, batch: Iterator[WinSample], state: GroupState[Array[Int]]) =>
          val regs = state.getOption.getOrElse(
            new Array[Int](graft.operators.Sketches.HllM))
          batch.foreach(s =>
            graft.operators.Sketches.updateRegisters(regs, s.user_id.toString))
          state.update(regs)
          WinDistinct(wstart, graft.operators.Sketches.estimateFromRegisters(regs))
      }
  }

  final case class DayKmvDistinct(day: String, est_distinct: Double)

  /** Daily DISTINCT-user estimation via the KMV sketch in keyed streaming
    * state — the theta-sketch sibling of [[streamingDistinctUsers]]:
    * where HLL state is 512 registers, KMV state is the ≤ k smallest
    * distinct [[graft.functions.Md5Hash60]] values (≤ k longs per day
    * REGARDLESS of traffic), folded per micro-batch through the SAME
    * insertion the batch aggregate uses ([[graft.functions.MinKAgg.offer]])
    * and estimated with the SAME IEEE arithmetic
    * ([[graft.operators.Kmv.estimateScalar]]) — so any micro-batch slicing
    * converges to exactly the batch column answer, and the day sketches it
    * leaves behind remain mergeable into union/intersection estimates
    * ([[graft.operators.Kmv.overlap]]), which HLL state cannot do. */
  def kmvDistinctUsers(events: DataFrame, k: Int = 256): Dataset[DayKmvDistinct] = {
    import events.sparkSession.implicits._
    events
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
      .as[DaySample]
      .groupByKey(_.day)
      .mapGroupsWithState[Array[Long], DayKmvDistinct](GroupStateTimeout.NoTimeout) {
        (day: String, batch: Iterator[DaySample], state: GroupState[Array[Long]]) =>
          val buf = new java.util.TreeSet[java.lang.Long]()
          state.getOption.foreach(_.foreach(buf.add(_)))
          batch.foreach(s => graft.functions.MinKAgg.offer(
            buf, graft.functions.Md5Hash60.hash60(
              s.user_id.toString.getBytes("UTF-8")), k))
          val arr = new Array[Long](buf.size)
          var i = 0
          buf.forEach { v => arr(i) = v; i += 1 }
          state.update(arr)
          DayKmvDistinct(day, graft.operators.Kmv.estimateScalar(buf, k))
      }
  }

  /** Event-time SESSION windows over the sample stream — the streaming
    * form of the batch gap-sessionization
    * ([[graft.operators.EventsAnalytics.sessionize]]): activity separated
    * by AT MOST `gap` merges into one session per user (an exactly-gap
    * pause still merges — verified; matches the batch rule's
    * `diff > gap` split); a longer quiet period closes it. `session_window` keeps per-key open-session state that the
    * watermark bounds and finalizes — sessions emit exactly once (Append)
    * when the watermark passes their end, so downstream consumers see
    * complete sessions only. */
  def sessionMinutes(events: DataFrame, gap: String = "30 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg((lit(5) * count(lit(1))).as("minutes"))
      .select(
        col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("user_id"), col("minutes"))

  /** Watermarked stream-stream inner join — the attribution shape: every
    * `view` within `horizon` AFTER a `purchase` by the same user, both
    * sides live streams. The time-range predicate plus watermarks on BOTH
    * event-time columns is what lets Spark bound the join state: a
    * buffered purchase can be evicted once the view watermark passes
    * `p_ts + horizon`, a buffered view once the purchase watermark passes
    * `v_ts` — without the range condition the state grows forever. The
    * batch sibling of this shape is [[graft.operators.AsofJoin]] /
    * [[graft.operators.RangeJoin]]; this is its online form. */
  def attributionJoin(purchases: DataFrame, views: DataFrame,
                      horizon: String = "1 hour",
                      watermark: String = "10 minutes"): DataFrame = {
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
      .withWatermark("p_ts", watermark)
    val v = views
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("event_id").as("view_id"))
      .withWatermark("v_ts", watermark)
    p.join(v,
        col("p_user") === col("v_user") &&
          col("v_ts") >= col("p_ts") &&
          col("v_ts") <= col("p_ts") + expr(s"INTERVAL $horizon"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("view_id"),
        col("p_ts"), col("v_ts"))
  }

  /** Convenience: wire [[dailyMinutes]] to a memory sink for tests/demos. */
  def startToMemory(events: DataFrame, queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
    dailyMinutes(events).writeStream
      .outputMode(OutputMode.Update)
      .format("memory")
      .queryName(queryName)
      .start()
}
