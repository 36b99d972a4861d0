package graft

import java.nio.file.Files

import graft.operators.Snapshots
import graft.sinks.SnapshotStore
import org.apache.spark.sql.functions._

/** E1+E2 end-to-end (SURVEY.md §3): ingest a leaderboard from the paged
  * DSv2 source, persist day-keyed snapshots through the store, and run the
  * gain diff query over the persisted history — the full
  * extract→transform→load→query loop the reference implements with HTTP +
  * Supabase, here as source→store→query over partitioned parquet. */
class PipelineIntegrationSpec extends SparkSpec {

  test("ingest -> snapshot store -> gain query, end to end") {
    val path = Files.createTempDirectory("graft-e2e").toString

    def ingest(day: String, drift: Long): Unit = {
      // "fetch" the top pages; stamp game-day; values drift day over day
      val snap = spark.read.format("graft.sources.PagedLeaderboardProvider")
        .option("maxPages", "4").load()
        .filter(col("level") >= 30)
        .select(
          lit(day).as("day"),
          col("rank").cast("long").as("user_id"),
          (col("value") + lit(drift) * col("rank")).cast("double").as("value"))
      SnapshotStore.upsertDays(snap, path)
    }

    ingest("2024-02-01", 0L)
    ingest("2024-02-02", 7L) // every user gains 7 * rank exp

    // Re-read the persisted history shaped like an events log and diff it:
    val history = spark.read.parquet(path)
      .select(
        col("user_id"),
        col("value"),
        // synthesize (ts, event_id) from the partition day: one event per
        // (day, user), ordered by day
        to_timestamp(col("day").cast("string")).as("ts"),
        (unix_date(col("day").cast("date")) * 100000L + col("user_id")).as("event_id"))
    val gains = Snapshots.gain(history, 1).collect()

    assert(gains.length === 200, "every ranked user gained")
    // gain = 7 * rank; ranked desc => rank 200 first with gain 1400
    assert(gains.head.getLong(1) === 200L)
    assert(gains.head.getDouble(2) === 1400.0)
    assert(gains.last.getDouble(2) === 7.0)

    // idempotent re-ingest of day 2 changes nothing
    ingest("2024-02-02", 7L)
    assert(spark.read.parquet(path).count() === 400)

    // operational tail: compaction then retention, data surviving both
    SnapshotStore.compactDays(spark, path)
    assert(spark.read.parquet(path).count() === 400)
    SnapshotStore.retainWhere(spark, path, col("day") === "2024-02-02")
    val kept = spark.read.parquet(path)
    assert(kept.count() === 200)
    assert(kept.select(col("day").cast("string")).distinct().collect()
      .map(_.getString(0)).toSeq === Seq("2024-02-02"))
  }
}
