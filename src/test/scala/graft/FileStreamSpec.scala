package graft

import java.nio.file.Files

import graft.streaming.OnlineTimeStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._

/** End-to-end Structured Streaming over a file source (the real
  * deployment path of §2.9): parquet drops into a watched directory,
  * AvailableNow trigger drains it through the windowed aggregation into a
  * parquet sink with a checkpoint; a restart resumes from the checkpoint
  * and processes only the new files (exactly-once over the file log). */
class FileStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, h: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  test("file-source daily minutes with checkpointed restart") {
    val in = Files.createTempDirectory("graft-stream-in").toString
    val out = Files.createTempDirectory("graft-stream-out").toString
    val chk = Files.createTempDirectory("graft-stream-chk").toString
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType)))

    def drop(rows: Seq[(Long, java.sql.Timestamp)], file: String): Unit =
      rows.toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(s"$in/$file")

    def drain(): Unit = {
      val q = OnlineTimeStream.dailyMinutes(
        spark.readStream.schema(schema).parquet(s"$in/*"))
        .writeStream
        .outputMode(OutputMode.Append)
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // Batch 1: two users on day 1; watermark closes day 1 only once later
    // data arrives, so drop day-2 data in the second run.
    drop(Seq((1L, ts(1, 1)), (1L, ts(1, 2)), (2L, ts(1, 5))), "b1")
    drain()
    // Restart the query from the checkpoint with a new file present.
    drop(Seq((1L, ts(2, 1)), (2L, ts(3, 0))), "b2")
    drain()
    drop(Seq((9L, ts(5, 0))), "b3") // pushes the watermark past day 3
    drain()

    val result = spark.read.parquet(out)
      .select(col("day").cast("string"), col("user_id"), col("minutes"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(result(("2024-01-01", 1L)) === 10L)
    assert(result(("2024-01-01", 2L)) === 5L)
    assert(result(("2024-01-02", 1L)) === 5L)
    assert(result(("2024-01-03", 2L)) === 5L)
    // no duplicated day-1 rows after the restarts (exactly-once append)
    assert(result.size === spark.read.parquet(out).count())
  }

  test("stream-to-store merge-upsert converges across checkpointed restarts") {
    val in = Files.createTempDirectory("graft-s2s-in").toString
    val chk = Files.createTempDirectory("graft-s2s-chk").toString
    val store = s"${Files.createTempDirectory("graft-s2s-store")}/table"
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType)))

    def drop(rows: Seq[(Long, java.sql.Timestamp)], file: String): Unit =
      rows.toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(s"$in/$file")

    def drain(): Unit = {
      val q = OnlineTimeStream.startToStore(
        spark.readStream.schema(schema).parquet(s"$in/*"),
        store, chk, Trigger.AvailableNow())
      q.awaitTermination()
    }

    drop(Seq((1L, ts(1, 1)), (1L, ts(1, 2)), (2L, ts(1, 5))), "b1")
    drain()
    // restart from the checkpoint: day-1 user 1 grows, user 2 must
    // survive the partition rewrite, a new day appears
    drop(Seq((1L, ts(1, 6)), (3L, ts(2, 1))), "b2")
    drain()
    val rows = spark.read.parquet(store)
      .select(col("day").cast("string"), col("user_id"), col("minutes"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows === Set(
      ("2024-01-01", 1L, 15L),
      ("2024-01-01", 2L, 5L),
      ("2024-01-02", 3L, 5L)))
  }

  test("sf0.1: streaming merge-upsert converges to the batch daily aggregation") {
    // The 100 TB claim under test: at-least-once file delivery + idempotent
    // day-partition upsert = effectively-once — the streamed store must
    // equal the BATCH answer over the full sf0.1 event log (100k events,
    // 30 days), not just fixtures. The log is split into 6 time-bucketed
    // chunks fed 2 files per micro-batch, so the run exercises multiple
    // checkpointed batches, per-batch merge with days straddling chunk
    // boundaries, and watermark advance (time-ordered chunks keep every
    // event inside the 10-minute watermark — batch semantics drop nothing).
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.1")
      .select(col("user_id"), col("ts"))
    val in = Files.createTempDirectory("graft-sfstream-in").toString
    val chk = Files.createTempDirectory("graft-sfstream-chk").toString
    val store = s"${Files.createTempDirectory("graft-sfstream-store")}/table"
    // ts is TIMESTAMP_NTZ from Tables.events (LocalDateTime in a Row);
    // legacy fixtures surfaced TimestampType — accept both encodings.
    def epochMs(v: Any): Long = v match {
      case t: java.sql.Timestamp      => t.getTime
      case d: java.time.LocalDateTime => d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    }
    val Seq(lo, hi) = events.agg(min(col("ts")), max(col("ts"))).collect()
      .flatMap(r => Seq(epochMs(r.get(0)), epochMs(r.get(1)))).toSeq
    val nChunks = 6
    val span = (hi - lo) / nChunks + 1
    for (c <- 0 until nChunks) { // sequential writes => increasing mod times
      events
        .filter(floor((col("ts").cast("timestamp").cast("double") * 1000 - lo) / span) === c)
        .coalesce(1).write.parquet(s"$in/c$c")
    }
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType)))
    val q = OnlineTimeStream.startToStore(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "2").parquet(s"$in/*"),
      store, chk, Trigger.AvailableNow())
    q.awaitTermination()
    val streamed = spark.read.parquet(store)
      .select(col("day").cast("string"), col("user_id"), col("minutes"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val batch = graft.operators.OnlineTime.daily(
        graft.sources.Tables.events(spark, "/root/testdata/sf0.1"))
      .select(col("day"), col("user_id"), col("minutes"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    assert(streamed.size === batch.size)
    assert(streamed === batch)
  }
}
