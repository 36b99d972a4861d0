package graft

import java.nio.file.Files

import graft.sinks.VersionedStore
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** STREAM-FROM-the-versioned-table gates (graft.sources.VersionedCdc):
  * offsets are store versions, so delivery is exactly the committed
  * appends — once each, in order, across restarts — and the documented
  * contract edges (compaction mid-range, expired resume point) fail
  * loudly instead of re-delivering. */
class VersionedCdcSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-cdc").toString

  private def snap(day: String, users: (Long, Double)*) =
    users.map { case (u, v) => (day, u, v) }.toDF("day", "user_id", "value")

  private def cdc(root: String, opts: Map[String, String] = Map.empty) = {
    val r = spark.readStream.format("graft.sources.VersionedCdc").option("path", root)
    opts.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  test("each committed append is delivered exactly once; later appends arrive in later batches") {
    val root = tmp(); val chk = tmp(); val sinkDir = tmp()
    VersionedStore.commitAppend(snap("2024-01-01", 1L -> 1.0), root)
    VersionedStore.commitAppend(snap("2024-01-02", 2L -> 2.0, 3L -> 3.0), root)

    def drain(): Unit = {
      val q = cdc(root).writeStream
        .format("parquet").option("path", sinkDir)
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(sinkDir).count() === 3L,
      "both committed appends drain through the first run")

    // New commits while the stream is DOWN are picked up by the next run
    // from the checkpointed version offset — and nothing is re-delivered.
    VersionedStore.commitAppend(snap("2024-01-03", 4L -> 4.0), root)
    drain()
    val rows = spark.read.parquet(sinkDir).orderBy("user_id").collect()
    assert(rows.map(_.getAs[Long]("user_id")).toSeq === Seq(1L, 2L, 3L, 4L),
      s"exactly-once across restarts, got ${rows.mkString(",")}")

    // An idle run (no new versions) delivers nothing.
    drain()
    assert(spark.read.parquet(sinkDir).count() === 4L)
  }

  test("startVersion skips history: only versions after it are delivered") {
    val root = tmp(); val chk = tmp(); val sinkDir = tmp()
    VersionedStore.commitAppend(snap("2024-01-01", 1L -> 1.0), root)
    VersionedStore.commitAppend(snap("2024-01-02", 2L -> 2.0), root)
    VersionedStore.commitAppend(snap("2024-01-03", 3L -> 3.0), root)
    val q = cdc(root, Map("startVersion" -> "2")).writeStream
      .format("parquet").option("path", sinkDir)
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val users = spark.read.parquet(sinkDir).collect().map(_.getAs[Long]("user_id")).toSeq
    assert(users === Seq(3L), s"only the v3 append is after startVersion=2, got $users")
  }

  test("store -> stream -> store loop: a derived versioned table follows the base exactly") {
    val base = tmp(); val derived = tmp(); val chk = tmp()
    VersionedStore.commitAppend(snap("2024-01-01", 1L -> 1.0, 2L -> 2.0), base)
    VersionedStore.commitAppend(snap("2024-01-02", 3L -> 3.0), base)
    // The full Delta-style loop: VersionedCdc source -> transform ->
    // VersionedStream exactly-once sink into a SECOND store.
    val q = graft.streaming.VersionedStream.startAppend(
      cdc(base).withColumn("value", col("value") * 10),
      derived, chk, trigger = Trigger.AvailableNow())
    q.awaitTermination()
    val got = VersionedStore.read(spark, derived).get.orderBy("user_id").collect()
    assert(got.map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("value"))).toSeq
      === Seq(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    // incremental follow: one more base append, one more drain
    VersionedStore.commitAppend(snap("2024-01-03", 9L -> 9.0), base)
    val q2 = graft.streaming.VersionedStream.startAppend(
      cdc(base).withColumn("value", col("value") * 10),
      derived, chk, trigger = Trigger.AvailableNow())
    q2.awaitTermination()
    assert(VersionedStore.read(spark, derived).get.count() === 4L)
  }

  test("a compaction inside the unconsumed range fails the stream loudly (no silent full replay)") {
    val root = tmp(); val chk = tmp(); val sinkDir = tmp()
    VersionedStore.commitAppend(snap("2024-01-01", 1L -> 1.0), root)
    val q0 = cdc(root).writeStream
      .format("parquet").option("path", sinkDir)
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow()).start()
    q0.awaitTermination()
    // Snapshot rewrite lands AFTER the checkpointed version: dir-level
    // changes across it are undefined, so the resumed stream must throw
    // (the caller re-baselines), never re-deliver the table as "changes".
    graft.streaming.VersionedStream.compact(spark, root)
    val q1 = cdc(root).writeStream
      .format("parquet").option("path", sinkDir)
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow()).start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(err).exists(_.getMessage != null) &&
      causes(err).exists(c => Option(c.getMessage).exists(_.contains("snapshot rewrite"))),
      s"expected the readChanges snapshot-rewrite error, got $err")
  }

  test("readChangeFeed: DML inside the range streams row-level deltas instead " +
       "of failing, and a row-identical compaction contributes nothing") {
    import org.apache.spark.sql.functions.{col, lit}
    val root = tmp(); val chk = tmp(); val sinkDir = tmp()
    VersionedStore.commitAppend(snap("2024-01-01", 1L -> 1.0, 2L -> 2.0), root)
    def drain(): Unit = {
      val q = cdc(root, Map("readChangeFeed" -> "true")).writeStream
        .format("parquet").option("path", sinkDir)
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    val first = spark.read.parquet(sinkDir)
    assert(first.columns.contains("_change_type"))
    assert(first.select("_change_type").as[String].collect().toSeq ===
      Seq("insert", "insert"))
    // DML while the stream is down: the resumed CDF stream delivers the
    // exact row deltas — where the dir-level stream would have replayed
    // whole rewritten dirs (double-counting survivors) or thrown.
    VersionedStore.updateWhere(spark, root, col("user_id") === 2L,
      set = Map("value" -> lit(9.0)))
    VersionedStore.deleteWhere(spark, root, col("user_id") === 1L)
    graft.streaming.VersionedStream.compact(spark, root) // row-identical
    drain()
    val feed = spark.read.parquet(sinkDir)
      .select("user_id", "value", "_change_type", "_commit_version")
      .as[(Long, Double, String, Long)].collect().toSeq.sorted
    assert(feed === Seq(
      (1L, 1.0, "delete", 3L),
      (1L, 1.0, "insert", 1L),
      (2L, 2.0, "insert", 1L),
      (2L, 2.0, "update_preimage", 2L),
      (2L, 9.0, "update_postimage", 2L)),
      s"row-level feed mismatch: $feed")
  }

  test("schema comes from the store's recorded DDL; an empty store is rejected up front") {
    val root = tmp()
    val e = intercept[IllegalArgumentException] { cdc(root) }
    assert(e.getMessage.contains("committed store"),
      s"empty store must be rejected at load(), got: ${e.getMessage}")
    VersionedStore.commitAppend(snap("2024-01-01", 1L -> 1.0), root)
    val df = cdc(root)
    assert(df.isStreaming, "the source frame must be a streaming frame")
    assert(df.schema.fieldNames.toSet === Set("day", "user_id", "value"))
  }

  test("a CompositeReadLimit's ReadMaxRows component still caps the batch (never the uncapped pin)") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val root = tmp()
    (1 to 5).foreach { i =>
      VersionedStore.commitAppend(snap(s"2024-01-0$i", i.toLong -> i.toDouble), root)
    }
    val src = new graft.sources.VersionedCdcSource(spark, root, 0L,
      graft.sources.VersionedCdc.storeSchema(spark, root),
      maxVersionsPerBatch = Some(2L))
    // Plain ReadMaxRows caps at start + 2.
    assert(src.latestOffset(LongOffset(0L), ReadLimit.maxRows(2L))
      === LongOffset(2L))
    // The engine may COMPOSE limits (e.g. minRows alongside the cap):
    // the contained ReadMaxRows must still apply — falling through to
    // the uncapped pin would drain a backlogged resume in one batch.
    val composite = ReadLimit.compositeLimit(
      Array(ReadLimit.minRows(1L, 60000L), ReadLimit.maxRows(2L)))
    assert(src.latestOffset(LongOffset(0L), composite) === LongOffset(2L))
    assert(src.latestOffset(LongOffset(2L), composite) === LongOffset(4L))
    // No cap component: full backlog.
    assert(src.latestOffset(LongOffset(0L), ReadLimit.allAvailable())
      === LongOffset(5L))
  }

  test("maxVersionsPerBatch: an AvailableNow drain delivers bounded batches, one per version") {
    val root = tmp(); val chk = tmp(); val derived = tmp()
    (1 to 4).foreach { i =>
      VersionedStore.commitAppend(snap(s"2024-01-0$i", i.toLong -> i.toDouble), root)
    }
    // Admission control caps each micro-batch at ONE store version; the
    // AvailableNow run drains the backlog as four bounded batches, each
    // its own exactly-once commit downstream (a backlogged resume at
    // 100 TB must never become one giant catch-up batch).
    val q = graft.streaming.VersionedStream.startAppend(
      cdc(root, Map("maxVersionsPerBatch" -> "1")),
      derived, chk, trigger = Trigger.AvailableNow())
    q.awaitTermination()
    assert(VersionedStore.currentVersion(spark, derived) === 4L,
      "four base versions -> four rate-limited batches -> four derived commits")
    assert(graft.streaming.VersionedStream.lastBatchId(spark, derived) === 3L)
    assert(VersionedStore.read(spark, derived).get.count() === 4L)
    // and the pinned AvailableNow end: a commit landing after the drain
    // is picked up by the NEXT run, exactly once
    VersionedStore.commitAppend(snap("2024-01-05", 5L -> 5.0), root)
    val q2 = graft.streaming.VersionedStream.startAppend(
      cdc(root, Map("maxVersionsPerBatch" -> "1")),
      derived, chk, trigger = Trigger.AvailableNow())
    q2.awaitTermination()
    assert(VersionedStore.read(spark, derived).get.count() === 5L)
  }
}
