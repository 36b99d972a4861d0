package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.sinks.VersionedStore

/** Streaming → transactional table: every micro-batch becomes one
  * [[VersionedStore]] APPEND commit, so readers always see a complete,
  * manifest-resolved snapshot (never a half-written batch), every batch
  * boundary is a time-travelable version, and replays are EXACTLY-ONCE at
  * the table level — the Delta `txn`-metadata pattern on the filesystem
  * skeleton:
  *
  *  - foreachBatch is at-least-once on crash recovery: a batch replayed
  *    after the commit landed but before the checkpoint recorded it would
  *    double-append. Here the commit record itself is the ledger — each
  *    commit stamps `meta = {"batchId": N}`, and a batch with
  *    `N <= lastBatchId` is SKIPPED. Unlike [[ShingleStream]]'s
  *    checkpoint-side marker files, the dedup record travels WITH the
  *    table: wiping the checkpoint (or re-pointing a new stream at the
  *    same store with `startAt`) cannot desynchronize ledger and data,
  *    because they commit in the same atomic manifest create.
  *  - Work per batch is O(batch): `commitAppend` rewrites nothing, it
  *    manifests the prior dirs plus one new dir of just the batch's rows.
  *  - Retention stays live: [[VersionedStore.expire]] keeps only recent
  *    versions (shared dirs survive as long as any live version reads
  *    them), and compaction is a `commit` (full snapshot) of `read()` —
  *    the same maintenance loop a Delta table runs.
  *
  * One stream per store: batch ids are monotone within a checkpoint, so
  * a single `batchId` key suffices (multiple writers would need the full
  * Delta (appId, version) pair — out of scope as documented). */
object VersionedStream {

  /** The last batch id committed to `root`, or -1 for none/empty store. */
  def lastBatchId(spark: org.apache.spark.sql.SparkSession, root: String): Long =
    VersionedStore.currentMeta(spark, root).get("batchId").map(_.toLong).getOrElse(-1L)

  /** Start appending `rows` (an append-mode streaming frame) to the
    * versioned table at `root`, one transactional commit per non-empty
    * micro-batch. */
  def startAppend(rows: DataFrame, root: String, checkpoint: String,
                  trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    rows.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(batch, batchId, root)
      }
      .start()

  /** One micro-batch's commit — factored out so the replay contract is
    * directly testable: re-invoking with an already-committed batchId is
    * a no-op (the table-side ledger wins over at-least-once delivery). */
  private[graft] def commitBatch(batch: DataFrame, batchId: Long, root: String): Unit = {
    val spark = batch.sparkSession
    // Ledger first: it's a metadata read, while isEmpty runs the batch's
    // whole pipeline — a replay of an already-committed batch must cost
    // manifest-open, not a recomputation of (e.g.) the LM scoring joins.
    if (batchId > lastBatchId(spark, root) && !batch.isEmpty) {
      VersionedStore.commitAppend(batch, root, Map("batchId" -> batchId.toString))
    }
  }

  /** Maintenance compaction: rewrite the current snapshot as ONE data dir
    * (a full-snapshot commit of `read()`), PRESERVING the commit metadata
    * — a replay arriving after compaction must still see the batchId
    * ledger, or exactly-once would silently lapse at every compaction.
    * Earlier versions (and their many small append dirs) then fall to
    * [[VersionedStore.expire]] on the usual maintenance cadence. */
  def compact(spark: org.apache.spark.sql.SparkSession, root: String): Long = {
    val df = VersionedStore.read(spark, root).getOrElse(
      throw new IllegalStateException(s"nothing committed at $root to compact"))
    VersionedStore.commit(df, root, VersionedStore.currentMeta(spark, root))
  }
}
