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
  *    commit stamps `meta("batch.<writerId>") = N`, and a batch with
  *    `N <= last committed for that writer` is SKIPPED. Unlike
  *    [[ShingleStream]]'s checkpoint-side marker files, the dedup record
  *    travels WITH the table: wiping the checkpoint cannot desynchronize
  *    ledger and data, because they commit in the same atomic manifest
  *    create.
  *  - MULTI-WRITER: the ledger is keyed per writer — the Delta
  *    (appId, version) pair — so several checkpointed streams can append
  *    to one store, each exactly-once. Every commit carries FORWARD all
  *    writers' entries (read base meta, merge own key, publish at base+1);
  *    the manifest create arbitrates, and a writer whose base went stale
  *    mid-commit gets [[VersionedStore.CommitConflict]] and retries from a
  *    fresh read — its merge can therefore never drop a concurrent
  *    writer's ledger entry or data.
  *  - `writerId` names a CHECKPOINT LINEAGE: batch ids are monotone only
  *    within one checkpoint, so a NEW stream (fresh checkpoint, new data)
  *    appending to an existing store must use a NEW writerId — its ids
  *    restart at 0, and under a reused writerId the ledger would silently
  *    skip them as replays. Under a fresh writerId the ledger starts at
  *    -1 and nothing is dropped.
  *  - Work per batch is O(batch): `commitAppendAt` rewrites nothing, it
  *    manifests the prior dirs plus one new dir of just the batch's rows.
  *  - Retention stays live: [[VersionedStore.expire]] keeps only recent
  *    versions (shared dirs survive as long as any live version reads
  *    them), and [[compact]] is a PINNED full-snapshot commit of the
  *    version it read — safe to run while streams are live.
  */
object VersionedStream {

  /** Ledger key for writers that don't name one — single-stream stores. */
  val DefaultWriter = "default"

  private def ledgerKey(writerId: String) = s"batch.$writerId"

  /** The last batch id `writerId` committed to `root`, or -1 for none.
    * (Reads the legacy un-keyed `batchId` record for the default writer,
    * so pre-multi-writer stores keep their exactly-once history.) */
  def lastBatchId(spark: org.apache.spark.sql.SparkSession, root: String,
                  writerId: String = DefaultWriter): Long =
    lastOf(VersionedStore.currentMeta(spark, root), writerId)

  private def lastOf(meta: Map[String, String], writerId: String): Long =
    meta.get(ledgerKey(writerId))
      .orElse(if (writerId == DefaultWriter) meta.get("batchId") else None)
      .map(_.toLong).getOrElse(-1L)

  /** Start appending `rows` (an append-mode streaming frame) to the
    * versioned table at `root`, one transactional commit per non-empty
    * micro-batch. `writerId` must be unique per (store, checkpoint
    * lineage) — see the class doc. `statsCols` records manifest min/max
    * stats per batch's data dir (one O(batch) aggregate riding each
    * commit), so the stream-MAINTAINED table is data-skippable the same
    * way a batch-built one is ([[VersionedStore.readAt]]'s `skip`) —
    * e.g. an event-time column makes later point reads open only the
    * batches whose range can hold the value. */
  def startAppend(rows: DataFrame, root: String, checkpoint: String,
                  writerId: String = DefaultWriter,
                  trigger: Trigger = Trigger.ProcessingTime(0L),
                  statsCols: Seq[String] = Seq.empty): StreamingQuery =
    rows.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(batch, batchId, root, writerId, statsCols)
      }
      .start()

  /** One micro-batch's commit — factored out so the replay contract is
    * directly testable: re-invoking with an already-committed batchId for
    * the same writer is a no-op (the table-side ledger wins over
    * at-least-once delivery). Read-modify-write on the ledger: (version,
    * meta) are read together, the writer's key merged in, and the commit
    * pinned at the read version — a concurrent writer's interleaved
    * commit surfaces as [[VersionedStore.CommitConflict]] and triggers a
    * re-read + retry, never a lost ledger entry. */
  private[graft] def commitBatch(batch: DataFrame, batchId: Long, root: String,
                                 writerId: String = DefaultWriter,
                                 statsCols: Seq[String] = Seq.empty): Unit = {
    val spark = batch.sparkSession
    // Ledger first: it's a metadata read, while isEmpty runs the batch's
    // whole pipeline — a replay of an already-committed batch must cost
    // manifest-open, not a recomputation of (e.g.) the LM scoring joins.
    if (batchId <= lastBatchId(spark, root, writerId) || batch.isEmpty) return
    var committed = false
    var conflicts = 0
    while (!committed) {
      val base = VersionedStore.currentVersion(spark, root)
      val meta = VersionedStore.metaAt(spark, root, base)
      if (batchId <= lastOf(meta, writerId)) return
      try {
        // Carry the base's LEDGER entries (every writer's watermark) plus
        // this writer's new position — never the base's descriptive
        // markers (a "delete"/"optimize" marker would otherwise ride
        // every later batch's manifest forever, misdescribing it).
        VersionedStore.commitAppendAt(batch, root, base,
          VersionedStore.ledgerEntries(meta) +
            (ledgerKey(writerId) -> batchId.toString), statsCols)
        committed = true
      } catch {
        case _: VersionedStore.CommitConflict =>
          // stale base: jittered backoff, re-read, retry
          VersionedStore.backoffOnConflict(conflicts); conflicts += 1
      }
    }
  }

  /** Maintenance compaction: rewrite the current snapshot as ONE data dir
    * (a full-snapshot commit of the pinned version), PRESERVING the commit
    * metadata — a replay arriving after compaction must still see every
    * writer's ledger, or exactly-once would silently lapse at each
    * compaction. LIVE-STREAM SAFE: snapshot, meta, and the target version
    * are all reads of one base version, and the commit is pinned there —
    * a micro-batch landing between read and publish makes the compaction
    * lose the manifest race and throw [[VersionedStore.CommitConflict]]
    * (retryable), instead of publishing a snapshot that silently drops
    * the interleaved batch's rows. Earlier versions (and their many small
    * append dirs) then fall to [[VersionedStore.expire]] on the usual
    * maintenance cadence. */
  def compact(spark: org.apache.spark.sql.SparkSession, root: String,
              statsCols: Seq[String] = Seq.empty): Long = {
    val base = VersionedStore.currentVersion(spark, root)
    if (base == 0)
      throw new IllegalStateException(s"nothing committed at $root to compact")
    val df = VersionedStore.readAt(spark, root, base)
    // Ledger-only carry + this op's own marker, like every other
    // maintenance commit (exactly-once survives compaction; stale
    // descriptive markers do not). `statsCols` lets the caller
    // reproduce the table's recorded stats on the compacted dir — a
    // maintenance rewrite must not degrade data skipping (the SQL
    // OPTIMIZE passes recordedStatsCols through here).
    VersionedStore.commitAt(df, root, base,
      VersionedStore.ledgerEntries(VersionedStore.metaAt(spark, root, base)) +
        ("compact" -> "full"),
      statsCols = statsCols)
  }
}
