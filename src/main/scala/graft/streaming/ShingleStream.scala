package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming maintenance of the dedup family's stored artifact — the
  * loop that closes [[OnlineTimeStream.startToStore]]'s day-partition
  * upsert over the OTHER maintained table: each micro-batch of newly
  * ingested documents is shingled and appended to the
  * [[graft.operators.ShingleStore]], so the batch dedup/contamination
  * queries (`setjoin_pairs_stored`, `contamination_stored`,
  * `corpus_clean_stored`) always read a table that is current up to the
  * stream's watermark — no corpus re-shingle between ingests.
  *
  * Consistency story (the same contract as the batch [[graft.operators
  * .ShingleStore.append]], spec-gated there and here):
  *  - per-batch work is proportional to the BATCH (shingling is per-row);
  *  - df stamps stay CONSISTENT (one value per shingle) but go stale for
  *    overlapped shingles — candidate pruning quality, never results;
  *  - a [[graft.operators.ShingleStore.refreshDf]] after (or periodically
  *    between) batches restores exact df, and stream-maintained ≡ batch
  *    rebuild over the union corpus, row for row, df included.
  *
  * Delivery: foreachBatch is at-least-once on failure recovery — a batch
  * replayed after a crash between the append and the checkpoint commit
  * would append its rows twice. The day-partition path inherits
  * idempotency from dynamic partition overwrite; an append-shaped
  * artifact instead keeps a per-batch ledger: batch N's append is
  * recorded under `<checkpoint>/_appended/<N>` AFTER its rows land, and a
  * replayed batch that finds its record SKIPS the append — the
  * effectively-once trick for append sinks. The ledger lives in the
  * stream's own checkpoint directory (NOT the artifact path) because
  * [[graft.sinks.ArtifactStore.publish]] — which `refreshDf` rides —
  * atomically replaces the whole artifact directory and would wipe any
  * state kept inside it.
  */
object ShingleStream {

  /** Start maintaining the shingle artifact at `path` from a streaming
    * (doc_id, text) frame. First batch bootstraps the table if absent. */
  def startToStore(docs: DataFrame, path: String, checkpoint: String,
                   trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val ledgerDir = new org.apache.hadoop.fs.Path(s"$checkpoint/_appended")
        val mark = new org.apache.hadoop.fs.Path(ledgerDir, batchId.toString)
        if (!fs.exists(mark) && !batch.isEmpty) {
          if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/shingles")))
            graft.operators.ShingleStore.append(batch, path)
          else
            graft.operators.ShingleStore.write(batch, path)
          fs.mkdirs(ledgerDir)
          fs.create(mark, true).close()
        }
        ()
      }
      .start()

  /** ONLINE dedup-on-arrival: for each micro-batch, FIRST flag the
    * batch's near-duplicates against the corpus-so-far
    * ([[graft.operators.Dedup.minhashPairsIncremental]] over the stored
    * shingle+band artifact — batch-proportional work, corpus×corpus pairs
    * never generated), THEN append the batch to the artifact so later
    * batches dedup against it too. The composition a real ingest pipeline
    * runs: every document is checked exactly once, against exactly the
    * documents that arrived before it — which makes the emitted pair set
    * EQUAL to sequentially running the batch incremental operator per
    * ingest (spec-gated).
    *
    * Pairs land under `pairsPath/batch_id=<N>` with per-batch OVERWRITE:
    * a replayed batch (at-least-once foreachBatch) rewrites its own
    * partition instead of double-appending — the partition-overwrite twin
    * of the append ledger, which still guards the artifact append itself.
    * First batch bootstraps the store and emits no pairs (no corpus yet).
    *
    * Replay hardening (the crash window between the artifact append and
    * the ledger-mark create): a replayed batch finds a corpus that may
    * ALREADY contain its own rows — pairing the batch against itself
    * would emit spurious jaccard-1.0 self-pairs and overwrite the
    * batch's real pair partition with them. The corpus read therefore
    * ANTI-JOINS the batch's doc_ids out (batch-sized broadcast — no
    * corpus shuffle; a no-op on the normal non-replay path, where the
    * ids are disjoint by contract), restoring exactly the
    * corpus-as-of-before-this-batch the semantics promise. The append
    * itself goes through [[graft.operators.ShingleStore.appendOnce]]
    * (per-table presence probe on the batch's ids), so the replay can
    * never double-append the rows either. */
  def startDedupToStore(docs: DataFrame, path: String, pairsPath: String,
                        checkpoint: String, threshold: Double = 0.5,
                        trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val ledgerDir = new org.apache.hadoop.fs.Path(s"$checkpoint/_appended")
        val mark = new org.apache.hadoop.fs.Path(ledgerDir, batchId.toString)
        if (!fs.exists(mark) && !batch.isEmpty) {
          if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/shingles"))) {
            val batchIds = batch.select("doc_id").distinct()
            graft.operators.Dedup.minhashPairsIncremental(
                graft.operators.ShingleStore.read(spark, path).select("doc_id", "sh")
                  .join(broadcast(batchIds), Seq("doc_id"), "left_anti"),
                batch, threshold,
                corpusBands = Some(graft.operators.ShingleStore.readBands(spark, path)
                  .join(broadcast(batchIds), Seq("doc_id"), "left_anti")))
              .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
              .parquet(s"$pairsPath/batch_id=$batchId")
            graft.operators.ShingleStore.appendOnce(batch, path)
          } else {
            graft.operators.ShingleStore.write(batch, path)
          }
          fs.mkdirs(ledgerDir)
          fs.create(mark, true).close()
        }
        ()
      }
      .start()

  /** EXACT online dedup-on-arrival — [[startDedupToStore]] with the
    * approximate MinHash probe replaced by the exact incremental PPJoin
    * ([[graft.operators.SetJoin.similarPairsIncremental]]): every
    * micro-batch's TRUE threshold pairs against the corpus-so-far, then
    * the batch joins the artifact. Same per-batch-overwrite pairs layout,
    * same append ledger; the stored df stays consistent across appends
    * ([[graft.operators.ShingleStore.append]] reuses the stored value per
    * token), which is exactly the consistency the prefix order needs —
    * periodic `refreshDf` tightens candidate pruning but can never change
    * results. First batch bootstraps the store and emits no pairs.
    * Same replay hardening as [[startDedupToStore]]: the corpus read
    * anti-joins the batch's doc_ids (a replayed batch whose append
    * already landed must not pair against its own copy), and the append
    * is [[graft.operators.ShingleStore.appendOnce]] — a feature
    * advertised as EXACT cannot emit spurious self-pairs on recovery. */
  def startExactDedupToStore(docs: DataFrame, path: String, pairsPath: String,
                             checkpoint: String, threshold: Double = 0.5,
                             trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val ledgerDir = new org.apache.hadoop.fs.Path(s"$checkpoint/_appended")
        val mark = new org.apache.hadoop.fs.Path(ledgerDir, batchId.toString)
        if (!fs.exists(mark) && !batch.isEmpty) {
          if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/shingles"))) {
            val batchIds = batch.select("doc_id").distinct()
            graft.operators.SetJoin.similarPairsIncremental(
                graft.operators.ShingleStore.read(spark, path)
                  .join(broadcast(batchIds), Seq("doc_id"), "left_anti"),
                batch, threshold)
              .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
              .parquet(s"$pairsPath/batch_id=$batchId")
            graft.operators.ShingleStore.appendOnce(batch, path)
          } else {
            graft.operators.ShingleStore.write(batch, path)
          }
          fs.mkdirs(ledgerDir)
          fs.create(mark, true).close()
        }
        ()
      }
      .start()
}
