package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Quality-gate-on-arrival — the composition of the round's two seams:
  * each micro-batch of newly ingested documents is scored against the
  * MAINTAINED bigram-LM artifact ([[graft.operators.LmStore]], trained
  * once per reference-corpus version) and the scored rows land in a
  * [[graft.sinks.VersionedStore]] table through [[VersionedStream]]'s
  * exactly-once append commit — so the downstream mixture/packing stages
  * always read a complete, transactional, time-travelable table of
  * quality scores that is current up to the stream's last batch.
  *
  * This is the streaming twin of the batch `lm_perplexity_stored` query
  * (the per-batch scoring arithmetic is the SAME `lmScoreWithModel`
  * tail, so streamed scores are bit-identical to batch scores — spec
  * gated), and the LM sibling of [[ShingleStream]]'s dedup-on-arrival.
  * Per-batch work: candidate-side joins only — the model is a read.
  *
  * Delivery: inherits [[VersionedStream]]'s table-side batchId ledger —
  * an at-least-once replay of a batch whose commit already landed is
  * skipped atomically, with the dedup record IN the table manifest. */
object LmStream {

  /** Start scoring the streaming (doc_id, text) frame `docs` against the
    * LM artifact at `modelPath`, appending scored rows to the versioned
    * table at `root`. */
  def startScoreToVersioned(docs: DataFrame, modelPath: String, root: String,
                            checkpoint: String,
                            trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        VersionedStream.commitBatch(
          graft.operators.LmStore.score(batch.sparkSession, modelPath, batch),
          batchId, root)
      }
      .start()
}
