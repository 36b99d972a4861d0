package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.sinks.VersionedStore

/** INCREMENTALLY MAINTAINED AGGREGATE VIEW — a derived [[VersionedStore]]
  * holding `GROUP BY keys: count(*), sum(col)...` over the FULL history
  * of a base table, kept current by the change feed instead of recomputed:
  * the materialized-view half of the Delta-style loop, composing the
  * engine's existing seams ([[graft.sources.VersionedCdc]] for the read,
  * [[VersionedStore.mergeInto]] for the write).
  *
  * Per micro-batch (the 100 TB shape — every step batch-proportional):
  *  1. DELTAS: `batch.groupBy(keys).agg(...)` — O(batch), map-side
  *     combined by Catalyst; the batch never joins the base table.
  *  2. READ-MODIFY: current view rows for ONLY the touched keys (a
  *     broadcast semi-join of the view against the delta keys; the view
  *     read itself is manifest-resolved and stats-skippable).
  *  3. COMBINE: outer-join deltas with the touched rows, add counts and
  *     sums (additive aggregates compose: new = old + delta).
  *  4. UPSERT: [[VersionedStore.mergeInto]] on `keys` — dir-granular
  *     copy-on-write bounded by the source-derived key ranges, so a
  *     day-sliced batch rewrites the view dirs its days touch, nothing
  *     else.
  *
  * Exactly-once: the same table-side per-writer batch ledger as
  * [[VersionedStream]] — the ledger key rides the MERGE commit's meta
  * (meta carry-forward keeps every other writer's entries), so an
  * at-least-once foreachBatch replay of a committed batch is skipped on
  * a manifest read, and the combine step can never double-add a delta.
  *
  * Aggregate surface:
  *  - count(*) (`n_rows`) and sum (`sum_<col>`) — additive, exact under
  *    inserts.
  *  - min/max (`min_<col>`/`max_<col>`) — GROW-ONLY composition
  *    (least/greatest of old and delta): exact under the change feed's
  *    insert-only contract. A base-table DELETE could strand a stale
  *    extremum; the feed itself refuses rewrites (readChanges throws),
  *    so the view can never silently drift — re-baseline after a rewrite.
  *  - avg: carried as sum+count and divided at read ([[avgAt]] — never
  *    stored, because averages do not compose).
  *
  * Constraints (enforced loudly):
  *  - Group keys must be NON-NULL in every batch: a NULL key tuple never
  *    matches in a SQL MERGE, so each replayed batch would INSERT a new
  *    NULL-group row instead of updating the old one. applyBatch throws
  *    on a NULL-keyed delta rather than silently forking the group.
  *
  * Reference anchor: the reference app recomputes its daily aggregates
  * from full table scans on a timer (`etl.dart` cron handlers); this
  * operator is that loop at change-feed cost with transactional reads. */
object AggregateView {

  /** Start maintaining the view at `derived` from `changes` (a streaming
    * frame — normally the [[graft.sources.VersionedCdc]] source over the
    * base store). `sumCols` are the columns to sum (each lands as
    * `sum_<col>`); the row count lands as `n_rows`. */
  def start(changes: DataFrame, derived: String, checkpoint: String,
            keys: Seq[String], sumCols: Seq[String],
            minCols: Seq[String] = Seq.empty, maxCols: Seq[String] = Seq.empty,
            writerId: String = VersionedStream.DefaultWriter,
            trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    changes.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, derived, keys, sumCols, minCols, maxCols, writerId)
      }
      .start()

  /** Read helper for the non-composable aggregate: `avg_<col>` derived at
    * read time as sum/count — the documented way to get averages out of
    * an additive view. */
  def avgAt(view: DataFrame, sumCols: Seq[String]): DataFrame =
    sumCols.foldLeft(view) { (df, c) =>
      df.withColumn(s"avg_$c", col(s"sum_$c").cast("double") / col("n_rows"))
    }

  /** One micro-batch's view maintenance — factored out so the replay
    * contract is directly testable (same pattern as
    * [[VersionedStream.commitBatch]]). Ledger check first: a replayed
    * batch costs a manifest read, never a recombine. */
  private[graft] def applyBatch(batch: DataFrame, batchId: Long, derived: String,
                                keys: Seq[String], sumCols: Seq[String],
                                minCols: Seq[String] = Seq.empty,
                                maxCols: Seq[String] = Seq.empty,
                                writerId: String = VersionedStream.DefaultWriter): Unit = {
    val spark = batch.sparkSession
    if (batchId <= VersionedStream.lastBatchId(spark, derived, writerId) ||
      batch.isEmpty) return

    val kcols: Seq[Column] = keys.map(col)
    val aggs = (count(lit(1)).as("n_rows") +:
      sumCols.map(c => sum(col(c)).as(s"sum_$c"))) ++
      minCols.map(c => min(col(c)).as(s"min_$c")) ++
      maxCols.map(c => max(col(c)).as(s"max_$c"))
    val deltas = batch.groupBy(kcols: _*).agg(aggs.head, aggs.tail: _*)
    require(deltas.filter(keys.map(col(_).isNull).reduce(_ || _)).isEmpty,
      s"aggregate view on $derived: NULL group keys would fork the group " +
        s"under MERGE semantics — filter or coalesce the keys upstream")

    var committed = false
    while (!committed) {
      val base = VersionedStore.currentVersion(spark, derived)
      val meta = VersionedStore.metaAt(spark, derived, base)
      if (batchId <= meta.get(s"batch.$writerId").map(_.toLong).getOrElse(-1L)) return
      val ledger = Map(s"batch.$writerId" -> batchId.toString)
      try {
        if (base == 0) {
          // First batch IS the view (mergeInto needs a committed base).
          VersionedStore.commit(deltas, derived, meta = ledger,
            statsCols = keys)
        } else {
          // Current values for only the TOUCHED keys (broadcast
          // semi-join; at 100 TB the view read is also stats-skippable).
          val touched = VersionedStore.readAt(spark, derived, base)
            .join(broadcast(deltas.select(kcols: _*)), keys, "left_semi")
          // BOTH sides coalesce on the additive columns: a batch whose
          // values are all NULL for a group yields a NULL sum delta, and
          // old + NULL = NULL would silently overwrite the accumulated
          // value under the MERGE's full-row replace. NULL-as-zero is the
          // view's declared sum semantics (adding no non-NULL values
          // changes nothing). min/max compose via least/greatest, which
          // SKIP nulls (null only when both sides are) — the same
          // stale-proof behavior without a sentinel.
          val addCols = "n_rows" +: sumCols.map(c => s"sum_$c")
          val combined = deltas.alias("d")
            .join(touched.alias("t"), keys, "left_outer")
            .select(kcols ++
              addCols.map { v =>
                (coalesce(col(s"t.$v"), lit(0L)) +
                  coalesce(col(s"d.$v"), lit(0L))).as(v)
              } ++
              minCols.map { c =>
                least(col(s"t.min_$c"), col(s"d.min_$c")).as(s"min_$c") } ++
              maxCols.map { c =>
                greatest(col(s"t.max_$c"), col(s"d.max_$c")).as(s"max_$c") }: _*)
          VersionedStore.mergeInto(spark, derived, combined, keys = keys,
            statsCols = keys, meta = ledger)
        }
        committed = true
      } catch {
        case _: VersionedStore.CommitConflict => () // stale base: re-read, retry
      }
    }
  }
}
