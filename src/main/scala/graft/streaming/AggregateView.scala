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
  *  - DML-PROOF mode: feed the view the ROW-LEVEL change feed
  *    (versioned-cdc with `readChangeFeed = true`) and the additive
  *    aggregates stay exact under base-table DELETE/UPDATE too — each
  *    feed row contributes with sign +1/−1, a zeroed group persists as
  *    an `n_rows = 0` tombstone (filtered by [[read]], reclaimed by
  *    [[purgeTombstones]]), and min/max are rejected up front (a removed
  *    extremum cannot shrink a grow-only accumulator).
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

  /** The view's CANONICAL read: groups whose rows have all been deleted
    * under CDF maintenance remain stored as `n_rows = 0` TOMBSTONES (the
    * merge that zeroes a group and the ledger that makes it exactly-once
    * are ONE commit; a separate delete would reopen the crash window) —
    * this read filters them, so a fully-deleted group is invisible
    * exactly as a recompute would show. [[purgeTombstones]] reclaims the
    * rows offline. */
  def read(spark: org.apache.spark.sql.SparkSession, view: String): Option[DataFrame] =
    VersionedStore.read(spark, view).map(_.filter(col("n_rows") =!= 0L))

  /** Maintenance-window tombstone reclaim: physically delete the
    * `n_rows = 0` rows CDF maintenance left behind. Safe any time no
    * maintenance batch is mid-flight (same contract as the store's own
    * expire/vacuum); a no-op version-less call when none exist.
    * `keys` re-records the rewritten dirs' stats — the view's own
    * maintenance prunes its reads through key min/max, and a purge that
    * dropped them would silently grow every later batch's view-side read
    * back to O(view dirs). */
  def purgeTombstones(spark: org.apache.spark.sql.SparkSession, view: String,
                      keys: Seq[String]): Unit = {
    VersionedStore.deleteWhere(spark, view, col("n_rows") === 0L,
      statsCols = keys)
    ()
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
    if (batchId <= VersionedStream.lastBatchId(spark, derived, writerId)) return

    val kcols: Seq[Column] = keys.map(col)
    // SIGNED maintenance: a batch carrying `_change_type` is a row-level
    // change feed (the versioned-cdc source under readChangeFeed) — each
    // row contributes with weight +1 (insert, update_postimage) or −1
    // (delete, update_preimage), so the view stays EXACT under base-table
    // DELETE and UPDATE, not just appends. min/max cannot compose under
    // deletes (a removed extremum cannot shrink a grow-only accumulator),
    // so a signed feed with min/max configured fails loudly up front —
    // additive aggregates (count, sum, avg-at-read) are the DML-proof
    // surface, the same boundary Delta draws for incremental MVs.
    val signed = batch.columns.contains("_change_type")
    require(!signed || (minCols.isEmpty && maxCols.isEmpty),
      s"aggregate view on $derived: min/max are grow-only and cannot " +
        "compose under a row-level change feed (deletes) — drop them or " +
        "maintain from the insert-only feed")
    val w = if (signed)
      when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
        .otherwise(lit(-1L))
    else lit(1L)
    val src = batch.withColumn("__w", w)

    // AQE OFF for the maintenance window: every frame here is
    // batch-sized by construction and every store read is a pushed-down
    // single-dir scan, so AQE's runtime re-planning buys nothing — while
    // its stage-by-stage execution submits each tiny exchange as its OWN
    // scheduler job, multiplying the per-batch job constant this path
    // exists to keep flat. Disabled AFTER every fail-fast require above
    // (an exception between set and restore would leave the SHARED
    // session without AQE), restored in the enclosing finally, and
    // REFCOUNTED so concurrent views on one session can't race the
    // save/restore into persisting the disabled state.
    aqeDisable(spark)
    // NULL-as-zero applied IN the delta aggregate (not only at combine):
    // a group first seen with all-NULL values must store sum = 0 on the
    // first-batch adopt path exactly as it would after a merge — the
    // two commit paths may never disagree on a stored value. (A NULL
    // value's insert and its delete both skip the sum — symmetric.)
    val aggs = (coalesce(sum(col("__w")), lit(0L)).as("n_rows") +:
      sumCols.map(c => coalesce(sum(col(c) * col("__w")), lit(0L)).as(s"sum_$c"))) ++
      minCols.map(c => min(col(c)).as(s"min_$c")) ++
      maxCols.map(c => max(col(c)).as(s"max_$c"))
    // ONE materialization of the delta aggregate: everything downstream
    // (control checks, combine, the merge's probe/rewrite/write) reads
    // it repeatedly, and an unpinned plan would re-aggregate the batch
    // per consumer — most of the view's measured per-batch constant.
    // persist (lazy) rather than an eager checkpoint: the control
    // aggregate right below materializes the cache, so pinning costs no
    // job of its own.
    // The lazy-plan constructions below can throw (a sumCol missing from
    // the batch is an AnalysisException at groupBy/agg), so the refcount
    // decrement must be unconditional from here on.
    var deltas: DataFrame = null
    try {
    deltas = src.groupBy(kcols: _*).agg(aggs.head, aggs.tail: _*)
      .persist()
    // ONE control job over the cached deltas: emptiness, the NULL-key
    // gate, and the per-key delta ranges (which let the view-side read
    // prune through its own key stats below) share a single aggregate.
    val ctrlAggs = count(lit(1)).as("__n") +: keys.flatMap(k => Seq(
      count(when(col(k).isNull, lit(1))).as(s"__nulls_$k"),
      min(col(k)).cast("string").as(s"__mn_$k"),
      max(col(k)).cast("string").as(s"__mx_$k")))
    val ctrl = deltas.agg(ctrlAggs.head, ctrlAggs.tail: _*).head()
    if (ctrl.getAs[Long]("__n") == 0L) return // empty batch: nothing to commit
    require(keys.forall(k => ctrl.getAs[Long](s"__nulls_$k") == 0L),
      s"aggregate view on $derived: NULL group keys would fork the group " +
        s"under MERGE semantics — filter or coalesce the keys upstream")
    val deltaRanges = keys.flatMap { k =>
      Option(ctrl.getAs[String](s"__mn_$k")).map(mn =>
        VersionedStore.ColRange(k, Some(mn), Some(ctrl.getAs[String](s"__mx_$k"))))
    }

    var committed = false
    var conflicts = 0
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
          // Current values for only the TOUCHED keys: the delta key
          // ranges prune the view's dirs through its manifest stats
          // (statsCols = keys) BEFORE the broadcast semi-join — at
          // 100 TB a day-sliced batch opens only the view dirs its key
          // span overlaps.
          val touched = VersionedStore.readAt(spark, derived, base, deltaRanges)
            .join(broadcast(deltas.select(kcols: _*)), keys, "left_semi")
          // COMBINE as union + re-aggregate, not an outer join: additive
          // aggregates compose under their own functions (sum of {old,
          // delta} = old + delta with SQL's NULL-skipping giving the
          // declared null-as-zero semantics — the delta side is already
          // coalesced to 0, a legacy NULL accumulator adds as zero;
          // min/max of the pair ARE least/greatest-with-null-skip). One
          // aggregate replaces the join and its second broadcast build.
          val viewCols = kcols ++ (("n_rows" +: sumCols.map(c => s"sum_$c")) ++
            minCols.map(c => s"min_$c") ++ maxCols.map(c => s"max_$c")).map(col)
          val combAggs = (sum(col("n_rows")).as("n_rows") +:
            sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c"))) ++
            minCols.map(c => min(col(s"min_$c")).as(s"min_$c")) ++
            maxCols.map(c => max(col(s"max_$c")).as(s"max_$c"))
          val combined = touched.select(viewCols: _*)
            .unionByName(deltas.select(viewCols: _*))
            .groupBy(kcols: _*).agg(combAggs.head, combAggs.tail: _*)
            // Same single-materialization rationale as deltas: mergeInto
            // consumes its source several times (stats, probe, anti-join
            // rewrite, the data write); unpinned, each consumption would
            // re-read the view store and re-join. Lazy persist again —
            // mergeInto's own control aggregate materializes it.
            .persist()
          try VersionedStore.mergeInto(spark, derived, combined, keys = keys,
            statsCols = keys, meta = ledger)
          finally combined.unpersist(blocking = false)
        }
        committed = true
      } catch {
        case _: VersionedStore.CommitConflict =>
          // stale base: jittered backoff, re-read, retry
          VersionedStore.backoffOnConflict(conflicts); conflicts += 1
      }
    }
    } finally {
      if (deltas != null) deltas.unpersist(blocking = false)
      aqeRestore(spark)
    }
  }

  /** Refcount for the AQE-disabled maintenance window, PER SESSION: the
    * conf being saved/restored is session-scoped (`spark.conf`), so the
    * refcount must be too — a JVM-global counter would let a batch on
    * session B observe depth > 0 (opened by session A), never disable
    * its own AQE, and later "restore" A's saved value into B. The first
    * concurrent view batch ON A SESSION saves that session's value and
    * disables; the last restores — and removes the entry, so a
    * short-lived-sessions application never accumulates session graphs
    * in a JVM-global map. The remove races computeIfAbsent benignly:
    * disable re-checks IDENTITY under the state's own lock and loops if
    * its entry was evicted between fetch and lock. */
  private final class AqeState { var depth = 0; var saved = "true" }
  private val aqeStates =
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.sql.SparkSession, AqeState]()

  private def aqeDisable(spark: org.apache.spark.sql.SparkSession): Unit = {
    while (true) {
      val st = aqeStates.computeIfAbsent(spark, _ => new AqeState)
      st.synchronized {
        if (aqeStates.get(spark) eq st) { // not evicted since the fetch
          if (st.depth == 0) {
            st.saved = spark.conf.get("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.adaptive.enabled", "false")
          }
          st.depth += 1
          return
        }
      }
    }
  }

  private def aqeRestore(spark: org.apache.spark.sql.SparkSession): Unit = {
    val st = aqeStates.get(spark)
    if (st != null) st.synchronized {
      st.depth -= 1
      if (st.depth == 0) {
        spark.conf.set("spark.sql.adaptive.enabled", st.saved)
        aqeStates.remove(spark, st)
      }
    }
  }
}
