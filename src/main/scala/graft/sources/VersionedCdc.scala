package graft.sources

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.graft.StreamingFrame
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sinks.VersionedStore

/** STREAM FROM the versioned table — the read half of the Delta-style
  * loop whose write half is [[graft.streaming.VersionedStream]]. A
  * [[VersionedStore]] is already a change log (each append commit
  * references exactly one new data dir), so exposing it as a Structured
  * Streaming source costs only an offset mapping: **offset = committed
  * store version**. Each micro-batch reads
  * `readChanges(lastVersion, latestVersion)` — the rows of the data dirs
  * added in that version range, never a rescan of the table — and the
  * engine's checkpoint persists the version watermark, so a restarted
  * stream resumes exactly after the last version it processed. This is
  * how derived tables (indexes, aggregates, dedup state) follow a
  * 100 TB base table at batch-proportional cost: the base table IS the
  * queue, no second system.
  *
  * Mechanics (the V1 `Source` seam, same as Delta Lake's DeltaSource —
  * `getBatch` returns a DataFrame, so the store's manifest resolution,
  * schema-evolution union and stats plumbing are reused verbatim):
  *   - `getOffset` = the store's current committed version (a manifest
  *     pointer read — no data touched).
  *   - `getBatch((a, b])` = `readChanges(a, b)` re-stamped as a
  *     streaming frame. Data dirs are immutable once committed and stay
  *     referenced until [[VersionedStore.expire]], so a replayed range
  *     re-reads byte-identical rows — recovery-deterministic the way
  *     the engine requires.
  *   - Versions before `startVersion` (option, default 0 = everything)
  *     are never delivered.
  *
  * Contract edges, surfaced loudly rather than papered over:
  *   - A COMPACTION inside an unconsumed range makes dir-level changes
  *     undefined; `readChanges` throws and so does the stream — restart
  *     from a fresh checkpoint after a full re-read, exactly Delta's
  *     documented behavior when a stream falls behind a rewrite.
  *   - An EXPIRED `sinceVersion` (checkpoint older than retention)
  *     throws `IllegalStateException` — resume data is gone; silent
  *     re-delivery of the whole table would double-count downstream.
  *
  * Usage:
  * {{{
  * spark.readStream
  *   .format("graft.sources.VersionedCdc")
  *   .option("path", storeRoot)
  *   .load()
  * }}}
  *
  * Reference anchor: the reference app's ETL polls its store and
  * re-derives downstream tables on a timer (`etl.dart` cron handlers);
  * this source is that loop re-expressed as a Spark streaming seam with
  * exactly-once accounting instead of wall-clock trust. */
class VersionedCdc extends StreamSourceProvider with DataSourceRegister with Logging {

  override def shortName(): String = "versioned-cdc"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "versioned-cdc needs .option(\"path\", <store root>)"))

  /** Delta's option name, same semantics: `readChangeFeed = true`
    * streams ROW-LEVEL deltas (`_change_type`/`_commit_version` appended
    * to the store schema) via [[VersionedStore.readRowChanges]] — so a
    * DML or compaction inside an unconsumed range no longer kills the
    * stream: a DELETE arrives as delete rows a downstream consumer can
    * subtract, an UPDATE as exact preimage/postimage pairs, and a
    * row-identical rewrite (OPTIMIZE/compaction) contributes nothing. */
  private def cdfOf(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.trim.toBoolean)

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(VersionedCdc.sourceSchemaFor(
      sqlContext.sparkSession, rootOf(parameters), cdfOf(parameters))))

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val root = rootOf(parameters)
    val start = parameters.get("startVersion").map(_.toLong).getOrElse(0L)
    val maxVersions = parameters.get("maxVersionsPerBatch").map(_.toLong)
    maxVersions.foreach(n => require(n >= 1,
      s"maxVersionsPerBatch must be >= 1, got $n"))
    val cdf = cdfOf(parameters)
    new VersionedCdcSource(sqlContext.sparkSession, root, start,
      schema.getOrElse(
        VersionedCdc.sourceSchemaFor(sqlContext.sparkSession, root, cdf)),
      maxVersions, rowLevel = cdf)
  }
}

object VersionedCdc {
  /** The store's recorded schema (commit-time DDL — authoritative and
    * data-free) with a read-schema fallback for pre-recording stores.
    * The store must have at least one commit: a streaming source cannot
    * conjure a schema from an empty directory, same as a parquet path
    * stream. */
  private[graft] def storeSchema(spark: SparkSession, root: String): StructType = {
    val v = VersionedStore.currentVersion(spark, root)
    require(v > 0, s"versioned-cdc source needs a committed store at $root " +
      "(schema comes from the store; commit once before streaming)")
    VersionedStore.schemaAt(spark, root, v).map(StructType.fromDDL)
      .getOrElse(VersionedStore.readAt(spark, root, v).schema)
  }

  /** The source's declared schema: the store schema, plus the CDF
    * columns when row-level mode is on (the Delta CDF column names). */
  private[graft] def sourceSchemaFor(spark: SparkSession, root: String,
                                     cdf: Boolean): StructType = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField}
    val base = storeSchema(spark, root)
    if (!cdf) base
    else StructType(base.fields :+
      StructField("_change_type", StringType, nullable = false) :+
      StructField("_commit_version", LongType, nullable = false))
  }
}

/** The running source instance — see [[VersionedCdc]] for semantics.
  *
  * Admission control (the FileStreamSource/DeltaSource seam): the source
  * implements [[SupportsAdmissionControl]] so the engine asks
  * `latestOffset(start, limit)` instead of the uncapped `getOffset`, and
  * [[SupportsTriggerAvailableNow]] so `Trigger.AvailableNow` PINS the end
  * version at stream start (a commit racing the drain is left for the
  * next run — exact available-now semantics, no fallback warning). The
  * `maxVersionsPerBatch` option rate-limits each micro-batch to N store
  * versions — versions are this source's admission granularity the way
  * files are FileStreamSource's — so a backlogged resume drains in
  * bounded-memory batches (each a separate exactly-once commit
  * downstream) instead of one giant catch-up batch. */
private[graft] class VersionedCdcSource(spark: SparkSession, root: String,
                                        startVersion: Long,
                                        override val schema: StructType,
                                        maxVersionsPerBatch: Option[Long] = None,
                                        rowLevel: Boolean = false)
  extends Source
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow
  with Logging {

  import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit,
    ReadLimit, ReadMaxRows, Offset => ConnectorOffset}

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset       => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => throw new IllegalArgumentException(
      s"versioned-cdc got a foreign offset ${other.getClass.getName}")
  }

  private def versionOfConnector(o: ConnectorOffset): Long = o match {
    case v1: Offset => versionOf(v1)
    case other => throw new IllegalArgumentException(
      s"versioned-cdc got a foreign offset ${other.getClass.getName}")
  }

  /** Pinned end version for an AvailableNow run (None outside one). */
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowCap = Some(VersionedStore.currentVersion(spark, root))
    logInfo(s"versioned-cdc: AvailableNow pinned at v${availableNowCap.get}")
  }

  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerBatch.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  /** The engine's admission question: the next batch's end offset given
    * `limit`. `ReadMaxRows(n)` caps the batch at n VERSIONS past `start`;
    * an AvailableNow pin caps the whole run. Echoes `start` when nothing
    * new (the engine reads an unchanged offset as "no batch"). */
  override def latestOffset(startOffset: ConnectorOffset,
                            limit: ReadLimit): ConnectorOffset = {
    val start = Option(startOffset).map(versionOfConnector).getOrElse(startVersion)
    val current = VersionedStore.currentVersion(spark, root)
    val pinned = availableNowCap.fold(current)(math.min(current, _))
    val capped = maxRowsOf(limit) match {
      case Some(n) => math.min(pinned, start + n)
      case None    => pinned
    }
    if (capped > start) LongOffset(capped)
    else if (start > startVersion) LongOffset(start)
    else null
  }

  /** The per-batch version cap inside `limit`, if any. The engine may hand
    * a [[CompositeReadLimit]] (e.g. a minRows config composed alongside
    * maxVersionsPerBatch) — falling through to the uncapped pin there
    * would silently drain a backlogged resume in one giant batch, so the
    * composite is unwrapped the way FileStreamSource unwraps it: take the
    * contained ReadMaxRows component (the tightest, if several). */
  private def maxRowsOf(limit: ReadLimit): Option[Long] = limit match {
    case r: ReadMaxRows => Some(r.maxRows())
    case c: CompositeReadLimit =>
      val caps: Seq[Long] =
        c.getReadLimits.toSeq.collect { case r: ReadMaxRows => r.maxRows() }
      caps.reduceOption(math.min(_, _))
    case _ => None
  }

  override def reportLatestOffset(): ConnectorOffset = {
    val v = VersionedStore.currentVersion(spark, root)
    if (v > startVersion) LongOffset(v) else null
  }

  /** Latest committed version, or None before anything past
    * `startVersion` exists — a pointer read, O(1) in table size. (The
    * engine uses [[latestOffset]] for admission-control sources; this
    * stays for the plain-Source contract and direct callers.) */
  override def getOffset: Option[Offset] = {
    val v = VersionedStore.currentVersion(spark, root)
    if (v > startVersion) Some(LongOffset(v)) else None
  }

  /** The rows of versions (start, end] — the data dirs those commits
    * added. Column order is projected to the declared schema (dirs union
    * BY NAME across schema evolution; the engine aliases by POSITION). */
  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val since = start.map(versionOf).getOrElse(startVersion)
    val to = versionOf(end)
    val changed =
      (if (rowLevel) VersionedStore.readRowChanges(spark, root, since, to)
       else VersionedStore.readChanges(spark, root, since, to))
        .map { df =>
          val cols = schema.fieldNames.map(org.apache.spark.sql.functions.col)
          StreamingFrame.asStreaming(df.select(cols.toSeq: _*))
        }
    changed.getOrElse(StreamingFrame.emptyStreaming(spark, schema))
  }

  override def stop(): Unit = ()

  override def toString: String = s"VersionedCdc[$root from v$startVersion]"
}
