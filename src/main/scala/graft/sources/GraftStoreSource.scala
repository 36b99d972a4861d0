package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeReference, BoundReference, Cast, EqualTo, Expression,
  GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal,
  Predicate => CatalystPredicate}
import org.apache.spark.sql.execution.datasources.{
  FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.graft.StreamingFrame
import org.apache.spark.sql.sources.{
  BaseRelation, CreatableRelationProvider, DataSourceRegister, Filter,
  PrunedFilteredScan, PrunedScan, RelationProvider, SchemaRelationProvider,
  StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{StringType, StructType}

import graft.sinks.VersionedStore
import graft.sinks.VersionedStore.ColRange

/** `spark.read.format("graftstore")` / `df.write.format("graftstore")` —
  * the [[graft.sinks.VersionedStore]] as a first-class Spark data source,
  * so the tables the reference serves from its store (the upserted
  * leaderboards and daily snapshots of `lib/src/etl.dart:271,:351-358`)
  * are reachable from plain `spark.sql` without importing this library's
  * API: `CREATE TABLE t USING graftstore OPTIONS (path '...')` then any
  * SQL over it, with manifest-stats data skipping applied to pushed
  * filters.
  *
  * Architecture is the public Delta Lake move, not DSv2-for-its-own-sake:
  * Delta's path reads also enter through a V1 `RelationProvider` whose
  * relation is a `HadoopFsRelation` over a LOG-BACKED `FileIndex`
  * (Delta's `TahoeLogFileIndex`), because that is the seam where ALL of
  * Spark's file-source machinery — vectorized parquet readers, row-group
  * predicate pushdown, whole-stage codegen, partition pruning, AQE —
  * comes for free, and only file LISTING is replaced by the transaction
  * log. [[GraftFileIndex]] is that piece: `listFiles` receives the
  * pushed partition+data filters as Catalyst expressions, converts the
  * simple comparisons to [[VersionedStore.ColRange]]s, and lets the
  * manifest's per-dir min/max stats skip whole data dirs before a single
  * parquet footer is opened. Skipping is an optimization, never a
  * filter: unconvertible predicates keep every dir, and Spark re-applies
  * every filter above the scan regardless.
  *
  * At 100 TB this is the difference between "a point read opens two
  * dirs" and "a point read lists the table": the same dir-granular
  * skipping [[VersionedStore.readAt]] does for API users, surfaced to
  * every SQL/BI consumer of the session. Time travel rides an option
  * (`versionAsOf`), writes map `SaveMode.Append`/`Overwrite` onto the
  * store's transactional commits, and a column-mapped store (one that
  * has seen [[VersionedStore.renameColumn]]) falls back to a row-based
  * relation that reads through the store's own alias layer — correct
  * first, vectorized where the physical names allow it. */
final class GraftStoreSource extends RelationProvider
    with SchemaRelationProvider
    with CreatableRelationProvider with DataSourceRegister
    with StreamSourceProvider with StreamSinkProvider {

  override def shortName(): String = "graftstore"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graftstore requires a path: .load(root) or OPTIONS (path '...')"))

  // ── Streaming halves: ONE format string for all four surfaces, the
  // Delta ergonomics. readStream delegates to the versioned-cdc source
  // (all its options ride through: startVersion, maxVersionsPerBatch,
  // readChangeFeed); writeStream is the exactly-once transactional
  // table sink — one store commit per micro-batch with the (writerId,
  // batchId) ledger in the manifest, so an at-least-once replay of a
  // committed batch is a metadata no-op, never a duplicate append.

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    new VersionedCdc().sourceSchema(sqlContext, schema, providerName, parameters)

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source =
    new VersionedCdc().createSource(
      sqlContext, metadataPath, schema, providerName, parameters)

  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val root = rootOf(parameters)
    require(outputMode == OutputMode.Append(),
      s"graftstore sink is append-only (a transactional table append per " +
        s"micro-batch); got $outputMode")
    // The store's layout contract partitions by `day` exactly when the
    // frame carries that column — a user's partitionBy(...) asking for
    // anything else must fail loudly, not be silently discarded.
    require(partitionColumns.isEmpty || partitionColumns == Seq("day"),
      s"graftstore partitions by its own contract (hive `day=` dirs when " +
        s"the frame has a day column); partitionBy(${partitionColumns.mkString(", ")}) " +
        "is not supported — drop it, or name the column day")
    val writerId = parameters.getOrElse(
      "writerId", graft.streaming.VersionedStream.DefaultWriter)
    val statsCols = parameters.get("statsCols").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    new org.apache.spark.sql.execution.streaming.Sink {
      override def addBatch(batchId: Long, data: org.apache.spark.sql.DataFrame): Unit =
        graft.streaming.VersionedStream.commitBatch(
          StreamingFrame.asBatch(data), batchId, root, writerId, statsCols)
      override def toString: String = s"GraftStoreSink[$root as $writerId]"
    }
  }

  /** [[SchemaRelationProvider]] half — the LOG is the schema authority
    * (the Delta stance): the schema Spark hands in is IGNORED and the
    * recorded log schema serves the relation. This exists because a
    * `CREATE TABLE ... USING graftstore` entry freezes its
    * creation-time schema in the catalog, and without this seam Spark's
    * resolver REJECTS the table the first time the store evolves
    * (rename/drop/widen/add): "user-specified schema does not match the
    * actual schema". Catalog entries therefore keep reading across any
    * evolution; `DESCRIBE` accuracy is restored by the ALTER commands'
    * catalog sync. An explicit `spark.read.schema(x)` also lands here
    * and also gets the log schema — a fixed reader contract is the
    * streaming API's job, not the batch one's. Because that departs
    * from the standard Spark contract (user schema wins), a supplied
    * schema that DIFFERS from the recorded log schema is warned about
    * loudly instead of silently ignored — the caller is about to get a
    * differently-shaped frame than the one they declared. */
  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String],
                              schema: StructType): BaseRelation = {
    val rel = relationFor(sqlContext, parameters)
    // names+types comparison, not StructType equality: nullability and
    // field metadata legitimately drift through catalog round-trips and
    // must not produce a false alarm on every catalog-table read
    def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq
    if (shape(schema) != shape(rel.schema) &&
        GraftStoreSource.shouldWarnSchemaMismatch(rootOf(parameters)))
      System.err.println(
        s"[graftstore] WARNING: the supplied reader schema is ignored — " +
          s"the transaction log is the schema authority for " +
          s"${rootOf(parameters)}. Supplied: ${schema.toDDL}; serving the " +
          s"recorded: ${rel.schema.toDDL}")
    rel
  }

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation =
    relationFor(sqlContext, parameters)

  private def relationFor(sqlContext: SQLContext,
                          parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    // BATCH change-feed read — Delta's own surface:
    //   spark.read.format("graftstore").option("readChangeFeed", "true")
    //     .option("startingVersion" | "startingTimestamp", ...)
    //     [.option("endingVersion" | "endingTimestamp", ...)].load(root)
    // Bounds are INCLUSIVE commit versions (timestamps resolve through
    // the publish-stamped commit clock: start → first commit stamped
    // at/after, end → floor), the same contract as the table_changes
    // TVF. Without this seam the option would be silently IGNORED and a
    // CDF consumer would read the SNAPSHOT — wrong rows, not an error.
    // (The STREAMING half of the same option rides createSource →
    // versioned-cdc, unchanged.)
    if (parameters.get("readChangeFeed").exists(_.trim.toBoolean))
      return cdfBatchRelation(spark, root, parameters)
    // timestampAsOf resolves to a version FIRST (epoch millis, ISO
    // instant, or session-zoned date[time] — see parseTravelTimestamp),
    // then rides the same pinned-relation path as versionAsOf.
    val tsAsOf = parameters.get("timestampAsOf").map(t =>
      VersionedStore.versionAtTimestamp(spark, root,
        VersionedStore.parseTravelTimestamp(t,
          spark.sessionState.conf.sessionLocalTimeZone)))
    val versionAsOf = parameters.get("versionAsOf").map(_.trim.toLong)
    require(versionAsOf.isEmpty || tsAsOf.isEmpty,
      "versionAsOf and timestampAsOf are mutually exclusive — pick one " +
        "travel axis")
    val (v, dirs, ddlOpt, colmap, dvMap) =
      VersionedStore.relationSnapshot(spark, root, versionAsOf.orElse(tsAsOf))
    val ddl = ddlOpt.getOrElse(throw new IllegalArgumentException(
      s"$root records no schema (written before schema recording) — " +
        "read it via VersionedStore.readAt"))
    val logical = StructType.fromDDL(ddl)
    // HadoopFsRelation's schema is dataSchema ++ partitionSchema — a
    // recorded schema with `day` anywhere but last would expose a
    // DIFFERENT column order through SELECT * than the store's own read
    // and the recorded DDL. Those stores (and column-mapped ones) route
    // through the marker relation, whose upgrade rule restores the
    // recorded order with a projection.
    val dayNotLast = logical.fieldNames.contains("day") &&
      logical.fieldNames.last != "day"
    // A session WITHOUT the graft extensions must never be handed a
    // HadoopFsRelation — from EITHER overload: Spark's own
    // DataSourceAnalysis would convert `INSERT INTO t` over it into a
    // raw parquet file-write into the store root — committed-looking
    // rows invisible to every reader (the manifest stays the truth) —
    // and `INSERT OVERWRITE` is worse: InsertIntoHadoopFsRelationCommand
    // DELETES the output path (the store root, manifests included)
    // before the write job even starts, so no write-time guard can save
    // it. Catalog tables are not the only INSERT targets: a TEMP VIEW
    // over a plain path load (`spark.read...load(root)
    // .createOrReplaceTempView("v")` then `INSERT OVERWRITE TABLE v`)
    // reaches the same command with no catalog identity at all — so the
    // routing must not distinguish the seams. The marker relation closes
    // every shape: reads stay correct (the store's own row path), and
    // every SQL write against it dies loudly in Spark's PreWriteCheck
    // ("does not allow insertion") with zero filesystem side effects.
    // Sessions built with GraftExtensions keep the vectorized relation —
    // there GraftDmlRule intercepts INSERT before execution and routes
    // it through the transactional commit.
    val dmlGuarded = spark.sessionState.analyzer.postHocResolutionRules
      .contains(graft.plans.GraftDmlRule)
    // A snapshot carrying DELETION VECTORS must read through the store's
    // own row path — a raw file scan (HadoopFsRelation, or the
    // vectorized upgrade) would resurrect every deleted row. The row
    // relation applies the DVs inside readAt; OPTIMIZE (any rewrite)
    // drops them and restores the vectorized door.
    if (colmap.nonEmpty || dayNotLast || !dmlGuarded || dvMap.nonEmpty)
      // Rename-mapped (or day-not-last) store: physical parquet names /
      // positions differ from the logical schema, and HadoopFsRelation
      // has no alias layer. This relation is CORRECT standalone — it
      // reads through the store's own path (physical-schema requests per
      // dir, aliased back), row-based — and sessions built with
      // GraftExtensions upgrade it to a vectorized physical-schema scan
      // under an alias projection ([[GraftStoreVectorizeRule]]), so SQL
      // consumers keep the vectorized parquet reader and codegen even
      // after a metadata-only rename.
      new GraftStoreRowRelation(spark, root, v, logical, colmap, dirs,
        pinned = versionAsOf.isDefined || tsAsOf.isDefined,
        hasDv = dvMap.nonEmpty)
    else {
      val index = new GraftFileIndex(spark, root, v, dirs, logical,
        pinned = versionAsOf.isDefined || tsAsOf.isDefined)
      HadoopFsRelation(index, index.partitionSchema, index.dataSchema,
        bucketSpec = None, new GraftGuardedParquetFormat(root), Map.empty)(spark)
    }
  }

  /** The batch CDF window as a relation (see [[relationFor]]'s option
    * doc). Resolution mirrors the `table_changes` TVF exactly: an empty
    * window (start past the current version — the caught-up CDC
    * poller's shape) is a zero-row frame with the CDF schema, a NUMERIC
    * end past the current version is readRowChanges' loud "does not
    * exist", and a timestamp end floors to current. */
  private def cdfBatchRelation(spark: SparkSession, root: String,
                               parameters: Map[String, String]): BaseRelation = {
    require(parameters.get("versionAsOf").isEmpty &&
        parameters.get("timestampAsOf").isEmpty,
      "readChangeFeed and time travel are mutually exclusive — the feed " +
        "IS a version range")
    val zone = spark.sessionState.conf.sessionLocalTimeZone
    val cur = VersionedStore.currentVersion(spark, root)
    val sv = parameters.get("startingVersion").map(_.trim.toLong)
    val st = parameters.get("startingTimestamp").map { s =>
      // first commit stamped AT OR AFTER the timestamp: resolve the
      // floor of (ts - 1) and step past it; a ts before every stamp
      // floors to nothing → start at version 1
      val ts = VersionedStore.parseTravelTimestamp(s, zone)
      val floor = try VersionedStore.versionAtTimestamp(spark, root,
        ts - 1, canReturnLastCommit = true)
      catch { case _: IllegalArgumentException => 0L }
      floor + 1
    }
    require(sv.isEmpty || st.isEmpty,
      "startingVersion and startingTimestamp are mutually exclusive")
    val start = sv.orElse(st).getOrElse(throw new IllegalArgumentException(
      "readChangeFeed needs startingVersion or startingTimestamp " +
        "(inclusive, Delta's contract)"))
    require(start >= 1,
      s"startingVersion must be >= 1 (the first commit), got $start")
    val ev = parameters.get("endingVersion").map(_.trim.toLong)
    val et = parameters.get("endingTimestamp").map(s =>
      VersionedStore.versionAtTimestamp(spark, root,
        VersionedStore.parseTravelTimestamp(s, zone),
        canReturnLastCommit = true))
    require(ev.isEmpty || et.isEmpty,
      "endingVersion and endingTimestamp are mutually exclusive")
    val end = ev.orElse(et).getOrElse(cur)
    val frame = VersionedStore.readRowChanges(spark, root,
        (start - 1) min cur, end)
      .getOrElse(spark.createDataFrame(
        new java.util.ArrayList[Row](),
        VersionedCdc.sourceSchemaFor(spark, root, cdf = true)))
    new GraftCdfBatchRelation(spark, frame)
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: org.apache.spark.sql.Dataset[Row]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    val statsCols = parameters.get("statsCols").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val mergeSchema = parameters.get("mergeSchema").exists(_.trim.toBoolean)
    val exists = VersionedStore.currentVersion(spark, root) > 0
    mode match {
      case SaveMode.Append =>
        VersionedStore.commitAppend(data.toDF(), root,
          statsCols = statsCols, mergeSchema = mergeSchema)
      case SaveMode.Overwrite =>
        VersionedStore.commit(data.toDF(), root, statsCols = statsCols)
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"$root already holds a committed version and mode is ErrorIfExists")
        VersionedStore.commit(data.toDF(), root, statsCols = statsCols)
      case SaveMode.Ignore =>
        if (!exists)
          VersionedStore.commit(data.toDF(), root, statsCols = statsCols)
    }
    createRelation(sqlContext, parameters)
  }
}

object GraftStoreSource {

  /** Roots already warned about a supplied-vs-recorded schema mismatch
    * (once per root per JVM): a catalog table whose catalog schema
    * drifted (a mergeSchema append without catalog sync) lands in
    * [[GraftStoreSource.createRelation]] on EVERY read, and an unthrottled
    * warning would spam interactive sessions — the caches that make
    * repeat reads cheap make repeat warnings worthless. */
  private val warnedSchemaRoots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private[graft] def shouldWarnSchemaMismatch(root: String): Boolean =
    warnedSchemaRoots.add(root)
  /** Spec hook: re-arm the once-per-JVM schema-mismatch warning. */
  private[graft] def resetSchemaMismatchWarnings(): Unit =
    warnedSchemaRoots.clear()

  /** Split a conjunction into its conjuncts. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** A literal rendered in the stats' external string form — via the
    * SAME `Cast(_, StringType)` the stats aggregation uses
    * (`min(col).cast("string")`), so a pushed `day = DATE'2024-01-15'`
    * compares against recorded min/max in an identical serialization
    * (dates as `2024-01-15`, numerics as plain digits). NULL literals
    * convert to no bound (the dir is kept; NULL never matches a
    * comparison anyway). SESSION-ZONED TIMESTAMPS never convert: their
    * string form depends on the session time zone, and a reader zoned
    * differently from the writer would compare apples to oranges and
    * PRUNE A DIR THAT MATCHES — wrong rows, not just a slow plan. The
    * zoneless types (date, timestamp_ntz) are safe. */
  private def statForm(l: Literal): Option[String] =
    if (l.value == null ||
        l.dataType == org.apache.spark.sql.types.TimestampType) None
    else Option(Cast(l, StringType, Some(SQLConf.get.sessionLocalTimeZone))
      .eval(InternalRow.empty)).map(_.toString)

  /** The manifest-skippable ranges implied by pushed Catalyst filters:
    * bare-attribute-vs-literal comparisons only. Cast-wrapped attributes
    * are deliberately NOT matched — a cast can reorder values (int cast
    * to string compares lexically) and a wrong skip is a wrong answer;
    * the analyzer folds literal-side casts, so same-type comparisons
    * (the common case after analysis) arrive bare. */
  private[sources] def toColRanges(filters: Seq[Expression]): Seq[ColRange] =
    filters.flatMap(conjuncts).flatMap {
      case EqualTo(a: AttributeReference, l: Literal) =>
        statForm(l).map(v => ColRange(a.name, Some(v), Some(v)))
      case EqualTo(l: Literal, a: AttributeReference) =>
        statForm(l).map(v => ColRange(a.name, Some(v), Some(v)))
      case GreaterThan(a: AttributeReference, l: Literal) =>
        statForm(l).map(v => ColRange(a.name, Some(v), None))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        statForm(l).map(v => ColRange(a.name, Some(v), None))
      case LessThan(a: AttributeReference, l: Literal) =>
        statForm(l).map(v => ColRange(a.name, None, Some(v)))
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        statForm(l).map(v => ColRange(a.name, None, Some(v)))
      case GreaterThan(l: Literal, a: AttributeReference) =>
        statForm(l).map(v => ColRange(a.name, None, Some(v)))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        statForm(l).map(v => ColRange(a.name, None, Some(v)))
      case LessThan(l: Literal, a: AttributeReference) =>
        statForm(l).map(v => ColRange(a.name, Some(v), None))
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        statForm(l).map(v => ColRange(a.name, Some(v), None))
      case _ => None
    }

  /** Ranges expanded across the column-mapping epochs: per-dir stats
    * key under the LOGICAL name current at that dir's write, so after a
    * rename the table holds dirs keyed under the OLD name (= the birth
    * physical) AND dirs keyed under the NEW logical — one range matches
    * only its own epoch and silently keeps the other's dirs. Emitting
    * the range under BOTH names restores skipping on every epoch, and
    * is sound: `pruneWithStats` keeps any dir lacking stats for a
    * range's column, and a historical column that happened to use the
    * twin name reads as NULL under the current column in its dirs —
    * rows that cannot satisfy the pushed comparison anyway. */
  private[graft] def expandAcrossMapping(rs: Seq[ColRange],
                                           colmap: Map[String, String]): Seq[ColRange] =
    if (colmap.isEmpty) rs
    else {
      val p2l = colmap.map(_.swap)
      rs.flatMap { r =>
        Seq(r) ++
          colmap.get(r.column).filterNot(_ == r.column)
            .map(p => r.copy(column = p)) ++
          p2l.get(r.column).filterNot(_ == r.column)
            .map(l => r.copy(column = l))
      }
    }

  /** V1 `sources.Filter` edition of [[toColRanges]] (the rename-fallback
    * relation receives these instead of Catalyst expressions). Values
    * arrive as external Scala types; `Literal(_)` + the shared
    * [[statForm]] keeps the serialization identical. */
  private[sources] def toColRangesV1(filters: Seq[Filter]): Seq[ColRange] = {
    import org.apache.spark.sql.{sources => f1}
    def form(v: Any): Option[String] =
      try statForm(Literal(v)) catch { case _: Throwable => None }
    filters.flatMap {
      case f1.EqualTo(c, v)            => form(v).map(s => ColRange(c, Some(s), Some(s)))
      case f1.GreaterThan(c, v)        => form(v).map(s => ColRange(c, Some(s), None))
      case f1.GreaterThanOrEqual(c, v) => form(v).map(s => ColRange(c, Some(s), None))
      case f1.LessThan(c, v)           => form(v).map(s => ColRange(c, None, Some(s)))
      case f1.LessThanOrEqual(c, v)    => form(v).map(s => ColRange(c, None, Some(s)))
      case f1.And(l, r)                => toColRangesV1(Seq(l)) ++ toColRangesV1(Seq(r))
      case _                           => None
    }
  }
}

/** The transaction-log-backed `FileIndex` (the `TahoeLogFileIndex` role):
  * the dir set comes from the manifest — never a directory walk — and
  * `listFiles` PRUNES FIRST, LISTS AFTER: pushed filters convert to
  * stats ranges, and only the SURVIVING dirs are ever listed (a pruned
  * point read on a 10⁵-dir table touches the filesystem for ~1 dir, not
  * 10⁵ — the property that makes the log the index, not the FS). Dirs
  * are immutable once committed, so per-dir listings cache permanently.
  *
  * Partition discovery rides the WRITER'S CONTRACT, not a listing probe:
  * [[VersionedStore]]'s write path hive-partitions a dir by `day=`
  * exactly when the frame carries a `day` column, so the recorded schema
  * containing `day` IS the partition declaration (a listing probe would
  * be unsound under schema evolution: sampling a pre-evolution dir would
  * misread `day` as a data column and NULL it out of every file). Dirs
  * written before an evolved `day` column contribute a NULL partition
  * value — the same read-as-NULL the store's own reader gives them.
  *
  * `sizeInBytes` (the planner's broadcast-decision question, asked on
  * EVERY query) answers from the manifest's per-dir `#|bytes` stats when
  * every dir carries them — the Delta-log file-size role — and falls
  * back to one full listing (cached) for stores written before byte
  * stats existed. */
final class GraftFileIndex(spark: SparkSession, val root: String,
                           val version: Long, dirs: Seq[String],
                           fullSchema: StructType,
                           val pinned: Boolean = false,
                           colmap: Map[String, String] = Map.empty)
    extends FileIndex {
  import GraftStoreSource.{expandAcrossMapping, toColRanges}

  private val fsys =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  /** The writer's partitioning contract (see class doc). */
  private val partCols: Seq[String] =
    if (fullSchema.fieldNames.contains("day")) Seq("day") else Seq.empty

  override val partitionSchema: StructType =
    StructType(fullSchema.filter(f => partCols.contains(f.name)))

  /** The schema physically inside the parquet files. */
  val dataSchema: StructType =
    StructType(fullSchema.filterNot(f => partCols.contains(f.name)))

  /** Per-dir listings — (partition value if hive-partitioned, files) —
    * cached forever (committed dirs are immutable). */
  private val dirCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(Option[(String, String)], Seq[FileStatus])]]()

  private def dataFiles(sts: Seq[FileStatus]): Seq[FileStatus] =
    sts.filter(s => s.isFile && {
      val n = s.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    })

  private def listOne(d: String): Seq[(Option[(String, String)], Seq[FileStatus])] =
    dirCache.computeIfAbsent(d, { dir =>
      val st = fsys.listStatus(new Path(s"$root/$dir")).toSeq
      val (partDirs, rest) = st.partition(s =>
        s.isDirectory && s.getPath.getName.contains('='))
      val plain = dataFiles(rest)
      val base =
        if (plain.isEmpty) Seq.empty
        else Seq((Option.empty[(String, String)], plain))
      base ++ partDirs.map { pd =>
        val Array(k, v) = pd.getPath.getName.split("=", 2)
        val inner = fsys.listStatus(pd.getPath).toSeq
        require(!inner.exists(s => s.isDirectory && s.getPath.getName.contains('=')),
          s"graftstore supports one partition level; nested partition dirs under ${pd.getPath}")
        (Some((k, unescapePath(v))), dataFiles(inner))
      }
    })

  /** List MANY dirs concurrently on the store's bounded IO pool (a
    * sequential listing is a linear driver stall at width — the same
    * term readDirs measured and fixed), keeping input order. */
  private def listMany(ds: Seq[String])
      : Seq[(String, Option[(String, String)], Seq[FileStatus])] = {
    import scala.concurrent.duration.Duration
    import scala.concurrent.{Await, ExecutionContext, Future}
    implicit val ec: ExecutionContext = VersionedStore.ioPool
    Await.result(Future.traverse(ds.toList) { d =>
      VersionedStore.ioFuture {
        listOne(d).map { case (pv, files) => (d, pv, files) }
      }
    }, Duration.Inf).flatten
  }

  /** Hive partition-path unescape: %XX sequences ONLY — URLDecoder would
    * also turn '+' into a space, which Spark's partition escaping never
    * encodes, corrupting any value containing a literal '+'. */
  private def unescapePath(s: String): String =
    if (!s.contains('%')) s
    else {
      val sb = new java.lang.StringBuilder(s.length)
      val bytes = new java.io.ByteArrayOutputStream(8)
      var i = 0
      def flush(): Unit = if (bytes.size() > 0) {
        sb.append(new String(bytes.toByteArray, "UTF-8")); bytes.reset()
      }
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '%' && i + 3 <= s.length) {
          try { bytes.write(Integer.parseInt(s.substring(i + 1, i + 3), 16)); i += 3 }
          catch { case _: NumberFormatException => flush(); sb.append(c); i += 1 }
        } else { flush(); sb.append(c); i += 1 }
      }
      flush()
      sb.toString
    }

  /** A partition value string as the typed InternalRow the scan carries —
    * through `Cast(string literal, partition type)`, the exact coercion
    * Spark's own partition inference applies. */
  private def partRow(v: Option[(String, String)]): InternalRow =
    if (partitionSchema.isEmpty) InternalRow.empty
    else InternalRow(v.map { case (_, s) =>
      // Spark writes NULL partition values as this sentinel dir name —
      // casting it (DateType under ANSI would throw; StringType would
      // surface the sentinel as data) must instead yield NULL.
      if (s == "__HIVE_DEFAULT_PARTITION__") null
      else Cast(Literal(s), partitionSchema.head.dataType,
        Some(SQLConf.get.sessionLocalTimeZone)).eval(InternalRow.empty)
    }.orNull)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // PRUNE FIRST: dir-level manifest-stats skipping on EVERY pushed
    // comparison — partition or data column alike (the stats record
    // both) — so only surviving dirs are ever listed.
    // under column mapping the scan pushes PHYSICAL names; expand each
    // range across the mapping so both stats epochs prune (see
    // expandAcrossMapping)
    val ranges = expandAcrossMapping(
      toColRanges(partitionFilters ++ dataFilters), colmap)
    val keptDirs =
      if (ranges.isEmpty) dirs
      else VersionedStore.prunedDirs(spark, root, version, ranges)
    val kept = listMany(keptDirs)
    // Exact partition pruning on the hive values (finer than dir stats
    // when one dir spans several days): evaluate the pushed partition
    // predicates against each partition row, Spark-semantics included
    // (a NULL value fails a comparison, matches IS NULL).
    val pruned = {
      val usable = partitionFilters.filter(f =>
        f.deterministic && f.references.forall(a => partCols.contains(a.name)))
      if (usable.isEmpty || partitionSchema.isEmpty) kept
      else {
        val bound = usable.reduce(And).transform {
          case a: AttributeReference =>
            val i = partitionSchema.fieldIndex(a.name)
            BoundReference(i, partitionSchema(i).dataType, nullable = true)
        }
        val pred = CatalystPredicate.createInterpreted(bound)
        kept.filter(e => pred.eval(partRow(e._2)))
      }
    }
    pruned.map { case (_, pv, files) =>
      PartitionDirectory(partRow(pv), files.toArray)
    }
  }

  override def inputFiles: Array[String] =
    listMany(dirs).flatMap(_._3.map(_.getPath.toString)).toArray

  override def refresh(): Unit = ()  // one immutable version — nothing to refresh

  override lazy val sizeInBytes: Long =
    VersionedStore.statedSizeInBytes(spark, root, version)
      .getOrElse(listMany(dirs).flatMap(_._3.map(_.getLen)).sum)

  override def rootPaths: Seq[Path] = Seq(new Path(root))
}

/** Rename-fallback relation: a column-mapped (or day-not-last) store
  * reads through [[VersionedStore.readAt]] (physical-name requests +
  * logical aliasing) instead of a raw `HadoopFsRelation`.
  * `PrunedFilteredScan`, so column pruning and stats skipping still
  * apply; `unhandledFilters` stays the default (everything), so Spark
  * re-applies each predicate above the scan and skipping remains an
  * optimization, never a filter.
  *
  * ALSO the marker [[GraftStoreVectorizeRule]] upgrades: sessions built
  * with the graft extensions swap this relation's scan for the
  * vectorized physical-schema `HadoopFsRelation` under an alias
  * projection, and this row path serves only extension-less sessions. */
final class GraftStoreRowRelation(spark: SparkSession, val root: String,
                                  val version: Long,
                                  override val schema: StructType,
                                  val colmap: Map[String, String],
                                  val dirs: Seq[String],
                                  val pinned: Boolean = false,
                                  val hasDv: Boolean = false)
    extends BaseRelation with PrunedFilteredScan {

  override def sqlContext: SQLContext = spark.sqlContext

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val ranges = GraftStoreSource.expandAcrossMapping(
      GraftStoreSource.toColRangesV1(filters.toSeq), colmap)
    val df = VersionedStore.readAt(spark, root, version, ranges)
    df.select(requiredColumns.toSeq.map(org.apache.spark.sql.functions.col): _*).rdd
  }

  /** The vectorized twin: the SAME dirs and version behind a
    * [[GraftFileIndex]] whose schema carries the PHYSICAL field names —
    * physical names are fixed at birth (column mapping), so every
    * parquet file, pre- and post-rename, reads under one schema and the
    * vectorized reader + native type promotion apply unchanged. The
    * caller aliases the output back to logical names/order. Stats
    * skipping IMPROVES over the row path here: pushed filters reference
    * physical attributes, which is exactly how the manifest stats are
    * keyed. */
  private[sources] def vectorizedRelation: HadoopFsRelation = {
    val physical = StructType(schema.fields.map(f =>
      f.copy(name = colmap.getOrElse(f.name, f.name))))
    val index = new GraftFileIndex(spark, root, version, dirs, physical,
      pinned, colmap)
    HadoopFsRelation(index, index.partitionSchema, index.dataSchema,
      bucketSpec = None, new GraftGuardedParquetFormat(root), Map.empty)(spark)
  }
}

/** The batch change-feed window served as a relation — a computed
  * frame, not a file listing, so the scan is the frame's own plan with
  * column pruning applied (per-step dir reads + the DML steps'
  * exceptAll shuffles happen inside it; filters stay Spark-side — a
  * version range is already the coarse pushdown). Immutable by
  * construction: the window's manifests are committed history. */
final class GraftCdfBatchRelation(spark: SparkSession,
                                  frame: org.apache.spark.sql.DataFrame)
    extends BaseRelation with PrunedScan {
  override def sqlContext: SQLContext = spark.sqlContext
  override val schema: StructType = frame.schema
  override def buildScan(requiredColumns: Array[String]): RDD[Row] =
    (if (requiredColumns.isEmpty) frame
     else frame.select(requiredColumns.toSeq
       .map(org.apache.spark.sql.functions.col): _*)).rdd
}

/** [[ParquetFileFormat]] with the WRITE half sealed: reads inherit the
  * vectorized parquet reader unchanged, but any plan that reaches
  * `prepareWrite` is by construction a raw file-write the transaction
  * log never sees — in a GraftExtensions session every legitimate SQL
  * INSERT is intercepted and rewritten into a transactional commit
  * BEFORE execution ([[graft.plans.GraftDmlRule]]), so this throw can
  * only fire on a bypass path (a session missing the extensions, or a
  * future Spark rule converting writes some new way). Failing here is
  * strictly better than succeeding: the "successful" write would stream
  * parquet past the manifest — rows invisible to every reader and
  * reapable by VACUUM. Belt-and-braces on top of the marker-relation
  * routing in [[GraftStoreSource.createRelation]] (extension-less
  * sessions never receive this relation at all — the marker fails
  * writes in PreWriteCheck before any filesystem mutation, which also
  * covers INSERT OVERWRITE's pre-write delete of the output path). */
final class GraftGuardedParquetFormat(root: String) extends ParquetFileFormat {
  override def prepareWrite(sparkSession: SparkSession,
                            job: org.apache.hadoop.mapreduce.Job,
                            options: Map[String, String],
                            dataSchema: StructType)
      : org.apache.spark.sql.execution.datasources.OutputWriterFactory =
    throw new UnsupportedOperationException(
      s"direct file write into graftstore $root would bypass the " +
        "transaction log (rows invisible to every reader; files reapable " +
        "by VACUUM) — run INSERT in a session built with " +
        "graft.GraftExtensions (spark.sql.extensions=graft.GraftExtensions) " +
        "so it routes through the transactional commit, or use " +
        "df.write.format(\"graftstore\")")
}

/** Post-hoc analyzer rule (graft extensions): replace every
  * [[GraftStoreRowRelation]] marker with `Project(logical aliases,
  * vectorized physical-schema scan)` — the Delta column-mapping move
  * (request physical names inside the parquet scan, alias above it),
  * lifted to the relation seam. The aliases reuse the marker's output
  * exprIds, so references anywhere above re-bind without a rewrite; the
  * projection also restores the recorded column ORDER (HadoopFsRelation
  * appends the partition column last — the reason day-not-last stores
  * route through the marker at all). Runs AFTER [[graft.plans
  * .GraftDmlRule]] in the same batch, so DML targets are matched on the
  * marker itself. */
object GraftStoreVectorizeRule
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.Alias
  import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
  import org.apache.spark.sql.execution.datasources.LogicalRelation

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // a DV'd relation stays on the row path — the vectorized upgrade is
    // a raw file scan and would resurrect the deleted rows
    case l: LogicalRelation if l.relation.isInstanceOf[GraftStoreRowRelation] &&
        !l.relation.asInstanceOf[GraftStoreRowRelation].hasDv =>
      val rel = l.relation.asInstanceOf[GraftStoreRowRelation]
      // catalogTable rides along: cache invalidation (and anything else
      // walking the analyzed plan) expects the catalog-backed relation
      // to keep naming its table
      val physLr = LogicalRelation(rel.vectorizedRelation, isStreaming = false)
        .copy(catalogTable = l.catalogTable)
      val byName = physLr.output.map(a => a.name -> a).toMap
      val aliases = l.output.map { o =>
        val phys = byName(rel.colmap.getOrElse(o.name, o.name))
        Alias(phys, o.name)(exprId = o.exprId, qualifier = o.qualifier)
      }
      Project(aliases, physLr)
  }
}
