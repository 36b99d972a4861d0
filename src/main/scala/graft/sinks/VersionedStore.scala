package graft.sinks

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Minimal transactional commit for the snapshot tables — the seam
  * [[SnapshotStore]]'s temp-write-then-swap names but does not fill:
  * readers must never list a partially-written table, and a second
  * concurrent writer must fail cleanly instead of interleaving files.
  * This is the version-pointer skeleton of an Iceberg/Delta snapshot
  * commit, kept to what a filesystem alone can guarantee.
  *
  * Layout under `root`:
  * {{{
  *   data-<uuid>/            immutable data directories, one per COMMIT
  *   _manifests/<N>.json     manifest of version N — THE commit record:
  *                           the full `dataDirs` list the version reads
  *                           (append commits carry forward earlier dirs)
  *                           plus application `meta` (e.g. a streaming
  *                           sink's batch id)
  *   _current                pointer file containing the latest version N
  * }}}
  *
  * Protocol:
  *  1. `prepare`: write the new snapshot to a UNIQUELY named `data-<uuid>`
  *     directory. A crash here leaves an orphan directory no reader ever
  *     visits (unreferenced until a manifest names it) — harmless debris.
  *  2. `publish(N+1)`: create `_manifests/<N+1>.json` with create-if-absent
  *     semantics. This create IS the commit point and the concurrency
  *     control: two writers racing to version N+1 both prepared fine, but
  *     exactly one manifest create succeeds — the loser gets
  *     [[CommitConflict]], removes its orphan data dir, and aborts without
  *     ever touching the winner's files.
  *  3. Pointer update: write `_current.tmp` and atomically rename it over
  *     `_current` (FileContext rename with OVERWRITE — atomic on HDFS and
  *     local). The pointer is a CACHE of "max committed version", not the
  *     truth: a crash between manifest and pointer leaves a committed
  *     version the pointer doesn't name yet, and readers roll FORWARD past
  *     the pointer while a manifest for pointer+1 exists (read-only
  *     healing — readers never write).
  *
  * What each failure mode looks like to a reader:
  *  - crash mid-`prepare`: unreferenced `data-<uuid>` dir; reader sees the
  *    old version, byte-identical.
  *  - crash between manifest and pointer: the commit is durable; readers
  *    roll forward to it; the next successful commit re-aims the pointer.
  *  - concurrent writers: one commits, one aborts with [[CommitConflict]];
  *    no interleaving is possible because data dirs are never shared.
  *
  * At 100 TB on an object store the shape is identical — manifest create
  * becomes a conditional PUT, the pointer a CAS'd key — which is exactly
  * the migration path to a real table format.
  */
object VersionedStore {

  /** A concurrent writer committed this version first; the caller's
    * prepared data directory has already been cleaned up. */
  final class CommitConflict(version: Long, root: String)
    extends RuntimeException(
      s"version $version of $root was committed by a concurrent writer; aborting")

  /** Jittered exponential backoff between CAS retries — call after the
    * Nth consecutive [[CommitConflict]] (attempt = 0 for the first).
    * Fixed-cadence retry is UNFAIR under a pile-up: writers re-collide
    * in lockstep and one can keep losing the create-if-absent race
    * (observed: a 14-retry / 10.6 s single-commit tail while the peer
    * coasted at 2). Randomized jitter de-synchronizes the herd —
    * 12-37 ms on the first retry, doubling to a 1 s cap — so at
    * 100-writer scale the loop degrades to waiting, not starvation. */
  def backoffOnConflict(attempt: Int): Unit = {
    val base = 25.0 * math.pow(2.0, math.min(attempt, 5).toDouble)
    val jitter = 0.5 + java.util.concurrent.ThreadLocalRandom.current().nextDouble()
    val ms = math.min(1000.0, base * jitter).toLong
    if (ms > 0) Thread.sleep(ms)
  }

  /** Inclusive column-range predicate for manifest-stats data skipping
    * ([[readAt]]/[[read]]/[[readChanges]]): bounds are given in the same
    * external string form the stats record (a date as `2024-01-05`, a
    * long as digits); `None` = unbounded on that side. A data dir is
    * SKIPPED when its recorded [min, max] for `column` cannot overlap
    * [lo, hi]; dirs with no stats for the column are always kept —
    * skipping is an optimization, never a filter. */
  final case class ColRange(column: String,
                            lo: Option[String], hi: Option[String])
  object ColRange {
    /** Point predicate: column == value. */
    def eq(column: String, value: String): ColRange =
      ColRange(column, Some(value), Some(value))
  }

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  /** Dedicated bounded pool for driver-side FS fan-out (relation
    * resolution, footer probes, concurrent DML dir rewrites). These
    * tasks BLOCK on filesystem IO; queueing thousands of them on
    * `ExecutionContext.global` — the CPU-sized ForkJoinPool every other
    * library in the JVM shares — would starve its other users at 10⁴
    * dirs. Sized to useful FS parallelism (not dir count: excess tasks
    * queue), daemon threads so the JVM never hangs on exit. */
  private[graft] lazy val ioPool: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(
        math.min(64, math.max(8, Runtime.getRuntime.availableProcessors * 2)),
        (r: Runnable) => {
          val t = new Thread(r, "graft-vstore-io"); t.setDaemon(true); t
        }))

  /** scala Futures complete their promise only for NonFatal throws — a
    * FATAL error inside a pool task (StackOverflowError from a deep
    * Catalyst tree, OutOfMemoryError) kills the worker runnable WITHOUT
    * completing the promise, and every `Await` upstream parks forever
    * (measured: the ≤1024-key literal MERGE probe at 500 keys
    * overflowed the default 1 MB stack inside a Future and hung the
    * writer indefinitely — zero CPU, zero progress, no error). Every
    * Future body on [[ioPool]] wraps in this: fatal throwables re-throw
    * as a non-fatal ExecutionException so they reach the Await site as
    * a loud failure instead of a silent hang. */
  private def fatalSafe[T](body: => T): T =
    try body catch {
      case t: InterruptedException =>
        // an interrupt (pool shutdown, cancellation) still completes the
        // promise loudly, but the thread's interrupt STATUS must survive
        // the wrap — swallowing it would let the worker pick up the next
        // queued task as if nothing happened
        Thread.currentThread().interrupt()
        throw new java.util.concurrent.ExecutionException(
          s"store IO pool task interrupted: $t", t)
      case t: Throwable if !scala.util.control.NonFatal(t) =>
        throw new java.util.concurrent.ExecutionException(
          s"fatal error on the store IO pool: $t", t)
    }

  /** The only sanctioned Future constructor for [[ioPool]] tasks —
    * see [[fatalSafe]]. */
  private[graft] def ioFuture[T](body: => T): scala.concurrent.Future[T] =
    scala.concurrent.Future(fatalSafe(body))(ioPool)

  /** Balanced binary reduce: a left fold over N elements builds an
    * N-deep expression/plan tree, and Catalyst's per-node recursion
    * makes every later transform O(N) stack frames deep — a 500-term
    * left-deep OR overflowed the default 1 MB stack. Halving keeps the
    * tree (and the recursion) log2(N) deep at identical semantics. */
  private def balancedReduce[T](xs: Seq[T])(op: (T, T) => T): T = {
    require(xs.nonEmpty, "balancedReduce over an empty sequence")
    var level = xs.toIndexedSeq
    while (level.length > 1)
      level = level.grouped(2).map(g =>
        if (g.length == 2) op(g(0), g(1)) else g(0)).toIndexedSeq
    level.head
  }

  private def manifestPath(root: String, v: Long) = new Path(s"$root/_manifests/$v.json")

  /** ATOMIC create-if-absent with content — the commit arbitration
    * primitive. On HDFS-like filesystems `create(overwrite = false)` is
    * atomic and suffices. On the LOCAL filesystem it is exists-then-
    * create — two processes racing the same version can BOTH pass the
    * exists check, silently clobbering the winner's manifest while both
    * report success (a lost commit; the maintenance-interleaved
    * contention probe caught exactly this as missing writer rows). The
    * local path instead writes the full body to a uuid tmp file and
    * hard-LINKS it into place: POSIX link(2) fails atomically when the
    * target exists, and the content is complete at link time, so a
    * reader can never observe a half-written manifest either. Returns
    * true iff this caller won the create. */
  private def createExclusive(f: FileSystem, p: Path, body: Array[Byte]): Boolean =
    if (f.getUri.getScheme == "file") {
      val target = java.nio.file.Paths.get(p.toUri.getPath)
      java.nio.file.Files.createDirectories(target.getParent)
      val tmp = target.resolveSibling(
        s"${target.getFileName}.tmp-${java.util.UUID.randomUUID()}")
      java.nio.file.Files.write(tmp, body)
      try { java.nio.file.Files.createLink(target, tmp); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        // link unsupported: exotic mounts surface as FileSystemException
        // OR UnsupportedOperationException (provider-dependent) — both
        // degrade to the Hadoop create path rather than failing a commit
        // whose retry loop only catches CommitConflict
        case _: java.nio.file.FileSystemException |
             _: UnsupportedOperationException =>
          try { val out = f.create(p, false)
            try out.write(body) finally out.close(); true }
          catch { case _: java.io.IOException => false }
      }
      finally java.nio.file.Files.deleteIfExists(tmp)
    } else {
      try { val out = f.create(p, false)
        try out.write(body) finally out.close(); true }
      catch { case _: java.io.IOException => false }
    }
  private def pointerPath(root: String) = new Path(s"$root/_current")

  /** Latest committed version: the pointer, rolled forward past any
    * manifest the pointer doesn't know about yet (crash-between-manifest-
    * and-pointer). 0 = empty store. Read-only.
    *
    * A DEGRADED pointer read (concurrent swap, checksum-twin mid-rename)
    * — or a pointer naming an already-expired version — must NOT roll
    * forward from its bad anchor: after an expire, manifest 1 is gone,
    * so a walk from 0 terminates immediately and resurrects a version
    * number an earlier expire retired; a writer would then commit into
    * the retired slot and the next expire silently reaps its data (the
    * maintenance-interleaved contention probe caught exactly this as
    * lost writer rows). Those paths anchor on the manifest-directory
    * LISTING instead — O(#manifests), degraded path only. */
  def currentVersion(spark: SparkSession, root: String): Long = {
    val f = fs(spark, root)
    var v = readPointer(f, root) match {
      case Some(p) if p > 0 && f.exists(manifestPath(root, p)) => p
      case _ => committedVersions(f, root).lastOption.getOrElse(0L)
    }
    while (f.exists(manifestPath(root, v + 1))) v += 1
    v
  }

  // ── Column mapping (rename via stable physical names) ──────────────
  //
  // The Delta/Iceberg column-mapping move, manifest edition: a column's
  // PHYSICAL parquet name is fixed at its birth and never changes;
  // [[renameColumn]] is a metadata-only commit that updates the
  // logical→physical map riding every manifest's meta (`colmap.<logical>`
  // = physical, carried through every commit path like the stream
  // ledger). Writers translate logical→physical just before the parquet
  // write ([[toPhysical]] inside the commit paths); readers request the
  // PHYSICAL schema per dir and alias back to logical ([[readDirs]]) —
  // so a rename rewrites NOTHING, history stays byte-identical, and
  // time travel shows each version under its own names (schema and
  // colmap are both per-version records). With no renames the map is
  // empty and every hook below is the identity.
  //
  // Stats note: per-dir stats record the LOGICAL name current at their
  // write time; after a rename, skips on the new name find no stats for
  // older dirs and keep them — conservative, never wrong.

  /** logical → physical map of a version (empty = identity). */
  private def colmapOf(f: FileSystem, root: String, v: Long): Map[String, String] =
    if (v == 0) Map.empty
    else metaOf(f, root, v).collect {
      case (k, p) if k.startsWith("colmap.") => k.stripPrefix("colmap.") -> p
    }

  /** The map as manifest-meta entries (the carry representation). */
  private def colmapMeta(m: Map[String, String]): Map[String, String] =
    m.map { case (l, p) => s"colmap.$l" -> p }

  /** PHYSICAL names retired by [[dropColumn]] (`dropped.<physical>` =
    * logical name at drop time). A retired physical slot still holds
    * data inside committed parquet files, so it may never be re-used:
    * a new column writing the same physical name would read the OLD
    * values back out of every pre-drop dir. */
  private def droppedOf(f: FileSystem, root: String, v: Long): Map[String, String] =
    if (v == 0) Map.empty
    else metaOf(f, root, v).collect {
      case (k, l) if k.startsWith("dropped.") => k.stripPrefix("dropped.") -> l
    }

  private def droppedEntries(m: Map[String, String]): Map[String, String] =
    m.filter(_._1.startsWith("dropped."))

  /** Meta entries every commit must carry forward from its base: the
    * exactly-once stream ledger, the column mapping, and the retired
    * physical names (a commit dropping the `dropped.` markers would
    * silently re-open the retired slots). */
  private[graft] def carriedEntries(m: Map[String, String]): Map[String, String] =
    ledgerEntries(m) ++ m.filter(_._1.startsWith("colmap.")) ++ droppedEntries(m)

  /** Reject frames referencing a RETIRED physical name — after a rename
    * (the old name is neither logical nor free: the renamed column still
    * writes it physically) or after a drop (the slot still holds old
    * data in every pre-drop dir). Accepting one would silently alias
    * into the renamed column, collide at write, or resurrect dropped
    * values. */
  private def requireNoRetiredNames(df: DataFrame,
                                    colmap: Map[String, String],
                                    root: String,
                                    dropped: Set[String] = Set.empty): Unit = {
    val retired = (colmap.values.toSet -- colmap.keySet) ++ dropped
    val misuse = df.columns.toSet.intersect(retired)
    require(misuse.isEmpty,
      s"write to $root uses retired PHYSICAL column name(s) " +
        s"${misuse.mkString(",")} (renamed or dropped away) — to re-add a " +
        "dropped name, add the data under a FRESH name and renameColumn it")
  }

  /** Rename the frame's columns logical→physical for a parquet write. */
  private def toPhysical(df: DataFrame, colmap: Map[String, String]): DataFrame =
    if (colmap.isEmpty) df
    else df.select(df.columns.map(c =>
      org.apache.spark.sql.functions.col(c).as(colmap.getOrElse(c, c))).toSeq: _*)

  /** Rename physical→logical after a parquet read. */
  private def toLogical(df: DataFrame, colmap: Map[String, String]): DataFrame =
    if (colmap.isEmpty) df
    else {
      val rev = colmap.map(_.swap)
      df.select(df.columns.map(c =>
        org.apache.spark.sql.functions.col(c).as(rev.getOrElse(c, c))).toSeq: _*)
    }

  /** A logical schema DDL rewritten to the physical field names. */
  private def physicalDdl(ddl: String, colmap: Map[String, String]): String =
    if (colmap.isEmpty) ddl
    else {
      import org.apache.spark.sql.types.{StructField, StructType}
      StructType(StructType.fromDDL(ddl).fields.map(f =>
        StructField(colmap.getOrElse(f.name, f.name), f.dataType,
          f.nullable, f.metadata))).toDDL
    }

  /** RENAME COLUMN — metadata-only (Iceberg/Delta column-mapping shape):
    * no dir is rewritten; the commit records the new logical schema and
    * the updated logical→physical map. Readers of the new version see
    * `to`; time travel below it still sees `from`. Fails loudly when
    * `from` is absent or `to` already exists. A live streaming reader's
    * schema is fixed at query start — it fails at its next batch and
    * restarts under the new name, like any schema change. */
  def renameColumn(spark: SparkSession, root: String,
                   from: String, to: String): Long = {
    val f = fs(spark, root)
    val base = currentVersion(spark, root)
    require(base > 0, s"nothing to rename in: $root has no committed version")
    val ddl = schemaOf(f, root, base).getOrElse(
      throw new IllegalStateException(
        s"$root records no schema (legacy store) — commit once before renaming"))
    import org.apache.spark.sql.types.{StructField, StructType}
    val schema = StructType.fromDDL(ddl)
    require(schema.fieldNames.contains(from),
      s"cannot rename $from: not a column of $root (${schema.fieldNames.mkString(",")})")
    require(!schema.fieldNames.contains(to),
      s"cannot rename $from to $to: $to already exists in $root")
    val colmap = colmapOf(f, root, base)
    val physical = colmap.getOrElse(from, from)
    val newMap = (colmap - from) + (to -> physical)
    val newDdl = StructType(schema.fields.map(fd =>
      if (fd.name == from) StructField(to, fd.dataType, fd.nullable, fd.metadata)
      else fd)).toDDL
    publishDelta(spark, root, base + 1,
      addDirs = Seq.empty, removedDirs = Seq.empty,
      // the NEW map REPLACES the carried one — a stale colmap.<from>
      // entry surviving alongside colmap.<to> would leave two logical
      // names claiming one physical column
      meta = ledgerEntries(metaOf(f, root, base)) ++
        droppedEntries(metaOf(f, root, base)) ++ colmapMeta(newMap) +
        ("rename" -> s"$from->$to"),
      schemaDdl = Some(newDdl), statsForAdded = Map.empty,
      anchor = dataDirOf(f, root, base), anchorIsCarried = true)
    base + 1
  }

  /** DROP COLUMN — metadata-only, completing the column-mapping surface
    * ([[renameColumn]]'s sibling; the Delta/Iceberg drop shape): no dir
    * is rewritten; the commit records the narrowed logical schema, drops
    * the column's mapping entry, and RETIRES its physical name with a
    * `dropped.<physical>` marker carried by every later commit. Readers
    * of the new version stop requesting the physical column (parquet
    * skips it at scan — dropping is also a small read win); time travel
    * below the drop still sees the column with its values; the row-level
    * change feed spanning the drop reports rows under the target
    * version's (narrower) schema.
    *
    * Retirement is what makes the metadata-only drop SOUND: the old
    * values still sit inside every pre-drop parquet file, so a later
    * append re-introducing a column at the same physical name would
    * read those values back as if they were its own. Any write naming a
    * retired physical fails loudly ([[requireNoRetiredNames]] + the
    * mergeSchema clash check). To re-add a dropped NAME with fresh data:
    * append it under a fresh name, then [[renameColumn]] it — the new
    * logical name maps to the fresh physical slot and the retired one
    * stays sealed.
    *
    * `day` (the partition-layout contract) and the last remaining column
    * are not droppable. A live streaming reader's schema is fixed at
    * query start — it fails at its next batch and restarts under the
    * new schema, like any schema change. */
  def dropColumn(spark: SparkSession, root: String, name: String): Long = {
    val f = fs(spark, root)
    val base = currentVersion(spark, root)
    require(base > 0, s"nothing to drop in: $root has no committed version")
    val ddl = schemaOf(f, root, base).getOrElse(
      throw new IllegalStateException(
        s"$root records no schema (legacy store) — commit once before dropping"))
    import org.apache.spark.sql.types.StructType
    val schema = StructType.fromDDL(ddl)
    require(schema.fieldNames.contains(name),
      s"cannot drop $name: not a column of $root (${schema.fieldNames.mkString(",")})")
    require(schema.fields.length > 1,
      s"cannot drop $name: it is the last column of $root")
    require(name != "day",
      s"cannot drop day: it is $root's partition-layout contract " +
        "(hive day= dirs) — rewrite the table without it instead")
    val colmap = colmapOf(f, root, base)
    val physical = colmap.getOrElse(name, name)
    val newMap = colmap - name
    val newDdl = StructType(schema.fields.filterNot(_.name == name)).toDDL
    publishDelta(spark, root, base + 1,
      addDirs = Seq.empty, removedDirs = Seq.empty,
      meta = ledgerEntries(metaOf(f, root, base)) ++
        droppedEntries(metaOf(f, root, base)) ++ colmapMeta(newMap) +
        (s"dropped.$physical" -> name) + ("drop" -> name),
      schemaDdl = Some(newDdl), statsForAdded = Map.empty,
      anchor = dataDirOf(f, root, base), anchorIsCarried = true)
    base + 1
  }

  /** The current committed snapshot as a DataFrame; empty-schema-less
    * reads are the caller's concern — returns None when nothing has ever
    * been committed. Readers resolve the data directory through the
    * manifest, so a half-written `prepare` directory is invisible.
    * `skip` prunes data dirs through the manifest's column stats BEFORE
    * any file listing — see [[readAt]]. */
  def read(spark: SparkSession, root: String,
           skip: Seq[ColRange] = Seq.empty): Option[DataFrame] = {
    val v = currentVersion(spark, root)
    if (v == 0) None
    else {
      val f = fs(spark, root)
      Some(readDirs(spark, root, prunedDirs(spark, root, v, skip),
        allDirs = dataDirsOf(f, root, v), schemaDdl = schemaOf(f, root, v),
        colmap = colmapOf(f, root, v), stats = statsOf(f, root, v)))
    }
  }

  // ─────────────────────── deletion vectors ───────────────────────
  // Merge-on-read row-level DML (the Delta deletion-vector / Iceberg
  // positional-delete ARCHITECTURE — both public — at this store's dir
  // granularity): a dir's deleted rows are recorded as (file name, row
  // position) pairs in a tiny parquet SIDECAR inside the dir itself
  // (`_dv-<uuid>` — the leading underscore hides it from every plain
  // parquet listing, so time travel to pre-DV versions reads the dir
  // unchanged and the sidecar's lifecycle rides the dir's), referenced
  // from the manifest's per-dir stats as
  //   `<dir>|#|dv`     -> sidecar name
  //   `<dir>|#|dvrows` -> distinct deleted positions
  // Stats ride the log segments, so the reference carries, overrides
  // and drops through delta commits, checkpoints, RESTORE and expire
  // with ZERO manifest-format changes; any copy-on-write rewrite of the
  // dir (UPDATE/DELETE/MERGE/OPTIMIZE) reads the DV-applied rows and
  // drops the reference with the dir — compaction materializes the
  // deletes for free. Positions come from the parquet scan's
  // `_metadata.row_index` (stable: committed files are immutable),
  // files from the DIR-RELATIVE path (`day=.../part-...` under a
  // hive-partitioned dir) — NOT the bare file name: one write task
  // reuses its part-file name across every day= subdir it writes, so
  // names collide within a dir, and not the absolute path: the
  // artifact-store swap RENAMES a built root into place, which would
  // orphan absolute references. Exactly Delta's DV addressing scheme
  // (file, position), with the file keyed the way this store's dirs
  // move.

  private def dvFor(stats: Map[String, String], d: String): Option[String] =
    stats.get(s"$d|#|dv")

  /** The dir-relative file of each scanned row: everything after the
    * LAST `/<dir>/` in `_metadata.file_path` — unambiguous because dir
    * names carry a UUID. */
  private def dvFileCol(d: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.substring_index(
      org.apache.spark.sql.functions.col("_metadata.file_path"), s"/$d/", -1)

  /** Read a DV sidecar by part-file GLOB, not by its directory: the
    * `_`-prefixed dir name trips DataSource's hidden-path warning on
    * every open (cosmetic — explicitly named paths still read — but a
    * 10³-DV'd-dir scan would log it 10³ times). */
  private def dvSidecar(spark: SparkSession, root: String, d: String,
                        name: String): DataFrame =
    spark.read.parquet(s"$root/$d/$name/part-*.parquet")

  /** One data dir as a PHYSICAL-schema frame, its deletion vector (if
    * any) anti-applied: rows whose (file, position) pair appears in the
    * sidecar leave the frame before anything downstream sees them. The
    * DV is BROADCAST (small by the merge-on-read contract — a DV
    * approaching its dir's size is [[optimize]]'s cue), so the
    * anti-join adds no shuffle and the scan itself stays a plain
    * pushdown-friendly parquet read. */
  private def openDirPhys(spark: SparkSession, root: String, d: String,
      schema: Option[org.apache.spark.sql.types.StructType],
      dv: Option[String]): DataFrame = {
    val reader = schema.fold(spark.read)(spark.read.schema)
    val base = reader.parquet(s"$root/$d")
    dv.fold(base) { name =>
      import org.apache.spark.sql.functions.{broadcast, col}
      val dvdf = dvSidecar(spark, root, d, name)
      base.withColumn("__dv_f", dvFileCol(d))
        .withColumn("__dv_p", col("_metadata.row_index"))
        .join(broadcast(dvdf), Seq("__dv_f", "__dv_p"), "left_anti")
        .drop("__dv_f", "__dv_p")
    }
  }

  /** Union the referenced data dirs — each dir runs its OWN partition
    * discovery (a multi-path read would see the day= trees under
    * different `data-<uuid>` roots as conflicting structures).
    * `allowMissingColumns`: commit-time schema enforcement (see
    * [[commitAppend]]) guarantees dirs differ at most by ADDED columns
    * (mergeSchema commits), whose missing side reads as NULL — exactly
    * the Delta/Iceberg read semantics for evolved tables. An EMPTY dir
    * list (a `skip` that pruned everything) still needs a schema, so it
    * degrades to the full list filtered to zero rows — correctness never
    * depends on pruning.
    *
    * Wide-table shape (the 10⁴-dir leg caught both terms): legs build on
    * CONCURRENT driver threads (relation resolution is one FS listing +
    * footer read per dir — sequential, that is a linear driver stall),
    * with the recorded schema sparing every leg its footer inference;
    * and unions reduce in BOUNDED groups of 64 (a single pairwise reduce
    * re-analyzes the growing plan each step — O(N²) driver analysis,
    * the same term probeMatching measured and fixed at the probe tier). */
  private def readDirs(spark: SparkSession, root: String, dirs: Seq[String],
                       allDirs: Seq[String] = Seq.empty,
                       schemaDdl: Option[String] = None,
                       colmap: Map[String, String] = Map.empty,
                       stats: Map[String, String] = Map.empty): DataFrame = {
    val use = if (dirs.nonEmpty) dirs else allDirs
    // dirs store PHYSICAL column names (stable across renames); request
    // the physical schema per leg and alias the union back to logical.
    val schema = schemaDdl.map(d =>
      org.apache.spark.sql.types.StructType.fromDDL(physicalDdl(d, colmap)))
    import scala.concurrent.duration.Duration
    import scala.concurrent.{Await, ExecutionContext, Future}
    implicit val ec: ExecutionContext = ioPool
    val legs = Await.result(Future.traverse(use.toList) { d => ioFuture {
      openDirPhys(spark, root, d, schema, dvFor(stats, d))
    }}, Duration.Inf)
    val df = legs.grouped(64).toSeq
      .map(_.reduce(_.unionByName(_, allowMissingColumns = true)))
      .reduce(_.unionByName(_, allowMissingColumns = true))
    toLogical(if (dirs.nonEmpty) df else df.limit(0), colmap)
  }

  /** Incremental consumption — the change-data-feed of an append-commit
    * table, for free from the manifest-list layout: the rows added
    * between `sinceVersion` (exclusive) and `toVersion` (inclusive,
    * default current) are EXACTLY the data dirs the later manifests
    * reference beyond the earlier one's, so a downstream incremental
    * consumer reads only the new batches, never rescanning the table.
    * At 100 TB this is what keeps derived tables (indexes, aggregates,
    * the [[graft.operators.ShingleStore]] family) maintainable at
    * batch-proportional cost.
    *
    * Contract: valid only across an APPEND-ONLY version range. A
    * full-snapshot commit (compaction) rewrites rather than adds — a
    * dir-level diff across it would replay the whole table as "changes"
    * — so a range whose earlier dirs are not a subset of the later ones
    * throws instead of silently over-reporting (the caller falls back to
    * a full read; row-level change tracking is a table-format concern).
    * Returns None when the range adds nothing. */
  def readChanges(spark: SparkSession, root: String, sinceVersion: Long,
                  toVersion: Long = -1L,
                  skip: Seq[ColRange] = Seq.empty): Option[DataFrame] = {
    val f = fs(spark, root)
    val cur = currentVersion(spark, root)
    val to = if (toVersion < 0) cur else toVersion
    // An explicit toVersion beyond the store surfaces here as the same
    // IllegalArgumentException shape readAt uses — not as a raw
    // FileNotFoundException from the manifest open below.
    if (toVersion >= 0 && toVersion > cur)
      throw new IllegalArgumentException(
        s"version $toVersion of $root does not exist (never committed, or expired)")
    require(sinceVersion >= 0 && sinceVersion <= to,
      s"need 0 <= sinceVersion <= toVersion, got $sinceVersion..$to")
    if (sinceVersion == to) return None
    if (sinceVersion > 0 && !f.exists(manifestPath(root, sinceVersion)))
      throw new IllegalStateException(
        s"version $sinceVersion of $root has been expired; dir-level changes " +
          "are unavailable — read the full table and re-checkpoint")
    val before =
      if (sinceVersion == 0) Seq.empty[String] else dataDirsOf(f, root, sinceVersion)
    val after = dataDirsOf(f, root, to)
    val beforeSet = before.toSet
    val afterSet = after.toSet
    if (!before.forall(afterSet))
      throw new IllegalStateException(
        s"versions $sinceVersion..$to of $root span a snapshot rewrite " +
          "(compaction); dir-level changes are undefined — read the full table")
    // DV guard: a deletion-vector change anywhere in the range means
    // rows were REMOVED (or restored) without any dir changing hands —
    // not an append-only range, and a dir-level consumer would silently
    // miss the deletes. Same loud contract as the snapshot-rewrite
    // check above; readRowChanges reports the delta exactly.
    val toStats = statsOf(f, root, to)
    val sinceStats =
      if (sinceVersion == 0) Map.empty[String, String]
      else statsOf(f, root, sinceVersion)
    val dvDirty = after.exists { d =>
      dvFor(toStats, d) !=
        (if (beforeSet(d)) dvFor(sinceStats, d) else None)
    }
    if (dvDirty)
      throw new IllegalStateException(
        s"versions $sinceVersion..$to of $root include row-level deletes " +
          "(deletion vectors); dir-level changes are undefined — read the " +
          "full table and re-checkpoint, or consume readRowChanges")
    val added = after.filterNot(beforeSet)
    if (added.isEmpty) None
    else {
      val kept = pruneWithStats(added, toStats, skip)
      Some(readDirs(spark, root, kept, allDirs = added,
        schemaDdl = schemaOf(f, root, to), colmap = colmapOf(f, root, to),
        stats = toStats))
    }
  }

  /** Time travel: read the snapshot AS OF a specific committed version.
    * Data dirs are immutable and stay referenced by their manifest until
    * [[expire]] drops them, so any version [[history]] lists is readable
    * byte-identically to the moment it committed — the Iceberg
    * `VERSION AS OF` read path, filesystem edition. Throws if the version
    * was never committed or has been expired. */
  def readAt(spark: SparkSession, root: String, version: Long,
             skip: Seq[ColRange] = Seq.empty): DataFrame = {
    val f = fs(spark, root)
    require(version > 0, s"versions start at 1, got $version")
    if (!f.exists(manifestPath(root, version)))
      throw new IllegalArgumentException(
        s"version $version of $root does not exist (never committed, or expired)")
    readDirs(spark, root, prunedDirs(spark, root, version, skip),
      allDirs = dataDirsOf(f, root, version),
      schemaDdl = schemaOf(f, root, version),
      colmap = colmapOf(f, root, version),
      stats = statsOf(f, root, version))
  }

  /** The data dirs of `version` that SURVIVE manifest-stats pruning under
    * `skip` — the data-skipping seam itself, exposed so callers (and the
    * spec gate) can count what a predicated read will actually list. A
    * long-appended store answers a point read by opening only the dirs
    * whose [min, max] can hold the value: at 100 TB this is the
    * difference between a point read and a full scan — the signature
    * Delta/Iceberg file-skipping move, manifest edition (dir-granular:
    * this store's add-unit is the commit's data dir). */
  def prunedDirs(spark: SparkSession, root: String, version: Long,
                 skip: Seq[ColRange]): Seq[String] = {
    val f = fs(spark, root)
    val all = dataDirsOf(f, root, version)
    if (skip.isEmpty) all else pruneWithStats(all, statsOf(f, root, version), skip)
  }

  /** Read-surface snapshot for the relation provider
    * ([[graft.sources.GraftStoreSource]]): the resolved version, its
    * data dirs, the recorded logical schema DDL, and the
    * logical→physical column map — everything a `FileIndex` needs to
    * plan a scan, resolved ONCE at relation construction (the manifest
    * chain is never re-walked per filter; [[prunedDirs]] serves the
    * per-query skipping from the parsed-state caches). */
  private[graft] def relationSnapshot(spark: SparkSession, root: String,
                                      versionAsOf: Option[Long])
      : (Long, Seq[String], Option[String], Map[String, String],
         Map[String, String]) = {
    val f = fs(spark, root)
    val v = versionAsOf.getOrElse(currentVersion(spark, root))
    require(v > 0,
      if (versionAsOf.isDefined) s"versions of $root start at 1, got $v"
      else s"$root is empty (no committed version)")
    if (versionAsOf.isDefined && !f.exists(manifestPath(root, v)))
      throw new IllegalArgumentException(
        s"version $v of $root does not exist (never committed, or expired)")
    // the per-dir deletion-vector references of this version — nonempty
    // routes the relation through the store's own row path (the raw
    // file scan would resurrect deleted rows)
    val dv = statsOf(f, root, v).collect {
      case (k, n) if k.endsWith("|#|dv") => k.stripSuffix("|#|dv") -> n }
    (v, dataDirsOf(f, root, v), schemaOf(f, root, v), colmapOf(f, root, v), dv)
  }

  /** Keep the dirs whose recorded [min, max] can overlap EVERY requested
    * range; a dir lacking stats for a range's column is always kept.
    * Comparison is TYPED via the recorded stat type — never lexical on
    * the string form (a lexical "9" > "10" would prune wrongly).
    *
    * POINT ranges (lo == hi) additionally consult the dir's BLOOM filter
    * when one was recorded (`bloom:` stats columns) — the pruner for
    * equality probes on HIGH-CARDINALITY UNSORTED keys, where every
    * dir's [min, max] spans the whole domain and range stats prune
    * nothing. No false negatives by construction (a bloom-excluded dir
    * cannot hold the value); false positives just keep a dir. */
  private def pruneWithStats(dirs: Seq[String], stats: Map[String, String],
                             skip: Seq[ColRange]): Seq[String] =
    dirs.filter { d =>
      skip.forall { r =>
        val rangeOk =
          (stats.get(s"$d|${r.column}|min"), stats.get(s"$d|${r.column}|max"),
            stats.get(s"$d|${r.column}|typ")) match {
            case (Some(mn), Some(mx), Some(typ)) =>
              r.hi.forall(hi => statLe(typ, mn, hi)) &&
                r.lo.forall(lo => statLe(typ, lo, mx))
            case _ => true // no stats for this column in this dir: keep
          }
        // `def`, not `val`: the bloom is consulted ONLY for dirs the
        // range check keeps — a point read on a range-sorted column must
        // not pay a bloom decode per already-excluded dir (at 10⁵ dirs
        // that's the whole plan cost).
        def bloomOk = !(r.lo.isDefined && r.lo == r.hi) ||
          stats.get(s"$d|${r.column}|bloom").forall(b64 =>
            decodedBloom(b64).mightContainString(r.lo.get))
        rangeOk && bloomOk
      }
    }

  // Decoded per-dir bloom filters, keyed by their base64 form (stats
  // entries are immutable strings, so value identity IS content
  // identity). ACCESS-ORDER LRU, not clear-on-overflow: a scan cycling
  // through more blooms than the cap (a 10⁵-dir table with bloom stats)
  // must evict only the coldest entries — a clear-all would thrash the
  // whole cache once per cycle and re-decode every bloom on every query.
  // The decode is microseconds, so holding the map lock through it is
  // cheaper than any lock-free scheme's complexity.
  private val bloomCache: java.util.Map[String, org.apache.spark.util.sketch.BloomFilter] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, org.apache.spark.util.sketch.BloomFilter](
        256, 0.75f, /*accessOrder=*/ true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, org.apache.spark.util.sketch.BloomFilter]): Boolean =
          size() > 8192
      })

  private def decodedBloom(b64: String): org.apache.spark.util.sketch.BloomFilter =
    bloomCache.computeIfAbsent(b64, s =>
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        java.util.Base64.getDecoder.decode(s)))

  /** `statsCols` entries split into plain min/max columns and `bloom:`-
    * prefixed ones. A bloom column gets min/max/nulls TOO (the prefix
    * adds, never replaces — countWhere still needs its NULL counts). */
  private def splitStatCols(cols: Seq[String]): (Seq[String], Seq[String]) = {
    val bloom = cols.collect {
      case c if c.startsWith("bloom:") => c.stripPrefix("bloom:") }
    (cols.map(_.stripPrefix("bloom:")).distinct, bloom.distinct)
  }

  /** Per-dir bloom entries for `bloomCols`: values hashed in their
    * CAST-TO-STRING form — the same serialization the min/max stats use
    * — so [[pruneWithStats]]'s `mightContainString(range bound)` tests
    * the exact bytes the writer inserted. Sized to the dir's row count
    * at 1% fpp (~1.2 KB per 1000 rows); NULLs are skipped (a NULL never
    * matches an equality probe). */
  private def bloomStats(df: DataFrame, dir: String, bloomCols: Seq[String],
                         rows: Long): Map[String, String] =
    bloomCols.map { n =>
      import org.apache.spark.sql.functions.{col => c}
      val bf = df.filter(c(n).isNotNull)
        .stat.bloomFilter(c(n).cast("string"), math.max(64L, rows), 0.01)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      s"$dir|$n|bloom" -> java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
    }.toMap

  /** Typed a <= b over the external string forms the stats record. */
  private def statLe(typ: String, a: String, b: String): Boolean = typ match {
    case "byte" | "short" | "integer" | "long" => a.toLong <= b.toLong
    case "float" | "double"                    => a.toDouble <= b.toDouble
    case "decimal"                             => BigDecimal(a) <= BigDecimal(b)
    case "date"                                =>
      java.time.LocalDate.parse(a).compareTo(java.time.LocalDate.parse(b)) <= 0
    // timestamps serialize as "yyyy-MM-dd HH:mm:ss[.SSSSSS]" — zero-padded
    // fixed-width fields, so lexicographic order IS chronological order
    // (strings too, by definition).
    case _ => a <= b
  }

  /** The stats-column request that reproduces the CURRENT version's
    * recorded stats on a NEW dir (`bloom:`-prefixed where a bloom is
    * recorded): how a writer with no out-of-band options channel — the
    * SQL `INSERT INTO` path — keeps the table's data-skipping contract
    * alive instead of committing stats-less dirs that every skip query
    * then has to keep. */
  private[graft] def recordedStatsCols(spark: SparkSession, root: String): Seq[String] = {
    val f = fs(spark, root)
    val v = currentVersion(spark, root)
    if (v == 0) return Seq.empty
    // Stats keys record the LOGICAL name current at each dir's write, so
    // pre-rename dirs key under any HISTORICAL logical name — the birth
    // physical for first-epoch dirs, but a mid-epoch name after two
    // successive renames (a→b then b→c leaves dirs keyed under `b`,
    // which the colmap alone cannot resolve). Translate through the full
    // RENAME HISTORY (the `rename` markers each rename commit records),
    // with the colmap's physical→current as the first-epoch fallback,
    // and drop columns no longer in the schema — a request under a stale
    // name would fail the next commit's statsFor require outright (and a
    // dropped column has nothing to record). Renames whose manifests
    // have been EXPIRED fall out of the walk: their mid-epoch keys stay
    // untranslated and are filtered — conservative (those dirs just
    // aren't re-requested), never wrong.
    val colmap = colmapOf(f, root, v)
    val oldToCurrent = colmap.map { case (l, p) => p -> l }
    val renamedTo = renameChain(spark, root)
    val schemaCols = schemaOf(f, root, v)
      .map(d => org.apache.spark.sql.types.StructType.fromDDL(d)
        .fieldNames.toSet)
    val parts = statsOf(f, root, v).keysIterator
      .map(_.split('|')).filter(_.length == 3).toSeq
    // A key that IS a current schema column is its own truth and never
    // chain-translates: a logical name freed by a rename (the `b` of
    // a→b→c) may be RE-USED by a later mergeSchema append — its new
    // dirs key stats under `b` meaning the new column, and translating
    // them through the stale chain would misdirect the request. (First-
    // epoch names can't recur — they are retired physicals — so only
    // the chain needs this guard.)
    val names = parts.map { pp =>
      val raw = pp(1)
      val translated =
        if (schemaCols.exists(_.contains(raw))) raw
        else renamedTo.getOrElse(raw, oldToCurrent.getOrElse(raw, raw))
      (translated, pp(2))
    }.filterNot(_._1 == "#")
      .filter { case (n, _) => schemaCols.forall(_.contains(n)) }
    val bloomCols = names.collect { case (n, "bloom") => n }.toSet
    names.map(_._1).distinct
      .map(c => if (bloomCols(c)) s"bloom:$c" else c)
  }

  /** historical logical name → CURRENT logical name, folded over every
    * live version's `rename` marker in commit order (a→b then b→c gives
    * a→c AND b→c). O(live versions) cached manifest-meta reads. */
  private def renameChain(spark: SparkSession, root: String): Map[String, String] = {
    val f = fs(spark, root)
    committedVersions(f, root).foldLeft(Map.empty[String, String]) { (chain, v) =>
      metaOf(f, root, v).get("rename") match {
        case Some(m) => m.split("->", 2) match {
          case Array(from, to) =>
            chain.map { case (h, c) => h -> (if (c == from) to else c) } +
              (from -> to)
          case _ => chain
        }
        case None => chain
      }
    }
  }

  /** All live (non-expired) versions, ascending, with their data dir —
    * the `table.history()` view. Read-only; derived purely from the
    * manifest directory listing. */
  def history(spark: SparkSession, root: String): Seq[(Long, String)] = {
    val f = fs(spark, root)
    committedVersions(f, root).map(v => (v, dataDirOf(f, root, v)))
  }

  /** `TIMESTAMP AS OF` resolution — the latest committed version whose
    * recorded commit wall-clock (`commitTs` manifest meta, stamped
    * monotonically at publish) is ≤ `tsMillis`; the Delta timestamp-
    * travel contract. Boundary semantics: a timestamp BEFORE the first
    * stamped commit is a loud error (nothing existed then — serving the
    * current version would silently answer the wrong question); a
    * timestamp between two commits resolves to the earlier one; a
    * timestamp AFTER the last commit is a loud error for READS unless
    * `canReturnLastCommit` (Delta's own split) — a future-dated read is
    * non-reproducible, because re-running it after new commits land
    * (stamps still ≤ t) would silently return a different snapshot.
    * RESTORE passes `canReturnLastCommit = true`: "restore to where the
    * table stood at t" is well-defined at any later t and floors to the
    * latest version. Versions written by a library predating timestamp
    * recording carry no stamp and are never resolution targets; a store
    * with NO stamped version at all fails loudly rather than guessing.
    * O(live versions) cached manifest-meta reads — resolution never
    * opens data. */
  def versionAtTimestamp(spark: SparkSession, root: String,
                         tsMillis: Long,
                         canReturnLastCommit: Boolean = false): Long = {
    val f = fs(spark, root)
    val stamped = committedVersions(f, root).flatMap { v =>
      metaOf(f, root, v).get("commitTs").flatMap(_.toLongOption).map(v -> _)
    }
    require(stamped.nonEmpty,
      s"$root records no commit timestamps (empty store, or every live " +
        "version predates timestamp recording) — time travel by VERSION " +
        "AS OF instead")
    val eligible = stamped.filter(_._2 <= tsMillis)
    if (eligible.isEmpty) {
      val (v0, t0) = stamped.head
      throw new IllegalArgumentException(
        s"timestamp $tsMillis precedes the first stamped commit of $root " +
          s"(version $v0 at $t0) — nothing existed to read at that time")
    }
    // stamps are publish-guarded monotonic in version order, so the last
    // stamped version carries the max stamp
    val (vLast, tLast) = stamped.last
    if (!canReturnLastCommit && tsMillis > tLast)
      throw new IllegalArgumentException(
        s"timestamp $tsMillis is after the last stamped commit of $root " +
          s"(version $vLast at $tLast) — a future-dated read is not " +
          "reproducible (the next commit would silently change its " +
          s"answer); read VERSION AS OF $vLast or the exact timestamp " +
          s"$tLast (RESTORE accepts a later timestamp and floors)")
    eligible.map(_._1).max
  }

  /** A `timestampAsOf` option/clause value → epoch millis. Accepts epoch
    * millis digits, an ISO-8601 instant (trailing `Z`/offset), or a
    * date / date-time WITHOUT zone interpreted in the SESSION time zone
    * (`spark.sql.session.timeZone`) — the same zone Spark's own
    * timestamp literals resolve in, so `TIMESTAMP AS OF '2024-01-02
    * 10:00:00'` means what the SQL user's session says it means. */
  private[graft] def parseTravelTimestamp(s: String, sessionZone: String): Long = {
    val t = s.trim
    def fail(): Nothing = throw new IllegalArgumentException(
      s"cannot parse timestamp '$t' — accepted: epoch millis (>= 12 " +
        "digits), an ISO-8601 instant ('2024-01-02T10:00:00Z'), or a " +
        "date / date-time in the session time zone ('2024-01-02', " +
        "'2024-01-02 10:00:00')")
    val asciiDigits = t.nonEmpty && t.forall(c => c >= '0' && c <= '9')
    // short all-digit strings ('2024') are almost certainly a year typed
    // where a date belongs, and 10-11 digit values are almost certainly
    // the common unix EPOCH SECONDS (current epoch millis are 13 digits)
    // — parsing either as epoch millis would resolve to 1970 and produce
    // a baffling "precedes the first commit" error
    if (asciiDigits && t.length >= 12) t.toLong
    else if (asciiDigits && t.length >= 10)
      throw new IllegalArgumentException(
        s"'$t' looks like epoch SECONDS — timestampAsOf takes epoch " +
          "MILLIS (13 digits today); multiply by 1000, or pass an " +
          "ISO-8601 instant")
    else if (asciiDigits) fail()
    else {
      val zone = java.time.ZoneId.of(sessionZone)
      try java.time.Instant.parse(t).toEpochMilli
      catch { case _: java.time.format.DateTimeParseException =>
        try java.time.OffsetDateTime.parse(t).toInstant.toEpochMilli
        catch { case _: java.time.format.DateTimeParseException =>
          val norm = if (t.contains('T')) t else t.replace(' ', 'T')
          try java.time.LocalDateTime.parse(norm).atZone(zone)
            .toInstant.toEpochMilli
          catch { case _: java.time.format.DateTimeParseException =>
            try java.time.LocalDate.parse(t).atStartOfDay(zone)
              .toInstant.toEpochMilli
            catch { case _: java.time.format.DateTimeParseException => fail() }
          }
        }
      }
    }
  }

  /** All committed version numbers, ascending — a manifest-dir listing,
    * no manifest is opened. */
  private def committedVersions(f: FileSystem, root: String): Seq[Long] = {
    val mdir = new Path(s"$root/_manifests")
    if (!f.exists(mdir)) Seq.empty
    else f.listStatus(mdir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".json"))
      .map(_.getPath.getName.stripSuffix(".json").toLong).sorted
  }

  /** Row-level DIFF between two committed versions — the audit sibling
    * of [[readChanges]]: where the change feed reads an APPEND range at
    * O(batch) and refuses rewrites, diff answers "what did this commit
    * (DML, merge, restore, anything) actually change?" for ANY version
    * pair, as a (change ∈ insert|delete, row) frame with MULTISET
    * semantics (`exceptAll` both ways — duplicate rows count, an updated
    * row appears as its delete + its insert). Cost is two snapshot scans
    * plus two anti-join shuffles — O(table), the honest price of a
    * content diff; use [[readChanges]] when the range is append-only.
    * Schema evolution: columns missing on one side read as NULL of the
    * other side's type, same as the evolved read path.
    *
    * SCOPED audit: when the caller knows where the changes live (a DML's
    * own prune range), `scope` bounds BOTH sides to rows satisfying the
    * predicate, with `skip` pruning dirs through manifest stats first.
    * Soundness needs both halves — skip alone could keep a stats-less
    * dir on one side and prune its twin on the other, fabricating
    * changes; the row predicate makes the two sides exactly comparable,
    * and the scoped diff is the true diff restricted to the scope. */
  def diff(spark: SparkSession, root: String,
           fromVersion: Long, toVersion: Long,
           skip: Seq[ColRange] = Seq.empty,
           scope: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col => c, lit}
    require(scope.nonEmpty || skip.isEmpty,
      "diff: skip ranges need the matching row-level scope predicate — " +
        "stats pruning alone is one-sided and would fabricate changes")
    def side(v: Long): DataFrame = {
      val df = readAt(spark, root, v, skip)
      scope.fold(df)(df.filter)
    }
    val a = side(fromVersion)
    val b = side(toVersion)
    val want = b.schema.fields.toSeq ++
      a.schema.fields.toSeq.filterNot(f => b.schema.fieldNames.contains(f.name))
    def align(df: DataFrame): DataFrame =
      df.select(want.map { f =>
        if (df.columns.contains(f.name)) c(f.name).cast(f.dataType)
        else lit(null).cast(f.dataType).as(f.name)
      }: _*)
    val (av, bv) = (align(a), align(b))
    bv.exceptAll(av).withColumn("__change", lit("insert"))
      .unionByName(av.exceptAll(bv).withColumn("__change", lit("delete")))
  }

  /** Row-level CHANGE DATA FEED across (sinceVersion, toVersion] — the
    * Delta CDF / `table_changes` surface, COMPUTED from the log instead
    * of persisted at write time: each version step contributes its exact
    * multiset row delta as (row, `_change_type`, `_commit_version`),
    * `_change_type` ∈ insert | delete | update_preimage |
    * update_postimage.
    *
    * Cost is the reason this scales where [[diff]] doesn't have to: an
    * APPEND step reads ONLY its added dirs (O(batch), zero shuffles —
    * its rows are inserts by construction); a DML step reads only its
    * touched dirs — the removed originals vs their rewrites — and pays
    * two exceptAll shuffles over that slice (O(rewrite), never
    * O(table)); an OPTIMIZE step is skipped without opening data (its
    * rewrite is row-exact by contract, recognized by the manifest
    * marker); a full-snapshot step (compaction, restore) diffs only the
    * dirs that changed hands between the two states. UPDATE steps label
    * their delta preimage/postimage — exact, because UPDATE neither adds
    * nor removes rows, so the rewrite's multiset delta IS the updated
    * row set on both sides. MERGE deltas stay insert/delete: a computed
    * feed cannot pair a matched rewrite with its source row without
    * write-time capture (Delta persists change files at commit for
    * exactly this reason); the multiset is still exact.
    *
    * Renames resolve through PHYSICAL names — each step reads under its
    * own column map, then aligns to `toVersion`'s logical schema — so a
    * feed spanning a rename reports every row under the CURRENT names.
    * Schema evolution aligns the same way (missing columns read as NULL
    * of the target type; widened columns cast losslessly). An expired
    * version inside the range throws, same contract as [[readChanges]].
    * Returns None when the range contributes nothing. */
  def readRowChanges(spark: SparkSession, root: String, sinceVersion: Long,
                     toVersion: Long = -1L): Option[DataFrame] = {
    import org.apache.spark.sql.functions.{col => c, lit}
    import org.apache.spark.sql.types.StructType
    val f = fs(spark, root)
    val cur = currentVersion(spark, root)
    val to = if (toVersion < 0) cur else toVersion
    if (toVersion >= 0 && toVersion > cur)
      throw new IllegalArgumentException(
        s"version $toVersion of $root does not exist (never committed, or expired)")
    require(sinceVersion >= 0 && sinceVersion <= to,
      s"need 0 <= sinceVersion <= toVersion, got $sinceVersion..$to")
    if (sinceVersion == to) return None
    ((sinceVersion max 1L) to to).foreach { v =>
      if (!f.exists(manifestPath(root, v)))
        throw new IllegalStateException(
          s"version $v of $root has been expired; row-level changes are " +
            "unavailable — read the full table and re-checkpoint")
    }
    val toSchema = StructType.fromDDL(schemaOf(f, root, to).getOrElse(
      throw new IllegalStateException(
        s"$root records no schema at version $to — written before schema " +
          "recording; row-level changes need the recorded schema")))
    require(!toSchema.fieldNames.exists(n =>
        n == "_change_type" || n == "_commit_version"),
      s"the CDF reserves _change_type/_commit_version; $root's schema uses one")
    val toMap = colmapOf(f, root, to)
    // Align a step frame (logical names of ITS version) to toVersion's
    // logical schema, connecting the two through the stable physical
    // names so a rename between v and to cannot NULL the column out.
    def align(df: DataFrame, vMap: Map[String, String]): DataFrame = {
      val revV = vMap.map(_.swap)
      df.select(toSchema.fields.toSeq.map { fd =>
        val phys = toMap.getOrElse(fd.name, fd.name)
        val atV = revV.getOrElse(phys, phys)
        if (df.columns.contains(atV)) c(atV).cast(fd.dataType).as(fd.name)
        else lit(null).cast(fd.dataType).as(fd.name)
      }: _*)
    }
    val steps = ((sinceVersion + 1) to to).flatMap { v =>
      val pm = parsedManifest(f, root, v)
      // Marker reads are guarded against CARRIED markers: a restore
      // commit written by an older library version carried its target's
      // full meta (incl. a stale "optimize"/"update"), and skipping or
      // mislabeling a restore on that evidence would silently drop its
      // changes from the feed. "restore" wins; current commits carry
      // ledger+colmap only, so the guard is belt-and-braces there.
      val isRestore = pm.meta.contains("restore")
      if (pm.meta.contains("optimize") && !isRestore) Seq.empty
      else {
        val (added, removed) =
          if (pm.base.isDefined) (pm.addDirs, pm.removedDirs)
          else {
            val prev =
              if (v == 1) Seq.empty[String] else dataDirsOf(f, root, v - 1)
            val now = fullDirs(pm)
            val (ps, ns) = (prev.toSet, now.toSet)
            (now.filterNot(ps), prev.filterNot(ns))
          }
        val schemaV = schemaOf(f, root, v)
        val mapV = colmapOf(f, root, v)
        // Deletion-vector awareness: the removed side reads under the
        // PREVIOUS version's DV state, the added side under THIS one's —
        // rows already dead before the step must not re-enter the feed.
        val statsNow = statsOf(f, root, v)
        lazy val statsPrev: Map[String, String] =
          if (v == 1) Map.empty else statsOf(f, root, v - 1)
        def side(dirs: Seq[String], st: Map[String, String]): Option[DataFrame] =
          if (dirs.isEmpty) None
          else Some(align(readDirs(spark, root, dirs, allDirs = dirs,
            schemaDdl = schemaV, colmap = mapV, stats = st), mapV))
        val (insTag, delTag) =
          if (pm.meta.contains("update") && !isRestore)
            ("update_postimage", "update_preimage")
          else ("insert", "delete")
        val (oldDf, newDf) = (side(removed, statsPrev), side(added, statsNow))
        val ins = (oldDf, newDf) match {
          case (None, Some(n))    => Some(n) // pure append: no shuffle
          case (Some(o), Some(n)) => Some(n.exceptAll(o))
          case _                  => None
        }
        val del = (oldDf, newDf) match {
          case (Some(o), None)    => Some(o)
          case (Some(o), Some(n)) => Some(o.exceptAll(n))
          case _                  => None
        }
        // DV DELTAS: rows that changed liveness WITHOUT a dir changing
        // hands — for each dir live on both sides whose DV reference
        // differs, (new ∖ old) positions are exact `delete` rows and
        // (old ∖ new) positions exact `insert` rows (a RESTORE across a
        // DV un-deletes). Positions address the dir's immutable files,
        // so a semi-join on (file, row_index) recovers the rows.
        val dvSteps: Seq[DataFrame] = {
          val anyDv = statsNow.keys.exists(_.endsWith("|#|dv")) ||
            (v > 1 && statsPrev.keys.exists(_.endsWith("|#|dv")))
          if (!anyDv) Seq.empty
          else {
            import org.apache.spark.sql.functions.broadcast
            val nowD =
              if (pm.base.isEmpty) fullDirs(pm) else dataDirsOf(f, root, v)
            val prevD =
              if (v == 1) Seq.empty[String] else dataDirsOf(f, root, v - 1)
            val prevSet = prevD.toSet
            val changed = nowD.filter(d => prevSet(d) &&
              dvFor(statsNow, d) != dvFor(statsPrev, d))
            val schemaP = schemaV.map(x => StructType.fromDDL(
              physicalDdl(x, mapV)))
            changed.flatMap { d =>
              def dvDf(n: Option[String]): Option[DataFrame] =
                n.map(x => dvSidecar(spark, root, d, x))
              val nw = dvDf(dvFor(statsNow, d))
              val od = dvDf(dvFor(statsPrev, d))
              def rowsAt(pos: DataFrame): DataFrame = {
                val raw = schemaP.fold(spark.read)(spark.read.schema)
                  .parquet(s"$root/$d")
                  .withColumn("__dv_f", dvFileCol(d))
                  .withColumn("__dv_p", c("_metadata.row_index"))
                align(toLogical(
                  raw.join(broadcast(pos), Seq("__dv_f", "__dv_p"),
                      "left_semi")
                    .drop("__dv_f", "__dv_p"), mapV), mapV)
              }
              val dels = (nw, od) match {
                case (Some(n), Some(o)) => Some(rowsAt(n.exceptAll(o)))
                case (Some(n), None)    => Some(rowsAt(n))
                case _                  => None
              }
              val undels = (nw, od) match {
                case (Some(n), Some(o)) if isRestore =>
                  Some(rowsAt(o.exceptAll(n)))
                case (None, Some(o)) => Some(rowsAt(o)) // DV dropped whole
                case _               => None
              }
              (dels.map(_.withColumn("_change_type", lit("delete"))) ++
                undels.map(_.withColumn("_change_type", lit("insert"))))
                .map(_.withColumn("_commit_version", lit(v)))
            }
          }
        }
        (ins.map(_.withColumn("_change_type", lit(insTag))) ++
          del.map(_.withColumn("_change_type", lit(delTag))))
          .map(_.withColumn("_commit_version", lit(v))) ++ dvSteps
      }
    }
    if (steps.isEmpty) None
    else Some(steps.grouped(64).toSeq
      .map(_.reduce(_.unionByName(_)))
      .reduce(_.unionByName(_)))
  }

  /** Snapshot retention (`expire_snapshots`): drop all but the newest
    * `keepLast` versions — delete their manifests first (after which the
    * version is unreadable and [[vacuum]]-able), then their data dirs.
    * The current version is always kept; `keepLast >= 1`. Like vacuum,
    * run from a maintenance window, not concurrently with a reader that
    * may still be scanning an about-to-expire version. */
  def expire(spark: SparkSession, root: String, keepLast: Int): Unit = {
    require(keepLast >= 1, s"must keep at least the current version, got $keepLast")
    val f = fs(spark, root)
    // Version NUMBERS only — resolving each version's dataDir (history's
    // contract) would open every manifest for a field expire never uses.
    val live = committedVersions(f, root)
    if (live.isEmpty) return
    // Pin the pointer to the newest version BEFORE deleting manifests:
    // currentVersion rolls forward from the pointer, so a stale pointer
    // naming an expired version would otherwise strand readers below the
    // surviving range.
    aimPointer(spark, root, live.last)
    val dropped = live.dropRight(keepLast)
    if (dropped.isEmpty) return
    val survivors = live.takeRight(keepLast)
    // The oldest survivor must stay resolvable AFTER its delta chain is
    // cut: if it is a delta commit without a checkpoint, materialize one
    // now (while the chain is intact). Checkpoints are derived and
    // idempotent, so a crash between this write and the manifest deletes
    // costs nothing.
    val oldest = survivors.head
    if (parsedManifest(f, root, oldest).base.nonEmpty &&
        !f.exists(checkpointPath(root, oldest)))
      writeCheckpoint(spark, root, oldest, resolvedState(f, root, oldest))
    // Candidate dirs = everything the DROPPED manifests ADDED (their own
    // add/full lists) PLUS the dirs of any dropped version's CHECKPOINT:
    // a dir whose adding manifest was dropped by an EARLIER expire stayed
    // alive through the then-oldest survivor's checkpoint, which thereby
    // inherited its ownership — when that version is dropped in turn, its
    // checkpoint is the only record left naming the dir. Together these
    // are the complete garbage-candidate set at O(dropped edits +
    // dropped-checkpoint dirs), never a chain resolution per dropped
    // version. Delete the candidates no surviving version still
    // references. Scoping the sweep to dropped-record dirs (never a bare
    // data-* listing) keeps a concurrent writer's in-flight `prepare`
    // directory safe — unreferenced-by-design debris is vacuum()'s job.
    val candidates = dropped.flatMap { v =>
      val cp = if (f.exists(checkpointPath(root, v)))
        checkpointDirs(f, root, v) else Seq.empty
      ownDirsOf(f, root, v) ++ cp
    }.toSet
    // Survivors' referenced dirs in O(dirs + survivor edits): the oldest
    // survivor's resolved state, plus every later survivor's own ADDS
    // (a dir removed by a later DML is still referenced by the earlier
    // survivors that can time-travel to it, so removals never shrink the
    // union; full manifests contribute their own list directly).
    var stillReferenced = resolvedState(f, root, oldest).dirs.toSet
    survivors.tail.foreach { v =>
      val pm = parsedManifest(f, root, v)
      stillReferenced ++= (if (pm.base.isEmpty) fullDirs(pm) else pm.addDirs)
    }
    dropped.foreach { v =>
      f.delete(manifestPath(root, v), false)
      // multi-part checkpoints: the MAIN record goes first (after it no
      // reader consults the parts), then the sidecars — by GLOB, not an
      // index walk: a crashed concurrent part-write can leave a
      // non-contiguous set, and a gap-stopping loop would strand the
      // later indices forever (vacuum's orphan sweep is the backstop).
      f.delete(checkpointPath(root, v), false)
      f.globStatus(new Path(s"$root/_manifests/$v.checkpoint.part-*")) match {
        case null => ()
        case ts => ts.foreach(s => f.delete(s.getPath, false))
      }
    }
    // Re-list AFTER the manifest deletes, LOOPING until a pass observes
    // no new manifests: a commit that landed DURING this expire (e.g. a
    // concurrent restore referencing a dropped version's dirs) must
    // keep its dirs — each pass folds in every manifest the previous
    // pass hadn't seen, so the window shrinks to a single list-to-
    // delete gap. That residual gap is inherently unobservable without
    // a lock, so this is DAMAGE LIMITATION, not a concurrency
    // guarantee: the documented contract stays authoritative — expire
    // runs from a maintenance window, never concurrently with writers
    // or restores. Only NEW manifests (beyond the initial snapshot)
    // are parsed per pass — cheap.
    var seen = live.toSet
    var grew = true
    while (grew) {
      val fresh = committedVersions(f, root).filterNot(seen)
      grew = fresh.nonEmpty
      fresh.foreach { v => stillReferenced ++= dataDirsOf(f, root, v) }
      seen ++= fresh
    }
    candidates.diff(stillReferenced)
      .foreach(d => f.delete(new Path(s"$root/$d"), true))
  }

  /** Full-snapshot commit: prepare + publish at currentVersion+1.
    * Returns the committed version. Throws [[CommitConflict]] if another
    * writer committed that version first. `meta` rides in the manifest —
    * the application-level transaction record (e.g. a streaming sink's
    * batch id) that makes replays detectable. `statsCols` requests
    * per-data-dir min/max stats for those columns in the manifest — the
    * data-skipping index [[readAt]]'s `skip` predicate prunes through;
    * computed by ONE aggregate over the freshly written dir (O(batch),
    * reading back local parquet, so the stats describe the committed
    * bytes, not the input plan). */
  def commit(df: DataFrame, root: String,
             meta: Map[String, String] = Map.empty,
             statsCols: Seq[String] = Seq.empty): Long = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    val base = currentVersion(spark, root)
    val colmap = colmapOf(f, root, base)
    val dropped = droppedOf(f, root, base)
    requireNoRetiredNames(df, colmap, root, dropped.keySet)
    val pdf = toPhysical(df, colmap)
    val dir = prepare(pdf, root)
    publish(spark, root, base + 1, dir,
      // FULL base carry (ledger + colmap + retired), caller entries
      // winning: a plain overwrite interleaved with a stream must not
      // drop the stream's exactly-once watermark — a replay would then
      // re-append a committed batch (Delta carries SetTransaction
      // records through every commit the same way).
      meta = (if (base == 0) Map.empty[String, String]
              else carriedEntries(metaOf(f, root, base))) ++
        colmapMeta(colmap) ++ meta,
      schemaDdl = Some(
        toLogicalSchema(writtenSchema(spark, root, dir, pdf), colmap).toDDL),
      stats = statsFor(spark, root, dir, statsCols, colmap = colmap))
    base + 1
  }

  /** APPEND commit — the batch-proportional edition: the new version's
    * manifest references every data dir of the current version PLUS one
    * fresh dir holding only `df`'s rows (the Delta/Iceberg add-files
    * shape, dir-granular). Work per commit is O(batch), never O(table):
    * nothing existing is rewritten, read() unions the referenced dirs.
    * Concurrency control is unchanged — the manifest create arbitrates,
    * and a loser whose base-dir list went stale aborts wholesale, so a
    * racing append can never drop the winner's files.
    *
    * Schema policy (explicit, enforced AT COMMIT — never a read-time
    * surprise): the batch's schema must equal the store's recorded
    * schema (names+types, order- and nullability-insensitive) — or be
    * losslessly NARROWER on the [[widensTo]] lattice (appending int
    * rows to a long column writes a narrow dir that reads back exactly
    * through the recorded type) — or the commit throws. `mergeSchema =
    * true` opts into evolution, two shapes, both recorded in the
    * manifest (`schema` + meta key `mergeSchema`): ADDITIVE — new
    * columns append to the recorded schema, older dirs read them as
    * NULL ([[readDirs]]); and TYPE WIDENING — a shared column may
    * promote along byte → short → int → long or float → double
    * (Iceberg type promotion / Delta type widening), after which older
    * narrow dirs read through the widened recorded schema via the
    * parquet reader's native promotion, no rewrite, no cast node. Any
    * type change OFF that lattice still fails loudly at commit — no
    * flag makes two incompatible types coexist. A live STREAMING
    * reader's schema is fixed at query start, so a widening commit
    * mid-stream fails that stream at its next batch (restart to pick
    * up the wider schema) — the Delta behavior. Stores written before
    * schema recording (no `schema` in the base manifest) skip the
    * check and start recording from this commit.
    *
    * `statsCols` as in [[commit]]; earlier dirs' stats carry forward in
    * the manifest, so the latest manifest alone answers any skip query. */
  def commitAppend(df: DataFrame, root: String,
                   meta: Map[String, String] = Map.empty,
                   statsCols: Seq[String] = Seq.empty,
                   mergeSchema: Boolean = false): Long =
    commitAppendAt(df, root, currentVersion(df.sparkSession, root), meta,
      statsCols, mergeSchema)

  /** [[commitAppend]] PINNED at an expected base version — the
    * optimistic-concurrency edition for callers whose `meta` (or any other
    * state) was derived by READING version `baseVersion` first: the new
    * manifest carries exactly `baseVersion`'s dirs plus the batch's, and
    * publishes at `baseVersion + 1` under the manifest-create CAS.
    *
    * Lost races FAST-RETRY INTERNALLY (the Delta commit loop): a pure
    * append's prepared dir, validation, and stats don't depend on the
    * base, so the commit re-anchors to the new current version and
    * re-creates only the manifest — carried meta (every writer's ledger,
    * colmap, retired names) is re-derived from the new base so no other
    * writer's watermark is rolled back, while the caller's OWN entries
    * (its ledger key, its markers) win. [[CommitConflict]] still
    * propagates when re-anchoring is unsafe: the base's schema, column
    * map, or retired set changed, the chain expired mid-retry, or the
    * store was born concurrently — the caller then re-reads and
    * re-validates from scratch, the contract every read-modify-write
    * (compaction, DML) relies on. */
  def commitAppendAt(df: DataFrame, root: String, baseVersion: Long,
                     meta: Map[String, String] = Map.empty,
                     statsCols: Seq[String] = Seq.empty,
                     mergeSchema: Boolean = false): Long = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    val baseSchema =
      if (baseVersion == 0) None else schemaOf(f, root, baseVersion)
    val colmap = colmapOf(f, root, baseVersion)
    val dropped = droppedOf(f, root, baseVersion)
    requireNoRetiredNames(df, colmap, root, dropped.keySet)
    val pdf = toPhysical(df, colmap)
    val dir = prepare(pdf, root)
    // Enforce against the WRITTEN dir's read-back schema, not the input
    // plan's: the day-partition encoding round-trips a string day as an
    // inferred DATE, and a policy comparing pre-write schemas would
    // reject every append after a compaction (whose input IS a read).
    // The written schema is also what readers union, so it is the one
    // whose drift actually matters. A rejected append deletes its
    // prepared dir — same cleanup as a lost commit race. (The read-back
    // is physical; the policy compares LOGICAL names.)
    val merged =
      try {
        val m = mergedSchemaDdl(baseSchema,
          toLogicalSchema(writtenSchema(spark, root, dir, pdf), colmap),
          mergeSchema, root)
        // a freshly ADDED column is born with physical = logical; its
        // name colliding with an older column's retired physical name
        // would make two logical columns share one parquet column
        val clash = (colmap.values.toSet ++ dropped.keySet)
          .intersect(org.apache.spark.sql.types.StructType.fromDDL(m)
            .fieldNames.toSet -- colmap.keySet)
        require(clash.isEmpty,
          s"append to $root adds column(s) ${clash.mkString(",")} whose name " +
            "is the retired PHYSICAL name of a renamed or dropped column — " +
            "pick another name")
        m
      } catch { case e: Throwable =>
        f.delete(new Path(s"$root/$dir"), true); throw e }
    // FULL base carry (ledger + colmap + retired names), caller entries
    // winning: without the ledger carry, any plain append interleaved
    // with a stream would drop the stream's exactly-once watermark and
    // a replay would re-append a committed batch.
    val metaOut = (if (baseVersion == 0) Map.empty[String, String]
                   else carriedEntries(metaOf(f, root, baseVersion))) ++
      colmapMeta(colmap) ++
      (if (mergeSchema) meta + ("mergeSchema" -> "true") else meta)
    val fresh =
      try statsFor(spark, root, dir, statsCols, colmap = colmap)
      catch { case e: Throwable =>
        f.delete(new Path(s"$root/$dir"), true); throw e }
    // Log-segment append: the manifest is O(batch) — one added dir, its
    // stats, the schema and meta — NEVER a re-list of the base version's
    // dirs or a re-serialization of the table-wide stats map. The base's
    // state resolves through the segments at read time.
    if (baseVersion == 0) {
      // a conflict at birth changes the commit SHAPE (full → delta) and
      // the whole validation context — propagate for a caller re-run
      publish(spark, root, 1, dir, meta = metaOut,
        schemaDdl = Some(merged), stats = fresh)
      1L
    } else {
      // FAST CAS RETRY (the Delta commit-loop shape: write data files
      // once, retry only the log record). An append's prepared dir,
      // schema validation, and stats are all BASE-INDEPENDENT as long as
      // nothing structural changed, so a lost manifest race re-anchors
      // to the new current version and re-creates the ~1 KB manifest —
      // instead of deleting and re-writing the parquet dir, which made
      // the loser's retry cycle LONGER than the winner's commit cycle
      // and let one writer starve under contention (measured: a
      // 13-retry / 14 s single-commit tail at 2 writers + maintenance).
      // Re-anchoring is taken only when the new base's schema, column
      // map, and retired set all equal the validated base's; any drift
      // (or an expired chain) falls back to the abort-and-propagate
      // contract so the caller re-validates from scratch.
      //
      // Carried meta is RE-DERIVED per attempt: the caller's ledger
      // entries were read at ITS base, and publishing them over a newer
      // base would roll back any other writer's watermark committed in
      // between (a replay would then duplicate its batch). Entries the
      // caller changed (its own ledger key, its markers) win; everything
      // else re-carries from the attempt's base.
      val origCarried = carriedEntries(metaOf(f, root, baseVersion))
      val callerOwn = metaOut.filter { case (k, v) =>
        !origCarried.get(k).contains(v) }
      // The caller's own LEDGER updates are read-modify-write on the
      // watermark: if ANOTHER process advanced one of these keys between
      // bases (a zombie instance of the same streaming writer committing
      // the same batch), re-anchoring would publish the batch TWICE —
      // exactly what the pinned-base CAS exists to catch. Those keys
      // must be untouched at the new base or the conflict propagates
      // (the caller then re-reads the ledger and sees its batch landed).
      val ledgerOwn = callerOwn.keySet.filter(k =>
        k == "batchId" || k.startsWith("batch."))
      var base = baseVersion
      var committed = -1L
      var attempt = 0
      while (committed < 0) {
        val attemptMeta =
          if (base == baseVersion) metaOut
          else carriedEntries(metaOf(f, root, base)) ++ callerOwn
        try {
          publishDelta(spark, root, base + 1,
            addDirs = Seq(dir), removedDirs = Seq.empty,
            meta = attemptMeta, schemaDdl = Some(merged),
            statsForAdded = fresh, anchor = dir,
            cleanupOnConflict = false)
          committed = base + 1
        } catch {
          case e: CommitConflict =>
            attempt += 1
            val safeBase =
              try {
                val nb = currentVersion(spark, root)
                if (attempt < 50 && nb > base &&
                    schemaOf(f, root, nb) == schemaOf(f, root, baseVersion) &&
                    colmapOf(f, root, nb) == colmap &&
                    droppedOf(f, root, nb) == dropped &&
                    ledgerOwn.forall(k => metaOf(f, root, nb).get(k) ==
                      metaOf(f, root, baseVersion).get(k))) Some(nb) else None
              } catch { case scala.util.control.NonFatal(_) => None }
            safeBase match {
              case Some(nb) =>
                // tiny jitter only: the retry is a manifest create, so
                // the collision window is milliseconds, not a prepare
                Thread.sleep(
                  5 + java.util.concurrent.ThreadLocalRandom.current().nextInt(20))
                base = nb
              case None =>
                f.delete(new Path(s"$root/$dir"), true)
                throw e
            }
        }
      }
      committed
    }
  }

  /** The schema readers will actually see for a freshly prepared dir —
    * its read-back schema (partition-encoded columns come back with
    * their INFERRED types). Falls back to the input plan's schema when
    * the dir has nothing to infer from (an empty partitioned write). */
  private def writtenSchema(spark: SparkSession, root: String, dir: String,
                            df: DataFrame): org.apache.spark.sql.types.StructType =
    try spark.read.parquet(s"$root/$dir").schema
    catch { case _: org.apache.spark.sql.AnalysisException => df.schema }

  /** A (physical) read-back schema mapped to its logical field names. */
  private def toLogicalSchema(s: org.apache.spark.sql.types.StructType,
                              colmap: Map[String, String]): org.apache.spark.sql.types.StructType =
    if (colmap.isEmpty) s
    else {
      import org.apache.spark.sql.types.{StructField, StructType}
      val rev = colmap.map(_.swap)
      StructType(s.fields.map(f =>
        StructField(rev.getOrElse(f.name, f.name), f.dataType, f.nullable, f.metadata)))
    }

  /** Lossless widening lattice (the Iceberg type-promotion / Delta
    * type-widening set this store supports): the integral chain
    * byte → short → int → long, and float → double. A value of the
    * narrower type reads back EXACTLY through the wider one, and the
    * Spark 4 parquet vectorized reader performs these promotions
    * natively when handed the wider requested schema — so after a
    * widening commit, older (narrower) dirs need no rewrite and no
    * cast node: [[readDirs]]' recorded-schema read covers them. */
  private def widensTo(from: org.apache.spark.sql.types.DataType,
                       to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    val integral = Seq[DataType](ByteType, ShortType, IntegerType, LongType)
    val fractional = Seq[DataType](FloatType, DoubleType)
    def chainLt(chain: Seq[DataType]) = {
      val (i, j) = (chain.indexOf(from), chain.indexOf(to))
      i >= 0 && j >= 0 && i < j
    }
    chainLt(integral) || chainLt(fractional)
  }

  /** Enforce the append schema policy; returns the DDL to record. */
  private def mergedSchemaDdl(baseDdl: Option[String],
                              newSchema: org.apache.spark.sql.types.StructType,
                              mergeSchema: Boolean, root: String): String = {
    import org.apache.spark.sql.types.{StructField, StructType}
    baseDdl match {
      case None => newSchema.toDDL // legacy store or first commit: adopt
      case Some(ddl) =>
        val base = StructType.fromDDL(ddl)
        val baseTypes = base.map(f => f.name -> f.dataType).toMap
        val dfTypes = newSchema.map(f => f.name -> f.dataType).toMap
        // Shared columns resolve to the WIDER type when one side widens
        // losslessly into the other; anything off the lattice is still a
        // loud commit-time failure — no flag makes two incompatible
        // types coexist. A NARROWER batch needs no flag (the recorded
        // schema doesn't move; the new dir reads back exactly through
        // the wider recorded type). PROMOTION — the recorded schema
        // widening to admit the batch — is schema evolution and takes
        // the same mergeSchema opt-in as added columns.
        val conflicts = dfTypes.collect {
          case (n, t) if baseTypes.get(n).exists(b =>
              b != t && !widensTo(t, b) && !widensTo(b, t)) =>
            s"$n: ${baseTypes(n).simpleString} -> ${t.simpleString}"
        }
        if (conflicts.nonEmpty)
          throw new IllegalArgumentException(
            s"append to $root changes column TYPES (${conflicts.mkString("; ")}); " +
              "only lossless widening (byte->short->int->long, float->double) " +
              "evolves in place — rewrite via a full-snapshot commit instead")
        val promoted = base.filter(f =>
          dfTypes.get(f.name).exists(t => widensTo(f.dataType, t)))
        val added = newSchema.filterNot(f => baseTypes.contains(f.name))
        val dropped = baseTypes.keySet.diff(dfTypes.keySet)
        if (added.isEmpty && dropped.isEmpty && promoted.isEmpty) ddl
        else if (!mergeSchema)
          throw new IllegalArgumentException(
            s"append to $root drifts from the recorded schema " +
              s"(added: ${added.map(_.name).mkString(",")}; " +
              s"missing: ${dropped.mkString(",")}; " +
              s"widened: ${promoted.map(f => s"${f.name}: " +
                s"${f.dataType.simpleString} -> ${dfTypes(f.name).simpleString}")
                .mkString(",")}); " +
              "pass mergeSchema = true to evolve additively / widen types")
        else {
          val widenedBase = base.fields.map { f =>
            if (promoted.exists(_.name == f.name))
              StructField(f.name, dfTypes(f.name), f.nullable, f.metadata)
            else f
          }
          StructType(widenedBase ++ added).toDDL
        }
    }
  }

  /** Full-snapshot [[commit]] PINNED at an expected base version — same
    * stale-base abort contract as [[commitAppendAt]]: publishes at
    * `baseVersion + 1` or throws [[CommitConflict]] if anything committed
    * after the caller read `baseVersion`. The seam compaction needs: its
    * rewritten snapshot and carried-forward meta are both reads of
    * `baseVersion`, and an interleaved micro-batch between read and
    * publish must abort the compaction, never vanish from the table. */
  def commitAt(df: DataFrame, root: String, baseVersion: Long,
               meta: Map[String, String] = Map.empty,
               statsCols: Seq[String] = Seq.empty): Long = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    val colmap = colmapOf(f, root, baseVersion)
    requireNoRetiredNames(df, colmap, root, droppedOf(f, root, baseVersion).keySet)
    val pdf = toPhysical(df, colmap)
    val dir = prepare(pdf, root)
    publish(spark, root, baseVersion + 1, dir,
      meta = (if (baseVersion == 0) Map.empty[String, String]
              else carriedEntries(metaOf(f, root, baseVersion))) ++
        colmapMeta(colmap) ++ meta,
      schemaDdl = Some(
        toLogicalSchema(writtenSchema(spark, root, dir, pdf), colmap).toDDL),
      stats = statsFor(spark, root, dir, statsCols, colmap = colmap))
    baseVersion + 1
  }

  /** OPTIMIZE — CLUSTER BY a layout key: rewrite the current snapshot
    * into `buckets` key-range data dirs (quantile-bounded on
    * `clusterKey`, each dir sorted by the key within its partitions) so
    * the manifest's per-DIR min/max stats become a multi-dimensional
    * skipping index. Pass a Z-order key
    * ([[graft.functions.ZOrder.zorder_key]]) over two columns and a
    * point read on EITHER column prunes to the few dirs whose
    * interleaved range can hold it — the Delta `OPTIMIZE ZORDER BY`
    * move, manifest-granular. `statsCols` are the ORIGINAL columns to
    * record stats for (the dimensions, not the key).
    *
    * Scale shape: one pass to bound the key (approx quantiles, ε=0.001),
    * one pass per bucket over the persisted keyed snapshot to write its
    * slice — O(table) total work like any clustering rewrite, driver
    * memory O(buckets). Slices are mutually exclusive and exhaustive by
    * construction (half-open ranges over the same sorted distinct
    * boundaries; NULL keys ride the first bucket), so the rewrite is
    * row-exact — and the oracle gate on the registered query pins that.
    * Empty slices (skewed keys collapsing quantiles) are skipped, never
    * committed as schema-less dirs.
    *
    * Publishes at base+1 with the same CAS contract as [[commitAt]]: an
    * interleaved commit wins, the rewrite aborts with [[CommitConflict]]
    * and removes every prepared dir. Like compaction, a version range
    * spanning an optimize has no dir-level change feed ([[readChanges]]
    * throws; a [[graft.sources.VersionedCdc]] stream must re-baseline). */
  def optimize(spark: SparkSession, root: String,
               clusterKey: org.apache.spark.sql.Column, buckets: Int = 8,
               statsCols: Seq[String] = Seq.empty,
               meta: Map[String, String] = Map.empty): Long = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val base = currentVersion(spark, root)
    require(base > 0, s"nothing to optimize: $root has no committed version")
    val kcol = "__graft_cluster_key"
    val colmap = colmapOf(fs(spark, root), root, base)
    val snapshot = readAt(spark, root, base)
    val keyed = snapshot.withColumn(kcol, clusterKey.cast("double")).persist()
    try {
      val bounds: Array[Double] =
        if (buckets == 1) Array.empty
        else keyed.stat.approxQuantile(
          kcol, (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
          .distinct.sorted
      import org.apache.spark.sql.functions.{col => c, lit}
      val preds: Seq[org.apache.spark.sql.Column] =
        if (bounds.isEmpty) Seq(lit(true))
        else {
          val first = c(kcol).isNull || c(kcol) < lit(bounds.head)
          val mids = bounds.toSeq.zip(bounds.tail).map { case (lo, hi) =>
            c(kcol) >= lit(lo) && c(kcol) < lit(hi)
          }
          (first +: mids) :+ (c(kcol) >= lit(bounds.last))
        }
      // Bucket occupancy in ONE aggregate job over the cached snapshot
      // (max of a 0/1 flag per slice predicate), replacing a per-bucket
      // sequential `isEmpty` loop — N probe jobs collapse to one, so
      // empty-slice detection costs one scheduler round at any bucket
      // count. Skewed keys collapsing quantiles leave empty slices; they
      // are skipped, never committed as schema-less dirs.
      import org.apache.spark.sql.functions.{max, when}
      val occAggs = preds.zipWithIndex.map { case (p, i) =>
        max(when(p, lit(1)).otherwise(lit(0))).as(s"occ_$i") }
      val occRow = keyed.agg(occAggs.head, occAggs.tail: _*).head()
      // Bucket writes run CONCURRENTLY (disjoint slices of one persisted
      // frame; each prepare is its own job) — sequential writes serialize
      // N scheduler round-trips for no reason. Future.traverse preserves
      // bucket order in `dirs`, so the manifest lists dirs in cluster-key
      // order as before.
      import scala.concurrent.duration.Duration
      import scala.concurrent.{Await, ExecutionContext, Future}
      implicit val ec: ExecutionContext = ioPool
      val dirs = Await.result(
        Future.traverse(preds.zipWithIndex.toList) { case (p, i) => ioFuture {
          if (occRow.isNullAt(i) || occRow.getInt(i) == 0) None
          else Some(prepare(toPhysical(
            keyed.filter(p).sortWithinPartitions(c(kcol))
              .select(snapshot.columns.map(c).toSeq: _*), colmap), root))
        }}, Duration.Inf).flatten
      require(dirs.nonEmpty, s"optimize of $root produced no data dirs")
      val schemaDdl = schemaOf(fs(spark, root), root, base)
        .getOrElse(toLogicalSchema(
          writtenSchema(spark, root, dirs.head, snapshot), colmap).toDDL)
      val stats = statsForDirs(spark, root, dirs, statsCols,
        schemaDdl = Some(schemaDdl), colmap = colmap)
      // The base's LEDGER entries carry forward (the stream replay
      // watermark survives OPTIMIZE, like Delta's SetTransaction
      // records); descriptive markers of earlier commits do not.
      publish(spark, root, base + 1, dirs.last, baseDirs = Seq.empty,
        meta = carriedEntries(metaAt(spark, root, base)) ++ meta +
          ("optimize" -> s"cluster-by:${buckets}b"),
        schemaDdl = Some(schemaDdl), stats = stats, extraNewDirs = dirs.init)
      base + 1
    } finally { keyed.unpersist(); () }
  }

  /** Row-level DELETE — copy-on-write at the store's dir granularity
    * (the Delta `DELETE WHERE` move, manifest edition): rows matching
    * `predicate` leave the CURRENT snapshot; every other row — and every
    * data dir the predicate cannot touch — survives byte-identically.
    *
    * Cost shape, the reason this works at 100 TB: `prune` (the same
    * [[ColRange]]s the read path skips with) bounds the candidate dirs
    * through manifest stats BEFORE any data is read; each candidate then
    * pays one pushed-down existence probe (`filter(pred).isEmpty` — a
    * parquet scan that short-circuits on the first hit), and ONLY dirs
    * that actually contain matches are rewritten. A targeted delete over
    * a long-appended store rewrites one dir, not the table. Untouched
    * dirs are carried into the new manifest by reference with their
    * stats; rewritten dirs get fresh stats for `statsCols`.
    *
    * Semantics: SQL DELETE — a row is removed iff the predicate is TRUE;
    * FALSE and NULL both keep it. A dir whose every row matches is
    * dropped from the snapshot entirely. A delete that matches nothing
    * is a NO-OP: returns the current version, commits nothing. Old
    * versions still time-travel to the pre-delete rows until [[expire]].
    * Like any rewrite, an append-range change feed across it is
    * undefined: [[readChanges]] throws its snapshot-rewrite error and a
    * [[graft.sources.VersionedCdc]] stream re-baselines.
    *
    * `prune` is a caller ASSERTION, and unlike the read path it is
    * CORRECTNESS-BEARING: on reads a wrong skip range merely reads more;
    * here a range that excludes a dir actually holding matching rows
    * silently leaves those rows UNDELETED — fatal for the GDPR/excision
    * use-case. Pass ranges only when the predicate provably implies them
    * (e.g. the predicate itself carries `key >= lo && key <= hi`). When
    * the stakes demand proof, set `verifyPrune = true`: the existence
    * probe then sweeps EVERY dir (one job — pushed-down predicate
    * columns only, each dir short-circuiting at its first match) and the
    * delete fails loudly BEFORE any rewrite if a pruned-out dir matches.
    * Verification reads the predicate's columns across the table, so it
    * trades the prune's O(touched) scan bound for certainty — still far
    * cheaper than the rewrite it guards.
    *
    * Concurrency: CAS at base+1 ([[commitAt]]'s contract) — an
    * interleaved commit wins and the delete aborts with
    * [[CommitConflict]], removing its prepared dirs; retry by re-running
    * (the re-run re-reads the new base, so an interleaved append's rows
    * are re-considered, never silently resurrected). The base version's
    * commit meta — notably [[graft.streaming.VersionedStream]]'s
    * exactly-once batch ledger — is carried forward (Delta carries
    * SetTransaction records through DELETE the same way), so a stream
    * replay arriving after the delete still sees its watermark. */
  def deleteWhere(spark: SparkSession, root: String,
                  predicate: org.apache.spark.sql.Column,
                  prune: Seq[ColRange] = Seq.empty,
                  statsCols: Seq[String] = Seq.empty,
                  meta: Map[String, String] = Map.empty,
                  verifyPrune: Boolean = false): Long = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    val base = currentVersion(spark, root)
    require(base > 0, s"nothing to delete from: $root has no committed version")
    val f = fs(spark, root)
    val all = dataDirsOf(f, root, base)
    val baseStats = statsOf(f, root, base)
    val baseMeta = metaOf(f, root, base)
    val colmap = colmapOf(f, root, base)
    val candidates =
      if (prune.isEmpty) all else pruneWithStats(all, baseStats, prune)
    // Existence probe — ONE job over the candidates (every dir when
    // verifying the prune): dirs with no matching row are NOT rewritten
    // (stats said "might match"; the data says no).
    val matched = probeMatching(spark, root,
      if (verifyPrune) all else candidates, predicate, schemaOf(f, root, base),
      colmap, baseStats)
    if (verifyPrune) requireSoundPrune("deleteWhere", root, matched, candidates)
    val touched = candidates.filter(matched.contains)
    if (touched.isEmpty) return base
    val untouched = all.filterNot(touched.contains)
    val keep = not(coalesce(predicate, lit(false)))
    // Touched dirs rewrite CONCURRENTLY (disjoint inputs, each prepare its
    // own job) — a wide GDPR-style delete over 100+ dirs would otherwise
    // serialize one scheduler round-trip per dir (optimize's bucket
    // writes got the same treatment; measured in StoreProbe's DML A/B).
    // Future.traverse preserves dir order in `rewritten`.
    // Each future rewrites AND stats its dir — a separate sequential
    // statsFor pass would re-serialize one scheduler round-trip per dir
    // (measured: the 20-dir delete's residual linear term).
    val rewrittenWithStats = {
      import scala.concurrent.duration.Duration
      import scala.concurrent.{Await, ExecutionContext, Future}
      implicit val ec: ExecutionContext = ioPool
      Await.result(
        Future.traverse(touched.toList) { d => ioFuture {
          val kept = toLogical(
              openDirPhys(spark, root, d, None, dvFor(baseStats, d)), colmap)
            .filter(keep)
          if (kept.isEmpty) None else {
            val nd = prepare(toPhysical(kept, colmap), root)
            Some((nd, statsFor(spark, root, nd, statsCols, colmap = colmap)))
          }
        }}, Duration.Inf).flatten
    }
    val rewritten = rewrittenWithStats.map(_._1)
    if (rewritten.isEmpty && untouched.isEmpty)
      throw new IllegalStateException(
        s"deleteWhere would empty $root entirely; an empty snapshot has no " +
          "readable schema — commit an explicit empty snapshot instead")
    val fresh = rewrittenWithStats.flatMap(_._2).toMap
    val schemaDdl = schemaOf(f, root, base)
    // Log-segment commit: removed = the touched dirs, add = their
    // rewrites. Untouched dirs (at 100 TB, almost all) are never
    // re-listed — the base's state resolves through the segments. Meta
    // carries ONLY the base's LEDGER entries (the exactly-once replay
    // watermark must survive DML) plus this op's marker — descriptive
    // markers of earlier commits do not accumulate (restore's
    // ledger-only discipline, applied uniformly).
    val metaOut = carriedEntries(baseMeta) ++ meta + ("delete" -> "where")
    if (rewritten.isEmpty)
      // Every touched dir emptied out: the commit only DROPS dirs. The
      // manifest's dataDir anchor re-uses the newest untouched dir,
      // flagged carried so publishDelta neither lists its files nor —
      // on a lost commit race — deletes live data.
      publishDelta(spark, root, base + 1,
        addDirs = Seq.empty, removedDirs = touched,
        meta = metaOut, schemaDdl = schemaDdl, statsForAdded = Map.empty,
        anchor = untouched.last, anchorIsCarried = true)
    else
      publishDelta(spark, root, base + 1,
        addDirs = rewritten, removedDirs = touched,
        meta = metaOut, schemaDdl = schemaDdl, statsForAdded = fresh,
        anchor = rewritten.last)
    base + 1
  }

  /** Row-level DELETE, MERGE-ON-READ — the Delta deletion-vector move
    * (see the deletion-vectors block above): instead of rewriting every
    * touched dir (copy-on-write — pathological for a one-row GDPR
    * delete inside a big dir, or a scattered delete touching many dirs:
    * O(touched dirs × dir size) rewritten for O(rows) deleted), record
    * the deleted (file, position) pairs in a per-dir sidecar and let
    * every read path anti-apply it. Cost: O(matching rows) written,
    * ZERO data dirs rewritten. The trade is read-side: each DV'd dir
    * pays one broadcast anti-join per scan until any copy-on-write
    * rewrite of the dir — [[optimize]], [[updateWhere]],
    * [[deleteWhere]], MERGE — materializes the deletes and drops the
    * vector with the dir.
    *
    * Semantics are [[deleteWhere]]'s exactly: TRUE removes, FALSE/NULL
    * keep; a no-match delete (including one matching only
    * already-deleted rows — the probe sees live rows only) is a
    * version-less no-op; a dir whose every LIVE row matches leaves the
    * snapshot outright (never an all-deleted sidecar); old versions
    * time-travel to the pre-delete rows until [[expire]]; the ledger
    * carries; CAS at base+1 with sidecar cleanup on conflict. Repeated
    * DVs UNION into a fresh superseding sidecar (the old file stays for
    * time travel; [[vacuum]] sweeps it once unreferenced). `prune` /
    * `verifyPrune`: same contract and correctness stakes as
    * [[deleteWhere]].
    *
    * Interplay: [[readChanges]] (dir-level feed) THROWS across a DV
    * commit like any snapshot rewrite — rows left without a dir
    * changing hands; [[readRowChanges]] reports the delta exactly (the
    * newly-marked positions surface as `delete` rows); [[countWhere]]
    * stays exact — DV'd dirs lose metadata-only eligibility under
    * ranges and subtract `dvrows` from the whole-table count. */
  def deleteWhereDv(spark: SparkSession, root: String,
                    predicate: org.apache.spark.sql.Column,
                    prune: Seq[ColRange] = Seq.empty,
                    meta: Map[String, String] = Map.empty,
                    verifyPrune: Boolean = false): Long = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit}
    val base = currentVersion(spark, root)
    require(base > 0, s"nothing to delete from: $root has no committed version")
    val f = fs(spark, root)
    val all = dataDirsOf(f, root, base)
    val baseStats = statsOf(f, root, base)
    val baseMeta = metaOf(f, root, base)
    val colmap = colmapOf(f, root, base)
    val schemaDdl = schemaOf(f, root, base)
    val physSchema = schemaDdl.map(d =>
      org.apache.spark.sql.types.StructType.fromDDL(physicalDdl(d, colmap)))
    val candidates =
      if (prune.isEmpty) all else pruneWithStats(all, baseStats, prune)
    val matched = probeMatching(spark, root,
      if (verifyPrune) all else candidates, predicate, schemaDdl, colmap,
      baseStats)
    if (verifyPrune) requireSoundPrune("deleteWhereDv", root, matched, candidates)
    val touched = candidates.filter(matched.contains)
    if (touched.isEmpty) return base
    val hit = coalesce(predicate, lit(false))
    // Per touched dir (concurrently, disjoint inputs): the positions of
    // newly-matching LIVE rows (existing DV anti-applied first — a
    // re-marked position would inflate dvrows and countWhere with it)
    // union the old DV into a fresh superseding sidecar. Left(dir) = the
    // dir's every live row matched — remove it from the snapshot;
    // Right((dir, sidecar, positions)) = the new reference.
    val results: List[Either[String, (String, String, Long)]] = {
      import scala.concurrent.duration.Duration
      import scala.concurrent.{Await, ExecutionContext, Future}
      implicit val ec: ExecutionContext = ioPool
      Await.result(Future.traverse(touched.toList) { d => ioFuture {
        val oldDvName = dvFor(baseStats, d)
        val reader = physSchema.fold(spark.read)(spark.read.schema)
        val raw = reader.parquet(s"$root/$d")
          .withColumn("__dv_f", dvFileCol(d))
          .withColumn("__dv_p", col("_metadata.row_index"))
        val oldDv = oldDvName.map(n => dvSidecar(spark, root, d, n))
        val live = oldDv.fold(raw)(o =>
          raw.join(broadcast(o), Seq("__dv_f", "__dv_p"), "left_anti"))
        val marks = toLogical(live, colmap).filter(hit)
          .select(col("__dv_f"), col("__dv_p"))
        val combined = oldDv.fold(marks)(o => marks.unionByName(o)).distinct()
        // ONE distributed job writes the union; the decision counts come
        // from parquet FOOTERS (row-count metadata, no second scan) — no
        // driver-side materialization of the vector at any size
        val name = s"_dv-${java.util.UUID.randomUUID()}"
        combined.coalesce(1).write.mode(SaveMode.ErrorIfExists)
          .parquet(s"$root/$d/$name")
        val total = dvSidecar(spark, root, d, name).count()
        val oldCount = oldDvName.map(_ =>
          baseStats(s"$d|#|dvrows").toLong).getOrElse(0L)
        if (total == oldCount) { // matched rows were all already dead
          f.delete(new Path(s"$root/$d/$name"), true); None
        } else {
          val dirRows = baseStats.get(s"$d|#|rows").map(_.toLong)
            .getOrElse(reader.parquet(s"$root/$d").count())
          if (total >= dirRows) { // nothing left alive: drop the dir
            f.delete(new Path(s"$root/$d/$name"), true); Some(Left(d))
          } else Some(Right((d, name, total)))
        }
      }}, Duration.Inf).flatten
    }
    val removed = results.collect { case Left(d) => d }
    val dvd = results.collect { case Right(t) => t }
    if (removed.isEmpty && dvd.isEmpty) return base
    val survivors = all.filterNot(removed.contains)
    if (survivors.isEmpty)
      throw new IllegalStateException(
        s"deleteWhereDv would empty $root entirely; an empty snapshot has " +
          "no readable schema — commit an explicit empty snapshot instead")
    val dvStats = dvd.flatMap { case (d, n, c) =>
      Seq(s"$d|#|dv" -> n, s"$d|#|dvrows" -> c.toString) }.toMap
    try {
      publishDelta(spark, root, base + 1,
        addDirs = Seq.empty, removedDirs = removed,
        meta = carriedEntries(baseMeta) ++ meta + ("delete" -> "dv"),
        schemaDdl = schemaDdl, statsForAdded = dvStats,
        anchor = survivors.last, anchorIsCarried = true)
    } catch { case e: CommitConflict =>
      // the losing sidecars are ours to clean (committed dirs are not)
      dvd.foreach { case (d, n, _) =>
        f.delete(new Path(s"$root/$d/$n"), true) }
      throw e
    }
    base + 1
  }

  /** Metadata-first COUNT under a conjunction of [[ColRange]]s — the
    * Iceberg "metadata-only query" seam: the count of rows where every
    * range's `lo <= col <= hi` holds (an EMPTY `ranges` counts the whole
    * snapshot from the manifest alone).
    *
    * Three-way dir split, all decided from the manifest before any data
    * is touched:
    *   - PRUNED: stats can't overlap some range — contributes 0.
    *   - FULLY CONTAINED: for every range, the dir's [min, max] lies
    *     inside [lo, hi] AND its recorded NULL count for that column is
    *     0 (min/max say nothing about NULLs, and a NULL never satisfies
    *     a range) — contributes its manifest row count, no read.
    *   - RESIDUAL: overlaps but isn't contained, or predates row-count /
    *     null-count recording — read and counted under the real
    *     predicate (typed via the column itself; literals coerce).
    * At 100 TB a time-range count over an aligned-append store is a
    * manifest read plus at most two boundary-dir scans. Exactness is
    * unconditional: the split is conservative, never a guess. */
  def countWhere(spark: SparkSession, root: String,
                 ranges: Seq[ColRange] = Seq.empty,
                 version: Long = -1L): Long = {
    val v = if (version < 0) currentVersion(spark, root) else version
    require(v > 0, s"countWhere on empty store $root")
    val f = fs(spark, root)
    val stats = statsOf(f, root, v)
    val (meta, residual) = countPlan(spark, root, ranges, v)
    // DV'd dirs reach the metadata leg only under EMPTY ranges (see
    // countPlan), where rows − dvrows is exact (dvrows counts DISTINCT
    // deleted positions by deleteWhereDv's construction).
    val metaCount = meta.map(d => stats(s"$d|#|rows").toLong -
      stats.getOrElse(s"$d|#|dvrows", "0").toLong).sum
    val residualCount =
      if (residual.isEmpty) 0L
      else {
        import org.apache.spark.sql.functions.{col => c, lit}
        val pred = ranges.map { r =>
          val bounded = Seq(
            r.lo.map(lo => c(r.column) >= lit(lo)),
            r.hi.map(hi => c(r.column) <= lit(hi))).flatten
          bounded.reduceOption(_ && _).getOrElse(lit(true))
        }.reduceOption(_ && _).getOrElse(lit(true))
        readDirs(spark, root, residual,
          allDirs = dataDirsOf(f, root, v),
          schemaDdl = schemaOf(f, root, v),
          colmap = colmapOf(f, root, v),
          stats = stats).filter(pred).count()
      }
    metaCount + residualCount
  }

  /** The manifest-vs-read split [[countWhere]] will use for `ranges` —
    * exposed so callers (and the spec gate) can assert how much data a
    * metadata count actually touches: (fully-contained dirs, residual
    * dirs to be read). Pruned dirs appear in neither. */
  def countPlan(spark: SparkSession, root: String, ranges: Seq[ColRange],
                version: Long = -1L): (Seq[String], Seq[String]) = {
    val v = if (version < 0) currentVersion(spark, root) else version
    val f = fs(spark, root)
    val all = dataDirsOf(f, root, v)
    val stats = statsOf(f, root, v)
    val surviving =
      if (ranges.isEmpty) all else pruneWithStats(all, stats, ranges)
    def contained(d: String): Boolean = ranges.forall { r =>
      (stats.get(s"$d|${r.column}|min"), stats.get(s"$d|${r.column}|max"),
        stats.get(s"$d|${r.column}|typ"), stats.get(s"$d|${r.column}|nulls")) match {
        case (Some(mn), Some(mx), Some(typ), Some(nulls)) =>
          nulls == "0" &&
            r.lo.forall(lo => statLe(typ, lo, mn)) &&
            r.hi.forall(hi => statLe(typ, mx, hi))
        case _ => false
      }
    }
    // A DV'd dir is metadata-eligible only for the WHOLE-TABLE count
    // (rows − dvrows is exact there); under ranges a deleted row may
    // satisfy them, so min/max containment no longer implies the
    // manifest row count — the dir reads as residual.
    surviving.partition(d => stats.contains(s"$d|#|rows") && contained(d) &&
      (ranges.isEmpty || dvFor(stats, d).isEmpty))
  }

  /** Row-level UPDATE — `UPDATE SET col = expr, ... WHERE predicate`,
    * completing the DML triad ([[deleteWhere]], [[mergeInto]]) with the
    * same dir-granular copy-on-write shape: `prune` + existence probes
    * bound the rewrite to dirs that actually hold matching rows; each
    * such dir is rewritten with `set`'s expressions applied to matching
    * rows and every other row byte-equal; untouched dirs — at 100 TB,
    * almost all — carry by reference with their stats.
    *
    * Semantics: SQL UPDATE — a row is updated iff the predicate is TRUE
    * (FALSE and NULL leave it untouched); `set` columns must already
    * exist in the schema with unchanged types (adding columns is
    * [[commitAppend]]+mergeSchema's job; changing types is nobody's).
    * `set` expressions see the PRE-update row (standard UPDATE
    * semantics: all assignments evaluate against the old values).
    * A no-match update is a version-less no-op. Same CAS contract,
    * change-feed caveat, ledger carry-forward, and `prune`
    * caller-ASSERTION / `verifyPrune` proof option as [[deleteWhere]] —
    * a wrong prune here silently leaves matching rows UN-updated. */
  def updateWhere(spark: SparkSession, root: String,
                  predicate: org.apache.spark.sql.Column,
                  set: Map[String, org.apache.spark.sql.Column],
                  prune: Seq[ColRange] = Seq.empty,
                  statsCols: Seq[String] = Seq.empty,
                  meta: Map[String, String] = Map.empty,
                  verifyPrune: Boolean = false): Long = {
    import org.apache.spark.sql.functions.{coalesce, col => c, lit, when}
    require(set.nonEmpty, "updateWhere needs at least one SET assignment")
    val base = currentVersion(spark, root)
    require(base > 0, s"nothing to update in: $root has no committed version")
    val f = fs(spark, root)
    val all = dataDirsOf(f, root, base)
    val baseStats = statsOf(f, root, base)
    val baseMeta = metaOf(f, root, base)
    val recorded = schemaOf(f, root, base)
    recorded.foreach { ddl =>
      val cols = org.apache.spark.sql.types.StructType.fromDDL(ddl).fieldNames.toSet
      val unknown = set.keySet.diff(cols)
      require(unknown.isEmpty,
        s"SET names columns not in the recorded schema: ${unknown.mkString(",")}")
    }
    val colmap = colmapOf(f, root, base)
    val candidates =
      if (prune.isEmpty) all else pruneWithStats(all, baseStats, prune)
    val matched = probeMatching(spark, root,
      if (verifyPrune) all else candidates, predicate, recorded, colmap,
      baseStats)
    if (verifyPrune) requireSoundPrune("updateWhere", root, matched, candidates)
    val touched = candidates.filter(matched.contains)
    if (touched.isEmpty) return base
    val hit = coalesce(predicate, lit(false))
    // Concurrent per-dir rewrite + stats, like deleteWhere — order kept.
    val rewrittenWithStats = {
      import scala.concurrent.duration.Duration
      import scala.concurrent.{Await, ExecutionContext, Future}
      implicit val ec: ExecutionContext = ioPool
      Await.result(
        Future.traverse(touched.toList) { d => ioFuture {
          val df = toLogical(
            openDirPhys(spark, root, d, None, dvFor(baseStats, d)), colmap)
          val updated = df.select(df.columns.map { n =>
            set.get(n) match {
              case Some(expr) => when(hit, expr).otherwise(c(n)).as(n)
              case None => c(n)
            }
          }.toSeq: _*)
          val nd = prepare(toPhysical(updated, colmap), root)
          (nd, statsFor(spark, root, nd, statsCols, colmap = colmap))
        }}, Duration.Inf)
    }
    val rewritten = rewrittenWithStats.map(_._1)
    val fresh = rewrittenWithStats.flatMap(_._2).toMap
    publishDelta(spark, root, base + 1,
      addDirs = rewritten, removedDirs = touched,
      meta = carriedEntries(baseMeta) ++ meta +
        ("update" -> s"set:${set.keys.toSeq.sorted.mkString("+")}"),
      schemaDdl = recorded, statsForAdded = fresh,
      anchor = rewritten.last)
    base + 1
  }

  /** RESTORE — the Delta `RESTORE TABLE ... TO VERSION AS OF v` move:
    * commit a NEW version whose snapshot is byte-identical to version
    * `toVersion`, by referencing that version's data dirs — no data is
    * copied, the restore is a manifest-only commit (O(dirs), not
    * O(table)), and history is preserved: the bad versions stay
    * time-travelable until [[expire]], the restore is just the newest
    * edition. The restored manifest carries `toVersion`'s schema and
    * stats verbatim, so data skipping keeps working. Restoring to the
    * current version is a no-op (returns the current version). Same
    * CAS arbitration as any commit.
    *
    * Ledger semantics: the restored manifest carries `toVersion`'s meta,
    * but [[graft.streaming.VersionedStream]]'s exactly-once batch-ledger
    * keys are taken from the CURRENT version — restoring the OLD ledger
    * values would regress each writer's replay watermark, and the batches
    * between toVersion and now really were delivered once already (the
    * restore undoes their ROWS deliberately; replaying them afterwards
    * would re-apply data the operator just chose to discard). */
  def restore(spark: SparkSession, root: String, toVersion: Long,
              meta: Map[String, String] = Map.empty): Long = {
    val f = fs(spark, root)
    val cur = currentVersion(spark, root)
    require(toVersion > 0, s"versions start at 1, got $toVersion")
    if (!f.exists(manifestPath(root, toVersion)))
      throw new IllegalArgumentException(
        s"version $toVersion of $root does not exist (never committed, or expired)")
    if (toVersion == cur) return cur
    val dirs = dataDirsOf(f, root, toVersion)
    // Carry toVersion's LEDGER+COLMAP entries only — never its
    // descriptive markers ("optimize", "update", ...): the restore is
    // its OWN commit, and a stale marker riding it would misdescribe it
    // (the row-level change feed skips "optimize"-marked commits, so a
    // carried marker would silently drop the restore's changes from a
    // CDF consumer). Schema and stats carry through their own fields.
    publish(spark, root, cur + 1, dirs.last, baseDirs = dirs.init,
      meta = carriedEntries(metaOf(f, root, toVersion)) ++
        ledgerEntries(metaOf(f, root, cur)) ++
        meta + ("restore" -> toVersion.toString),
      schemaDdl = schemaOf(f, root, toVersion),
      stats = statsOf(f, root, toVersion),
      dataDirIsCarried = true)
    cur + 1
  }

  /** The subset of a commit's meta that is [[graft.streaming
    * .VersionedStream]]'s per-writer exactly-once batch ledger: the keyed
    * `batch.<writerId>` entries plus the legacy un-keyed `batchId`. */
  private[graft] def ledgerEntries(m: Map[String, String]): Map[String, String] =
    m.filter { case (k, _) => k == "batchId" || k.startsWith("batch.") }

  /** MERGE (upsert) — the Delta `MERGE INTO target USING source ON
    * target.k = source.k WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED
    * THEN INSERT *` move, manifest edition: every target row whose key
    * tuple appears in `source` is REPLACED by the source row; every
    * source row matching nothing is INSERTED. Copy-on-write at dir
    * granularity, two-pass like Delta's:
    *
    *   Pass 1 (find touched dirs): candidate dirs are bounded from the
    *   manifest alone — the caller's `prune` ranges plus DERIVED ranges
    *   [min(source.k), max(source.k)] per key column (sound because a
    *   match must carry a key the source contains; dirs without key
    *   stats are kept). One key-column-pruned probe job unions the
    *   candidates, semi-joins the source's distinct keys, and returns
    *   the dirs that actually hold matches.
    *
    *   Pass 2 (rewrite + append): each touched dir is rewritten minus
    *   its matched rows (anti-join; AQE broadcasts the batch-sized key
    *   set); the source lands whole as one fresh dir. Untouched dirs —
    *   at 100 TB, almost all of them — are carried by reference with
    *   their stats.
    *
    * Work is O(touched dirs + source), never O(table): a daily upsert
    * over a long-appended keyed store probes the few dirs whose key
    * range overlaps the batch and rewrites only those with real matches.
    *
    * Semantics and guard rails:
    *   - `source` rows with a fully-non-NULL key tuple must be UNIQUE on
    *     `keys` (two updates for one target row is ambiguous — throws,
    *     like Delta's multiple-matches error). NULL-keyed source rows
    *     never match (SQL equality) and simply insert; NULL-keyed target
    *     rows never match and survive.
    *   - `prune` is a caller ASSERTION that matched target rows live
    *     only in dirs overlapping the ranges (e.g. "this batch only
    *     touches day X"). A wrong assertion leaves stale matched rows
    *     behind (the new version would hold both editions); the derived
    *     key ranges need no assertion — they are implied by equality.
    *   - Schema policy is [[commitAppend]]'s: source schema must equal
    *     the recorded schema, `mergeSchema` opts into additive drift,
    *     type conflicts always throw.
    *   - Same CAS contract as [[deleteWhere]]: publishes at base+1 or
    *     aborts with [[CommitConflict]], cleaning its prepared dirs.
    *     Old versions still time-travel to the pre-merge rows; a change
    *     feed across a merge that rewrote dirs is a snapshot rewrite
    *     ([[readChanges]] throws; a pure-insert merge — zero touched
    *     dirs — stays a clean append and the feed reads just the batch).
    * Returns the committed version (the unchanged current version when
    * `source` is empty). */
  def mergeInto(spark: SparkSession, root: String, source: DataFrame,
                keys: Seq[String],
                prune: Seq[ColRange] = Seq.empty,
                statsCols: Seq[String] = Seq.empty,
                mergeSchema: Boolean = false,
                meta: Map[String, String] = Map.empty): Long = {
    import org.apache.spark.sql.functions.{col => c, input_file_name, lit, max, min}
    val base = currentVersion(spark, root)
    require(base > 0, s"nothing to merge into: $root has no committed version")
    require(keys.nonEmpty, "mergeInto needs at least one key column")
    val missing = keys.filterNot(source.columns.contains)
    require(missing.isEmpty,
      s"merge keys not in the source schema: ${missing.mkString(",")}")

    val profile = mergeSourceProfile(source, keys)
    if (profile.isEmpty) return base
    val (ndistinct, derived, hasDupKeys) = profile.get

    val f = fs(spark, root)
    val all = dataDirsOf(f, root, base)
    val baseStats = statsOf(f, root, base)
    val baseMeta = metaOf(f, root, base)
    val candidates = pruneWithStats(all, baseStats, prune ++ derived)
    val recordedDdl = schemaOf(f, root, base)
    val colmap = colmapOf(f, root, base)

    val (srcKeys, touched, keyPred) = probeTouchedByKeys(spark, root,
      candidates, source, keys, ndistinct, recordedDdl, colmap, baseStats)
    // whole-row upsert = an unconditional matched UPDATE, so a duplicate
    // key is ambiguous exactly when it meets a target row
    if (hasDupKeys)
      requireNoAmbiguousDupKeys(spark, root, source, keys, touched,
        recordedDdl, colmap, baseStats)

    // Pass 2: rewrite touched dirs minus their matched rows; append the
    // source as its own dir (schema-policed like any append). A source
    // whose schema ALREADY equals the recorded one (names+types; the
    // steady-state of every maintained table) skips the written-dir
    // schema-inference read — the policy can't drift when nothing moved.
    requireNoRetiredNames(source, colmap, root, droppedOf(f, root, base).keySet)
    val psource = toPhysical(source, colmap)
    val srcDir = prepare(psource, root)
    val sameAsRecorded = recordedDdl.exists { ddl =>
      val rec = org.apache.spark.sql.types.StructType.fromDDL(ddl)
      rec.length == source.schema.length && rec.forall(rf =>
        source.schema.find(_.name == rf.name).exists(_.dataType == rf.dataType))
    }
    val merged =
      try if (sameAsRecorded) recordedDdl.get
        else mergedSchemaDdl(recordedDdl,
          toLogicalSchema(writtenSchema(spark, root, srcDir, psource), colmap),
          mergeSchema, root)
      catch { case e: Throwable =>
        f.delete(new Path(s"$root/$srcDir"), true); throw e }
    // Concurrent per-dir rewrites (write-only futures), then ONE batched
    // stats job over every fresh dir: emptiness detection rides the
    // per-dir row counts (an all-matched dir writes empty, reads back as
    // zero rows, and is deleted instead of referenced), so neither a
    // per-dir emptiness probe nor a per-dir stats job survives.
    val rewrittenAll = {
      import scala.concurrent.duration.Duration
      import scala.concurrent.{Await, ExecutionContext, Future}
      implicit val ec: ExecutionContext = ioPool
      Await.result(
        Future.traverse(touched.toSeq.sorted.toList) { d => ioFuture {
          // reading through the known merged schema (rather than
          // re-inferring per dir) spares every rewrite its schema-
          // inference job; a pre-evolution dir's missing columns read
          // as NULL, a pre-widening dir reads widened — the rewrite
          // normalizes the dir to the current schema.
          // the rewrite reads DV-applied (deleted rows stay deleted) and
          // its fresh dir carries no DV reference — copy-on-write
          // naturally compacts the vector away
          val dirDf = toLogical(openDirPhys(spark, root, d,
            Some(org.apache.spark.sql.types.StructType
              .fromDDL(physicalDdl(merged, colmap))),
            dvFor(baseStats, d)), colmap)
          val kept = keyPred match {
            case Some(p) =>
              dirDf.filter(!org.apache.spark.sql.functions.coalesce(p, lit(false)))
            case None    => dirDf.join(srcKeys, keys, "left_anti")
          }
          prepare(toPhysical(kept, colmap), root)
        }}, Duration.Inf)
    }
    val (addDirs, fresh) = statsDroppingEmpty(spark, root,
      rewrittenAll :+ srcDir, droppable = rewrittenAll.toSet,
      statsCols, schemaDdl = Some(merged), colmap = colmap)
    // The base's LEDGER entries carry forward through MERGE (the stream
    // replay watermark survives, like Delta's SetTransaction records);
    // descriptive markers of earlier commits do not accumulate.
    publishDelta(spark, root, base + 1,
      addDirs = addDirs, removedDirs = touched.toSeq.sorted,
      meta = carriedEntries(baseMeta) ++
        (if (mergeSchema) meta + ("mergeSchema" -> "true") else meta) +
        ("merge" -> s"upsert:${keys.mkString("+")}"),
      schemaDdl = Some(merged), statsForAdded = fresh,
      anchor = srcDir)
    base + 1
  }

  /** Shared MERGE key probe: (the distinct non-NULL-keyed source key
    * frame, the candidate dirs holding at least one matching row, the
    * literal key predicate when the key set is small enough to collect).
    *
    * SMALL-SOURCE fast path (the aggregate-view / point-upsert shape):
    * when the source's distinct key set is tiny, COLLECT it and match
    * via a literal key predicate instead of semi/anti JOINS — the
    * probe's predicate pushes into the parquet scans (row-group
    * pruning, no broadcast build job), and every rewrite becomes a
    * pushed-down filter. Above the threshold the join path stands —
    * a literal predicate over millions of tuples is its own pathology.
    *
    * The join path is ONE probe job over all candidates, column-pruned
    * to the keys, each scan tagged with its dir. A dir missing a key
    * column (pre-evolution dir) reads that key as NULL and can never
    * match (NULL never equals a key). */
  private def probeTouchedByKeys(spark: SparkSession, root: String,
      candidates: Seq[String], source: DataFrame, keys: Seq[String],
      ndistinct: Long, recordedDdl: Option[String],
      colmap: Map[String, String],
      stats: Map[String, String] = Map.empty)
      : (DataFrame, Set[String], Option[org.apache.spark.sql.Column]) = {
    import org.apache.spark.sql.functions.{col => c, lit}
    val keyedNonNull = keys.map(c(_).isNotNull).reduce(_ && _)
    val srcKeys = source.select(keys.map(c): _*).filter(keyedNonNull).distinct()
    val keyPred: Option[org.apache.spark.sql.Column] =
      if (ndistinct > 1024) None
      else {
        // balanced OR — a left-deep 1024-term disjunction is ~1024
        // Catalyst frames deep and overflowed the default JVM stack
        val terms = srcKeys.collect().map { r =>
          keys.zipWithIndex.map { case (k, i) => c(k) <=> lit(r.get(i)) }
            .reduce(_ && _)
        }.toSeq
        Some(if (terms.isEmpty) lit(false) // all-NULL keys match nothing
             else balancedReduce(terms)(_ || _))
      }
    val touched: Set[String] =
      if (candidates.isEmpty) Set.empty
      else keyPred match {
        case Some(p) => probeMatching(spark, root, candidates, p, recordedDdl,
          colmap, stats)
        case None => candidates.map { d =>
          val df = toLogical(
            openDirPhys(spark, root, d, None, dvFor(stats, d)), colmap)
          keys.foldLeft(df) { (acc, k) =>
            if (acc.columns.contains(k)) acc else acc.withColumn(k, lit(null))
          }.select(keys.map(c): _*).withColumn("__graft_dir", lit(d))
        }.reduce(_ unionByName _)
          .join(srcKeys, keys, "left_semi")
          .select("__graft_dir").distinct().collect().map(_.getString(0)).toSet
      }
    (srcKeys, touched, keyPred)
  }

  /** ONE source pass shared by both MERGE shapes, folding what used to
    * be three jobs: emptiness (returns None — the merge is a no-op),
    * duplicate-key detection (row count vs non-NULL-keyed count vs
    * distinct-tuple count: `count(DISTINCT k...)` skips tuples with any
    * NULL — exactly the non-NULL-keyed population, so nk > nd IFF some
    * tuple repeats; the flag defers to [[requireNoAmbiguousDupKeys]],
    * which is fatal only when a duplicate actually MEETS a target row —
    * Delta's contract), and min/max per key in the stats' external
    * string form (the [[ColRange]]s that prune candidate dirs; all-NULL
    * keys derive nothing). Returns (distinct key count, derived ranges,
    * duplicates-present flag). */
  private def mergeSourceProfile(source: DataFrame, keys: Seq[String])
      : Option[(Long, Seq[ColRange], Boolean)] = {
    import org.apache.spark.sql.functions.{col => c, count, countDistinct, lit, max, min, when}
    val keyedNonNull = keys.map(c(_).isNotNull).reduce(_ && _)
    val srcAggs = Seq(count(lit(1)).as("__n"),
      count(when(keyedNonNull, lit(1))).as("__nk"),
      countDistinct(c(keys.head), keys.tail.map(c): _*).as("__nd")) ++
      keys.flatMap(k => Seq(min(c(k)).cast("string"), max(c(k)).cast("string")))
    val aggRow = source.agg(srcAggs.head, srcAggs.tail: _*).head()
    if (aggRow.getLong(0) == 0L) return None
    val derived = keys.zipWithIndex.flatMap { case (k, i) =>
      if (aggRow.isNullAt(3 + 2 * i)) None
      else Some(ColRange(k, Some(aggRow.getString(3 + 2 * i)),
        Some(aggRow.getString(3 + 2 * i + 1))))
    }
    Some((aggRow.getLong(2), derived, aggRow.getLong(1) != aggRow.getLong(2)))
  }

  /** Deferred duplicate-key ambiguity check, Delta's semantics: a
    * duplicate source key tuple is fatal ONLY when it actually matches a
    * target row — two source rows meeting ONE target row is ambiguous
    * under any matched clause — while duplicates that match nothing are
    * legal and insert as distinct NOT-MATCHED rows. Callers invoke this
    * only on the duplicate path (the unique-key steady state pays
    * nothing) and only when a matched clause exists (an insert-only
    * merge ignores matched rows, so no pairing is ever ambiguous). Cost:
    * one semi-join of the duplicate keys against the TOUCHED dirs' keys
    * — a source key matching any target row put its dir in `touched` by
    * the probe's definition, so the scan never widens past the rewrite
    * set. */
  private def requireNoAmbiguousDupKeys(spark: SparkSession, root: String,
      source: DataFrame, keys: Seq[String], touched: Set[String],
      recordedDdl: Option[String], colmap: Map[String, String],
      stats: Map[String, String] = Map.empty): Unit = {
    if (touched.isEmpty) return
    import org.apache.spark.sql.functions.{col => c, lit}
    val keyedNonNull = keys.map(c(_).isNotNull).reduce(_ && _)
    val dupKeys = source.filter(keyedNonNull)
      .groupBy(keys.map(c): _*).count()
      .filter(c("count") > 1).drop("count")
    val schema = recordedDdl.map(d =>
      org.apache.spark.sql.types.StructType.fromDDL(physicalDdl(d, colmap)))
    val targetKeys = touched.toSeq.sorted.map { d =>
      // DV-applied: a duplicate matching only DELETED rows is legal
      val df = toLogical(
        openDirPhys(spark, root, d, schema, dvFor(stats, d)), colmap)
      keys.foldLeft(df) { (acc, k) =>
        if (acc.columns.contains(k)) acc else acc.withColumn(k, lit(null))
      }.select(keys.map(c): _*)
    }.reduce(_ unionByName _)
    val clash = dupKeys.join(targetKeys, keys, "left_semi").take(1)
    if (clash.nonEmpty)
      throw new IllegalArgumentException(
        s"merge source has duplicate key tuples that match a target row " +
          s"(e.g. ${clash.head}); two source rows updating one target row " +
          "is ambiguous — deduplicate the source (duplicates that only " +
          "INSERT are permitted)")
  }

  /** ONE batched stats job over a MERGE's fresh dirs, then delete (not
    * reference) the `droppable` ones that wrote ZERO rows — emptiness
    * detection rides the per-dir row counts, so neither a per-dir
    * emptiness probe nor a per-dir stats job exists. Returns the
    * surviving dirs (input order kept) with their stats. */
  private def statsDroppingEmpty(spark: SparkSession, root: String,
      freshDirs: Seq[String], droppable: Set[String],
      statsCols: Seq[String], schemaDdl: Option[String],
      colmap: Map[String, String]): (Seq[String], Map[String, String]) = {
    val f = fs(spark, root)
    val allStats = statsForDirs(spark, root, freshDirs, statsCols,
      schemaDdl = schemaDdl, colmap = colmap)
    val emptyDirs = freshDirs.filter(d => droppable(d) &&
      allStats.get(s"$d|#|rows").forall(_.toLong == 0L)).toSet
    emptyDirs.foreach(d => f.delete(new Path(s"$root/$d"), true))
    (freshDirs.filterNot(emptyDirs),
      allStats.filterNot { case (k, _) =>
        emptyDirs.exists(d => k.startsWith(s"$d|")) })
  }

  /** One MATCHED clause of a conditional [[mergeIntoClauses]] MERGE.
    * `condition` and the `set` values are Columns whose attribute
    * references name the target row as `t.<col>` and the source row as
    * `s.<col>` (the SQL front door rewrites resolved references into
    * exactly this form; Scala callers write `col("t.x")`/`col("s.x")`
    * or `expr(...)` the same way). A `None` condition always applies. */
  sealed trait MergeMatched
  object MergeMatched {
    /** `WHEN MATCHED [AND condition] THEN UPDATE SET col = value, ...` —
      * partial-column updates allowed; unnamed columns keep their
      * target value; every value is CAST to the column's recorded type
      * (SQL store-assignment semantics — the rewrite must never drift
      * the table schema). */
    final case class Update(condition: Option[org.apache.spark.sql.Column],
                            set: Map[String, org.apache.spark.sql.Column])
        extends MergeMatched
    /** `WHEN MATCHED [AND condition] THEN DELETE`. */
    final case class Delete(condition: Option[org.apache.spark.sql.Column])
        extends MergeMatched
  }

  /** The NOT MATCHED insert clause of a conditional [[mergeIntoClauses]]
    * MERGE. `condition` references `s.<col>` only (an unmatched row has
    * no target side); `values` None = `INSERT *` (every target column
    * from its same-named source column), Some(map) = a PARTIAL column
    * list — named target columns take their value expressions
    * (`s.<col>` references), omitted columns insert NULL of the
    * recorded type (standard SQL INSERT semantics; Delta permits the
    * same shape). The merge keys need not be named: an unnamed key
    * inserts NULL, which is legal (NULL keys never match anything). */
  final case class MergeInsert(
      condition: Option[org.apache.spark.sql.Column],
      values: Option[Map[String, org.apache.spark.sql.Column]] = None)

  /** Conditional-clause MERGE — the full Delta `MERGE INTO` grammar
    * lowered onto the store's dir-granular copy-on-write:
    * `WHEN MATCHED [AND c] THEN UPDATE SET ... | DELETE` clauses
    * (FIRST-MATCH-WINS, the SQL standard's order semantics), an
    * optional `WHEN NOT MATCHED [AND c] THEN INSERT ...`
    * ([[MergeInsert]]: star or a partial column list), and `WHEN NOT
    * MATCHED BY SOURCE [AND c] THEN UPDATE SET ... | DELETE` clauses
    * (`notMatchedBySource`, first-match-wins among themselves) applying
    * to target rows with NO source key match — conditions and SET
    * values there reference `t.<col>` only (the source side of an
    * unmatched row does not exist; Delta rejects the same).
    *
    * Cost shape: the source's derived key ranges prune candidate dirs
    * through manifest stats; ONE probe finds the dirs actually holding
    * matching keys; those rewrite (each dir left-outer-joined to the
    * source on the keys — every target row meets at most one source
    * row because ambiguous duplicate source keys are rejected, so the
    * join can never grow a dir); untouched dirs — at 100 TB, almost
    * all — carry by reference. BY SOURCE clauses are, by definition,
    * an every-dir rewrite (any dir can hold unmatched rows) — EXCEPT
    * when every BY SOURCE clause carries a condition, where one
    * existence probe bounds the rewrite to dirs holding at least one
    * condition-passing row (rows passing the condition but matched by
    * key resolve inside the rewrite, so the probe is a sound
    * over-approximation). Inserts anti-join the source against ONLY
    * the touched dirs' keys (a source key matching nowhere cannot
    * live in an untouched dir, by the probe's definition) and land as
    * one fresh dir.
    *
    * Semantics notes: a matched target row takes the FIRST matched
    * clause whose condition is TRUE (NULL = false); an unmatched
    * target row takes the first applicable BY SOURCE clause; no
    * applicable clause → the row survives unchanged. An EMPTY source
    * no-ops unless BY SOURCE clauses exist (then every target row is
    * unmatched — Delta's contract). UPDATE values evaluate against the
    * pre-update row (+ its matched source row for matched clauses) and
    * cast to the column's recorded type. The table schema never
    * changes (schema evolution is the whole-row [[mergeInto]]'s
    * mergeSchema contract). A merge that touches nothing and inserts
    * nothing is a version-less no-op. Same CAS commit, ledger carry,
    * stats reproduction, and insert/delete change-feed labeling as
    * every DML. */
  def mergeIntoClauses(spark: SparkSession, root: String, source: DataFrame,
                       keys: Seq[String],
                       matched: Seq[MergeMatched],
                       insertNotMatched: Option[MergeInsert],
                       notMatchedBySource: Seq[MergeMatched] = Seq.empty,
                       statsCols: Seq[String] = Seq.empty,
                       meta: Map[String, String] = Map.empty): Long = {
    import org.apache.spark.sql.functions.{coalesce, col => c, count, countDistinct, lit, max, min, when}
    val base = currentVersion(spark, root)
    require(base > 0, s"nothing to merge into: $root has no committed version")
    require(keys.nonEmpty, "mergeIntoClauses needs at least one key column")
    require(matched.nonEmpty || insertNotMatched.nonEmpty ||
        notMatchedBySource.nonEmpty,
      "mergeIntoClauses needs at least one WHEN clause")
    val missing = keys.filterNot(source.columns.contains)
    require(missing.isEmpty,
      s"merge keys not in the source schema: ${missing.mkString(",")}")
    require(!source.columns.exists(_.startsWith("__graft_")),
      "source columns may not use the reserved __graft_ prefix")

    val f = fs(spark, root)
    val recordedDdl = schemaOf(f, root, base)
    val recorded = org.apache.spark.sql.types.StructType.fromDDL(
      recordedDdl.getOrElse(throw new IllegalStateException(
        s"$root records no schema (legacy store) — conditional MERGE needs " +
          "the recorded schema; commit once first")))
    (matched ++ notMatchedBySource).foreach {
      case MergeMatched.Update(_, set) =>
        val unknown = set.keySet.diff(recorded.fieldNames.toSet)
        require(unknown.isEmpty,
          s"UPDATE SET names columns not in the recorded schema: " +
            s"${unknown.mkString(",")}")
      case _ => ()
    }
    // a BY SOURCE row has no source side — its condition and SET values
    // must reference the target row only (Delta rejects the same shape)
    def requireTargetOnly(col: org.apache.spark.sql.Column, what: String): Unit =
      require(!org.apache.spark.sql.GraftColumnBridge.parsedExpression(col).exists {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          u.nameParts.length > 1 && u.nameParts.head == "s"
        case _ => false
      }, s"$what may reference target (t.) columns only — a row not " +
        "matched by source has no source side")
    notMatchedBySource.foreach {
      case MergeMatched.Update(cond, set) =>
        cond.foreach(requireTargetOnly(_, "WHEN NOT MATCHED BY SOURCE AND"))
        set.foreach { case (k, v) =>
          requireTargetOnly(v, s"NOT MATCHED BY SOURCE UPDATE SET $k") }
      case MergeMatched.Delete(cond) =>
        cond.foreach(requireTargetOnly(_, "WHEN NOT MATCHED BY SOURCE AND"))
    }
    insertNotMatched.foreach { ins =>
      ins.values match {
        case None =>
          val short = recorded.fieldNames.filterNot(source.columns.contains)
          require(short.isEmpty,
            s"INSERT * needs every target column on the source, missing: " +
              s"${short.mkString(",")}")
        case Some(vals) =>
          val unknown = vals.keySet.diff(recorded.fieldNames.toSet)
          require(unknown.isEmpty,
            s"INSERT names columns not in the recorded schema: " +
              s"${unknown.mkString(",")}")
      }
    }

    val profile = mergeSourceProfile(source, keys)
    // an empty source no-ops — unless BY SOURCE clauses exist, where
    // EVERY target row is unmatched and the clauses apply to all of them
    if (profile.isEmpty && notMatchedBySource.isEmpty) return base
    val (ndistinct, derived, hasDupKeys) =
      profile.getOrElse((0L, Seq.empty[ColRange], false))
    val all = dataDirsOf(f, root, base)
    val baseMeta = metaOf(f, root, base)
    val colmap = colmapOf(f, root, base)
    requireNoRetiredNames(source, colmap, root, droppedOf(f, root, base).keySet)
    val baseStats = statsOf(f, root, base)
    val candidates = pruneWithStats(all, baseStats, derived)
    val touched: Set[String] =
      if (profile.isEmpty) Set.empty
      else probeTouchedByKeys(spark, root, candidates,
        source, keys, ndistinct, recordedDdl, colmap, baseStats)._2
    // an insert-only merge ignores matched rows entirely — no pairing is
    // ambiguous, so duplicate keys are checked only under matched clauses
    if (hasDupKeys && matched.nonEmpty)
      requireNoAmbiguousDupKeys(spark, root, source, keys, touched,
        recordedDdl, colmap, baseStats)

    def condOr(cond: Option[org.apache.spark.sql.Column],
               default: Boolean): org.apache.spark.sql.Column =
      cond.map(x => coalesce(x, lit(false))).getOrElse(lit(default))
    // a BY SOURCE condition in the t./s. alias contract, re-aimed at an
    // UNALIASED dir scan (for the existence probe): t.<col> → <col>
    def stripTargetAlias(col: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      org.apache.spark.sql.GraftColumnBridge.column(
        org.apache.spark.sql.GraftColumnBridge.parsedExpression(col).transform {
          // >= 2, not == 2: a nested-field reference (t.addr.city) parses
          // as nameParts [t, addr, city] and must lose the alias too, or
          // the unaliased probe scan fails analysis on the phantom `t`
          case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
              if u.nameParts.length >= 2 && u.nameParts.head == "t" =>
            org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
              u.nameParts.tail)
        })
    val physSchema = org.apache.spark.sql.types.StructType
      .fromDDL(physicalDdl(recorded.toDDL, colmap))

    // The rewrite set: matched clauses touch only the key-probed dirs;
    // BY SOURCE clauses reach any dir holding an applicable unmatched
    // row — every dir when some clause is unconditional, else the dirs
    // one existence probe finds under the OR of the clause conditions,
    // with the probe itself STATS-BOUNDED first: each clause condition
    // derives conservative [[ColRange]]s (the same derivation the merge
    // key path uses), so a condition like `t.grp = 'g3' AND t.id > N`
    // prunes through manifest min/max + bloom and the probe opens a
    // handful of dirs, not the table (the dir-decade measured the
    // unpruned probe term growing linearly, 1.19 s → 12.68 s across
    // 100 → 1000 dirs, while the rewrite stayed at 1 dir).
    val bySourceDirs: Set[String] =
      if (notMatchedBySource.isEmpty) Set.empty
      else {
        val conds = notMatchedBySource.map {
          case MergeMatched.Update(x, _) => x
          case MergeMatched.Delete(x)    => x
        }
        if (conds.exists(_.isEmpty)) all.toSet
        else {
          // touched dirs fold in unconditionally: they may hold
          // condition-passing unmatched rows too, and the key probe
          // already proved they rewrite
          val rest = all.filterNot(touched)
          if (rest.isEmpty) touched
          else {
            val stripped = conds.flatten.map(stripTargetAlias)
            val probeSet =
              bySourceProbeSet(rest, baseStats, stripped, recorded, colmap)
            val pred = stripped
              .map(x => coalesce(x, lit(false))).reduce(_ || _)
            probeMatching(spark, root, probeSet, pred, recordedDdl, colmap,
              baseStats) ++ touched
          }
        }
      }
    val rewriteSet: Seq[String] =
      (if (matched.isEmpty) bySourceDirs
       else bySourceDirs ++ touched).toSeq.sorted

    // Rewrite each dir in the set (concurrently, disjoint inputs): LEFT
    // OUTER join to the marked source on the keys, resolve the first
    // applicable clause per row — matched clauses for rows with a
    // source match, BY SOURCE clauses for rows without — drop DELETE
    // rows, apply UPDATE assignments (cast to the recorded types), keep
    // everything else byte-equal. Skipped entirely when no clause can
    // change a row (insert-only merge — the touched dirs only feed the
    // anti-join).
    val mCount = matched.size
    val allClauses: Seq[(MergeMatched, Int, Boolean)] =
      matched.zipWithIndex.map { case (cl, i) => (cl, i, true) } ++
        notMatchedBySource.zipWithIndex.map { case (cl, i) =>
          (cl, mCount + i, false) }
    val updates = allClauses.collect {
      case (u: MergeMatched.Update, i, _) => (u, i) }
    val deleteIdx = allClauses.collect {
      case (_: MergeMatched.Delete, i, _) => i }
    // With NO matched clause the rewrite join only answers "does this
    // target row have a source match" — and Delta then legally permits
    // DUPLICATE source keys (requireNoAmbiguousDupKeys is skipped: no
    // pairing is ambiguous when no clause reads the pair). Joining the
    // full source would fan a target row met by N duplicate key rows
    // into N surviving copies; the DISTINCT key tuples carry the same
    // mark without growing the dir. Matched clauses need the full rows
    // (their SET/conditions read s.<col>), and there the dup check runs.
    val marked =
      (if (matched.isEmpty) source.select(keys.map(c): _*).distinct()
       else source).withColumn("__graft_m", lit(true)).alias("s")
    val joinCond = keys.map(k => c(s"t.$k") === c(s"s.$k")).reduce(_ && _)
    def rewriteDir(d: String): String = {
      val dirDf = toLogical(openDirPhys(spark, root, d, Some(physSchema),
        dvFor(baseStats, d)), colmap).alias("t")
      val joined = dirDf.join(marked, joinCond, "left_outer")
      val isM = c("__graft_m").isNotNull
      val action = allClauses
        .foldLeft(when(lit(false), lit(-1))) { case (acc, (cl, i, onMatched)) =>
          val cond = cl match {
            case MergeMatched.Update(x, _) => condOr(x, default = true)
            case MergeMatched.Delete(x)    => condOr(x, default = true)
          }
          acc.when((if (onMatched) isM else !isM) && cond, lit(i))
        }.otherwise(lit(-1))
      val kept =
        if (deleteIdx.isEmpty) joined
        else joined.filter(!action.isin(deleteIdx: _*))
      val out = kept.select(recorded.fields.toSeq.map { fd =>
        val v = updates.foldRight(c(s"t.${fd.name}"): org.apache.spark.sql.Column) {
          case ((u, i), els) => u.set.get(fd.name) match {
            case Some(expr) => when(action === i, expr).otherwise(els)
            case None       => els
          }
        }
        v.cast(fd.dataType).as(fd.name)
      }: _*)
      prepare(toPhysical(out, colmap), root)
    }
    val rewrittenAll: Seq[String] =
      if (rewriteSet.isEmpty) Seq.empty
      else {
        import scala.concurrent.duration.Duration
        import scala.concurrent.{Await, ExecutionContext, Future}
        implicit val ec: ExecutionContext = ioPool
        Await.result(Future.traverse(rewriteSet.toList)(d =>
          ioFuture(rewriteDir(d))), Duration.Inf)
      }

    // NOT MATCHED inserts: the source anti-joined against the touched
    // dirs' keys (column-pruned scans — matching keys cannot live in an
    // untouched dir), filtered by the insert condition (s.<col> refs),
    // aligned to the recorded column order and types — star inserts
    // take every same-named source column, a partial column list takes
    // its value expressions with NULL for the omitted columns.
    val insDir: Option[String] = insertNotMatched.flatMap { ins =>
      if (profile.isEmpty) None // empty source: nothing to insert
      else Some {
        val targetKeys: Option[DataFrame] =
          if (touched.isEmpty) None
          else Some(touched.toSeq.sorted.map { d =>
            toLogical(openDirPhys(spark, root, d, Some(physSchema),
              dvFor(baseStats, d)), colmap)
              .select(keys.map(c): _*)
          }.reduce(_ unionByName _).distinct())
        val filtered = source.alias("s").filter(condOr(ins.condition, default = true))
        val anti = targetKeys.fold(filtered)(tk =>
          filtered.join(tk, keys, "left_anti"))
        val out = anti.select(recorded.fields.toSeq.map { fd =>
          val v = ins.values match {
            case None       => c(fd.name)
            case Some(vals) => vals.getOrElse(fd.name,
              lit(null): org.apache.spark.sql.Column)
          }
          v.cast(fd.dataType).as(fd.name)
        }: _*)
        prepare(toPhysical(out, colmap), root)
      }
    }

    // ONE batched stats job over every fresh dir; zero-row dirs (every
    // row deleted; no inserts survived the anti-join) are dropped, not
    // referenced.
    val freshDirs = rewrittenAll ++ insDir.toSeq
    val (addDirs, fresh) = statsDroppingEmpty(spark, root, freshDirs,
      droppable = freshDirs.toSet, statsCols,
      schemaDdl = Some(recorded.toDDL), colmap = colmap)
    val removedDirs = rewriteSet
    if (addDirs.isEmpty && removedDirs.isEmpty) return base
    val untouched = all.filterNot(removedDirs.contains)
    if (addDirs.isEmpty && untouched.isEmpty)
      throw new IllegalStateException(
        s"mergeIntoClauses would empty $root entirely; an empty snapshot " +
          "has no readable schema — commit an explicit empty snapshot instead")
    val marker = "merge" ->
      (s"clauses:m${matched.size}i${insertNotMatched.size}" +
        (if (notMatchedBySource.nonEmpty) s"b${notMatchedBySource.size}"
         else "") +
        s":${keys.mkString("+")}")
    if (addDirs.isEmpty)
      publishDelta(spark, root, base + 1,
        addDirs = Seq.empty, removedDirs = removedDirs,
        meta = carriedEntries(baseMeta) ++ meta + marker,
        schemaDdl = recordedDdl, statsForAdded = Map.empty,
        anchor = untouched.last, anchorIsCarried = true)
    else
      publishDelta(spark, root, base + 1,
        addDirs = addDirs, removedDirs = removedDirs,
        meta = carriedEntries(baseMeta) ++ meta + marker,
        schemaDdl = recordedDdl, statsForAdded = fresh,
        anchor = addDirs.last)
    base + 1
  }

  /** ONE existence-probe job over `dirs`: the subset holding at least one
    * row matching `predicate`. Each dir contributes a column-pruned,
    * predicate-pushed scan capped at one row (`limit(1)` short-circuits a
    * dir as soon as a match surfaces); the per-dir legs union into a
    * SINGLE job. The alternative — a sequential per-dir
    * `filter(pred).isEmpty` loop — pays one scheduler round-trip PER DIR,
    * so on a thousand-dir store the loop's job-launch latency alone costs
    * tens of seconds before any byte is read; here probe wall-time is one
    * scheduler round regardless of dir count (measured in
    * [[graft.StoreProbe]]'s probe A/B). */
  /** Conservative [[ColRange]]s implied by an UNRESOLVED, alias-stripped
    * target-only condition (a BY SOURCE clause condition): conjuncts of
    * bare-column-vs-literal comparisons only, typed through the RECORDED
    * schema so the derived bound compares under the same order the
    * stats' [[statLe]] uses. Anything else — disjunctions, functions,
    * columns missing from the schema, type pairs whose comparison
    * semantics diverge from the stats serialization — derives nothing
    * for that conjunct (pruning is an optimization, never a filter).
    *
    * Excluded type pairs, deliberately: session-zoned timestamps on
    * either side (their string form depends on the session zone — the
    * same exclusion the DSv2 pushdown derivation makes) and a STRING
    * column compared to a non-string literal (Spark compares those
    * numerically; the stats would compare lexically — a wrong prune is
    * a wrong answer). A string literal against a date/numeric column is
    * safe: [[statLe]] parses the bound under the COLUMN's recorded typ,
    * matching Spark's own cast-the-string coercion, and an unparseable
    * bound throws into the caller's keep-all fallback. */
  private def colRangesFromCondition(
      cond: org.apache.spark.sql.Column,
      recorded: org.apache.spark.sql.types.StructType): Seq[ColRange] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    def fieldOf(e: Expression): Option[StructField] = e match {
      case u: UnresolvedAttribute if u.nameParts.length == 1 =>
        recorded.fields.find(_.name == u.nameParts.head)
      case _ => None
    }
    def numeric(t: DataType): Boolean = t match {
      case ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | _: DecimalType => true
      case _ => false
    }
    def render(l: Literal, f: StructField): Option[String] = {
      if (l.value == null) return None
      val sound = (f.dataType, l.dataType) match {
        case (TimestampType, _) | (_, TimestampType) => false
        case (a, b) if a == b                        => true
        case (a, b) if numeric(a) && numeric(b)      => true
        case (DateType | TimestampNTZType, StringType) => true
        case _                                       => false
      }
      if (!sound) None
      else Option(Cast(l, StringType,
          Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
        .eval(org.apache.spark.sql.catalyst.InternalRow.empty)).map(_.toString)
    }
    def walk(e: Expression): Seq[ColRange] = e match {
      case And(a, b) => walk(a) ++ walk(b)
      case EqualTo(a, l: Literal) => fieldOf(a).flatMap(f =>
        render(l, f).map(v => ColRange(f.name, Some(v), Some(v)))).toSeq
      case EqualTo(l: Literal, a) => walk(EqualTo(a, l))
      case EqualNullSafe(a, l: Literal) => walk(EqualTo(a, l))
      case EqualNullSafe(l: Literal, a) => walk(EqualTo(a, l))
      case GreaterThan(a, l: Literal) => fieldOf(a).flatMap(f =>
        render(l, f).map(v => ColRange(f.name, Some(v), None))).toSeq
      case GreaterThanOrEqual(a, l: Literal) => walk(GreaterThan(a, l))
      case LessThan(a, l: Literal) => fieldOf(a).flatMap(f =>
        render(l, f).map(v => ColRange(f.name, None, Some(v)))).toSeq
      case LessThanOrEqual(a, l: Literal) => walk(LessThan(a, l))
      case GreaterThan(l: Literal, a) => walk(LessThan(a, l))
      case GreaterThanOrEqual(l: Literal, a) => walk(LessThan(a, l))
      case LessThan(l: Literal, a) => walk(GreaterThan(a, l))
      case LessThanOrEqual(l: Literal, a) => walk(GreaterThan(a, l))
      case _ => Seq.empty
    }
    walk(org.apache.spark.sql.GraftColumnBridge.parsedExpression(cond))
  }

  /** The dirs a BY SOURCE existence probe must actually OPEN: for each
    * stripped clause condition, prune `rest` through the manifest stats
    * under the condition's derived ranges (min/max + bloom point
    * predicates, column-mapping epochs expanded), then union across
    * clauses — sound for the probe's OR-of-conditions predicate because
    * a dir pruned under EVERY clause's ranges provably holds no row
    * satisfying ANY clause. A clause deriving no ranges, or a typed
    * comparison throwing on an unparseable bound, keeps all of `rest`
    * for that clause — the probe then degrades to the unpruned shape,
    * never to a wrong answer. */
  private[graft] def bySourceProbeSet(rest: Seq[String],
      stats: Map[String, String],
      strippedConds: Seq[org.apache.spark.sql.Column],
      recorded: org.apache.spark.sql.types.StructType,
      colmap: Map[String, String]): Seq[String] = {
    if (strippedConds.isEmpty) return rest
    val keptPerClause = strippedConds.map { sc =>
      try {
        val ranges = graft.sources.GraftStoreSource.expandAcrossMapping(
          colRangesFromCondition(sc, recorded), colmap)
        if (ranges.isEmpty) rest else pruneWithStats(rest, stats, ranges)
      } catch { case scala.util.control.NonFatal(_) => rest }
    }
    val union = keptPerClause.iterator.flatten.toSet
    rest.filter(union) // keep input order
  }

  private[graft] def probeMatching(spark: SparkSession, root: String,
                                   dirs: Seq[String],
                                   predicate: org.apache.spark.sql.Column,
                                   schemaDdl: Option[String] = None,
                                   colmap: Map[String, String] = Map.empty,
                                   stats: Map[String, String] = Map.empty): Set[String] = {
    import org.apache.spark.sql.functions.lit
    if (dirs.isEmpty) return Set.empty
    // The store's recorded schema spares every leg its plan-time footer
    // read — without it, schema inference is a sequential per-dir driver
    // cost and the "one job" still pays a linear planning term (measured
    // in StoreProbe's A/B). Missing columns of pre-evolution dirs read as
    // NULL under an explicit schema, same as the read path.
    val schema = schemaDdl.map(d =>
      org.apache.spark.sql.types.StructType.fromDDL(physicalDdl(d, colmap)))
    // Relation resolution (one FS listing per dir) happens eagerly inside
    // spark.read.parquet and is a per-dir driver cost — build the legs on
    // concurrent driver threads so a thousand-dir probe pays max(listing
    // latency), not sum. SparkSession is thread-safe; each thread gets
    // its own DataFrameReader.
    import scala.concurrent.duration.Duration
    import scala.concurrent.{Await, ExecutionContext, Future}
    implicit val ec: ExecutionContext = ioPool
    val legs = Await.result(Future.traverse(dirs.toList) { d => ioFuture {
      // a DV'd dir probes its LIVE rows only — already-deleted rows
      // must not count as matches (a delete hitting only them is a
      // no-op, not a rewrite)
      toLogical(openDirPhys(spark, root, d, schema, dvFor(stats, d)), colmap)
        .filter(predicate)
        .select(lit(d).as("__graft_dir")).limit(1)
    }}, Duration.Inf)
    // BOUNDED unions, collected concurrently: a single pairwise
    // unionByName reduce over N legs re-analyzes the growing plan each
    // step — O(N²) driver analysis, measured as the 28×-at-10×-dirs
    // super-linearity in StoreDirsProbe (59 s at 1000 dirs). Groups of
    // 64 keep each plan small (analysis O(N·64) total) and the group
    // jobs overlap on the scheduler.
    val groups = legs.grouped(64).toSeq
    Await.result(Future.traverse(groups) { g => ioFuture {
      g.reduce(_ unionByName _).collect().map(_.getString(0))
    }}, Duration.Inf).flatten.toSet
  }

  /** Wrong-prune guard shared by [[deleteWhere]]/[[updateWhere]]: when the
    * caller asked for `verifyPrune`, the probe ran over ALL dirs, and any
    * match in a dir the prune ranges had excluded means the prune
    * assertion was WRONG — the mutation would have silently left matching
    * rows behind. Fails loudly BEFORE any rewrite, naming the dirs. */
  private def requireSoundPrune(op: String, root: String,
                                matched: Set[String],
                                candidates: Seq[String]): Unit = {
    val escaped = matched.diff(candidates.toSet)
    if (escaped.nonEmpty)
      throw new IllegalStateException(
        s"$op on $root: prune ranges exclude dirs that DO contain matching " +
          s"rows (${escaped.toSeq.sorted.mkString(", ")}); the prune " +
          "assertion is wrong — widen or drop the ranges")
  }

  /** Per-dir min/max stats for `cols` over the freshly written `dir`,
    * flat-keyed `<dir>|<col>|{min,max,typ}` (flat so the regex manifest
    * parser stays sound — values escape braces, keys carry no nesting).
    * One aggregate job over the new dir: O(batch), never O(table). */
  private def statsFor(spark: SparkSession, root: String, dir: String,
                       cols: Seq[String], forceRows: Boolean = false,
                       schemaDdl: Option[String] = None,
                       colmap: Map[String, String] = Map.empty): Map[String, String] = {
    if (cols.isEmpty && !forceRows) return Map.empty
    val (plain, bloomCols) = splitStatCols(cols)
    require(plain.forall(c => !c.contains("|")),
      s"stats column names must not contain '|': ${cols.mkString(",")}")
    // A caller that already knows the dir's read schema (the recorded /
    // just-merged DDL) spares this read its schema-inference job — the
    // VALUES still come from the committed bytes. An empty write can
    // leave nothing to read (AQE may emit zero partitions) — that IS
    // the zero-row answer forceRows callers want. Dirs hold PHYSICAL
    // names; stats record under the LOGICAL names of this commit.
    val reader = schemaDdl
      .map(d => org.apache.spark.sql.types.StructType.fromDDL(physicalDdl(d, colmap)))
      .fold(spark.read)(spark.read.schema)
    val df = try toLogical(reader.parquet(s"$root/$dir"), colmap)
      catch { case _: org.apache.spark.sql.AnalysisException =>
        return Map(s"$dir|#|rows" -> "0") }
    val missing = plain.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"statsCols not in the committed schema: ${missing.mkString(",")}")
    import org.apache.spark.sql.functions.{col => c, count, lit, min, max, when}
    val aggs = plain.flatMap(n =>
      Seq(min(c(n)).cast("string").as(s"mn_$n"), max(c(n)).cast("string").as(s"mx_$n"),
        count(when(c(n).isNull, lit(1))).as(s"nl_$n"))) :+
      count(lit(1)).as("n_rows")
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val types = df.schema.map(f => f.name -> f.dataType.typeName).toMap
    val colStats = plain.zipWithIndex.flatMap { case (n, i) =>
      // An all-NULL (or empty) batch yields NULL min/max: record nothing
      // for the column — the dir is then always kept, never mis-pruned.
      // The NULL count is recorded regardless: [[countWhere]]'s
      // fully-contained test needs it (min/max say nothing about NULLs).
      val nulls = Seq(s"$dir|$n|nulls" -> row.getLong(3 * i + 2).toString)
      if (row.isNullAt(3 * i) || row.isNullAt(3 * i + 1)) nulls
      else nulls ++ Seq(
        s"$dir|$n|min" -> row.getString(3 * i),
        s"$dir|$n|max" -> row.getString(3 * i + 1),
        // decimal(p,s).typeName carries precision; key pruning off the
        // family so statLe matches ("decimal(10,2)" -> "decimal").
        s"$dir|$n|typ" -> types(n).takeWhile(_ != '('))
    }.toMap
    // Per-dir ROW COUNT (the Iceberg manifest count — [[countWhere]]'s
    // metadata-only answer) rides the same single aggregate.
    val rows = row.getLong(3 * plain.size)
    colStats ++ bloomStats(df, dir, bloomCols, rows) +
      (s"$dir|#|rows" -> rows.toString) +
      (s"$dir|#|bytes" -> dirBytes(spark, root, dir).toString)
  }

  /** The dir's on-disk byte size, recorded beside its row count so a
    * relation can answer the planner's sizeInBytes (broadcast-decision)
    * question from the MANIFEST — the Delta log's file-size role. One
    * recursive listing of the freshly written dir, at write time only. */
  private def dirBytes(spark: SparkSession, root: String, dir: String): Long =
    try fs(spark, root).getContentSummary(new Path(s"$root/$dir")).getLength
    catch { case _: java.io.IOException => 0L }

  /** [[statsFor]] over MANY dirs in ONE job: per-dir legs (explicit
    * schema — no inference) union with a dir tag and aggregate grouped
    * by it, so a W-dir DML pays one stats job instead of W+1. A dir
    * absent from the result (empty write) simply contributes no keys —
    * callers read its row count as 0 via `get(...).forall`. */
  private def statsForDirs(spark: SparkSession, root: String, dirs: Seq[String],
                           cols: Seq[String],
                           schemaDdl: Option[String],
                           colmap: Map[String, String] = Map.empty): Map[String, String] = {
    if (dirs.isEmpty) return Map.empty
    val (plain, bloomCols) = splitStatCols(cols)
    require(plain.forall(c => !c.contains("|")),
      s"stats column names must not contain '|': ${cols.mkString(",")}")
    import org.apache.spark.sql.functions.{col => c, count, lit, min, max, when}
    val reader = schemaDdl
      .map(d => org.apache.spark.sql.types.StructType.fromDDL(physicalDdl(d, colmap)))
      .fold(spark.read)(spark.read.schema)
    val legPairs = dirs.flatMap { d =>
      (try Some(toLogical(reader.parquet(s"$root/$d"), colmap))
       catch { case _: org.apache.spark.sql.AnalysisException => None })
        .map(df => d -> df)
    }
    if (legPairs.isEmpty) return Map.empty
    val legs = legPairs.map { case (d, df) =>
      df.withColumn("__graft_stats_dir", lit(d)) }
    val missing = plain.filterNot(legPairs.head._2.columns.contains)
    require(missing.isEmpty,
      s"statsCols not in the committed schema: ${missing.mkString(",")}")
    val aggs = plain.flatMap(n =>
      Seq(min(c(n)).cast("string").as(s"mn_$n"), max(c(n)).cast("string").as(s"mx_$n"),
        count(when(c(n).isNull, lit(1))).as(s"nl_$n"))) :+
      count(lit(1)).as("n_rows")
    val rows = legs.reduce(_ unionByName _)
      .groupBy(c("__graft_stats_dir"))
      .agg(aggs.head, aggs.tail: _*).collect()
    val types = legPairs.head._2.schema.map(f => f.name -> f.dataType.typeName).toMap
    val rowsByDir = rows.map(r => r.getString(0) -> r.getLong(1 + 3 * plain.size)).toMap
    // Blooms are one job per (dir, col) — can't fold into the grouped
    // aggregate — so DML-width commits run them concurrently on the
    // bounded IO pool, same shape as the rewrites they ride along with.
    val bloomEntries: Map[String, String] =
      if (bloomCols.isEmpty) Map.empty
      else {
        import scala.concurrent.duration.Duration
        import scala.concurrent.{Await, ExecutionContext, Future}
        implicit val ec: ExecutionContext = ioPool
        Await.result(Future.traverse(legPairs.toList) { case (d, df) =>
          ioFuture { bloomStats(df, d, bloomCols, rowsByDir.getOrElse(d, 64L)) }
        }, Duration.Inf).flatten.toMap
      }
    // Per-dir byte sizes CONCURRENTLY on the IO pool — a sequential
    // getContentSummary per dir would re-introduce the linear driver
    // stall the concurrent rewrites removed at DML width.
    val bytesByDir: Map[String, Long] = {
      import scala.concurrent.duration.Duration
      import scala.concurrent.{Await, ExecutionContext, Future}
      implicit val ec: ExecutionContext = ioPool
      Await.result(Future.traverse(legPairs.map(_._1).toList) { d =>
        ioFuture { d -> dirBytes(spark, root, d) }
      }, Duration.Inf).toMap
    }
    rows.flatMap { row =>
      val dir = row.getString(0)
      val colStats = plain.zipWithIndex.flatMap { case (n, i) =>
        val nulls = Seq(s"$dir|$n|nulls" -> row.getLong(1 + 3 * i + 2).toString)
        if (row.isNullAt(1 + 3 * i) || row.isNullAt(1 + 3 * i + 1)) nulls
        else nulls ++ Seq(
          s"$dir|$n|min" -> row.getString(1 + 3 * i),
          s"$dir|$n|max" -> row.getString(1 + 3 * i + 1),
          s"$dir|$n|typ" -> types(n).takeWhile(_ != '('))
      }
      colStats ++ Seq(
        s"$dir|#|rows" -> row.getLong(1 + 3 * plain.size).toString,
        s"$dir|#|bytes" -> bytesByDir.getOrElse(dir, 0L).toString)
    }.toMap ++ bloomEntries
  }

  /** Σ of the current dirs' recorded byte sizes — Some only when EVERY
    * dir carries the `#|bytes` stat (older stores fall back to a real
    * listing at the caller). The manifest-answered half of the planner's
    * table-size question. */
  private[graft] def statedSizeInBytes(spark: SparkSession, root: String,
                                       version: Long): Option[Long] = {
    val f = fs(spark, root)
    val dirs = dataDirsOf(f, root, version)
    val stats = statsOf(f, root, version)
    val sizes = dirs.map(d => stats.get(s"$d|#|bytes"))
    if (sizes.forall(_.isDefined)) Some(sizes.flatten.map(_.toLong).sum)
    else None
  }

  /** Step 1: write the snapshot to a fresh uniquely-named data dir.
    * Returns the dir name (relative to root). Nothing references it until
    * [[publish]] succeeds. */
  private[graft] def prepare(df: DataFrame, root: String): String = {
    val dir = s"data-${java.util.UUID.randomUUID()}"
    val writer = df.write.mode(SaveMode.ErrorIfExists)
    (if (df.columns.contains("day")) writer.partitionBy("day") else writer)
      .parquet(s"$root/$dir")
    dir
  }

  /** Step 2: the commit point. Create-if-absent of the version's manifest;
    * on conflict the prepared (new) data dir is removed and
    * [[CommitConflict]] thrown. On success the `_current` pointer is
    * re-aimed (atomic rename; best-effort — a crash before it is healed
    * by reader roll-forward). `baseDirs` are the carried-over dirs of an
    * append commit (empty for a full snapshot); `files` lists only the
    * NEW dirs' files — earlier dirs were listed by their own manifests.
    * `extraNewDirs` are ADDITIONAL fresh dirs of a multi-dir commit
    * ([[optimize]] writes one per cluster bucket so each gets its own
    * stats row); they ride before `dataDir` in the manifest's list and
    * share its conflict cleanup. `dataDirIsCarried` marks a commit whose
    * `dataDir` is a LIVE dir of an earlier version ([[deleteWhere]] when
    * every rewritten dir emptied out): it is then excluded from both the
    * files listing (its own manifest listed it) and — critically — the
    * conflict cleanup, which must never delete committed data. */
  /** Stamp the commit wall-clock into the manifest meta (`commitTs`,
    * epoch millis) — the record [[versionAtTimestamp]] resolves
    * `TIMESTAMP AS OF` against. MONOTONIC-GUARDED per store: the stamp
    * is `max(now, base's commitTs + 1)`, so clock skew between writers
    * (or a clock stepped backwards) can never make a later version
    * carry an earlier timestamp — "latest version ≤ t" stays
    * well-defined. The key is per-commit truth, never carried
    * ([[carriedEntries]] excludes it), and any caller-supplied value is
    * overridden — publish time is the single authority. */
  private def stampCommitTs(f: FileSystem, root: String, version: Long,
                            meta: Map[String, String]): Map[String, String] = {
    val baseTs =
      if (version <= 1) 0L
      else metaOf(f, root, version - 1).get("commitTs")
        .flatMap(_.toLongOption).getOrElse(0L)
    meta + ("commitTs" ->
      math.max(System.currentTimeMillis(), baseTs + 1).toString)
  }

  private[graft] def publish(
      spark: SparkSession, root: String, version: Long, dataDir: String,
      baseDirs: Seq[String] = Seq.empty,
      meta: Map[String, String] = Map.empty,
      schemaDdl: Option[String] = None,
      stats: Map[String, String] = Map.empty,
      extraNewDirs: Seq[String] = Seq.empty,
      dataDirIsCarried: Boolean = false): Unit = {
    val f = fs(spark, root)
    val stamped = stampCommitTs(f, root, version, meta)
    val manifest = manifestPath(root, version)
    f.mkdirs(manifest.getParent)
    // Version 1 means EMPTY STORE. Publishing it while any manifest
    // exists is a stale-base symptom (a degraded pointer read answering
    // 0 on an expired-history store) — and the retired slot would look
    // FREE to the create arbitration, so the commit would "succeed" and
    // the next expire would reap it. Loud failure instead; first-commit-
    // only listing cost.
    if (version == 1) {
      val existing = committedVersions(f, root)
      require(existing.isEmpty,
        s"cannot commit version 1 of $root: versions " +
          s"${existing.head}..${existing.last} exist — stale base " +
          "(degraded pointer read on an expired-history store?)")
    }
    val newDirs = if (dataDirIsCarried) extraNewDirs else extraNewDirs :+ dataDir
    // Audit field: every entry is `<dir>/`-prefixed relative to root,
    // uniformly across single- and multi-dir commits (manifests written
    // before this carried bare filenames for single-dir commits — tooling
    // parsing `files` must accept both legacy forms).
    val files = newDirs.flatMap { nd =>
      f.listStatus(new Path(s"$root/$nd")).toSeq
        .filter(_.isFile).map(s => s"$nd/${s.getPath.getName}").sorted ++
        f.globStatus(new Path(s"$root/$nd/day=*/*")).toSeq
          .filter(_.isFile)
          .map(s => s"$nd/${s.getPath.getParent.getName}/${s.getPath.getName}")
          .sorted
    }
    def js(s: String): String = jsString(s)
    val dirs = baseDirs ++ extraNewDirs :+ dataDir
    // schema + stats ride the same escaped-string discipline as meta
    // (flat stats keys — no nested braces, so each object is still
    // bounded by [^}]* for the regex parser).
    val schemaField = schemaDdl.map(d => s""" "schema": ${js(d)},\n""").getOrElse("")
    val body =
      s"""{"version": $version, "dataDir": "$dataDir",
         | "dataDirs": [${dirs.map(js).mkString(", ")}],
         | "meta": {${stamped.toSeq.sortBy(_._1).map { case (k, v) => s"${js(k)}: ${js(v)}" }.mkString(", ")}},
         |$schemaField "stats": {${stats.toSeq.sortBy(_._1).map { case (k, v) => s"${js(k)}: ${js(v)}" }.mkString(", ")}},
         | "files": [${files.map(n => "\"" + n + "\"").mkString(", ")}]}""".stripMargin
    if (!createExclusive(f, manifest, body.getBytes(StandardCharsets.UTF_8))) {
      newDirs.foreach(d => f.delete(new Path(s"$root/$d"), true))
      throw new CommitConflict(version, root)
    }
    aimPointer(spark, root, version)
  }

  /** The DELTA commit record — the log-segment sibling of [[publish]]:
    * instead of re-listing the base version's every dir and stat (an
    * O(table-dirs) manifest write per commit — cumulative O(N²) ingest,
    * the one named scale ceiling of the monolithic format), the manifest
    * carries only this commit's EDIT: `base` (always version−1 — the CAS
    * arbitration is unchanged, the create-if-absent at base+1 still
    * loses to any interleaved commit), `add` dirs (with their stats and
    * files audit), and `removed` dirs. Readers derive the full state via
    * [[resolvedState]]: nearest checkpoint/full anchor + the delta tail.
    * `meta` and `schema` stay FULL per manifest (both are small and both
    * are read per-version far more often than the dir list).
    * `anchorIsCarried` marks a commit with no new dirs (a delete that
    * emptied every touched dir) whose `dataDir` anchor is a live earlier
    * dir — excluded from files listing and conflict cleanup, like
    * [[publish]]'s dataDirIsCarried. After the commit, [[maybeCheckpoint]]
    * materializes a checkpoint when the delta tail is long enough. */
  private def publishDelta(
      spark: SparkSession, root: String, version: Long,
      addDirs: Seq[String], removedDirs: Seq[String],
      meta: Map[String, String],
      schemaDdl: Option[String],
      statsForAdded: Map[String, String],
      anchor: String, anchorIsCarried: Boolean = false,
      cleanupOnConflict: Boolean = true): Unit = {
    require(version >= 2, s"a delta commit needs a base version, got $version")
    val f = fs(spark, root)
    // A delta whose base manifest is GONE would commit into a retired
    // version slot (stale pinned base after an expire) — readers could
    // never resolve its chain, and the next expire would reap it. One
    // exists() per commit buys the loud failure.
    require(f.exists(manifestPath(root, version - 1)),
      s"cannot commit version $version of $root: base manifest " +
        s"${version - 1} does not exist (expired, or a stale pinned base)")
    val stamped = stampCommitTs(f, root, version, meta)
    val manifest = manifestPath(root, version)
    f.mkdirs(manifest.getParent)
    val files = addDirs.flatMap { nd =>
      f.listStatus(new Path(s"$root/$nd")).toSeq
        .filter(_.isFile).map(s => s"$nd/${s.getPath.getName}").sorted ++
        f.globStatus(new Path(s"$root/$nd/day=*/*")).toSeq
          .filter(_.isFile)
          .map(s => s"$nd/${s.getPath.getParent.getName}/${s.getPath.getName}")
          .sorted
    }
    val schemaField =
      schemaDdl.map(d => s""" "schema": ${jsString(d)},\n""").getOrElse("")
    val body =
      s"""{"version": $version, "base": ${version - 1}, "dataDir": ${jsString(anchor)},
         | "add": [${addDirs.map(jsString).mkString(", ")}],
         | "removed": [${removedDirs.map(jsString).mkString(", ")}],
         | "meta": {${stamped.toSeq.sortBy(_._1).map { case (k, v) =>
             s"${jsString(k)}: ${jsString(v)}" }.mkString(", ")}},
         |$schemaField "stats": {${statsForAdded.toSeq.sortBy(_._1).map { case (k, v) =>
             s"${jsString(k)}: ${jsString(v)}" }.mkString(", ")}},
         | "files": [${files.map(n => "\"" + n + "\"").mkString(", ")}]}""".stripMargin
    if (!createExclusive(f, manifest, body.getBytes(StandardCharsets.UTF_8))) {
      // only the FRESH dirs are ours to clean; a carried anchor is
      // committed data and never appears in addDirs. `cleanupOnConflict
      // = false` is [[commitAppendAt]]'s fast-retry seam: the prepared
      // dir survives the lost race so the NEXT attempt re-publishes the
      // same bytes instead of re-preparing them.
      if (cleanupOnConflict)
        addDirs.foreach(d => f.delete(new Path(s"$root/$d"), true))
      throw new CommitConflict(version, root)
    }
    aimPointer(spark, root, version)
    // BEST-EFFORT: the manifest create above IS the commit point; a
    // transient FS error in the derived, idempotent checkpoint must not
    // surface an already-committed append as a failure (a streaming
    // caller that only retries on CommitConflict would fail its query
    // for a batch that actually landed). Skipping costs nothing — the
    // next qualifying commit writes the checkpoint.
    try maybeCheckpoint(spark, root, version)
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(
        s"[VersionedStore] checkpoint at $root v$version skipped: ${e.getMessage}")
    }
  }

  /** The commit metadata of the CURRENT version (empty map when the store
    * is empty or the version carries none) — how a transactional sink
    * reads back its last transaction record. */
  def currentMeta(spark: SparkSession, root: String): Map[String, String] = {
    val v = currentVersion(spark, root)
    if (v == 0) Map.empty else metaOf(fs(spark, root), root, v)
  }

  /** The commit metadata AS OF a specific version (empty for version 0 —
    * the empty store). Paired with [[commitAppendAt]]/[[commitAt]] this is
    * the read half of a ledger read-modify-write: read (version, meta)
    * together, merge, publish at version+1, retry on [[CommitConflict]]. */
  def metaAt(spark: SparkSession, root: String, version: Long): Map[String, String] =
    if (version == 0) Map.empty else metaOf(fs(spark, root), root, version)

  /** One manifest, parsed ONCE per JVM: manifests are IMMUTABLE after
    * their create-if-absent commit, so the parse is cacheable — and at
    * table width the repeated parse was the dominant commit-path cost
    * (StoreDirsProbe: a 1000-dir manifest is ~378 KB and one commit
    * re-parsed it ~6 times across metaOf/statsOf/schemaOf/dataDirsOf —
    * roughly half the 0.55 s/append). The cache key carries the
    * manifest's (modTime, length) so a same-path store rebuilt from
    * scratch can't serve stale fields even without the explicit
    * [[invalidateCachedManifests]] hook [[ArtifactStore.publish]] fires. */
  /** Fields parse LAZILY, each on first use: the stats object is by far
    * the most expensive regex (6 entries per dir per column — thousands
    * at table width) and most accessors never need it — an eager parse
    * made [[expire]] at 1000 versions pay the stats sweep for every
    * dropped manifest (measured 49.6 s; lazy + one history pass → see
    * PERF round 11). */
  private final class ParsedManifest(body: String, root: String, v: Long) {
    lazy val dataDir: String =
      """"dataDir":\s*"([^"]+)"""".r.findFirstMatchIn(body)
        .getOrElse(throw new IllegalStateException(
          s"manifest $v of $root has no dataDir")).group(1)
    private def dirArray(field: String): Seq[String] = {
      val tag = "\"" + field + "\":"
      val at = body.indexOf(tag)
      if (at < 0) return Seq.empty
      val open = body.indexOf('[', at + tag.length)
      if (open < 0 ||
          !body.substring(at + tag.length, open).forall(_.isWhitespace))
        return Seq.empty
      val close = body.indexOf(']', open)
      if (close < 0) Seq.empty
      else scanQuoted(body, open + 1, close).toSeq
    }
    lazy val dataDirs: Seq[String] = dirArray("dataDirs")
    /** Multi-part checkpoint MAIN record only: the number of sidecar
      * part files carrying the state (absent = legacy single-file). */
    lazy val parts: Option[Int] =
      """"parts":\s*(\d+)""".r.findFirstMatchIn(body).map(_.group(1).toInt)
    /** LOG-SEGMENT fields (delta manifests only — see [[publishDelta]]):
      * `base` names the version this commit's state derives from (always
      * version−1), `addDirs`/`removedDirs` the dir-level edit. A manifest
      * without `base` is FULL — its dataDirs/stats ARE the state (every
      * pre-segment manifest, plus full-snapshot commits and restores). */
    lazy val base: Option[Long] =
      """"base":\s*(\d+)""".r.findFirstMatchIn(body).map(_.group(1).toLong)
    lazy val addDirs: Seq[String] = dirArray("add")
    lazy val removedDirs: Seq[String] = dirArray("removed")
    lazy val meta: Map[String, String] = flatObjectOf(body, "meta")
    lazy val stats: Map[String, String] = flatObjectOf(body, "stats")
    /** Cheap containment probe: does this record reference any deletion
      * vector? Spares [[vacuum]]'s sidecar sweep the full stats parse
      * (and the per-dir listings) on the DV-free steady state. */
    lazy val hasDvRef: Boolean = body.contains("|#|dv")
    lazy val schema: Option[String] =
      """"schema":\s*"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(body)
        .map(m => unescape(m.group(1)))
  }

  // Cap sized for the lazy form (entries retain the manifest BODY until
  // evicted): 64 × a wide table's ~400 KB manifest ≈ 25 MB bound.
  private val manifestCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Long, Long), ParsedManifest]()
  private val ManifestCacheCap = 64

  /** Drop every cached manifest of stores under `root` — called by
    * [[ArtifactStore.publish]] after swapping a rebuilt artifact into a
    * reused path (same versions, different content). */
  private[sinks] def invalidateCachedManifests(root: String): Unit = {
    val it = manifestCache.keySet().iterator()
    while (it.hasNext) if (it.next()._1.startsWith(root)) it.remove()
    val it2 = resolvedCache.keySet().iterator()
    while (it2.hasNext) if (it2.next()._1.startsWith(root)) it2.remove()
  }

  // ───────────────────────── log segments ─────────────────────────
  // The RESOLVED STATE of a version — its full data-dir list and flat
  // stats map. Full manifests carry it verbatim; delta manifests derive
  // it from their base's state plus their add/remove edit (the
  // Delta-Lake log shape: JSON commit records + periodic checkpoints).

  private final case class StoreState(dirs: Seq[String], stats: Map[String, String])

  /** Resolved states, keyed like the manifest cache on the version's
    * manifest identity (modTime, length) so a rebuilt same-path store
    * can't serve a stale chain. States at table width are large (the
    * stats map is O(dirs × cols)), so the cap is small — resolution of
    * version v+1 finds v's cached state and folds ONE delta, which is
    * the hot path (monotone readers following a growing store). */
  private val resolvedCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Long, Long), StoreState]()
  private val ResolvedCacheCap = 8

  private def stateCacheKey(f: FileSystem, root: String, v: Long): (String, Long, Long, Long) = {
    val st = f.getFileStatus(manifestPath(root, v))
    (s"$root#$v", v, st.getModificationTime, st.getLen)
  }

  private def checkpointPath(root: String, v: Long) =
    new Path(s"$root/_manifests/$v.checkpoint")

  /** One delta step: base state + (remove, add) edit. Removed dirs drop
    * their stats rows; added dirs bring their own (recorded in the delta
    * manifest at commit time). */
  private def applyDelta(base: StoreState, pm: ParsedManifest): StoreState = {
    val removed = pm.removedDirs.toSet
    val dirs =
      (if (removed.isEmpty) base.dirs else base.dirs.filterNot(removed)) ++ pm.addDirs
    val stats =
      (if (removed.isEmpty) base.stats
       else base.stats.filter { case (k, _) => !removed.contains(k.takeWhile(_ != '|')) }) ++
        pm.stats
    StoreState(dirs, stats)
  }

  private def fullState(pm: ParsedManifest): StoreState =
    StoreState(fullDirs(pm), pm.stats)

  /** A full manifest's (or checkpoint's) dir list WITHOUT forcing the
    * lazy stats parse — the stats object is by far the largest regex in
    * a wide record (6 entries × dirs × cols), and the expire/vacuum
    * sweeps only need dirs. */
  private def fullDirs(pm: ParsedManifest): Seq[String] =
    if (pm.dataDirs.nonEmpty) pm.dataDirs else Seq(pm.dataDir)

  /** The state of version `v`: walk back through delta manifests until a
    * cached state, a checkpoint file, or a full manifest anchors the
    * chain, then fold the collected deltas forward. Iterative (no
    * recursion — chains reach 10⁴ versions), cost O(tail) small parses +
    * one O(dirs) anchor parse; with a warm cache the monotone-reader
    * path is one delta fold. */
  private def resolvedState(f: FileSystem, root: String, v: Long): StoreState = {
    var chain = List.empty[ParsedManifest] // ascending once collected via prepend
    var cur = v
    var anchor: StoreState = null
    while (anchor == null) {
      val key = stateCacheKey(f, root, cur)
      val hit = resolvedCache.get(key)
      if (hit != null) anchor = hit
      else {
        val pm = parsedManifest(f, root, cur)
        pm.base match {
          case None => anchor = fullState(pm)
          case Some(b) =>
            if (f.exists(checkpointPath(root, cur)))
              anchor = checkpointState(f, root, cur)
            else { chain ::= pm; cur = b }
        }
      }
    }
    val out = chain.foldLeft(anchor)(applyDelta)
    if (resolvedCache.size() >= ResolvedCacheCap) resolvedCache.clear()
    resolvedCache.put(stateCacheKey(f, root, v), out)
    out
  }

  private def parsedCheckpoint(f: FileSystem, root: String, v: Long): ParsedManifest = {
    val p = checkpointPath(root, v)
    val in = f.open(p)
    val body = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
               finally in.close()
    new ParsedManifest(body, root, v)
  }

  private def checkpointPartPath(root: String, v: Long, i: Int) =
    new Path(s"$root/_manifests/$v.checkpoint.part-$i")

  /** The checkpoint's state record(s): the legacy single file as one
    * record, or a multi-part checkpoint's K sidecars — read AND parsed
    * CONCURRENTLY on the IO pool (the fresh-reader cold-plan cost at
    * width is this parse; parts divide it across cores). Part order is
    * preserved: dirs concatenate in part index order, so the resolved
    * dir sequence is byte-identical to the single-file form. */
  private def checkpointParts(f: FileSystem, root: String, v: Long): Seq[ParsedManifest] = {
    val main = parsedCheckpoint(f, root, v)
    main.parts match {
      case None => Seq(main)
      case Some(k) =>
        import scala.concurrent.duration.Duration
        import scala.concurrent.{Await, ExecutionContext, Future}
        implicit val ec: ExecutionContext = ioPool
        Await.result(Future.traverse((0 until k).toList) { i => ioFuture {
          val in = f.open(checkpointPartPath(root, v, i))
          val body = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
                     finally in.close()
          val pm = new ParsedManifest(body, root, v)
          // force the heavy lazy parses HERE, on the pool — left lazy
          // they would all run sequentially on the calling thread and
          // the parts would parallelize only the byte reads
          pm.dataDirs; pm.stats
          pm
        }}, Duration.Inf)
    }
  }

  /** Dir list of a checkpoint without forcing any stats parse. */
  private def checkpointDirs(f: FileSystem, root: String, v: Long): Seq[String] =
    checkpointParts(f, root, v).flatMap(fullDirs)

  /** Full resolved state of a checkpoint (dirs + merged stats). */
  private def checkpointState(f: FileSystem, root: String, v: Long): StoreState = {
    val ps = checkpointParts(f, root, v)
    StoreState(ps.flatMap(fullDirs), ps.map(_.stats).fold(Map.empty)(_ ++ _))
  }

  /** Checkpoint cadence: a checkpoint lands when the delta tail since the
    * last anchor reaches max(MinCheckpointTail, dirs/CheckpointDirsPerTail)
    * — the ADAPTIVE interval that keeps the amortized checkpoint bytes
    * per commit CONSTANT at any table width (a 10⁴-dir table checkpoints
    * every ~156 commits: ~4 MB / 156 ≈ the same ~26 KB/commit a 10³-dir
    * table pays), while a reader's uncached resolution stays O(dirs) —
    * proportional to the state it must materialize anyway. */
  private val MinCheckpointTail = 16
  private val CheckpointDirsPerTail = 64

  /** After a delta commit at `v`: if the tail of deltas since the nearest
    * anchor (full manifest or checkpoint) is long enough, materialize
    * `v`'s resolved state as `<v>.checkpoint`. Idempotent and derived —
    * a crash after the manifest but before the checkpoint costs nothing
    * (the next qualifying commit writes one); losers never get here
    * (only `v`'s winning writer runs this, so no same-version race).
    * Written tmp-then-rename so a concurrent reader never sees a torn
    * file; [[expire]] also calls this for the oldest survivor before
    * cutting its chain. */
  private def maybeCheckpoint(spark: SparkSession, root: String, v: Long): Unit = {
    val f = fs(spark, root)
    var cur = v
    var tail = 0
    var anchored = false
    while (!anchored) {
      val pm = parsedManifest(f, root, cur)
      pm.base match {
        case None => anchored = true
        case Some(b) =>
          if (f.exists(checkpointPath(root, cur))) anchored = true
          else { tail += 1; cur = b }
      }
    }
    if (tail < MinCheckpointTail) return
    val st = resolvedState(f, root, v)
    val interval = math.max(MinCheckpointTail, st.dirs.size / CheckpointDirsPerTail)
    if (tail >= interval) writeCheckpoint(spark, root, v, st)
  }

  /** Dirs per checkpoint part file. At this size a part parses in tens
    * of ms, a 10⁵-dir state splits across ~4 cores, and the ~10⁶-dir
    * table that would have produced a ~240 MB single checkpoint writes
    * ~31 parts read in parallel instead (the Delta v2-checkpoint sidecar
    * shape). Var ONLY so the spec can force the multi-part path on a
    * small store; production code never writes it. */
  private[graft] var CheckpointPartDirs = 32768

  private def writeCheckpoint(spark: SparkSession, root: String, v: Long,
                              st: StoreState): Unit = {
    val f = fs(spark, root)
    val fc = FileContext.getFileContext(
      new Path(root).toUri, spark.sessionState.newHadoopConf())
    def put(body: String, dest: Path): Unit = {
      val tmp = new Path(s"$root/_manifests/$v.checkpoint.tmp-${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, true)
      try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
      fc.rename(tmp, dest, Options.Rename.OVERWRITE)
    }
    def statsBody(stats: Map[String, String]): String =
      stats.toSeq.sortBy(_._1).map { case (k, x) =>
        s"${jsString(k)}: ${jsString(x)}" }.mkString(", ")
    if (st.dirs.size <= CheckpointPartDirs) {
      put(s"""{"version": $v, "dataDir": ${jsString(st.dirs.last)},
             | "dataDirs": [${st.dirs.map(jsString).mkString(", ")}],
             | "stats": {${statsBody(st.stats)}}}""".stripMargin,
        checkpointPath(root, v))
    } else {
      // MULTI-PART (the Delta v2-checkpoint sidecar shape): dir slices +
      // their stats land in K part files written CONCURRENTLY; the tiny
      // main record commits the checkpoint LAST, so a crash mid-write
      // leaves orphan parts no reader ever consults (the next attempt
      // overwrites them; expire reaps them with the checkpoint).
      val slices = st.dirs.grouped(CheckpointPartDirs).toSeq
      val statsByDir = st.stats.groupBy { case (k, _) => k.takeWhile(_ != '|') }
      import scala.concurrent.duration.Duration
      import scala.concurrent.{Await, ExecutionContext, Future}
      implicit val ec: ExecutionContext = ioPool
      Await.result(Future.traverse(slices.zipWithIndex.toList) { case (sl, i) =>
        ioFuture {
          val stats = sl.flatMap(d => statsByDir.getOrElse(d, Map.empty)).toMap
          put(s"""{"dataDirs": [${sl.map(jsString).mkString(", ")}],
                 | "stats": {${statsBody(stats)}}}""".stripMargin,
            checkpointPartPath(root, v, i))
        }
      }, Duration.Inf)
      put(s"""{"version": $v, "dataDir": ${jsString(st.dirs.last)},
             | "parts": ${slices.size}}""".stripMargin,
        checkpointPath(root, v))
    }
  }

  private def parsedManifest(f: FileSystem, root: String, v: Long): ParsedManifest = {
    val st = f.getFileStatus(manifestPath(root, v))
    val key = (s"$root#$v", v, st.getModificationTime, st.getLen)
    val hit = manifestCache.get(key)
    if (hit != null) return hit
    val pm = new ParsedManifest(manifestBody(f, root, v), root, v)
    if (manifestCache.size() >= ManifestCacheCap) manifestCache.clear()
    manifestCache.put(key, pm)
    pm
  }

  private def metaOf(f: FileSystem, root: String, v: Long): Map[String, String] =
    parsedManifest(f, root, v).meta

  /** The flat stats map of a version's RESOLVED state (empty for
    * pre-stats manifests) — keys `<dir>|<col>|{min,max,typ}`, see
    * [[commit]]. Full manifests carry it verbatim; delta manifests
    * resolve through the log segments. */
  private def statsOf(f: FileSystem, root: String, v: Long): Map[String, String] = {
    val pm = parsedManifest(f, root, v)
    if (pm.base.isEmpty) pm.stats else resolvedState(f, root, v).stats
  }

  /** Spec/probe hook: the resolved flat stats map of a version. */
  private[graft] def statsAt(spark: SparkSession, root: String,
                             version: Long): Map[String, String] =
    statsOf(fs(spark, root), root, version)

  /** The recorded table schema (DDL) of a version, when the manifest
    * carries one — absent for stores written before schema recording. */
  private[graft] def schemaOf(f: FileSystem, root: String, v: Long): Option[String] =
    parsedManifest(f, root, v).schema

  /** The recorded schema DDL of `version` (None when the manifest
    * predates schema recording) — the public read of the commit-time
    * schema policy's state. */
  def schemaAt(spark: SparkSession, root: String, version: Long): Option[String] =
    schemaOf(fs(spark, root), root, version)

  private val UnescapePat = """\\(u[0-9a-fA-F]{4}|.)""".r

  /** All quoted strings of `s` within [from, until), by hand scan — the
    * per-ENTRY parser for manifest/checkpoint fields. A 10⁵-dir
    * checkpoint holds ~5×10⁵ stats entries; a regex engine invocation
    * per entry put the cold fresh-reader plan at seconds (the
    * WidthProbe's 10⁵ leg), where this single in-place pass runs the
    * same 20 MB in tens of milliseconds. jsString escapes quotes and
    * braces, so a bare '"' always delimits. */
  private def scanQuoted(s: String, from: Int, until: Int): Iterator[String] =
    new Iterator[String] {
      private var i = s.indexOf('"', from)
      def hasNext: Boolean = i >= 0 && i < until
      def next(): String = {
        var j = i + 1
        while (j < until && s.charAt(j) != '"') {
          if (s.charAt(j) == '\\') j += 2 else j += 1
        }
        val out = unescape(s.substring(i + 1, math.min(j, until)))
        i = s.indexOf('"', j + 1)
        out
      }
    }

  /** Locate `"<field>": {...}` in `body` as [contentStart, contentEnd) —
    * indexOf-based (the writers emit exactly this shape; values escape
    * every brace, so the first '}' closes the object). */
  private def flatObjectBounds(body: String, field: String): Option[(Int, Int)] = {
    val tag = "\"" + field + "\":"
    val at = body.indexOf(tag)
    if (at < 0) return None
    val open = body.indexOf('{', at + tag.length)
    if (open < 0) return None
    // only whitespace may sit between the colon and the brace — anything
    // else means the field's value isn't an object (defensive)
    if (!body.substring(at + tag.length, open).forall(_.isWhitespace)) return None
    val close = body.indexOf('}', open)
    if (close < 0) None else Some((open + 1, close))
  }

  private def flatObjectOf(body: String, field: String): Map[String, String] =
    flatObjectBounds(body, field) match {
      case None => Map.empty[String, String]
      case Some((from, until)) =>
        // entries are `"k": "v"` pairs — the quoted strings alternate
        // key, value (jsString guarantees no unescaped quote or brace
        // inside either), so pairing the scan IS the parse
        val it = scanQuoted(body, from, until)
        val b = Map.newBuilder[String, String]
        while (it.hasNext) {
          val k = it.next()
          if (it.hasNext) b += (k -> it.next())
        }
        b.result()
    }

  /** JSON string literal with braces escaped too (legal JSON \u escapes)
    * so the regex-based manifest parser can bound flat objects with
    * [^}]* — a literal '}' inside a value would otherwise truncate the
    * parse and silently drop metadata (including the exactly-once
    * batchId ledger). */
  private def jsString(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case '{' => "\\u007b"; case '}' => "\\u007d"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def unescape(s: String): String =
    // fast path: virtually every key/value has no escapes — one indexOf
    // beats a regex engine invocation a million times over at width
    if (s.indexOf('\\') < 0) s
    else UnescapePat.replaceAllIn(s, m => {
      val g = m.group(1)
      java.util.regex.Matcher.quoteReplacement(
        if (g.startsWith("u")) Integer.parseInt(g.drop(1), 16).toChar.toString else g)
    })

  /** Atomic pointer swap: write a UNIQUELY-named tmp, rename OVERWRITE
    * onto `_current`. The tmp name carries a UUID — concurrent writers
    * sharing one tmp path would clobber each other's bytes and checksum
    * sidecars mid-aim (caught by the multi-process ContentionProbe).
    * Monotone: never aims backwards (a slow writer finishing version N
    * after N+1 committed must not regress the cache). */
  private def aimPointer(spark: SparkSession, root: String, version: Long): Unit = {
    // BEST-EFFORT, never throws: the caller's manifest create IS the
    // commit point, and the pointer is only a read cache — surfacing a
    // pointer-swap hiccup would report an already-committed append as a
    // failure. The hiccup is real, not theoretical: on a local
    // ChecksumFs two processes aiming concurrently can collide on the
    // `.crc` sidecar rename ("destination ._current.crc already
    // exists") even though each data rename is OVERWRITE — caught by
    // the ContentionProbe once fast CAS retries tightened the commit
    // cadence. On any failure the stale/torn pointer heals through
    // [[readPointer]]'s degrade + [[currentVersion]]'s manifest
    // roll-forward.
    try {
      val f = fs(spark, root)
      if (readPointer(f, root).getOrElse(0L) >= version) return
      val tmp = new Path(s"$root/_current.tmp-${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, true)
      try out.write(version.toString.getBytes(StandardCharsets.UTF_8)) finally out.close()
      try {
        val fc = FileContext.getFileContext(tmp.toUri, spark.sessionState.newHadoopConf())
        fc.rename(tmp, pointerPath(root), Options.Rename.OVERWRITE)
      } catch { case scala.util.control.NonFatal(e) =>
        try f.delete(tmp, false) catch { case _: Throwable => () }
        throw e
      }
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(
        s"[VersionedStore] pointer aim at $root v$version skipped: ${e.getMessage}")
    }
  }

  /** Pointer read, tolerant of the cross-process aim window: on a local
    * ChecksumFileSystem the data file and its .crc sidecar rename as TWO
    * steps, so a read racing a concurrent aim can see new bytes under
    * the old checksum (ChecksumException) or a torn value. The pointer
    * is a CACHE of "max committed version" — never the truth — so after
    * one short retry the read degrades to None and [[currentVersion]]
    * rolls forward from the manifests, which is always correct. */
  private def readPointer(f: FileSystem, root: String): Option[Long] = {
    def attempt(): Option[Long] = {
      val p = pointerPath(root)
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8).trim.toLong)
        finally in.close()
      }
    }
    try attempt()
    catch {
      case _: java.io.IOException | _: NumberFormatException =>
        Thread.sleep(10)
        try attempt()
        catch { case _: java.io.IOException | _: NumberFormatException => None }
    }
  }

  private def manifestBody(f: FileSystem, root: String, v: Long): String = {
    val in = f.open(manifestPath(root, v))
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  /** Resolve a committed version's NEWEST data dir (the one its commit
    * added) through its manifest. */
  private def dataDirOf(f: FileSystem, root: String, v: Long): String =
    parsedManifest(f, root, v).dataDir

  /** ALL data dirs a version references, in commit order. Full manifests
    * carry the list verbatim (pre-append manifests only the single
    * `dataDir`); delta manifests resolve through the log segments. */
  private def dataDirsOf(f: FileSystem, root: String, v: Long): Seq[String] = {
    val pm = parsedManifest(f, root, v)
    if (pm.base.isEmpty) fullState(pm).dirs else resolvedState(f, root, v).dirs
  }

  /** The dirs a version's OWN commit introduced — a full manifest's list,
    * a delta's add list. Never a chain resolution: this is [[expire]]'s
    * candidate sweep (every dir enters the store through exactly one
    * manifest, so the union over dropped manifests' own-dirs is exactly
    * the dirs that can have become garbage) and stays O(dropped edits).
    * A restore's carried full list over-approximates harmlessly (its
    * dirs are also owned by their true adders; the survivors' reference
    * sweep keeps anything still live). */
  private def ownDirsOf(f: FileSystem, root: String, v: Long): Seq[String] = {
    val pm = parsedManifest(f, root, v)
    if (pm.base.isEmpty) fullDirs(pm) else pm.addDirs
  }

  /** Garbage-collect data dirs no manifest references and stale tmp
    * pointers. Committed data dirs are immutable and always referenced,
    * so this can never delete committed data — but an IN-FLIGHT `prepare`
    * of a live writer is unreferenced by design, so run vacuum only when
    * no commit is in progress (the usual table-maintenance window). */
  def vacuum(spark: SparkSession, root: String, minAgeMs: Long = 0L): Unit = {
    val f = fs(spark, root)
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) return
    // `minAgeMs`: a concurrent writer's IN-FLIGHT prepare dir is
    // unreferenced by design until its manifest lands — a vacuum racing
    // that window would delete data a moment before it's committed. The
    // age floor (Delta's retention-check shape) makes vacuum safe to run
    // alongside writers: pass a bound comfortably above the longest
    // prepare-to-publish gap. The default 0 keeps the original
    // maintenance-window semantics (reap everything now).
    val cutoff = System.currentTimeMillis() - minAgeMs
    // Referenced = the union of EVERY live version's resolved dirs,
    // computed as one ascending fold (deltas chain base = version−1, so
    // each step is O(edit); full manifests reset the state; the first
    // version anchors via its checkpoint when expire cut its chain) —
    // never a per-version chain resolution.
    val versions = committedVersions(f, root)
    val (referenced: Set[String], dvSweepNeeded: Boolean) = {
      var refs = Set.empty[String]
      var anyDv = false
      var first = true
      versions.foreach { v =>
        val pm = parsedManifest(f, root, v)
        // Union over every live version's state, in O(dirs + total edits):
        // a referenced dir is either in the FIRST live version's resolved
        // state or was ADDED by a later live manifest (a removal never
        // shrinks the union — the versions before it still reference the
        // dir); full manifests contribute their own list directly.
        if (pm.base.isEmpty) refs ++= fullDirs(pm)
        else if (first) {
          val st = resolvedState(f, root, v)
          refs ++= st.dirs
          // a DV ref introduced in EXPIRED history survives only through
          // the first live version's (checkpoint-anchored) state — the
          // live manifest bodies never mention it
          anyDv ||= st.stats.keys.exists(_.endsWith("|#|dv"))
        }
        else refs ++= pm.addDirs
        anyDv ||= pm.hasDvRef
        first = false
      }
      (refs, anyDv)
    }
    f.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("data-"))
      .filterNot(s => referenced.contains(s.getPath.getName))
      .filter(s => minAgeMs == 0L || s.getModificationTime < cutoff)
      .foreach(s => f.delete(s.getPath, true))
    Seq(s"$root/_current.tmp*", s"$root/_manifests/*.checkpoint.tmp-*",
        s"$root/_manifests/*.json.tmp-*") // crashed createExclusive debris
      .foreach { pat =>
        f.globStatus(new Path(pat)) match {
          case null => ()
          case ts => ts.foreach(s => f.delete(s.getPath, false))
        }
      }
    // ORPHAN checkpoint sidecars: a crash mid multi-part write leaves
    // part files whose MAIN record never landed (no reader consults
    // them); an expired checkpoint's parts are swept by expire itself,
    // but any non-contiguous survivor ends up here. A part is live iff
    // its version's main checkpoint file exists.
    f.globStatus(new Path(s"$root/_manifests/*.checkpoint.part-*")) match {
      case null => ()
      case ts => ts.foreach { s =>
        val v = s.getPath.getName.takeWhile(_ != '.')
        val live = v.nonEmpty && v.forall(_.isDigit) &&
          f.exists(checkpointPath(root, v.toLong))
        if (!live &&
            (minAgeMs == 0L || s.getModificationTime < cutoff))
          f.delete(s.getPath, false)
      }
    }
    // STALE DV SIDECARS inside LIVE dirs: a superseded deletion vector
    // (its dir re-DV'd, its references expired, or a restore moved past
    // it) is the one artifact the dir-granular sweep above can't reach —
    // the dir itself is still referenced. Live refs = the union over
    // every live version of its (dir, sidecar) references, computed like
    // the dir union (first live RESOLVED state + each later manifest's
    // own stats; over-approximate — an overridden ref merely keeps a
    // tiny file one cycle longer). Gated on any DV evidence at all, so
    // the DV-free steady state pays neither the stats parses nor the
    // per-dir listings; same age floor as the data sweep (an in-flight
    // deleteWhereDv's sidecar lands before its manifest).
    if (dvSweepNeeded) {
      val dvRefs: Set[(String, String)] = {
        var refs = Set.empty[(String, String)]
        var first = true
        versions.foreach { v =>
          val pm = parsedManifest(f, root, v)
          val st: Map[String, String] =
            if (first && pm.base.isDefined) resolvedState(f, root, v).stats
            else pm.stats
          refs ++= st.collect { case (k, n) if k.endsWith("|#|dv") =>
            (k.stripSuffix("|#|dv"), n) }
          first = false
        }
        refs
      }
      import scala.concurrent.duration.Duration
      import scala.concurrent.{Await, ExecutionContext, Future}
      implicit val ec: ExecutionContext = ioPool
      Await.result(Future.traverse(referenced.toList) { d => ioFuture {
        val p = new Path(s"$root/$d")
        if (f.exists(p)) f.listStatus(p).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("_dv-"))
          .filterNot(s => dvRefs.contains((d, s.getPath.getName)))
          .filter(s => minAgeMs == 0L || s.getModificationTime < cutoff)
          .foreach(s => f.delete(s.getPath, true))
      }}, Duration.Inf)
      ()
    }
  }
}
