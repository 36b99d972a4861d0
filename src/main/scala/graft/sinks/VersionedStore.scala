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
  *   data-<uuid>/            immutable data directories, one per version
  *   _manifests/<N>.json     manifest of version N — THE commit record
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

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestPath(root: String, v: Long) = new Path(s"$root/_manifests/$v.json")
  private def pointerPath(root: String) = new Path(s"$root/_current")

  /** Latest committed version: the pointer, rolled forward past any
    * manifest the pointer doesn't know about yet (crash-between-manifest-
    * and-pointer). 0 = empty store. Read-only. */
  def currentVersion(spark: SparkSession, root: String): Long = {
    val f = fs(spark, root)
    var v = readPointer(f, root).getOrElse(0L)
    while (f.exists(manifestPath(root, v + 1))) v += 1
    v
  }

  /** The current committed snapshot as a DataFrame; empty-schema-less
    * reads are the caller's concern — returns None when nothing has ever
    * been committed. Readers resolve the data directory through the
    * manifest, so a half-written `prepare` directory is invisible. */
  def read(spark: SparkSession, root: String): Option[DataFrame] = {
    val v = currentVersion(spark, root)
    if (v == 0) None
    else Some(spark.read.parquet(s"$root/${dataDirOf(fs(spark, root), root, v)}"))
  }

  /** Time travel: read the snapshot AS OF a specific committed version.
    * Data dirs are immutable and stay referenced by their manifest until
    * [[expire]] drops them, so any version [[history]] lists is readable
    * byte-identically to the moment it committed — the Iceberg
    * `VERSION AS OF` read path, filesystem edition. Throws if the version
    * was never committed or has been expired. */
  def readAt(spark: SparkSession, root: String, version: Long): DataFrame = {
    val f = fs(spark, root)
    require(version > 0, s"versions start at 1, got $version")
    if (!f.exists(manifestPath(root, version)))
      throw new IllegalArgumentException(
        s"version $version of $root does not exist (never committed, or expired)")
    spark.read.parquet(s"$root/${dataDirOf(f, root, version)}")
  }

  /** All live (non-expired) versions, ascending, with their data dir —
    * the `table.history()` view. Read-only; derived purely from the
    * manifest directory listing. */
  def history(spark: SparkSession, root: String): Seq[(Long, String)] = {
    val f = fs(spark, root)
    val mdir = new Path(s"$root/_manifests")
    if (!f.exists(mdir)) Seq.empty
    else f.listStatus(mdir).toSeq.filter(_.isFile)
      .map(_.getPath.getName.stripSuffix(".json").toLong).sorted
      .map(v => (v, dataDirOf(f, root, v)))
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
    val live = history(spark, root)
    if (live.isEmpty) return
    // Pin the pointer to the newest version BEFORE deleting manifests:
    // currentVersion rolls forward from the pointer, so a stale pointer
    // naming an expired version would otherwise strand readers below the
    // surviving range.
    aimPointer(spark, root, live.last._1)
    live.dropRight(keepLast).foreach { case (v, dir) =>
      f.delete(manifestPath(root, v), false)
      f.delete(new Path(s"$root/$dir"), true)
    }
  }

  /** Full-snapshot commit: prepare + publish at currentVersion+1.
    * Returns the committed version. Throws [[CommitConflict]] if another
    * writer committed that version first. */
  def commit(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val next = currentVersion(spark, root) + 1
    val dir = prepare(df, root)
    publish(spark, root, next, dir)
    next
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
    * on conflict the prepared data dir is removed and [[CommitConflict]]
    * thrown. On success the `_current` pointer is re-aimed (atomic rename;
    * best-effort — a crash before it is healed by reader roll-forward). */
  private[graft] def publish(
      spark: SparkSession, root: String, version: Long, dataDir: String): Unit = {
    val f = fs(spark, root)
    val manifest = manifestPath(root, version)
    f.mkdirs(manifest.getParent)
    val files = f.listStatus(new Path(s"$root/$dataDir")).toSeq
      .filter(_.isFile).map(_.getPath.getName).sorted ++
      f.globStatus(new Path(s"$root/$dataDir/day=*/*")).toSeq
        .filter(_.isFile).map(s => s"${s.getPath.getParent.getName}/${s.getPath.getName}").sorted
    val body =
      s"""{"version": $version, "dataDir": "$dataDir",
         | "files": [${files.map(n => "\"" + n + "\"").mkString(", ")}]}""".stripMargin
    val out =
      try f.create(manifest, /* overwrite = */ false)
      catch {
        case _: java.io.IOException =>
          f.delete(new Path(s"$root/$dataDir"), true)
          throw new CommitConflict(version, root)
      }
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    aimPointer(spark, root, version)
  }

  /** Atomic pointer swap: write `_current.tmp`, rename OVERWRITE onto
    * `_current`. Monotone: never aims backwards (a slow writer finishing
    * version N after N+1 committed must not regress the cache). */
  private def aimPointer(spark: SparkSession, root: String, version: Long): Unit = {
    val f = fs(spark, root)
    if (readPointer(f, root).getOrElse(0L) >= version) return
    val tmp = new Path(s"$root/_current.tmp")
    val out = f.create(tmp, true)
    try out.write(version.toString.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val fc = FileContext.getFileContext(tmp.toUri, spark.sessionState.newHadoopConf())
    fc.rename(tmp, pointerPath(root), Options.Rename.OVERWRITE)
  }

  private def readPointer(f: FileSystem, root: String): Option[Long] = {
    val p = pointerPath(root)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    }
  }

  /** Resolve a committed version's data dir through its manifest. */
  private def dataDirOf(f: FileSystem, root: String, v: Long): String = {
    val in = f.open(manifestPath(root, v))
    val body = try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
    """"dataDir":\s*"([^"]+)"""".r.findFirstMatchIn(body)
      .getOrElse(throw new IllegalStateException(s"manifest $v of $root has no dataDir"))
      .group(1)
  }

  /** Garbage-collect data dirs no manifest references and stale tmp
    * pointers. Committed data dirs are immutable and always referenced,
    * so this can never delete committed data — but an IN-FLIGHT `prepare`
    * of a live writer is unreferenced by design, so run vacuum only when
    * no commit is in progress (the usual table-maintenance window). */
  def vacuum(spark: SparkSession, root: String): Unit = {
    val f = fs(spark, root)
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) return
    val referenced: Set[String] = {
      val mdir = new Path(s"$root/_manifests")
      if (!f.exists(mdir)) Set.empty
      else f.listStatus(mdir).toSeq.filter(_.isFile)
        .map(_.getPath.getName.stripSuffix(".json").toLong)
        .map(v => dataDirOf(f, root, v)).toSet
    }
    f.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("data-"))
      .filterNot(s => referenced.contains(s.getPath.getName))
      .foreach(s => f.delete(s.getPath, true))
    val tmp = new Path(s"$root/_current.tmp")
    if (f.exists(tmp)) f.delete(tmp, false)
  }
}
