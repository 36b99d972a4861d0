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
    else Some(readDirs(spark, root, dataDirsOf(fs(spark, root), root, v)))
  }

  /** Union the referenced data dirs — each dir runs its OWN partition
    * discovery (a multi-path read would see the day= trees under
    * different `data-<uuid>` roots as conflicting structures). */
  private def readDirs(spark: SparkSession, root: String, dirs: Seq[String]): DataFrame =
    dirs.map(d => spark.read.parquet(s"$root/$d")).reduce(_ unionByName _)

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
                  toVersion: Long = -1L): Option[DataFrame] = {
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
    if (!before.forall(after.contains))
      throw new IllegalStateException(
        s"versions $sinceVersion..$to of $root span a snapshot rewrite " +
          "(compaction); dir-level changes are undefined — read the full table")
    val added = after.filterNot(beforeSet)
    if (added.isEmpty) None else Some(readDirs(spark, root, added))
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
    readDirs(spark, root, dataDirsOf(f, root, version))
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
    // Candidate dirs = everything the DROPPED manifests referenced, read
    // BEFORE deleting them; delete the candidates no surviving manifest
    // still uses. Append commits share dirs across versions, so an
    // expired version's added dir may still back the current snapshot —
    // it stays until a compaction stops referencing it, after which the
    // next expire sees it among the then-dropped manifest's dirs and
    // collects it. Scoping the sweep to dropped-manifest dirs (never a
    // bare data-* listing) keeps a concurrent writer's in-flight
    // `prepare` directory safe — unreferenced-by-design debris is
    // vacuum()'s job, in a maintenance window.
    val dropped = live.dropRight(keepLast)
    val candidates = dropped.flatMap { case (v, _) => dataDirsOf(f, root, v) }.toSet
    dropped.foreach { case (v, _) => f.delete(manifestPath(root, v), false) }
    val stillReferenced = history(spark, root)
      .flatMap { case (v, _) => dataDirsOf(f, root, v) }.toSet
    candidates.diff(stillReferenced)
      .foreach(d => f.delete(new Path(s"$root/$d"), true))
  }

  /** Full-snapshot commit: prepare + publish at currentVersion+1.
    * Returns the committed version. Throws [[CommitConflict]] if another
    * writer committed that version first. `meta` rides in the manifest —
    * the application-level transaction record (e.g. a streaming sink's
    * batch id) that makes replays detectable. */
  def commit(df: DataFrame, root: String,
             meta: Map[String, String] = Map.empty): Long = {
    val spark = df.sparkSession
    val next = currentVersion(spark, root) + 1
    val dir = prepare(df, root)
    publish(spark, root, next, dir, meta = meta)
    next
  }

  /** APPEND commit — the batch-proportional edition: the new version's
    * manifest references every data dir of the current version PLUS one
    * fresh dir holding only `df`'s rows (the Delta/Iceberg add-files
    * shape, dir-granular). Work per commit is O(batch), never O(table):
    * nothing existing is rewritten, read() unions the referenced dirs.
    * Concurrency control is unchanged — the manifest create arbitrates,
    * and a loser whose base-dir list went stale aborts wholesale, so a
    * racing append can never drop the winner's files. */
  def commitAppend(df: DataFrame, root: String,
                   meta: Map[String, String] = Map.empty): Long =
    commitAppendAt(df, root, currentVersion(df.sparkSession, root), meta)

  /** [[commitAppend]] PINNED at an expected base version — the
    * optimistic-concurrency edition for callers whose `meta` (or any other
    * state) was derived by READING version `baseVersion` first: the new
    * manifest carries exactly `baseVersion`'s dirs plus the batch's, and
    * publishes at `baseVersion + 1`, so if ANY other commit landed after
    * the caller's read, the manifest create loses and [[CommitConflict]]
    * propagates — the caller re-reads and retries rather than silently
    * publishing a snapshot that drops the interleaved commit's state.
    * This is the compare-and-swap every read-modify-write on the store
    * (ledger merges, compaction) must use. */
  def commitAppendAt(df: DataFrame, root: String, baseVersion: Long,
                     meta: Map[String, String] = Map.empty): Long = {
    val spark = df.sparkSession
    val base =
      if (baseVersion == 0) Seq.empty[String]
      else dataDirsOf(fs(spark, root), root, baseVersion)
    val dir = prepare(df, root)
    publish(spark, root, baseVersion + 1, dir, baseDirs = base, meta = meta)
    baseVersion + 1
  }

  /** Full-snapshot [[commit]] PINNED at an expected base version — same
    * stale-base abort contract as [[commitAppendAt]]: publishes at
    * `baseVersion + 1` or throws [[CommitConflict]] if anything committed
    * after the caller read `baseVersion`. The seam compaction needs: its
    * rewritten snapshot and carried-forward meta are both reads of
    * `baseVersion`, and an interleaved micro-batch between read and
    * publish must abort the compaction, never vanish from the table. */
  def commitAt(df: DataFrame, root: String, baseVersion: Long,
               meta: Map[String, String] = Map.empty): Long = {
    val dir = prepare(df, root)
    publish(df.sparkSession, root, baseVersion + 1, dir, meta = meta)
    baseVersion + 1
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
    * NEW dir's files — earlier dirs were listed by their own manifests. */
  private[graft] def publish(
      spark: SparkSession, root: String, version: Long, dataDir: String,
      baseDirs: Seq[String] = Seq.empty,
      meta: Map[String, String] = Map.empty): Unit = {
    val f = fs(spark, root)
    val manifest = manifestPath(root, version)
    f.mkdirs(manifest.getParent)
    val files = f.listStatus(new Path(s"$root/$dataDir")).toSeq
      .filter(_.isFile).map(_.getPath.getName).sorted ++
      f.globStatus(new Path(s"$root/$dataDir/day=*/*")).toSeq
        .filter(_.isFile).map(s => s"${s.getPath.getParent.getName}/${s.getPath.getName}").sorted
    // Braces are escaped too (legal JSON \u escapes) so the regex-based
    // manifest parser can bound the meta object with [^}]* — a literal
    // '}' inside a value would otherwise truncate the parse and silently
    // drop metadata (including the exactly-once batchId ledger).
    def js(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case '{' => "\\u007b"; case '}' => "\\u007d"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val dirs = baseDirs :+ dataDir
    val body =
      s"""{"version": $version, "dataDir": "$dataDir",
         | "dataDirs": [${dirs.map(js).mkString(", ")}],
         | "meta": {${meta.toSeq.sortBy(_._1).map { case (k, v) => s"${js(k)}: ${js(v)}" }.mkString(", ")}},
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

  private def metaOf(f: FileSystem, root: String, v: Long): Map[String, String] = {
    val body = manifestBody(f, root, v)
    """"meta":\s*\{([^}]*)\}""".r.findFirstMatchIn(body) match {
      case None => Map.empty
      case Some(m) =>
        """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
          .findAllMatchIn(m.group(1))
          .map(g => unescape(g.group(1)) -> unescape(g.group(2))).toMap
    }
  }

  private def unescape(s: String): String =
    """\\(u[0-9a-fA-F]{4}|.)""".r.replaceAllIn(s, m => {
      val g = m.group(1)
      java.util.regex.Matcher.quoteReplacement(
        if (g.startsWith("u")) Integer.parseInt(g.drop(1), 16).toChar.toString else g)
    })

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

  private def manifestBody(f: FileSystem, root: String, v: Long): String = {
    val in = f.open(manifestPath(root, v))
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  /** Resolve a committed version's NEWEST data dir (the one its commit
    * added) through its manifest. */
  private def dataDirOf(f: FileSystem, root: String, v: Long): String =
    """"dataDir":\s*"([^"]+)"""".r.findFirstMatchIn(manifestBody(f, root, v))
      .getOrElse(throw new IllegalStateException(s"manifest $v of $root has no dataDir"))
      .group(1)

  /** ALL data dirs a version references, in commit order. Append commits
    * reference earlier versions' dirs; pre-append manifests carry only
    * the single `dataDir` field. */
  private def dataDirsOf(f: FileSystem, root: String, v: Long): Seq[String] = {
    val body = manifestBody(f, root, v)
    """"dataDirs":\s*\[([^\]]*)\]""".r.findFirstMatchIn(body) match {
      case Some(m) => """"((?:[^"\\]|\\.)+)"""".r.findAllMatchIn(m.group(1))
        .map(g => unescape(g.group(1))).toSeq
      case None => Seq(dataDirOf(f, root, v))
    }
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
        .flatMap(v => dataDirsOf(f, root, v)).toSet
    }
    f.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("data-"))
      .filterNot(s => referenced.contains(s.getPath.getName))
      .foreach(s => f.delete(s.getPath, true))
    val tmp = new Path(s"$root/_current.tmp")
    if (f.exists(tmp)) f.delete(tmp, false)
  }
}
