package graft.sinks

import org.apache.spark.sql.DataFrame

/** Shared machinery for MAINTAINED QUERY ARTIFACTS — tables built once
  * from a source frame and read by many queries (the lexical posting
  * index [[graft.operators.Search]], the dedup family's shingle table
  * [[graft.operators.ShingleStore]]):
  *
  *  - a per-process build cache keyed on (path, source-data fingerprint),
  *    so a pre-existing path from an earlier process is rebuilt on first
  *    use and source data regenerated WITHIN one process triggers a
  *    rebuild instead of silently serving a stale artifact;
  *  - an atomic build-then-publish protocol: the artifact's tables are
  *    all written under a temp root, the old artifact is renamed ASIDE
  *    (never deleted before its replacement is in place), and the temp
  *    root is renamed in — a crash at any step leaves either the old or
  *    the new artifact fully recoverable, never a corrupt or half-written
  *    one. The worst a CONCURRENT reader can observe is a brief absence
  *    between the two renames (rename is not an exchange op on HDFS-style
  *    filesystems); [[heal]] repairs any crashed publish from the
  *    leftover state before the next build.
  */
object ArtifactStore {

  /** Artifact builds already performed by THIS process: path → fingerprint
    * of the source files that fed the build. */
  private val built = scala.collection.concurrent.TrieMap[String, String]()

  /** Spec hook: forget every per-process build record (simulates a fresh
    * process against the same on-disk artifacts). Never called by
    * production code. */
  private[graft] def forgetProcessRecords(): Unit = built.clear()

  /** Marker file INSIDE the artifact carrying the source fingerprint the
    * artifact was built from — written into the build's temp root before
    * the publish rename, so it is atomic with the content it describes
    * and can never outlive a re-publish. A FRESH process finding a
    * matching marker TRUSTS the artifact instead of rebuilding (builds
    * are deterministic, so identical source ⇒ identical artifact); an
    * in-place mutation ([[invalidate]]) deletes it, so mutated artifacts
    * are never trusted across processes. */
  private val MarkerName = "__source_fp"

  private def markerOf(conf: org.apache.hadoop.conf.Configuration,
                       path: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(path, MarkerName)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim) finally in.close()
    }
  }

  /** Per-path build locks: concurrent ensure() calls on the SAME path
    * serialize (one build, the other observes the cache), while builds of
    * UNRELATED artifacts (the lexical index and the shingle table, say)
    * proceed in parallel instead of queuing on one global monitor. */
  private val pathLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Fingerprint of the files feeding `source`: sorted (path, length,
    * mtime) triples, md5'd. Metadata-only — no data scan. In-memory frames
    * (no input files) fingerprint to a constant — for those the freshness
    * guarantee degrades to per-process first-use, which is all a fileless
    * source can offer. */
  def sourceFingerprint(source: DataFrame): String = {
    val conf = source.sparkSession.sessionState.newHadoopConf()
    val lines = source.inputFiles.sorted.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val st = p.getFileSystem(conf).getFileStatus(p)
      s"$f:${st.getLen}:${st.getModificationTime}"
    }
    java.security.MessageDigest.getInstance("MD5")
      .digest(lines.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Drop the build record for `path` — called by artifact owners whose
    * IN-PLACE maintenance (e.g. an incremental append) makes the recorded
    * source fingerprint meaningless, so the next [[ensure]] rebuilds from
    * whatever source it is given instead of trusting a record that
    * predates the mutation. Removes BOTH the per-process record and the
    * on-disk marker (a later process must not trust a mutated artifact). */
  def invalidate(path: String): Unit = {
    built.remove(path)
    try {
      val p = new org.apache.hadoop.fs.Path(path, MarkerName)
      p.getFileSystem(new org.apache.hadoop.conf.Configuration()).delete(p, false)
      ()
    } catch { case _: java.io.IOException => () }
  }

  /** Build the artifact at `path` via [[publish]] unless it was already
    * built from the SAME source data — by this process (the in-memory
    * record) or by a completed earlier publish (the on-disk fingerprint
    * marker, atomic with the artifact). Cross-process trust requires a
    * file-backed source (an in-memory frame fingerprints to a constant,
    * which can only promise per-process freshness) and cuts the
    * once-per-PROCESS rebuild cost to once per CORPUS: a bench or
    * scale-leg JVM landing after a sibling built the artifacts pays a
    * marker read, not minutes of rebuild. `build(source, tmpRoot)` must
    * write every table of the artifact under `tmpRoot` and be
    * deterministic in its source (every build here is — the property the
    * golden oracles already depend on). */
  /** `builderId` salts the trust fingerprint with the BUILD's identity —
    * version token plus parameters (e.g. `"bpe1:m=8192:d=4000"`). The
    * source fingerprint alone says the INPUT is unchanged; after a code
    * or parameter change a later process would otherwise trust and serve
    * the stale artifact built by the old logic. Builders whose logic or
    * parameters change must change their id; parameterized builders
    * derive it from their parameters so no manual bump can be missed. */
  def ensure(source: DataFrame, path: String, builderId: String = "")
            (build: (DataFrame, String) => Unit): Unit =
    pathLocks.computeIfAbsent(path, _ => new Object).synchronized {
      val srcFp = sourceFingerprint(source)
      val fp = if (builderId.isEmpty) srcFp else s"$srcFp|$builderId"
      if (built.get(path).contains(fp)) return
      val fileBacked = source.inputFiles.nonEmpty
      val conf = source.sparkSession.sessionState.newHadoopConf()
      if (fileBacked && markerOf(conf, path).contains(fp)) {
        built(path) = fp // completed publish from identical source: trust
      } else {
        publish(source.sparkSession, path,
          fingerprint = if (fileBacked) Some(fp) else None)(
          tmp => build(source, tmp))
        built(path) = fp
      }
    }

  /** Run `build(tmpRoot)` then atomically publish tmpRoot as `path` (see
    * class doc for the protocol and its crash states).
    *
    * Cross-PROCESS exclusion: pathLocks/built only serialize builds within
    * one JVM, but artifact paths are shared content-addressed locations, so
    * two processes publishing the same path could delete each other's
    * `__build_tmp` mid-build or interleave the rename sequence. A
    * filesystem-level lock (atomic create of `path.__lock`) serializes the
    * whole build+publish across processes; a lock older than
    * [[LockStaleMs]] is presumed abandoned by a crashed process and broken. */
  def publish(spark: org.apache.spark.sql.SparkSession, path: String,
              fingerprint: Option[String] = None)
             (build: String => Unit): Unit = {
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    val lock = new org.apache.hadoop.fs.Path(path + ".__lock")
    acquireLock(fs, lock)
    try {
      val tmp = new org.apache.hadoop.fs.Path(path + ".__build_tmp")
      val old = new org.apache.hadoop.fs.Path(path + ".__old")
      heal(fs, target, tmp, old)
      if (fs.exists(tmp)) fs.delete(tmp, true)
      build(tmp.toString)
      // Source-fingerprint marker rides the temp root: atomic with the
      // content through the rename below (see MarkerName).
      fingerprint.foreach { fp =>
        val out = fs.create(new org.apache.hadoop.fs.Path(tmp, MarkerName), true)
        try out.write(fp.getBytes("UTF-8")) finally out.close()
      }
      if (fs.exists(old)) fs.delete(old, true)
      if (fs.exists(target) && !fs.rename(target, old))
        throw new java.io.IOException(s"ArtifactStore: failed to move $target aside for publish")
      if (!fs.rename(tmp, target))
        throw new java.io.IOException(
          s"ArtifactStore: publish rename $tmp -> $target failed; new artifact intact at $tmp")
      if (fs.exists(old)) fs.delete(old, true)
      // A rebuilt artifact reuses the path with NEW content at the SAME
      // versions — any VersionedStore living inside it must not be served
      // from the parsed-manifest cache of the previous generation.
      VersionedStore.invalidateCachedManifests(path)
    } finally fs.delete(lock, false)
  }

  /** A publish lock file untouched for this long is treated as abandoned
    * (its holder crashed between acquire and the `finally` delete) and
    * broken. Builds are minutes even at large corpus sizes; 30 min is far
    * outside any live build's silence window. */
  private val LockStaleMs = 30L * 60 * 1000

  /** Acquire `lock` via atomic create-exclusive (`FileSystem.create` with
    * overwrite=false — atomic on local and HDFS-style filesystems). On
    * contention, poll until the holder releases or the lock goes stale. */
  private def acquireLock(fs: org.apache.hadoop.fs.FileSystem,
                          lock: org.apache.hadoop.fs.Path): Unit = {
    val deadline = System.currentTimeMillis() + 2 * LockStaleMs
    var acquired = false
    while (!acquired) {
      try {
        fs.create(lock, false).close()
        acquired = true
      } catch {
        case _: java.io.IOException =>
          try {
            val age = System.currentTimeMillis() - fs.getFileStatus(lock).getModificationTime
            if (age > LockStaleMs) fs.delete(lock, false)
          } catch { case _: java.io.FileNotFoundException => () } // holder just released
          if (!acquired && System.currentTimeMillis() > deadline)
            throw new java.io.IOException(s"ArtifactStore: timed out waiting for publish lock $lock")
          Thread.sleep(200)
      }
    }
  }

  /** Repair a crashed publish. The protocol orders its steps so leftover
    * state is unambiguous: the new artifact is COMPLETE before the old
    * target moves aside, so `target missing ∧ tmp present` means tmp is
    * the finished new artifact (complete the publish); `target missing ∧
    * only old present` (defensive — unreachable under the protocol)
    * restores the old artifact. With target present, leftovers are debris
    * discarded by the next [[publish]]. */
  private def heal(fs: org.apache.hadoop.fs.FileSystem,
                   target: org.apache.hadoop.fs.Path,
                   tmp: org.apache.hadoop.fs.Path,
                   old: org.apache.hadoop.fs.Path): Unit =
    if (!fs.exists(target)) {
      if (fs.exists(old) && fs.exists(tmp)) {
        if (!fs.rename(tmp, target))
          throw new java.io.IOException(s"ArtifactStore: completing rename $tmp -> $target failed")
        fs.delete(old, true)
      } else if (fs.exists(old)) {
        if (!fs.rename(old, target))
          throw new java.io.IOException(s"ArtifactStore: restore rename $old -> $target failed")
      }
    }
}
