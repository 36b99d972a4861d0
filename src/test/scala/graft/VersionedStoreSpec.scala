package graft

import java.nio.file.Files

import graft.sinks.VersionedStore
import org.apache.spark.sql.functions.{col, lit}

/** Manifest-commit gates: readers resolve data through the manifest (a
  * half-written prepare dir is invisible), a crash between manifest and
  * pointer rolls forward, and a second writer racing the same version
  * aborts with CommitConflict instead of interleaving files. */
class VersionedStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-vstore").toString

  private def snap(day: String, users: (Long, Double)*) =
    users.map { case (u, v) => (day, u, v) }.toDF("day", "user_id", "value")

  test("commit/read round trip; versions advance; old versions stay readable debris-free") {
    val root = tmp()
    assert(VersionedStore.read(spark, root).isEmpty, "empty store reads as None")
    val v1 = VersionedStore.commit(snap("2024-01-01", 1L -> 10.0), root)
    assert(v1 === 1L)
    val v2 = VersionedStore.commit(snap("2024-01-01", 1L -> 11.0, 2L -> 20.0), root)
    assert(v2 === 2L)
    assert(VersionedStore.currentVersion(spark, root) === 2L)
    val rows = VersionedStore.read(spark, root).get.orderBy("user_id").collect()
    assert(rows.map(_.getAs[Double]("value")).toSeq === Seq(11.0, 20.0))
  }

  test("reader during an interrupted commit (crash mid-prepare) sees only the old version") {
    val root = tmp()
    VersionedStore.commit(snap("2024-01-01", 1L -> 10.0), root)
    // A writer crashed after writing data files but BEFORE the manifest
    // create: a fully-written but unreferenced data dir sits in the store.
    VersionedStore.prepare(snap("2024-01-01", 1L -> 999.0, 9L -> 9.0), root)
    assert(VersionedStore.currentVersion(spark, root) === 1L)
    val rows = VersionedStore.read(spark, root).get.collect()
    assert(rows.length === 1 && rows.head.getAs[Double]("value") === 10.0,
      "the uncommitted prepare must be invisible to readers")
  }

  test("crash between manifest and pointer: readers roll forward to the committed version") {
    val root = tmp()
    VersionedStore.commit(snap("2024-01-01", 1L -> 10.0), root)
    // Simulate the crash window: manifest published, pointer never aimed.
    val dir = VersionedStore.prepare(snap("2024-01-01", 1L -> 42.0), root)
    VersionedStore.publish(spark, root, 2L, dir)
    // Regress the pointer to what it held before the "crash" (drop the
    // local-FS checksum twin too, or the Hadoop reader rejects the edit).
    new java.io.File(s"$root/._current.crc").delete()
    val cur = new java.io.PrintWriter(s"$root/_current"); cur.print("1"); cur.close()
    assert(VersionedStore.currentVersion(spark, root) === 2L,
      "manifest is the commit point; the pointer is only a cache")
    assert(VersionedStore.read(spark, root).get.collect().head.getAs[Double]("value") === 42.0)
  }

  test("second writer racing the same version aborts with CommitConflict, its data dir removed") {
    val root = tmp()
    VersionedStore.commit(snap("2024-01-01", 1L -> 10.0), root)
    // Both writers read currentVersion = 1 and prepare; A publishes 2 first.
    val dirA = VersionedStore.prepare(snap("2024-01-01", 1L -> 20.0), root)
    val dirB = VersionedStore.prepare(snap("2024-01-01", 1L -> 30.0), root)
    VersionedStore.publish(spark, root, 2L, dirA)
    intercept[VersionedStore.CommitConflict] {
      VersionedStore.publish(spark, root, 2L, dirB)
    }
    // Winner's data intact, loser's orphan cleaned up, store uncorrupted.
    assert(VersionedStore.read(spark, root).get.collect().head.getAs[Double]("value") === 20.0)
    assert(!new java.io.File(s"$root/$dirB").exists, "loser must remove its prepared dir")
    assert(VersionedStore.currentVersion(spark, root) === 2L)
  }

  test("day-partitioned snapshots keep partition pruning through the versioned layout") {
    val root = tmp()
    VersionedStore.commit(
      snap("2024-01-01", 1L -> 10.0).union(snap("2024-01-02", 2L -> 20.0)), root)
    val d2 = VersionedStore.read(spark, root).get.filter(col("day") === "2024-01-02")
    assert(d2.collect().map(_.getAs[Long]("user_id")).toSeq === Seq(2L))
    val scan = d2.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") || scan.contains("day"), "day stays a partition column")
  }

  test("time travel: readAt(v) returns each committed version byte-identically; history lists them") {
    val root = tmp()
    VersionedStore.commit(snap("2024-01-01", 1L -> 10.0), root)
    VersionedStore.commit(snap("2024-01-01", 1L -> 11.0, 2L -> 20.0), root)
    VersionedStore.commit(snap("2024-01-01", 1L -> 12.0), root)
    assert(VersionedStore.history(spark, root).map(_._1) === Seq(1L, 2L, 3L))
    assert(VersionedStore.readAt(spark, root, 1L).collect()
      .map(_.getAs[Double]("value")).toSeq === Seq(10.0))
    assert(VersionedStore.readAt(spark, root, 2L).orderBy("user_id").collect()
      .map(_.getAs[Double]("value")).toSeq === Seq(11.0, 20.0))
    // readAt(current) ≡ read
    assert(VersionedStore.readAt(spark, root, 3L).collect().toSeq ===
      VersionedStore.read(spark, root).get.collect().toSeq)
    intercept[IllegalArgumentException] { VersionedStore.readAt(spark, root, 4L) }
  }

  test("expire keeps the newest keepLast versions; expired versions become unreadable, current survives") {
    val root = tmp()
    (1 to 4).foreach(i => VersionedStore.commit(snap("2024-01-01", 1L -> i.toDouble), root))
    VersionedStore.expire(spark, root, keepLast = 2)
    assert(VersionedStore.history(spark, root).map(_._1) === Seq(3L, 4L))
    intercept[IllegalArgumentException] { VersionedStore.readAt(spark, root, 1L) }
    assert(VersionedStore.readAt(spark, root, 3L).collect().head.getAs[Double]("value") === 3.0)
    assert(VersionedStore.currentVersion(spark, root) === 4L)
    assert(VersionedStore.read(spark, root).get.collect().head.getAs[Double]("value") === 4.0)
    // Expired data dirs are gone from disk, not just dereferenced.
    val dataDirs = new java.io.File(root).listFiles.filter(_.getName.startsWith("data-"))
    assert(dataDirs.length === 2)
  }

  test("expire with a stale pointer pins the pointer forward before deleting manifests") {
    val root = tmp()
    (1 to 3).foreach(i => VersionedStore.commit(snap("2024-01-01", 1L -> i.toDouble), root))
    // Regress the pointer to 1 (crash-window shape), then expire 1 and 2.
    new java.io.File(s"$root/._current.crc").delete()
    val cur = new java.io.PrintWriter(s"$root/_current"); cur.print("1"); cur.close()
    VersionedStore.expire(spark, root, keepLast = 1)
    assert(VersionedStore.currentVersion(spark, root) === 3L,
      "expire must not strand readers below the surviving version range")
    assert(VersionedStore.read(spark, root).get.collect().head.getAs[Double]("value") === 3.0)
  }

  test("vacuum removes only unreferenced debris") {
    val root = tmp()
    VersionedStore.commit(snap("2024-01-01", 1L -> 10.0), root)
    VersionedStore.prepare(snap("2024-01-01", 1L -> 999.0), root) // orphan
    VersionedStore.vacuum(spark, root)
    val dataDirs = new java.io.File(root).listFiles.filter(_.getName.startsWith("data-"))
    assert(dataDirs.length === 1, "exactly the one referenced data dir survives")
    assert(VersionedStore.read(spark, root).get.collect().head.getAs[Double]("value") === 10.0)
  }

  test("append commits: O(batch) writes, cumulative reads, time travel per batch") {
    val root = tmp()
    val v1 = VersionedStore.commitAppend(snap("2024-01-01", 1L -> 1.0), root)
    val v2 = VersionedStore.commitAppend(snap("2024-01-02", 2L -> 2.0), root)
    val v3 = VersionedStore.commitAppend(snap("2024-01-03", 3L -> 3.0), root)
    assert((v1, v2, v3) === ((1L, 2L, 3L)))
    assert(VersionedStore.read(spark, root).get.count() === 3L,
      "current snapshot is the union of all appended batches")
    assert(VersionedStore.readAt(spark, root, 2L).orderBy("user_id").collect()
      .map(_.getAs[Long]("user_id")).toSeq === Seq(1L, 2L),
      "each append version time-travels to its prefix")
    // each commit added exactly one data dir — nothing was rewritten
    val dataDirs = new java.io.File(root).listFiles.filter(_.getName.startsWith("data-"))
    assert(dataDirs.length === 3)
  }

  test("log segments: append manifests stay O(batch) — byte size flat as the table widens") {
    val root = tmp()
    (1 to 40).foreach { i =>
      VersionedStore.commitAppend(
        snap(f"2024-${(i - 1) / 28 + 1}%02d-${(i - 1) % 28 + 1}%02d",
          i.toLong -> i.toDouble), root,
        statsCols = Seq("user_id"))
    }
    def manifestLen(v: Long): Long = new java.io.File(s"$root/_manifests/$v.json").length
    // The monolithic format re-listed every dir and its stats per commit:
    // manifest 40 was ~20× manifest 2. A delta record carries only its
    // own edit — byte size must NOT grow with the table's dir count.
    assert(manifestLen(40) < manifestLen(2) * 2,
      s"append manifest must be O(batch): v2=${manifestLen(2)}B v40=${manifestLen(40)}B")
    // Resolution still yields the full state: count, stats skipping, and
    // time travel all see every appended dir.
    assert(VersionedStore.read(spark, root).get.count() === 40L)
    assert(VersionedStore.countWhere(spark, root,
      Seq(VersionedStore.ColRange("user_id", Some("11"), Some("20")))) === 10L)
    val pruned = VersionedStore.prunedDirs(spark, root, 40L,
      Seq(VersionedStore.ColRange.eq("user_id", "7")))
    assert(pruned.size === 1, s"per-dir stats must survive segmentation: $pruned")
    assert(VersionedStore.readAt(spark, root, 25L).count() === 25L)
    // The delta tail triggered at least one checkpoint (MinCheckpointTail
    // deltas after the full v1), and readers resolve through it.
    val cps = new java.io.File(s"$root/_manifests").listFiles
      .filter(_.getName.endsWith(".checkpoint"))
    assert(cps.nonEmpty, "a 40-delta chain must have materialized a checkpoint")
    assert(cps.forall(_.length > 0), "checkpoints must be complete files, never torn")
  }

  test("multi-part checkpoints: a wide state splits into sidecars, resolves " +
       "byte-identically, and expire reaps main + parts") {
    val root = tmp()
    val saved = VersionedStore.CheckpointPartDirs
    VersionedStore.CheckpointPartDirs = 8 // force the wide-table path
    try {
      (1 to 40).foreach { i =>
        VersionedStore.commitAppend(
          snap(f"2024-01-${(i % 28) + 1}%02d", i.toLong -> i.toDouble), root,
          statsCols = Seq("user_id"))
      }
      val files = new java.io.File(s"$root/_manifests").listFiles.map(_.getName)
      assert(files.exists(_.matches("""\d+\.checkpoint\.part-\d+""")),
        s"a >8-dir checkpoint must write part sidecars, saw ${files.mkString(",")}")
      // resolution through the multi-part anchor: full reads, point
      // pruning, metadata counts, time travel — all intact
      assert(VersionedStore.read(spark, root).get.count() === 40L)
      assert(VersionedStore.prunedDirs(spark, root, 40L,
        Seq(VersionedStore.ColRange.eq("user_id", "7"))).size === 1)
      assert(VersionedStore.countWhere(spark, root,
        Seq(VersionedStore.ColRange("user_id", Some("1"), Some("40")))) === 40L)
      assert(VersionedStore.readAt(spark, root, 35L).count() === 35L)
      // expire drops old versions: their checkpoint mains AND parts go
      VersionedStore.expire(spark, root, keepLast = 5)
      val after = new java.io.File(s"$root/_manifests").listFiles.map(_.getName)
      val liveVs = (36 to 40).map(_.toString).toSet
      val orphanParts = after.filter(_.contains(".checkpoint"))
        .filterNot(_.startsWith(".")) // Hadoop .crc siblings track their file
        .filterNot(n => liveVs.contains(n.takeWhile(_ != '.')))
      assert(orphanParts.isEmpty,
        s"expired checkpoints must reap their parts too: ${orphanParts.mkString(",")}")
      (36 to 40).foreach { v =>
        assert(VersionedStore.readAt(spark, root, v.toLong).count() === v.toLong)
      }
    } finally VersionedStore.CheckpointPartDirs = saved
  }

  test("log segments: expire cuts the chain safely — oldest survivor checkpointed, tail resolvable") {
    val root = tmp()
    (1 to 24).foreach { i =>
      VersionedStore.commitAppend(
        snap(f"2024-01-$i%02d", i.toLong -> i.toDouble), root,
        statsCols = Seq("user_id"))
    }
    VersionedStore.expire(spark, root, keepLast = 6)
    // Every survivor still time-travels, including the ones whose delta
    // chain now starts at the checkpointed oldest survivor.
    (19 to 24).foreach { v =>
      assert(VersionedStore.readAt(spark, root, v.toLong).count() === v.toLong,
        s"survivor $v must resolve after the chain was cut")
    }
    assertThrows[IllegalArgumentException](VersionedStore.readAt(spark, root, 18L))
    // The change feed over the surviving range still works.
    assert(VersionedStore.readChanges(spark, root, 19L, 24L).get.count() === 5L)
    // Stats-driven pruning still works through the checkpoint.
    assert(VersionedStore.prunedDirs(spark, root, 24L,
      Seq(VersionedStore.ColRange.eq("user_id", "3"))).size === 1)
    // A fresh append continues the chain on top of the cut.
    VersionedStore.commitAppend(snap("2024-02-01", 99L -> 9.0), root,
      statsCols = Seq("user_id"))
    assert(VersionedStore.read(spark, root).get.count() === 25L)
  }

  test("expire after appends never deletes a dir the surviving versions still read") {
    val root = tmp()
    (1 to 3).foreach(i =>
      VersionedStore.commitAppend(snap(s"2024-01-0$i", i.toLong -> i.toDouble), root))
    VersionedStore.expire(spark, root, keepLast = 1)
    // versions 1 and 2 are gone as VERSIONS...
    assertThrows[IllegalArgumentException](VersionedStore.readAt(spark, root, 1L))
    // ...but their data dirs survive because version 3 references them
    assert(VersionedStore.read(spark, root).get.count() === 3L,
      "the current snapshot must stay complete after expire")
    assert(new java.io.File(root).listFiles.count(_.getName.startsWith("data-")) === 3)
    // a compaction then makes the old dirs droppable for real
    val cv = VersionedStore.commit(VersionedStore.read(spark, root).get, root)
    VersionedStore.expire(spark, root, keepLast = 1)
    assert(VersionedStore.currentVersion(spark, root) === cv)
    assert(VersionedStore.read(spark, root).get.count() === 3L)
    assert(new java.io.File(root).listFiles.count(_.getName.startsWith("data-")) === 1,
      "after compaction + expire only the compacted dir remains")
  }

  test("commit metadata round-trips, escaping included") {
    val root = tmp()
    VersionedStore.commit(snap("2024-01-01", 1L -> 1.0), root,
      meta = Map("batchId" -> "7", "weird \"key\"" -> "tab\there \\ done",
        "appId" -> "job{1} => {x}")) // braces must not truncate the parse
    val m = VersionedStore.currentMeta(spark, root)
    assert(m("batchId") === "7", s"batchId must survive brace-bearing values: $m")
    assert(m("weird \"key\"") === "tab\there \\ done")
    assert(m("appId") === "job{1} => {x}")
    // a meta-less commit: descriptive entries do NOT carry (a later
    // commit must not claim the earlier one's markers) — but LEDGER
    // entries do (batchId is the legacy stream watermark; dropping it
    // would let a replayed batch re-append after any plain commit)
    VersionedStore.commit(snap("2024-01-01", 1L -> 2.0), root)
    // commitTs is the publish stamp (TIMESTAMP AS OF's record), present
    // on every commit — the only other surviving entry is the ledger
    val m2 = VersionedStore.currentMeta(spark, root)
    assert(m2.contains("commitTs"), s"every commit stamps commitTs: $m2")
    assert(m2 - "commitTs" === Map("batchId" -> "7"))
  }

  test("streaming sink: replayed batches commit exactly once; compaction keeps the ledger") {
    import graft.streaming.VersionedStream
    val root = tmp()
    def batch(i: Int) = snap(s"2024-01-0$i", i.toLong -> i.toDouble)
    VersionedStream.commitBatch(batch(1), 0L, root)
    VersionedStream.commitBatch(batch(2), 1L, root)
    assert(VersionedStream.lastBatchId(spark, root) === 1L)
    // at-least-once replay of batch 1 after a simulated crash: NO new version
    val before = VersionedStore.currentVersion(spark, root)
    VersionedStream.commitBatch(batch(2), 1L, root)
    VersionedStream.commitBatch(batch(1), 0L, root)
    assert(VersionedStore.currentVersion(spark, root) === before,
      "replayed batch ids must not re-commit")
    assert(VersionedStore.read(spark, root).get.count() === 2L)
    // empty batches never commit a version
    VersionedStream.commitBatch(snap("2024-01-09").limit(0), 5L, root)
    assert(VersionedStore.currentVersion(spark, root) === before)
    // compaction preserves the batchId ledger, so a late replay still skips
    VersionedStream.compact(spark, root)
    assert(VersionedStream.lastBatchId(spark, root) === 1L,
      "compaction must carry the transaction record forward")
    VersionedStream.commitBatch(batch(1), 0L, root)
    assert(VersionedStore.read(spark, root).get.count() === 2L)
    // and a genuinely new batch still lands
    VersionedStream.commitBatch(batch(3), 2L, root)
    assert(VersionedStore.read(spark, root).get.count() === 3L)
  }

  test("multi-writer ledger: two interleaved writers append exactly-once, replays of each skip") {
    import graft.streaming.VersionedStream
    val root = tmp()
    def batch(i: Int) = snap(s"2024-01-0$i", i.toLong -> i.toDouble)
    // Writers A and B interleave; each has its own checkpoint lineage, so
    // both start at batchId 0 — under the old single-key ledger B's first
    // batches would be silently skipped as A's replays.
    VersionedStream.commitBatch(batch(1), 0L, root, writerId = "A")
    VersionedStream.commitBatch(batch(2), 0L, root, writerId = "B")
    VersionedStream.commitBatch(batch(3), 1L, root, writerId = "A")
    VersionedStream.commitBatch(batch(4), 1L, root, writerId = "B")
    assert(VersionedStore.read(spark, root).get.count() === 4L,
      "both writers' batches must land — batch ids are per-writer, not global")
    assert(VersionedStream.lastBatchId(spark, root, "A") === 1L)
    assert(VersionedStream.lastBatchId(spark, root, "B") === 1L)
    // at-least-once replay of EACH writer's batches: no new versions
    val before = VersionedStore.currentVersion(spark, root)
    VersionedStream.commitBatch(batch(1), 0L, root, writerId = "A")
    VersionedStream.commitBatch(batch(4), 1L, root, writerId = "B")
    assert(VersionedStore.currentVersion(spark, root) === before)
    assert(VersionedStore.read(spark, root).get.count() === 4L)
    // every commit carries the OTHER writer's ledger entry forward, and
    // compaction preserves the full multi-writer ledger
    VersionedStream.compact(spark, root)
    assert(VersionedStream.lastBatchId(spark, root, "A") === 1L)
    assert(VersionedStream.lastBatchId(spark, root, "B") === 1L)
    // a third, genuinely new writer starts at -1 and is never skipped
    assert(VersionedStream.lastBatchId(spark, root, "C") === -1L)
    VersionedStream.commitBatch(batch(5), 0L, root, writerId = "C")
    assert(VersionedStore.read(spark, root).get.count() === 5L)
    // content exact across all writers
    assert(VersionedStore.read(spark, root).get.orderBy("user_id").collect()
      .map(_.getAs[Double]("value")).toSeq === Seq(1.0, 2.0, 3.0, 4.0, 5.0))
  }

  test("legacy un-keyed batchId ledger still gates the default writer") {
    import graft.streaming.VersionedStream
    val root = tmp()
    // A store written by the pre-multi-writer sink carries meta("batchId").
    VersionedStore.commitAppend(snap("2024-01-01", 1L -> 1.0), root,
      meta = Map("batchId" -> "3"))
    assert(VersionedStream.lastBatchId(spark, root) === 3L)
    VersionedStream.commitBatch(snap("2024-01-02", 2L -> 2.0), 3L, root)
    assert(VersionedStore.read(spark, root).get.count() === 1L,
      "a replay at the legacy ledger position must skip")
    VersionedStream.commitBatch(snap("2024-01-02", 2L -> 2.0), 4L, root)
    assert(VersionedStore.read(spark, root).get.count() === 2L)
    assert(VersionedStream.lastBatchId(spark, root) === 4L)
  }

  test("compaction racing a live micro-batch aborts instead of dropping the batch") {
    val root = tmp()
    VersionedStore.commitAppend(snap("2024-01-01", 1L -> 1.0), root,
      meta = Map("batch.A" -> "0"))
    // Compaction reads its snapshot + meta at base = 1 ...
    val base = VersionedStore.currentVersion(spark, root)
    val compacted = VersionedStore.readAt(spark, root, base)
    val meta = VersionedStore.metaAt(spark, root, base)
    // ... a micro-batch interleaves and commits version 2 ...
    VersionedStore.commitAppend(snap("2024-01-02", 2L -> 2.0), root,
      meta = Map("batch.A" -> "1"))
    // ... so the pinned publish at base+1 must lose the manifest race.
    intercept[VersionedStore.CommitConflict] {
      VersionedStore.commitAt(compacted, root, base, meta)
    }
    assert(VersionedStore.read(spark, root).get.count() === 2L,
      "the interleaved batch's rows must survive the aborted compaction")
    assert(VersionedStore.currentMeta(spark, root)("batch.A") === "1",
      "the interleaved batch's ledger entry must survive too")
    // the retried compaction (fresh base) then succeeds and keeps both rows
    import graft.streaming.VersionedStream
    VersionedStream.compact(spark, root)
    assert(VersionedStore.read(spark, root).get.count() === 2L)
    assert(VersionedStore.currentMeta(spark, root)("batch.A") === "1")
  }

  test("readChanges rejects a toVersion beyond the store with readAt's error shape") {
    val root = tmp()
    VersionedStore.commitAppend(snap("2024-01-01", 1L -> 1.0), root)
    val e = intercept[IllegalArgumentException] {
      VersionedStore.readChanges(spark, root, 0L, toVersion = 9L)
    }
    assert(e.getMessage.contains("does not exist"))
  }

  test("streaming sink end-to-end: one version per non-empty micro-batch, content exact") {
    import graft.streaming.VersionedStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmp()
    val ckpt = tmp()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long, Double)]
    val q = VersionedStream.startAppend(
      input.toDF().toDF("day", "user_id", "value"), root, ckpt)
    try {
      input.addData(("2024-01-01", 1L, 1.0), ("2024-01-01", 2L, 2.0))
      q.processAllAvailable()
      input.addData(("2024-01-02", 3L, 3.0))
      q.processAllAvailable()
    } finally q.stop()
    assert(VersionedStore.currentVersion(spark, root) === 2L)
    // select by name (the day partition column moves to the end on read)
    // and cast: partition-value inference reads day=2024-01-01 as a DATE
    assert(VersionedStore.read(spark, root).get
      .select(col("day").cast("string"), col("user_id"), col("value"))
      .orderBy("user_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      === Seq(("2024-01-01", 1L, 1.0), ("2024-01-01", 2L, 2.0), ("2024-01-02", 3L, 3.0)))
  }

  test("change feed: readChanges returns exactly the batches a version range appended") {
    val root = tmp()
    VersionedStore.commitAppend(snap("2024-01-01", 1L -> 1.0), root)
    VersionedStore.commitAppend(snap("2024-01-02", 2L -> 2.0), root)
    VersionedStore.commitAppend(snap("2024-01-03", 3L -> 3.0), root)
    // consumer checkpointed at v1: sees batches 2 and 3, nothing rescanned
    val changes = VersionedStore.readChanges(spark, root, sinceVersion = 1L).get
      .orderBy("user_id").collect().map(_.getAs[Long]("user_id")).toSeq
    assert(changes === Seq(2L, 3L))
    // bounded range
    assert(VersionedStore.readChanges(spark, root, 1L, 2L).get
      .collect().map(_.getAs[Long]("user_id")).toSeq === Seq(2L))
    // from zero = everything; caught-up consumer gets None
    assert(VersionedStore.readChanges(spark, root, 0L).get.count() === 3L)
    assert(VersionedStore.readChanges(spark, root, 3L).isEmpty)
    // a compaction breaks dir-level diff semantics LOUDLY, not silently
    VersionedStore.commit(VersionedStore.read(spark, root).get, root)
    assertThrows[IllegalStateException](
      VersionedStore.readChanges(spark, root, sinceVersion = 2L))
    // ...but post-compaction appends diff cleanly again
    VersionedStore.commitAppend(snap("2024-01-05", 5L -> 5.0), root)
    assert(VersionedStore.readChanges(spark, root, sinceVersion = 4L).get
      .collect().map(_.getAs[Long]("user_id")).toSeq === Seq(5L))
  }

  test("quality-gate-on-arrival: streamed LM scores equal batch scores, one version per batch") {
    import graft.operators.LmStore
    import graft.streaming.LmStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmp(); val ckpt = tmp(); val model = tmp() + "/lm"
    val trainDir = tmp() + "/train"
    Seq((0L, "the cat sat on the mat"), (2L, "the dog sat on the mat"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(trainDir)
    val train = spark.read.parquet(trainDir)
    LmStore.ensure(train, model)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = LmStream.startScoreToVersioned(
      input.toDF().toDF("doc_id", "text"), model, root, ckpt)
    val b1 = Seq((1L, "the cat sat on the mat"), (3L, "zyx qwv plk"))
    val b2 = Seq((5L, "the dog ran"), (7L, "x"))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(VersionedStore.currentVersion(spark, root) === 2L,
      "one transactional version per non-empty micro-batch")
    val streamed = VersionedStore.read(spark, root).get
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val batch = LmStore.score(spark, model, (b1 ++ b2).toDF("doc_id", "text"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(streamed === batch,
      "streamed-on-arrival scores must be bit-identical to batch scoring")
  }

  test("data skipping: a date-point read over a 50-append store opens only the matching dirs") {
    val root = tmp()
    // 50 appends, one per day (2024-01-01 .. 2024-02-19), each with
    // manifest min/max stats on day and user_id.
    val realDays = (0 until 50).map(i => java.time.LocalDate.of(2024, 1, 1).plusDays(i).toString)
    realDays.zipWithIndex.foreach { case (d, i) =>
      VersionedStore.commitAppend(
        Seq((d, i.toLong, i * 1.0)).toDF("day", "user_id", "value")
          .withColumn("day", col("day").cast("date")),
        root, statsCols = Seq("day", "user_id"))
    }
    assert(VersionedStore.currentVersion(spark, root) === 50L)
    val probe = Seq(VersionedStore.ColRange.eq("day", "2024-01-31"))
    val kept = VersionedStore.prunedDirs(spark, root, 50L, probe)
    assert(kept.size === 1,
      s"a date-point read must open exactly the matching dir, opened ${kept.size}")
    // the pruned read equals the full read filtered — pruning is never a filter
    val pruned = VersionedStore.readAt(spark, root, 50L, probe)
      .filter(col("day") === "2024-01-31").collect().map(_.toSeq).toSeq
    val full = VersionedStore.readAt(spark, root, 50L)
      .filter(col("day") === "2024-01-31").collect().map(_.toSeq).toSeq
    assert(pruned === full && full.nonEmpty)
    // range predicate over a second typed column (long)
    val longRange = Seq(VersionedStore.ColRange("user_id", Some("10"), Some("19")))
    assert(VersionedStore.prunedDirs(spark, root, 50L, longRange).size === 10,
      "typed long comparison (never lexical: '9' < '10' must hold)")
    // conjunction of predicates intersects
    val both = VersionedStore.prunedDirs(spark, root, 50L,
      probe ++ Seq(VersionedStore.ColRange("user_id", Some("0"), Some("40"))))
    assert(both.size === 1)
    // a predicate that excludes everything: the read stays schema-correct
    val none = VersionedStore.readAt(spark, root, 50L,
      Seq(VersionedStore.ColRange.eq("day", "2030-01-01")))
    assert(none.count() === 0 && none.columns.toSeq === Seq("user_id", "value", "day"))
    // change feed prunes too
    val changed = VersionedStore.readChanges(spark, root, 40L, skip = probe)
    assert(changed.isDefined && changed.get.count() === 0,
      "versions 41..50 hold no 2024-01-31 rows; stats must prove it without scanning")
  }

  test("dirs without stats are always kept; stats carry forward across later appends") {
    val root = tmp()
    VersionedStore.commitAppend(snap("2024-01-01", 1L -> 1.0), root) // no statsCols
    VersionedStore.commitAppend(snap("2024-01-02", 2L -> 2.0), root,
      statsCols = Seq("day"))
    VersionedStore.commitAppend(snap("2024-01-03", 3L -> 3.0), root,
      statsCols = Seq("day"))
    val kept = VersionedStore.prunedDirs(spark, root, 3L,
      Seq(VersionedStore.ColRange.eq("day", "2024-01-03")))
    // dir 1 has no stats (kept defensively), dir 2 is proven out, dir 3 matches
    assert(kept.size === 2, s"expected unstated dir + matching dir, got ${kept.size}")
    val rows = VersionedStore.readAt(spark, root, 3L,
        Seq(VersionedStore.ColRange.eq("day", "2024-01-03")))
      .filter(col("day") === "2024-01-03").collect()
    assert(rows.length === 1 && rows.head.getAs[Long]("user_id") === 3L)
  }

  test("schema drift: append with a new column is rejected by default, evolves with mergeSchema") {
    val root = tmp()
    VersionedStore.commitAppend(snap("2024-01-01", 1L -> 1.0), root)
    val drifted = Seq(("2024-01-02", 2L, 2.0, "en"))
      .toDF("day", "user_id", "value", "lang")
    val e = intercept[IllegalArgumentException] {
      VersionedStore.commitAppend(drifted, root)
    }
    assert(e.getMessage.contains("lang"), s"error must name the drifting column: ${e.getMessage}")
    assert(VersionedStore.currentVersion(spark, root) === 1L,
      "a rejected append must not commit")
    // opt-in evolution: the added column reads as NULL for older dirs
    VersionedStore.commitAppend(drifted, root, mergeSchema = true)
    val rows = VersionedStore.read(spark, root).get.orderBy("user_id").collect()
    assert(rows.length === 2)
    assert(rows(0).isNullAt(rows(0).fieldIndex("lang")), "pre-evolution rows read NULL")
    assert(rows(1).getAs[String]("lang") === "en")
    assert(VersionedStore.schemaAt(spark, root, 2L).exists(_.contains("lang")),
      "the merged schema must be recorded")
    assert(VersionedStore.metaAt(spark, root, 2L).get("mergeSchema").contains("true"))
    // a column going MISSING is also drift (rejected without the flag)...
    val narrower = Seq(("2024-01-03", 3L)).toDF("day", "user_id")
    intercept[IllegalArgumentException] { VersionedStore.commitAppend(narrower, root) }
    // ...and tolerated additively with it (missing side reads NULL)
    VersionedStore.commitAppend(narrower, root, mergeSchema = true)
    assert(VersionedStore.read(spark, root).get.count() === 3)
  }

  test("stream-maintained table is data-skippable: per-batch stats prune a point read to one dir") {
    val root = tmp()
    // Three micro-batches through the exactly-once sink's testable seam,
    // each carrying manifest day-stats.
    Seq("2024-01-01", "2024-01-02", "2024-01-03").zipWithIndex.foreach { case (d, i) =>
      graft.streaming.VersionedStream.commitBatch(
        snap(d, (i + 1).toLong -> (i * 1.0)), i.toLong, root, statsCols = Seq("day"))
    }
    // replay of batch 1 must stay a no-op (ledger wins) with stats intact
    graft.streaming.VersionedStream.commitBatch(
      snap("2024-01-02", 99L -> 99.0), 1L, root, statsCols = Seq("day"))
    assert(VersionedStore.currentVersion(spark, root) === 3L)
    val kept = VersionedStore.prunedDirs(spark, root, 3L,
      Seq(VersionedStore.ColRange.eq("day", "2024-01-02")))
    assert(kept.size === 1, s"point read must open one streamed batch dir, got ${kept.size}")
    val rows = VersionedStore.readAt(spark, root, 3L,
        Seq(VersionedStore.ColRange.eq("day", "2024-01-02"))).collect()
    assert(rows.length === 1 && rows.head.getAs[Long]("user_id") === 2L)
  }

  test("schema evolution never merges TYPES: a type conflict fails at commit even with mergeSchema") {
    val root = tmp()
    VersionedStore.commitAppend(snap("2024-01-01", 1L -> 1.0), root)
    val conflicted = Seq(("2024-01-02", "not-a-long", 2.0))
      .toDF("day", "user_id", "value")
    val e = intercept[IllegalArgumentException] {
      VersionedStore.commitAppend(conflicted, root, mergeSchema = true)
    }
    assert(e.getMessage.contains("user_id") && e.getMessage.toLowerCase.contains("type"),
      s"must fail loudly at COMMIT, naming the conflicting column: ${e.getMessage}")
    assert(VersionedStore.currentVersion(spark, root) === 1L)
    // and the read path never saw it — no read-time union error possible
    assert(VersionedStore.read(spark, root).get.count() === 1)
  }

  test("optimize re-clusters into bucketed dirs: row-exact, and BOTH z-order dimensions prune") {
    import org.apache.spark.sql.functions.{col, lit, datediff, to_date}
    val root = tmp()
    // 12 scattered appends: every append spans ALL users and ALL days, so
    // before optimize NO single-column predicate can prune anything.
    val days = (1 to 4).map(d => f"2024-01-$d%02d")
    (0 until 12).foreach { i =>
      val rows = for (d <- days; u <- 0L until 8L)
        yield (d, u * 100 + i, (u * 100 + i).toDouble)
      VersionedStore.commitAppend(
        rows.toDF("day", "user_id", "value"), root, statsCols = Seq("day", "user_id"))
    }
    val before = VersionedStore.read(spark, root).get
      .orderBy("day", "user_id").collect()
    val probe = Seq(VersionedStore.ColRange.eq("day", "2024-01-02"),
      VersionedStore.ColRange("user_id", Some("100"), Some("115")))
    assert(VersionedStore.prunedDirs(spark, root, 12L, probe).size === 12,
      "pre-optimize layout must be unprunable (every append spans everything)")

    val zkey = graft.functions.ZOrder.zorder_key(
      col("user_id"),
      datediff(to_date(col("day").cast("string")), lit("1970-01-01").cast("date")).cast("long"))
    val v = VersionedStore.optimize(spark, root, zkey, buckets = 8,
      statsCols = Seq("day", "user_id"))
    assert(v === 13L)

    // row-exact rewrite
    val after = VersionedStore.read(spark, root).get
      .orderBy("day", "user_id").collect()
    assert(after.toSeq === before.toSeq, "optimize must be a row-exact rewrite")

    // the clustered layout prunes on the combined predicate AND on the
    // leading dimension alone
    val kept = VersionedStore.prunedDirs(spark, root, v, probe)
    assert(kept.size < 8 && kept.nonEmpty,
      s"z-clustered dirs must prune the 2-col point read, kept ${kept.size}/8")
    val userOnly = VersionedStore.prunedDirs(spark, root, v,
      Seq(VersionedStore.ColRange("user_id", Some("700"), Some("711"))))
    assert(userOnly.size < 8,
      s"the user dimension alone must prune too, kept ${userOnly.size}/8")
    // and a predicated READ over the pruned dirs returns exactly the rows
    val got = VersionedStore.readAt(spark, root, v, probe)
      .filter(col("day") === lit("2024-01-02").cast("date") &&
        col("user_id").between(100, 115))
      .collect()
    assert(got.length === 12, s"skip is an access path, never a filter: ${got.length}")
  }

  test("deleteWhere rewrites ONLY dirs with matches; untouched dirs carried by reference, stats intact") {
    import org.apache.spark.sql.functions.col
    val root = tmp()
    (1 to 5).foreach { d =>
      VersionedStore.commitAppend(
        snap(f"2024-01-$d%02d", (d * 10L) -> 1.0, (d * 10L + 1) -> 2.0),
        root, statsCols = Seq("day"))
    }
    val dirsBefore = (1 to 5).map(v => VersionedStore.history(spark, root)(v - 1))
    // Delete one user's rows on one day, pruned by the day stats: only
    // the 2024-01-03 dir may be rewritten.
    val v = VersionedStore.deleteWhere(spark, root,
      col("user_id") === 30L && col("day") === "2024-01-03",
      prune = Seq(VersionedStore.ColRange.eq("day", "2024-01-03")),
      statsCols = Seq("day"))
    assert(v === 6L)
    val rows = VersionedStore.read(spark, root).get.orderBy("user_id").collect()
    assert(rows.map(_.getAs[Long]("user_id")).toSeq
      === Seq(10L, 11L, 20L, 21L, 31L, 40L, 41L, 50L, 51L),
      "exactly the matching row leaves; NULL/false rows and other days survive")
    // dir-level copy-on-write: 4 of 5 original dirs carried by REFERENCE
    val after = VersionedStore.prunedDirs(spark, root, v, Seq.empty).toSet
    val original = dirsBefore.map(_._2).toSet
    assert(after.intersect(original).size === 4,
      s"4 untouched dirs must be carried by reference, got ${after.intersect(original).size}")
    // carried stats still prune, fresh stats cover the rewritten dir
    val kept = VersionedStore.prunedDirs(spark, root, v,
      Seq(VersionedStore.ColRange.eq("day", "2024-01-04")))
    assert(kept.size === 1, "carried-forward stats must still skip")
    // time travel: the pre-delete version still holds the row
    assert(VersionedStore.readAt(spark, root, 5L).filter(col("user_id") === 30L).count() === 1L)
  }

  test("deleteWhere: no-match is a version-less no-op; NULL predicate keeps; all-matched dir is dropped") {
    import org.apache.spark.sql.functions.col
    val root = tmp()
    VersionedStore.commitAppend(snap("2024-01-01", 1L -> 1.0), root, statsCols = Seq("day"))
    VersionedStore.commitAppend(Seq[(String, java.lang.Long, Double)](
      ("2024-01-02", 2L, 2.0), ("2024-01-02", null, 3.0))
      .toDF("day", "user_id", "value"), root, statsCols = Seq("day"))
    // no-op: stats prune everything, nothing commits
    assert(VersionedStore.deleteWhere(spark, root, col("user_id") === 99L,
      prune = Seq(VersionedStore.ColRange.eq("day", "2024-03-01"))) === 2L)
    assert(VersionedStore.currentVersion(spark, root) === 2L)
    // stats overlap but no actual match: existence probe stops the rewrite
    assert(VersionedStore.deleteWhere(spark, root, col("user_id") === 99L) === 2L)
    assert(VersionedStore.currentVersion(spark, root) === 2L)
    // user_id > 0 is NULL for the null row: SQL DELETE keeps it
    val v = VersionedStore.deleteWhere(spark, root, col("user_id") > 0L)
    assert(v === 3L)
    val left = VersionedStore.read(spark, root).get.collect()
    assert(left.length === 1 && left.head.isNullAt(left.head.fieldIndex("user_id")),
      "NULL-predicate rows are kept; every TRUE row is gone, so day-01's dir is dropped")
    assert(VersionedStore.prunedDirs(spark, root, v, Seq.empty).size === 1,
      "the fully-matched dir must leave the snapshot, not persist as an empty rewrite")
  }

  test("countWhere: fully-contained dirs answer from the manifest ALONE — proven by deleting their bytes") {
    val root = tmp()
    (1 to 4).foreach { d =>
      VersionedStore.commitAppend(
        snap(f"2024-01-$d%02d", (d * 10L) -> 1.0, (d * 10L + 1) -> 2.0),
        root, statsCols = Seq("day", "user_id"))
    }
    // Aligned range = whole dirs: both the empty-ranges whole-table count
    // and the day-02..03 count must be metadata-only.
    assert(VersionedStore.countWhere(spark, root) === 8L)
    val aligned = Seq(VersionedStore.ColRange("day", Some("2024-01-02"), Some("2024-01-03")))
    val (meta, residual) = VersionedStore.countPlan(spark, root, aligned)
    assert(meta.size === 2 && residual.isEmpty,
      s"aligned range must be fully manifest-answered, got meta=$meta residual=$residual")
    assert(VersionedStore.countWhere(spark, root, aligned) === 4L)
    // THE proof that no data is read: destroy the contained dirs' bytes;
    // the metadata count still answers. (Destructive — spec-only.)
    meta.foreach { d =>
      val p = new org.apache.hadoop.fs.Path(s"$root/$d")
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
    assert(VersionedStore.countWhere(spark, root, aligned) === 4L,
      "a fully-contained count must never open the data")
    // A range cutting INTO a surviving dir goes residual and reads it.
    val partial = Seq(VersionedStore.ColRange("user_id", Some("40"), Some("40")))
    val (m2, r2) = VersionedStore.countPlan(spark, root, partial)
    assert(m2.isEmpty && r2.size === 1, s"user 40 cuts into day-04's dir: $m2 / $r2")
    assert(VersionedStore.countWhere(spark, root, partial) === 1L)
  }

  test("countWhere: NULLs force the residual path (manifest min/max says nothing about NULLs)") {
    val root = tmp()
    VersionedStore.commitAppend(Seq[(String, java.lang.Long, Double)](
      ("2024-01-01", 1L, 1.0), ("2024-01-01", null, 2.0))
      .toDF("day", "user_id", "value"), root, statsCols = Seq("day", "user_id"))
    VersionedStore.commitAppend(snap("2024-01-02", 5L -> 5.0), root,
      statsCols = Seq("day", "user_id"))
    // user_id 1..5 covers both dirs, but dir 1 has a NULL user: a
    // metadata count would wrongly include it — must go residual.
    val range = Seq(VersionedStore.ColRange("user_id", Some("1"), Some("5")))
    val (meta, residual) = VersionedStore.countPlan(spark, root, range)
    assert(residual.size === 1 && meta.size === 1,
      s"the NULL-carrying dir must be residual: meta=$meta residual=$residual")
    assert(VersionedStore.countWhere(spark, root, range) === 2L,
      "NULL never satisfies a range: the NULL row is excluded by the read-side predicate")
    // A store that predates count recording (no stats at all) still
    // counts correctly — everything residual.
    val legacy = tmp()
    VersionedStore.commitAppend(snap("2024-01-01", 1L -> 1.0, 2L -> 2.0), legacy)
    assert(VersionedStore.countWhere(spark, legacy,
      Seq(VersionedStore.ColRange("user_id", Some("2"), Some("9")))) === 1L)
  }

  test("updateWhere: SET sees pre-update rows, only matching dirs rewrite, unknown SET column throws") {
    val root = tmp()
    (1 to 3).foreach { d =>
      VersionedStore.commitAppend(snap(f"2024-01-$d%02d", (d * 10L) -> 1.0),
        root, statsCols = Seq("day"))
    }
    val before = VersionedStore.prunedDirs(spark, root, 3L, Seq.empty).toSet
    // Two assignments referencing each other's OLD values: standard
    // UPDATE evaluates both against the pre-update row, so a swap works.
    val v = VersionedStore.updateWhere(spark, root,
      col("day") === "2024-01-02",
      set = Map("value" -> (col("value") + col("user_id")),
        "user_id" -> (col("user_id") + lit(100L))),
      prune = Seq(VersionedStore.ColRange.eq("day", "2024-01-02")),
      statsCols = Seq("day"))
    assert(v === 4L)
    val after = VersionedStore.prunedDirs(spark, root, v, Seq.empty).toSet
    assert(after.intersect(before).size === before.size - 1,
      "only day-02's dir may be rewritten")
    val got = VersionedStore.read(spark, root).get.orderBy("user_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("value"))).toSeq
    assert(got === Seq(10L -> 1.0, 30L -> 1.0, 120L -> 21.0),
      "value must see the OLD user_id (20), not the updated one")
    // NULL predicate keeps (SQL UPDATE); no-match is a version-less no-op.
    assert(VersionedStore.updateWhere(spark, root,
      col("day") === lit(null).cast("string"),
      set = Map("value" -> lit(0.0))) === v)
    val e = intercept[IllegalArgumentException](
      VersionedStore.updateWhere(spark, root, col("day") === "2024-01-01",
        set = Map("no_such" -> lit(1))))
    assert(e.getMessage.contains("not in the recorded schema"))
  }

  test("restore: manifest-only commit references the old version's dirs; history survives; expire keeps them") {
    val root = tmp()
    val v1 = VersionedStore.commitAppend(snap("2024-01-01", 1L -> 1.0), root)
    VersionedStore.commitAppend(snap("2024-01-02", 2L -> 2.0), root)
    VersionedStore.commit(snap("2024-01-03", 3L -> 333.0), root) // bad rewrite
    assert(VersionedStore.read(spark, root).get.count() === 1L)
    val v4 = VersionedStore.restore(spark, root, 2L)
    assert(v4 === 4L)
    // Byte-identical snapshot, by REFERENCE: v4 lists exactly v2's dirs.
    assert(VersionedStore.prunedDirs(spark, root, v4, Seq.empty) ===
      VersionedStore.prunedDirs(spark, root, 2L, Seq.empty))
    val got = VersionedStore.read(spark, root).get.orderBy("user_id").collect()
      .map(_.getAs[Double]("value")).toSeq
    assert(got === Seq(1.0, 2.0))
    // The bad version stays time-travelable; restore-to-current no-ops.
    assert(VersionedStore.readAt(spark, root, 3L).collect()
      .head.getAs[Double]("value") === 333.0)
    assert(VersionedStore.restore(spark, root, v4) === v4)
    // Expire to the last 2 versions: the restore's referenced dirs (from
    // v1/v2's appends) must survive the sweep because v4 references them.
    VersionedStore.expire(spark, root, keepLast = 2)
    assert(VersionedStore.read(spark, root).get.count() === 2L)
    intercept[IllegalArgumentException](VersionedStore.readAt(spark, root, v1))
  }

  test("mergeInto: upsert rewrites ONLY the matched dir, inserts land as one new dir, old version time-travels") {
    val root = tmp()
    (1 to 4).foreach { d =>
      VersionedStore.commitAppend(
        snap(f"2024-01-$d%02d", (d * 10L) -> 1.0, (d * 10L + 1) -> 2.0),
        root, statsCols = Seq("day", "user_id"))
    }
    val before = VersionedStore.prunedDirs(spark, root, 4L, Seq.empty).toSet
    // user 21 exists (day-02 dir): update to 99.0; user 77 is new: insert.
    val src = Seq(("2024-01-02", 21L, 99.0), ("2024-02-01", 77L, 7.0))
      .toDF("day", "user_id", "value")
    val v = VersionedStore.mergeInto(spark, root, src, Seq("user_id"),
      statsCols = Seq("day", "user_id"))
    assert(v === 5L)
    val after = VersionedStore.prunedDirs(spark, root, v, Seq.empty).toSet
    // Derived key range [21, 77] overlaps dirs 2..4 but only day-02's dir
    // holds a match: exactly one of the four original dirs is rewritten.
    assert(after.intersect(before).size === before.size - 1,
      s"one dir rewritten, got carried ${after.intersect(before).size}/${before.size}")
    val got = VersionedStore.read(spark, root).get
      .orderBy("user_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("value"))).toSeq
    assert(got === Seq(10L -> 1.0, 11L -> 2.0, 20L -> 1.0, 21L -> 99.0,
      30L -> 1.0, 31L -> 2.0, 40L -> 1.0, 41L -> 2.0, 77L -> 7.0))
    // Time travel: version 4 still shows the pre-merge row.
    val old = VersionedStore.readAt(spark, root, 4L)
      .filter(col("user_id") === 21L).collect()
    assert(old.head.getAs[Double]("value") === 2.0)
    // The rewritten + inserted dirs carry fresh stats: a point read of
    // the new user prunes to one dir.
    val pr = VersionedStore.prunedDirs(spark, root, v,
      Seq(VersionedStore.ColRange.eq("user_id", "77")))
    assert(pr.size === 1, s"insert dir must be stats-addressable, got $pr")
  }

  test("mergeInto: pure-insert merge touches nothing and stays a clean append for the change feed") {
    val root = tmp()
    (1 to 3).foreach { d =>
      VersionedStore.commitAppend(snap(f"2024-01-$d%02d", (d * 10L) -> 1.0),
        root, statsCols = Seq("user_id"))
    }
    val before = VersionedStore.prunedDirs(spark, root, 3L, Seq.empty).toSet
    val src = Seq(("2024-03-01", 900L, 9.0)).toDF("day", "user_id", "value")
    val v = VersionedStore.mergeInto(spark, root, src, Seq("user_id"),
      statsCols = Seq("user_id"))
    val after = VersionedStore.prunedDirs(spark, root, v, Seq.empty).toSet
    assert(before.subsetOf(after), "no original dir may be rewritten")
    // Change feed across the pure-insert merge: exactly the batch.
    val changes = VersionedStore.readChanges(spark, root, sinceVersion = 3L).get.collect()
    assert(changes.length === 1 && changes.head.getAs[Long]("user_id") === 900L)
  }

  test("mergeInto guards: duplicate source keys throw; NULL keys insert without matching; empty source no-ops") {
    val root = tmp()
    VersionedStore.commitAppend(Seq[(String, java.lang.Long, Double)](
      ("2024-01-01", 1L, 1.0), ("2024-01-01", null, 5.0))
      .toDF("day", "user_id", "value"), root, statsCols = Seq("user_id"))
    // Two source rows updating user 1 is ambiguous.
    val dup = Seq(("2024-01-02", 1L, 2.0), ("2024-01-03", 1L, 3.0))
      .toDF("day", "user_id", "value")
    val e = intercept[IllegalArgumentException](
      VersionedStore.mergeInto(spark, root, dup, Seq("user_id")))
    assert(e.getMessage.contains("duplicate"))
    // NULL-keyed source row inserts; NULL-keyed target row survives; two
    // NULL-keyed source rows are NOT duplicates (they never match).
    val src = Seq[(String, java.lang.Long, Double)](
      ("2024-01-02", null, 6.0), ("2024-01-02", null, 7.0), ("2024-01-02", 1L, 2.0))
      .toDF("day", "user_id", "value")
    val v = VersionedStore.mergeInto(spark, root, src, Seq("user_id"))
    val vals = VersionedStore.read(spark, root).get.collect()
      .map(_.getAs[Double]("value")).sorted.toSeq
    assert(vals === Seq(2.0, 5.0, 6.0, 7.0),
      "user 1 updated; NULL target kept; both NULL sources inserted")
    // Empty source: no new version.
    val v2 = VersionedStore.mergeInto(spark, root,
      src.limit(0), Seq("user_id"))
    assert(v2 === v)
    // Delta's scoping: duplicates that match NO target row are legal and
    // insert as distinct NOT-MATCHED rows (only dup-meets-target is
    // ambiguous).
    val dupNew = Seq(("2024-01-02", 77L, 8.0), ("2024-01-03", 77L, 9.0))
      .toDF("day", "user_id", "value")
    VersionedStore.mergeInto(spark, root, dupNew, Seq("user_id"))
    assert(VersionedStore.read(spark, root).get
      .filter($"user_id" === 77L).count() === 2L,
      "non-matching duplicate keys must both insert")
  }

  test("mergeInto: schema drift rejected by default, additive with mergeSchema; type conflict always throws") {
    val root = tmp()
    VersionedStore.commitAppend(snap("2024-01-01", 1L -> 1.0), root)
    val drifted = Seq(("2024-01-02", 1L, 2.0, "x"))
      .toDF("day", "user_id", "value", "tag")
    intercept[IllegalArgumentException](
      VersionedStore.mergeInto(spark, root, drifted, Seq("user_id")))
    val v = VersionedStore.mergeInto(spark, root, drifted, Seq("user_id"),
      mergeSchema = true)
    val rows = VersionedStore.readAt(spark, root, v).collect()
    assert(rows.length === 1 && rows.head.getAs[String]("tag") === "x")
    val conflict = Seq(("2024-01-03", 1L, "not-a-double", "y"))
      .toDF("day", "user_id", "value", "tag")
    intercept[IllegalArgumentException](
      VersionedStore.mergeInto(spark, root, conflict, Seq("user_id"),
        mergeSchema = true))
  }

  test("optimize survives skew and NULL cluster keys; change feed across it refuses dir-level diff") {
    import org.apache.spark.sql.functions.col
    val root = tmp()
    // all-equal keys (quantiles collapse) + NULL keys (must ride bucket 0)
    val rows = Seq[(String, java.lang.Long, Double)](
      ("2024-01-01", 5L, 1.0), ("2024-01-01", 5L, 2.0),
      ("2024-01-01", null, 3.0), ("2024-01-01", 5L, 4.0))
      .toDF("day", "user_id", "value")
    VersionedStore.commitAppend(rows, root)
    val v = VersionedStore.optimize(spark, root, col("user_id"), buckets = 4)
    val vals = VersionedStore.read(spark, root).get
      .collect().map(_.getAs[Double]("value")).sorted.toSeq
    assert(vals === Seq(1.0, 2.0, 3.0, 4.0),
      "collapsed quantiles and NULL keys must lose no rows")
    val e = intercept[IllegalStateException] {
      VersionedStore.readChanges(spark, root, sinceVersion = 1L, toVersion = v)
    }
    assert(e.getMessage.contains("snapshot rewrite"),
      "a range spanning an optimize has no dir-level change feed")
  }

  test("ledger survives DML: a replayed batch after DELETE/UPDATE/MERGE/OPTIMIZE never double-appends") {
    import graft.streaming.VersionedStream
    val root = tmp()
    // A stream-maintained store: foreachBatch is at-least-once on crash
    // recovery, so after ANY maintenance commit a replay of the last batch
    // may arrive. The table-side ledger must survive that commit.
    VersionedStream.commitBatch(snap("2024-01-01", 1L -> 1.0, 2L -> 2.0), 0L, root)
    VersionedStream.commitBatch(snap("2024-01-02", 3L -> 3.0, 4L -> 4.0), 1L, root)
    def rows() = VersionedStore.read(spark, root).get.count()
    def replay() =
      VersionedStream.commitBatch(snap("2024-01-02", 3L -> 3.0, 4L -> 4.0), 1L, root)

    VersionedStore.deleteWhere(spark, root, col("user_id") === 2L)
    val n1 = rows(); replay()
    assert(rows() === n1, "replay after deleteWhere must be skipped by the carried ledger")

    VersionedStore.updateWhere(spark, root, col("user_id") === 1L,
      set = Map("value" -> lit(9.0)))
    val n2 = rows(); replay()
    assert(rows() === n2, "replay after updateWhere must be skipped")

    VersionedStore.mergeInto(spark, root,
      snap("2024-01-03", 5L -> 5.0), keys = Seq("user_id"))
    val n3 = rows(); replay()
    assert(rows() === n3, "replay after mergeInto must be skipped")

    VersionedStore.optimize(spark, root, col("user_id"), buckets = 2)
    val n4 = rows(); replay()
    assert(rows() === n4, "replay after optimize must be skipped")

    // The ledger was carried, not frozen: a genuinely NEW batch still lands.
    VersionedStream.commitBatch(snap("2024-01-04", 6L -> 6.0), 2L, root)
    assert(rows() === n4 + 1, "a new batch id must still append after DML")

    // Descriptive markers do NOT accumulate: every commit's meta carries
    // the LEDGER entries plus its OWN marker only — after the streaming
    // append above, none of the earlier DML/optimize markers survive
    // (they described those commits, not this one).
    val m = VersionedStore.currentMeta(spark, root)
    assert(m("batch.default") === "2")
    Seq("delete", "update", "merge", "optimize", "compact").foreach { k =>
      assert(!m.contains(k),
        s"stale descriptive marker '$k' must not ride later commits: $m")
    }
  }

  test("restore keeps the CURRENT ledger watermark, not the restored version's") {
    import graft.streaming.VersionedStream
    val root = tmp()
    VersionedStream.commitBatch(snap("2024-01-01", 1L -> 1.0), 0L, root) // v1: ledger 0
    VersionedStream.commitBatch(snap("2024-01-02", 2L -> 2.0), 1L, root) // v2: ledger 1
    VersionedStore.restore(spark, root, 1L) // rows of v1, but batch 1 WAS delivered
    assert(VersionedStore.currentMeta(spark, root)("batch.default") === "1",
      "restore must not regress the replay watermark to the restored version's")
    val n = VersionedStore.read(spark, root).get.count()
    VersionedStream.commitBatch(snap("2024-01-02", 2L -> 2.0), 1L, root)
    assert(VersionedStore.read(spark, root).get.count() === n,
      "a replay of the deliberately-restored-away batch must stay a no-op")
  }

  test("diff: any version pair audits as multiset insert/delete rows; schema evolution aligns NULLs") {
    val root = tmp()
    VersionedStore.commitAppend(snap("2024-01-01", 1L -> 1.0, 2L -> 2.0), root)
    VersionedStore.commitAppend(snap("2024-01-02", 3L -> 3.0), root)
    // an append range diffs as pure inserts (the change feed's content)
    val d12 = VersionedStore.diff(spark, root, 1L, 2L).collect()
    assert(d12.length === 1 && d12.head.getAs[String]("__change") === "insert")
    assert(d12.head.getAs[Long]("user_id") === 3L)
    // an UPDATE audits as its delete + its insert
    VersionedStore.updateWhere(spark, root, col("user_id") === 2L,
      set = Map("value" -> lit(9.0)))
    val d23 = VersionedStore.diff(spark, root, 2L, 3L)
    val ins = d23.filter(col("__change") === "insert").collect()
    val del = d23.filter(col("__change") === "delete").collect()
    assert(ins.length === 1 && ins.head.getAs[Double]("value") === 9.0)
    assert(del.length === 1 && del.head.getAs[Double]("value") === 2.0)
    // schema evolution: the old side reads the added column as NULL
    VersionedStore.commitAppend(
      snap("2024-01-03", 4L -> 4.0).withColumn("tag", lit("x")),
      root, mergeSchema = true)
    val d34 = VersionedStore.diff(spark, root, 3L, 4L).collect()
    assert(d34.length === 1 && d34.head.getAs[String]("tag") === "x")
    // a reversed pair flips insert/delete roles
    val d43 = VersionedStore.diff(spark, root, 4L, 3L).collect()
    assert(d43.length === 1 && d43.head.getAs[String]("__change") === "delete")
    // a SCOPE covering the changes equals the unscoped audit; skip
    // without the matching predicate is rejected (one-sided pruning
    // would fabricate changes)
    val scoped = VersionedStore.diff(spark, root, 2L, 3L,
      scope = Some(col("user_id") === 2L)).collect()
    assert(scoped.length === 2, "scope covering the changes = full audit")
    intercept[IllegalArgumentException] {
      VersionedStore.diff(spark, root, 2L, 3L,
        skip = Seq(VersionedStore.ColRange.eq("user_id", "2")))
    }
  }

  test("verifyPrune: a wrong prune assertion fails loudly BEFORE any rewrite; a sound one passes") {
    val root = tmp()
    VersionedStore.commitAppend(snap("2024-01-01", 1L -> 1.0, 2L -> 2.0), root,
      statsCols = Seq("user_id"))
    VersionedStore.commitAppend(snap("2024-01-02", 10L -> 1.0, 20L -> 2.0), root,
      statsCols = Seq("user_id"))
    val before = VersionedStore.currentVersion(spark, root)
    // value==1.0 matches rows in BOTH dirs, but the prune claims dir 1 only.
    val wrong = Seq(VersionedStore.ColRange("user_id", Some("1"), Some("2")))
    val e = intercept[IllegalStateException] {
      VersionedStore.deleteWhere(spark, root, col("value") === 1.0,
        prune = wrong, verifyPrune = true)
    }
    assert(e.getMessage.contains("prune"), s"unexpected: ${e.getMessage}")
    assert(VersionedStore.currentVersion(spark, root) === before,
      "a failed prune verification must commit nothing")
    // Without verification the wrong prune is the documented hazard:
    // the excluded dir's matching row survives.
    VersionedStore.deleteWhere(spark, root, col("value") === 1.0, prune = wrong)
    assert(VersionedStore.read(spark, root).get
      .filter(col("value") === 1.0).count() === 1L,
      "documented: a wrong unverified prune leaves matches outside its ranges")
    // A sound prune under verification deletes the remainder.
    VersionedStore.deleteWhere(spark, root, col("value") === 1.0,
      prune = Seq(VersionedStore.ColRange("user_id", Some("10"), Some("10"))),
      verifyPrune = true)
    assert(VersionedStore.read(spark, root).get
      .filter(col("value") === 1.0).count() === 0L)
  }

  test("mergeIntoClauses (Scala API): t./s. alias contract, first-match-" +
       "wins, untouched dirs carried, assignment casts to recorded type") {
    import graft.sinks.VersionedStore.MergeMatched
    import org.apache.spark.sql.functions.expr
    val root = tmp()
    // two dirs: users 1-2 (day 1), users 3-4 (day 2)
    VersionedStore.commitAppend(snap("2024-01-01", 1L -> 1.0, 2L -> 2.0),
      root, statsCols = Seq("user_id"))
    VersionedStore.commitAppend(snap("2024-01-02", 3L -> 3.0, 4L -> 4.0),
      root, statsCols = Seq("user_id"))
    val dirs0 = VersionedStore.prunedDirs(spark, root, 2L, Seq.empty).toSet
    // source touches ONLY dir 1 (keys 1, 2): key 1 updates via the
    // s-side value (an INT source column — the cast-to-recorded-type
    // seam), key 2 deletes; no insert clause
    val src = Seq((1L, 10), (2L, 0)).toDF("user_id", "boost")
    val v = VersionedStore.mergeIntoClauses(spark, root, src,
      keys = Seq("user_id"),
      matched = Seq(
        MergeMatched.Update(Some(expr("s.boost > 0")),
          Map("value" -> expr("t.value + s.boost"))),
        MergeMatched.Delete(None)),
      insertNotMatched = None,
      statsCols = Seq("user_id"))
    assert(v === 3L)
    val got = VersionedStore.read(spark, root).get
      .select("user_id", "value").as[(Long, Double)].collect().toSeq.sorted
    assert(got === Seq((1L, 11.0), (3L, 3.0), (4L, 4.0)), s"got $got")
    // the day-2 dir (keys 3, 4) must carry by reference — never rewritten
    val dirs1 = VersionedStore.prunedDirs(spark, root, 3L, Seq.empty).toSet
    assert(dirs0.intersect(dirs1).size === 1,
      s"exactly the untouched dir carries: before=$dirs0 after=$dirs1")
    // schema unchanged (the INT assignment cast to the recorded DOUBLE)
    assert(VersionedStore.read(spark, root).get.schema("value").dataType
      === org.apache.spark.sql.types.DoubleType)
    // a no-effect merge (no matching keys, no insert clause) is a no-op
    val v2 = VersionedStore.mergeIntoClauses(spark, root,
      Seq((99L, 1)).toDF("user_id", "boost"), Seq("user_id"),
      Seq(MergeMatched.Delete(None)), None)
    assert(v2 === 3L, "a merge touching nothing must not commit")
  }

  test("mergeIntoClauses BY SOURCE: conditional probe bounds the rewrite, " +
       "unmatched rows take first applicable clause, t-only references " +
       "enforced, empty source applies clauses to every target row") {
    import graft.sinks.VersionedStore.{MergeInsert, MergeMatched}
    import org.apache.spark.sql.functions.expr
    val root = tmp()
    // two dirs: users 1-2 (day 1), users 3-4 (day 2); user_id stats
    VersionedStore.commitAppend(snap("2024-01-01", 1L -> 1.0, 2L -> 2.0),
      root, statsCols = Seq("user_id"))
    VersionedStore.commitAppend(snap("2024-01-02", 3L -> 3.0, 4L -> 4.0),
      root, statsCols = Seq("user_id"))
    val dirs0 = VersionedStore.prunedDirs(spark, root, 2L, Seq.empty).toSet
    // source matches user 3 only; BY SOURCE clauses scoped by condition
    // to user 2 (UPDATE) — first-match-wins tested by a dead DELETE with
    // a disjoint condition behind it; user 1/4 untouched by conditions
    val src = Seq((3L, 5)).toDF("user_id", "boost")
    val v = VersionedStore.mergeIntoClauses(spark, root, src,
      keys = Seq("user_id"),
      matched = Seq(MergeMatched.Update(None,
        Map("value" -> expr("t.value + s.boost")))),
      insertNotMatched = None,
      notMatchedBySource = Seq(
        MergeMatched.Update(Some(expr("t.user_id = 2")),
          Map("value" -> expr("t.value * 100"))),
        MergeMatched.Delete(Some(expr("t.user_id = 2")))), // dead: first wins
      statsCols = Seq("user_id"))
    assert(v === 3L)
    val got = VersionedStore.read(spark, root).get
      .select("user_id", "value").as[(Long, Double)].collect().toSeq.sorted
    assert(got === Seq((1L, 1.0), (2L, 200.0), (3L, 8.0), (4L, 4.0)),
      s"matched update + BY SOURCE conditional update: $got")
    // both dirs rewrote here (dir1 via the BY SOURCE probe, dir2 via the
    // key probe) — now prove the CONDITIONAL probe carries a dir whose
    // rows can't pass: BY SOURCE scoped to user 2, source matching user 2
    // (so dir1 rewrites via keys) — the day-2 dir must carry by reference
    val dirsNow = VersionedStore.prunedDirs(spark, root, 3L, Seq.empty).toSet
    val v2 = VersionedStore.mergeIntoClauses(spark, root,
      Seq((2L, 1)).toDF("user_id", "boost"), Seq("user_id"),
      matched = Seq(MergeMatched.Delete(None)),
      insertNotMatched = None,
      notMatchedBySource = Seq(MergeMatched.Delete(Some(expr("t.user_id = -1")))),
      statsCols = Seq("user_id"))
    assert(v2 === 4L)
    val dirsAfter = VersionedStore.prunedDirs(spark, root, 4L, Seq.empty).toSet
    assert(dirsNow.intersect(dirsAfter).nonEmpty,
      "a dir with no matching keys and no condition-passing rows must " +
        s"carry by reference: before=$dirsNow after=$dirsAfter")
    assert(VersionedStore.read(spark, root).get.count() === 3L,
      "only user 2 deleted")
    // s. references in BY SOURCE clauses are rejected loudly
    val eS = intercept[IllegalArgumentException] {
      VersionedStore.mergeIntoClauses(spark, root, src, Seq("user_id"),
        Seq.empty, None,
        notMatchedBySource = Seq(MergeMatched.Delete(Some(expr("s.boost > 0")))))
    }
    assert(eS.getMessage.contains("target (t.) columns only"))
    // EMPTY source + BY SOURCE: every target row is unmatched (Delta's
    // contract) — the conditional update reaches all rows passing it
    val v3 = VersionedStore.mergeIntoClauses(spark, root,
      src.limit(0), Seq("user_id"),
      matched = Seq.empty, insertNotMatched = None,
      notMatchedBySource = Seq(MergeMatched.Update(
        Some(expr("t.value > 5")), Map("value" -> expr("t.value - 1")))),
      statsCols = Seq("user_id"))
    assert(v3 === 5L)
    val got3 = VersionedStore.read(spark, root).get
      .select("user_id", "value").as[(Long, Double)].collect().toSeq.sorted
    assert(got3 === Seq((1L, 1.0), (3L, 7.0), (4L, 4.0)), s"got $got3")
    // empty source + all-conditions-fail BY SOURCE: version-less no-op
    val v4 = VersionedStore.mergeIntoClauses(spark, root,
      src.limit(0), Seq("user_id"),
      Seq.empty, None,
      notMatchedBySource = Seq(MergeMatched.Delete(Some(expr("t.user_id = -1")))))
    assert(v4 === 5L, "nothing applied — no commit")
  }

  test("BY-SOURCE-only merge: duplicate source keys matching a target row " +
       "must not fan the row out (the rewrite joins DISTINCT key tuples " +
       "when no matched clause reads the pair)") {
    import graft.sinks.VersionedStore.MergeMatched
    import org.apache.spark.sql.functions.expr
    val root = tmp()
    VersionedStore.commitAppend(snap("2024-01-01", 1L -> 1.0, 2L -> 2.0),
      root, statsCols = Seq("user_id"))
    // user 1 appears THREE times in the source — legal under Delta when
    // no matched clause exists; the committed table must still hold
    // exactly one copy of user 1 (and user 2 deleted by the BY SOURCE
    // clause, which proves the dir actually rewrote)
    val src = Seq((1L, 5), (1L, 6), (1L, 7)).toDF("user_id", "boost")
    val v = VersionedStore.mergeIntoClauses(spark, root, src,
      keys = Seq("user_id"),
      matched = Seq.empty, insertNotMatched = None,
      notMatchedBySource = Seq(MergeMatched.Delete(None)),
      statsCols = Seq("user_id"))
    assert(v === 2L)
    val got = VersionedStore.read(spark, root).get
      .select("user_id", "value").as[(Long, Double)].collect().toSeq.sorted
    assert(got === Seq((1L, 1.0)),
      s"duplicate source keys fanned out / BY SOURCE missed: $got")
  }

  test("BY SOURCE existence probe is stats-bounded: clause conditions " +
       "derive ColRanges that prune non-overlapping dirs before any probe " +
       "leg opens — soundly (pruned dirs provably hold no passing row), " +
       "with keep-all fallbacks for underivable or unsound shapes") {
    import graft.sinks.VersionedStore.MergeMatched
    import org.apache.spark.sql.functions.expr
    val root = tmp()
    // three dirs with disjoint user_id decades, min/max stats recorded
    VersionedStore.commitAppend(snap("2024-01-01", 1L -> 1.0, 2L -> 2.0),
      root, statsCols = Seq("user_id"))
    VersionedStore.commitAppend(snap("2024-01-02", 11L -> 1.0, 12L -> 2.0),
      root, statsCols = Seq("user_id"))
    VersionedStore.commitAppend(snap("2024-01-03", 21L -> 1.0, 22L -> 2.0),
      root, statsCols = Seq("user_id"))
    val all = VersionedStore.prunedDirs(spark, root, 3L, Seq.empty)
    val stats = VersionedStore.statsAt(spark, root, 3L)
    val recorded = org.apache.spark.sql.types.StructType.fromDDL(
      VersionedStore.schemaAt(spark, root, 3L).get)
    val cond = expr("user_id >= 11 AND user_id <= 12") // stripped form
    val probeSet =
      VersionedStore.bySourceProbeSet(all, stats, Seq(cond), recorded, Map.empty)
    assert(probeSet.size === 1,
      s"stats must bound the probe to the middle dir, got $probeSet of $all")
    // soundness proof, verifyPrune-style: the pruned-out dirs hold no
    // condition-passing row under the REAL predicate
    val escaped = VersionedStore.probeMatching(spark, root,
      all.filterNot(probeSet.contains), cond,
      VersionedStore.schemaAt(spark, root, 3L), Map.empty)
    assert(escaped.isEmpty, s"pruned dirs held matching rows: $escaped")
    // two clauses union their survivors (a dir pruned under EVERY
    // clause's ranges is out; one clause keeping it keeps it)
    val probeTwo = VersionedStore.bySourceProbeSet(all, stats,
      Seq(cond, expr("user_id = 21")), recorded, Map.empty)
    assert(probeTwo.size === 2, s"union across clauses: $probeTwo")
    // an underivable condition keeps everything — fallback, not a filter
    assert(VersionedStore.bySourceProbeSet(all, stats,
      Seq(expr("user_id % 2 = 0")), recorded, Map.empty) === all)
    // end-to-end: the merge answers right through the pruned probe and
    // carries the non-overlapping dirs by reference
    val dirs0 = VersionedStore.prunedDirs(spark, root, 3L, Seq.empty).toSet
    // no-match source key: `touched` stays empty, so the rewrite set is
    // purely the stats-bounded probe's answer
    val vM = VersionedStore.mergeIntoClauses(spark, root,
      Seq((-1L, 0)).toDF("user_id", "boost"), Seq("user_id"),
      matched = Seq.empty, insertNotMatched = None,
      notMatchedBySource = Seq(MergeMatched.Delete(
        Some(expr("t.user_id >= 11 AND t.user_id <= 12")))),
      statsCols = Seq("user_id"))
    assert(vM === 4L)
    val got = VersionedStore.read(spark, root).get
      .select("user_id").as[Long].collect().toSeq.sorted
    assert(got === Seq(1L, 2L, 21L, 22L), s"got $got")
    val dirs1 = VersionedStore.prunedDirs(spark, root, 4L, Seq.empty).toSet
    assert(dirs0.intersect(dirs1).size === 2,
      s"both non-overlapping dirs must carry by reference: $dirs0 -> $dirs1")
  }

  test("BY SOURCE probe derivation refuses the string-column-vs-numeric-" +
       "literal pair (lexical stats order diverges from Spark's numeric " +
       "coercion — deriving would prune a dir that MATCHES)") {
    import org.apache.spark.sql.functions.expr
    val root = tmp()
    // s = "10": numerically 10 > 9 matches; lexically "9" <= max("10")
    // is FALSE, so a naive derivation would prune the dir wrongly
    VersionedStore.commitAppend(Seq(("10", 1L)).toDF("s", "id"),
      root, statsCols = Seq("s"))
    val all = VersionedStore.prunedDirs(spark, root, 1L, Seq.empty)
    val stats = VersionedStore.statsAt(spark, root, 1L)
    val recorded = org.apache.spark.sql.types.StructType.fromDDL(
      VersionedStore.schemaAt(spark, root, 1L).get)
    val kept = VersionedStore.bySourceProbeSet(all, stats,
      Seq(expr("s > 9")), recorded, Map.empty)
    assert(kept === all,
      "string-col-vs-numeric-literal must not derive a range")
    // the probe under the real predicate DOES find the row
    val hit = VersionedStore.probeMatching(spark, root, all, expr("s > 9"),
      VersionedStore.schemaAt(spark, root, 1L), Map.empty)
    assert(hit === all.toSet, "the row numerically matches")
  }

  test("BY SOURCE condition on a NESTED field strips the t. alias " +
       "(t.addr.city parses as [t, addr, city] — the probe scan has no " +
       "alias to resolve it against)") {
    import graft.sinks.VersionedStore.MergeMatched
    import org.apache.spark.sql.functions.{expr, struct, lit, col}
    val root = tmp()
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "c")
      .withColumn("addr", struct(col("c").as("city"))).drop("c")
    VersionedStore.commit(df, root)
    // empty source: both rows unmatched; the nested condition must both
    // PROBE (unaliased scan) and APPLY (aliased rewrite join) cleanly
    val v = VersionedStore.mergeIntoClauses(spark, root,
      Seq.empty[(Long, Int)].toDF("id", "boost"), Seq("id"),
      matched = Seq.empty, insertNotMatched = None,
      notMatchedBySource =
        Seq(MergeMatched.Delete(Some(expr("t.addr.city = 'x'")))))
    assert(v === 2L)
    val got = VersionedStore.read(spark, root).get
      .select("id").as[Long].collect().toSeq
    assert(got === Seq(2L), s"nested-field BY SOURCE condition: $got")
  }

  test("the ≤1024-key literal probe path survives its own ceiling " +
       "(balanced OR — a left-deep disjunction overflowed the default " +
       "stack inside a pool Future and hung the writer forever)") {
    val root = tmp()
    VersionedStore.commitAppend(
      snap("2024-01-01", (1L to 50L).map(i => i -> i.toDouble): _*),
      root, statsCols = Seq("user_id"))
    // exactly 1024 distinct keys = the literal fast path's ceiling; the
    // regression shape: before the balanced reduce, ~500 terms already
    // blew the 1 MB stack DURING the probe's collect — fatally, inside
    // a Future whose promise then never completed (silent infinite
    // Await). Completing at all is the gate; values prove the upsert.
    val src = (1L to 1024L).map(i => ("2024-01-02", i, i * 10.0))
      .toDF("day", "user_id", "value")
    val v = VersionedStore.mergeInto(spark, root, src, Seq("user_id"),
      statsCols = Seq("user_id"))
    val rows = VersionedStore.readAt(spark, root, v)
    assert(rows.count() === 1024L, "50 updates + 974 inserts")
    assert(rows.filter($"user_id" === 7L).head().getAs[Double]("value") === 70.0)
  }

  test("mergeIntoClauses partial-column INSERT: named columns take their " +
       "expressions, omitted columns insert NULL of the recorded type") {
    import graft.sinks.VersionedStore.{MergeInsert, MergeMatched}
    import org.apache.spark.sql.functions.expr
    val root = tmp()
    VersionedStore.commitAppend(snap("2024-01-01", 1L -> 1.0), root,
      statsCols = Seq("user_id"))
    val src = Seq((1L, 10), (9L, 90)).toDF("user_id", "boost")
    val v = VersionedStore.mergeIntoClauses(spark, root, src,
      keys = Seq("user_id"),
      matched = Seq(MergeMatched.Update(None,
        Map("value" -> expr("t.value + s.boost")))),
      insertNotMatched = Some(MergeInsert(None, Some(Map(
        "user_id" -> expr("s.user_id"),
        "value"   -> expr("s.boost * 2"))))),
      statsCols = Seq("user_id"))
    assert(v === 2L)
    val rows = VersionedStore.read(spark, root).get
      .select("day", "user_id", "value").collect()
      .map(r => (Option(r.get(0)), r.getLong(1), r.getDouble(2)))
      .sortBy(_._2).toSeq
    assert(rows(0) === (Some(java.sql.Date.valueOf("2024-01-01")), 1L, 11.0))
    assert(rows(1)._1.isEmpty, "omitted day column must insert NULL")
    assert(rows(1)._2 === 9L && rows(1)._3 === 180.0,
      "named columns take their expressions (cast to the recorded type)")
    // a value column not in the recorded schema is rejected loudly
    val eU = intercept[IllegalArgumentException] {
      VersionedStore.mergeIntoClauses(spark, root, src, Seq("user_id"),
        Seq.empty,
        Some(MergeInsert(None, Some(Map("nope" -> expr("s.boost"))))))
    }
    assert(eU.getMessage.contains("not in the recorded schema"))
  }

  test("TIMESTAMP AS OF: monotonic commit stamps; boundary semantics " +
       "(before-first loud, between-commits floors, after-last loud for " +
       "reads / floors for RESTORE)") {
    val root = tmp()
    (1 to 3).foreach(i =>
      VersionedStore.commitAppend(snap(s"2024-01-0$i", i.toLong -> i.toDouble), root))
    val ts = (1L to 3L).map(v =>
      VersionedStore.metaAt(spark, root, v)("commitTs").toLong)
    assert(ts == ts.sorted && ts.distinct == ts,
      s"commit stamps must be strictly increasing, got $ts")
    // before the first stamped commit: loud, never the wrong snapshot
    val e = intercept[IllegalArgumentException] {
      VersionedStore.versionAtTimestamp(spark, root, ts.head - 1)
    }
    assert(e.getMessage.contains("precedes the first stamped commit"))
    // exact stamp and between-commits both floor to the earlier version
    assert(VersionedStore.versionAtTimestamp(spark, root, ts(1)) === 2L)
    assert(VersionedStore.versionAtTimestamp(spark, root,
      (ts(1) + ts(2)) / 2) === 2L)
    // after the last commit: loud for READS (a future-dated read is
    // non-reproducible — the next commit would change its answer) ...
    val eAfter = intercept[IllegalArgumentException] {
      VersionedStore.versionAtTimestamp(spark, root, ts.last + 3600L * 1000L)
    }
    assert(eAfter.getMessage.contains("after the last stamped commit"))
    // ... while RESTORE's resolution floors to the latest version
    // ("restore to where the table stood at t" is well-defined later)
    assert(VersionedStore.versionAtTimestamp(spark, root,
      ts.last + 3600L * 1000L, canReturnLastCommit = true) === 3L)
    // the last commit's own stamp still reads (boundary is exclusive)
    assert(VersionedStore.versionAtTimestamp(spark, root, ts.last) === 3L)
    // the DataFrame option rides the same resolution (pinned snapshot)
    val atV2 = spark.read.format("graftstore")
      .option("timestampAsOf", ts(1).toString).load(root)
    assert(atV2.count() === VersionedStore.readAt(spark, root, 2L).count())
    // both travel axes at once is a loud error
    intercept[IllegalArgumentException] {
      spark.read.format("graftstore").option("timestampAsOf", ts(1).toString)
        .option("versionAsOf", "1").load(root)
    }
    // empty/unstamped store refuses timestamp travel with a hint
    val bare = tmp()
    intercept[IllegalArgumentException] {
      VersionedStore.versionAtTimestamp(spark, bare, ts.head)
    }
  }

  test("TIMESTAMP AS OF literal forms: epoch millis, ISO instant, " +
       "session-zoned datetime and date") {
    import graft.sinks.{VersionedStore => VS}
    val zone = "UTC"
    assert(VS.parseTravelTimestamp("1704067200000", zone) === 1704067200000L)
    assert(VS.parseTravelTimestamp("2024-01-01T00:00:00Z", zone) === 1704067200000L)
    assert(VS.parseTravelTimestamp("2024-01-01 00:00:00", zone) === 1704067200000L)
    assert(VS.parseTravelTimestamp("2024-01-01", zone) === 1704067200000L)
    // zoned interpretation follows the session zone
    assert(VS.parseTravelTimestamp("2024-01-01 00:00:00", "America/New_York")
      === 1704067200000L + 5L * 3600 * 1000)
    // a bare year is NOT epoch millis (would silently resolve to 1970);
    // garbage names the accepted forms
    intercept[IllegalArgumentException] { VS.parseTravelTimestamp("2024", zone) }
    intercept[IllegalArgumentException] { VS.parseTravelTimestamp("not-a-ts", zone) }
    // 10-11 digit all-digit values are the common unix EPOCH SECONDS —
    // parsed as millis they'd resolve to 1970 and surface as a baffling
    // "precedes the first commit"; rejected with the multiply-by-1000 hint
    val eSec = intercept[IllegalArgumentException] {
      VS.parseTravelTimestamp("1704067200", zone)
    }
    assert(eSec.getMessage.contains("epoch SECONDS"))
    intercept[IllegalArgumentException] { VS.parseTravelTimestamp("17040672000", zone) }
    // 12 digits is unambiguously millis (1973 onward)
    assert(VS.parseTravelTimestamp("170406720000", zone) === 170406720000L)
  }
}
