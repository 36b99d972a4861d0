package graft

import java.nio.file.Files

import graft.sinks.VersionedStore
import org.apache.spark.sql.functions.col

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
}
