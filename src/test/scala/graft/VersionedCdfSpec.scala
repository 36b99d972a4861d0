package graft

import java.nio.file.Files

import graft.sinks.VersionedStore
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.LongType

/** Row-level change data feed (VersionedStore.readRowChanges — the
  * Delta CDF / table_changes shape, computed from the log): exact
  * multiset row deltas per version step, with append steps read
  * shuffle-free, UPDATE steps labeled preimage/postimage, OPTIMIZE
  * steps skipped without opening data, and rename/widening aligned to
  * the current logical schema through physical names. */
class VersionedCdfSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-cdf").toString

  private def changes(root: String, since: Long, to: Long = -1L) =
    VersionedStore.readRowChanges(spark, root, since, to).get
      .select("k", "v", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSeq.sorted

  test("append-only range: every row is an insert at its commit version") {
    val root = tmp()
    VersionedStore.commitAppend(Seq((1L, "a")).toDF("k", "v"), root)
    VersionedStore.commitAppend(Seq((2L, "b"), (3L, "c")).toDF("k", "v"), root)
    assert(changes(root, 0) === Seq(
      (1L, "a", "insert", 1L), (2L, "b", "insert", 2L), (3L, "c", "insert", 2L)))
    // a suffix of the range reads only its own versions
    assert(changes(root, 1) === Seq(
      (2L, "b", "insert", 2L), (3L, "c", "insert", 2L)))
    assert(VersionedStore.readRowChanges(spark, root, 2).isEmpty)
  }

  test("DELETE step: removed rows surface as deletes, survivors cancel") {
    val root = tmp()
    VersionedStore.commitAppend(
      Seq((1L, "keep"), (2L, "drop"), (3L, "keep")).toDF("k", "v"), root,
      statsCols = Seq("k"))
    VersionedStore.deleteWhere(spark, root, col("v") === "drop")
    assert(changes(root, 1) === Seq((2L, "drop", "delete", 2L)))
  }

  test("UPDATE step: exact preimage/postimage pairs, untouched rows silent") {
    val root = tmp()
    VersionedStore.commitAppend(
      Seq((1L, "x"), (2L, "y")).toDF("k", "v"), root, statsCols = Seq("k"))
    VersionedStore.updateWhere(spark, root, col("k") === 2L,
      set = Map("v" -> lit("y2")))
    assert(changes(root, 1) === Seq(
      (2L, "y", "update_preimage", 2L), (2L, "y2", "update_postimage", 2L)))
  }

  test("MERGE step: matched rewrite is delete+insert, fresh key is insert") {
    val root = tmp()
    VersionedStore.commitAppend(
      Seq((1L, "old"), (2L, "same")).toDF("k", "v"), root, statsCols = Seq("k"))
    VersionedStore.mergeInto(spark, root,
      Seq((1L, "new"), (9L, "fresh")).toDF("k", "v"), keys = Seq("k"))
    assert(changes(root, 1) === Seq(
      (1L, "new", "insert", 2L), (1L, "old", "delete", 2L),
      (9L, "fresh", "insert", 2L)))
  }

  test("OPTIMIZE step contributes nothing and is skipped by marker") {
    val root = tmp()
    VersionedStore.commitAppend(Seq((1L, "a")).toDF("k", "v"), root)
    VersionedStore.commitAppend(Seq((2L, "b")).toDF("k", "v"), root)
    VersionedStore.optimize(spark, root, col("k"), buckets = 2)
    assert(VersionedStore.readRowChanges(spark, root, 2).isEmpty)
    // and the feed across append+optimize carries only the appends
    assert(changes(root, 1).map(_._3).forall(_ == "insert"))
  }

  test("RESTORE step: rolled-back rows surface as deletes") {
    val root = tmp()
    VersionedStore.commitAppend(Seq((1L, "a")).toDF("k", "v"), root)
    VersionedStore.commitAppend(Seq((2L, "b")).toDF("k", "v"), root)
    VersionedStore.restore(spark, root, 1L)
    assert(changes(root, 2) === Seq((2L, "b", "delete", 3L)))
  }

  test("a RESTORE to an optimize commit still feeds: carried markers can " +
       "never hide a restore's changes") {
    val root = tmp()
    VersionedStore.commitAppend(Seq((1L, "a")).toDF("k", "v"), root,
      statsCols = Seq("k"))
    VersionedStore.commitAppend(Seq((2L, "b")).toDF("k", "v"), root,
      statsCols = Seq("k"))
    VersionedStore.optimize(spark, root, col("k"), buckets = 2) // v3
    VersionedStore.deleteWhere(spark, root, col("k") === 2L)     // v4
    VersionedStore.restore(spark, root, 3L)                      // v5: b is back
    // The restore commit references v3's dirs — whose manifest carries
    // an "optimize" marker. A feed that read carried markers naively
    // would skip v5 as a layout rewrite and silently drop b's
    // re-insertion; the restore must win.
    assert(changes(root, 3) === Seq(
      (2L, "b", "delete", 4L), (2L, "b", "insert", 5L)))
  }

  test("rename mid-range: the feed reports every row under CURRENT names") {
    val root = tmp()
    VersionedStore.commitAppend(Seq((1L, 10L)).toDF("k", "val"), root)
    VersionedStore.renameColumn(spark, root, "val", "value")
    VersionedStore.commitAppend(Seq((2L, 20L)).toDF("k", "value"), root)
    val out = VersionedStore.readRowChanges(spark, root, 0).get
    assert(out.columns.contains("value") && !out.columns.contains("val"))
    val rows = out.select("k", "value", "_change_type", "_commit_version")
      .as[(Long, Long, String, Long)].collect().toSeq.sorted
    // the rename commit itself (v2) moves no rows
    assert(rows === Seq((1L, 10L, "insert", 1L), (2L, 20L, "insert", 3L)))
  }

  test("widening mid-range: narrow inserts cast to the widened type") {
    val root = tmp()
    VersionedStore.commitAppend(Seq((1, "a")).toDF("k", "v"), root)
    VersionedStore.commitAppend(Seq((3000000000L, "b")).toDF("k", "v"), root,
      mergeSchema = true)
    val out = VersionedStore.readRowChanges(spark, root, 0).get
    assert(out.schema("k").dataType === LongType)
    assert(out.select("k").as[Long].collect().sorted.toSeq ===
      Seq(1L, 3000000000L))
  }

  test("guards: expired version throws, bad range throws, since==to is None") {
    val root = tmp()
    (1 to 4).foreach(i =>
      VersionedStore.commitAppend(Seq((i.toLong, s"v$i")).toDF("k", "v"), root))
    VersionedStore.expire(spark, root, keepLast = 2)
    intercept[IllegalStateException] {
      VersionedStore.readRowChanges(spark, root, 0)
    }
    assert(VersionedStore.readRowChanges(spark, root, 4, 4).isEmpty)
    intercept[IllegalArgumentException] {
      VersionedStore.readRowChanges(spark, root, 0, 99)
    }
    // the surviving suffix still feeds
    assert(changes(root, 3) === Seq((4L, "v4", "insert", 4L)))
  }
}
