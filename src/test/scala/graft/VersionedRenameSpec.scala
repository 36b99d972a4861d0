package graft

import java.nio.file.Files

import graft.sinks.VersionedStore
import org.apache.spark.sql.functions.{col, lit, sum}

/** Column RENAME via column mapping (Iceberg/Delta shape): the physical
  * parquet name is fixed at column birth; renameColumn is a metadata-only
  * commit updating the logical→physical map, so no dir is rewritten,
  * history stays byte-identical, and every version reads under its own
  * names. */
class VersionedRenameSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-rename").toString

  private def batch(rows: (Long, Double)*) = rows.toDF("k", "x")

  test("rename is metadata-only: no dir rewritten, values intact, old version keeps old name") {
    val root = tmp()
    VersionedStore.commitAppend(batch(1L -> 1.0, 2L -> 2.0), root, statsCols = Seq("k"))
    val dirsBefore = VersionedStore.prunedDirs(spark, root, 1L, Seq.empty).toSet
    val v = VersionedStore.renameColumn(spark, root, "x", "score")
    assert(v === 2L)
    val dirsAfter = VersionedStore.prunedDirs(spark, root, v, Seq.empty).toSet
    assert(dirsAfter === dirsBefore, "rename must reference the same dirs verbatim")
    val out = VersionedStore.read(spark, root).get
    assert(out.columns.toSeq === Seq("k", "score"))
    assert(out.orderBy("k").collect().map(_.getDouble(1)).toSeq === Seq(1.0, 2.0))
    val old = VersionedStore.readAt(spark, root, 1L)
    assert(old.columns.toSeq === Seq("k", "x"), "time travel shows the old name")
  }

  test("appends AFTER a rename write the stable physical name; mixed dirs read as one") {
    val root = tmp()
    VersionedStore.commitAppend(batch(1L -> 1.0), root, statsCols = Seq("k"))
    VersionedStore.renameColumn(spark, root, "x", "score")
    // post-rename appends use the NEW logical name
    VersionedStore.commitAppend(Seq((2L, 2.0)).toDF("k", "score"), root,
      statsCols = Seq("k"))
    val out = VersionedStore.read(spark, root).get.orderBy("k")
    assert(out.columns.toSeq === Seq("k", "score"))
    assert(out.collect().map(_.getDouble(1)).toSeq === Seq(1.0, 2.0))
    // the physical parquet column is still "x" in BOTH dirs (stable at birth)
    val dirs = VersionedStore.prunedDirs(spark, root, 3L, Seq.empty)
    dirs.foreach { d =>
      val phys = spark.read.parquet(s"$root/$d").schema.fieldNames.toSeq
      assert(phys.contains("x") && !phys.contains("score"),
        s"dir $d must keep the birth physical name, saw $phys")
    }
    // appending under the OLD name now drifts (x is not a logical column)
    val e = intercept[IllegalArgumentException] {
      VersionedStore.commitAppend(batch(9L -> 9.0), root)
    }
    assert(e.getMessage.contains("drifts") || e.getMessage.contains("x"))
  }

  test("rename guards: missing source, existing target, retired-physical-name reuse") {
    val root = tmp()
    VersionedStore.commitAppend(batch(1L -> 1.0), root)
    intercept[IllegalArgumentException] {
      VersionedStore.renameColumn(spark, root, "nope", "y")
    }
    intercept[IllegalArgumentException] {
      VersionedStore.renameColumn(spark, root, "x", "k")
    }
    VersionedStore.renameColumn(spark, root, "x", "score")
    // a NEW column named "x" would collide with score's retired physical name
    val e = intercept[IllegalArgumentException] {
      VersionedStore.commitAppend(
        Seq((5L, 5.0, 1.0)).toDF("k", "score", "x"), root, mergeSchema = true)
    }
    assert(e.getMessage.contains("PHYSICAL"))
  }

  test("DML and MERGE after a rename operate on the new name across old and new dirs") {
    val root = tmp()
    VersionedStore.commitAppend(batch(1L -> 1.0, 2L -> 2.0), root, statsCols = Seq("k"))
    VersionedStore.renameColumn(spark, root, "x", "score")
    VersionedStore.commitAppend(Seq((3L, 3.0), (4L, 4.0)).toDF("k", "score"), root,
      statsCols = Seq("k"))
    // DELETE by the NEW name hits rows in the PRE-rename dir too
    VersionedStore.deleteWhere(spark, root, col("score") === 2.0,
      statsCols = Seq("k"))
    // MERGE: update k=3 via the new name, insert k=9
    VersionedStore.mergeInto(spark, root,
      Seq((3L, 30.0), (9L, 9.0)).toDF("k", "score"),
      keys = Seq("k"), statsCols = Seq("k"))
    val out = VersionedStore.read(spark, root).get.orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      Seq(1L -> 1.0, 3L -> 30.0, 4L -> 4.0, 9L -> 9.0))
    // rename chain then a second rename: a→b→c keeps resolving
    VersionedStore.renameColumn(spark, root, "score", "points")
    val out2 = VersionedStore.read(spark, root).get
    assert(out2.columns.toSeq === Seq("k", "points"))
    assert(out2.agg(sum(col("points"))).head().getDouble(0) === 44.0)
  }

  test("change feed and stats skipping across a rename") {
    val root = tmp()
    VersionedStore.commitAppend(batch(1L -> 1.0), root, statsCols = Seq("k"))
    val vRen = VersionedStore.renameColumn(spark, root, "x", "score")
    VersionedStore.commitAppend(Seq((100L, 5.0)).toDF("k", "score"), root,
      statsCols = Seq("k"))
    // the feed across the rename carries the NEW name (rename adds no rows)
    val ch = VersionedStore.readChanges(spark, root, sinceVersion = vRen - 1).get
    assert(ch.columns.toSeq === Seq("k", "score"))
    assert(ch.collect().map(_.getLong(0)).toSeq === Seq(100L))
    // skip on k still prunes: only the post-rename dir can hold k=100
    val dirs = VersionedStore.prunedDirs(spark, root,
      VersionedStore.currentVersion(spark, root),
      Seq(VersionedStore.ColRange.eq("k", "100")))
    assert(dirs.size === 1, s"point skip must open one dir, got ${dirs.size}")
  }

  test("optimize and restore across a rename keep values and per-version names") {
    val root = tmp()
    VersionedStore.commitAppend(batch(1L -> 1.0, 2L -> 2.0), root, statsCols = Seq("k"))
    VersionedStore.renameColumn(spark, root, "x", "score")
    VersionedStore.commitAppend(Seq((3L, 3.0)).toDF("k", "score"), root,
      statsCols = Seq("k"))
    VersionedStore.optimize(spark, root, col("k"), buckets = 2,
      statsCols = Seq("k"))
    val out = VersionedStore.read(spark, root).get.orderBy("k")
    assert(out.columns.toSeq === Seq("k", "score"))
    assert(out.collect().map(_.getDouble(1)).toSeq === Seq(1.0, 2.0, 3.0))
    // restore to the PRE-rename version resurrects the old name
    val restored = VersionedStore.restore(spark, root, 1L)
    val back = VersionedStore.readAt(spark, root, restored)
    assert(back.columns.toSeq === Seq("k", "x"),
      "restore to a pre-rename version must read under the old schema")
  }

  test("recordedStatsCols resolves MID-EPOCH stats keys through the " +
       "rename history (a->b->c leaves dirs keyed under b)") {
    val root = Files.createTempDirectory("graft-ren2").toString
    // dir 1: no stats; its value column is born `val`
    VersionedStore.commitAppend(Seq((1L, 10L)).toDF("k", "val"), root)
    VersionedStore.renameColumn(spark, root, "val", "mid")
    // dir 2 written in the MIDDLE epoch: stats key under logical `mid`
    VersionedStore.commitAppend(Seq((2L, 20L)).toDF("k", "mid"), root,
      statsCols = Seq("mid"))
    VersionedStore.renameColumn(spark, root, "mid", "fin")
    // `mid` is neither a current logical name nor the birth physical —
    // only the rename chain (val->mid->fin) can re-key it
    assert(VersionedStore.recordedStatsCols(spark, root) === Seq("fin"),
      "mid-epoch stats keys must translate to the CURRENT logical name")
    // and a write that reproduces the request records usable stats
    VersionedStore.commitAppend(Seq((3L, 30L)).toDF("k", "fin"), root,
      statsCols = VersionedStore.recordedStatsCols(spark, root))
    val v = VersionedStore.currentVersion(spark, root)
    // a probe OUTSIDE dir 3's [30,30] range must skip it (dirs 1 and 2
    // lack fin-keyed stats and are conservatively kept)
    val pruned = VersionedStore.prunedDirs(spark, root, v,
      Seq(VersionedStore.ColRange("fin", Some("25"), Some("25"))))
    assert(pruned.size < VersionedStore.prunedDirs(spark, root, v, Seq.empty).size,
      "the reproduced stats request must keep data skipping alive")
    // RE-USE guard: `mid` is free again after mid->fin (it is not a
    // retired physical) — a fresh column re-using the name keys stats
    // under ITSELF, and the chain must not misdirect them to `fin`
    VersionedStore.commitAppend(
      Seq((4L, 40L, 7L)).toDF("k", "fin", "mid"), root,
      statsCols = Seq("mid"), mergeSchema = true)
    val after = VersionedStore.recordedStatsCols(spark, root).toSet
    assert(after === Set("fin", "mid"),
      s"a re-used freed name must survive as its own stats column: $after")
  }
}
