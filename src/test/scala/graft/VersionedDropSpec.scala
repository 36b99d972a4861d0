package graft

import java.nio.file.Files

import graft.sinks.VersionedStore
import org.apache.spark.sql.functions.{col, lit}

/** Column DROP via column mapping (renameColumn's sibling): a
  * metadata-only commit narrowing the recorded schema and RETIRING the
  * physical name — no dir rewritten, time travel below the drop keeps
  * the column and its values, and the retired physical slot can never
  * be re-used by a later write (the old values still sit inside every
  * pre-drop parquet file). */
class VersionedDropSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-drop").toString

  private def batch(rows: (Long, Double, String)*) = rows.toDF("k", "x", "tag")

  test("drop is metadata-only: same dirs, narrowed schema, time travel keeps the column") {
    val root = tmp()
    VersionedStore.commitAppend(batch((1L, 1.0, "a"), (2L, 2.0, "b")), root,
      statsCols = Seq("k"))
    VersionedStore.commitAppend(batch((3L, 3.0, "c")), root, statsCols = Seq("k"))
    val dirsBefore = VersionedStore.prunedDirs(spark, root, 2L, Seq.empty).toSet
    val v = VersionedStore.dropColumn(spark, root, "tag")
    assert(v === 3L)
    assert(VersionedStore.prunedDirs(spark, root, v, Seq.empty).toSet === dirsBefore,
      "drop must reference the same dirs verbatim")
    val out = VersionedStore.read(spark, root).get
    assert(out.columns.toSeq === Seq("k", "x"))
    assert(out.orderBy("k").collect().map(_.getDouble(1)).toSeq === Seq(1.0, 2.0, 3.0))
    // pre-drop versions still carry the column AND its values
    val old = VersionedStore.readAt(spark, root, 2L)
    assert(old.columns.toSeq === Seq("k", "x", "tag"))
    assert(old.orderBy("k").collect().map(_.getString(2)).toSeq === Seq("a", "b", "c"))
  }

  test("appends after a drop: narrower schema is the new contract; " +
       "re-adding the dropped name is rejected (retired physical)") {
    val root = tmp()
    VersionedStore.commitAppend(batch((1L, 1.0, "a")), root, statsCols = Seq("k"))
    VersionedStore.dropColumn(spark, root, "tag")
    // post-drop appends at the narrowed schema just work
    VersionedStore.commitAppend(Seq((2L, 2.0)).toDF("k", "x"), root,
      statsCols = Seq("k"))
    assert(VersionedStore.read(spark, root).get.orderBy("k")
      .collect().map(_.getDouble(1)).toSeq === Seq(1.0, 2.0))
    // re-adding `tag` (same physical slot) must fail — even with
    // mergeSchema — or dir 1's old values would resurface as its data
    val e = intercept[IllegalArgumentException] {
      VersionedStore.commitAppend(Seq((9L, 9.0, "ghost")).toDF("k", "x", "tag"),
        root, mergeSchema = true)
    }
    assert(e.getMessage.contains("retired"))
    // ... and the retirement survives later commits (markers carry)
    VersionedStore.commitAppend(Seq((3L, 3.0)).toDF("k", "x"), root)
    val e2 = intercept[IllegalArgumentException] {
      VersionedStore.commitAppend(Seq((9L, 9.0, "ghost")).toDF("k", "x", "tag"),
        root, mergeSchema = true)
    }
    assert(e2.getMessage.contains("retired"))
    // the sanctioned re-add path: fresh physical name, then rename onto
    // the old logical name
    VersionedStore.commitAppend(
      Seq((4L, 4.0, "fresh")).toDF("k", "x", "tag2"), root, mergeSchema = true)
    VersionedStore.renameColumn(spark, root, "tag2", "tag")
    val out = VersionedStore.read(spark, root).get.orderBy("k")
    assert(out.columns.toSeq === Seq("k", "x", "tag"))
    assert(out.collect().map(r => Option(r.getString(2))).toSeq ===
      Seq(None, None, None, Some("fresh")),
      "old dir values must NOT resurface under the re-added name")
  }

  test("drop of a RENAMED column retires the BIRTH physical name") {
    val root = tmp()
    VersionedStore.commitAppend(batch((1L, 1.0, "a")), root)
    VersionedStore.renameColumn(spark, root, "tag", "label")
    VersionedStore.dropColumn(spark, root, "label")
    assert(VersionedStore.read(spark, root).get.columns.toSeq === Seq("k", "x"))
    // the BIRTH name `tag` is the retired physical — blocked
    val e = intercept[IllegalArgumentException] {
      VersionedStore.commitAppend(Seq((2L, 2.0, "z")).toDF("k", "x", "tag"),
        root, mergeSchema = true)
    }
    assert(e.getMessage.contains("retired"))
    // the DROPPED LOGICAL name `label` maps to no physical anymore: a
    // fresh column may take it (fresh physical slot = its own name)
    VersionedStore.commitAppend(Seq((2L, 2.0, "new")).toDF("k", "x", "label"),
      root, mergeSchema = true)
    val out = VersionedStore.read(spark, root).get.orderBy("k")
    assert(out.collect().map(r => Option(r.getString(2))).toSeq ===
      Seq(None, Some("new")),
      "pre-drop values lived at physical `tag` and must not resurface")
  }

  test("row-level change feed across a drop reports under the narrowed schema") {
    val root = tmp()
    VersionedStore.commitAppend(batch((1L, 1.0, "a")), root)   // v1
    VersionedStore.dropColumn(spark, root, "tag")              // v2 (no rows)
    VersionedStore.commitAppend(Seq((2L, 2.0)).toDF("k", "x"), root) // v3
    val feed = VersionedStore.readRowChanges(spark, root, 0L).get
    assert(feed.columns.toSeq === Seq("k", "x", "_change_type", "_commit_version"))
    val rows = feed.orderBy("k")
      .select("k", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().toSeq
    assert(rows === Seq((1L, "insert", 1L), (2L, "insert", 3L)),
      "the metadata-only drop contributes no rows; pre-drop rows align " +
        "to the narrowed schema")
  }

  test("drop guards: unknown column, last column, the day partition contract") {
    val root = tmp()
    VersionedStore.commitAppend(Seq((1L, java.sql.Date.valueOf("2024-01-01")))
      .toDF("k", "day"), root)
    intercept[IllegalArgumentException] {
      VersionedStore.dropColumn(spark, root, "nope")
    }
    intercept[IllegalArgumentException] {
      VersionedStore.dropColumn(spark, root, "day")
    }
    VersionedStore.dropColumn(spark, root, "k")
    // now day is last — also undroppable (last column)
    intercept[IllegalArgumentException] {
      VersionedStore.dropColumn(spark, root, "day")
    }
  }
}
