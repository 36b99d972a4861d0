package graft

import java.nio.file.Files

import graft.sinks.VersionedStore
import org.apache.spark.sql.functions.{col, lit, sum}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Type-widening schema evolution (Iceberg type promotion / Delta type
  * widening): a shared column may promote along byte→short→int→long or
  * float→double under the mergeSchema opt-in; older narrow dirs read
  * through the widened recorded schema via the parquet reader's native
  * promotion — no rewrite, no cast node. Narrower batches commit with
  * no flag (the recorded schema doesn't move); off-lattice changes
  * stay loud commit-time failures under every flag. */
class VersionedWidenSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-widen").toString

  private def intBatch(rows: (Int, Float)*) =
    rows.toDF("k", "x")

  private def longBatch(rows: (Long, Double)*) =
    rows.toDF("k", "x")

  test("INT->LONG (and FLOAT->DOUBLE) widening append promotes the recorded schema; " +
       "old narrow dirs read through it exactly") {
    val root = tmp()
    VersionedStore.commitAppend(intBatch(1 -> 1.5f, 2 -> 2.5f), root,
      statsCols = Seq("k"))
    // the widening batch: k is BIGINT, x is DOUBLE — both promotions at once
    VersionedStore.commitAppend(
      longBatch(3000000000L -> 3.5, 4L -> 4.5), root,
      statsCols = Seq("k"), mergeSchema = true)
    val out = VersionedStore.read(spark, root).get
    assert(out.schema("k").dataType === LongType, "k must promote to BIGINT")
    assert(out.schema("x").dataType === DoubleType, "x must promote to DOUBLE")
    val rows = out.orderBy("k").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L, 3000000000L))
    // the narrow dir's float 1.5f/2.5f are exactly representable — the
    // promotion is lossless, not a lossy reinterpretation
    assert(rows.map(_.getDouble(1)).toSeq === Seq(1.5, 2.5, 4.5, 3.5))
  }

  test("widening WITHOUT mergeSchema fails loudly and names the column") {
    val root = tmp()
    VersionedStore.commitAppend(intBatch(1 -> 1.0f), root)
    val e = intercept[IllegalArgumentException] {
      VersionedStore.commitAppend(longBatch(2L -> 2.0), root)
    }
    assert(e.getMessage.contains("widened") && e.getMessage.contains("k"))
    // the rejected append must not leave its prepared dir behind
    assert(VersionedStore.currentVersion(spark, root) === 1L)
    assert(VersionedStore.read(spark, root).get.count() === 1L)
  }

  test("off-lattice type change (long->string) fails under EVERY flag; " +
       "narrowing (int into long column) needs NO flag") {
    val root = tmp()
    VersionedStore.commitAppend(longBatch(1L -> 1.0), root)
    val bad = Seq(("a", 1.0)).toDF("k", "x")
    val e1 = intercept[IllegalArgumentException] {
      VersionedStore.commitAppend(bad, root)
    }
    assert(e1.getMessage.contains("TYPES"))
    val e2 = intercept[IllegalArgumentException] {
      VersionedStore.commitAppend(bad, root, mergeSchema = true)
    }
    assert(e2.getMessage.contains("TYPES"))
    // narrower batch: int rows into the BIGINT column, no flag, schema unmoved
    VersionedStore.commitAppend(intBatch(7 -> 7.0f), root)
    val out = VersionedStore.read(spark, root).get
    assert(out.schema("k").dataType === LongType, "recorded schema must not narrow")
    assert(out.orderBy("k").collect().map(_.getLong(0)).toSeq === Seq(1L, 7L))
  }

  test("time travel preserves the pre-widening schema; readChanges across the " +
       "widening commit yields the widened types") {
    val root = tmp()
    VersionedStore.commitAppend(intBatch(1 -> 1.0f), root, statsCols = Seq("k"))
    VersionedStore.commitAppend(longBatch(9999999999L -> 9.0), root,
      statsCols = Seq("k"), mergeSchema = true)
    val v1 = VersionedStore.readAt(spark, root, 1L)
    assert(v1.schema("k").dataType === IntegerType,
      "version 1 must read with its own narrow schema")
    assert(v1.collect().map(_.getInt(0)).toSeq === Seq(1))
    val ch = VersionedStore.readChanges(spark, root, sinceVersion = 1L).get
    assert(ch.schema("k").dataType === LongType)
    assert(ch.collect().map(_.getLong(0)).toSeq === Seq(9999999999L))
  }

  test("stats pruning stays sound across mixed narrow/wide dirs (per-dir typ)") {
    val root = tmp()
    VersionedStore.commitAppend(intBatch(1 -> 1.0f, 10 -> 1.0f), root,
      statsCols = Seq("k"))
    VersionedStore.commitAppend(longBatch(5000000000L -> 5.0), root,
      statsCols = Seq("k"), mergeSchema = true)
    // a range that only the WIDE dir can hold must prune the narrow dir…
    val hiRows = VersionedStore.read(spark, root,
      Seq(VersionedStore.ColRange("k", Some("4000000000"), None))).get
      .filter(col("k") >= 4000000000L)
    assert(hiRows.collect().map(_.getLong(0)).toSeq === Seq(5000000000L))
    // …and a low range must still see the narrow dir's rows (typed, not
    // lexical, comparison: "10" < "5000000000" numerically)
    val loRows = VersionedStore.read(spark, root,
      Seq(VersionedStore.ColRange("k", None, Some("100")))).get
      .filter(col("k") <= 100L)
    assert(loRows.orderBy("k").collect().map(_.getLong(0)).toSeq === Seq(1L, 10L))
  }

  test("DML after widening: deleteWhere on the promoted column rewrites and reads wide") {
    val root = tmp()
    VersionedStore.commitAppend(intBatch(1 -> 1.0f, 2 -> 2.0f), root,
      statsCols = Seq("k"))
    VersionedStore.commitAppend(longBatch(3L -> 3.0, 4L -> 4.0), root,
      statsCols = Seq("k"), mergeSchema = true)
    VersionedStore.deleteWhere(spark, root, col("k") === 2L, statsCols = Seq("k"))
    val out = VersionedStore.read(spark, root).get
    assert(out.schema("k").dataType === LongType)
    assert(out.orderBy("k").collect().map(_.getLong(0)).toSeq === Seq(1L, 3L, 4L))
    assert(out.agg(sum(col("x"))).head().getDouble(0) === 8.0)
  }
}
