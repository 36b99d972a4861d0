package graft

import java.nio.file.Files

import graft.sinks.SnapshotStore
import org.apache.spark.sql.functions.col

/** L1-L5 write semantics (SURVEY.md §2.2): append keeps history, upsert
  * replaces exactly the incoming day, retention keeps survivors only,
  * singleton overwrite replaces everything. */
class SnapshotStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-store").toString

  private def snap(day: String, users: (Long, Double)*) =
    users.map { case (u, v) => (day, u, v) }.toDF("day", "user_id", "value")

  test("append keeps history; point read prunes to one day") {
    val path = tmp()
    SnapshotStore.appendDaily(snap("2024-01-01", 1L -> 10.0), path)
    SnapshotStore.appendDaily(snap("2024-01-02", 1L -> 20.0), path)
    assert(spark.read.parquet(path).count() === 2)
    val d2 = SnapshotStore.readDay(spark, path, "2024-01-02").collect()
    assert(d2.length === 1 && d2.head.getAs[Double]("value") === 20.0)
  }

  test("upsert replaces exactly the incoming day") {
    val path = tmp()
    SnapshotStore.appendDaily(snap("2024-01-01", 1L -> 10.0), path)
    SnapshotStore.appendDaily(snap("2024-01-02", 1L -> 20.0), path)
    SnapshotStore.upsertDays(snap("2024-01-02", 1L -> 99.0, 2L -> 5.0), path)
    // partition-column type inference turns day= back into DATE; normalize
    val rows = spark.read.parquet(path).withColumn("day", col("day").cast("string")).collect()
      .map(r => (r.getAs[String]("day"), r.getAs[Long]("user_id"), r.getAs[Double]("value"))).toSet
    assert(rows === Set(("2024-01-01", 1L, 10.0), ("2024-01-02", 1L, 99.0), ("2024-01-02", 2L, 5.0)))
  }

  test("upsert is idempotent (re-running a day changes nothing)") {
    val path = tmp()
    SnapshotStore.upsertDays(snap("2024-01-01", 1L -> 10.0), path)
    SnapshotStore.upsertDays(snap("2024-01-01", 1L -> 10.0), path)
    assert(spark.read.parquet(path).count() === 1)
  }

  test("retention keeps only surviving days (L4 keep-latest)") {
    val path = tmp()
    SnapshotStore.appendDaily(snap("2024-01-01", 1L -> 10.0), path)
    SnapshotStore.appendDaily(snap("2024-01-02", 1L -> 20.0), path)
    SnapshotStore.appendDaily(snap("2024-01-03", 1L -> 30.0), path)
    SnapshotStore.retainWhere(spark, path, col("day") === "2024-01-03")
    val days = spark.read.parquet(path).select(col("day").cast("string")).collect().map(_.getString(0)).toSet
    assert(days === Set("2024-01-03"))
  }

  test("point read prunes to exactly one day partition (S6/S8)") {
    val path = tmp()
    SnapshotStore.appendDaily(snap("2024-01-01", 1L -> 10.0), path)
    SnapshotStore.appendDaily(snap("2024-01-02", 1L -> 20.0), path)
    SnapshotStore.appendDaily(snap("2024-01-03", 1L -> 30.0), path)
    val plan = SnapshotStore.readDay(spark, path, "2024-01-02")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"expected partition filters in:\n$plan")
    // the scan must touch 1 of 3 partitions
    val scanned = SnapshotStore.readDay(spark, path, "2024-01-02")
      .queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }
    assert(scanned.contains(1), s"expected 1 partition scanned, got $scanned")
  }

  test("retention recovers an interrupted swap instead of deleting the only copy") {
    val path = tmp()
    SnapshotStore.appendDaily(snap("2024-01-02", 1L -> 20.0), path)
    SnapshotStore.appendDaily(snap("2024-01-03", 1L -> 30.0), path)
    // Simulate a crash between delete(target) and rename(tmp, target): the
    // survivors live only at the tmp path, the target is gone.
    val conf = spark.sessionState.newHadoopConf()
    val target = new org.apache.hadoop.fs.Path(path)
    val tmpPath = new org.apache.hadoop.fs.Path(path + SnapshotStore.RetainTmpSuffix)
    val fs = target.getFileSystem(conf)
    assert(fs.rename(target, tmpPath))
    // A rerun must complete the swap (not delete tmp) and then apply its
    // own retention on the recovered table.
    SnapshotStore.retainWhere(spark, path, col("day") >= "2024-01-03")
    val days = spark.read.parquet(path).select(col("day").cast("string"))
      .collect().map(_.getString(0)).toSet
    assert(days === Set("2024-01-03"))
    assert(!fs.exists(tmpPath))
  }

  test("retention deletes a stale pre-swap tmp when the target is intact") {
    val path = tmp()
    SnapshotStore.appendDaily(snap("2024-01-01", 1L -> 10.0), path)
    SnapshotStore.appendDaily(snap("2024-01-02", 1L -> 20.0), path)
    // A tmp left by a failure BEFORE the swap (target still complete) must
    // not leak into the result.
    val conf = spark.sessionState.newHadoopConf()
    val tmpPath = new org.apache.hadoop.fs.Path(path + SnapshotStore.RetainTmpSuffix)
    val fs = tmpPath.getFileSystem(conf)
    snap("2023-12-31", 9L -> 99.0).write.partitionBy("day").parquet(tmpPath.toString)
    SnapshotStore.retainWhere(spark, path, col("day") >= "2024-01-01")
    val rows = spark.read.parquet(path).select(col("user_id"))
      .collect().map(_.getLong(0)).toSet
    assert(rows === Set(1L))
    assert(!fs.exists(tmpPath))
  }

  test("compaction collapses a many-small-files day to one file, data intact") {
    val path = tmp()
    // 20 writers' worth of fragmentation in one day partition
    val rows = (1L to 200L).map(u => ("2024-01-01", u, u * 1.0))
    rows.toDF("day", "user_id", "value").repartition(20)
      .write.mode("append").partitionBy("day").parquet(path)
    SnapshotStore.appendDaily(snap("2024-01-02", 1L -> 5.0), path)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    def dayFiles(day: String): Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/day=$day"))
        .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    assert(dayFiles("2024-01-01") === 20)
    val before = spark.read.parquet(path)
      .collect().map(r => (r.getAs[Any]("day").toString, r.getAs[Long]("user_id"), r.getAs[Double]("value"))).toSet
    SnapshotStore.compactDays(spark, path) // default 128 MB target >> data
    assert(dayFiles("2024-01-01") === 1, "fragmented day must collapse to one file")
    assert(dayFiles("2024-01-02") === 1)
    val after = spark.read.parquet(path)
      .collect().map(r => (r.getAs[Any]("day").toString, r.getAs[Long]("user_id"), r.getAs[Double]("value"))).toSet
    assert(after === before)
  }

  test("compaction honors the per-day target as an upper bound on files") {
    val path = tmp()
    val rows = (1L to 500L).map(u => ("2024-01-01", u, u * 1.0))
    rows.toDF("day", "user_id", "value").repartition(10)
      .write.mode("append").partitionBy("day").parquet(path)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val bytes = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/day=2024-01-01"))
      .filter(_.isFile).map(_.getLen).sum
    // target ~ a third of the data: asks for <= 3 files (hash cells may coalesce)
    SnapshotStore.compactDays(spark, path, targetBytes = bytes / 3 + 1)
    val n = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/day=2024-01-01"))
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    assert(n >= 1 && n <= 3, s"expected 1..3 files, got $n")
    assert(spark.read.parquet(path).count() === 500)
  }

  test("compaction recovers an interrupted swap before listing day partitions") {
    val path = tmp()
    SnapshotStore.appendDaily(snap("2024-01-01", 1L -> 10.0), path)
    SnapshotStore.appendDaily(snap("2024-01-02", 2L -> 20.0), path)
    // Crash between delete(target) and rename(tmp, target): the table lives
    // only at tmp. compactDays must heal it first — without recovery its
    // listStatus(target) throws FileNotFoundException on a store
    // retainWhere knows how to repair.
    val conf = spark.sessionState.newHadoopConf()
    val target = new org.apache.hadoop.fs.Path(path)
    val tmpPath = new org.apache.hadoop.fs.Path(path + SnapshotStore.RetainTmpSuffix)
    val fs = target.getFileSystem(conf)
    assert(fs.rename(target, tmpPath))
    SnapshotStore.compactDays(spark, path)
    val rows = spark.read.parquet(path)
      .select(col("day").cast("string"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows === Set(("2024-01-01", 1L), ("2024-01-02", 2L)))
    assert(!fs.exists(tmpPath))
  }

  test("singleton overwrite replaces the latest table wholesale (L2)") {
    val path = tmp()
    SnapshotStore.overwriteLatest(Seq((1L, 10.0)).toDF("user_id", "value"), path)
    SnapshotStore.overwriteLatest(Seq((1L, 99.0), (2L, 1.0)).toDF("user_id", "value"), path)
    val rows = spark.read.parquet(path).collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(rows === Set((1L, 99.0), (2L, 1.0)))
  }
}
