package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.{broadcast, col, hash, pmod}

/** Load-side semantics of the reference (SURVEY.md §2.2 L1-L5),
  * re-expressed as parquet write modes over a date-partitioned layout.
  *
  * The reference talks to Supabase row-by-row; here the table layout IS the
  * semantics:
  *  - L1 insert-by-date            -> append a `day=` partition
  *  - L2 singleton "latest" table  -> full overwrite of an unpartitioned table
  *  - L3 upsert-by-date            -> dynamic partition overwrite (replaces
  *                                    exactly the incoming days, keeps others)
  *  - L4/L5 retention delete       -> retention = write-side: overwrite the
  *                                    table with only the surviving days
  *                                    (delete-as-rewrite, the columnar way)
  *
  * Scale notes: partitioning by day keeps every write and every downstream
  * date-range scan pruned to the touched partitions; dynamic partition
  * overwrite gives idempotent re-runs (the reference's `_exists` guards
  * become unnecessary — re-running a day replaces that day exactly).
  */
object SnapshotStore {

  /** L1 (etl.dart:115-121): insert a daily snapshot, history kept. */
  def appendDaily(snapshot: DataFrame, path: String): Unit =
    snapshot.write.mode(SaveMode.Append).partitionBy("day").parquet(path)

  /** L2 (etl.dart:108-113, :334-337): the 1-row-per-entity "latest" table —
    * full overwrite, no partitions. */
  def overwriteLatest(latest: DataFrame, path: String): Unit =
    latest.write.mode(SaveMode.Overwrite).parquet(path)

  /** L3 (etl.dart:271, :351-358): upsert keyed by day — dynamic partition
    * overwrite replaces exactly the days present in `snapshot`. */
  def upsertDays(snapshot: DataFrame, path: String): Unit =
    snapshot.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day")
      .parquet(path)

  /** L4/L5 (etl.dart:270, :282-283, :384-395): keep only days satisfying
    * `keep` — retention as a rewrite of survivors. Reads the table itself,
    * so the caller must pass the table's current path.
    *
    * Durability protocol: survivors are written to a temp sibling path
    * FIRST, and only after that write commits is the source swapped out
    * (delete + rename). The earlier cache()+count()-then-overwrite-source
    * formulation was unsafe: a cache is not a durability barrier — lose a
    * cached partition mid-write (eviction, task retry) and Spark recomputes
    * from the already-half-overwritten source, silently destroying data.
    * On HDFS/local the rename is a metadata op; on an object store this
    * step is where a table format (Iceberg/Delta snapshot commit) takes
    * over — the temp-write-then-swap shape is the same. For multi-writer
    * safety and reader isolation during commits, use [[VersionedStore]]:
    * manifest-as-commit-point + atomically renamed `_current` pointer. */
  def retainWhere(spark: org.apache.spark.sql.SparkSession, path: String,
                  keep: org.apache.spark.sql.Column): Unit =
    rewriteSwap(spark, path)(_.filter(keep))

  /** Shared crash-safe rewrite protocol: heal any interrupted prior swap
    * ([[recoverInterruptedSwap]]), read the table, apply `build`, write the
    * result to a temp sibling, then swap (delete + rename). */
  /** Recovery half of the swap protocol, callable on its own: `tmp exists
    * && target missing` is an interrupted swap from a prior run — tmp holds
    * the ONLY copy, so recovery COMPLETES the rename (deleting tmp there
    * would destroy the table); a tmp alongside an intact target is pre-swap
    * debris and is discarded. Any reader of the store's directory layout
    * (not just the next rewrite) must run this first — [[compactDays]]
    * lists day partitions before rewriting and would otherwise throw
    * FileNotFoundException on a crashed-mid-swap store that
    * [[retainWhere]] knows how to heal. */
  private def recoverInterruptedSwap(fs: org.apache.hadoop.fs.FileSystem,
                                     target: org.apache.hadoop.fs.Path,
                                     tmp: org.apache.hadoop.fs.Path): Unit =
    if (fs.exists(tmp) && !fs.exists(target)) {
      if (!fs.rename(tmp, target))
        throw new java.io.IOException(
          s"rewriteSwap: recovery rename $tmp -> $target failed; survivors intact at $tmp")
    } else if (fs.exists(tmp)) {
      fs.delete(tmp, true)
    }

  private def rewriteSwap(spark: org.apache.spark.sql.SparkSession, path: String)
                         (build: DataFrame => DataFrame): Unit = {
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(path + RetainTmpSuffix)
    recoverInterruptedSwap(fs, target, tmp)
    build(spark.read.parquet(path))
      .write.mode(SaveMode.Overwrite).partitionBy("day").parquet(tmp.toString)
    // The rewrite is durable on disk from here on; the source is untouched
    // until this point, so any failure above leaves the table intact.
    if (!fs.delete(target, true))
      throw new java.io.IOException(s"rewriteSwap: failed to remove $target for swap")
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(
        s"rewriteSwap: swap rename $tmp -> $target failed; survivors intact at $tmp")
  }

  /** Small-file compaction — the operational cost a streaming upsert
    * ([[graft.streaming.OnlineTimeStream.startToStore]]) accrues: every
    * micro-batch adds files, and at 100 TB a day partition with 10k tiny
    * files turns each scan into 10k opens. Rewrite each day into
    * max(1, ceil(dayBytes / targetBytes)) files. Per-day byte sizes come
    * from FILESYSTEM METADATA (no data scan); rows are salted by a hash of
    * their columns into that many shuffle cells per day, and the rewrite
    * rides the same crash-safe temp-swap as retention. File counts are an
    * upper bound per day (hash cells of one day may coalesce into the same
    * shuffle partition) — never more files than asked, never fewer than 1. */
  def compactDays(spark: org.apache.spark.sql.SparkSession, path: String,
                  targetBytes: Long = 128L << 20): Unit = {
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    // Heal a crashed-mid-swap store BEFORE listing it: with tmp present and
    // target missing, the listStatus below would throw even though the
    // table is fully recoverable.
    recoverInterruptedSwap(fs, target, new org.apache.hadoop.fs.Path(path + RetainTmpSuffix))
    val perDayFiles: Seq[(String, Long)] = fs.listStatus(target).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("day="))
      .map { d =>
        val bytes = fs.listStatus(d.getPath).filter(_.isFile).map(_.getLen).sum
        (d.getPath.getName.stripPrefix("day="),
          math.max(1L, (bytes + targetBytes - 1) / targetBytes))
      }
    if (perDayFiles.isEmpty) return
    import spark.implicits._
    val nf = broadcast(perDayFiles.toDF("day", "__nf"))
    rewriteSwap(spark, path) { df =>
      val dataCols = df.columns.filterNot(_ == "day")
      df.withColumn("day", col("day").cast("string"))
        .join(nf, Seq("day"))
        .withColumn("__salt", pmod(hash(dataCols.map(col).toIndexedSeq: _*), col("__nf")))
        .repartition(col("day"), col("__salt"))
        .drop("__nf", "__salt")
    }
  }

  /** Temp-path suffix used by [[retainWhere]]'s write-then-swap protocol. */
  val RetainTmpSuffix = ".__retain_tmp"

  /** Point read of one day — partition-pruned (S6/S8). */
  def readDay(spark: org.apache.spark.sql.SparkSession, path: String, day: String): DataFrame =
    spark.read.parquet(path).filter(col("day") === day)
}
