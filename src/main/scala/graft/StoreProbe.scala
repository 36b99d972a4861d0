package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sinks.VersionedStore
import graft.sources.Tables

/** One-shot measurement for the storage-tier mutation paths (PERF.md's
  * delete table): on a fresh 10-append day-ranged events store, time
  *
  *   1. `delete_pruned`   — deleteWhere with the day ColRange prune
  *                          (stats bound the candidates to ONE dir)
  *   2. `delete_unpruned` — same predicate, no prune (existence probes
  *                          sweep every dir; still rewrites only one)
  *   3. `delete_rewrite`  — the naive alternative: filter the whole
  *                          snapshot and commit it (O(table) rewrite)
  *
  * Each variant runs on its own freshly built store (delete mutates, so
  * repeated timing over one store would no-op); build time is reported
  * separately as ingest. Fresh-JVM-per-run protocol like the scale legs:
  * run once per sf dir, compare sf0.1 vs sf1 for the growth exponent.
  *
  * Usage: runMain graft.StoreProbe <sfDir> */
object StoreProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "7")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def freshStore(): (String, Double) = {
      val root = java.nio.file.Files.createTempDirectory("graft-delprobe").toString
      val ev = Tables.events(spark, sfDir).withColumn("day", to_date(col("ts")))
        .select("event_id", "ts", "user_id", "event_type", "value", "day")
      val d0 = java.time.LocalDate.of(2024, 1, 1)
      val t0 = System.nanoTime()
      (0 until 10).foreach { i =>
        VersionedStore.commitAppend(
          ev.filter(col("day").between(
            lit(d0.plusDays(i * 3L).toString).cast("date"),
            lit(d0.plusDays(i * 3L + 2).toString).cast("date"))),
          root, statsCols = Seq("day"))
      }
      (root, (System.nanoTime() - t0) / 1e9)
    }
    def pred = col("event_type") === "click" && col("day") === lit("2024-01-14").cast("date")
    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val v = f
      ((System.nanoTime() - t0) / 1e9, v)
    }

    val (r1, ingest1) = freshStore()
    val (tPruned, _) = timed(VersionedStore.deleteWhere(spark, r1, pred,
      prune = Seq(VersionedStore.ColRange.eq("day", "2024-01-14")),
      statsCols = Seq("day")))
    val (r2, _) = freshStore()
    val (tUnpruned, _) = timed(VersionedStore.deleteWhere(spark, r2, pred,
      statsCols = Seq("day")))
    val (r3, _) = freshStore()
    val (tRewrite, _) = timed {
      val kept = VersionedStore.read(spark, r3).get.filter(not(coalesce(pred, lit(false))))
      VersionedStore.commit(kept, r3, statsCols = Seq("day"))
    }
    // sanity: all three leave the same surviving row count
    def n(root: String): Long = VersionedStore.read(spark, root).get.count()
    require(n(r1) == n(r2) && n(r2) == n(r3),
      s"variants disagree: ${n(r1)} / ${n(r2)} / ${n(r3)}")

    println(s"""{"metric":"store_delete","sf_dir":"$sfDir",""" +
      f""""ingest_10append_sec":$ingest1%.3f,""" +
      f""""delete_pruned_sec":$tPruned%.3f,""" +
      f""""delete_unpruned_sec":$tUnpruned%.3f,""" +
      f""""delete_rewrite_sec":$tRewrite%.3f,""" +
      s""""rows_after":${n(r1)}}""")
    Seq(r1, r2, r3).foreach { r =>
      val p = new org.apache.hadoop.fs.Path(r)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
    spark.stop()
  }
}
