package graft

import org.apache.spark.sql.SparkSession
import graft.sinks.VersionedStore

/** MULTI-WRITER CONTENTION probe: the CAS retry path (stale-base aborts
  * via the manifest's create-if-absent arbitration) is spec-gated for
  * correctness but was never MEASURED under real cross-process
  * contention. Two (or more) OS processes append concurrently to the
  * same wide store; each records per-commit wall latency and retry
  * counts. The claims under test:
  *
  *   - PROGRESS: every writer lands every one of its K commits (the
  *     retry loop cannot starve — each conflict means someone else
  *     committed, so global progress is guaranteed; per-writer fairness
  *     is what the telemetry shows).
  *   - ISOLATION: the final version is exactly base + writers×K, and the
  *     final snapshot holds every writer's every batch — no lost update,
  *     no interleaved corruption.
  *   - COST: commit latency under contention vs the single-writer
  *     baseline; retries are the price of optimistic concurrency and the
  *     telemetry prices them.
  *
  * Usage (parent): runMain graft.ContentionProbe [baseDirs] [K] [writers]
  * Children are re-invocations of this main with `writer` argv[0] —
  * same classpath/JVM args, the [[Bench.isolatedRun]] pattern. */
object ContentionProbe {

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("writer") => writerMain(args(1), args(2), args(3).toInt, args(4))
    case Some("maint")  => maintMain(args(1), args(2), args(3))
    case _ => parentMain(
      args.headOption.map(_.toInt).getOrElse(200),
      args.lift(1).map(_.toInt).getOrElse(20),
      args.lift(2).map(_.toInt).getOrElse(2),
      args.lift(3).exists(_.toBoolean))
  }

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** One writer process: K retry-looped appends of tiny distinct batches.
    * Emits a single JSON line of telemetry to `outFile`. */
  private def writerMain(root: String, writerId: String, k: Int,
                         outFile: String): Unit = {
    val spark = session(4)
    import spark.implicits._
    var retries = 0
    var maxRetryOneCommit = 0
    val latencies = new scala.collection.mutable.ArrayBuffer[Double](k)
    (1 to k).foreach { i =>
      val df = Seq((s"$writerId-$i", writerId, i.toLong)).toDF("id", "writer", "seq")
      val t0 = System.nanoTime()
      var committed = false
      var myRetries = 0
      while (!committed) {
        try { VersionedStore.commitAppend(df, root, statsCols = Seq("seq")); committed = true }
        catch { case _: VersionedStore.CommitConflict =>
          VersionedStore.backoffOnConflict(myRetries); myRetries += 1 }
      }
      retries += myRetries
      maxRetryOneCommit = math.max(maxRetryOneCommit, myRetries)
      latencies += (System.nanoTime() - t0) / 1e9
    }
    val sorted = latencies.sorted
    val line = f"""{"writer":"$writerId","commits":$k,"retries":$retries,""" +
      f""""max_retries_one_commit":$maxRetryOneCommit,""" +
      f""""mean_commit_sec":${latencies.sum / k}%.3f,""" +
      f""""p50_commit_sec":${sorted(k / 2)}%.3f,""" +
      f""""max_commit_sec":${sorted.last}%.3f}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      line.getBytes("UTF-8"))
    spark.stop()
  }

  /** MAINTENANCE process: loops expire → vacuum → (every 3rd round)
    * optimize against the live store until `stopFile` appears, then one
    * final round. expire(keepLast = 64) keeps far more versions than any
    * writer's delta-chain walk spans (checkpoint cadence ≤ 16 at these
    * widths), vacuum runs with a 10 s age floor so an in-flight prepare
    * is never reaped, and optimize retries its CAS like any writer.
    * This leg deliberately runs OUTSIDE expire's documented maintenance
    * window: it measures that the damage-limitation tier (the post-
    * delete re-list loop, the age-guarded vacuum, optimize's stale-base
    * abort) holds under real interleaving — no lost rows, no reader
    * failure. Emits one JSON telemetry line to `outFile`. */
  private def maintMain(root: String, stopFile: String, outFile: String): Unit = {
    import org.apache.spark.sql.functions.col
    val spark = session(4)
    var rounds, expires, vacuums, optimizes, optConflicts = 0
    var errors = List.empty[String]
    var stop = false
    while (!stop) {
      stop = java.nio.file.Files.exists(java.nio.file.Paths.get(stopFile))
      rounds += 1
      try { VersionedStore.expire(spark, root, keepLast = 64); expires += 1 }
      catch { case e: Throwable => errors ::= s"expire:${e.getClass.getSimpleName}" }
      try { VersionedStore.vacuum(spark, root, minAgeMs = 10000L); vacuums += 1 }
      catch { case e: Throwable => errors ::= s"vacuum:${e.getClass.getSimpleName}" }
      if (rounds % 3 == 0) {
        try {
          VersionedStore.optimize(spark, root, col("seq"), buckets = 4,
            statsCols = Seq("seq"))
          optimizes += 1
        } catch {
          case _: VersionedStore.CommitConflict => optConflicts += 1
          case e: Throwable => errors ::= s"optimize:${e.getClass.getSimpleName}"
        }
      }
    }
    val line = s"""{"role":"maint","rounds":$rounds,"expires":$expires,""" +
      s""""vacuums":$vacuums,"optimizes":$optimizes,""" +
      s""""optimize_conflicts":$optConflicts,""" +
      s""""errors":[${errors.map(e => "\"" + e + "\"").mkString(",")}]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      line.getBytes("UTF-8"))
    spark.stop()
    // errors are reported, not fatal here — the parent decides what the
    // contract tolerates (writer rows and reader health are ITS gates)
  }

  private def parentMain(baseDirs: Int, k: Int, writers: Int,
                         withMaint: Boolean = false): Unit = {
    import scala.jdk.CollectionConverters._
    val spark = session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "7").toInt)
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-contend").toString
    // Base table at width: baseDirs tiny appends (the manifest/state term
    // the contention rides on — conflicts at width re-read a wide state).
    System.err.println(s"[contend] building $baseDirs-dir base ...")
    (1 to baseDirs).foreach { i =>
      VersionedStore.commitAppend(
        Seq((s"base-$i", "base", i.toLong)).toDF("id", "writer", "seq"),
        root, statsCols = Seq("seq"))
    }
    // Single-writer latency baseline over the last 5% of the base build
    // would be polluted by this JVM's warmup; measure it explicitly:
    val tBase0 = System.nanoTime()
    (1 to 5).foreach { i =>
      VersionedStore.commitAppend(
        Seq((s"warm-$i", "base", i.toLong)).toDF("id", "writer", "seq"),
        root, statsCols = Seq("seq"))
    }
    val soloSec = (System.nanoTime() - tBase0) / 1e9 / 5
    val v0 = VersionedStore.currentVersion(spark, root)
    val rows0 = VersionedStore.read(spark, root).get.count()

    val javaBin = System.getProperty("java.home") + "/bin/java"
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toSeq
    val cp = System.getProperty("java.class.path")
    val outs = (1 to writers).map(w =>
      java.nio.file.Files.createTempFile(s"graft-contend-w$w", ".json"))
    val stopFile = java.nio.file.Files.createTempDirectory("graft-contend-stop")
      .resolve("stop")
    val maintOut = java.nio.file.Files.createTempFile("graft-contend-maint", ".json")
    def spawn(argv: Seq[String], tag: String) = {
      val pb = new ProcessBuilder((Seq(javaBin) ++ jvmArgs ++ Seq("-cp", cp,
        "graft.ContentionProbe") ++ argv).asJava)
      pb.redirectErrorStream(true)
      pb.redirectOutput(java.io.File.createTempFile(s"graft-contend-log$tag", ".txt"))
      pb.start()
    }
    val t0 = System.nanoTime()
    // The maintenance process (expire/vacuum/optimize loop) starts FIRST
    // so writers land on a store already under maintenance churn.
    val maintProc = if (withMaint)
      Some(spawn(Seq("maint", root, stopFile.toString, maintOut.toString), "m"))
    else None
    val procs = (1 to writers).map { w =>
      spawn(Seq("writer", root, s"w$w", k.toString, outs(w - 1).toString), w.toString)
    }
    val rcs = procs.map(_.waitFor())
    val wallSec = (System.nanoTime() - t0) / 1e9
    maintProc.foreach { mp =>
      java.nio.file.Files.createFile(stopFile)
      require(mp.waitFor() == 0, "maintenance process failed")
    }
    require(rcs.forall(_ == 0), s"writer process failed: rcs=$rcs")

    // ISOLATION: every batch present. Without maintenance the version
    // count is exact (base + writers×K); with optimize/expire interleaved
    // versions both grow (compactions) and drop (expire), so the row-level
    // gates below are the invariant — no writer's committed batch may be
    // lost to a maintenance pass, and the final snapshot must read clean.
    val v1 = VersionedStore.currentVersion(spark, root)
    if (!withMaint)
      require(v1 == v0 + writers * k,
        s"expected ${v0 + writers * k} final versions, got $v1 — a commit was lost")
    val snap = VersionedStore.read(spark, root).get
    val got = snap.filter($"writer".startsWith("w")).count()
    require(got == writers.toLong * k,
      s"expected ${writers * k} writer rows, got $got — rows lost under contention")
    require(snap.count() == rows0 + writers * k, "base rows must be intact")

    val writerStats = outs.map(o =>
      new String(java.nio.file.Files.readAllBytes(o), "UTF-8"))
    val maintStats = maintProc.map(_ =>
      new String(java.nio.file.Files.readAllBytes(maintOut), "UTF-8"))
    println(s"""{"metric":"contention","base_dirs":$baseDirs,"writers":$writers,""" +
      s""""commits_per_writer":$k,"final_version":$v1,""" +
      f""""solo_commit_sec":$soloSec%.3f,"wall_sec":$wallSec%.2f,""" +
      s""""writer_stats":[${writerStats.mkString(",")}]""" +
      maintStats.fold("")(m => s""","maint_stats":$m""") + "}")
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    spark.stop()
  }
}
