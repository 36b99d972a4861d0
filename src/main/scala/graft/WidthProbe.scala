package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sinks.VersionedStore

/** SYNTHETIC-WIDTH leg for the storage tier (PERF.md round 13): the
  * manifest-decade probe measured real appends up to 10⁴ dirs; its open
  * question was checkpoint-READ headroom — checkpoints are O(state)
  * (3.3 MB at 10⁴ ⇒ ~35 MB at 10⁵) and a fresh reader pays one full
  * checkpoint parse before its first plan. Building 10⁵ dirs by real
  * one-row appends would take half a day for no extra information, so
  * the WIDTH is synthesized (the VERDICT-sanctioned shape): one real
  * one-row dir hard-linked into 10⁵ sibling dirs, one wide manifest
  * publishing them all with synthesized per-dir key stats (min=max=i,
  * rows=1), a short real delta tail, and an [[VersionedStore.expire]]
  * that materializes the at-width checkpoint through the product path.
  * The MEASURE phase then runs in a FRESH JVM (cold caches — the
  * fresh-reader story), timing:
  *
  *   plan_sec        prunedDirs over a point ColRange — resolvedState's
  *                   delta-tail walk + the full checkpoint parse + the
  *                   10⁵-entry stats prune (THE fresh-reader cost)
  *   plan_warm_sec   the same plan again (parsed-state caches hot)
  *   count_meta_sec  metadata-only countWhere over the full key range
  *   append_sec      one real commitAppend at width + its delta bytes
  *                   (the flat-commit claim at 10× the measured decade)
  *   point_read_sec  prunedDirs + the 1-dir read it bounds
  *
  * Usage: runMain graft.WidthProbe [dirs]  (parent builds, then spawns
  * the measure child — the [[ContentionProbe]] fresh-JVM pattern). */
object WidthProbe {

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("measure") => measureMain(args(1), args(2).toInt)
    case _ => parentMain(args.headOption.map(_.toInt).getOrElse(100000))
  }

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "7")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def parentMain(n: Int): Unit = {
    import scala.jdk.CollectionConverters._
    val spark = session()
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory(s"graft-width$n").toString
    System.err.println(s"[width] building synthetic $n-dir store at $root ...")
    val tB0 = System.nanoTime()

    // One REAL one-row dir: the template every synthetic dir hard-links.
    // `h` is the BLOOM leg's column: its synthesized ranges are useless
    // (every synth dir spans 1..n), so the per-dir bloom is the only
    // pruner — the unsorted-point-key shape at width.
    VersionedStore.commitAppend(Seq((0L, 0.0, 0L)).toDF("k", "v", "h"), root,
      statsCols = Seq("k"))
    val realDir = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("data-")).head
    val part = realDir.listFiles().filter(_.getName.endsWith(".parquet")).head

    // n synthetic dirs (the ~1 KB template COPIED per dir — hard links
    // hit ext4's 65k-links-per-inode cap at this width) with synthesized
    // per-dir stats: dir i holds key i exactly. The stats are what
    // plan/count read; the bytes behind them are the template's.
    val synthDirs = (1 to n).map(i => f"data-synth-$i%07d")
    val stats = scala.collection.mutable.Map.empty[String, String]
    // the carried template needs its stats re-stated on the full
    // manifest too, or every plan keeps it as a stats-less dir
    def bloomB64(value: String): String = {
      val bf = org.apache.spark.util.sketch.BloomFilter.create(64, 0.01)
      bf.putString(value)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
    }
    stats ++= Seq(
      s"${realDir.getName}|k|min" -> "0", s"${realDir.getName}|k|max" -> "0",
      s"${realDir.getName}|k|typ" -> "long",
      s"${realDir.getName}|k|nulls" -> "0", s"${realDir.getName}|#|rows" -> "1",
      s"${realDir.getName}|#|bytes" -> part.length.toString,
      s"${realDir.getName}|h|min" -> "0", s"${realDir.getName}|h|max" -> "0",
      s"${realDir.getName}|h|typ" -> "long",
      s"${realDir.getName}|h|nulls" -> "0",
      s"${realDir.getName}|h|bloom" -> bloomB64("0"))
    synthDirs.zipWithIndex.foreach { case (d, idx) =>
      val i = idx + 1
      val dir = java.nio.file.Paths.get(root, d)
      java.nio.file.Files.createDirectory(dir)
      java.nio.file.Files.copy(part.toPath, dir.resolve(part.getName))
      stats ++= Seq(
        s"$d|k|min" -> i.toString, s"$d|k|max" -> i.toString,
        s"$d|k|typ" -> "long", s"$d|k|nulls" -> "0", s"$d|#|rows" -> "1",
        s"$d|#|bytes" -> part.length.toString,
        // useless range (full span), discriminating bloom (key i only)
        s"$d|h|min" -> "1", s"$d|h|max" -> n.toString,
        s"$d|h|typ" -> "long", s"$d|h|nulls" -> "0",
        s"$d|h|bloom" -> bloomB64(i.toString))
    }
    // The wide commit: one full manifest referencing every synthetic dir
    // (plus the template), stats riding it — the state a 10⁵-append
    // store would have resolved to.
    VersionedStore.publish(spark, root, 2L, synthDirs.last,
      baseDirs = Seq(realDir.getName), extraNewDirs = synthDirs.init,
      schemaDdl = Some("k BIGINT,v DOUBLE,h BIGINT"), stats = stats.toMap)
    // Short REAL delta tail, then expire materializes the at-width
    // checkpoint for the oldest survivor through the product path.
    ((n + 1) to (n + 20)).foreach { i =>
      VersionedStore.commitAppend(
        Seq((i.toLong, i * 2.0, -1L)).toDF("k", "v", "h"),
        root, statsCols = Seq("k"))
    }
    VersionedStore.expire(spark, root, keepLast = 20)
    val buildSec = (System.nanoTime() - tB0) / 1e9
    // a checkpoint's footprint = its main record + any part sidecars
    val cpBytes = new java.io.File(s"$root/_manifests").listFiles()
      .filter(f => f.getName.contains(".checkpoint") && !f.getName.contains(".tmp-"))
      .groupBy(_.getName.takeWhile(_ != '.')).values.map(_.map(_.length).sum).max
    System.err.println(f"[width] built in $buildSec%.1f s, checkpoint $cpBytes bytes")

    // Fresh JVM for the cold-reader measurements.
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toSeq
    val pb = new ProcessBuilder((Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", System.getProperty("java.class.path"),
        "graft.WidthProbe", "measure", root, n.toString)).asJava)
    pb.redirectErrorStream(false)
    pb.inheritIO()
    require(pb.start().waitFor() == 0, "measure child failed")

    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    spark.stop()
  }

  private def measureMain(root: String, n: Int): Unit = {
    val spark = session()
    import spark.implicits._
    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    val v = VersionedStore.currentVersion(spark, root)
    val mid = (n / 2).toString
    val tP0 = System.nanoTime()
    val opened = VersionedStore.prunedDirs(spark, root, v,
      Seq(VersionedStore.ColRange.eq("k", mid)))
    val planSec = secs(tP0)
    require(opened.size == 1, s"point range must prune to 1 dir, got ${opened.size}")
    val tW0 = System.nanoTime()
    VersionedStore.prunedDirs(spark, root, v,
      Seq(VersionedStore.ColRange.eq("k", mid)))
    val planWarmSec = secs(tW0)

    val tC0 = System.nanoTime()
    val cnt = VersionedStore.countWhere(spark, root,
      Seq(VersionedStore.ColRange("k", Some("1"), Some(n.toString))))
    val countSec = secs(tC0)
    require(cnt == n.toLong, s"metadata count must see all $n synth rows, got $cnt")

    val tA0 = System.nanoTime()
    val v2 = VersionedStore.commitAppend(
      Seq((n + 999L, 1.0, -1L)).toDF("k", "v", "h"), root, statsCols = Seq("k"))
    val appendSec = secs(tA0)
    val mf = new java.io.File(s"$root/_manifests/$v2.json")
    val deltaBytes = mf.length()

    val tR0 = System.nanoTime()
    val pointRows = VersionedStore.readAt(spark, root, v,
      Seq(VersionedStore.ColRange.eq("k", mid))).count()
    val pointReadSec = secs(tR0)

    // The DATA SOURCE path at width: relation construction (manifest
    // resolution only — the prune-first FileIndex lists NO dirs up
    // front) + the pushed point filter pruning to ~1 dir + its scan.
    // Key 0 (the template dir's REAL row): synthetic dirs' stats
    // describe keys their template bytes don't hold, and the scan
    // re-applies the predicate on rows — the plan cost is identical,
    // key 0 also verifies the value arrives. Cold = first relation over
    // this store in this JVM; warm = again (manifest + listing caches
    // hot).
    val tD0 = System.nanoTime()
    val dsv2Rows = spark.read.format("graftstore").load(root)
      .filter(org.apache.spark.sql.functions.col("k") === 0L).count()
    val dsv2Sec = secs(tD0)
    require(dsv2Rows >= 1L, "dsv2 point read must see the template row (key 0)")
    val tD1 = System.nanoTime()
    spark.read.format("graftstore").load(root)
      .filter(org.apache.spark.sql.functions.col("k") === 0L).count()
    val dsv2WarmSec = secs(tD1)

    // BLOOM leg — the unsorted-point-key shape at width: h's ranges
    // keep every synth dir, so the plan consults one bloom PER
    // RANGE-SURVIVING DIR (all n of them). Cold = every decode misses;
    // "warm" = the LRU bloom cache holds only its cap (8192 < n), so a
    // full sweep still re-decodes — the number proves the decode path
    // itself is flat-per-dir and eviction never cliffs it. The dsv2 row
    // drives the same skipping through the pushed SQL filter (h = 0
    // keeps ONLY the template's bloom) and verifies the value arrives.
    val midDir = f"data-synth-${n / 2}%07d"
    val tBl0 = System.nanoTime()
    val bloomOpened = VersionedStore.prunedDirs(spark, root, v,
      Seq(VersionedStore.ColRange.eq("h", mid)))
    val bloomPlanSec = secs(tBl0)
    require(bloomOpened.contains(midDir),
      s"bloom prune must keep the matching dir $midDir")
    require(bloomOpened.size <= 30,
      s"bloom must prune the synth width to the stat-less tail, " +
        s"got ${bloomOpened.size} dirs")
    val tBl1 = System.nanoTime()
    VersionedStore.prunedDirs(spark, root, v,
      Seq(VersionedStore.ColRange.eq("h", mid)))
    val bloomPlanWarmSec = secs(tBl1)
    // the dsv2 sweep: h = mid keeps every synth dir by range, so the
    // pushed filter's prune decodes all n blooms inside the FileIndex
    // (dir mid survives; its template bytes hold no h=mid row, and the
    // scan's re-applied predicate returns none — skipping is never a
    // filter). h = 0 then verifies the value path cheaply: the synth
    // RANGES already exclude 0, only the template's bloom+range keep it.
    val tBl2 = System.nanoTime()
    val bloomSweepRows = spark.read.format("graftstore").load(root)
      .filter(org.apache.spark.sql.functions.col("h") === mid.toLong).count()
    val dsv2BloomSec = secs(tBl2)
    require(bloomSweepRows == 0L,
      s"no real row holds h=$mid, got $bloomSweepRows")
    val bloomRows = spark.read.format("graftstore").load(root)
      .filter(org.apache.spark.sql.functions.col("h") === 0L).count()
    require(bloomRows == 1L,
      s"dsv2 bloom point read must see exactly the template row, got $bloomRows")

    // a checkpoint's footprint = its main record + any part sidecars
    val cpBytes = new java.io.File(s"$root/_manifests").listFiles()
      .filter(f => f.getName.contains(".checkpoint") && !f.getName.contains(".tmp-"))
      .groupBy(_.getName.takeWhile(_ != '.')).values.map(_.map(_.length).sum).max
    println(s"""{"metric":"store_width_synth","dirs":$n,""" +
      f""""plan_sec":$planSec%.3f,"plan_warm_sec":$planWarmSec%.3f,""" +
      f""""count_meta_sec":$countSec%.3f,""" +
      f""""append_sec":$appendSec%.3f,"append_delta_bytes":$deltaBytes,""" +
      f""""point_read_sec":$pointReadSec%.3f,"point_read_rows":$pointRows,""" +
      f""""dsv2_point_sec":$dsv2Sec%.3f,"dsv2_point_warm_sec":$dsv2WarmSec%.3f,""" +
      f""""bloom_plan_sec":$bloomPlanSec%.3f,""" +
      f""""bloom_plan_warm_sec":$bloomPlanWarmSec%.3f,""" +
      f""""dsv2_bloom_sec":$dsv2BloomSec%.3f,""" +
      s""""max_checkpoint_bytes":$cpBytes}""")
    spark.stop()
  }
}
