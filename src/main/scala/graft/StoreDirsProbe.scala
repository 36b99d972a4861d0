package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sinks.VersionedStore

/** Dir-count decade leg for the storage tier (PERF.md round 11): the
  * round-10 DML/CDC probes ran at 10–96 dirs, small enough that the
  * manifest term hides — every manifest carries ALL dirs' flat stats and
  * is regex-parsed per read, so manifest work grows with TABLE WIDTH
  * (dir count), independent of row count. This probe builds key-ranged
  * ORDERS stores at ~100 and ~1000 dirs from the same sf corpus (so ONLY
  * the dir count changes) and times the manifest-bound operations:
  *
  *   ingest_sec        N sequential appends (manifest write is O(N) per
  *                     append → the curve exposes the O(N²) total term)
  *   parse_plan_sec    prunedDirs over a point ColRange (one manifest
  *                     read + stats parse + prune sweep)
  *   count_meta_sec    countWhere on an aligned range (metadata-only)
  *   delete_pruned_sec deleteWhere bounded by stats to one dir
  *   probe_all_sec     the single-job existence probe over EVERY dir
  *                     (deleteWhere with no prune, no-match predicate —
  *                     probe cost only, nothing rewrites)
  *   merge_sec         mergeInto of a one-dir-sized batch (derived key
  *                     ranges bound the probe)
  *   cdc_sec           readChanges over the last 10 versions + count
  *
  * A third arg adds the MANIFEST-DECADE leg: stores of n tiny (one-row)
  * appends at e.g. 100,1000,10000 dirs, so the parquet write is a small
  * CONSTANT and the per-append curve exposes the manifest term alone —
  * the log-segment format's flatness claim (an O(table-dirs) manifest
  * rewrite per append showed here as a linear last_append curve and an
  * O(N²) ingest total). Reported per leg: total + last-append mean over
  * the final 10% of commits, delta-manifest bytes, checkpoint count and
  * max bytes, plan/count latencies, expire+vacuum at width.
  *
  * Fresh-JVM protocol. Usage:
  *   runMain graft.StoreDirsProbe <sfDir> [n1,n2] [m1,m2,...] */
object StoreDirsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def ints(s: Option[String], dflt: String): Seq[Int] =
      s.getOrElse(dflt).split(",").map(_.trim).filter(_.matches("\\d+"))
        .map(_.toInt).filter(_ > 0).toSeq
    val sizes = ints(args.lift(1), "100,1000")
    val manifestSizes = ints(args.lift(2), "")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "7")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .persist()
    orders.count()
    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    sizes.foreach { n =>
      val qs = orders.stat.approxQuantile(
        "o_orderkey", (1 until n).map(_.toDouble / n).toArray, 1e-6).map(_.toLong).distinct
      val lows = Long.MinValue +: qs.toSeq
      val highs = qs.toSeq :+ Long.MaxValue
      val root = java.nio.file.Files.createTempDirectory(s"graft-dirs$n").toString
      val tIn0 = System.nanoTime()
      var lastAppendSec = 0.0
      lows.zip(highs).foreach { case (lo, hi) =>
        val tA = System.nanoTime()
        VersionedStore.commitAppend(
          orders.filter(col("o_orderkey") >= lo && col("o_orderkey") < hi),
          root, statsCols = Seq("o_orderkey"))
        lastAppendSec = secs(tA)
      }
      val ingestSec = secs(tIn0)
      val v = VersionedStore.currentVersion(spark, root)
      val dirs = VersionedStore.prunedDirs(spark, root, v, Seq.empty)
      val manifestBytes = {
        val p = new org.apache.hadoop.fs.Path(s"$root/_manifests/$v.json")
        p.getFileSystem(spark.sessionState.newHadoopConf()).getFileStatus(p).getLen
      }

      // mid-table slice bounds for the targeted ops
      val (lo5, hi5) = (lows(lows.length / 2), highs(lows.length / 2))
      val midRange = VersionedStore.ColRange(
        "o_orderkey", Some(lo5.toString), Some((hi5 - 1).toString))

      val tP0 = System.nanoTime()
      val opened = VersionedStore.prunedDirs(spark, root, v, Seq(midRange))
      val parseSec = secs(tP0)
      require(opened.size <= 2, s"point range must prune to ~1 dir, got ${opened.size}")

      val tC0 = System.nanoTime()
      val cnt = VersionedStore.countWhere(spark, root, Seq(midRange))
      val countSec = secs(tC0)
      require(cnt > 0)

      // change feed over the last 10 APPENDS (a feed across the DML
      // below is a snapshot rewrite and correctly refuses dir-level diff)
      val tF0 = System.nanoTime()
      val feed = VersionedStore.readChanges(spark, root, sinceVersion = v - 10,
        toVersion = v).map(_.count()).getOrElse(0L)
      val cdcSec = secs(tF0)
      require(feed > 0, "the last 10 appends must appear in the change feed")

      // single-job probe over EVERY dir: no-match predicate → pure probe
      val tA0 = System.nanoTime()
      val vNoop = VersionedStore.deleteWhere(spark, root,
        col("o_orderstatus") === "NO_SUCH_STATUS")
      val probeAllSec = secs(tA0)
      require(vNoop == v, "no-match delete must be a version-less no-op")

      val tD0 = System.nanoTime()
      val vDel = VersionedStore.deleteWhere(spark, root,
        col("o_orderstatus") === "F" &&
          col("o_orderkey") >= lo5 && col("o_orderkey") < hi5,
        prune = Seq(midRange), statsCols = Seq("o_orderkey"))
      val deleteSec = secs(tD0)

      // one-dir-sized upsert batch: keys inside the mid slice
      val batch = orders
        .filter(col("o_orderkey") >= lo5 && col("o_orderkey") < hi5)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val tM0 = System.nanoTime()
      val vMrg = VersionedStore.mergeInto(spark, root, batch,
        keys = Seq("o_orderkey"), statsCols = Seq("o_orderkey"))
      val mergeSec = secs(tM0)
      require(vMrg == vDel + 1)

      // Conditional BY SOURCE merge (round 16): the clause family whose
      // UNCONDITIONAL form is an every-dir rewrite by definition — here
      // the condition must bound the rewrite through the one-job
      // existence probe, so cost at width is the probe term plus O(the
      // matching dirs), never O(all dirs) of rewrites. The source
      // matches nothing (negative keys; stats prune every candidate),
      // so the rewrite set is purely probe-driven.
      val dirsPre = VersionedStore.prunedDirs(spark, root, vMrg, Seq.empty).toSet
      val bysSource = spark.range(1, 3)
        .select((-col("id")).as("o_orderkey"))
      val tB0 = System.nanoTime()
      val vBys = VersionedStore.mergeIntoClauses(spark, root, bysSource,
        keys = Seq("o_orderkey"),
        matched = Seq.empty, insertNotMatched = None,
        notMatchedBySource = Seq(VersionedStore.MergeMatched.Update(
          Some(expr(s"t.o_orderkey >= $lo5 AND t.o_orderkey < $hi5")),
          Map("o_totalprice" -> expr("t.o_totalprice + 1")))),
        statsCols = Seq("o_orderkey"))
      val bySourceSec = secs(tB0)
      require(vBys == vMrg + 1, "the conditional BY SOURCE merge must commit")
      val dirsPost = VersionedStore.prunedDirs(spark, root, vBys, Seq.empty).toSet
      val bysRewritten = dirsPre.diff(dirsPost).size
      require(bysRewritten <= 3,
        s"conditional BY SOURCE must rewrite only the condition-matching " +
          s"dirs, rewrote $bysRewritten of ${dirsPre.size}")

      // DELETION-VECTOR scatter leg (round 17): the delete shape where
      // copy-on-write is O(touched dirs × dir size) — matching rows
      // sprinkled across the table — done merge-on-read: per-dir
      // position sidecars, ZERO data dirs rewritten. The copy-on-write
      // TWIN runs right after on the same store (an equal-density
      // scattered prime), so the decade carries both curves over the
      // same touched-dir population: dv pays probe + tiny sidecar
      // writes, CoW pays probe + every touched dir's full rewrite.
      val dirsPreDv = VersionedStore.prunedDirs(spark, root, vBys, Seq.empty).toSet
      val tDv0 = System.nanoTime()
      val vDv = VersionedStore.deleteWhereDv(spark, root,
        col("o_orderkey") % 97 === 0)
      val dvScatterSec = secs(tDv0)
      val dirsPostDv = VersionedStore.prunedDirs(spark, root, vDv, Seq.empty).toSet
      require(dirsPostDv == dirsPreDv,
        s"merge-on-read must rewrite no dirs: ${dirsPreDv.size} -> ${dirsPostDv.size}")
      val dvSidecars = VersionedStore.statsAt(spark, root, vDv)
        .keys.count(_.endsWith("|#|dv"))
      require(dvSidecars > 0, "the scattered delete must mark something")
      val tCw0 = System.nanoTime()
      val vCw = VersionedStore.deleteWhere(spark, root,
        col("o_orderkey") % 89 === 0)
      val cowScatterSec = secs(tCw0)
      val cowRewritten = dirsPostDv
        .diff(VersionedStore.prunedDirs(spark, root, vCw, Seq.empty).toSet).size

      // Maintenance lifecycle at width: expire old versions (manifest
      // deletes + liveness bookkeeping over ALL manifests) then vacuum
      // (cross-manifest referenced-dir sweep + orphan deletes).
      val before = VersionedStore.read(spark, root).get.count()
      val tE0 = System.nanoTime()
      VersionedStore.expire(spark, root, keepLast = 5)
      val expireSec = secs(tE0)
      val tV0 = System.nanoTime()
      VersionedStore.vacuum(spark, root)
      val vacuumSec = secs(tV0)
      require(VersionedStore.read(spark, root).get.count() == before,
        "expire+vacuum must not change the current snapshot")

      println(s"""{"metric":"store_dirs","sf_dir":"$sfDir","dirs":${dirs.size},""" +
        s""""manifest_bytes":$manifestBytes,""" +
        f""""ingest_sec":$ingestSec%.2f,"last_append_sec":$lastAppendSec%.3f,""" +
        f""""parse_plan_sec":$parseSec%.3f,""" +
        f""""count_meta_sec":$countSec%.3f,"probe_all_sec":$probeAllSec%.2f,""" +
        f""""delete_pruned_sec":$deleteSec%.2f,"merge_sec":$mergeSec%.2f,""" +
        f""""bysource_sec":$bySourceSec%.2f,"bysource_rewritten":$bysRewritten,""" +
        f""""dv_scatter_sec":$dvScatterSec%.2f,"dv_sidecars":$dvSidecars,""" +
        f""""cow_scatter_sec":$cowScatterSec%.2f,"cow_rewritten":$cowRewritten,""" +
        f""""cdc_sec":$cdcSec%.2f,""" +
        f""""expire_sec":$expireSec%.2f,"vacuum_sec":$vacuumSec%.2f}""")

      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }

    // ── Manifest-decade leg: n one-row appends, constant write cost ──
    manifestSizes.foreach { m =>
      import spark.implicits._
      val root = java.nio.file.Files.createTempDirectory(s"graft-mdec$m").toString
      val tailN = math.max(1, m / 10)
      var tailSec = 0.0
      val tIn0 = System.nanoTime()
      (1 to m).foreach { i =>
        val tA = System.nanoTime()
        VersionedStore.commitAppend(
          Seq((i.toLong, i * 2.0)).toDF("k", "v"), root, statsCols = Seq("k"))
        if (i > m - tailN) tailSec += secs(tA)
      }
      val ingestSec = secs(tIn0)
      val lastAppendMean = tailSec / tailN
      val v = VersionedStore.currentVersion(spark, root)
      val hconf = spark.sessionState.newHadoopConf()
      def len(p: String): Long = {
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(hconf).getFileStatus(hp).getLen
      }
      val manifestBytes = len(s"$root/_manifests/$v.json")
      // sizes materialized NOW — expire below deletes dropped checkpoints
      // and a java.io.File handle reports 0 for a deleted file
      val cpLens = new java.io.File(s"$root/_manifests").listFiles
        .filter(_.getName.endsWith(".checkpoint")).map(_.length).toSeq
      val tP0 = System.nanoTime()
      val opened = VersionedStore.prunedDirs(spark, root, v,
        Seq(VersionedStore.ColRange.eq("k", (m / 2).toString)))
      val parseSec = secs(tP0)
      require(opened.size == 1, s"point range must prune to 1 dir, got ${opened.size}")
      val tC0 = System.nanoTime()
      val cnt = VersionedStore.countWhere(spark, root,
        Seq(VersionedStore.ColRange("k", Some("1"), Some(m.toString))))
      val countSec = secs(tC0)
      require(cnt == m.toLong, s"metadata count must see all $m rows, got $cnt")
      val tE0 = System.nanoTime()
      VersionedStore.expire(spark, root, keepLast = 5)
      val expireSec = secs(tE0)
      val tV0 = System.nanoTime()
      VersionedStore.vacuum(spark, root)
      val vacuumSec = secs(tV0)
      require(VersionedStore.read(spark, root).get.count() == m.toLong,
        "expire+vacuum must not change the current snapshot")
      println(s"""{"metric":"manifest_decade","appends":$m,""" +
        f""""ingest_sec":$ingestSec%.2f,"last_append_mean_sec":$lastAppendMean%.4f,""" +
        s""""manifest_bytes":$manifestBytes,"checkpoints":${cpLens.length},""" +
        s""""max_checkpoint_bytes":${if (cpLens.isEmpty) 0L else cpLens.max},""" +
        f""""parse_plan_sec":$parseSec%.3f,"count_meta_sec":$countSec%.3f,""" +
        f""""expire_sec":$expireSec%.2f,"vacuum_sec":$vacuumSec%.2f}""")
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(hconf).delete(p, true)
    }
    spark.stop()
  }
}
