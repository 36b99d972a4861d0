package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sinks.VersionedStore

/** One-shot measurement for the storage-tier mutation paths (PERF.md's
  * delete table): on a fresh 10-append key-ranged ORDERS store, time
  *
  *   1. `delete_pruned`   — deleteWhere with the o_orderkey ColRange
  *                          prune (stats bound the candidates to ONE dir)
  *   2. `delete_unpruned` — same predicate, no prune (existence probes
  *                          sweep every dir; still rewrites only one)
  *   3. `delete_rewrite`  — the naive alternative: filter the whole
  *                          snapshot and commit it (O(table) rewrite)
  *
  * The table is ORDERS, not events: `ScaleBench.synthesize` scales the
  * fact tables and copies events as a dimension, so an events store
  * would be byte-identical at sf0.1 and sf1 and the "sf1" run would
  * measure nothing but page-cache warmth. Appends are CONTIGUOUS
  * o_orderkey range slices (approx-quantile bounds), so the manifest's
  * per-dir [min, max] are disjoint and a keyed delete is prunable to
  * exactly one dir — the aligned-append layout a real ingest produces.
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

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    // 10 contiguous key slices: [q0, q1), [q1, q2), ... — half-open, so
    // the union is exact and per-dir key stats are disjoint.
    val qs = orders.stat.approxQuantile(
      "o_orderkey", (1 until 10).map(_ / 10.0).toArray, 0.0001).map(_.toLong)
    val lows = Long.MinValue +: qs.toSeq
    val highs = qs.toSeq :+ Long.MaxValue

    def freshStore(): (String, Double) = {
      val root = java.nio.file.Files.createTempDirectory("graft-delprobe").toString
      val t0 = System.nanoTime()
      lows.zip(highs).foreach { case (lo, hi) =>
        VersionedStore.commitAppend(
          orders.filter(col("o_orderkey") >= lo && col("o_orderkey") < hi),
          root, statsCols = Seq("o_orderkey"))
      }
      (root, (System.nanoTime() - t0) / 1e9)
    }
    // Target: slice 5's range, further restricted — a realistic "delete
    // these keys' bad rows" mutation wholly inside one dir.
    val (lo5, hi5) = (lows(5), highs(5))
    def pred = col("o_orderstatus") === "F" &&
      col("o_orderkey") >= lo5 && col("o_orderkey") < hi5
    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val v = f
      ((System.nanoTime() - t0) / 1e9, v)
    }

    val (r1, ingest1) = freshStore()
    val (tPruned, _) = timed(VersionedStore.deleteWhere(spark, r1, pred,
      prune = Seq(VersionedStore.ColRange("o_orderkey",
        Some(lo5.toString), Some((hi5 - 1).toString))),
      statsCols = Seq("o_orderkey")))
    val (r2, _) = freshStore()
    val (tUnpruned, _) = timed(VersionedStore.deleteWhere(spark, r2, pred,
      statsCols = Seq("o_orderkey")))
    val (r3, _) = freshStore()
    val (tRewrite, _) = timed {
      val kept = VersionedStore.read(spark, r3).get.filter(not(coalesce(pred, lit(false))))
      VersionedStore.commit(kept, r3, statsCols = Seq("o_orderkey"))
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

    // Probe A/B: the DML existence probe as ONE union-tagged job
    // (VersionedStore.probeMatching) vs the sequential per-dir
    // filter(pred).isEmpty loop it replaced. A no-match predicate makes
    // the probe the WHOLE cost (no rewrite follows), and slicing one
    // 50-dir store's dir list gives both x-axis points without a second
    // ingest. Expectation: the loop grows linearly in dir count (a
    // scheduler round-trip per dir); the single job stays ~flat.
    val probeDirs = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIRS", "50").toInt
    val rootP = java.nio.file.Files.createTempDirectory("graft-probeab").toString
    val qsP = orders.stat.approxQuantile(
      "o_orderkey", (1 until probeDirs).map(_.toDouble / probeDirs).toArray, 0.0001)
      .map(_.toLong)
    (Long.MinValue +: qsP.toSeq).zip(qsP.toSeq :+ Long.MaxValue).foreach {
      case (lo, hi) =>
        VersionedStore.commitAppend(
          orders.filter(col("o_orderkey") >= lo && col("o_orderkey") < hi),
          rootP, statsCols = Seq("o_orderkey"))
    }
    val allDirs = VersionedStore.prunedDirs(spark, rootP,
      VersionedStore.currentVersion(spark, rootP), Seq.empty)
    val noMatch = col("o_orderstatus") === "NO_SUCH_STATUS"
    def probeSeq(dirs: Seq[String]): Double = {
      val t0 = System.nanoTime()
      val hits = dirs.filter { d =>
        !spark.read.parquet(s"$rootP/$d").filter(noMatch).isEmpty }
      require(hits.isEmpty); (System.nanoTime() - t0) / 1e9
    }
    val recordedDdl = VersionedStore.schemaAt(spark, rootP,
      VersionedStore.currentVersion(spark, rootP))
    def probeOne(dirs: Seq[String]): Double = {
      val t0 = System.nanoTime()
      val hits = VersionedStore.probeMatching(spark, rootP, dirs, noMatch, recordedDdl)
      require(hits.isEmpty); (System.nanoTime() - t0) / 1e9
    }
    val d10 = allDirs.take(10)
    // warm both paths once (JIT + parquet footer cache), then measure
    probeSeq(d10); probeOne(d10)
    val (s10, o10) = (probeSeq(d10), probeOne(d10))
    val (sAll, oAll) = (probeSeq(allDirs), probeOne(allDirs))
    println(s"""{"metric":"store_probe_ab","sf_dir":"$sfDir",""" +
      s""""dirs_small":${d10.size},"dirs_full":${allDirs.size},""" +
      f""""seq_small_sec":$s10%.3f,"seq_full_sec":$sAll%.3f,""" +
      f""""onejob_small_sec":$o10%.3f,"onejob_full_sec":$oAll%.3f}""")

    // DML-WIDTH A/B: per-touched-dir rewrites run CONCURRENTLY (round
    // 12), so a wide delete touching ~20 dirs must cost ~max(per-dir
    // rewrite) + one commit — NOT 10× the 2-dir delete's scheduler
    // round-trips. Disjoint key ranges on the same 50-dir store, narrow
    // first, so the wide leg's dirs are untouched by the narrow one.
    val boundsP = (Long.MinValue +: qsP.toSeq) :+ Long.MaxValue
    def rangePred(i0: Int, i1: Int) = col("o_orderstatus") === "F" &&
      col("o_orderkey") >= boundsP(i0) && col("o_orderkey") < boundsP(i1)
    def rangeCols(i0: Int, i1: Int) = Seq(VersionedStore.ColRange("o_orderkey",
      Some(boundsP(i0).toString), Some((boundsP(i1) - 1).toString)))
    val (tDel2, _) = timed(VersionedStore.deleteWhere(spark, rootP,
      rangePred(2, 4), prune = rangeCols(2, 4), statsCols = Seq("o_orderkey")))
    val (tDel20, _) = timed(VersionedStore.deleteWhere(spark, rootP,
      rangePred(10, 30), prune = rangeCols(10, 30), statsCols = Seq("o_orderkey")))
    println(s"""{"metric":"store_dml_width","sf_dir":"$sfDir",""" +
      f""""delete_2dir_sec":$tDel2%.3f,"delete_20dir_sec":$tDel20%.3f,""" +
      f""""width_ratio":${tDel20 / tDel2}%.2f}""")

    (Seq(r1, r2, r3) :+ rootP).foreach { r =>
      val p = new org.apache.hadoop.fs.Path(r)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
    spark.stop()
  }
}
