package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** STANDING WATCH LIST — always probed in a fresh JVM (riding above
    * the flagged-probe cap) so the canonical record carries their
    * isolated number every round and driver-vs-canonical divergers
    * arrive pre-adjudicated. Curated per round from the verdict's watch
    * rows; drop an entry once two consecutive rounds read clean.
    *  - bloom_shuffle_join (r15): the suite's slowest join — isolated
    *    number adjudicates suite-noise vs real cost of the A/B pair.
    *  - versioned_sql_dml (r16): driver r15 read 0.64 s vs 0.31 s
    *    canonical — suspected first-rep store-build attribution. Read
    *    CLEAN r16 (in-suite ≈ canonical, driver agreed) — first of two.
    *  - token_count_bpe_stress (r16): driver r15 read 0.74 s vs 0.11 s
    *    r14 driver — suspected memo-warmth variance. Read CLEAN r16 —
    *    first of two.
    *  - corpus_clean (r17, verdict ask): three rounds of one-direction
    *    canonical drift (3.49 → 4.93 s) on the #2-expensive row with no
    *    plan change; the isolated number adjudicates session-debris vs
    *    real cost. */
  private val WatchList = Seq(
    "bloom_shuffle_join", "versioned_sql_dml", "token_count_bpe_stress",
    "corpus_clean")

  /** Second-process contamination probe: re-run ONE query in a fresh JVM
    * (same classpath + JVM args as this one, reps=2, no vacuum, no
    * further isolation recursion) and return its isolated median.
    * PERF.md's round-10 honesty note proved the in-suite med≫min flag
    * cannot catch late-suite long-JVM debris — both the median AND the
    * min inflate — so the only mechanical tell is a second process; this
    * automates the forensic step that previously needed a manual re-run
    * (onlinetime_7d read 6.18 s in-suite vs 0.71 s isolated in round
    * 10). Returns None on any child failure — a broken probe must never
    * fabricate an isolated number. */
  private def isolatedRun(name: String, sfDir: String, cpus: String): Option[Double] = {
    import scala.jdk.CollectionConverters._
    try {
      val javaBin = System.getProperty("java.home") + "/bin/java"
      val jvmArgs = java.lang.management.ManagementFactory
        .getRuntimeMXBean.getInputArguments.asScala.toSeq
      val cp = System.getProperty("java.class.path")
      val outFile = java.nio.file.Files.createTempFile("graft-iso", ".json")
      val pb = new ProcessBuilder(
        (Seq(javaBin) ++ jvmArgs ++ Seq("-cp", cp, "graft.Bench")).asJava)
      val env = pb.environment()
      env.put("SPARK_GRAFT_SF_DIR", sfDir)
      env.put("SPARK_GRAFT_CPUS", cpus)
      env.put("SPARK_GRAFT_BENCH_ONLY", name)
      env.put("SPARK_GRAFT_REPS", "2")
      env.put("SPARK_GRAFT_ISOLATE", "0") // no recursion
      env.put("SPARK_GRAFT_VACUUM", "0")  // the parent already vacuumed
      env.put("SPARK_GRAFT_BENCH_OUT", outFile.toString)
      pb.redirectErrorStream(true)
      pb.redirectOutput(java.io.File.createTempFile("graft-iso-log", ".txt"))
      val rc = pb.start().waitFor()
      if (rc != 0) return None
      val body = new String(java.nio.file.Files.readAllBytes(outFile), "UTF-8")
      java.nio.file.Files.deleteIfExists(outFile)
      ("\"" + java.util.regex.Pattern.quote(name) + "\":([0-9.Ee+-]+)").r
        .findFirstMatchIn(body).map(_.group(1).toDouble)
    } catch { case _: Throwable => None }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (JVM/codegen/FileIndex startup otherwise lands on
    // whichever query happens to run first).
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Pre-ensure the maintained stored artifacts (shingle table, posting
    // index, IVF model) OUTSIDE the timed pass: these are once-per-ingest
    // materialization jobs, not query latency — a fresh-process bench
    // would otherwise pay them inside whichever *_stored query runs
    // first, making totals incomparable across runs. Their cost is still
    // reported, separately, as artifact_build_sec.
    val tArt = System.nanoTime()
    // vacuum = true: Bench owns its process and no other warehouse user
    // runs concurrently with it (the SKILL.md gotcha), so the bench path
    // is the sanctioned maintenance window — and the census assertion
    // below keeps "stale generations accumulate forever" from regressing.
    val doVacuum = sys.env.getOrElse("SPARK_GRAFT_VACUUM", "1") == "1"
    val artifactErr =
      try {
        val live = SparkEntry.ensureStoredArtifacts(spark, sfDir, vacuum = doVacuum)
        val census = SparkEntry.bucketedWarehouseCensus(spark, sfDir)
        if (doVacuum && census != live)
          Some(s"post-vacuum warehouse census != live set: " +
            s"stale=${census.diff(live).mkString(",")} missing=${live.diff(census).mkString(",")}")
        else None
      }
      catch { case t: Throwable =>
        Some(s"${t.getClass.getName}: ${t.getMessage}") }
    val artifactSec = (System.nanoTime() - tArt) / 1e9
    artifactErr.foreach(e => System.err.println(s"BENCH ARTIFACT FAILURE: $e"))
    // Repeat-median timing: this sandbox shows up to ~40% host-load drift
    // on identical builds, and single-shot timings kept reading as phantom
    // regressions round over round. Each query is timed REPS times after
    // the warmup; the reported number is the MEDIAN (robust to one loaded
    // reap) and the max-min spread rides along so a reader can tell a real
    // regression from a noisy rep.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    // Optional comma-separated name filter for local iteration/isolation
    // runs; unknown names are a hard error (a typo'd filter must not
    // produce a silently empty bench that reads as "ran, fast").
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    only.foreach { f =>
      val unknown = f.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names match no query: ${unknown.mkString(", ")}")
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      // toRdd.count() materializes every output column — a plain count()
      // lets Catalyst prune the expensive expressions and times nothing.
      // One untimed warmup run first: it pays the per-query Janino codegen
      // compilation (0.5-2 s regardless of data volume), so the timed runs
      // measure engine throughput, not compiler startup.
      // Failures are recorded loudly: a broken query must never show up as
      // a near-zero timing that quietly shrinks the total.
      def run(): Either[String, Long] =
        try Right(fn(spark, sfDir).queryExecution.toRdd.count())
        catch { case t: Throwable => Left(s"${t.getClass.getName}: ${t.getMessage}") }
      val out = run() match {
        case Left(err) => name -> Left(err)
        case Right(_) =>
          val timed = (1 to reps).map { _ =>
            // The previous run's broadcast/shuffle debris is dead weight in
            // storage memory until a GC lets ContextCleaner reap it; collect
            // BEFORE starting the clock so the timed run isn't the one
            // paying eviction (measured: setjoin_pairs timed 7.0 s with
            // post-query GC only vs 2.3 s with a clean collector).
            System.gc()
            val t0 = System.nanoTime()
            run().map(_ => (System.nanoTime() - t0) / 1e9)
          }
          timed.collectFirst { case Left(e) => e } match {
            case Some(e) => name -> Left(e)
            case None =>
              val ts = timed.collect { case Right(t) => t }.sorted
              // median, min, spread: the min is the contamination probe —
              // a median far above its own min flags long-JVM interference
              // (heap/JIT/cleaner debris), not a real regression.
              name -> Right((ts(ts.length / 2), ts.head, ts.last - ts.head))
          }
      }
      // Isolate queries from each other: drop every persisted frame and
      // checkpoint block the query (or its predecessors) left behind.
      // Without this, accumulated MEMORY_AND_DISK frames from earlier
      // queries contend with the current query's execution memory and
      // inflate iterative jobs nondeterministically (measured:
      // dedup_clusters 2.9-3.6 s in a fresh session vs 4.5-23.8 s after
      // the 25-query alphabetical prefix — run-to-run swings the isolated
      // number doesn't have). The warmup→timed reuse WITHIN a query is
      // preserved (clearing happens after the timed run), so timings stay
      // "warm" per query while becoming order-independent and
      // round-over-round comparable.
      // Blocking drops: an async unpersist races the NEXT query for heap
      // (ScaleBench measured setjoin_pairs 2-4x slower behind the
      // clusters family's lingering fixpoint blocks).
      graft.operators.CacheRegistry.clear(blocking = true)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      // Spark's ContextCleaner frees broadcast/shuffle blocks only when
      // the DRIVER GC collects their references; a 248-run single-JVM
      // bench never triggers a full GC on its own, so dead broadcast
      // blocks pile up in storage memory and evict live persists
      // mid-query (measured: setjoin_pairs 32 s late in the bench vs
      // 2.3 s isolated — its tokenization persist was being evicted and
      // re-derived per branch). One explicit GC per query, outside the
      // timed window, keeps the cleaner current.
      System.gc()
      out
    }
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""
    val ok = results.collect { case (k, Right(v)) => k -> v }
    val errs = results.collect { case (k, Left(e)) => k -> e }
    errs.foreach { case (k, e) => System.err.println(s"BENCH FAILURE $k: $e") }
    val qs = ok.map { case (k, (med, _, _)) => jstr(k) + ":" + med }.mkString("{", ",", "}")
    val mn = ok.map { case (k, (_, min, _)) => jstr(k) + ":" + min }.mkString("{", ",", "}")
    val sp = ok.map { case (k, (_, _, spread)) => jstr(k) + ":" + spread }.mkString("{", ",", "}")
    val es = errs.map { case (k, e) => jstr(k) + ":" + jstr(e) }.mkString("{", ",", "}")
    val total = ok.map(_._2._1).sum
    // Contamination label: a median far above its own min means the
    // timed window was loaded (host contention or long-JVM debris), not
    // that the queries regressed. When MANY queries show it at once, the
    // whole record is suspect — label it so a loaded re-run can never
    // read as (or overwrite) a canonical round record unflagged.
    val hot = ok.count { case (_, (med, min, _)) =>
      med > min * 1.5 && med - min > 0.5 }
    val loadFlag =
      if (ok.nonEmpty && hot * 4 >= ok.size)
        s""","load_flag":"median>>min on $hot/${ok.size} queries - loaded host; prefer a re-run""""
      else ""
    // Automated second-process probe on the worst in-suite outliers: the
    // top medians (late-suite debris inflates med AND min, so med≫min
    // can't catch it) plus any med≫min-flagged query, capped at 4 child
    // JVMs. isolated_sec per outlier rides the canonical record so the
    // round number needs no manual forensics. Opt-out (and recursion
    // guard for the children): SPARK_GRAFT_ISOLATE=0; filtered runs
    // never probe.
    val isolate = sys.env.getOrElse("SPARK_GRAFT_ISOLATE", "1") == "1" && only.isEmpty
    val isoPairs: Seq[(String, Double)] =
      if (!isolate || ok.isEmpty) Seq.empty
      else {
        val byMed = ok.sortBy(-_._2._1).take(3).map(_._1)
        val flagged = ok.collect {
          case (k, (med, min, _)) if med > min * 1.5 && med - min > 0.5 => k }
        // High-VARIANCE queries (spread exceeding the min itself) are the
        // builder-vs-driver divergence drivers (round 12: the two recall
        // gates alone carried 14 s of cross-environment spread) — probe
        // them too so the canonical record names its own volatility.
        val volatile = ok.collect {
          case (k, (_, min, spread)) if spread > min && spread > 0.5 => k }
        // Ratio net (round-13 verdict #6): driver rows landing >2× the
        // canonical min were exactly the small-absolute outliers the
        // med-min>0.5 delta floor missed (sub-second queries can double
        // without tripping it). Flag by ratio with no absolute floor,
        // order ALL candidates most-divergent-first so the cap trims the
        // least interesting, and run up to 12 flagged probes (standing
        // watch items ride on top of the cap).
        val ratioFlagged = ok.collect {
          case (k, (med, min, _)) if min > 0 && med > min * 2 => k }
        // Standing watch items (see WatchList) — always probed so the
        // canonical record carries their isolated number every round.
        val watch = WatchList.filter(ok.toMap.contains)
        val stats = ok.toMap
        (watch ++ (byMed ++ flagged ++ volatile ++ ratioFlagged).distinct
          .filterNot(watch.contains)
          .sortBy(n => -(stats(n)._1 / math.max(stats(n)._2, 1e-9)))
          .take(12)).flatMap { n =>
            System.err.println(s"[bench] isolated probe: $n ...")
            isolatedRun(n, sfDir, cpus).map(n -> _)
          }
      }
    // Probe semantics, labeled so the record is self-interpreting:
    // isolated ≤ in-suite PROVES suite contamination (the in-suite number
    // was inflated by debris); isolated > in-suite is fresh-JVM
    // codegen/JIT warmup, NOT a regression signal — the probe is an
    // upper bound there, never a floor.
    val isoField =
      if (isoPairs.isEmpty) ""
      else {
        val meds = ok.toMap
        val labels = isoPairs.map { case (k, v) =>
          val lbl = if (meds.get(k).exists(m => v <= m._1)) "cheaper" else "warmup"
          jstr(k) + ":" + jstr(lbl)
        }
        s""","isolated_sec":${isoPairs.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")}""" +
          s""","isolated_label":${labels.mkString("{", ",", "}")}"""
      }
    // BPE memo telemetry (JVM-global across the suite's encoders): the
    // frozen-at-cap policy's health — a hit rate collapsing toward zero
    // would mean the memo froze on an unrepresentative prefix.
    val (mmH, mmM, mmC) = graft.functions.BpeRanks.globalMemoStats
    val memoField = s""","bpe_memo":{"hits":$mmH,"misses":$mmM,"cap_frozen":$mmC}"""
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"min_sec":$mn,"spread_sec":$sp,"reps":$reps,"errors":$es,"artifact_build_sec":$artifactSec$loadFlag$isoField$memoField,"sf":"$sfDir"}"""
    println(line)
    // Stdout gets truncated by log capture at the driver (two rounds of
    // mid-record JSON tails); the FILE is the durable record — the full
    // per-query medians/mins/spreads, mechanically diffable round over
    // round. Committed per round as BENCH_LOCAL.json. A filtered
    // (SPARK_GRAFT_BENCH_ONLY) iteration run lands in BENCH_ONLY.json by
    // default so a partial record can never silently overwrite the
    // committed full-suite one.
    val defaultOut = if (only.isDefined) "BENCH_ONLY.json" else "BENCH_LOCAL.json"
    val out = new java.io.PrintWriter(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut), "UTF-8")
    try out.println(line) finally out.close()
    spark.stop()
    if (errs.nonEmpty || artifactErr.nonEmpty) sys.exit(1)
  }
}
