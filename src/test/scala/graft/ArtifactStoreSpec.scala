package graft

import graft.sinks.ArtifactStore

/** The artifact publish protocol: every crash state the rename ordering
  * can leave behind must heal to a complete artifact on the next publish.
  * Heal runs BEFORE the new build, so a build that throws right after it
  * makes heal's effect directly observable. */
class ArtifactStoreSpec extends SparkSpec {
  import spark.implicits._

  private def writeV(tag: String)(tmp: String): Unit =
    Seq(tag).toDF("v").write.mode("overwrite").parquet(s"$tmp/t")

  private def readV(path: String): String =
    spark.read.parquet(s"$path/t").collect().head.getString(0)

  private def fs(root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def p(s: String) = new org.apache.hadoop.fs.Path(s)

  test("crash between the two renames (old aside, tmp complete): heal COMPLETES the publish") {
    val root = java.nio.file.Files.createTempDirectory("artstore").toString
    try {
      val art = s"$root/art"
      ArtifactStore.publish(spark, art)(writeV("v1"))
      // Reproduce the exact crash state: v2 fully built at tmp, target
      // renamed aside to old, process dies before tmp -> target.
      val f = fs(root)
      writeV("v2")(s"$art.__build_tmp")
      assert(f.rename(p(art), p(s"$art.__old")))
      // Next publish heals FIRST; the build then throws, so what we read
      // is heal's work alone: the completed v2, old cleaned up.
      intercept[RuntimeException] {
        ArtifactStore.publish(spark, art)(_ => throw new RuntimeException("boom"))
      }
      assert(readV(art) === "v2", "heal must complete the interrupted publish")
      assert(!f.exists(p(s"$art.__old")), "healed publish must clean the old copy")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("defensive state (only old aside, no tmp): heal RESTORES the old artifact") {
    val root = java.nio.file.Files.createTempDirectory("artstore").toString
    try {
      val art = s"$root/art"
      ArtifactStore.publish(spark, art)(writeV("v1"))
      assert(fs(root).rename(p(art), p(s"$art.__old")))
      intercept[RuntimeException] {
        ArtifactStore.publish(spark, art)(_ => throw new RuntimeException("boom"))
      }
      assert(readV(art) === "v1", "heal must restore the old artifact")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("tmp debris alongside an intact target is discarded; target untouched") {
    val root = java.nio.file.Files.createTempDirectory("artstore").toString
    try {
      val art = s"$root/art"
      ArtifactStore.publish(spark, art)(writeV("v1"))
      writeV("debris")(s"$art.__build_tmp") // crash after build, before renames
      intercept[RuntimeException] {
        ArtifactStore.publish(spark, art)(_ => throw new RuntimeException("boom"))
      }
      assert(readV(art) === "v1", "intact target must survive debris cleanup")
      assert(!fs(root).exists(p(s"$art.__build_tmp")), "debris must be discarded")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("concurrent ensure(): same path builds once; distinct paths do not serialize on one lock") {
    val root = java.nio.file.Files.createTempDirectory("artstore").toString
    try {
      val src = Seq("x").toDF("v")
      // src is in-memory (no input files) → constant fingerprint, so every
      // ensure() call after the first must observe the cache, not rebuild.
      val builds = new java.util.concurrent.atomic.AtomicInteger(0)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      try {
        val tasks = (1 to 8).map { i =>
          pool.submit(new Runnable {
            def run(): Unit =
              ArtifactStore.ensure(src, s"$root/art${i % 2}") { (d, tmp) =>
                builds.incrementAndGet()
                d.write.mode("overwrite").parquet(s"$tmp/t")
              }
          })
        }
        tasks.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      } finally pool.shutdown()
      assert(builds.get() === 2, "each of the two paths must build exactly once")
      assert(readV(root + "/art0") === "x" && readV(root + "/art1") === "x")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("publish lock: released on success AND on build failure; stale lock broken; live lock waited out") {
    val root = java.nio.file.Files.createTempDirectory("artstore").toString
    try {
      val art = s"$root/art"
      val f = fs(root)
      val lock = p(s"$art.__lock")
      // Success path releases the lock.
      ArtifactStore.publish(spark, art)(writeV("v1"))
      assert(!f.exists(lock), "lock must be released after a successful publish")
      // Failure path releases the lock too (else the path deadlocks until stale).
      intercept[RuntimeException] {
        ArtifactStore.publish(spark, art)(_ => throw new RuntimeException("boom"))
      }
      assert(!f.exists(lock), "lock must be released when the build throws")
      // A stale lock (abandoned by a crashed process) is broken, not waited on.
      f.create(lock, false).close()
      f.setTimes(lock, System.currentTimeMillis() - 2L * 60 * 60 * 1000, -1)
      ArtifactStore.publish(spark, art)(writeV("v2"))
      assert(readV(art) === "v2", "stale lock must not block a publish")
      assert(!f.exists(lock))
      // A LIVE lock held by a concurrent publisher delays this publish until
      // released — simulate the release from another thread.
      f.create(lock, false).close()
      val releaser = new Thread(() => { Thread.sleep(800); f.delete(lock, false) })
      releaser.start()
      val t0 = System.nanoTime()
      ArtifactStore.publish(spark, art)(writeV("v3"))
      releaser.join()
      assert(readV(art) === "v3")
      assert((System.nanoTime() - t0) / 1e6 >= 500,
        "publish must have waited for the live lock's release")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("a failed BUILD leaves the current artifact fully readable") {
    val root = java.nio.file.Files.createTempDirectory("artstore").toString
    try {
      val art = s"$root/art"
      ArtifactStore.publish(spark, art)(writeV("v1"))
      intercept[RuntimeException] {
        ArtifactStore.publish(spark, art)(_ => throw new RuntimeException("boom"))
      }
      assert(readV(art) === "v1")
      ArtifactStore.publish(spark, art)(writeV("v3"))
      assert(readV(art) === "v3", "a later publish proceeds normally")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("cross-process trust: a marker-matched artifact is NOT rebuilt; mutation and source change both force rebuild") {
    val root = java.nio.file.Files.createTempDirectory("artstore").toString
    try {
      // File-backed source (cross-process trust requires input files).
      Seq((1L, "a"), (2L, "b")).toDF("id", "s")
        .write.mode("overwrite").parquet(s"$root/src")
      val src = spark.read.parquet(s"$root/src")
      val art = s"$root/art"
      var builds = 0
      def ensure(d: org.apache.spark.sql.DataFrame): Unit =
        ArtifactStore.ensure(d, art) { (df, tmp) =>
          builds += 1
          df.write.mode("overwrite").parquet(s"$tmp/t")
        }
      ensure(src)
      assert(builds === 1)
      ensure(src)
      assert(builds === 1, "same process, same source: cached record")
      // Fresh process simulation: in-memory records gone, disk marker intact.
      ArtifactStore.forgetProcessRecords()
      ensure(src)
      assert(builds === 1, "fresh process must TRUST the marker-matched artifact")
      // In-place mutation invalidates: marker deleted, next fresh process rebuilds.
      ArtifactStore.invalidate(art)
      ArtifactStore.forgetProcessRecords()
      ensure(src)
      assert(builds === 2, "a mutated artifact must never be trusted across processes")
      // Source change (regenerated data): fingerprint differs, rebuild.
      Thread.sleep(1100) // mtime granularity
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
        .write.mode("overwrite").parquet(s"$root/src")
      ArtifactStore.forgetProcessRecords()
      ensure(spark.read.parquet(s"$root/src"))
      assert(builds === 3, "regenerated source must force a rebuild")
      assert(spark.read.parquet(s"$art/t").count() === 3L)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("builderId salts the trust fingerprint: changed build params force rebuild, same params trust") {
    val root = java.nio.file.Files.createTempDirectory("artstore").toString
    try {
      Seq((1L, "a")).toDF("id", "s").write.mode("overwrite").parquet(s"$root/src")
      val src = spark.read.parquet(s"$root/src")
      val art = s"$root/art"
      var builds = 0
      def ensure(id: String): Unit =
        ArtifactStore.ensure(src, art, builderId = id) { (df, tmp) =>
          builds += 1
          df.write.mode("overwrite").parquet(s"$tmp/t")
        }
      ensure("b:m=256"); assert(builds === 1)
      // Fresh process, SAME params: the marker matches — trust, no rebuild.
      ArtifactStore.forgetProcessRecords()
      ensure("b:m=256")
      assert(builds === 1, "identical source + identical build params: trust")
      // Fresh process, CHANGED params (the r11 hazard: maxMerges 256→8192
      // with an unchanged corpus): source fingerprint alone would trust
      // the stale artifact built by the old parameters — the salt must
      // force the rebuild.
      ArtifactStore.forgetProcessRecords()
      ensure("b:m=8192")
      assert(builds === 2, "changed build params must invalidate the stale artifact")
      // Same process, params flip back: fingerprint differs from the
      // recorded one, rebuild again (no stale per-process trust either).
      ensure("b:m=256")
      assert(builds === 3)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("in-memory sources never trust disk: fingerprint is constant, freshness is per-process only") {
    val root = java.nio.file.Files.createTempDirectory("artstore").toString
    try {
      val art = s"$root/art"
      var builds = 0
      def ensure(): Unit =
        ArtifactStore.ensure(Seq("x").toDF("v"), art) { (df, tmp) =>
          builds += 1
          df.write.mode("overwrite").parquet(s"$tmp/t")
        }
      ensure(); assert(builds === 1)
      ensure(); assert(builds === 1, "per-process record still caches")
      ArtifactStore.forgetProcessRecords()
      ensure()
      assert(builds === 2, "a fileless source must rebuild in a fresh process")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }
}
