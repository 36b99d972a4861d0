package graft

import java.nio.file.Files

import graft.sinks.VersionedStore
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions.{col, lit, to_date}
import org.apache.spark.sql.types.{DateType, LongType}

/** The `graftstore` data source (GraftStoreSource): VersionedStore as a
  * first-class `spark.read.format` / `df.write.format` / `CREATE TABLE
  * USING` citizen. The gates that matter: (1) a pushed filter must reach
  * GraftFileIndex and SKIP dirs — asserted on the physical scan's file
  * count, end-to-end through the analyzer, never by calling the index
  * directly; (2) skipping is an optimization, never a filter — every
  * result is value-checked against the store's own read path; (3) time
  * travel, schema evolution (added + widened columns), and column
  * mapping all read correctly through the format. */
class GraftStoreSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-dsrc").toString

  /** 3 day-partitioned appends (days 1..3), stats on day + v. */
  private def dayStore(): String = {
    val root = tmp()
    (1 to 3).foreach { d =>
      Seq((d.toLong, d * 10L, s"2024-01-0$d"))
        .toDF("id", "v", "day")
        .withColumn("day", to_date(col("day")))
        .write.format("graftstore")
        .option("statsCols", "day,v")
        .mode(SaveMode.Append).save(root)
    }
    root
  }

  /** Files the physical plan actually scanned. */
  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, "expected a FileSourceScanExec (HadoopFsRelation path)")
    scans.map(_.metrics("numFiles").value).sum
  }

  test("write.format appends commit transactionally; read.format round-trips") {
    val root = dayStore()
    assert(VersionedStore.currentVersion(spark, root) === 3)
    val out = spark.read.format("graftstore").load(root)
    assert(out.schema("day").dataType === DateType)
    assert(out.schema("v").dataType === LongType)
    assert(out.orderBy("id").select("id", "v").as[(Long, Long)].collect().toSeq ===
      Seq((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("pushed day filter skips dirs: the scan opens strictly fewer files") {
    val root = dayStore()
    val all = spark.read.format("graftstore").load(root)
    val total = scannedFiles(all)
    val one = spark.read.format("graftstore").load(root)
      .filter(col("day") === lit("2024-01-02").cast("date"))
    val opened = scannedFiles(one)
    assert(opened < total, s"day filter must skip dirs: opened $opened of $total")
    assert(one.select("id").as[Long].collect().toSeq === Seq(2L))
  }

  test("pushed range filter on a DATA column (v) skips through manifest stats") {
    val root = dayStore()
    val hi = spark.read.format("graftstore").load(root).filter(col("v") >= 25L)
    val opened = scannedFiles(hi)
    val total = scannedFiles(spark.read.format("graftstore").load(root))
    assert(opened < total, s"v >= 25 must skip the v<=20 dirs: opened $opened of $total")
    assert(hi.select("id").as[Long].collect().toSeq === Seq(3L))
  }

  test("versionAsOf time travel reads the pinned snapshot") {
    val root = dayStore()
    val v2 = spark.read.format("graftstore").option("versionAsOf", "2").load(root)
    assert(v2.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    intercept[IllegalArgumentException] {
      spark.read.format("graftstore").option("versionAsOf", "99").load(root)
    }
  }

  test("SQL surface: CREATE TABLE USING graftstore, predicated SELECT") {
    val root = dayStore()
    spark.sql("DROP TABLE IF EXISTS gsrc_events")
    spark.sql(s"CREATE TABLE gsrc_events USING graftstore OPTIONS (path '$root')")
    try {
      val got = spark.sql(
        "SELECT id, v FROM gsrc_events WHERE day = DATE'2024-01-03'")
      assert(got.as[(Long, Long)].collect().toSeq === Seq((3L, 30L)))
    } finally spark.sql("DROP TABLE IF EXISTS gsrc_events")
  }

  test("SaveMode semantics: ErrorIfExists throws, Ignore no-ops, Overwrite snapshots") {
    val root = tmp()
    Seq((1L, "a")).toDF("id", "s").write.format("graftstore").mode(SaveMode.Append).save(root)
    intercept[IllegalStateException] {
      Seq((2L, "b")).toDF("id", "s").write.format("graftstore")
        .mode(SaveMode.ErrorIfExists).save(root)
    }
    Seq((3L, "c")).toDF("id", "s").write.format("graftstore")
      .mode(SaveMode.Ignore).save(root)
    assert(spark.read.format("graftstore").load(root)
      .select("id").as[Long].collect().toSeq === Seq(1L))
    Seq((9L, "z")).toDF("id", "s").write.format("graftstore")
      .mode(SaveMode.Overwrite).save(root)
    assert(spark.read.format("graftstore").load(root)
      .select("id").as[Long].collect().toSeq === Seq(9L))
    // overwrite is a new VERSION, not an erase — v1 still time-travels
    assert(spark.read.format("graftstore").option("versionAsOf", "1").load(root)
      .select("id").as[Long].collect().toSeq === Seq(1L))
  }

  test("schema evolution reads through the format: added column NULL-fills, " +
       "widened column promotes") {
    val root = tmp()
    Seq((1, 1.5f)).toDF("k", "x").write.format("graftstore")
      .mode(SaveMode.Append).save(root)
    Seq((3000000000L, 2.5, "new")).toDF("k", "x", "tag")
      .write.format("graftstore").option("mergeSchema", "true")
      .mode(SaveMode.Append).save(root)
    val out = spark.read.format("graftstore").load(root)
    assert(out.schema("k").dataType === LongType)
    val rows = out.orderBy("k").select("k", "tag").as[(Long, Option[String])]
      .collect().toSeq
    assert(rows === Seq((1L, None), (3000000000L, Some("new"))))
  }

  test("column-mapped store (post-rename) keeps the VECTORIZED scan: the " +
       "upgrade rule aliases a physical-schema FileSourceScanExec, and " +
       "stats skipping works through the renamed column") {
    val root = tmp()
    Seq((1L, 10L)).toDF("id", "val").write.format("graftstore")
      .option("statsCols", "val").mode(SaveMode.Append).save(root)
    VersionedStore.renameColumn(spark, root, "val", "value")
    Seq((2L, 20L)).toDF("id", "value").write.format("graftstore")
      .option("statsCols", "value").mode(SaveMode.Append).save(root)
    val out = spark.read.format("graftstore").load(root)
    assert(out.columns.toSeq.sorted === Seq("id", "value"))
    assert(out.orderBy("id").as[(Long, Long)].collect().toSeq ===
      Seq((1L, 10L), (2L, 20L)))
    // one metadata-only rename must NOT de-vectorize the table: the
    // session has the graft extensions, so the marker relation upgrades
    // to a FileSourceScanExec (scannedFiles asserts its presence) — and
    // the pushed filter arrives under the PHYSICAL name, which is how
    // the manifest stats are keyed, so the pre-rename dir is skipped.
    val hi = spark.read.format("graftstore").load(root).filter(col("value") > 15L)
    val opened = scannedFiles(hi)
    val total = scannedFiles(spark.read.format("graftstore").load(root))
    assert(opened < total,
      s"value > 15 must skip the val<=10 dir on the vectorized path: " +
        s"opened $opened of $total")
    assert(hi.select("id").as[Long].collect().toSeq === Seq(2L))
    // ... and BOTH stats epochs prune: the pre-rename dir keys its stats
    // under the old name, the post-rename dir under the new one — the
    // dual-name range expansion must skip the post-rename dir here
    val lo = spark.read.format("graftstore").load(root).filter(col("value") < 15L)
    assert(scannedFiles(lo) < total,
      "value < 15 must skip the post-rename (value>=20) dir too")
    assert(lo.select("id").as[Long].collect().toSeq === Seq(1L))
  }

  test("row fallback stays correct for extension-less sessions " +
       "(buildScan exercised directly)") {
    val root = tmp()
    Seq((1L, 10L)).toDF("id", "val").write.format("graftstore")
      .option("statsCols", "val").mode(SaveMode.Append).save(root)
    VersionedStore.renameColumn(spark, root, "val", "value")
    Seq((2L, 20L)).toDF("id", "value").write.format("graftstore")
      .option("statsCols", "value").mode(SaveMode.Append).save(root)
    val (v, dirs, ddl, colmap, _) =
      VersionedStore.relationSnapshot(spark, root, None)
    val rel = new graft.sources.GraftStoreRowRelation(spark, root, v,
      org.apache.spark.sql.types.StructType.fromDDL(ddl.get), colmap, dirs)
    val rows = rel.buildScan(Array("id", "value"),
      Array(org.apache.spark.sql.sources.GreaterThan("value", 15L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // unhandledFilters default: the scan may return unfiltered rows and
    // Spark re-applies the predicate above — assert superset semantics
    assert(rows.contains((2L, 20L)))
    assert(rows.forall { case (i, _) => i == 1L || i == 2L })
  }

  test("day-not-last schema (evolution) keeps the RECORDED column order " +
       "through the format (SELECT * parity with the store's own read)") {
    val root = tmp()
    // Evolution puts day mid-schema: born (id, v), day appends at
    // position 3, tag appends after — recorded order (id, v, day, tag).
    // A raw HadoopFsRelation would expose (id, v, tag, day); the marker
    // + projection must keep the recorded order.
    Seq((1L, 10L)).toDF("id", "v")
      .write.format("graftstore").mode(SaveMode.Append).save(root)
    Seq((2L, 20L, "2024-01-02")).toDF("id", "v", "day")
      .withColumn("day", to_date(col("day")))
      .write.format("graftstore").option("mergeSchema", "true")
      .mode(SaveMode.Append).save(root)
    Seq((3L, 30L, "2024-01-03", "x")).toDF("id", "v", "day", "tag")
      .withColumn("day", to_date(col("day")))
      .write.format("graftstore").option("mergeSchema", "true")
      .option("statsCols", "day").mode(SaveMode.Append).save(root)
    val recorded = org.apache.spark.sql.types.StructType.fromDDL(
      VersionedStore.schemaAt(spark, root,
        VersionedStore.currentVersion(spark, root)).get).fieldNames.toSeq
    assert(recorded.indexOf("day") != recorded.length - 1,
      s"scenario must put day mid-schema, recorded: $recorded")
    val out = spark.read.format("graftstore").load(root)
    assert(out.columns.toSeq === recorded,
      s"recorded order must survive: got ${out.columns.toSeq} vs $recorded")
    // still a vectorized scan, and day partition pruning still applies
    // (the day-less dir contributes a NULL partition value and is
    // pruned by the equality; the day=02 dir prunes on its hive value)
    val one = out.filter(col("day") === lit("2024-01-03").cast("date"))
    assert(scannedFiles(one) < scannedFiles(
      spark.read.format("graftstore").load(root)))
    assert(one.select("id", "tag").as[(Long, String)].collect().toSeq ===
      Seq((3L, "x")))
  }

  test("ONE format string, all four surfaces: readStream/writeStream via " +
       "format(\"graftstore\") — exactly-once store-to-store loop") {
    import org.apache.spark.sql.streaming.Trigger
    val src = tmp(); val dst = tmp(); val chk = tmp()
    VersionedStore.commitAppend(
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), src)
    def drain(): Unit = {
      val q = spark.readStream.format("graftstore").option("path", src).load()
        .withColumn("v2", col("v") * 2)
        .writeStream.format("graftstore")
        .option("path", dst).option("checkpointLocation", chk)
        .option("statsCols", "id")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.format("graftstore").load(dst)
      .orderBy("id").select("id", "v2").as[(Long, Long)].collect().toSeq ===
      Seq((1L, 20L), (2L, 40L)))
    // one transactional commit per drain; a replayed/idle drain adds none
    assert(VersionedStore.currentVersion(spark, dst) === 1)
    drain()
    assert(VersionedStore.currentVersion(spark, dst) === 1,
      "idle re-drain must be a ledger no-op, not a duplicate append")
    VersionedStore.commitAppend(Seq((3L, 30L)).toDF("id", "v"), src)
    drain()
    assert(spark.read.format("graftstore").load(dst).count() === 3)
    assert(VersionedStore.currentVersion(spark, dst) === 2)
  }

  test("readStream format(\"graftstore\") passes readChangeFeed through") {
    import org.apache.spark.sql.streaming.Trigger
    val src = tmp(); val sinkDir = tmp(); val chk = tmp()
    VersionedStore.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), src)
    VersionedStore.deleteWhere(spark, src, col("id") === 1L)
    val q = spark.readStream.format("graftstore")
      .option("path", src).option("readChangeFeed", "true").load()
      .writeStream.format("parquet")
      .option("path", sinkDir).option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val feed = spark.read.parquet(sinkDir)
      .select("id", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().toSeq.sorted
    assert(feed === Seq(
      (1L, "delete", 2L), (1L, "insert", 1L), (2L, "insert", 1L)))
  }

  test("non-partitioned store (no day column) reads with an empty partition schema") {
    val root = tmp()
    Seq((1L, "x"), (2L, "y")).toDF("id", "s").write.format("graftstore")
      .mode(SaveMode.Append).save(root)
    val out = spark.read.format("graftstore").load(root)
    assert(out.orderBy("id").as[(Long, String)].collect().toSeq ===
      Seq((1L, "x"), (2L, "y")))
  }

  /** A session WITHOUT GraftExtensions, sharing the suite's
    * SparkContext. The builder finds the live context but no
    * default/active session, so it constructs a fresh SparkSession with
    * an EMPTY extension chain — the exact shape of a BI/SQL consumer
    * that forgot `spark.sql.extensions=graft.GraftExtensions`. The
    * suite's session is restored afterwards regardless. */
  private def withExtensionlessSession[A](
      body: org.apache.spark.sql.SparkSession => A): A = {
    val prev = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val bare = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      assert(!bare.sessionState.analyzer.postHocResolutionRules
        .contains(graft.plans.GraftDmlRule),
        "scenario needs a session without the graft DML rule")
      body(bare)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(prev)
      org.apache.spark.sql.SparkSession.setActiveSession(prev)
    }
  }

  /** Every store-root entry (recursive files), for the orphan sweep. */
  private def rootFiles(root: String): Seq[String] = {
    val base = java.nio.file.Paths.get(root)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    java.nio.file.Files.walk(base).forEach { p =>
      if (java.nio.file.Files.isRegularFile(p))
        out += base.relativize(p).toString
    }
    out.toSeq.sorted
  }

  test("extension-less SQL INSERT INTO fails loudly with zero filesystem " +
       "side effects (no silent row loss, no orphan files)") {
    val root = tmp()
    Seq((1L, 10L)).toDF("id", "v").write.format("graftstore")
      .option("statsCols", "v").mode(SaveMode.Append).save(root)
    val before = rootFiles(root)
    withExtensionlessSession { bare =>
      val tbl = s"noext_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      bare.sql(s"CREATE TABLE $tbl USING graftstore OPTIONS (path '$root')")
      try {
        // reads stay CORRECT through the row marker relation
        assert(bare.sql(s"SELECT id, v FROM $tbl").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 10L)))
        // a TEMP VIEW over a plain path load gives SQL-insert identity
        // WITHOUT a catalog — INSERT OVERWRITE through it would delete
        // the store root pre-write if the relation were a raw
        // HadoopFsRelation, so path loads route through the marker too
        val pathRead = bare.read.format("graftstore").load(root)
        assert(pathRead.count() === 1L)
        pathRead.createOrReplaceTempView("noext_pathview")
        intercept[Exception] {
          bare.sql("INSERT OVERWRITE TABLE noext_pathview SELECT 9, 90")
            .collect()
        }
        bare.catalog.dropTempView("noext_pathview")
        val e = intercept[Exception] {
          bare.sql(s"INSERT INTO $tbl VALUES (2, 20)").collect()
        }
        assert(e.getMessage.toLowerCase.contains("insert"),
          s"failure must name the insert, got: ${e.getMessage}")
        // the catastrophic sibling: INSERT OVERWRITE over a raw
        // HadoopFsRelation DELETES the output path (the store root,
        // manifests included) before writing — the marker routing must
        // fail it BEFORE any filesystem mutation
        intercept[Exception] {
          bare.sql(s"INSERT OVERWRITE TABLE $tbl SELECT 3, 30").collect()
        }
      } finally bare.sql(s"DROP TABLE IF EXISTS $tbl")
    }
    assert(rootFiles(root) === before,
      "a failed extension-less INSERT must leave the store byte-identical " +
        "(no orphan parquet, no clobbered manifests)")
    assert(VersionedStore.read(spark, root).get.count() === 1L)
    // and WITH extensions the same statement commits transactionally
    // (the suite session has them)
    val tbl2 = s"ext_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    spark.sql(s"CREATE TABLE $tbl2 USING graftstore OPTIONS (path '$root')")
    try {
      spark.sql(s"INSERT INTO $tbl2 VALUES (2, 20)").collect()
      assert(VersionedStore.currentVersion(spark, root) === 2L)
      assert(VersionedStore.read(spark, root).get.count() === 2L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl2")
  }

  test("BATCH readChangeFeed: the feed (not the snapshot), inclusive " +
       "version/timestamp bounds, empty window, guards") {
    val root = tmp()
    (1 to 3).foreach { d =>
      Seq((d.toLong, d * 10L)).toDF("id", "v")
        .write.format("graftstore").option("statsCols", "id")
        .mode(SaveMode.Append).save(root)
    }
    VersionedStore.deleteWhere(spark, root, col("id") === 2L)  // v4
    def feed(opts: (String, String)*): DataFrame = {
      val r = spark.read.format("graftstore").option("readChangeFeed", "true")
      opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load(root)
    }
    // full window: 3 inserts + v4's delete — the FEED, never the table
    val full = feed("startingVersion" -> "1")
    assert(full.columns.takeRight(2).toSeq ===
      Seq("_change_type", "_commit_version"))
    val byType = full.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("insert" -> 3L, "delete" -> 1L), s"got $byType")
    // inclusive version slice
    assert(feed("startingVersion" -> "2", "endingVersion" -> "3")
      .select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    // timestamp bounds through the commit clock (inclusive both ways)
    val ts2 = java.time.Instant.ofEpochMilli(
      VersionedStore.metaAt(spark, root, 2L)("commitTs").toLong).toString
    assert(feed("startingTimestamp" -> ts2).count() === 3L,
      "commits stamped at/after v2: v2, v3 inserts + v4 delete")
    assert(feed("startingVersion" -> "1", "endingTimestamp" -> ts2)
      .count() === 2L, "v1..v2 inserts")
    // empty window (caught-up poller): zero rows, CDF schema, no error
    val empty = feed("startingVersion" -> "5")
    assert(empty.count() === 0L && empty.columns.contains("_change_type"))
    // guards: missing start, travel mix, numeric end past current
    val e1 = intercept[IllegalArgumentException] { feed() }
    assert(e1.getMessage.contains("startingVersion or startingTimestamp"))
    val e2 = intercept[IllegalArgumentException] {
      feed("startingVersion" -> "1", "versionAsOf" -> "2")
    }
    assert(e2.getMessage.contains("mutually exclusive"))
    val e3 = intercept[Exception] {
      feed("startingVersion" -> "1", "endingVersion" -> "99").collect()
    }
    assert(e3.getMessage.contains("does not exist"))
  }

  test("the guarded parquet format seals prepareWrite (belt-and-braces " +
       "under the extension session)") {
    val e = intercept[UnsupportedOperationException] {
      new graft.sources.GraftGuardedParquetFormat("/tmp/x").prepareWrite(
        spark, org.apache.hadoop.mapreduce.Job.getInstance(),
        Map.empty, new org.apache.spark.sql.types.StructType())
    }
    assert(e.getMessage.contains("transaction log"))
  }

  test("an explicit reader schema differing from the log is warned, " +
       "log schema served; the warning fires once per root per JVM") {
    val root = tmp()
    Seq((1L, 10L)).toDF("id", "v").write.format("graftstore")
      .mode(SaveMode.Append).save(root)
    graft.sources.GraftStoreSource.resetSchemaMismatchWarnings()
    val out = spark.read.format("graftstore")
      .schema("id LONG, wrong STRING").load(root)
    assert(out.columns.toSeq === Seq("id", "v"),
      "the log stays the schema authority")
    // the read above consumed the root's one warning slot; every later
    // mismatched read of the same root is silent (no stderr spam on
    // catalog tables whose catalog schema drifted), while a DIFFERENT
    // root still warns
    assert(!graft.sources.GraftStoreSource.shouldWarnSchemaMismatch(root),
      "a second mismatched read of the same root must not warn again")
    assert(graft.sources.GraftStoreSource.shouldWarnSchemaMismatch(root + "-other"),
      "an unseen root keeps its warning")
  }
}
