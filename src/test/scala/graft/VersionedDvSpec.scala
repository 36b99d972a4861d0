package graft

import java.nio.file.Files

import graft.sinks.VersionedStore
import graft.sinks.VersionedStore.ColRange
import org.apache.spark.sql.functions.{col, expr, lit}

/** DELETION VECTORS — merge-on-read row-level DML (the Delta DV /
  * Iceberg positional-delete architecture, manifest edition): a DELETE
  * records (file, position) pairs in a per-dir `_dv-*` parquet sidecar
  * referenced from the manifest stats, so a scattered or one-row delete
  * writes O(deleted rows) and rewrites ZERO data dirs. Every read door
  * anti-applies the vector; any copy-on-write rewrite (UPDATE / MERGE /
  * OPTIMIZE) materializes the deletes and drops it; countWhere stays
  * exact; the dir-level change feed refuses the range loudly while the
  * row-level feed reports the delta exactly. */
class VersionedDvSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-dv").toString

  private def snap(day: String, users: (Long, Double)*) =
    users.map { case (u, v) => (day, u, v) }.toDF("day", "user_id", "value")

  /** Two dirs: users 1..4 (day 1), users 11..14 (day 2). */
  private def twoDirStore(): String = {
    val root = tmp()
    VersionedStore.commitAppend(
      snap("2024-01-01", 1L -> 1.0, 2L -> 2.0, 3L -> 3.0, 4L -> 4.0),
      root, statsCols = Seq("user_id"))
    VersionedStore.commitAppend(
      snap("2024-01-02", 11L -> 11.0, 12L -> 12.0, 13L -> 13.0, 14L -> 14.0),
      root, statsCols = Seq("user_id"))
    root
  }

  private def ids(root: String): Seq[Long] =
    VersionedStore.read(spark, root).get
      .select("user_id").as[Long].collect().toSeq.sorted

  test("merge-on-read delete: rows leave the snapshot with ZERO dirs " +
       "rewritten; time travel sees the pre-delete rows; a second DV " +
       "unions; dvrows counts distinct positions") {
    val root = twoDirStore()
    val dirs0 = VersionedStore.prunedDirs(spark, root, 2L, Seq.empty)
    val v = VersionedStore.deleteWhereDv(spark, root,
      col("user_id").isin(2L, 12L))
    assert(v === 3L)
    assert(ids(root) === Seq(1L, 3L, 4L, 11L, 13L, 14L), "rows deleted")
    // the dir set is UNCHANGED — that's the whole point
    val dirs1 = VersionedStore.prunedDirs(spark, root, v, Seq.empty)
    assert(dirs1 === dirs0, s"no dir may change hands: $dirs0 -> $dirs1")
    val stats = VersionedStore.statsAt(spark, root, v)
    assert(dirs1.forall(d => stats.contains(s"$d|#|dv")), "both dirs DV'd")
    assert(dirs1.map(d => stats(s"$d|#|dvrows").toLong).sum === 2L)
    // time travel: the pre-delete version still reads all 8 rows
    assert(VersionedStore.readAt(spark, root, 2L).count() === 8L)
    // second DV on the same dir UNIONS (and re-marking a dead row is a
    // no-op: user 2 is already deleted)
    val v2 = VersionedStore.deleteWhereDv(spark, root,
      col("user_id").isin(2L, 3L))
    assert(v2 === 4L)
    assert(ids(root) === Seq(1L, 4L, 11L, 13L, 14L))
    val stats2 = VersionedStore.statsAt(spark, root, v2)
    val d1 = dirs0.head
    assert(stats2(s"$d1|#|dvrows").toLong === 2L, "2 distinct positions in dir 1")
    // a delete matching ONLY already-deleted rows is a version-less no-op
    val v3 = VersionedStore.deleteWhereDv(spark, root, col("user_id") === 2L)
    assert(v3 === v2, "probe sees live rows only — no commit")
  }

  test("a dir whose every live row is deleted leaves the snapshot " +
       "outright (no all-deleted sidecar); emptying the whole store " +
       "is refused") {
    val root = twoDirStore()
    val dirs0 = VersionedStore.prunedDirs(spark, root, 2L, Seq.empty)
    val v = VersionedStore.deleteWhereDv(spark, root, col("user_id") > 10L)
    assert(ids(root) === Seq(1L, 2L, 3L, 4L))
    val dirs1 = VersionedStore.prunedDirs(spark, root, v, Seq.empty)
    assert(dirs1.size === 1 && dirs0.contains(dirs1.head),
      s"the all-deleted dir must be removed: $dirs0 -> $dirs1")
    assert(!VersionedStore.statsAt(spark, root, v).keys
      .exists(_.endsWith("|#|dv")), "no sidecar reference for a dropped dir")
    // two-step total delete: first dir goes merge-on-read, the rest
    // would empty the store — refused loudly
    val e = intercept[IllegalStateException] {
      VersionedStore.deleteWhereDv(spark, root, lit(true))
    }
    assert(e.getMessage.contains("empty"))
  }

  test("countWhere stays EXACT over DV'd dirs: whole-table counts come " +
       "from the manifest (rows − dvrows); ranged counts demote DV'd " +
       "dirs to residual reads") {
    val root = twoDirStore()
    VersionedStore.deleteWhereDv(spark, root, col("user_id").isin(2L, 3L))
    assert(VersionedStore.countWhere(spark, root) === 6L)
    // whole-table count is METADATA-ONLY even with a DV
    val (metaDirs, residual) = VersionedStore.countPlan(spark, root, Seq.empty)
    assert(residual.isEmpty, s"whole-table count must not read data: $residual")
    // ranged count: the DV'd dir must be demoted to a residual read
    // (its manifest row count includes dead rows)
    val r = Seq(ColRange("user_id", Some("1"), Some("4")))
    assert(VersionedStore.countWhere(spark, root, r) === 2L)
    val (m2, r2) = VersionedStore.countPlan(spark, root, r)
    assert(m2.isEmpty && r2.size === 1,
      s"DV'd dir must read as residual under ranges: meta=$m2 residual=$r2")
  }

  test("copy-on-write DML over a DV'd dir materializes the vector: " +
       "UPDATE keeps deleted rows dead and the fresh dir drops the DV " +
       "reference; MERGE treats a deleted key as NOT MATCHED") {
    val root = twoDirStore()
    VersionedStore.deleteWhereDv(spark, root, col("user_id") === 2L)
    // UPDATE touching dir 1: the rewrite must not resurrect user 2
    val v = VersionedStore.updateWhere(spark, root,
      col("user_id") === 1L, Map("value" -> lit(100.0)),
      statsCols = Seq("user_id"))
    assert(ids(root) === Seq(1L, 3L, 4L, 11L, 12L, 13L, 14L))
    assert(VersionedStore.read(spark, root).get
      .filter(col("user_id") === 1L).select("value").as[Double].head() === 100.0)
    assert(!VersionedStore.statsAt(spark, root, v).keys
      .exists(_.endsWith("|#|dv")), "the rewrite drops the DV reference")
    // MERGE: upserting the DELETED key 2 must INSERT it (not-matched),
    // not update a ghost
    val v2 = VersionedStore.deleteWhereDv(spark, root, col("user_id") === 11L)
    val v3 = VersionedStore.mergeInto(spark, root,
      Seq(("2024-01-02", 11L, 999.0)).toDF("day", "user_id", "value"),
      keys = Seq("user_id"), statsCols = Seq("user_id"))
    assert(v3 === v2 + 1)
    val got = VersionedStore.read(spark, root).get
      .filter(col("user_id") === 11L).select("value").as[Double].collect().toSeq
    assert(got === Seq(999.0), s"deleted key must re-insert exactly once: $got")
  }

  test("OPTIMIZE compacts the vector away: the optimized snapshot reads " +
       "identically, carries no DV stats, and restores vectorized " +
       "eligibility; the pre-optimize version still reads DV-filtered") {
    val root = twoDirStore()
    val vDel = VersionedStore.deleteWhereDv(spark, root, col("user_id") === 2L)
    val vOpt = VersionedStore.optimize(spark, root, col("user_id"),
      buckets = 2, statsCols = Seq("user_id"))
    assert(ids(root) === Seq(1L, 3L, 4L, 11L, 12L, 13L, 14L))
    assert(!VersionedStore.statsAt(spark, root, vOpt).keys
      .exists(_.endsWith("|#|dv")), "optimize must drop every DV reference")
    assert(VersionedStore.readAt(spark, root, vDel).count() === 7L,
      "pre-optimize DV'd version still reads filtered")
    assert(VersionedStore.readAt(spark, root, 2L).count() === 8L,
      "pre-delete version still reads everything")
  }

  test("the dir-level change feed REFUSES a range spanning a DV commit " +
       "(rows left without a dir changing hands); the row-level feed " +
       "reports the delta exactly") {
    val root = twoDirStore()
    val vDel = VersionedStore.deleteWhereDv(spark, root,
      col("user_id").isin(2L, 12L))
    val e = intercept[IllegalStateException] {
      VersionedStore.readChanges(spark, root, sinceVersion = 1L)
    }
    assert(e.getMessage.contains("deletion vectors"), e.getMessage)
    // appends AFTER the DV commit still feed incrementally
    VersionedStore.commitAppend(snap("2024-01-03", 21L -> 21.0), root,
      statsCols = Seq("user_id"))
    val inc = VersionedStore.readChanges(spark, root, sinceVersion = vDel).get
    assert(inc.select("user_id").as[Long].collect().toSeq === Seq(21L))
    // row-level feed: the DV step contributes exactly the marked rows
    val feed = VersionedStore.readRowChanges(spark, root, vDel - 1, vDel).get
    val rows = feed.select("user_id", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().toSeq.sorted
    assert(rows === Seq((2L, "delete", vDel), (12L, "delete", vDel)),
      s"DV delta must surface as deletes: $rows")
    // and a range spanning append + DV reports both kinds
    val v3 = VersionedStore.currentVersion(spark, root)
    val all = VersionedStore.readRowChanges(spark, root, 2L, v3).get
      .groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all === Map("delete" -> 2L, "insert" -> 1L), s"got $all")
  }

  test("RESTORE across a DV un-deletes: the row-level feed reports the " +
       "restored rows as inserts, and the restored snapshot reads full") {
    val root = twoDirStore()
    val vDel = VersionedStore.deleteWhereDv(spark, root, col("user_id") === 2L)
    val vRes = VersionedStore.restore(spark, root, 2L)
    assert(ids(root) === Seq(1L, 2L, 3L, 4L, 11L, 12L, 13L, 14L),
      "restore to the pre-DV version reads everything")
    val feed = VersionedStore.readRowChanges(spark, root, vDel, vRes).get
      .select("user_id", "_change_type").as[(Long, String)].collect().toSeq
    assert(feed === Seq((2L, "insert")),
      s"the un-delete must surface as an insert: $feed")
  }

  test("the DSv2 door honors deletion vectors (routed through the row " +
       "path; the vectorized upgrade stands down) and a DV-free store " +
       "keeps the vectorized scan") {
    val root = twoDirStore()
    VersionedStore.deleteWhereDv(spark, root, col("user_id") === 2L)
    val df = spark.read.format("graftstore").load(root)
    assert(df.count() === 7L, "raw file scan would say 8")
    assert(df.filter(col("user_id") === 2L).count() === 0L)
    // filters/pruning still work through the row path
    assert(df.filter(col("user_id") <= 4L).count() === 3L)
    // time travel through the option: pre-delete version reads full
    assert(spark.read.format("graftstore").option("versionAsOf", "2")
      .load(root).count() === 8L)
  }

  test("vacuum sweeps SUPERSEDED sidecars once unreferenced, never a " +
       "referenced one") {
    val root = twoDirStore()
    VersionedStore.deleteWhereDv(spark, root, col("user_id") === 2L)  // v3
    VersionedStore.deleteWhereDv(spark, root, col("user_id") === 3L)  // v4
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def sidecars(): Seq[String] =
      f.globStatus(new org.apache.hadoop.fs.Path(s"$root/data-*/_dv-*"))
        .map(_.getPath.getName).toSeq.sorted
    assert(sidecars().size === 2, "v3's sidecar + v4's superseding union")
    // both referenced while v3 lives: vacuum must keep both
    VersionedStore.vacuum(spark, root)
    assert(sidecars().size === 2, "v3 still references the old sidecar")
    // expire v3 -> the superseded sidecar is unreferenced -> swept
    VersionedStore.expire(spark, root, keepLast = 1)
    VersionedStore.vacuum(spark, root)
    assert(sidecars().size === 1, "superseded sidecar swept, live one kept")
    assert(ids(root) === Seq(1L, 4L, 11L, 12L, 13L, 14L), "reads unharmed")
  }

  test("the DV anti-join BROADCASTS — no shuffle enters a DV'd read plan " +
       "(the scan stays a plain pushdown-friendly parquet read per dir)") {
    val root = twoDirStore()
    VersionedStore.deleteWhereDv(spark, root, col("user_id") === 2L)
    val df = VersionedStore.read(spark, root).get.filter(col("value") > 0)
    assert(df.count() === 7L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected an anti-join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the DV join must broadcast, never shuffle:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(value), GreaterThan(value,0.0)]")
        || plan.contains("GreaterThan(value,0.0)"),
      s"data filters must still push to the parquet scan:\n$plan")
  }

  test("positions address the DIR-RELATIVE file, never the bare name: a " +
       "delete inside one day= partition must not kill same-position " +
       "rows in sibling partitions (one write task reuses its part-file " +
       "name across every partition dir it writes)") {
    val root = tmp()
    // ONE single-task commit spanning 3 days -> one data dir whose three
    // day= subdirs carry IDENTICAL part-file names at identical row
    // positions — the collision a bare-file-name DV key dies on
    val rows = for (d <- 13 to 15; u <- 1L to 4L)
      yield (f"2024-01-$d%02d", u + d * 100, u.toDouble)
    VersionedStore.commitAppend(
      rows.toDF("day", "user_id", "value").coalesce(1),
      root, statsCols = Seq("user_id"))
    val v = VersionedStore.deleteWhereDv(spark, root, col("day") === "2024-01-14")
    assert(v === 2L)
    val byDay = VersionedStore.read(spark, root).get
      .groupBy(col("day").cast("string").as("day")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDay === Map("2024-01-13" -> 4L, "2024-01-15" -> 4L),
      s"sibling-partition rows at the marked positions must survive: $byDay")
  }

  test("prune + verifyPrune carry deleteWhere's correctness contract; " +
       "diff() across a DV commit reports the deleted rows") {
    val root = twoDirStore()
    // sound prune: the predicate implies user_id <= 4
    val v = VersionedStore.deleteWhereDv(spark, root,
      col("user_id") === 2L,
      prune = Seq(ColRange("user_id", Some("1"), Some("4"))),
      verifyPrune = true)
    assert(ids(root) === Seq(1L, 3L, 4L, 11L, 12L, 13L, 14L))
    // wrong prune + verifyPrune: loud failure BEFORE any sidecar lands
    val e = intercept[IllegalStateException] {
      VersionedStore.deleteWhereDv(spark, root,
        col("user_id") === 12L,
        prune = Seq(ColRange("user_id", Some("1"), Some("4"))),
        verifyPrune = true)
    }
    assert(e.getMessage.contains("prune"))
    // diff: multiset delta across the DV commit = one deleted row
    val d = VersionedStore.diff(spark, root, v - 1, v)
      .select("user_id", "__change").as[(Long, String)].collect().toSeq
    assert(d === Seq((2L, "delete")), s"got $d")
  }
}
