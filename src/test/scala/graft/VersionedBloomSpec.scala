package graft

import java.nio.file.Files
import java.security.MessageDigest

import graft.sinks.VersionedStore
import graft.sinks.VersionedStore.ColRange
import org.apache.spark.sql.functions.col

/** Per-dir BLOOM skipping (`bloom:` statsCols): equality probes on
  * high-cardinality UNSORTED keys prune dirs where min/max cannot —
  * every dir's [min, max] spans the whole hash domain, so range stats
  * keep everything and the bloom is the only pruner. No false
  * negatives by construction; false positives only keep a dir. */
class VersionedBloomSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-bloom").toString

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** 16 appends × 64 hash-keyed rows; ids are md5 hex, so every dir's
    * min/max nearly spans [0, f] and range pruning is useless. */
  private def hashStore(statsCols: Seq[String]): String = {
    val root = tmp()
    (0 until 16).foreach { k =>
      val rows = (k * 64 until (k + 1) * 64).map(i => (md5hex(i.toString), i.toLong))
      VersionedStore.commitAppend(rows.toDF("id", "n"), root, statsCols = statsCols)
    }
    root
  }

  test("a point probe on a hashed key opens ~1 dir with blooms, ALL 16 without") {
    val bloomed = hashStore(Seq("bloom:id"))
    val plain = hashStore(Seq("id"))
    val target = md5hex("130") // row 130 lives in dir k=2
    val probe = Seq(ColRange.eq("id", target))
    val vB = VersionedStore.currentVersion(spark, bloomed)
    val vP = VersionedStore.currentVersion(spark, plain)
    val openedPlain = VersionedStore.prunedDirs(spark, plain, vP, probe)
    assert(openedPlain.size === 16,
      s"min/max on md5 keys must prune nothing, opened ${openedPlain.size}")
    val openedBloom = VersionedStore.prunedDirs(spark, bloomed, vB, probe)
    assert(openedBloom.size <= 3, // 1 true dir + 1% fp slack on 15 others
      s"bloom must collapse the probe to ~1 dir, opened ${openedBloom.size}")
    // and the read is exact — skipping is an access path, never a filter
    val got = VersionedStore.readAt(spark, bloomed, vB, probe)
      .filter(col("id") === target).select("n").as[Long].collect().toSeq
    assert(got === Seq(130L))
  }

  test("range (non-point) predicates ignore the bloom; value not present " +
       "prunes everything; bloom survives checkpoint resolution") {
    val root = hashStore(Seq("bloom:id"))
    val v = VersionedStore.currentVersion(spark, root)
    // non-point range on the bloomed column: conservative, keeps all
    val range = Seq(ColRange("id", Some("0"), Some("g")))
    assert(VersionedStore.prunedDirs(spark, root, v, range).size === 16)
    // absent value: bloom may fp a dir or two, never the full store
    val absent = Seq(ColRange.eq("id", md5hex("not-a-row")))
    assert(VersionedStore.prunedDirs(spark, root, v, absent).size <= 3)
    // 16 appends crossed the checkpoint interval; stats (incl. blooms)
    // resolved through anchor+tail must still prune — implicitly covered
    // above, asserted explicitly for the probe dir count
    val target = Seq(ColRange.eq("id", md5hex("7")))
    val opened = VersionedStore.prunedDirs(spark, root, v, target)
    assert(opened.nonEmpty && opened.size <= 3)
  }

  test("blooms ride DML rewrites: a rewritten dir's fresh bloom still prunes") {
    val root = hashStore(Seq("bloom:id"))
    // delete one row from dir k=5 → that dir is rewritten via
    // statsForDirs, which must re-record its bloom
    VersionedStore.deleteWhere(spark, root, col("id") === md5hex("321"),
      statsCols = Seq("bloom:id"))
    val v = VersionedStore.currentVersion(spark, root)
    // a surviving neighbor of the deleted row (dir k=5 holds 320..383)
    val probe = Seq(ColRange.eq("id", md5hex("322")))
    val opened = VersionedStore.prunedDirs(spark, root, v, probe)
    assert(opened.nonEmpty && opened.size <= 3,
      s"rewritten dir must carry a fresh bloom, opened ${opened.size}")
    assert(VersionedStore.readAt(spark, root, v, probe)
      .filter(col("id") === md5hex("322")).count() === 1L)
    // the deleted key may fp, but its row is gone
    assert(VersionedStore.read(spark, root).get
      .filter(col("id") === md5hex("321")).count() === 0L)
  }

  test("bloom x rename: a probe on the NEW name keeps pre-rename dirs " +
       "(conservative) and still prunes post-rename ones") {
    val root = tmp()
    (0 until 4).foreach { k =>
      val rows = (k * 16 until (k + 1) * 16).map(i => (md5hex(i.toString), i.toLong))
      VersionedStore.commitAppend(rows.toDF("hid", "n"), root,
        statsCols = Seq("bloom:hid"))
    }
    VersionedStore.renameColumn(spark, root, "hid", "id")
    (4 until 8).foreach { k =>
      val rows = (k * 16 until (k + 1) * 16).map(i => (md5hex(i.toString), i.toLong))
      VersionedStore.commitAppend(rows.toDF("id", "n"), root,
        statsCols = Seq("bloom:id"))
    }
    val v = VersionedStore.currentVersion(spark, root)
    // target lives in post-rename dir k=5; pre-rename dirs' stats are
    // recorded under "hid", so a probe on "id" must KEEP all 4 of them
    // (never wrong) while the post-rename blooms prune their side
    val probe = Seq(ColRange.eq("id", md5hex("85")))
    val opened = VersionedStore.prunedDirs(spark, root, v, probe)
    assert(opened.size >= 4 && opened.size <= 6,
      s"4 statless pre-rename dirs kept + ~1 bloomed post-rename dir, got ${opened.size}")
    assert(VersionedStore.readAt(spark, root, v, probe)
      .filter(col("id") === md5hex("85")).select("n").as[Long]
      .collect().toSeq === Seq(85L))
    // and a pre-rename row is still findable by the new name (read
    // aliases through the column map; its dir is kept unconditionally)
    assert(VersionedStore.readAt(spark, root, v, Seq(ColRange.eq("id", md5hex("3"))))
      .filter(col("id") === md5hex("3")).select("n").as[Long]
      .collect().toSeq === Seq(3L))
  }

  test("the graftstore scan rides the bloom: a pushed equality opens fewer files") {
    import org.apache.spark.sql.SaveMode
    import org.apache.spark.sql.execution.FileSourceScanExec
    val root = tmp()
    (0 until 8).foreach { k =>
      val rows = (k * 64 until (k + 1) * 64).map(i => (md5hex(i.toString), i.toLong))
      rows.toDF("id", "n").write.format("graftstore")
        .option("statsCols", "bloom:id").mode(SaveMode.Append).save(root)
    }
    val one = spark.read.format("graftstore").load(root)
      .filter(col("id") === md5hex("200"))
    one.collect()
    val opened = one.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f.metrics("numFiles").value }.sum
    val total = spark.read.format("graftstore").load(root).inputFiles.length
    assert(opened < total / 2,
      s"pushed equality must ride the bloom: opened $opened of $total files")
    assert(one.select("n").as[Long].collect().toSeq === Seq(200L))
  }
}
