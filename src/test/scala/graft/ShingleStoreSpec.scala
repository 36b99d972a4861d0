package graft

import graft.operators.{DataHygiene, Dedup, SetJoin, ShingleStore}
import org.apache.spark.sql.functions._

/** The maintained shingle table: the stored (doc_id, sh, df) artifact must
  * reproduce every recompute path exactly, rebuild only when its source
  * data changes, and survive a crash at any publish step. */
class ShingleStoreSpec extends SparkSpec {
  import spark.implicits._

  /** Docs parquet on disk (the store's freshness is fingerprinted off
    * source FILES; an in-memory frame would degrade to first-use-only). */
  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("doc_id", "text").write.mode("overwrite").parquet(dir)

  private val fixture = Seq(
    (1L, "red blue green stone tree water sun moon"),
    (2L, "red blue green stone tree water sun"),
    (3L, "moon sun water tree stone green blue red"),
    (4L, "entirely different words live in this document here"),
    (5L, "red blue green stone tree hill"),
    (6L, "entirely different words live in this document too"))

  test("stored shingles + df equal the recompute (rows and df values)") {
    val root = java.nio.file.Files.createTempDirectory("shstore").toString
    try {
      writeDocs(s"$root/docs", fixture)
      val docs = spark.read.parquet(s"$root/docs")
      ShingleStore.ensure(docs, s"$root/art")
      val stored = ShingleStore.read(spark, s"$root/art")
        .select("doc_id", "sh", "df").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val toks = Dedup.shingles(docs)
      val expect = toks.join(
          toks.groupBy("sh").agg(count(lit(1)).as("df")), Seq("sh"))
        .select("doc_id", "sh", "df").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(stored === expect)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("every FromShingles path over the store equals its recompute sibling") {
    val root = java.nio.file.Files.createTempDirectory("shstore").toString
    try {
      writeDocs(s"$root/docs", fixture)
      val docs = spark.read.parquet(s"$root/docs")
      ShingleStore.ensure(docs, s"$root/art")
      val sh = ShingleStore.read(spark, s"$root/art")

      assert(Dedup.minhashPairsFromShingles(sh.select("doc_id", "sh")).collect().toSeq
        === Dedup.minhashPairs(docs).collect().toSeq, "minhash")
      assert(SetJoin.similarPairsFromShingles(sh).collect().toSeq
        === SetJoin.similarPairs(docs).collect().toSeq, "setjoin")
      val even = docs.filter(col("doc_id") % 2 === 0)
      val odd = docs.filter(col("doc_id") % 2 === 1)
      val shs = sh.select("doc_id", "sh")
      assert(DataHygiene.contaminationFromShingles(
          shs.filter(col("doc_id") % 2 === 0), shs.filter(col("doc_id") % 2 === 1),
          minCommon = 1).collect().toSeq
        === DataHygiene.contamination(even, odd, minCommon = 1).collect().toSeq,
        "contamination")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  /** A second batch arriving after the initial build: overlaps fixture
    * shingles (so stored df goes stale for them), brings brand-new
    * shingles, and plants a near-dup PAIR ACROSS the batch boundary (7 ≈
    * 1) that only a correct incremental path can find. */
  private val batch = Seq(
    (7L, "red blue green stone tree water sun moon rock"),
    (8L, "entirely different words live in this document here today"),
    (9L, "fresh unseen vocabulary appears only in the second batch"))

  test("append + refreshDf equals a full rebuild over the union corpus") {
    val root = java.nio.file.Files.createTempDirectory("shstore").toString
    try {
      writeDocs(s"$root/docsA", fixture)
      writeDocs(s"$root/docsB", batch)
      writeDocs(s"$root/docsAll", fixture ++ batch)
      ShingleStore.ensure(spark.read.parquet(s"$root/docsA"), s"$root/inc")
      ShingleStore.append(spark.read.parquet(s"$root/docsB"), s"$root/inc")
      ShingleStore.refreshDf(spark, s"$root/inc")
      ShingleStore.ensure(spark.read.parquet(s"$root/docsAll"), s"$root/full")
      def rows(p: String) = ShingleStore.read(spark, p)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(rows(s"$root/inc") === rows(s"$root/full"),
        "append + refreshDf must reproduce the full rebuild exactly, df included")
      def bands(p: String) = ShingleStore.readBands(spark, p)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(bands(s"$root/inc") === bands(s"$root/full"),
        "the appended band table must equal the full rebuild's (bands are per-doc)")
      // And the bands really are the signatures' bands, not stale copies.
      val recomputed = graft.operators.Dedup
        .bandTable(ShingleStore.read(spark, s"$root/inc").select("doc_id", "sh"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(bands(s"$root/inc") === recomputed)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("stale df after append changes candidates only, never setjoin results") {
    val root = java.nio.file.Files.createTempDirectory("shstore").toString
    try {
      writeDocs(s"$root/docsA", fixture)
      writeDocs(s"$root/docsB", batch)
      writeDocs(s"$root/docsAll", fixture ++ batch)
      ShingleStore.ensure(spark.read.parquet(s"$root/docsA"), s"$root/inc")
      ShingleStore.append(spark.read.parquet(s"$root/docsB"), s"$root/inc")
      // NO refreshDf: overlapped shingles still carry the pre-append df.
      val stale = ShingleStore.read(spark, s"$root/inc")
      ShingleStore.ensure(spark.read.parquet(s"$root/docsAll"), s"$root/full")
      val fresh = ShingleStore.read(spark, s"$root/full")
      // Staleness is real: at least one shingle's stored df undercounts.
      val undercounted = stale.as("s")
        .join(fresh.as("f"), Seq("doc_id", "sh"))
        .filter(col("s.df") < col("f.df")).count()
      assert(undercounted > 0, "fixture must actually exercise a stale df")
      // …and df rows stay CONSISTENT per shingle (one value per sh), the
      // property prefix-filter completeness rides on.
      assert(stale.select("sh", "df").distinct().groupBy("sh").count()
        .filter(col("count") > 1).count() === 0,
        "every row of one shingle must carry the same df")
      // The exact join's RESULTS are identical under the stale order.
      def pairs(t: org.apache.spark.sql.DataFrame) =
        SetJoin.similarPairsFromShingles(t).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val staleRes = pairs(stale)
      assert(staleRes === pairs(fresh),
        "stale df may change candidate counts, never the threshold-join result")
      assert(staleRes.exists { case (a, b, _) => a == 1L && b == 7L },
        "the planted cross-batch near-dup pair must be found")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("stream-maintained artifact equals the batch rebuild; setjoin results unchanged") {
    val root = java.nio.file.Files.createTempDirectory("shstream").toString
    try {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sq = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = graft.streaming.ShingleStream.startToStore(
        input.toDF().toDF("doc_id", "text"), s"$root/inc", s"$root/ckpt")
      try {
        input.addData(fixture: _*); q.processAllAvailable()   // bootstrap build
        input.addData(batch: _*); q.processAllAvailable()     // incremental append
      } finally q.stop()
      graft.operators.ShingleStore.refreshDf(spark, s"$root/inc")
      writeDocs(s"$root/docsAll", fixture ++ batch)
      ShingleStore.ensure(spark.read.parquet(s"$root/docsAll"), s"$root/full")
      def rows(p: String) = ShingleStore.read(spark, p)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(rows(s"$root/inc") === rows(s"$root/full"),
        "streamed appends + refreshDf must reproduce the batch rebuild exactly")
      // The stored-setjoin query over the stream-maintained table returns
      // the same pairs (incl. the planted cross-batch 1 ~ 7 near-dup).
      def pairs(p: String) = SetJoin.similarPairsFromShingles(ShingleStore.read(spark, p))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val streamed = pairs(s"$root/inc")
      assert(streamed === pairs(s"$root/full"), "setjoin over streamed table unchanged")
      assert(streamed.exists { case (a, b, _) => a == 1L && b == 7L })
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("a replayed micro-batch does not double-append (per-batch ledger)") {
    val root = java.nio.file.Files.createTempDirectory("shstream").toString
    try {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sq = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val docs = input.toDF().toDF("doc_id", "text")
      val q1 = graft.streaming.ShingleStream.startToStore(docs, s"$root/inc", s"$root/ckpt")
      try { input.addData(fixture: _*); q1.processAllAvailable() } finally q1.stop()
      val before = ShingleStore.read(spark, s"$root/inc").count()
      // Simulate the crash-replay: same checkpoint, batch 0 re-delivered.
      // MemoryStream restarts renumber from 0, so the ledger must skip it.
      val input2 = MemoryStream[(Long, String)]
      val q2 = graft.streaming.ShingleStream.startToStore(
        input2.toDF().toDF("doc_id", "text"), s"$root/inc", s"$root/ckpt")
      try { input2.addData(fixture: _*); q2.processAllAvailable() } finally q2.stop()
      assert(ShingleStore.read(spark, s"$root/inc").count() === before,
        "a batch id already in the ledger must not append again")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("online dedup-on-arrival: streamed pairs equal sequential batch incremental runs") {
    val root = java.nio.file.Files.createTempDirectory("shdedup").toString
    try {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sq = spark.sqlContext
      // Third wave dups doc 7 (which arrived in wave 2) — proves each
      // batch is checked against EVERYTHING that arrived before it,
      // including prior streamed batches.
      val wave3 = Seq(
        (11L, "red blue green stone tree water sun moon rock extra"),
        (12L, "totally novel text that matches no earlier document at all"))
      val input = MemoryStream[(Long, String)]
      val q = graft.streaming.ShingleStream.startDedupToStore(
        input.toDF().toDF("doc_id", "text"), s"$root/inc", s"$root/pairs", s"$root/ckpt")
      try {
        input.addData(fixture: _*); q.processAllAvailable() // bootstrap: no pairs
        input.addData(batch: _*); q.processAllAvailable()   // vs fixture
        input.addData(wave3: _*); q.processAllAvailable()   // vs fixture ++ batch
      } finally q.stop()
      assert(!new java.io.File(s"$root/pairs/batch_id=0").exists,
        "bootstrap batch has no corpus to dedup against")
      def got(bid: Int) = spark.read.parquet(s"$root/pairs/batch_id=$bid")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(p => (p._1, p._2)).toSeq
      // Batch-mode references: the incremental operator run sequentially.
      def ref(corpus: Seq[(Long, String)], wave: Seq[(Long, String)]) =
        Dedup.minhashPairsIncremental(
            Dedup.shingles(corpus.toDF("doc_id", "text")), wave.toDF("doc_id", "text"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
          .sortBy(p => (p._1, p._2)).toSeq
      assert(got(1) === ref(fixture, batch), "wave 2 pairs vs the bootstrap corpus")
      assert(got(2) === ref(fixture ++ batch, wave3), "wave 3 pairs vs corpus incl. wave 2")
      assert(got(2).exists { case (n, c, _, _) => n == 11L && c == 7L },
        "the planted dup against a STREAMED doc must be flagged")
      // And the artifact ends up identical to a batch rebuild of all waves.
      writeDocs(s"$root/docsAll", fixture ++ batch ++ wave3)
      ShingleStore.ensure(spark.read.parquet(s"$root/docsAll"), s"$root/full")
      ShingleStore.refreshDf(spark, s"$root/inc")
      def rows(p: String) = ShingleStore.read(spark, p)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(rows(s"$root/inc") === rows(s"$root/full"))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("EXACT online dedup-on-arrival: streamed pairs equal sequential exact incremental runs") {
    val root = java.nio.file.Files.createTempDirectory("shexact").toString
    try {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sq = spark.sqlContext
      val wave3 = Seq(
        (11L, "red blue green stone tree water sun moon rock extra"),
        (12L, "totally novel text that matches no earlier document at all"))
      val input = MemoryStream[(Long, String)]
      val q = graft.streaming.ShingleStream.startExactDedupToStore(
        input.toDF().toDF("doc_id", "text"), s"$root/inc", s"$root/pairs", s"$root/ckpt")
      try {
        input.addData(fixture: _*); q.processAllAvailable()
        input.addData(batch: _*); q.processAllAvailable()
        input.addData(wave3: _*); q.processAllAvailable()
      } finally q.stop()
      assert(!new java.io.File(s"$root/pairs/batch_id=0").exists,
        "bootstrap batch has no corpus to dedup against")
      def got(bid: Int) = spark.read.parquet(s"$root/pairs/batch_id=$bid")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(p => (p._1, p._2)).toSeq
      // Batch-mode reference: the exact incremental operator with fresh
      // corpus-df — results must match despite the streamed store's
      // append-consistent (not recounted) df, because df affects only
      // candidate pruning, never the exact output.
      def ref(corpus: Seq[(Long, String)], wave: Seq[(Long, String)]) = {
        val csh = Dedup.shingles(corpus.toDF("doc_id", "text"))
        graft.operators.SetJoin.similarPairsIncremental(
            csh.join(csh.groupBy("sh").agg(count(lit(1)).as("df")), Seq("sh")),
            wave.toDF("doc_id", "text"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
          .sortBy(p => (p._1, p._2)).toSeq
      }
      assert(got(1) === ref(fixture, batch), "wave 2 exact pairs vs the bootstrap corpus")
      assert(got(2) === ref(fixture ++ batch, wave3), "wave 3 exact pairs vs corpus incl. wave 2")
      assert(got(2).exists { case (n, c, _, _) => n == 11L && c == 7L },
        "the planted dup against a STREAMED doc must be flagged")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("ensure() skips rebuild for unchanged source, rebuilds on regenerated data") {
    val root = java.nio.file.Files.createTempDirectory("shstore").toString
    try {
      writeDocs(s"$root/docs", fixture)
      val docs = spark.read.parquet(s"$root/docs")
      ShingleStore.ensure(docs, s"$root/art")
      val mtime1 = new java.io.File(s"$root/art").lastModified()
      ShingleStore.ensure(docs, s"$root/art") // same fingerprint → no-op
      assert(new java.io.File(s"$root/art").lastModified() === mtime1,
        "unchanged source must not trigger a rebuild")
      Thread.sleep(1100) // ensure an mtime-visible difference
      writeDocs(s"$root/docs", fixture :+ (7L, "a brand new document arrives right now"))
      val docs2 = spark.read.parquet(s"$root/docs")
      ShingleStore.ensure(docs2, s"$root/art")
      assert(ShingleStore.read(spark, s"$root/art")
        .filter(col("doc_id") === 7L).count() > 0,
        "regenerated source data must rebuild the artifact in-process")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("bucketed shingle table: per-doc aggregation plans with ZERO exchanges, same results") {
    val root = java.nio.file.Files.createTempDirectory("shstore").toString
    try {
      writeDocs(s"$root/docs", fixture)
      val docs = spark.read.parquet(s"$root/docs")
      val phys = ShingleStore.ensureBucketed(docs, "shstore_spec_bucketed", buckets = 4)
      try {
        val t = spark.table(phys)
        // the layout IS the partitioning: the family's opening groupBy
        // over the stored corpus must not shuffle at all
        val agg = t.groupBy("doc_id").agg(collect_list(col("sh")))
        val plan = agg.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucketed-by-doc_id scan must feed the per-doc agg shuffle-free:\n$plan")
        // rebuild-skip: a second ensure in the same session resolves to
        // the same physical table
        assert(ShingleStore.ensureBucketed(docs, "shstore_spec_bucketed", buckets = 4) === phys)
        // and both family consumers are answer-identical to the recompute
        assert(SetJoin.similarPairsFromShingles(t).collect().toSeq
          === SetJoin.similarPairs(docs).collect().toSeq, "setjoin over bucketed store")
        assert(Dedup.minhashPairsFromShingles(t.select("doc_id", "sh")).collect().toSeq
          === Dedup.minhashPairs(docs).collect().toSeq, "minhash over bucketed store")
      } finally ShingleStore.vacuumBucketed(spark, "shstore_spec_bucketed", keep = Set.empty)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("bk-bucketed band table: the incremental probe's corpus side joins without an Exchange") {
    val root = java.nio.file.Files.createTempDirectory("shstore").toString
    try {
      writeDocs(s"$root/docs", fixture)
      val docs = spark.read.parquet(s"$root/docs")
      val bdT = ShingleStore.ensureBucketedBands(docs, "shstore_spec_bands", buckets = 4)
      try {
        val corpusBands = spark.table(bdT)
        // the probe shape: small batch bands join corpus bands on bk.
        // At fixture scale Spark rightly broadcasts the corpus (bucketing
        // moot); the layout's claim is about the NON-broadcast regime —
        // disable broadcast and the corpus side must arrive
        // pre-partitioned (scan Bucketed: true, no bk Exchange above
        // it), with only the batch side shuffling on bk.
        val plan = {
          val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          try {
            val batchBands = Dedup.bandTable(Dedup.shingles(docs.filter(col("doc_id") === 1L)))
            batchBands.as("a").join(corpusBands.as("b"), "bk")
              .select(col("a.doc_id"), col("b.doc_id"))
              .queryExecution.executedPlan.toString
          } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        }
        assert(plan.contains("Bucketed: true"),
          s"the corpus band scan must use its bucket layout:\n$plan")
        assert("Exchange hashpartitioning\\(bk".r.findAllIn(plan).length === 1,
          s"exactly one bk shuffle — the batch side's — may appear:\n$plan")
        // content: the stored bands equal the recompute
        assert(corpusBands.select("doc_id", "bk").collect().map(_.toSeq).toSet
          === Dedup.bandTable(Dedup.shingles(docs)).collect().map(_.toSeq).toSet)
        // and the full incremental run over both bucketed layouts equals
        // the self-contained recompute
        val shT = ShingleStore.ensureBucketed(docs, "shstore_spec_bands_sh", buckets = 4)
        val bucketed = Dedup.minhashPairsIncremental(
          spark.table(shT).filter(col("doc_id") % 2 === 0).select("doc_id", "sh"),
          docs.filter(col("doc_id") % 2 === 1),
          corpusBands = Some(corpusBands.filter(col("doc_id") % 2 === 0)))
        val recompute = Dedup.minhashPairsIncremental(
          Dedup.shingles(docs.filter(col("doc_id") % 2 === 0)),
          docs.filter(col("doc_id") % 2 === 1))
        assert(bucketed.collect().toSeq === recompute.collect().toSeq)
      } finally {
        ShingleStore.vacuumBucketed(spark, "shstore_spec_bands", keep = Set.empty)
        ShingleStore.vacuumBucketed(spark, "shstore_spec_bands_sh", keep = Set.empty)
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("bucketed table freshness: regenerated source resolves to a NEW table; vacuum reaps the old") {
    val root = java.nio.file.Files.createTempDirectory("shstore").toString
    try {
      writeDocs(s"$root/docs", fixture)
      val docs1 = spark.read.parquet(s"$root/docs")
      val phys1 = ShingleStore.ensureBucketed(docs1, "shstore_spec_fresh", buckets = 4)
      try {
        // source regenerated in-process: the old ensure keyed on bare
        // tableExists and silently served the stale table
        writeDocs(s"$root/docs", fixture :+ (7L, "freshly arrived document"))
        val docs2 = spark.read.parquet(s"$root/docs")
        val phys2 = ShingleStore.ensureBucketed(docs2, "shstore_spec_fresh", buckets = 4)
        assert(phys2 !== phys1, "changed source bytes must resolve to a new physical table")
        assert(spark.table(phys2).filter(col("doc_id") === 7L).count() > 0,
          "the new resolution must serve the regenerated data")
        // a differing bucket count also never reuses the wrong layout
        val phys8 = ShingleStore.ensureBucketed(docs2, "shstore_spec_fresh", buckets = 8)
        assert(phys8 !== phys2)
        // vacuum drops everything but the kept resolution — catalog AND files
        ShingleStore.vacuumBucketed(spark, "shstore_spec_fresh", keep = Set(phys2))
        assert(!spark.catalog.tableExists(phys1) && !spark.catalog.tableExists(phys8))
        assert(spark.catalog.tableExists(phys2))
        val wh = new java.io.File(new java.net.URI(
          spark.conf.get("spark.sql.warehouse.dir")).getPath)
        val leftover = Option(wh.listFiles).getOrElse(Array.empty)
          .filter(_.getName.startsWith("shstore_spec_fresh_")).map(_.getName).toSet
        assert(leftover === Set(phys2), s"vacuum must reap superseded locations, saw $leftover")
      } finally ShingleStore.vacuumBucketed(spark, "shstore_spec_fresh", keep = Set.empty)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("bucketed table adoption: a fresh catalog re-registers complete files without rebuild") {
    val root = java.nio.file.Files.createTempDirectory("shstore").toString
    try {
      writeDocs(s"$root/docs", fixture)
      val docs = spark.read.parquet(s"$root/docs")
      val phys = ShingleStore.ensureBucketed(docs, "shstore_spec_adopt", buckets = 4)
      try {
        val wh = new java.io.File(new java.net.URI(
          spark.conf.get("spark.sql.warehouse.dir")).getPath)
        val loc = new java.io.File(wh, phys)
        // Simulate a process restart (in-memory catalog gone, files live):
        // stash the data dir, drop the managed table (which deletes it),
        // restore the files.
        val stash = new java.io.File(root, "stash")
        org.apache.commons.io.FileUtils.copyDirectory(loc, stash)
        spark.sql(s"DROP TABLE $phys")
        assert(!loc.exists)
        org.apache.commons.io.FileUtils.copyDirectory(stash, loc)
        val mtimes = loc.listFiles.map(f => f.getName -> f.lastModified).toMap
        // ensure must ADOPT: same physical name, no rebuild, files untouched
        assert(ShingleStore.ensureBucketed(docs, "shstore_spec_adopt", buckets = 4) === phys)
        assert(loc.listFiles.map(f => f.getName -> f.lastModified).toMap === mtimes,
          "adoption must re-register, not rewrite, the completed files")
        // the adopted table still carries the bucket spec: zero-Exchange agg
        val plan = spark.table(phys).groupBy("doc_id").agg(collect_list(col("sh")))
          .queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"adopted table must keep HashPartitioning(doc_id):\n$plan")
        assert(Dedup.minhashPairsFromShingles(
            spark.table(phys).select("doc_id", "sh")).collect().toSeq
          === Dedup.minhashPairs(docs).collect().toSeq, "adopted content exact")
        // a HALF-written location (no _SUCCESS — crashed build) is NOT
        // adopted: cleared and rebuilt instead. DROP the external adopted
        // table (leaves files), strip the completion marker, re-ensure.
        spark.sql(s"DROP TABLE $phys")
        if (loc.exists) org.apache.commons.io.FileUtils.deleteDirectory(loc)
        org.apache.commons.io.FileUtils.copyDirectory(stash, loc)
        assert(new java.io.File(loc, "_SUCCESS").delete())
        assert(ShingleStore.ensureBucketed(docs, "shstore_spec_adopt", buckets = 4) === phys)
        assert(new java.io.File(loc, "_SUCCESS").exists,
          "an incomplete location must be rebuilt, not adopted")
        assert(Dedup.minhashPairsFromShingles(
            spark.table(phys).select("doc_id", "sh")).collect().toSeq
          === Dedup.minhashPairs(docs).collect().toSeq, "rebuilt content exact")
      } finally ShingleStore.vacuumBucketed(spark, "shstore_spec_adopt", keep = Set.empty)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("appendOnce: replay never double-appends; a half-landed append (shingles only) is completed") {
    val root = java.nio.file.Files.createTempDirectory("shonce").toString
    try {
      writeDocs(s"$root/docs", fixture)
      ShingleStore.write(spark.read.parquet(s"$root/docs"), s"$root/art")
      val batchDf = batch.toDF("doc_id", "text")
      ShingleStore.appendOnce(batchDf, s"$root/art")
      val rows1 = ShingleStore.read(spark, s"$root/art").count()
      val bands1 = ShingleStore.readBands(spark, s"$root/art").count()
      // at-least-once replay: the batch runs again after its append landed
      ShingleStore.appendOnce(batchDf, s"$root/art")
      assert(ShingleStore.read(spark, s"$root/art").count() === rows1,
        "replayed appendOnce must not duplicate shingle rows")
      assert(ShingleStore.readBands(spark, s"$root/art").count() === bands1,
        "replayed appendOnce must not duplicate band rows")
      // crash between the two parquet jobs: shingles landed, bands did not
      val wave2 = Seq((21L, "crashed mid append wave two document text")).toDF("doc_id", "text")
      val toks = Dedup.shingles(wave2)
      toks.withColumn("df", lit(1L)).select("doc_id", "sh", "df")
        .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(s"$root/art/shingles")
      ShingleStore.appendOnce(wave2, s"$root/art")
      assert(ShingleStore.read(spark, s"$root/art")
        .filter(col("doc_id") === 21L).count() === toks.count(),
        "shingles must not be re-appended when already landed")
      assert(ShingleStore.readBands(spark, s"$root/art")
        .filter(col("doc_id") === 21L).count() > 0,
        "the missing band rows must be appended on replay")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("replayed dedup-on-arrival: corpus anti-join yields the pre-append pairs, no self-pairs") {
    // Simulates the crash window between ShingleStore.append and the
    // ledger-mark create: the store ALREADY contains the batch when the
    // probe re-runs. The sinks' corpus read anti-joins the batch's ids,
    // so the recomputed pairs must equal the pre-append reference — in
    // particular no (x, x) jaccard-1.0 self-pairs and no batch-vs-
    // batch-copy pairs.
    val root = java.nio.file.Files.createTempDirectory("shreplay").toString
    try {
      writeDocs(s"$root/docs", fixture)
      ShingleStore.write(spark.read.parquet(s"$root/docs"), s"$root/art")
      val batchDf = batch.toDF("doc_id", "text")
      val expectExact = SetJoin.similarPairsIncremental(
        ShingleStore.read(spark, s"$root/art"), batchDf).collect().toSeq
      val expectMinhash = Dedup.minhashPairsIncremental(
        ShingleStore.read(spark, s"$root/art").select("doc_id", "sh"), batchDf,
        corpusBands = Some(ShingleStore.readBands(spark, s"$root/art"))).collect().toSeq
      ShingleStore.appendOnce(batchDf, s"$root/art") // the landed append
      val batchIds = batchDf.select("doc_id").distinct()
      val replayExact = SetJoin.similarPairsIncremental(
        ShingleStore.read(spark, s"$root/art")
          .join(broadcast(batchIds), Seq("doc_id"), "left_anti"),
        batchDf).collect().toSeq
      assert(replayExact === expectExact,
        "exact replay pairs must equal the pre-append run")
      val replayMinhash = Dedup.minhashPairsIncremental(
        ShingleStore.read(spark, s"$root/art").select("doc_id", "sh")
          .join(broadcast(batchIds), Seq("doc_id"), "left_anti"),
        batchDf,
        corpusBands = Some(ShingleStore.readBands(spark, s"$root/art")
          .join(broadcast(batchIds), Seq("doc_id"), "left_anti"))).collect().toSeq
      assert(replayMinhash === expectMinhash,
        "minhash replay pairs must equal the pre-append run")
      assert(!replayExact.exists(r => r.getLong(0) == r.getLong(1)),
        "no self-pairs on replay")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("vacuumBucketed matches the exact generated shape — an extending logical name survives") {
    val root = java.nio.file.Files.createTempDirectory("shvac").toString
    try {
      writeDocs(s"$root/docs", fixture)
      val docs = spark.read.parquet(s"$root/docs")
      val short = ShingleStore.ensureBucketed(docs, "shstore_spec_vac", buckets = 4)
      val long = ShingleStore.ensureBucketed(docs, "shstore_spec_vac_sub", buckets = 4)
      try {
        // vacuuming the SHORT logical name with keep=empty must reap its
        // own generations only — never 'shstore_spec_vac_sub_*'
        ShingleStore.vacuumBucketed(spark, "shstore_spec_vac", keep = Set.empty)
        assert(!spark.catalog.tableExists(short), "own generation reaped")
        assert(spark.catalog.tableExists(long),
          "a logical name extending the vacuumed one must survive")
        assert(spark.table(long).count() > 0, "surviving table still readable")
      } finally ShingleStore.vacuumBucketed(spark, "shstore_spec_vac_sub", keep = Set.empty)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

}
