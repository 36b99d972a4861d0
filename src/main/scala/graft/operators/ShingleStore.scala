package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The MAINTAINED SHINGLE TABLE — the dedup/contamination family's stored
  * artifact, closing the documented "tokenizes per query" seam the same
  * way [[Search]]'s posting table closed the lexical one: `(doc_id, sh,
  * df)` — every document's distinct word-3-gram shingles, each stamped
  * with its exact corpus-wide document frequency — written ONCE per
  * corpus version and read by every query in the family
  * ([[Dedup.minhashPairsFromShingles]],
  * [[DataHygiene.contaminationFromShingles]],
  * [[SetJoin.similarPairsFromShingles]]).
  *
  * At 100 TB this is the design answer the operators' scaladocs have been
  * naming: tokenization (explode + distinct per doc) is ~|corpus tokens|
  * rows of work that every dedup-family query was re-running; as a stored
  * table it is paid once per ingest, incrementally for new documents
  * (shingling is per-row, so appending docs appends rows — only the df
  * column needs a periodic refresh, and df consumers tolerate staleness:
  * SetJoin's ordering needs only CONSISTENCY, not accuracy). The df
  * stamp is built with the same AQE-skew-splittable agg+join as
  * [[SetJoin.similarPairs]] — never a per-shingle window — and since the
  * build is once-per-corpus, its second shuffle amortizes to zero.
  *
  * Freshness (per-process, source-fingerprint keyed), build caching, and
  * crash-safe rename publish all ride [[graft.sinks.ArtifactStore]],
  * shared with the lexical index.
  */
object ShingleStore {

  /** Build the shingle table at `path` unless this process already built
    * it from the same source data. */
  def ensure(docs: DataFrame, path: String): Unit =
    graft.sinks.ArtifactStore.ensure(docs, path, builderId = "sh1")(writeTable)

  /** Unconditional rebuild + atomic publish (idempotent). */
  def write(docs: DataFrame, path: String): Unit =
    graft.sinks.ArtifactStore.publish(docs.sparkSession, path)(
      tmp => writeTable(docs, tmp))

  private def writeTable(docs: DataFrame, tmpRoot: String): Unit = {
    val toks = CacheRegistry.persistBounded(Dedup.shingles(docs))
    val dfreq = toks.groupBy("sh").agg(count(lit(1)).as("df"))
    toks.join(dfreq, Seq("sh"))
      .select("doc_id", "sh", "df")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$tmpRoot/shingles")
    // The LSH band table rides the same artifact: per-doc (own-shingles-
    // only) rows, so it appends exactly like the shingles do. Persisting
    // it is what makes incremental dedup batch-proportional — without it
    // every probe re-runs the corpus-wide signature aggregation.
    Dedup.bandTable(toks)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$tmpRoot/bands")
  }

  /** The stored (doc_id, sh, df) rows. Row-level filters (e.g. a doc_id
    * slice) push down to the parquet scan; shingling commutes with
    * row filters, so `read(...).filter(p)` equals
    * `Dedup.shingles(docs.filter(p))` plus the df stamp. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/shingles")

  /** BUCKETED edition of the stored shingle table — the same (doc_id, sh,
    * df) rows written `bucketBy(doc_id).sortBy(doc_id)` as a catalog
    * table, so the scan itself reports `HashPartitioning(doc_id)` and the
    * family's dominant corpus shuffle — the per-doc `groupBy(doc_id)`
    * collect that every stored consumer opens with
    * ([[SetJoin.similarPairsFromShingles]]'s sorted-doc build,
    * [[Dedup.minhashPairsFromShingles]]'s signature aggregation) — plans
    * with NO exchange: the layout is the partitioning, paid once at
    * ingest and reused by every query (gated by `ShingleStoreSpec`'s
    * zero-Exchange plan audit). At 100 TB this converts the biggest
    * recurring shuffle of the dedup family into a property of the stored
    * bytes — the "reuse a partitioning across stages" lever, applied to
    * the artifact every query in the family reads.
    *
    * Freshness rides the PHYSICAL NAME, [[graft.sinks.ArtifactStore]]
    * style: the catalog table is `<table>_<source-fingerprint>_b<buckets>`
    * (returned to the caller), so a source regenerated within one process
    * resolves to a NEW table and can never be served stale data, and a
    * differing `buckets` argument never silently reuses the wrong layout.
    * Managed-table metadata is per-process with the in-memory catalog, so
    * a fresh process finds complete files from a previous run at the
    * fingerprinted location and ADOPTS them as an external bucketed table
    * (DDL re-registration — no rebuild, and no deleting bytes a
    * concurrent process may be scanning); only an incomplete location
    * (no _SUCCESS — a crashed build) is cleared and rebuilt. Superseded
    * fingerprints accumulate until [[vacuumBucketed]]. */
  def ensureBucketed(docs: DataFrame, table: String, buckets: Int = 32): String =
    ensureBucketedTable(docs, table, buckets, "doc_id") {
      val toks = CacheRegistry.persistBounded(Dedup.shingles(docs))
      val dfreq = toks.groupBy("sh").agg(count(lit(1)).as("df"))
      toks.join(dfreq, Seq("sh")).select("doc_id", "sh", "df")
    }

  /** BUCKETED LSH band table (doc_id, bk), bucketed BY BK — the corpus
    * side of the incremental band probe as a stored layout: the probe is
    * an equi-join on bk ([[Dedup.minhashPairsIncremental]]), so a
    * bk-bucketed corpus scan arrives pre-partitioned on the join key and
    * only the (small) new-batch side shuffles — at 100 TB the corpus band
    * table is rewritten never and probed daily, exactly the read/write
    * asymmetry bucketing pays for. Pair it with [[ensureBucketed]] (the
    * doc_id layout) for the candidate shingle fetch. Same fingerprinted
    * naming/adoption/vacuum contract as [[ensureBucketed]]. */
  def ensureBucketedBands(docs: DataFrame, table: String, buckets: Int = 32): String =
    ensureBucketedTable(docs, table, buckets, "bk") {
      Dedup.bandTable(CacheRegistry.persistBounded(Dedup.shingles(docs)))
    }

  /** Shared fingerprinted-bucketed-table machinery: resolve the physical
    * name from (source fingerprint, bucket count), adopt complete orphan
    * files from a dead process's catalog, rebuild otherwise. NOTE the
    * fingerprint covers the source FILES, not a row filter — call sites
    * slicing the same files differently must use distinct logical
    * `table` names. */
  private def ensureBucketedTable(docs: DataFrame, table: String, buckets: Int,
                                  bucketCol: String)(rows: => DataFrame): String = {
    val spark = docs.sparkSession
    val fp = graft.sinks.ArtifactStore.sourceFingerprint(docs)
    val phys = s"${table}_${fp.take(12)}_b$buckets"
    if (!spark.catalog.tableExists(phys)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), phys)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(new org.apache.hadoop.fs.Path(loc, "_SUCCESS"))) {
        // Complete files from a previous process, same source bytes and
        // bucket count (both are in the name) written by this same code —
        // re-register instead of rebuilding. CLUSTERED BY restores the
        // catalog-side bucket spec the dead process's catalog held, so the
        // scan keeps reporting HashPartitioning(bucketCol).
        val schema = spark.read.parquet(loc.toString).schema.toDDL
        spark.sql(
          s"CREATE TABLE $phys ($schema) USING parquet " +
            s"CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol) INTO $buckets BUCKETS " +
            s"LOCATION '${loc.toString}'")
      } else {
        // Absent, or half-written by a crashed build — clear and rebuild.
        if (fs.exists(loc)) fs.delete(loc, true)
        rows
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .format("parquet")
          .bucketBy(buckets, bucketCol).sortBy(bucketCol)
          .saveAsTable(phys)
      }
    }
    phys
  }

  /** Reap SUPERSEDED bucketed shingle tables: fingerprinted physical names
    * accumulate as the source evolves (each [[ensureBucketed]] of changed
    * data lands a new `<table>_<fp>_b<n>`), so periodic maintenance drops
    * every catalog entry and warehouse location under `table`'s prefix
    * except the ones in `keep` (the caller's live resolutions — what the
    * last ensureBucketed returned). Like [[graft.sinks.VersionedStore
    * .vacuum]], run from a maintenance window: it deletes files, and
    * cannot tell whether ANOTHER process is still scanning an old
    * fingerprint. */
  def vacuumBucketed(spark: SparkSession, table: String, keep: Set[String]): Unit = {
    // Match the EXACT generated shape <table>_<12-hex-fp>_b<buckets>, not
    // a bare prefix: logical names can extend each other ("bands" vs
    // "bands_sh"), and a prefix sweep of the shorter one would reap the
    // longer one's live tables.
    val pat = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(table) + "_[0-9a-f]{12}_b\\d+")
    def generated(n: String): Boolean = pat.matcher(n).matches()
    spark.catalog.listTables().collect()
      .map(_.name).filter(n => generated(n) && !keep.contains(n))
      .foreach { n =>
        // External (adopted) tables don't drop their files; managed ones
        // do — the location sweep below covers both uniformly.
        spark.sql(s"DROP TABLE IF EXISTS $n")
      }
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(wh)) fs.listStatus(wh).toSeq
      .filter(s => s.isDirectory && generated(s.getPath.getName)
        && !keep.contains(s.getPath.getName))
      .foreach(s => fs.delete(s.getPath, true))
  }

  /** The stored LSH band table (doc_id, bk) — the corpus side of
    * [[Dedup.minhashPairsIncremental]]'s probe. */
  def readBands(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/bands")

  /** INCREMENTAL ingest — the append path the class doc names: shingle
    * ONLY `newDocs` (per-row work proportional to the batch, not the
    * corpus) and append their rows to the published table.
    *
    * Df stamping keeps the one property prefix filtering actually needs —
    * CONSISTENCY (every row of a shingle carries the SAME df, so all docs
    * sort by one global (df, sh) total order; completeness of the prefix
    * filter holds under ANY consistent order, stale or not):
    *  - a shingle already in the table keeps the STORED df (stale — the
    *    appended occurrences are not counted until [[refreshDf]]);
    *  - a brand-new shingle (only the batch has it) is stamped with its
    *    batch-internal df, trivially consistent.
    * Stale df can therefore change candidate COUNTS (ordering quality)
    * but never results — the property [[refreshDf]] restores is
    * pruning power, not correctness (spec-gated).
    *
    * The caller owns corpus versioning on this path: append marks the
    * artifact's per-process build record stale
    * ([[graft.sinks.ArtifactStore.invalidate]]), so a later `ensure`
    * with ANY source rebuilds rather than trusting a pre-append record. */
  def append(newDocs: DataFrame, path: String): Unit = {
    val stored = read(newDocs.sparkSession, path)
    // df is consistent per shingle by construction, so max == the value.
    val storedDf = stored.groupBy("sh").agg(max(col("df")).as("df_stored"))
    val toks = CacheRegistry.persistBounded(Dedup.shingles(newDocs))
    val batchDf = toks.groupBy("sh").agg(count(lit(1)).as("df_batch"))
    toks
      .join(batchDf, Seq("sh"))
      .join(storedDf, Seq("sh"), "left_outer")
      .select(col("doc_id"), col("sh"),
        coalesce(col("df_stored"), col("df_batch")).as("df"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"$path/shingles")
    // Band rows are per-doc: the batch's bands derive from ITS shingles
    // alone, so append is exact (no staleness analog of df here).
    Dedup.bandTable(toks)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"$path/bands")
    graft.sinks.ArtifactStore.invalidate(path)
  }

  /** IDEMPOTENT edition of [[append]] for at-least-once callers (the
    * streaming sinks' replay path): probe whether the batch's doc_ids
    * already landed in each of the artifact's two tables and append only
    * the missing ones. The probes are batch-id semi-joins with LIMIT 1 —
    * pruned scans, batch-proportional, never a corpus shuffle. Each
    * table is probed SEPARATELY because [[append]] is two parquet jobs:
    * a crash between them leaves shingles landed and bands not, and a
    * single presence bit would then skip the band append and silently
    * lose the batch from every future band probe.
    *
    * Residual window (documented, not hidden): parquet job commit itself
    * is not atomic — a crash DURING the committer's rename sweep can
    * leave a partial file set that the probe reads as "landed". Closing
    * that needs a manifest commit ([[graft.sinks.VersionedStore]]); this
    * store trades it for the append-only layout's zero-rewrite ingest. */
  def appendOnce(newDocs: DataFrame, path: String): Unit = {
    val spark = newDocs.sparkSession
    val ids = newDocs.select("doc_id").distinct()
    val shingleHit = !read(spark, path)
      .join(broadcast(ids), Seq("doc_id"), "left_semi").limit(1).isEmpty
    val bandHit = !readBands(spark, path)
      .join(broadcast(ids), Seq("doc_id"), "left_semi").limit(1).isEmpty
    if (shingleHit && bandHit) return
    val toks = CacheRegistry.persistBounded(Dedup.shingles(newDocs))
    if (!shingleHit) {
      val storedDf = read(spark, path).groupBy("sh").agg(max(col("df")).as("df_stored"))
      val batchDf = toks.groupBy("sh").agg(count(lit(1)).as("df_batch"))
      toks
        .join(batchDf, Seq("sh"))
        .join(storedDf, Seq("sh"), "left_outer")
        .select(col("doc_id"), col("sh"),
          coalesce(col("df_stored"), col("df_batch")).as("df"))
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .parquet(s"$path/shingles")
    }
    if (!bandHit) {
      Dedup.bandTable(toks)
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .parquet(s"$path/bands")
    }
    graft.sinks.ArtifactStore.invalidate(path)
  }

  /** Periodic df refresh after one or more [[append]]s: recount df over
    * the stored (doc_id, sh) rows — never re-tokenizing any document —
    * and republish atomically. append + refreshDf ≡ a full rebuild over
    * the union corpus (spec-gated), at the cost of one shuffle over the
    * shingle table instead of a corpus re-shingle. */
  def refreshDf(spark: SparkSession, path: String): Unit = {
    graft.sinks.ArtifactStore.publish(spark, path) { tmp =>
      // The build's write action fully materializes while the current
      // artifact is still in place (publish renames only after the build
      // returns), so reading the target path here is safe.
      val rows = CacheRegistry.persistBounded(
        read(spark, path).select("doc_id", "sh"))
      val dfreq = rows.groupBy("sh").agg(count(lit(1)).as("df"))
      rows.join(dfreq, Seq("sh"))
        .select("doc_id", "sh", "df")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$tmp/shingles")
      // publish swaps the WHOLE artifact dir — carry the band table into
      // the new version (bands are df-independent; a recompute from the
      // stored rows is also a correctness re-derivation, amortized at
      // refresh cadence).
      Dedup.bandTable(rows)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$tmp/bands")
    }
    graft.sinks.ArtifactStore.invalidate(path)
  }
}
