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
    graft.sinks.ArtifactStore.ensure(docs, path)(writeTable)

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
    * Managed-table metadata is per-process with the in-memory catalog, so
    * `ensure` semantics here are tableExists-in-this-session (each fresh
    * process rebuilds once; Bench prices it in the artifact phase). */
  def ensureBucketed(docs: DataFrame, table: String, buckets: Int = 32): Unit = {
    val spark = docs.sparkSession
    if (!spark.catalog.tableExists(table)) {
      // With the in-memory catalog a PREVIOUS process's managed-table
      // files can outlive the metadata; saveAsTable refuses to reuse the
      // location (LOCATION_ALREADY_EXISTS), and without its catalog-side
      // bucket spec the orphan data is unusable anyway — clear it.
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      val toks = CacheRegistry.persistBounded(Dedup.shingles(docs))
      val dfreq = toks.groupBy("sh").agg(count(lit(1)).as("df"))
      toks.join(dfreq, Seq("sh"))
        .select("doc_id", "sh", "df")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .format("parquet")
        .bucketBy(buckets, "doc_id").sortBy("doc_id")
        .saveAsTable(table)
    }
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
