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
  }

  /** The stored (doc_id, sh, df) rows. Row-level filters (e.g. a doc_id
    * slice) push down to the parquet scan; shingling commutes with
    * row filters, so `read(...).filter(p)` equals
    * `Dedup.shingles(docs.filter(p))` plus the df stamp. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/shingles")
}
