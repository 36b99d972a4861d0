package graft.operators

import graft.functions.{BpeRanks, BpeTokenizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The MAINTAINED BPE VOCABULARY — a trained byte-level merge table plus
  * golden expected counts, stored once per corpus and read by the
  * token-pricing queries (`token_count_bpe`, `budget_select_bpe`).
  *
  * Layout under `path` (built via [[graft.sinks.ArtifactStore]] —
  * fingerprint-keyed rebuild, crash-safe rename publish, like the
  * lexical index and the shingle table):
  * {{{
  *   merges/   (rank, a_hex, b_hex)  the ordered merge table
  *   golden/   (doc_id, n_tokens)    per-doc counts by the INDEPENDENT
  *                                   rank-order-replay encoder — the
  *                                   DuckDB oracle's stored expectations
  * }}}
  *
  * Training reads a BOUNDED, DETERMINISTIC sample (first `sampleDocs`
  * docs by doc_id, capped at `sampleBytes`) driver-side — the standard
  * tokenizer-training shape: the vocabulary is a bounded-sample artifact,
  * ENCODING is the corpus-scale distributed work. The golden build runs
  * the replay encoder distributed over every document (one map, no
  * shuffle), so the stored expectations cover the whole corpus, not the
  * training sample.
  *
  * Hex encoding for the merge symbols: merges are raw BYTE strings
  * (ISO-8859-1), not valid UTF-8 — hex round-trips them losslessly
  * through parquet's string type. */
object BpeStore {

  def ensure(docs: DataFrame, path: String,
             maxMerges: Int = 8192, sampleDocs: Int = 4000,
             sampleBytes: Long = 4L << 20): Unit =
    graft.sinks.ArtifactStore.ensure(docs, path,
      builderId = s"bpe1:m=$maxMerges:d=$sampleDocs:b=$sampleBytes") { (src, tmp) =>
      val spark = src.sparkSession
      // Deterministic bounded sample: smallest doc_ids first, capped at
      // sampleBytes of UTF-8 (the sample stops at the first doc crossing
      // the cap, so it can overshoot by at most that one document).
      val collected = src.select(col("doc_id"), col("text"))
        .orderBy("doc_id").limit(sampleDocs).collect()
      val sample = scala.collection.mutable.ArrayBuffer.empty[String]
      var bytes = 0L
      collected.foreach { r =>
        val t = r.getString(1)
        if (t != null && bytes < sampleBytes) {
          sample += t
          bytes += t.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
        }
      }
      val merges = BpeTokenizer.train(sample, maxMerges)
      def hex(s: String): String =
        s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          .map("%02x".format(_)).mkString
      import spark.implicits._
      merges.zipWithIndex
        .map { case ((a, b), i) => (i, hex(a), hex(b)) }
        .toDF("rank", "a_hex", "b_hex")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/merges")
      // Golden expectations: the REPLAY encoder (independent of the
      // query path's greedy encoder), distributed per-row over the FULL
      // corpus. Broadcast the small merge table; no shuffle.
      val ranks = new BpeRanks(merges)
      val bc = spark.sparkContext.broadcast(ranks)
      src.select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, t) =>
          (id, if (t == null) 0L else bc.value.countTokensReference(t)) }
        .toDF("doc_id", "n_tokens")
        .write.mode("overwrite").parquet(s"$tmp/golden")
    }

  /** The stored merge table as an encoder. */
  def readRanks(spark: SparkSession, path: String): BpeRanks = {
    def unhexS(h: String): String = new String(
      h.grouped(2).map(x => Integer.parseInt(x, 16).toByte).toArray,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val merges = spark.read.parquet(s"$path/merges")
      .orderBy("rank").collect()
      .map(r => (unhexS(r.getString(1)), unhexS(r.getString(2))))
      .toVector
    new BpeRanks(merges)
  }

  /** Where the golden expected counts live — the DuckDB oracle reads
    * this path directly (read_parquet of stored expectations). */
  def goldenDir(path: String): String = s"$path/golden"
}
