package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Md5Hash60.md5_hash60

/** Duplicate-substring span detection — the span-granularity dedup of
  * Lee et al., "Deduplicating Training Data Makes Language Models Better"
  * (ACL 2022): instead of dropping whole near-duplicate documents, find
  * the exact token runs that are shared across documents (boilerplate,
  * licenses, templated headers) so a pipeline can excise just those.
  *
  * The reference paper builds a suffix array — inherently sequential and
  * memory-resident. The Spark-native re-expression: every word n-gram
  * occurrence `(doc_id, pos, h)` is a row; an n-gram whose hash occurs in
  * ≥ 2 distinct documents is "shared"; maximal runs of consecutive shared
  * positions within a document are the duplicated spans (a run of m
  * consecutive shared n-grams ⇔ a shared substring of m + n - 1 tokens,
  * modulo hash collisions at 2^-60). Every step is a shuffle-by-key or a
  * doc-bounded window:
  *
  *  - gram table: posexplode over the shared word split — row count =
  *    Σ tokens, the same scale the tokenizer already touches;
  *  - sharedness: groupBy(h) count-distinct-docs (map-side combining,
  *    AQE-skew-splittable) + equi-join back — the SetJoin df-stamping
  *    shape, NEVER a per-hash window;
  *  - span assembly: the islands trick (pos − row_number) inside a window
  *    PARTITIONED BY doc_id — state bounded by one document's length.
  *
  * No all-pairs comparison anywhere: cost scales with corpus tokens, not
  * document pairs.
  */
object DupSpans {

  /** Word-n-gram occurrences: (doc_id, pos, h) with pos 0-based over the
    * shared [[TextAnalysis.wordsExpr]] split — positions are NOT
    * deduplicated (spans need every occurrence, unlike [[Dedup.shingles]]). */
  private[operators] def gramOccurrences(docs: DataFrame, n: Int): DataFrame = {
    val gram = (0 until n).map(j => s"w[i+$j]").mkString(", ")
    // Narrow-scan spread before tokenize + per-gram md5 (guide §2.5):
    // otherwise single-task over a one-file corpus scan.
    SkewUtils.spreadCompute(
      docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"), graft.operators.TextAnalysis.wordsExpr.as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"),
        posexplode(expr(s"transform(sequence(0, size(w)-$n), i -> concat_ws(' ', $gram))"))
          .as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos"), md5_hash60(col("gram")).as("h"))
  }

  /** Maximal cross-document duplicate spans: one row per (doc_id, maximal
    * run of consecutive positions whose n-gram appears in ≥ `minDocs`
    * distinct documents). `span_start`/`span_end` are inclusive 0-based
    * token indexes (`span_end` covers the last gram's final token);
    * `span_grams` is the run length in grams. */
  def spans(docs: DataFrame, n: Int = 5, minDocs: Int = 2): DataFrame = {
    // The gram table feeds BOTH the sharedness aggregate and the join-back
    // side — unpersisted, the tokenize+posexplode subtree evaluates twice.
    // Measured at sf0.1 (interleaved A/B, 2 rounds): 1.78-1.94 s plain vs
    // 0.78-0.79 s persisted. Bounded registry, same discipline as
    // SetJoin's one persisted tokenization.
    val grams = CacheRegistry.persistBounded(gramOccurrences(docs, n))
    val shared = grams
      .groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("h"))
    val hits = grams.join(shared, "h") // equi-join on the hash, shuffle-by-key
    val island = col("pos") - row_number().over(
      Window.partitionBy(col("doc_id")).orderBy(col("pos")))
    hits
      .withColumn("grp", island)
      .groupBy(col("doc_id"), col("grp"))
      .agg(
        min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + lit(n - 1)).cast("long").as("span_end"),
        count(lit(1)).as("span_grams"))
      .select(col("doc_id"), col("span_start"), col("span_end"), col("span_grams"))
  }

  /** Span excision — the ACT step after detection: re-emit each document
    * with every token inside a cross-document duplicate span removed.
    *
    * Policy: excise in EVERY document (the simplest deterministic policy;
    * a keep-one-copy policy needs a global "which doc owns this span"
    * assignment — at scale that's a second groupBy over span hashes, same
    * shapes, deliberately out of scope here). Documents that are 100%
    * boilerplate come back with empty text and `n_kept = 0` rather than
    * disappearing — dropping is a separate, explicit filter.
    *
    * Shape: tokens posexplode (corpus-token-scale rows), an equi-join on
    * doc_id with the span containment as residual (per-doc span counts are
    * bounded, so the residual fan-out is bounded), and one per-doc ordered
    * re-assembly via sort_array(collect_list(struct(pos, token))) — group
    * state bounded by one document's length, like the islands window. */
  def excise(docs: DataFrame, n: Int = 5, minDocs: Int = 2): DataFrame =
    fingerprinted(exciseBySpans(docs,
      spans(docs, n, minDocs)
        .select(col("doc_id").as("sp_doc"), col("span_start"), col("span_end"))))

  /** Keep-one-copy span excision — the Lee et al. policy most pipelines
    * actually want: each duplicate span keeps ONE canonical occurrence
    * corpus-wide and is excised everywhere else.
    *
    * Ownership is content-addressed: a span's fingerprint is the md5 of
    * its token slice; the owner occurrence is the (min doc_id, then min
    * span_start) over the fingerprint group — one more groupBy + equi-join
    * of the shapes [[spans]] already uses, nothing pairwise. Two
    * occurrences are "the same span" iff their maximal runs carry
    * identical text; a shared run embedded in a LONGER maximal run
    * elsewhere fingerprints differently and is conservatively kept —
    * deterministic, and errs toward keeping data.
    *
    * Scale: the fingerprint join ships each doc's word array once per
    * span of that doc; per-doc span counts are bounded by doc length, and
    * the fingerprint groupBy is map-side combining on md5 keys (uniform,
    * skew-free). */
  def exciseKeepOne(docs: DataFrame, n: Int = 5, minDocs: Int = 2): DataFrame =
    fingerprinted(keepOneKeptText(docs, n, minDocs))

  /** Text-level twin of [[exciseKeepOne]] (spec surface: lets tests assert
    * "exactly one occurrence of each shared span survives" on the actual
    * reassembled text, which the md5 output can't show). */
  private[graft] def keepOneKeptText(docs: DataFrame, n: Int, minDocs: Int): DataFrame = {
    val spf = spans(docs, n, minDocs)
      .join(docs.select(col("doc_id"), graft.operators.TextAnalysis.wordsExpr.as("w")), Seq("doc_id"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        md5(array_join(
          slice(col("w"), (col("span_start") + 1).cast("int"),
            (col("span_end") - col("span_start") + 1).cast("int")), " ")).as("fp"))
    // Canonical owner per fingerprint: min (doc_id, span_start) — struct
    // min is the two-stage min (min doc, then min start within it), which
    // is how the DuckDB oracle states it.
    val owner = spf.groupBy(col("fp"))
      .agg(min(struct(col("doc_id"), col("span_start"))).as("o"))
      .select(col("fp"), col("o.doc_id").as("own_doc"), col("o.span_start").as("own_start"))
    val excisable = spf.join(owner, Seq("fp"))
      .filter(!(col("doc_id") === col("own_doc") && col("span_start") === col("own_start")))
      .select(col("doc_id").as("sp_doc"), col("span_start"), col("span_end"))
    exciseBySpans(docs, excisable)
  }

  /** Shared excision tail: drop every token covered by a span row of `sp`
    * (`sp_doc`/`span_start`/`span_end`), reassemble each document's
    * surviving tokens in order. Returns (doc_id, n_kept, txt). */
  private def exciseBySpans(docs: DataFrame, sp: DataFrame): DataFrame = {
    val toks = SkewUtils.spreadCompute(
      docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"), posexplode(graft.operators.TextAnalysis.wordsExpr).as(Seq("pos", "tok")))
    val kept = toks.join(sp,
      col("doc_id") === col("sp_doc") &&
        col("pos") >= col("span_start") && col("pos") <= col("span_end"),
      "left_anti")
    docs.select(col("doc_id"))
      .join(
        kept.groupBy(col("doc_id"))
          .agg(sort_array(collect_list(struct(col("pos"), col("tok")))).as("ordered")),
        Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(size(col("ordered")), lit(0)).cast("long").as("n_kept"),
        coalesce(array_join(expr("transform(ordered, x -> x.tok)"), " "), lit("")).as("txt"))
  }

  /** (doc_id, n_kept, txt) → the oracle-gated (doc_id, n_kept, clean_md5). */
  private def fingerprinted(kept: DataFrame): DataFrame =
    kept.select(col("doc_id"), col("n_kept"), md5(col("txt")).as("clean_md5"))

  /** Per-document duplication profile: how much of each document sits
    * inside a cross-document duplicate span — the "what fraction of my
    * corpus is boilerplate" rollup a dedup pipeline reports. Token count
    * from the same split keeps the ratio internally consistent. */
  def docDupProfile(docs: DataFrame, n: Int = 5, minDocs: Int = 2): DataFrame = {
    val perDoc = spans(docs, n, minDocs)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start") + lit(1)).as("dup_tokens"),
        max(col("span_grams")).as("longest_span_grams"))
    docs
      .select(col("doc_id"),
        size(graft.operators.TextAnalysis.wordsExpr).as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("longest_span_grams"), lit(0L)).as("longest_span_grams"),
        (coalesce(col("dup_tokens"), lit(0L)).cast("double") / col("n_tokens").cast("double"))
          .as("dup_ratio"))
  }
}
