package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators for LLM training data: PII redaction,
  * within-document repetition scoring (the Gopher-rule family), and
  * train/eval contamination detection. All per-row built-ins or
  * candidate-bounded joins — no UDFs, no unbounded shuffles.
  */
object DataHygiene {

  /** Regexes shared with the DuckDB oracle — RE2/Java-compatible subset
    * only (no lookbehind, no possessive quantifiers). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  /** PII redaction: emails/phones replaced with typed placeholders, with
    * per-document redaction counts (the audit trail a scrubbing pass
    * needs). Pure per-row codegen'd string work — no shuffle. */
  def redactPii(docs: DataFrame): DataFrame =
    // Narrow-scan spread: four regexp passes per row are CPU-dense and
    // otherwise run on the single scan task of a one-file corpus.
    SkewUtils.spreadCompute(
      docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(
      col("doc_id"),
      regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")
        .as("clean_text"),
      regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(PhoneRe)).cast("long").as("n_phones"))
      .orderBy("doc_id")

  /** Redaction summary (oracle-friendly shape: the counts and the cleaned
    * text's stability are what matters, not megabytes of text): per-doc
    * counts + md5 of the cleaned text. */
  def redactionAudit(docs: DataFrame): DataFrame =
    redactPii(docs).select(
      col("doc_id"),
      col("n_emails"), col("n_phones"),
      md5(col("clean_text")).as("clean_md5"))
      .orderBy("doc_id")

  /** Within-document repetition (Gopher-style quality rule): fraction of
    * word 3-gram occurrences that are repeats of an earlier 3-gram in the
    * same document. High values mark boilerplate/keyword-stuffed docs a
    * quality filter drops. Per-row array expressions only. */
  def repetitionScore(docs: DataFrame, k: Int = 3): DataFrame = {
    val gram = (0 until k).map(j => s"w[i+$j]").mkString(", ")
    // Narrow-scan spread before the per-row 3-gram transform +
    // array_distinct (guide §2.5): otherwise single-task on a
    // single-file corpus scan.
    SkewUtils.spreadCompute(
      docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"), TextAnalysis.wordsExpr.as("w"))
      .withColumn("grams",
        expr(s"CASE WHEN size(w) >= $k THEN transform(sequence(0, size(w)-$k), i -> concat_ws(' ', $gram)) ELSE array() END"))
      .select(
        col("doc_id"),
        size(col("grams")).cast("long").as("n_grams"),
        size(array_distinct(col("grams"))).cast("long").as("n_distinct"))
      .withColumn("rep_ratio",
        when(col("n_grams") > 0,
          round(lit(1.0) - col("n_distinct").cast("double") / col("n_grams"), 6))
          .otherwise(lit(0.0)))
      .orderBy("doc_id")
  }

  /** Corpus-ADAPTIVE quality gate: keep documents at or above the `pct`
    * quantile of the corpus's own quality distribution — how real
    * pipelines set thresholds (a fixed constant goes stale as the corpus
    * mix shifts). Exact linear-interpolated percentile (deterministic —
    * an order statistic, no float summation), broadcast as a 1-row bound
    * and compared against the unrounded scores, so the cut is
    * reproducible across engines. Output keeps the applied threshold as
    * an audit column.
    *
    * The quantile is computed by DISTRIBUTED ORDER-STATISTIC SELECTION,
    * not Spark's exact `percentile` aggregate: that aggregate merges every
    * distinct quality value into ONE final aggregation buffer, and quality
    * scores are near-all-distinct doubles — O(|corpus|) on a single task
    * at 100 TB. Here the corpus is range-partition ranked on (quality,
    * doc_id) via [[RankUtils.globalRowNumber]] (parallelism = partition
    * count, no global buffer), the two bracketing order statistics at
    * ranks ⌊h⌋+1 / ⌈h⌉+1 for h = pct·(n−1) are picked by rank, and the
    * threshold linearly interpolates between them with EXACTLY the
    * arithmetic of Spark's `Percentile.getPercentile` — (⌈h⌉−h)·v_lo +
    * (h−⌊h⌋)·v_hi, with the integral-position and tied-value cases
    * returning v_lo — so the result is bit-identical to the aggregate it
    * replaces (and to DuckDB's quantile_cont, proven by the hash gate). */
  def adaptiveQualityFilter(docs: DataFrame, pct: Double = 0.25): DataFrame = {
    // NULL qualities (empty/NULL text makes punct_ratio NULL) are excluded
    // BEFORE ranking: the exact percentile aggregate this replaces ignored
    // NULL inputs, and an unfiltered rank would count them into n (shifted
    // bracket ranks; a NULL bracketing value would null the threshold and
    // empty the output). The final >= filter already excluded them.
    val stats = TextAnalysis.textStats(docs)
      .select(col("doc_id"), col("quality"))
      .filter(col("quality").isNotNull)
    // One computation of the per-row stats feeds the n-count, the bracket
    // probe, and the final filter (lazy persist — the measured pattern
    // from the similarity family's shared base), registered in the bounded
    // CacheRegistry so repeated calls don't accumulate cache entries.
    val ranked = CacheRegistry.persistBounded(
      RankUtils.globalRowNumber(stats, Seq(col("quality"), col("doc_id")), "__rk"))
    // n = max rank (1-row frame); h, ⌊h⌋, ⌈h⌉ derived once. Spark's floor/
    // ceil on double return LONG, matching Percentile's .floor.toLong.
    val bounds = broadcast(
      ranked.agg(max(col("__rk")).as("__n"))
        .select((lit(pct) * (col("__n") - lit(1L)).cast("double")).as("__h"))
        .select(col("__h"), floor(col("__h")).as("__fl"), ceil(col("__h")).as("__ce")))
    // The ≤2 bracketing order statistics, picked by rank — a broadcast-
    // bounds filter over the ranked corpus, never a global sort-to-one.
    val bracket = ranked.crossJoin(bounds)
      .filter(col("__rk") === col("__fl") + lit(1L) || col("__rk") === col("__ce") + lit(1L))
    val thr = broadcast(
      bracket.groupBy("__h", "__fl", "__ce")
        .agg(min(col("quality")).as("__vlo"), max(col("quality")).as("__vhi"))
        .select(
          when(col("__fl") === col("__ce") || col("__vlo") === col("__vhi"), col("__vlo"))
            .otherwise((col("__ce") - col("__h")) * col("__vlo")
              + (col("__h") - col("__fl")) * col("__vhi"))
            .as("q_thr")))
    ranked.crossJoin(thr)
      .filter(col("quality") >= col("q_thr"))
      .select(col("doc_id"),
        round(col("quality"), 6).as("quality"),
        round(col("q_thr"), 6).as("q_thr"))
      .orderBy("doc_id")
  }

  /** End-to-end corpus cleaning — the composition a training-data pipeline
    * actually runs before a training job, as ONE declarative query: flag
    * every corpus document as near-duplicate (MinHash clusters — keepers
    * stay), low-quality (composite score), repetitive (Gopher dup-3-gram
    * rule), or eval-contaminated (shingle overlap with `evalDocs`), and
    * keep the survivors. Each flag reuses the corresponding standalone
    * operator unchanged, so this is the integration showcase: everything
    * joins on doc_id (hash joins, AQE-planned).
    * Output: (doc_id, is_dup, low_quality, repetitive, contaminated, kept).
    *
    * Known cost, accepted on MEASUREMENT: the corpus is tokenized once per
    * flag family (minhash shingles, contamination shingles, quality/
    * repetition words). An in-session persist of the shingle subtree was
    * A/B-tested at sf0.1 and made the dedup branch ~1 s slower (racing
    * columnar cache builds inside the components checkpoint job — see
    * Dedup.sharedShingles); contamination's eval side, where the reuse is
    * real, does persist. At 100 TB the shingle table becomes a MAINTAINED
    * artifact (like the normalized embedding base) that both the dedup and
    * contamination branches read — the operators' internal shapes are
    * unchanged by that seam, which is why it is not pre-built here. */
  def cleanCorpus(corpus: DataFrame, evalDocs: DataFrame,
                  qualityMin: Double = 0.38, repMax: Double = 0.05,
                  dedupThreshold: Double = 0.5, minCommon: Long = 20): DataFrame = {
    val dups = Dedup.dedupClusters(corpus, dedupThreshold)
      .select(col("doc_id"), col("is_dup"))
    // contamination's first argument is the REFERENCE shingle set: here
    // the eval set, so corpus docs carrying eval content get flagged.
    val cont = contamination(evalDocs, corpus, minCommon)
      .select(col("doc_id")).withColumn("__cont", lit(true))
    cleanTail(corpus, dups, cont, qualityMin, repMax)
  }

  /** [[cleanCorpus]] with the dedup and contamination branches reading the
    * maintained shingle table ([[ShingleStore]]) instead of re-tokenizing
    * the corpus per flag family — the decomposition the composition's own
    * scaladoc has been naming as the 100 TB shape. `corpusSh` / `evalSh`
    * are the (doc_id, sh) slices for the corpus and eval sets; quality and
    * repetition stay text-derived (they tokenize WORDS, not shingles).
    * Identical output to [[cleanCorpus]] by construction — the stored
    * query variant shares its oracle. */
  def cleanCorpusFromShingles(corpus: DataFrame, corpusSh: DataFrame,
                              evalSh: DataFrame,
                              qualityMin: Double = 0.38, repMax: Double = 0.05,
                              dedupThreshold: Double = 0.5, minCommon: Long = 20): DataFrame = {
    val dups = Dedup.dedupClustersFromShingles(corpus, corpusSh, dedupThreshold)
      .select(col("doc_id"), col("is_dup"))
    val cont = contaminationFromShingles(evalSh, corpusSh, minCommon)
      .select(col("doc_id")).withColumn("__cont", lit(true))
    cleanTail(corpus, dups, cont, qualityMin, repMax)
  }

  /** The flag-assembly tail shared by both corpus-clean entry points:
    * quality + repetition flags from text, one doc_id-keyed join per
    * flag (hash joins, AQE-planned). */
  private def cleanTail(corpus: DataFrame, dups: DataFrame, cont: DataFrame,
                        qualityMin: Double, repMax: Double): DataFrame = {
    val quality = TextAnalysis.textStats(corpus).select(col("doc_id"), col("quality"))
    val rep = repetitionScore(corpus).select(col("doc_id"), col("rep_ratio"))
    corpus.select(col("doc_id"))
      .join(dups, Seq("doc_id"))
      .join(quality, Seq("doc_id"))
      .join(rep, Seq("doc_id"))
      .join(cont, Seq("doc_id"), "left_outer")
      .select(
        col("doc_id"),
        col("is_dup"),
        (col("quality") < qualityMin).as("low_quality"),
        (col("rep_ratio") > repMax).as("repetitive"),
        coalesce(col("__cont"), lit(false)).as("contaminated"))
      .withColumn("kept",
        !col("is_dup") && !col("low_quality") && !col("repetitive") && !col("contaminated"))
      .orderBy("doc_id")
  }

  /** Train/eval contamination: eval documents sharing ≥ `minCommon`
    * word-k-gram shingles with any train document, with the contaminated
    * fraction of the eval doc's shingles. The decontamination primitive:
    * run before training, drop or flag the hits. Join is shingle-keyed
    * (candidate-bounded like the dedup family), never doc×doc. */
  def contamination(train: DataFrame, eval: DataFrame,
                    minCommon: Long = 3): DataFrame =
    // eval shingles feed BOTH the per-doc sizes and the overlap join —
    // the lazy persist computes the tokenization once (measured 1.36→0.75 s
    // at sf0.1). The train side is read once; no persist.
    contaminationFromShingles(
      Dedup.shingles(train), Dedup.sharedShingles(eval), minCommon)

  /** [[contamination]] over pre-tokenized (doc_id, sh) rows — the entry
    * point for the maintained [[ShingleStore]] artifact (parquet scans
    * replace both tokenizations; a stored-table read is cheap enough that
    * the eval side needs no persist). */
  def contaminationFromShingles(trainSh: DataFrame, evalSh: DataFrame,
                                minCommon: Long = 3): DataFrame = {
    val tsh = trainSh.select(col("sh")).distinct()
    val esh = evalSh
    val sizes = esh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    esh.join(tsh, Seq("sh")) // semi-shaped: only shingles seen in train
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_common"))
      .join(sizes, Seq("doc_id"))
      .filter(col("n_common") >= minCommon)
      .select(col("doc_id"),
        col("n_common"),
        col("n_sh"),
        round(col("n_common").cast("double") / col("n_sh"), 6).as("contaminated_frac"))
      .orderBy("doc_id")
  }
}
