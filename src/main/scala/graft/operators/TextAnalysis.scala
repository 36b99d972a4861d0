package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for an LLM-training-data pipeline (north-star
  * extensions, SURVEY.md §7.2 step 8): quality scoring, language ID,
  * token counting, document fingerprinting — over the `documents` table.
  *
  * Everything is built from codegen'd built-ins (split / higher-order array
  * functions / regexp_count) — no UDFs — so the whole pipeline stays inside
  * WholeStageCodegen and scales linearly with one parquet scan, no shuffle
  * (all operators are per-row; fingerprint needs no explode thanks to
  * higher-order `transform` + `array_min`).
  */
object TextAnalysis {

  /** Whitespace word split on lowercased, trimmed text — the shared
    * tokenization for all text + dedup operators (DuckDB mirror:
    * `regexp_split_to_array(trim(lower(text)), '\s+')`). */
  val wordsExpr: Column = expr("split(lower(trim(text)), '\\\\s+')")

  /** Per-document stats + a composite quality score (length, punctuation
    * and stopword ratios — the usual cheap quality heuristics). All ratio
    * arithmetic is written in the same textual order as the oracle SQL so
    * doubles come out bit-identical. */
  def textStats(docs: DataFrame): DataFrame =
    // Narrow-scan spread before the per-row split/regexp work (guide
    // §2.5): a single-file corpus scans as one task and this stage was
    // running single-threaded at local[32]; no-op on wide inputs.
    SkewUtils.spreadCompute(
      docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"), col("text"), wordsExpr.as("w"))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(col("w")).cast("long").as("n_words"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct_words"),
        regexp_count(col("text"), lit("[.,!?;:]")).cast("long").as("punct_cnt"),
        size(expr(
          "filter(w, x -> x IN ('the','a','of','and','to','in','is'))")).cast("long").as("stop_cnt"))
      .withColumn("avg_word_len",
        (col("n_chars") - col("n_words") + lit(1)) / col("n_words"))
      .withColumn("stop_ratio", col("stop_cnt") / col("n_words"))
      // Guarded: an EMPTY text has n_chars = 0, and under ANSI mode (Spark 4
      // default) the bare division throws DIVIDE_BY_ZERO instead of nulling.
      // NULL here (→ NULL quality) matches DuckDB's x/0 → NULL, so both
      // engines agree on degenerate docs; adaptiveQualityFilter excludes
      // NULL-quality rows from its order statistics like the percentile
      // aggregate it replaced. n_words cannot be 0 (split('') = ['']), so
      // stop_ratio/avg_word_len need no guard.
      .withColumn("punct_ratio",
        when(col("n_chars") > 0, col("punct_cnt") / col("n_chars")))
      .withColumn("quality",
        col("stop_ratio") * lit(0.5)
          + least(lit(1.0), col("n_words") / lit(100.0)) * lit(0.3)
          + (lit(1.0) - col("punct_ratio")) * lit(0.2))
      .orderBy("doc_id")

  private val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "nicht"),
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "que", "y", "los"),
    "fr" -> Seq("le", "et", "les", "des", "une"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo"))

  /** N-gram-free language-ID heuristic: score = stopword hits per language
    * over the shared word split; prediction = first language (fixed
    * precedence de,en,es,fr,zh) whose score ties the maximum. Deterministic
    * by construction — same CASE precedence in the oracle SQL. */
  def langId(docs: DataFrame): DataFrame = {
    val scored = stopwords.foldLeft(
      SkewUtils.spreadCompute(
        docs.select(col("doc_id"), col("lang"), col("text")), col("doc_id"))
        .select(col("doc_id"), col("lang"), wordsExpr.as("w"))) {
      case (df, (code, words)) =>
        val inList = words.map(w => s"'$w'").mkString(", ")
        df.withColumn(s"s_$code",
          size(expr(s"filter(w, x -> x IN ($inList))")).cast("long"))
    }
    val langs = stopwords.map(_._1)
    val pred = stopwords.indices.init.foldRight(lit(langs.last): Column) { (i, els) =>
      val c = langs(i)
      val beatsRest = langs.drop(i + 1)
        .map(o => col(s"s_$c") >= col(s"s_$o"))
        .reduce(_ && _)
      when(beatsRest, lit(c)).otherwise(els)
    }
    scored
      .withColumn("pred_lang", pred)
      .withColumn("is_match", (col("pred_lang") === col("lang")).cast("boolean"))
      .select(Seq("doc_id", "lang").map(col) ++ langs.map(c => col(s"s_$c")) ++
        Seq(col("pred_lang"), col("is_match")): _*)
      .orderBy("doc_id")
  }

  /** The CASE-precedence oracle fragment matching [[langId]]. */
  def langIdOracleSql: String = {
    val langs = stopwords.map(_._1)
    val scoreCols = stopwords.map { case (code, words) =>
      val inList = words.map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(w, x -> x IN ($inList))) AS BIGINT) AS s_$code"
    }.mkString(",\n  ")
    val caseArms = langs.init.zipWithIndex.map { case (c, i) =>
      val cond = langs.drop(i + 1).map(o => s"s_$c >= s_$o").mkString(" AND ")
      s"WHEN $cond THEN '$c'"
    }.mkString(" ")
    s"""WITH w AS (SELECT doc_id, lang, regexp_split_to_array(trim(lower(text)), '\\s+') AS w FROM documents),
       | s AS (SELECT doc_id, lang,
       |  $scoreCols
       | FROM w),
       | p AS (SELECT *, CASE $caseArms ELSE '${langs.last}' END AS pred_lang FROM s)
       |SELECT doc_id, lang, ${langs.map(c => s"s_$c").mkString(", ")}, pred_lang,
       |       pred_lang = lang AS is_match
       |FROM p ORDER BY doc_id""".stripMargin
  }

  /** Token counting: whitespace tokens plus a BPE-ish regex segmentation
    * (alpha runs | digit runs | single non-space symbol). */
  def tokenCount(docs: DataFrame): DataFrame =
    SkewUtils.spreadCompute(
      docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(
      col("doc_id"),
      size(wordsExpr).cast("long").as("tokens_ws"),
      regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")).cast("long").as("tokens_bpe"),
      length(col("text")).cast("long").as("n_chars"))
      .orderBy("doc_id")

  /** Document fingerprint, winnowing-style: the lexicographic minimum of
    * md5 over all word 5-gram shingles — a stable content fingerprint that
    * survives local edits elsewhere in the document. Pure per-row
    * higher-order expression (no explode, no shuffle). */
  def fingerprint(docs: DataFrame): DataFrame =
    // Narrow-scan spread: one md5 per word-5-gram per row — the heaviest
    // per-row expression in the text family — was single-task otherwise.
    SkewUtils.spreadCompute(
      docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"), wordsExpr.as("w"))
      .filter(size(col("w")) >= 5)
      .select(
        col("doc_id"),
        expr("array_min(transform(sequence(0, size(w)-5), i -> md5(concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]))))").as("fp"),
        (size(col("w")) - lit(4)).cast("long").as("n_shingles"))
      .orderBy("doc_id")

  /** Statistical-LM quality scoring — the CCNet/Gopher perplexity filter:
    * train an add-k-smoothed word-BIGRAM language model on a reference
    * corpus, score every candidate document by average negative
    * log-likelihood per bigram (perplexity's log; same ranking, no
    * engine-sensitive `exp`). High avg_nll = unlike the reference =
    * boilerplate/gibberish/wrong-register — the standard pretraining
    * quality gate after the cheap heuristic ratios ([[textStats]]).
    *
    * Determinism (the BM25 rule, [[Search.bm25TopK]]): `ln` is the ONLY
    * transcendental and is rounded to 6 dp immediately; each bigram's
    * log-prob then quantizes to an exact BIGINT (×1e6), so the per-doc
    * SUM is integer arithmetic — order-independent under any partitioning
    * — and the one final division is a fixed-shape IEEE expression both
    * engines evaluate identically.
    *
    * Model: p(w2|w1) = (c(w1,w2) + k) / (c1(w1) + k·V), where c1 counts
    * w1 as a bigram HEAD (so Σ_w2 c(w1,w2) = c1 exactly), V = |train
    * vocabulary|, and unseen words/bigrams fall back through the same
    * formula (c = 0) — no special OOV branch. Bigram keys are the two
    * tokens joined by one space (tokens cannot contain whitespace).
    *
    * Scale shape: one map-side explode per side; counts are
    * map-side-combined aggregates; scoring joins shuffle on the bigram
    * string and the head word (AQE-skew-splittable equi-joins — stopword
    * heads are the expected hot keys); V is a 1-row broadcast. Score-side
    * docs with < 2 tokens can't be scored and surface with n_bigrams = 0
    * and NULL scores — flagged, never dropped. */
  def lmPerplexity(train: DataFrame, score: DataFrame, k: Double = 0.5): DataFrame = {
    // both count aggregates read ONE tokenization of the reference corpus
    val tb = CacheRegistry.persistBounded(lmBigrams(train))
    lmScoreWithModel(
      tb.groupBy("bg").agg(count(lit(1)).as("c12")),
      tb.groupBy("w1").agg(count(lit(1)).as("c1")),
      SkewUtils.spreadCompute(
        train.select(col("doc_id"), col("text")), col("doc_id"))
        .select(explode(wordsExpr).as("wd")).agg(countDistinct(col("wd")).as("v")),
      score, k)
  }

  /** The (doc_id, bg, w1) bigram stream shared by training and scoring —
    * and by [[LmStore]]'s materialized model tables. */
  private[operators] def lmBigrams(docs: DataFrame): DataFrame =
    SkewUtils.spreadCompute(
      docs.select(col("doc_id"), col("text")), col("doc_id"))
    .select(col("doc_id"), wordsExpr.as("w"))
    .filter(size(col("w")) >= 2)
    .select(col("doc_id"), explode(expr(
      "transform(sequence(0, size(w)-2), i -> struct(concat_ws(' ', w[i], w[i+1]) AS bg, w[i] AS w1))")).as("b"))
    .select(col("doc_id"), col("b.bg").as("bg"), col("b.w1").as("w1"))

  /** PER-LANGUAGE edition of [[lmPerplexity]] — the setup CCNet actually
    * runs: one model per language (bigram distributions don't transfer
    * across languages, so a single pooled model mis-scores every minority
    * language), each candidate scored against ITS OWN language's model.
    * All model keys gain `lang`; V is per-language (broadcast — one row
    * per language). A candidate whose language has no reference model is
    * UNSCORABLE and surfaces with NULL scores — flagged, never dropped,
    * and never silently scored against the wrong language. */
  def lmPerplexityByLang(train: DataFrame, score: DataFrame, k: Double = 0.5): DataFrame = {
    def bigramsL(docs: DataFrame): DataFrame =
      SkewUtils.spreadCompute(
        docs.select(col("doc_id"), col("lang"), col("text")), col("doc_id"))
      .select(col("doc_id"), col("lang"), wordsExpr.as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), col("lang"), explode(expr(
        "transform(sequence(0, size(w)-2), i -> struct(concat_ws(' ', w[i], w[i+1]) AS bg, w[i] AS w1))")).as("b"))
      .select(col("doc_id"), col("lang"), col("b.bg").as("bg"), col("b.w1").as("w1"))
    val tb = CacheRegistry.persistBounded(bigramsL(train))
    val c12 = tb.groupBy("lang", "bg").agg(count(lit(1)).as("c12"))
    val c1 = tb.groupBy("lang", "w1").agg(count(lit(1)).as("c1"))
    val vocab = SkewUtils.spreadCompute(
      train.select(col("doc_id"), col("lang"), col("text")), col("doc_id"))
      .select(col("lang"), explode(wordsExpr).as("wd"))
      .groupBy("lang").agg(countDistinct(col("wd")).as("v"))
    val scored = bigramsL(score)
      .join(c12, Seq("lang", "bg"), "left_outer")
      .join(c1, Seq("lang", "w1"), "left_outer")
      .join(broadcast(vocab), Seq("lang"), "left_outer")
      // v NULL (no model for this language) nulls every lp_q of the doc,
      // so its sum — and therefore its scores — come out NULL.
      .withColumn("lp_q", round(
        round(log(
          (coalesce(col("c12"), lit(0L)).cast("double") + lit(k)) /
            (coalesce(col("c1"), lit(0L)).cast("double") + lit(k) * col("v").cast("double"))), 6)
          * lit(1e6)).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), (-sum(col("lp_q"))).as("nll_q"))
    score.select(col("doc_id"), col("lang")).distinct()
      .join(scored, Seq("doc_id"), "left_outer")
      .select(
        col("doc_id"), col("lang"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("nll_q"),
        round(col("nll_q").cast("double") / lit(1e6) / col("n_bigrams").cast("double"), 6)
          .as("avg_nll"))
      .orderBy("doc_id")
  }

  /** Scoring tail over a pre-built model — `c12` = (bg, c12) bigram
    * counts, `c1` = (w1, c1) head counts, `vocab` = 1-row (v) — shared by
    * the self-contained [[lmPerplexity]] and the stored-model path
    * ([[LmStore]]); identical arithmetic either way, so both gate on the
    * same oracle. */
  def lmScoreWithModel(c12: DataFrame, c1: DataFrame, vocab: DataFrame,
                       score: DataFrame, k: Double = 0.5): DataFrame = {
    val scored = lmBigrams(score)
      .join(c12, Seq("bg"), "left_outer")
      .join(c1, Seq("w1"), "left_outer")
      .crossJoin(broadcast(vocab))
      // ln rounded at once; ×1e6 quantized to exact integers (BM25 rule)
      .withColumn("lp_q", round(
        round(log(
          (coalesce(col("c12"), lit(0L)).cast("double") + lit(k)) /
            (coalesce(col("c1"), lit(0L)).cast("double") + lit(k) * col("v").cast("double"))), 6)
          * lit(1e6)).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), (-sum(col("lp_q"))).as("nll_q"))
    score.select(col("doc_id")).distinct()
      .join(scored, Seq("doc_id"), "left_outer")
      .select(
        col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("nll_q"),
        round(col("nll_q").cast("double") / lit(1e6) / col("n_bigrams").cast("double"), 6)
          .as("avg_nll"))
      .orderBy("doc_id")
  }
}
