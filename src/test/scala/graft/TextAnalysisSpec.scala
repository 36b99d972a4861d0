package graft

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("text stats count words, distinct words, punctuation and stopwords") {
    val docs = Seq((1L, "the cat, the hat! of rain.")).toDF("doc_id", "text")
    val r = TextAnalysis.textStats(docs).collect().head
    assert(r.getAs[Long]("n_words") === 6L)
    assert(r.getAs[Long]("n_distinct_words") === 5L) // "the" twice
    assert(r.getAs[Long]("punct_cnt") === 3L)
    assert(r.getAs[Long]("stop_cnt") === 3L) // the, the, of
  }

  test("language id picks the language with most stopword hits") {
    val docs = Seq(
      (1L, "der hund und die katze nicht hier", "de"),
      (2L, "the dog and the cat is here", "en"),
      (3L, "el perro y la gata que corre", "es")
    ).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.langId(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("pred_lang")).toMap
    assert(r === Map(1L -> "de", 2L -> "en", 3L -> "es"))
  }

  test("token counts: whitespace vs BPE-ish segmentation") {
    val docs = Seq((1L, "abc de2f, x9")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCount(docs).collect().head
    assert(r.getAs[Long]("tokens_ws") === 3L)
    // abc | de | 2 | f | , | x | 9
    assert(r.getAs[Long]("tokens_bpe") === 7L)
  }

  test("fingerprint is stable under duplication and changes with content") {
    val docs = Seq(
      (1L, "one two three four five six seven"),
      (2L, "one two three four five six seven"),
      (3L, "one two three four five six DIFFERENT")
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fp")).toMap
    assert(fp(1L) === fp(2L))
    assert(fp.values.toSet.size === 2)
  }

  test("LM perplexity: reference-like text scores lower avg_nll than gibberish; short docs flagged") {
    val train = Seq(
      (0L, "the cat sat on the mat"),
      (2L, "the dog sat on the mat"),
      (4L, "the cat ran to the dog")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "the cat sat on the mat"),     // seen bigrams throughout
      (3L, "zyx qwv plk mnb vcx"),        // all-OOV gibberish
      (5L, "word")).toDF("doc_id", "text") // one token: unscorable
    val out = TextAnalysis.lmPerplexity(train, score).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet === Set(1L, 3L, 5L), "every score-side doc surfaces")
    assert(out(1L).getAs[Double]("avg_nll") < out(3L).getAs[Double]("avg_nll"),
      "in-distribution text must score better (lower NLL) than OOV gibberish")
    assert(out(5L).getAs[Long]("n_bigrams") === 0L)
    assert(out(5L).isNullAt(out(5L).fieldIndex("nll_q")) &&
      out(5L).isNullAt(out(5L).fieldIndex("avg_nll")),
      "unscorable docs are flagged with NULLs, never dropped")
    // integer-quantized log-probs: the sum is partitioning-independent
    val p1 = TextAnalysis.lmPerplexity(train.repartition(7), score.repartition(5))
      .collect().map(_.toSeq).toSeq
    assert(p1 === TextAnalysis.lmPerplexity(train, score).collect().map(_.toSeq).toSeq)
  }

  test("LM perplexity model identities: head counts sum to c1; repeated phrase raises its probability") {
    // doc with a repeated bigram: "a b a b" -> bigrams (a b),(b a),(a b)
    val train = Seq((0L, "a b a b")).toDF("doc_id", "text")
    val score = Seq((1L, "a b"), (3L, "b a")).toDF("doc_id", "text")
    val out = TextAnalysis.lmPerplexity(train, score).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_nll")).toMap
    // p(b|a) = (2+0.5)/(2+0.5*2) = 2.5/3 beats p(a|b) = (1+0.5)/(1+0.5*2) = 1.5/2
    assert(out(1L) < out(3L))
    val expected = -BigDecimal(math.log(2.5 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(1L) - expected) < 1e-9,
      s"score must equal the hand-computed smoothed bigram log-prob: ${out(1L)} vs $expected")
  }

  test("per-language LM: models never cross languages; modelless languages score NULL") {
    val train = Seq(
      (0L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog sat on the mat"),
      (4L, "de", "die katze sitzt auf der matte")).toDF("doc_id", "lang", "text")
    val score = Seq(
      (1L, "en", "the cat sat"),
      (3L, "de", "die katze sitzt"),
      (5L, "fr", "le chat est assis"), // no French model in the reference
      (7L, "en", "die katze sitzt")) // German text labeled en: all-OOV for the en model
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.lmPerplexityByLang(train, score).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet === Set(1L, 3L, 5L, 7L))
    // modelless language: flagged NULL, not silently scored against another
    assert(out(5L).isNullAt(out(5L).fieldIndex("avg_nll")),
      "a language with no reference model must be unscorable")
    // in-language text beats cross-language text under the SAME model
    assert(out(1L).getAs[Double]("avg_nll") < out(7L).getAs[Double]("avg_nll"),
      "the en model must prefer English text over German text labeled en")
    // each language scored by its own model: both in-language docs score well
    assert(out(3L).getAs[Double]("avg_nll") < out(7L).getAs[Double]("avg_nll"))
  }
}
