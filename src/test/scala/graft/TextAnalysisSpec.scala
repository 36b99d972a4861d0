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
}
