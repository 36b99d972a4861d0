package graft

import graft.operators.DataHygiene

class DataHygieneSpec extends SparkSpec {
  import spark.implicits._

  test("PII redaction replaces emails and phones, counts per type") {
    val docs = Seq(
      (1L, "contact alice@example.com or +1 (555) 123-4567 today"),
      (2L, "two mails a@b.io and c@d.org"),
      (3L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val out = DataHygiene.redactPii(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L)._1 === "contact <EMAIL> or <PHONE> today")
    assert(out(1L)._2 === 1L && out(1L)._3 === 1L)
    assert(out(2L)._1 === "two mails <EMAIL> and <EMAIL>")
    assert(out(2L)._2 === 2L && out(2L)._3 === 0L)
    assert(out(3L) === ("nothing sensitive here", 0L, 0L))
  }

  test("adaptive quality gate ignores NULL-quality docs like the percentile it replaced") {
    // An empty-text doc gets quality = NULL (punct_ratio divides by
    // n_chars = 0). The exact `percentile` aggregate ignored NULL inputs;
    // the order-statistic selection must too — an unfiltered rank would
    // inflate n, shift the bracket, and (if a bracket rank landed on a
    // NULL row) null the threshold and empty the output.
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and runs far away today",
      "a plain sentence of seven common words here",
      "short words only in this one line of text",
      "is this a good document with the usual stopwords in it",
      "to be or not to be is the question of the day")
    val docs = (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
      (99L, "")).toDF("doc_id", "text")
    val clean = docs.filter($"doc_id" =!= 99L)
    val withNull = DataHygiene.adaptiveQualityFilter(docs).collect().toSeq
    val without = DataHygiene.adaptiveQualityFilter(clean).collect().toSeq
    assert(withNull === without,
      "a NULL-quality doc must not change the threshold or the output")
    assert(withNull.nonEmpty)
  }

  test("repetition score: repeated 3-grams raise the ratio, short docs are 0") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),     // all 3-grams identical
      (2L, "one two three four five six"),       // all distinct
      (3L, "a b")                                // too short for a 3-gram
    ).toDF("doc_id", "text")
    val out = DataHygiene.repetitionScore(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L)._1 === 4L && out(1L)._2 === 1L && out(1L)._3 === 0.75)
    assert(out(2L)._3 === 0.0)
    assert(out(3L) === (0L, 0L, 0.0))
  }

  test("contamination flags the eval doc that copies train text, not the clean one") {
    val train = Seq((0L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val eval = Seq(
      (1L, "intro words then the quick brown fox jumps over something"),
      (2L, "completely unrelated text with no overlap whatsoever at all")
    ).toDF("doc_id", "text")
    val out = DataHygiene.contamination(train, eval).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(out.map(_._1).toSeq === Seq(1L))
    val (_, nCommon, frac) = out.head
    assert(nCommon >= 3L)
    assert(frac > 0.0 && frac < 1.0)
  }

  test("cleanCorpus: each flag fires on its planted document, the clean one is kept") {
    // One doc per failure mode + one keeper; thresholds passed explicitly
    // so the assertions do not depend on fixture statistics.
    val corpus = Seq(
      (0L, "the cat and the dog of the house is happy and the bird is singing near the tree and all is well"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta completely distinct vocabulary right here"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta completely distinct vocabulary right here"), // dup of 2
      (6L, "!!! ??? ;;; ,,, ... ::: !!!"),                                                            // punct-only
      (8L, "spam spam spam spam spam spam spam spam spam spam"),                                     // repeated 3-grams
      (10L, "the secret eval question about quantum gravity and its hidden answer keys")             // copies eval
    ).toDF("doc_id", "text")
    val evalDocs = Seq(
      (1L, "the secret eval question about quantum gravity and its hidden answer keys")
    ).toDF("doc_id", "text")
    val out = DataHygiene.cleanCorpus(corpus, evalDocs,
        qualityMin = 0.3, repMax = 0.3, minCommon = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
      .toMap
    assert(out(0L) === ((false, false, false, false, true)), "clean doc is kept")
    assert(!out(2L)._1 && out(4L)._1, "keeper survives, duplicate flagged")
    assert(out(6L)._2, "punctuation-only doc is low quality")
    assert(out(8L)._3, "repeated-phrase doc is repetitive")
    assert(out(10L)._4, "eval copy is contaminated")
    assert(Seq(4L, 6L, 8L, 10L).forall(!out(_)._5), "every flagged doc is dropped")
  }
}
