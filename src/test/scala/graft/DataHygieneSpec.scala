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
}
