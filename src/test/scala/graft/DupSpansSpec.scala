package graft

import graft.operators.DupSpans
import org.apache.spark.sql.functions._

/** Span-granularity dedup: planted shared substrings must come back as
  * maximal runs with exact token coordinates, non-shared text must not,
  * and the plan must stay shuffle-by-key (no per-hash window). */
class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  // 12 shared tokens -> 8 shared 5-grams at positions 3..10 in doc 1 (after
  // a 3-token prefix) and 0..7 in doc 2; doc 3 shares nothing.
  private val boiler = "the quick brown fox jumps over the lazy dog again and again"
  private val docs = Seq(
    (1L, s"alpha beta gamma $boiler tail one"),
    (2L, s"$boiler different ending here"),
    (3L, "entirely unrelated content with no duplication at all whatsoever ok")
  ).toDF("doc_id", "text")

  test("planted cross-document span comes back maximal, with exact token coordinates") {
    val spans = DupSpans.spans(docs).orderBy("doc_id", "span_start").collect()
    assert(spans.map(_.getLong(0)).toSeq === Seq(1L, 2L), "docs 1 and 2 only")
    val d1 = spans(0)
    // doc 1: grams 3..10 shared -> tokens 3..14, 8 grams
    assert((d1.getLong(1), d1.getLong(2), d1.getLong(3)) === ((3L, 14L, 8L)))
    val d2 = spans(1)
    // doc 2: grams 0..7 shared -> tokens 0..11, 8 grams
    assert((d2.getLong(1), d2.getLong(2), d2.getLong(3)) === ((0L, 11L, 8L)))
  }

  test("two disjoint shared runs in one document stay two spans (no bridging)") {
    val two = Seq(
      (1L, s"$boiler xx yy zz $boiler"),
      (2L, s"$boiler unrelated suffix tokens here")
    ).toDF("doc_id", "text")
    val d1 = DupSpans.spans(two).filter(col("doc_id") === 1).orderBy("span_start").collect()
    assert(d1.length === 2, s"expected 2 maximal runs, got ${d1.length}")
    assert(d1(0).getLong(1) === 0L)
    assert(d1(1).getLong(2) === d1(1).getLong(1) + 7L + 4L, "second run is 8 grams wide")
  }

  test("dup profile: coverage ratio and zero rows for clean docs") {
    val prof = DupSpans.docDupProfile(docs).orderBy("doc_id").collect()
    assert(prof.length === 3, "profile covers every doc, including clean ones")
    val p3 = prof(2)
    assert(p3.getLong(1) === 0L && p3.getLong(2) === 0L && p3.getDouble(4) === 0.0)
    val p2 = prof(1)
    // doc 2 has 15 tokens, 12 inside the span
    assert(p2.getLong(2) === 12L)
    assert(p2.getDouble(4) === 12.0 / 15.0)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("excision removes exactly the span tokens, keeps order, keeps clean docs whole") {
    val out = DupSpans.excise(docs).orderBy("doc_id").collect()
    // doc 1: tokens 3..14 excised from 17 -> "alpha beta gamma tail one"
    assert(out(0).getLong(1) === 5L)
    assert(out(0).getString(2) === md5hex("alpha beta gamma tail one"))
    // doc 2: tokens 0..11 excised from 15 -> "different ending here"
    assert(out(1).getLong(1) === 3L)
    assert(out(1).getString(2) === md5hex("different ending here"))
    // doc 3: untouched, hash of its own (lowercased) text
    assert(out(2).getLong(1) === 10L)
    assert(out(2).getString(2) ===
      md5hex("entirely unrelated content with no duplication at all whatsoever ok"))
  }

  test("a fully-boilerplate document comes back empty, not dropped") {
    val pair = Seq((1L, boiler), (2L, boiler)).toDF("doc_id", "text")
    val out = DupSpans.excise(pair).orderBy("doc_id").collect()
    assert(out.length === 2, "both docs present")
    assert(out.forall(_.getLong(1) === 0L))
    assert(out.forall(_.getString(2) === md5hex("")))
  }

  test("keep-one policy: the canonical owner keeps the span, every other doc loses it") {
    val out = DupSpans.exciseKeepOne(docs).orderBy("doc_id").collect()
    // doc 1 is the canonical owner (min doc_id over the fingerprint) — whole
    assert(out(0).getLong(1) === 17L)
    assert(out(0).getString(2) === md5hex(s"alpha beta gamma $boiler tail one"))
    // doc 2 loses the span
    assert(out(1).getLong(1) === 3L)
    assert(out(1).getString(2) === md5hex("different ending here"))
    // doc 3 untouched
    assert(out(2).getString(2) ===
      md5hex("entirely unrelated content with no duplication at all whatsoever ok"))
  }

  test("keep-one: a span repeated within the owner doc keeps only its first occurrence") {
    val two = Seq(
      (1L, s"$boiler xx yy zz $boiler"),
      (2L, s"$boiler unrelated suffix tokens here")).toDF("doc_id", "text")
    val out = DupSpans.exciseKeepOne(two).orderBy("doc_id").collect()
    // owner occurrence = (doc 1, start 0); doc 1's second copy and doc 2's go
    assert(out(0).getLong(1) === 15L)
    assert(out(0).getString(2) === md5hex(s"$boiler xx yy zz"))
    assert(out(1).getLong(1) === 4L)
    assert(out(1).getString(2) === md5hex("unrelated suffix tokens here"))
  }

  test("keep-one corpus-wide: with N sharers the span text survives in exactly one doc") {
    val many = (1L to 4L)
      .map(i => (i, s"unique$i prefix$i filler$i $boiler suffix$i"))
      .toDF("doc_id", "text")
    val txts = DupSpans.keepOneKeptText(many, 5, 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("txt")).toMap
    assert(txts.values.count(_.contains(boiler)) === 1,
      s"exactly one surviving occurrence expected, got: $txts")
    assert(txts(1L).contains(boiler), "min doc_id owns the span")
  }

  test("plan: sharedness is aggregate+join on the gram hash, never a per-hash window") {
    val plan = DupSpans.spans(docs).queryExecution.executedPlan.toString
    val windows = "Window".r.findAllIn(plan).length
    // exactly one window: the doc_id-partitioned islands row_number
    assert(windows >= 1, "islands row_number must be a window")
    assert(!plan.contains("Window [h"), "no window partitioned by the gram hash")
    assert(plan.contains("HashAggregate"), "df stamping is an aggregate")
  }
}
