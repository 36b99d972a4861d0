package graft

import graft.operators.Search

/** BM25 semantics: rare terms outrank common ones, term frequency
  * saturates, documents without query terms never appear, k caps the
  * output. */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "needle in a haystack of common words common words common words"),
    (2L, "common words common words common words common words"),
    (3L, "needle needle needle common words"),
    (4L, "entirely unrelated content right here"),
    (5L, "common needle words")
  ).toDF("doc_id", "text")

  test("rare-term hits outrank common-term-only docs; no-hit docs are absent") {
    val out = Search.bm25TopK(docs, Seq("needle", "common"), k = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val ids = out.map(_._1)
    assert(!ids.contains(4L), "doc without any query term must not appear")
    val score = out.map(x => x._1 -> x._2).toMap
    // docs containing the rare 'needle' beat the common-only doc 2
    assert(score(3L) > score(2L) && score(1L) > score(2L) && score(5L) > score(2L))
    // tf saturation: doc 3 (needle x3) still beats doc 5 (needle x1)
    assert(score(3L) > score(5L))
    // both-term docs hit 2 terms
    assert(out.find(_._1 == 1L).get._3 === 2L)
  }

  test("k caps the result and ordering is score desc with doc_id tiebreak") {
    val out = Search.bm25TopK(docs, Seq("common"), k = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.length === 2)
    assert(out.map(_._2).toSeq === out.map(_._2).sortBy(-_).toSeq)
  }

  test("tf-idf keyword extraction surfaces the distinctive term first") {
    val out = Search.topTermsPerDoc(docs, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // doc 3: 'needle' appears in 3/5 docs, 'common'/'words' in 4/5 — the
    // rarer, repeated term must rank first.
    assert(out.filter(_._1 == 3L).minBy(_._2)._3 === "needle")
    assert(out.count(_._1 == 3L) === 2)
    // every doc yields at most k rows and ranks start at 1
    assert(out.groupBy(_._1).values.forall(rs => rs.map(_._2).min == 1L && rs.length <= 2))
  }

  test("scores are invariant under input partitioning (quantized aggregation)") {
    val a = Search.bm25TopK(docs.repartition(7), Seq("needle", "common")).collect().toSeq
    val b = Search.bm25TopK(docs.coalesce(1), Seq("needle", "common")).collect().toSeq
    assert(a === b)
  }

  test("stored posting-table path equals the recompute path and prunes to term buckets") {
    val idx = java.nio.file.Files.createTempDirectory("lexidx").toString
    try {
      Search.writeLexicalIndex(docs, idx)
      val terms = Seq("needle", "common")
      val fromIndex = Search.bm25TopKFromIndex(spark, idx, terms)
      assert(fromIndex.collect().toSeq === Search.bm25TopK(docs, terms).collect().toSeq)
      // rebuild is idempotent (L2 overwrite semantics)
      Search.writeLexicalIndex(docs, idx)
      assert(Search.bm25TopKFromIndex(spark, idx, terms).collect().toSeq
        === fromIndex.collect().toSeq)
      // the posting scan is PARTITION-PRUNED to the query terms' buckets:
      // the bucket predicate must land in PartitionFilters (pruned at
      // planning), not in the row-level data filters.
      val plan = fromIndex.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
        s"bucket filter must be a partition filter, plan:\n$plan")
      val postingDirs = new java.io.File(s"$idx/postings").listFiles()
        .filter(_.getName.startsWith("bucket=")).map(_.getName).toSet
      assert(postingDirs.size > 2,
        s"fixture should spread terms over >2 buckets, got $postingDirs")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idx))
    }
  }
}
