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

  test("RRF fusion: both-leg docs beat single-leg docs at equal ranks; single-leg survivors keep NULLs") {
    // lexical corpus: docs 1 and 2 mention the query term, 3 does not;
    // embeddings: vec 0 is the query, vec 2 and 3 are near it, vec 1 far.
    val docs = Seq(
      (1L, "alpha beta alpha pad a b c d"),
      (2L, "alpha pad x y z w q r"),
      (3L, "nothing relevant here at all ok fine")).toDF("doc_id", "text")
    def vec(x: Float, y: Float) = Array(x, y)
    val embs = Seq(
      (0L, vec(1f, 0f), 0), // the query
      (1L, vec(0f, 1f), 0), // far from query
      (2L, vec(0.99f, 0.1f), 0), // near
      (3L, vec(0.98f, 0.2f), 0)) // near
      .toDF("vec_id", "embedding", "label")
    // depth = 2: the far vector (1) misses the semantic leg, and doc 3
    // never matches the lexical one — each side exercises the NULL path
    val out = graft.operators.Search.hybridRrf(docs, embs, Seq("alpha"), k = 4, depth = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 2: lexical hit AND semantic neighbor -> two reciprocal terms;
    // docs 1 (lex-only) and 3 (sem-only) get one each -> doc 2 wins.
    val rrf = out.view.mapValues(_.getAs[Double]("rrf")).toMap
    assert(rrf(2L) > rrf(1L) && rrf(2L) > rrf(3L),
      s"both-leg doc must outrank single-leg docs: $rrf")
    assert(out(1L).isNullAt(out(1L).fieldIndex("rank_sem")),
      "lexical-only doc keeps a NULL semantic rank")
    assert(out(3L).isNullAt(out(3L).fieldIndex("rank_lex")),
      "semantic-only doc keeps a NULL lexical rank")
    // fused score is exactly the fixed two-term reciprocal sum
    val r2 = out(2L)
    val expect = 1.0 / (60.0 + r2.getAs[Long]("rank_lex")) +
      1.0 / (60.0 + r2.getAs[Long]("rank_sem"))
    assert(math.abs(rrf(2L) - BigDecimal(expect)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }
}
