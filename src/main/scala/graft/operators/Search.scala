package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over the document corpus — the keyword complement to
  * the vector-similarity family ([[Similarity]]): classic BM25 scoring of
  * a term query, top-k by relevance. A data platform serving an
  * LLM-training corpus needs both retrieval modes (lexical for exact
  * terminology, vector for semantics); this one is pure aggregation —
  * no index structure, candidate rows bounded by documents actually
  * containing a query term. The doc-length and term-frequency branches
  * both read ONE lazily persisted token explode (same pattern as
  * [[Similarity]]'s shared base), so the corpus tokenizes once per
  * query; at 100 TB the (doc_id, term) posting table becomes a
  * maintained artifact — the lexical sibling of the persisted embedding
  * base.
  *
  * Scale shape: token explode → per-doc length aggregate (partial agg);
  * the tf table is FILTERED to query terms before its shuffle, so its
  * size is |docs containing any query term|, not the posting list of the
  * whole corpus; df and corpus stats are broadcast 1-row/|terms|-row
  * frames.
  *
  * Determinism (hash-gateable like the ANN family): the only
  * transcendental, ln(·) in the idf, is rounded to 6 dp immediately
  * (a 1-ulp libm difference between engines cannot survive the
  * rounding); everything after is IEEE arithmetic in mirrored textual
  * order, and per-term scores are quantized to integers
  * (round(score·1e9)) before the per-doc sum, so the aggregation is
  * order-independent and exact — the DuckDB oracle reproduces scores
  * bit-for-bit.
  */
object Search {

  /** Shared token explode. A narrow-scan spread (guide §2.5) was
    * MEASURED HERE AND REVERTED: the split+explode per-row work is light
    * relative to the exchange + extra stage it buys (bm25_topk 0.38 s
    * unspread vs 0.54-0.99 s across spread widths at sf0.1). */
  private def tokExplode(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(TextAnalysis.wordsExpr).as("term"))

  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int = 20,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must not be empty")
    // Bounded-registry persist (the doc-length and term-frequency branches
    // share one token explode) — a bare .persist() here accumulated an
    // entry per query in a long-lived session, the leak class the
    // CacheRegistry exists for.
    val toks = CacheRegistry.persistBounded(tokExplode(docs))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val tf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    scoreBm25(tf, dl, k, k1, b)
  }

  /** The BM25 scoring tail shared by the recompute-from-text path and the
    * maintained-posting-table path: takes the (doc_id, term, tf) rows
    * already restricted to the query terms plus the per-doc length table,
    * and is therefore oblivious to WHERE they came from — which is what
    * makes the stored-index variant hash-identical to the recompute by
    * construction. */
  private def scoreBm25(tf: DataFrame, dl: DataFrame, k: Int,
                        k1: Double, b: Double): DataFrame = {
    // avgdl as exact-long sum / exact count, divided once in double —
    // identical on both engines (a running double mean would not be).
    val corpus = broadcast(dl.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl")))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val withIdf = tf
      .join(broadcast(dfreq), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(corpus)
      // BM25+ style idf (the +1 keeps it positive for df > n/2); rounded
      // at once so the ln() is the ONLY engine-sensitive step.
      .withColumn("idf",
        round(log(
          ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5)) + lit(1.0)), 6))
      .withColumn("score_t",
        col("idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
      .withColumn("score_q", round(col("score_t") * lit(1e9)).cast("long"))
    withIdf.groupBy("doc_id")
      .agg(sum(col("score_q")).as("score_q"), count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score_q").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"),
        round(col("score_q").cast("double") / lit(1e9), 6).as("score"),
        col("n_terms_hit"))
      .orderBy(col("score").desc, col("doc_id").asc)
  }

  /** Number of hash buckets the stored posting table is partitioned into. */
  val PostingBuckets = 64

  /** Bucket id of a term — md5-derived so the WRITER (a Spark column
    * expression) and the READER (driver-side literal for partition pruning)
    * agree byte-for-byte: first 2 md5 bytes mod [[PostingBuckets]]. */
  private[operators] def termBucketCol(term: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (conv(substring(md5(term), 1, 4), 16, 10).cast("int") % PostingBuckets).as("bucket")

  private[operators] def termBucket(term: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(term.getBytes("UTF-8"))
    (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % PostingBuckets
  }

  /** Materialize the lexical index the documented "tokenizes per query"
    * seam calls for: the (doc_id, term, tf) posting table — hash-bucketed
    * by term so a query's scan prunes to its terms' buckets — plus the
    * per-doc length table, written once and read by every subsequent
    * lexical query ([[bm25TopKFromIndex]]). This is the lexical sibling of
    * the persisted embedding base: at 100 TB the posting table is ~|corpus
    * tokens| rows wide-shuffled ONCE at build time, and each query then
    * touches |terms| buckets instead of re-tokenizing the corpus.
    * Freshness, build caching, and crash-safe publish all ride
    * [[graft.sinks.ArtifactStore]] (shared with the shingle table). */
  def ensureLexicalIndex(docs: DataFrame, path: String): Unit =
    graft.sinks.ArtifactStore.ensure(docs, path, builderId = "lex1")(writeIndexTables)

  /** Unconditional rebuild + atomic publish (rebuilding is idempotent). */
  def writeLexicalIndex(docs: DataFrame, path: String): Unit =
    graft.sinks.ArtifactStore.publish(docs.sparkSession, path)(
      tmp => writeIndexTables(docs, tmp))

  private def writeIndexTables(docs: DataFrame, tmpRoot: String): Unit = {
    val toks = tokExplode(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.sinks.SnapshotStore.overwriteLatest(
      toks.groupBy("doc_id").agg(count(lit(1)).as("dl")), s"$tmpRoot/doclen")
    toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .withColumn("bucket", termBucketCol(col("term")))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("bucket").parquet(s"$tmpRoot/postings")
    toks.unpersist()
  }

  /** [[bm25TopK]] over a stored lexical index: the posting scan is pruned
    * to the query terms' buckets (partition pruning on the bucket column,
    * then a pushed term filter inside each bucket) — no corpus
    * tokenization at query time. Hash-identical to the recompute path by
    * construction (same [[scoreBm25]] tail over the same tf/dl rows). */
  def bm25TopKFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                        queryTerms: Seq[String], k: Int = 20,
                        k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must not be empty")
    val buckets = queryTerms.map(termBucket).distinct
    val tf = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("term").isin(queryTerms: _*))
      .select("doc_id", "term", "tf")
    val dl = spark.read.parquet(s"$path/doclen")
    scoreBm25(tf, dl, k, k1, b)
  }

  /** Per-document keyword extraction: top-`k` terms by tf·idf — corpus
    * tagging / topic surfacing over training data. Same determinism
    * construction as [[bm25TopK]] (idf's ln rounded at once, score
    * quantized to integers, term tiebreak); the per-doc rank window
    * partitions on doc_id — |docs| groups, so parallelism scales with the
    * corpus (unlike a per-category window). */
  def topTermsPerDoc(docs: DataFrame, k: Int = 3): DataFrame = {
    val toks = tokExplode(docs)
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val n = broadcast(docs.agg(count(lit(1)).as("n_docs")))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score_q").desc, col("term").asc)
    tf.join(broadcast(dfreq), Seq("term"))
      .crossJoin(n)
      .withColumn("idf",
        round(log(col("n_docs").cast("double") / col("df").cast("double")), 6))
      .withColumn("score_q",
        round(col("tf").cast("double") * col("idf") * lit(1e6)).cast("long"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"),
        round(col("score_q").cast("double") / lit(1e6), 6).as("tfidf"))
      .orderBy("doc_id", "rank")
  }

  /** HYBRID retrieval — reciprocal-rank fusion (Cormack et al., SIGIR
    * 2009) of the lexical and semantic legs: BM25 over the documents and
    * cosine top-k over the embeddings each produce a ranked candidate
    * list to `depth`, and a document's fused score is
    * Σ 1/(kRrf + rank_leg) over the legs that retrieved it. Rank fusion
    * needs no score normalization across legs (the classic BM25-vs-cosine
    * incomparability), which is why RRF is the default hybrid in
    * production search stacks.
    *
    * Determinism: ranks are exact integers from each leg's already-gated
    * deterministic ordering; the fused score is a FIXED two-term
    * expression of those integers (coalesce(1/(k+r), 0) + same), so no
    * aggregation order exists to vary — bit-identical on both engines.
    *
    * Scale shape: each leg is its own already-audited pipeline bounded to
    * `depth` rows; fusion is a full-outer join of two ≤depth-row frames
    * and a top-k — free at any corpus size. The single-partition
    * row_number over the lexical top-`depth` is bounded by construction
    * (same shape as the leg's own TakeOrdered tail). A doc retrieved by
    * only one leg keeps a NULL rank for the other — flagged, fused,
    * never dropped. */
  def hybridRrf(docs: DataFrame, embeddings: DataFrame, queryTerms: Seq[String],
                k: Int = 10, depth: Int = 20, kRrf: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = bm25TopK(docs, queryTerms, depth)
      .withColumn("rank_lex",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("rank_lex"))
    val sem = Similarity.cosineTopK(embeddings, numQueries = 1, k = depth)
      .select(col("cid").as("doc_id"), col("rank").as("rank_sem"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(kRrf).cast("double") + col("rank_lex").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf).cast("double") + col("rank_sem").cast("double")), lit(0.0)))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("rank_lex"), col("rank_sem"), round(col("rrf"), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
  }
}
