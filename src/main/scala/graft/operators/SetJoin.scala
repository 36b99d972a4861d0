package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prefix-filtering set-similarity join (the PPJoin family — Xiao et al.,
  * "Efficient Similarity Joins for Near Duplicate Detection"): the THIRD
  * candidate-generation scheme in the dedup toolbox, alongside MinHash
  * banding and SimHash sub-bands — and unlike those, EXACT: prefix
  * filtering is complete (never misses a qualifying pair), so the result
  * is the full threshold join, not an approximation.
  *
  * Principle: order every document's token set by ascending document
  * frequency (rarest first, ties by token); for Jaccard ≥ t, a document x
  * can only match documents sharing a token in its first
  * |x| − ⌈t·|x|⌉ + 1 tokens (if none of those match, fewer than t·|x| of
  * x's tokens can be shared). Candidates therefore come from an equi-join
  * on PREFIX tokens only — and because prefixes favor RARE tokens, the
  * per-token fanout is small by construction (the hot corpus-wide tokens
  * land at the back of every list and never generate candidates).
  *
  * Scale shape: one per-shingle df window over the element table, one
  * per-doc sort_array (bounded by the document's own length — a per-row
  * cost, not an aggregation-buffer hazard), a prefix-token equi-join for
  * candidates, then per-pair array-intersect verification touches
  * candidates only. At 100 TB this is the exact-answer path; MinHash
  * stays the cheaper approximate one.
  */
object SetJoin {

  /** All pairs of documents with shingle-set Jaccard ≥ `threshold`:
    * (id_a, id_b, n_common, jaccard), id_a < id_b — the SAME similarity
    * definition as the MinHash family ([[Dedup.minhashPairs]]), so this
    * exact join is the ground-truth superset of the LSH approximation on
    * identical sets.
    *
    * Verification is per-row `array_intersect` over the docs' (already
    * materialized) sorted shingle arrays with a size-compatibility filter
    * (J ≥ t ⇒ t·|y| ≤ |x|) — NOT an element-level join: exact prefixes
    * admit far more candidates than LSH bands (measured 409k pairs over
    * 5k docs at t=0.5), and the element join paid one row per SHARED
    * shingle per pair (~12M rows) where the array intersect is one row
    * per pair. With the single-shuffle df window this measures 5.8 s warm
    * at sf0.1 — the honest price of the EXACT answer over 409k candidates;
    * MinHash banding (~1 s, ~100 candidates) stays the approximate scale
    * path, and this operator is its ground truth. */
  def similarPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    // distinct word-3-gram shingles per doc, each stamped with its corpus
    // document frequency via ONE shuffle on the shingle (a per-shingle
    // window, bounded groups — shingle df is capped by |docs|), instead of
    // a separate df aggregate + equi-join that re-tokenizes and shuffles
    // the element table twice (measured: the df-join form spent ~2 s more
    // at sf0.1).
    val toks = Dedup.shingles(docs)
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("sh")))
    // per-doc shingle list sorted by (df, shingle): rarest first, total order
    val sortedDocs = toks
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("sorted"))
      .select(col("doc_id"),
        expr("transform(sorted, x -> x.sh)").as("shs"),
        size(col("sorted")).as("n"))
    // Prefix bound with ONE TOKEN of slack: the textbook length is
    // n − ⌈t·n⌉ + 1, but ⌈·⌉ over the IEEE product can land one above the
    // operational requirement (t=0.14, n=50: fl(0.14·50)=7.000…001, ceil=8,
    // yet a 7-shingle subset passes the final double comparison J >= t —
    // the pair would never become a candidate). One extra prefix token
    // absorbs any ulp-level discrepancy; verification is exact, so the
    // slack costs only a few candidates, never correctness.
    val prefixes = sortedDocs
      .select(col("doc_id"),
        explode(expr(s"slice(shs, 1, size(shs) - CAST(ceil($threshold * size(shs)) AS INT) + 2)"))
          .as("sh"))
    val cand = prefixes.as("a")
      .join(prefixes.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    cand
      .join(sortedDocs.select(col("doc_id").as("id_a"),
        col("shs").as("shs_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sortedDocs.select(col("doc_id").as("id_b"),
        col("shs").as("shs_b"), col("n").as("n_b")), Seq("id_b"))
      // length filter with the same one-unit slack: J ≥ t is impossible
      // when sizes differ by more than 1/t, up to IEEE boundary wiggle
      .filter(col("n_a") * lit(threshold) <= col("n_b") + lit(1) &&
        col("n_b") * lit(threshold) <= col("n_a") + lit(1))
      .withColumn("n_common", size(array_intersect(col("shs_a"), col("shs_b"))).cast("long"))
      .withColumn("jaccard",
        col("n_common") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "n_common", "jaccard")
      .orderBy("id_a", "id_b")
  }
}
