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
  * Scale shape: one df aggregate over the token table, one per-doc
  * sort_array (bounded by the document's own length — a per-row cost, not
  * an aggregation-buffer hazard), a prefix-token equi-join for candidates,
  * then [[Dedup.jaccardVerify]] touches candidates only. At 100 TB this is
  * the exact-answer path; MinHash stays the cheaper approximate one.
  */
object SetJoin {

  /** All pairs of documents with shingle-set Jaccard ≥ `threshold`:
    * (id_a, id_b, n_common, jaccard), id_a < id_b — the SAME similarity
    * definition as the MinHash family ([[Dedup.minhashPairs]]), so this
    * exact join is the ground-truth superset of the LSH approximation on
    * identical sets. */
  def similarPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    // distinct word-3-gram shingles per doc — element table for filter + verify
    val toks = Dedup.shingles(docs)
    val dfreq = toks.groupBy("sh").agg(count(lit(1)).as("df"))
    // per-doc token list sorted by (df, token): rarest first, total order
    val prefixes = toks
      .join(dfreq, Seq("sh"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("sorted"))
      .select(col("doc_id"),
        expr(s"slice(sorted, 1, size(sorted) - CAST(ceil($threshold * size(sorted)) AS INT) + 1)")
          .as("prefix"))
      .select(col("doc_id"), explode(col("prefix")).as("p"))
      .select(col("doc_id"), col("p.sh").as("sh"))
    val cand = prefixes.as("a")
      .join(prefixes.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    Dedup.jaccardVerify(cand, toks, threshold)
  }
}
