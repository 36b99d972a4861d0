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
  * Df source — why an aggregate + join, not a window (and not a sketch):
  * a `count(*) over (partition by sh)` window hash-partitions EVERY row of
  * one shingle into ONE task, and skewed WINDOW partitions get no AQE
  * splitting — a boilerplate shingle appearing in a double-digit fraction
  * of a 100 TB corpus is one straggler buffering billions of rows while
  * the stage idles. The `groupBy(sh).count` + equi-join form shuffles the
  * element table a second time on the same key, but joins DO get AQE skew
  * splitting, so the hot key spreads across tasks; the shingle frame is
  * persisted (bounded [[CacheRegistry]]) so the corpus tokenizes once.
  * A broadcast count-min df estimate (zero extra shuffle, and sound —
  * completeness of prefix filtering holds under ANY consistent total
  * token order, so approximate df is safe) was measured and REJECTED:
  * with |vocabulary| ≫ sketch width the e·N/w overcount (~1300 at sf0.1,
  * where true df is 1-5) flattens the rarest-first ordering into hash
  * noise, candidates explode, and the verify stage pays for it
  * (9.9 s warm at sf0.1 vs 4.1-5.6 s for this form — which also beats
  * the 5.8 s window it replaces, the persist having removed the second
  * tokenization the old A/B charged the join form for) — a fixed-size
  * sketch cannot discriminate a corpus-scaled vocabulary, at ANY size.
  *
  * Scale shape: one map-side-combined df aggregate (|vocabulary| rows
  * out) + one AQE-skew-splittable equi-join to stamp it, one per-doc
  * sort_array (bounded by the document's own length — a per-row cost, not
  * an aggregation-buffer hazard), a prefix-token equi-join for candidates,
  * then per-pair array-intersect verification touches candidates only. At
  * 100 TB this is the exact-answer path; MinHash stays the cheaper
  * approximate one. With a maintained shingle artifact
  * ([[ShingleStore]]) the tokenization and df stamp are read, not
  * recomputed — [[similarPairsFromShingles]] is that entry point.
  */
object SetJoin {

  /** All pairs of documents with shingle-set Jaccard ≥ `threshold`:
    * (id_a, id_b, n_common, jaccard), id_a < id_b — the SAME similarity
    * definition as the MinHash family ([[Dedup.minhashPairs]]), so this
    * exact join is the ground-truth superset of the LSH approximation on
    * identical sets.
    *
    * Verification is per-row `array_intersect` over the docs' (already
    * materialized) sorted fingerprint arrays with a size-compatibility
    * filter (J ≥ t ⇒ t·|y| ≤ |x|) — NOT an element-level join: exact
    * prefixes admit far more candidates than LSH bands (measured 409k
    * pairs over 5k docs at t=0.5), and the element join paid one row per
    * SHARED shingle per pair (~12M rows) where the array intersect is one
    * row per pair — followed by an exact string re-check of accepted
    * pairs only (see [[similarPairsFromShingles]]). */
  def similarPairs(docs: DataFrame, threshold: Double = 0.5,
                   auditCollisions: Boolean = false): DataFrame = {
    // Persisted so the df aggregate and the stamp join read ONE
    // tokenization of the corpus (bounded registry — no cache leak).
    val toks = CacheRegistry.persistBounded(Dedup.shingles(docs))
    val dfreq = toks.groupBy("sh").agg(count(lit(1)).as("df"))
    similarPairsFromShingles(toks.join(dfreq, Seq("sh")), threshold, auditCollisions)
  }

  /** The join itself, over pre-stamped (doc_id, sh, df) rows — shared by
    * the self-contained [[similarPairs]] and the maintained-artifact path
    * ([[ShingleStore]]'s table carries the same exact df). Any CONSISTENT
    * df gives the identical result; only the candidate count varies.
    *
    * Fingerprinted verify — why the heavy joins carry xxhash64 LONGS, not
    * shingle strings: the decade-2 scale leg caught the verify join going
    * 39× for a 10× corpus (SetJoinProbe, sf10: every intermediate
    * cardinality exactly 10× — algorithmically linear — but 81 GB of
    * sort spill at fixed resources, all in the two candidate×arrays
    * joins, whose payload was one ~KB string array PER ROW, twice). An
    * 8-byte fingerprint cuts that payload ~4× and replaces string
    * comparison with long comparison in sort, join, and intersect.
    *
    * Exactness: the OUTPUT VALUES are always exact — accepted pairs are
    * re-verified on the true shingle STRINGS (O(result) docs, not
    * O(candidates)), so no result value ever depends on a fingerprint.
    * Completeness of the fingerprint pass is PROBABILISTIC by default,
    * not unconditional: absent any cross-string fingerprint collision in
    * the corpus, h ↔ shingle is a bijection and the pass is the exact
    * pipeline verbatim — but a collision between two tokens COMMON to a
    * pair can LOWER its fingerprint Jaccard (A={s1,s2,x}, B={s1,s2,y}
    * with h(s1)=h(s2): string-J 1/2, fingerprint-J 1/3), and a collision
    * can likewise perturb the (df, h) prefix order, either of which can
    * drop a qualifying near-threshold pair BEFORE the exact re-check
    * sees it. The loss is bounded by the corpus-wide birthday term
    * |V|²/2⁶⁵ ≈ 4e-7 at the measured 2.7M-token vocabulary (and a
    * collision only matters at all when the two colliding strings
    * co-occur in one candidate neighborhood).
    *
    * `auditCollisions = true` makes completeness UNCONDITIONAL — by
    * DETECTION, not by wider payloads: one vocabulary-sized aggregate
    * checks whether ANY two distinct shingles in THIS corpus share an
    * xxhash64 fingerprint ([[fingerprintCollisions]]); if none do (the
    * ~always case — expected once per ~2.5e12-token vocabulary), the
    * 64-bit pass IS the exact pipeline and the result is certified
    * complete at 64-bit cost; if a collision exists, the join re-runs
    * carrying the SHINGLE STRINGS as their own fingerprints (the same
    * pipeline, fp = identity — unconditionally exact, at the legacy
    * string-payload cost, paid only in the 4e-7 world where it is
    * actually needed).
    *
    * Why detection replaced the round-9 16-byte-BINARY mode (measured,
    * sf10, fresh JVM, 8 GiB): the md5-BINARY pipeline read 399 s where
    * 64-bit read 33 s, and the round-10 A/B isolated WHERE — the verify
    * join alone was 395 s of it, and swapping its sort-merge join for a
    * shuffled-hash join (no sort at all) only moved it to ~310 s, so the
    * sort-spill theory was WRONG: the cost is the BINARY(16) element
    * type itself (3× array payload, and generic byte[]-comparator paths
    * through sort/join/array_intersect where longs ride specialized
    * primitive comparators). An explicit payload-projected repartition
    * of the verify exchanges was also built and measured: 4× SLOWER
    * (user-specified partitioning freezes AQE's post-shuffle
    * optimization of that join). Detection keeps the long-specialized
    * pipeline for every real corpus and buys the same unconditional
    * guarantee the wide payload bought. */
  def similarPairsFromShingles(toks: DataFrame,
                               threshold: Double = 0.5,
                               auditCollisions: Boolean = false): DataFrame = {
    // Persisted: feeds the per-doc string sets AND (via fingerprints) the
    // sort/prefix/verify pipeline (and the collision audit, in audit mode).
    val toksP = CacheRegistry.persistBounded(toks)
    val fp = xxhash64(col("sh"))
    if (auditCollisions && !fingerprintCollisions(toksP, fp).isEmpty)
      // A real 64-bit collision in this corpus (expected ~never): fall
      // back to strings-as-fingerprints — same pipeline, unconditionally
      // exact, and the only world where the string payload is justified.
      pipelineFp(toksP, threshold, col("sh"))
    else
      pipelineFp(toksP, threshold, fp)
  }

  /** The colliding fingerprint values of `toks`' vocabulary under `fp` —
    * fingerprints carried by MORE THAN ONE distinct shingle string. One
    * two-phase aggregate over the distinct vocabulary (map-side combined;
    * |V| rows, the same scale as the df stamp the caller already paid).
    * Empty ⟺ h ↔ shingle is a bijection on this corpus ⟺ the
    * fingerprinted pass is the exact string pipeline verbatim. */
  private[graft] def fingerprintCollisions(toks: DataFrame,
                                           fp: org.apache.spark.sql.Column): DataFrame =
    toks.select(col("sh")).distinct()
      .select(fp.as("h"))
      .groupBy("h").agg(count(lit(1)).as("n_sh"))
      .filter(col("n_sh") > 1)

  /** The prefix-filter + verify pipeline over a PLUGGABLE fingerprint
    * column (xxhash64 longs on the fast path; the shingle string itself
    * on the collision-fallback path; a deliberately truncated hash in
    * the spec that forces the fallback). Exposed private[graft] so tests
    * can exercise the collision world without needing a real xxhash64
    * collision. */
  private[graft] def pipelineFp(toksP: DataFrame, threshold: Double,
                                fp: org.apache.spark.sql.Column): DataFrame = {
    val hashed = toksP.select(col("doc_id"), col("df"), fp.as("h"))
    // per-doc fingerprint list sorted by (df, fingerprint): rarest first.
    // Prefix filtering is complete under ANY consistent total token
    // order, so ordering ties by fingerprint instead of by string changes
    // candidates, never results. Persisted: the subtree feeds the prefix
    // explode AND both verify joins (3 evaluations of the same
    // shuffle+sort_array).
    // array_distinct guards the (astronomically rare) within-doc
    // fingerprint collision: two distinct shingles sharing h must count
    // as ONE set element so n matches array_intersect semantics.
    val sortedDocs = CacheRegistry.persistBounded(sortedFp(hashed))
    // Prefix bound with ONE TOKEN of slack: the textbook length is
    // n − ⌈t·n⌉ + 1, but ⌈·⌉ over the IEEE product can land one above the
    // operational requirement (t=0.14, n=50: fl(0.14·50)=7.000…001, ceil=8,
    // yet a 7-shingle subset passes the final double comparison J >= t —
    // the pair would never become a candidate). One extra prefix token
    // absorbs any ulp-level discrepancy; verification is exact, so the
    // slack costs only a few candidates, never correctness.
    //
    // Each prefix row carries the doc's size and the token's 0-based
    // position so the candidate join can prune BEFORE the distinct and the
    // array-materializing verify joins (the PPJoin length + positional
    // filters). Both are complete under the same one-unit slack:
    //  - length: J ≥ t is impossible when t·n_a > n_b (or vice versa).
    //  - positional: for a qualifying pair, its EARLIEST common token c
    //    (in the global (df, sh) order) is inside both prefixes (overlap
    //    o ≥ ⌈t·n⌉ on each side), every token before c on either side is
    //    unshared, so o ≤ min(n_a − pos_a, n_b − pos_b); join events whose
    //    bound can't reach the required overlap ⌈t/(1+t)·(n_a+n_b)⌉ are
    //    discarded — the event for c always survives, so each qualifying
    //    pair still reaches distinct().
    val prefixes = prefixesOf(sortedDocs, threshold)
    val reqFrac = threshold / (1.0 + threshold)
    val cand = prefixes.as("a")
      .join(prefixes.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
          col("a.n") * lit(threshold) <= col("b.n") + lit(1) &&
          col("b.n") * lit(threshold) <= col("a.n") + lit(1) &&
          least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) >=
            ceil(lit(reqFrac) * (col("a.n") + col("b.n"))) - lit(1))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    // Fingerprint pass: per-pair intersect over the LONG arrays. The
    // 1e-12 slack mirrors the prefix bound's IEEE slack — the hash score
    // only needs to never reject a pair the exact comparison accepts;
    // borderline admits cost one exact re-check, never correctness.
    // The verify joins ride the session's shuffle width under AQE —
    // measured at sf10: AQE-planned SMJ 33 s vs an explicit
    // payload-projected repartition 185 s (user repartitions freeze
    // AQE's post-shuffle optimization) vs shuffled-hash 40 s. On a
    // fixed-memory single JVM the replicated-array volume eventually
    // re-enters sort spill at ~10× this scale; the lever for that is the
    // shuffle-width/initialPartitionNum CONFIG (partitions scale with
    // data on a real cluster), not an operator-frozen partitioning.
    val accepted = CacheRegistry.persistBounded(cand
      .join(sortedDocs.select(col("doc_id").as("id_a"),
        col("shs").as("shs_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sortedDocs.select(col("doc_id").as("id_b"),
        col("shs").as("shs_b"), col("n").as("n_b")), Seq("id_b"))
      .withColumn("c_h", size(array_intersect(col("shs_a"), col("shs_b"))))
      .filter(col("c_h") / (col("n_a") + col("n_b") - col("c_h")) >=
        lit(threshold) - lit(1e-12))
      .select("id_a", "id_b"))
    // Exact re-verify on the accepted pairs only: true string sets are
    // rebuilt for JUST the docs that appear in a result row (O(result)
    // docs — a broadcast-sized frame even when the corpus is not), so the
    // output (n_common, jaccard) never depends on a fingerprint.
    val ids = accepted
      .select(explode(array(col("id_a"), col("id_b"))).as("doc_id")).distinct()
    val strSets = toksP.select("doc_id", "sh").join(ids, Seq("doc_id"))
      .groupBy("doc_id").agg(collect_set(col("sh")).as("ss"))
    accepted
      .join(strSets.select(col("doc_id").as("id_a"), col("ss").as("ss_a")), Seq("id_a"))
      .join(strSets.select(col("doc_id").as("id_b"), col("ss").as("ss_b")), Seq("id_b"))
      .withColumn("n_common", size(array_intersect(col("ss_a"), col("ss_b"))).cast("long"))
      .withColumn("jaccard",
        col("n_common") / (size(col("ss_a")) + size(col("ss_b")) - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "n_common", "jaccard")
      .orderBy("id_a", "id_b")
  }

  /** Per-doc sorted fingerprint arrays from (doc_id, df, h) rows: sorted
    * by (df, fingerprint) — rarest first, total order; `array_distinct`
    * guards the (astronomically rare) within-doc fingerprint collision
    * so `n` matches array_intersect semantics. */
  private def sortedFp(hashed: DataFrame): DataFrame = hashed
    .groupBy("doc_id")
    .agg(sort_array(collect_set(struct(col("df"), col("h")))).as("sorted"))
    .select(col("doc_id"),
      array_distinct(expr("transform(sorted, x -> x.h)")).as("shs"))
    .select(col("doc_id"), col("shs"), size(col("shs")).as("n"))

  /** Prefix rows (doc_id, n, pos, sh) with the one-token IEEE slack —
    * see the bound discussion in [[similarPairsFromShingles]]. */
  private def prefixesOf(sortedDocs: DataFrame, threshold: Double): DataFrame =
    sortedDocs
      .select(col("doc_id"), col("n"),
        posexplode(expr(s"slice(shs, 1, size(shs) - CAST(ceil($threshold * size(shs)) AS INT) + 2)")))
      .toDF("doc_id", "n", "pos", "sh")

  /** INCREMENTAL exact set-similarity join: a new document batch against
    * an EXISTING corpus — the daily-ingest shape of [[similarPairs]],
    * and the exact sibling of [[Dedup.minhashPairsIncremental]] (same
    * cross-pair semantics: only new×corpus pairs, never corpus×corpus).
    *
    * `corpusSh` is the maintained artifact's (doc_id, sh, df) rows
    * ([[ShingleStore.read]]), doc_id-disjoint from `newDocs`. The stored
    * df orders BOTH sides (batch tokens absent from it sort at df = 0 —
    * rarest; they can only candidate-match through a fingerprint
    * collision, which the exact re-check settles). The df may have been
    * computed over a SUPERSET of the corpus rows passed in (e.g. one
    * shared store filtered per query): prefix completeness needs only
    * ONE CONSISTENT total order, not any particular df, so superset
    * counts are sound — candidates shift marginally, results cannot.
    *
    * Corpus-side cost is the whole point: the corpus is never shuffled
    * and never fully tokenized. It is scanned (column-pruned) to resolve
    * batch-token df and to find docs sharing a batch-PREFIX fingerprint;
    * only those candidate docs' rows are fetched, sorted, and verified —
    * work proportional to batch + collisions, the
    * [[Dedup.minhashPairsIncremental]] asymmetry with exact output.
    * Output: (new_id, corpus_id, n_common, jaccard ≥ threshold). */
  def similarPairsIncremental(corpusSh: DataFrame, newDocs: DataFrame,
                              threshold: Double = 0.5): DataFrame = {
    val newShRaw = CacheRegistry.persistBounded(Dedup.shingles(newDocs))
    // Batch-token df from the stored corpus df (semi-restricted: the
    // corpus scan is filtered to batch tokens before the distinct — a
    // pruned read, not a corpus shuffle). Deliberately NOT persisting
    // corpusSh: the corpus must stay a scan; only batch-sized and
    // candidate-sized frames are worth caching.
    val batchTokens = newShRaw.select("sh").distinct()
    val dfreq = corpusSh.join(batchTokens, Seq("sh"), "left_semi")
      .select("sh", "df").distinct()
    val newToks = newShRaw.join(dfreq, Seq("sh"), "left_outer")
      .select(col("doc_id"), col("sh"), coalesce(col("df"), lit(0L)).as("df"))
    val newSorted = CacheRegistry.persistBounded(sortedFp(
      newToks.select(col("doc_id"), col("df"), xxhash64(col("sh")).as("h"))))
    val newPref = prefixesOf(newSorted, threshold)
    // Candidate corpus docs: any doc sharing a batch-PREFIX fingerprint
    // (a superset of docs sharing a both-prefix token, which every
    // qualifying pair must — the standard prefix-overlap theorem).
    val probe = newPref.select(col("sh").as("h")).distinct()
    val candIds = corpusSh
      .select(col("doc_id"), xxhash64(col("sh")).as("h"))
      .join(probe, Seq("h"), "left_semi")
      .select("doc_id").distinct()
    val corpusCand = CacheRegistry.persistBounded(
      corpusSh.join(candIds, Seq("doc_id"), "left_semi"))
    val corpusSorted = CacheRegistry.persistBounded(sortedFp(
      corpusCand.select(col("doc_id"), col("df"), xxhash64(col("sh")).as("h"))))
    val corpusPref = prefixesOf(corpusSorted, threshold)
    val reqFrac = threshold / (1.0 + threshold)
    val cand = newPref.as("a")
      .join(corpusPref.as("b"),
        col("a.sh") === col("b.sh") &&
          col("a.n") * lit(threshold) <= col("b.n") + lit(1) &&
          col("b.n") * lit(threshold) <= col("a.n") + lit(1) &&
          least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) >=
            ceil(lit(reqFrac) * (col("a.n") + col("b.n"))) - lit(1))
      .select(col("a.doc_id").as("new_id"), col("b.doc_id").as("corpus_id"))
      .distinct()
    val accepted = CacheRegistry.persistBounded(cand
      .join(newSorted.select(col("doc_id").as("new_id"),
        col("shs").as("shs_a"), col("n").as("n_a")), Seq("new_id"))
      .join(corpusSorted.select(col("doc_id").as("corpus_id"),
        col("shs").as("shs_b"), col("n").as("n_b")), Seq("corpus_id"))
      .withColumn("c_h", size(array_intersect(col("shs_a"), col("shs_b"))))
      .filter(col("c_h") / (col("n_a") + col("n_b") - col("c_h")) >=
        lit(threshold) - lit(1e-12))
      .select("new_id", "corpus_id"))
    // Exact string re-check over O(result) docs, as in the full join.
    val ssNew = newShRaw
      .join(accepted.select(col("new_id").as("doc_id")).distinct(), Seq("doc_id"))
      .groupBy("doc_id").agg(collect_set(col("sh")).as("ss"))
    val ssCor = corpusCand.select("doc_id", "sh")
      .join(accepted.select(col("corpus_id").as("doc_id")).distinct(), Seq("doc_id"))
      .groupBy("doc_id").agg(collect_set(col("sh")).as("ss"))
    accepted
      .join(ssNew.select(col("doc_id").as("new_id"), col("ss").as("ss_a")), Seq("new_id"))
      .join(ssCor.select(col("doc_id").as("corpus_id"), col("ss").as("ss_b")), Seq("corpus_id"))
      .withColumn("n_common", size(array_intersect(col("ss_a"), col("ss_b"))).cast("long"))
      .withColumn("jaccard",
        col("n_common") / (size(col("ss_a")) + size(col("ss_b")) - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("new_id", "corpus_id", "n_common", "jaccard")
      .orderBy("new_id", "corpus_id")
  }
}
