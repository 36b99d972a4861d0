package graft

/** Plan-quality regression gate over EVERY registered query: the scale
  * killers (cartesian products, unintentional nested-loop joins) must
  * never re-enter a plan silently. The PERF.md plan-audit claims are
  * enforced here, not just documented.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Queries whose BroadcastNestedLoopJoin is intentional and bounded:
    *  - gain family + onlinetime_7d: non-equi join against a BROADCAST
    *    1-row date-bounds frame (the declarative alternative to a driver
    *    collect) — inner side is one row, so the "nested loop" is a scan.
    *  - cosine_topk(_int8) / dedup_embedding / *_recall: deliberate
    *    brute-force baselines or their truth branches — the broadcast side
    *    is the small query set; the LSH/IVF siblings are the scale path.
    *  - ann_ivf: nlist-row centroid broadcast for the argmin assignment.
    *  - bm25_topk / quality_gate_adaptive / tfidf_top_terms /
    *    q22_dormant_customers / q11_important_parts: crossJoin against a
    *    BROADCAST 1-row stats/threshold/total frame (the Q22/Q11 scalar
    *    subquery). q15_top_supplier is deliberately absent: its
    *    cross+filter is an EQUALITY (total_rev = mx), which Catalyst
    *    rewrites into a broadcast hash join.
    * Anything NOT in this set that plans a nested loop is a regression. */
  private val intentionalBnlj: Set[String] = Set(
    "gain_1d", "gain_7d", "gain_alltime", "onlinetime_7d",
    "cosine_topk", "cosine_topk_int8", "dedup_embedding",
    "ann_recall", "neardup_recall", "ivf_recall", "ann_ivf", "ann_ivf_stored",
    "ann_ivf_filtered", "ivf_filtered_recall",
    // sample_cluster_balanced: the same nlist-row centroid broadcast as
    // ann_ivf — the IVF assignment is the clustering it balances over.
    "sample_cluster_balanced",
    // tight-filter twins: same nlist-row centroid broadcast (probe) and
    // broadcast query-set truth branch as the ann_ivf/ivf_filtered pair
    // — the adaptive width changes how MANY cells are probed, not the
    // join shapes.
    "ann_ivf_filtered_tight", "ivf_filtered_recall_tight",
    "bm25_topk", "bm25_postings", "quality_gate_adaptive", "tfidf_top_terms",
    "rank_repair", "hll_distinct_events", "null_hll_distinct",
    "bloom_prefilter_join", "bloom_shuffle_join", "q22_dormant_customers",
    "q11_important_parts",
    // kll_quantiles: the 1-row broadcast estimate frame fans out over the
    // fact scan for the true-rank certificate check — same scalar-subquery
    // shape as bm25_topk/quality_gate_adaptive.
    "kll_quantiles",
    // kmv_corpus_overlap: three 1-row frames (two sketches + the exact
    // certificate aggregate) cross-joined into the single output row.
    "kmv_corpus_overlap",
    // lm_perplexity(+_stored): the 1-row vocabulary-size frame broadcast
    // over the candidate bigrams — the same bounded scalar-subquery shape
    // as bm25_topk's corpus-stats cross join.
    "lm_perplexity", "lm_perplexity_stored",
    // dsir_select: two lm_perplexity scorings (target + raw models), so
    // the same 1-row vocabulary broadcast appears twice.
    "dsir_select",
    // hybrid_search_rrf: inherits both legs' allowlisted 1-row broadcasts
    // (bm25's corpus stats + the cosine query row over the corpus).
    "hybrid_search_rrf",
    // length_batches: the 1-row corpus-total frame broadcast over the
    // ranked docs for the integer bucket arithmetic.
    "length_batches",
    // heavy_hitters: the 1-row total-count frame broadcast under the
    // integer threshold filter (count·(k+1) > N) — scalar-subquery shape.
    "heavy_hitters",
    // sample_temperature: two 1-row frames (exact weight sum z, allocated
    // base) broadcast into the |langs|-row quota arithmetic.
    "sample_temperature",
    // pq recall gates: the TRUTH branch is the labeled brute-force
    // baseline (broadcast all-pairs), same as ann_recall/ivf_recall.
    "pq_recall", "pq_rerank_recall")

  test("no CartesianProduct in any query plan; nested loops only where intentional") {
    GraftFunctions.installOptimizations(spark)
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      val cart = plan.contains("CartesianProduct")
      val badBnlj = plan.contains("BroadcastNestedLoopJoin") && !intentionalBnlj(name)
      if (cart) Some(s"$name: CartesianProduct")
      else if (badBnlj) Some(s"$name: unexpected BroadcastNestedLoopJoin")
      else None
    }
    assert(offenders.isEmpty, s"scale-killer plans found:\n${offenders.mkString("\n")}")
  }

  test("column pruning reaches the parquet scans (ReadSchema narrowed)") {
    // "Push down and prune" enforced, not just documented: a scan that
    // reads all columns for a narrow projection is a silent 100 TB
    // regression even when results stay correct.
    def schemas(q: String): Seq[String] =
      "ReadSchema: [^\\n]+".r
        .findAllIn(SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString)
        .toList
    // events carries event_type + props; the snapshot family needs neither
    assert(schemas("snapshot_daily").forall(s => !s.contains("props") && !s.contains("event_type")),
      "snapshot_daily must not read the JSON props / event_type columns")
    // the gain family's broadcast date-bound subtree scans ONLY ts
    // ts has shipped as both raw NANOS-long and native µs/NTZ (see
    // Tables.events) — the gate is "ts ALONE", not its physical type
    assert(schemas("gain_1d").exists(s =>
      s.endsWith("struct<ts:bigint>") || s.endsWith("struct<ts:timestamp_ntz>")),
      "gain_1d's date-bound scan must prune to the ts column alone")
    // TPC-H Q1 touches 7 of lineitem's 16 columns
    assert(schemas("q1_pricing").forall(s => !s.contains("l_orderkey") && !s.contains("l_partkey")),
      "q1_pricing must not read join keys it never uses")
    // per-row text ops read exactly (doc_id, text)
    assert(schemas("token_count").forall(_.endsWith("struct<doc_id:bigint,text:string>")),
      "token_count must read exactly doc_id and text")
    // LM training + scoring touch only (doc_id, text); the left-join base
    // (every score-side doc surfaces) prunes all the way to doc_id alone
    assert(schemas("lm_perplexity").forall(s =>
      s.endsWith("struct<doc_id:bigint,text:string>") || s.endsWith("struct<doc_id:bigint>")),
      "lm_perplexity must read at most doc_id and text on all document scans")
    // the layout-key projection reads neither props nor value nor event_type
    assert(schemas("zorder_events").forall(s =>
      !s.contains("props") && !s.contains("value") && !s.contains("event_type")),
      "zorder_events must read only (event_id, ts, user_id)")
    // the session aggregation needs only (ts, user_id)
    assert(schemas("session_minutes").forall(s =>
      !s.contains("props") && !s.contains("event_type") && !s.contains("value")),
      "session_minutes must read only (ts, user_id)")
    // the HLL register pipeline reads only its group + key columns
    assert(schemas("hll_distinct_users").forall(s =>
      !s.contains("props") && !s.contains("value") && !s.contains("ts:")),
      "hll_distinct_users must read only (event_type, user_id)")
    // Q2's fact scan reads exactly the join keys + the price being minimized
    assert(schemas("q2_min_cost_supplier").exists(
      _.endsWith("struct<l_partkey:bigint,l_suppkey:bigint,l_extendedprice:double>")),
      "q2 lineitem scan must prune to (l_partkey, l_suppkey, l_extendedprice)")
    // Q20's fact scan reads exactly the keys + the quantity being summed
    assert(schemas("q20_dominant_suppliers").exists(
      _.endsWith("struct<l_partkey:bigint,l_suppkey:bigint,l_quantity:double>")),
      "q20 lineitem scan must prune to (l_partkey, l_suppkey, l_quantity)")
    // Q17's fact scan reads exactly the part key + the two measures
    assert(schemas("q17_small_qty_revenue").exists(
      _.endsWith("struct<l_partkey:bigint,l_quantity:double,l_extendedprice:double>")),
      "q17 lineitem scan must prune to (l_partkey, l_quantity, l_extendedprice)")
    // Q18's per-order aggregate scans only (l_orderkey, l_quantity)
    assert(schemas("q18_large_orders").exists(
      _.endsWith("struct<l_orderkey:bigint,l_quantity:double>")),
      "q18 lineitem scan must prune to (l_orderkey, l_quantity)")
    // Q10's fact shuffle carries only the keys + the two revenue inputs
    assert(schemas("q10_returned_customers").exists(
      _.endsWith("struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double,l_returnflag:string>")),
      "q10 lineitem scan must prune to (l_orderkey, l_extendedprice, l_discount, l_returnflag)")
    // Q12 reads only the join key, the group column, and the lateness date
    assert(schemas("q12_late_priority").exists(
      _.endsWith("struct<l_orderkey:bigint,l_linestatus:string,l_shipdate:timestamp_ntz>")),
      "q12 lineitem scan must prune to (l_orderkey, l_linestatus, l_shipdate)")
    // Q8's fact scan reads exactly the three join keys + the two revenue
    // inputs — the widest shuffle in the suite's deepest join tree must
    // carry no dead columns.
    assert(schemas("q8_market_share").exists(
      _.endsWith("struct<l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,l_extendedprice:double,l_discount:double>")),
      "q8 lineitem scan must prune to (l_orderkey, l_partkey, l_suppkey, l_extendedprice, l_discount)")
    // Q21 scans lineitem twice (the filtered late set and the all-supplier
    // set); both must carry at most (l_orderkey, l_suppkey, l_shipdate).
    assert(schemas("q21_waiting_suppliers").filter(_.contains("l_orderkey")).nonEmpty &&
      schemas("q21_waiting_suppliers").filter(_.contains("l_orderkey")).forall(s =>
        s.endsWith("struct<l_orderkey:bigint,l_suppkey:bigint,l_shipdate:timestamp_ntz>") ||
        s.endsWith("struct<l_orderkey:bigint,l_suppkey:bigint>")),
      "q21 lineitem scans must prune to (l_orderkey, l_suppkey [, l_shipdate])")
    // grouping-sets expands rows, not columns: the scan stays 3-wide
    assert(schemas("pricing_grouping_sets").exists(
      _.endsWith("struct<l_quantity:double,l_returnflag:string,l_linestatus:string>")),
      "pricing_grouping_sets must read exactly (l_quantity, l_returnflag, l_linestatus)")
    // every kll_quantiles lineitem scan reads at most the value + the two
    // shard-key columns; the rank-check scan prunes to the value ALONE
    assert(schemas("kll_quantiles").filter(_.contains("l_")).nonEmpty &&
      schemas("kll_quantiles").filter(_.contains("l_")).forall(s =>
        s.endsWith("struct<l_extendedprice:double>") ||
        s.endsWith("struct<l_orderkey:bigint,l_linenumber:int,l_extendedprice:double>")),
      "kll_quantiles lineitem scans must prune to (l_extendedprice) or (l_orderkey, l_linenumber, l_extendedprice)")
    // the hopping HLL expansion carries only (ts, user_id)
    assert(schemas("hopping_hll_distinct").forall(s =>
      !s.contains("props") && !s.contains("event_type") && !s.contains("value")),
      "hopping_hll_distinct must read only (ts, user_id)")
    // the span-dedup family tokenizes (doc_id, text) and nothing else
    for (q <- Seq("dup_spans", "dup_profile", "corpus_excised", "multimodal_audio_roundtrip"))
      assert(schemas(q).forall(s =>
        !s.contains("lang") && !s.contains("source") && !s.contains("n_chars")),
        s"$q documents scans must read only (doc_id, text)")
    // kmv's two documents subtrees: tokenization (doc_id, text) and the
    // side flag (doc_id, source) — never lang/n_chars
    assert(schemas("kmv_corpus_overlap").forall(s =>
      !s.contains("lang") && !s.contains("n_chars")),
      "kmv_corpus_overlap must not read lang/n_chars")
    // the streaming-state KMV daily rollup carries only (ts, user_id)
    assert(schemas("kmv_distinct_daily").forall(s =>
      !s.contains("props") && !s.contains("event_type") && !s.contains("value")),
      "kmv_distinct_daily must read only (ts, user_id)")
  }

  test("q9's six-column fact scan is pruned exactly (formatted explain — toString truncates it)") {
    // Q9's lineitem scan needs the three join keys plus quantity /
    // extendedprice / discount; the plan's toString truncates a schema
    // this wide ("l_extendedprice:doub..."), so the gate reads the
    // formatted explain, which prints scan details in full.
    GraftFunctions.installOptimizations(spark)
    val q9 = SparkEntry.queries("q9_product_profit")(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(q9.contains("struct<l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint," +
        "l_quantity:double,l_extendedprice:double,l_discount:double>"),
      "q9 lineitem scan must prune to exactly its 3 join keys + 3 measures")
    assert(!q9.contains("l_shipdate") && !q9.contains("l_returnflag"),
      "q9 must not read lineitem columns it never uses")
  }

  test("q6's entire predicate reaches the fact scan; q11/q15 compute their fact aggregate once") {
    GraftFunctions.installOptimizations(spark)
    // Q6 is THE pushdown query — zero joins, one aggregate; every
    // predicate is a plain column comparison precisely so all of them
    // land in PushedFilters and prune row groups by min/max stats. (The
    // discount band compares the raw double, not a DECIMAL cast, for
    // this reason — a cast would keep the band out of the scan.)
    // plan toString TRUNCATES long PushedFilters lists ("GreaterThanOrEqual(
    // l_shipda..."), so this gate reads the formatted explain, which prints
    // the scan details in full.
    val q6 = SparkEntry.queries("q6_forecast_revenue")(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    for (pushed <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)", "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24"))
      assert(q6.contains(pushed), s"q6 must push '$pushed' to the parquet scan")
    // Q11/Q15's scalar-subquery totals re-read the CacheRegistry-persisted
    // per-group aggregate instead of re-scanning the fact table: the plan
    // must show the cached relation on BOTH branches (textbook Q11/Q15
    // evaluate their inner view twice).
    for (q <- Seq("q11_important_parts", "q15_top_supplier")) {
      val n = "InMemoryTableScan".r
        .findAllIn(SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString)
        .length
      assert(n >= 2, s"$q must read its persisted per-group aggregate on both branches (saw $n)")
    }
  }

  test("q19's hand-derived quantity envelope is pushed to the fact scan") {
    // The disjunctive (brand, size, quantity) predicate spans both join
    // sides, so Catalyst cannot push any of it into the lineitem scan on
    // its own — the quantity ENVELOPE (union of the three bands) is
    // derived by hand in StarSchema.disjunctiveRevenue precisely so the
    // scan can skip row groups no disjunct could accept. This gate keeps
    // that envelope from being refactored away silently.
    GraftFunctions.installOptimizations(spark)
    val plan = SparkEntry.queries("q19_disjunctive_revenue")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(l_quantity") &&
      plan.contains("LessThanOrEqual(l_quantity"),
      "q19's quantity envelope must reach the scan's PushedFilters")
  }

  test("no exact-Percentile aggregate outside the low-cardinality allowlist") {
    // Exact `percentile` merges every distinct input value into ONE final
    // aggregation buffer — O(|corpus|) on a single task when values are
    // near-all-distinct doubles. quality_gate_adaptive was rebuilt on
    // distributed order-statistic selection (RankUtils) for exactly this
    // reason; this gate keeps the aggregate from re-entering a plan
    // silently. price_percentiles is allowlisted deliberately: it
    // aggregates l_quantity (~50 distinct values), where the buffer is
    // bounded by the value domain, not the corpus.
    GraftFunctions.installOptimizations(spark)
    val allowed = Set("price_percentiles")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).collect {
      case (name, fn)
          if !allowed(name) && "(?i)\\bpercentile\\(".r
            .findFirstIn(fn(spark, dir).queryExecution.executedPlan.toString)
            .isDefined => name
    }
    assert(offenders.isEmpty,
      s"exact Percentile aggregate found in: ${offenders.mkString(", ")}")
  }

  test("the intentional-BNLJ allowlist is not stale") {
    GraftFunctions.installOptimizations(spark)
    val actual = SparkEntry.queries.toSeq.sortBy(_._1).collect {
      case (name, fn)
          if fn(spark, dir).queryExecution.executedPlan.toString
            .contains("BroadcastNestedLoopJoin") => name
    }.toSet
    // Every allowlisted query must still exist; queries that no longer
    // plan a BNLJ should leave the allowlist so it keeps meaning something.
    assert(actual === intentionalBnlj,
      s"allowlist drift: actual=$actual allowlisted=$intentionalBnlj")
  }
}
