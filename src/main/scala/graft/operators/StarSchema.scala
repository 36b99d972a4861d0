package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Star-schema breadth queries (SURVEY.md §7.2 step 7).
  *
  * The reference's operator shapes — hash joins on a single equi-key,
  * grouped aggregation, top-K, window ranking, existence probes
  * (/root/reference/lib/src/etl.dart:229-247, :286-289, :550-570) — applied
  * to the TPC-H-ish fixture tables so the benchmark exercises them at
  * sf0.1+ volume.
  *
  * Determinism / oracle policy: every money aggregate is computed in
  * DECIMAL(18,2) (exact, order-independent — double sums would differ in
  * the last ulp between engines and between shuffle orders) and cast to
  * DOUBLE only at the output boundary; every ORDER BY carries a unique
  * tiebreak key.
  *
  * Scale notes: dimension joins (region/nation/customer/supplier) are
  * explicit `broadcast()`s — at 100 TB the fact-side stays shuffle-free for
  * those edges; the lineitem⋈orders edge hash-partitions on the join key and
  * benefits from AQE skew splitting. Aggregates are partial (map-side
  * combine) by construction.
  */
object StarSchema {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
  /** price * (1 - discount), exact. */
  private def revenue(price: org.apache.spark.sql.Column, disc: org.apache.spark.sql.Column) =
    dec(price) * (lit(1).cast(DecimalType(18, 2)) - dec(disc))

  /** TPC-H Q1-shaped pricing summary: one wide hash aggregate over the fact
    * table with a pushed-down date predicate. */
  def q1Pricing(lineitem: DataFrame): DataFrame =
    // Narrow-scan spread AFTER the pushed filter (guide §2.5): the wide
    // decimal partial aggregate otherwise runs on the fact file's single
    // scan task. Projection first so the exchange carries only the five
    // aggregate inputs; hash on l_orderkey (high-cardinality, skew-free)
    // — the group key itself has 6 values and would collapse the spread.
    SkewUtils.spreadCompute(
      lineitem
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .select("l_returnflag", "l_linestatus", "l_quantity",
          "l_extendedprice", "l_discount", "l_orderkey"),
      col("l_orderkey"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-shaped: segment filter on the (broadcast) customer dim, two
    * hash joins, revenue top-10. Sort+limit plans as TakeOrderedAndProject. */
  def q3TopOrders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val cut = lit("1998-01-01").cast("timestamp")
    broadcast(customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey"))
      .join(orders.filter(col("o_orderdate") < cut), col("c_custkey") === col("o_custkey"))
      .join(lineitem.filter(col("l_shipdate") > cut), col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)

  }

  /** TPC-H Q5-shaped: local-supplier revenue per nation inside one region —
    * 6-way join; all dimension edges broadcast, fact edges co-partitioned. */
  def q5RegionRevenue(
      region: DataFrame, nation: DataFrame, customer: DataFrame,
      orders: DataFrame, lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val nations = broadcast(
      region.filter(col("r_name") === "ASIA")
        .join(nation, col("r_regionkey") === col("n_regionkey"))
        .select("n_nationkey", "n_name"))
    // customer and supplier are FACT-sized at TPC-H scale: no forced
    // broadcast (a forced hint is honored regardless of size → executor OOM
    // at 100×). AQE plans these edges from runtime stats — broadcast when
    // they fit, shuffled hash join when they don't. Only the genuinely tiny
    // region⋈nation dim stays an explicit broadcast.
    val custs = customer.join(nations, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"))
    val supps = supplier.select("s_suppkey", "s_nationkey")
    orders
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(custs, col("o_custkey") === col("c_custkey"))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .join(supps, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(nations, col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  /** ROLLUP aggregation (beyond the reference's surface — SURVEY.md §2.5
    * notes it has none): per-(flag, status) pricing stats with subtotals
    * and a grand total in one pass (Spark expands grouping sets inside a
    * single hash aggregate). NULL ordering pinned explicitly — Spark ASC
    * defaults NULLS FIRST, DuckDB NULLS LAST. */
  def pricingRollup(lineitem: DataFrame): DataFrame =
    // Same single-scan-task spread as q1Pricing — the Expand multiplies
    // every fact row by the grouping-set count BEFORE the partial
    // aggregate, so the single-task penalty is 3-4× the plain aggregate's.
    SkewUtils.spreadCompute(
      lineitem.select("l_returnflag", "l_linestatus", "l_quantity", "l_orderkey"),
      col("l_orderkey"))
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** CUBE aggregation — [[pricingRollup]]'s hierarchical subtotals plus
    * the cross subtotal (status-only) rollup cannot produce: all four
    * grouping sets expand inside ONE hash aggregate (no union of scans).
    * `grouping()` markers distinguish "NULL because subtotal" from a
    * genuinely NULL group value — without them cube output is ambiguous
    * and unordered-able; with them the sort is total and
    * engine-independent. */
  def pricingCube(lineitem: DataFrame): DataFrame =
    SkewUtils.spreadCompute( // see pricingRollup — Expand × single task
      lineitem.select("l_returnflag", "l_linestatus", "l_quantity", "l_orderkey"),
      col("l_orderkey"))
      .cube("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"))
      .orderBy(col("g_flag").asc, col("g_status").asc,
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Explicit GROUPING SETS — the CUBE/ROLLUP generalization, with a set
    * list NEITHER can express: ((flag, status), (flag), (status)) — both
    * one-dimension margins but no grand total (cube adds (), rollup can't
    * produce the (status) margin). Same single-hash-aggregate expansion
    * and `grouping()` disambiguation as [[pricingCube]]; the set list is
    * planner metadata, not extra scans, so cost is rows × |sets| inside
    * one Expand — scale-identical to cube. */
  def pricingGroupingSets(lineitem: DataFrame): DataFrame =
    SkewUtils.spreadCompute( // see pricingRollup — Expand × single task
      lineitem.select("l_returnflag", "l_linestatus", "l_quantity", "l_orderkey"),
      col("l_orderkey"))
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"))
      .orderBy(col("g_flag").asc, col("g_status").asc,
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Exact percentiles per group (beyond the reference's surface): Spark's
    * `percentile` and DuckDB's `quantile_cont` share the standard
    * linear-interpolation definition, so results match bit-for-bit. At
    * 100 TB the approximate sketch (`approx_percentile`, mergeable
    * KLL-style buffers) replaces the exact sort — kept exact here because
    * the oracle gate demands determinism. */
  def pricePercentiles(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy("l_returnflag")
      .agg(
        // quantity, not price: exact percentile keeps a per-group counts
        // map of DISTINCT values — 50 quantities vs ~600k prices.
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.95)").as("p95"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Plain top-K over a fact table (O7): TakeOrderedAndProject, no shuffle
    * beyond the per-partition top-K merge. */
  def topOrders(orders: DataFrame, k: Int = 20): DataFrame =
    orders
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(k)

  /** Dimension rollup (A1-shaped): per-segment counts + exact balance sum. */
  def segmentStats(customer: DataFrame): DataFrame =
    customer
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_customers"),
        sum(dec(col("c_acctbal"))).cast("double").as("total_acctbal"))
      .orderBy("c_mktsegment")

  /** Per-customer top-3 orders (O4-shaped partitioned ranking): window
    * row_number partitioned by customer — shuffles once on o_custkey. */
  def customerTopOrders(orders: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .orderBy("o_custkey", "rn")
  }

  /** Same result as [[customerTopOrders]], computed with the custom
    * single-pass [[graft.functions.TopKAgg]] heap aggregate instead of a
    * window sort: map-side partial heaps merge associatively, so only K
    * rows per group cross the shuffle — the formulation that survives
    * groups too large to sort (SURVEY.md §2.10). Oracle-checked against
    * the window formulation's SQL. */
  def customerTopOrdersAgg(orders: DataFrame, k: Int = 3): DataFrame = {
    import graft.functions.TopKAgg.top_k
    orders
      .groupBy("o_custkey")
      .agg(top_k(struct(col("o_totalprice"), col("o_orderkey")), k).as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(
        col("o_custkey"),
        col("col.id").as("o_orderkey"),
        col("col.score").as("o_totalprice"),
        (col("pos") + 1).cast("long").as("rn"))
      .orderBy("o_custkey", "rn")
  }

  /** Existence-probe shape as an anti join (S7 dual): customers that never
    * ordered. Plans as a broadcast/shuffled hash anti join — no row fanout. */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders.select("o_custkey"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  /** TPC-H Q16 shape adapted to the fixture's columns (no partsupp table;
    * lineitem is the part↔supplier association, s_acctbal < 0 stands in for
    * the complaints predicate): distinct-supplier counts per (brand, size)
    * for a filtered part slice, excluding flagged suppliers, with a HAVING
    * floor. Scale shape: the part dimension is filtered then BROADCAST into
    * the fact scan (no fact shuffle for the join), the flagged-supplier
    * exclusion is a broadcast anti join, and the only fact-sized shuffle is
    * the (brand, size, suppkey) distinct-aggregate. */
  def supplierPartStats(part: DataFrame, lineitem: DataFrame, supplier: DataFrame,
                        excludeBrand: String = "Brand#1", maxSize: Int = 25,
                        minSuppliers: Long = 5): DataFrame = {
    val dims = broadcast(
      part.filter(col("p_brand") =!= excludeBrand && col("p_size") <= maxSize)
        .select("p_partkey", "p_brand", "p_size"))
    val flagged = supplier.filter(col("s_acctbal") < 0).select("s_suppkey")
    lineitem.select("l_partkey", "l_suppkey")
      .join(dims, col("l_partkey") === col("p_partkey"))
      .join(broadcast(flagged), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .filter(col("supplier_cnt") >= minSuppliers)
      .orderBy(col("supplier_cnt").desc, col("p_brand").asc, col("p_size").asc)
  }

  /** TPC-H Q7 shape — the widest join in the engine (lineitem ⋈ orders ⋈
    * customer ⋈ supplier ⋈ nation ⋈ nation): bilateral shipping revenue
    * between two nations by year. Scale shape: the nation predicate is
    * pushed INTO the supplier/customer dimensions BEFORE any fact join
    * (each reduced dim is a few % of its table and broadcasts), the
    * shipdate range prunes the fact scan, and only the two fact⋈fact
    * edges (lineitem⋈orders on orderkey, then ⋈customer on custkey)
    * shuffle — AQE-planned, never forced broadcast. */
  def nationVolume(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                   supplier: DataFrame, nation: DataFrame,
                   nationA: String = "NATION_3", nationB: String = "NATION_7",
                   start: String = "1996-01-01", end: String = "1998-01-01"): DataFrame = {
    val nations = nation.filter(col("n_name").isin(nationA, nationB))
    val supp = broadcast(supplier.select("s_suppkey", "s_nationkey")
      .join(broadcast(nations.select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "supp_nation"))
    val cust = broadcast(customer.select("c_custkey", "c_nationkey")
      .join(broadcast(nations.select(col("n_nationkey").as("n_nationkey2"),
        col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("n_nationkey2"))
      .select("c_custkey", "cust_nation"))
    lineitem
      .filter(col("l_shipdate") >= lit(start).cast("timestamp") &&
        col("l_shipdate") < lit(end).cast("timestamp"))
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q2 shape adapted (no partsupp — lineitem is the part↔supplier
    * price list): for every part of one type, the region's suppliers
    * offering the MINIMUM price. Q2's correlated min-subquery
    * (`ps_supplycost = (SELECT min(...) WHERE ps_partkey = p_partkey)`)
    * is expressed as a per-part window min over the ALREADY-joined offer
    * rows — one shuffle on l_partkey, instead of the subquery's second
    * scan+aggregate+join of the same fact slice that a literal
    * translation would plan. Window groups are bounded by per-part offer
    * fanout (≈ lineitems per part — scale-stable, parts grow with the
    * corpus), so no hot-partition hazard. Prices compare in
    * DECIMAL(18,2) — exact, so `price = mn` is engine-independent; ties
    * (several suppliers at the min) are all kept, as in Q2.
    *
    * Scale shape: region→nation→supplier prune+broadcast (the fact scan
    * never shuffles for dimension edges), part-type filter broadcast into
    * the scan, ONE fact shuffle (the window's l_partkey partition). */
  def minCostSuppliers(part: DataFrame, lineitem: DataFrame, supplier: DataFrame,
                       nation: DataFrame, region: DataFrame,
                       regionName: String = "EUROPE",
                       partType: String = "PROMO"): DataFrame = {
    val regionNations = broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")
      .join(broadcast(region.filter(col("r_name") === regionName).select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name"))
    val rs = broadcast(supplier.select("s_suppkey", "s_name", "s_nationkey")
      .join(regionNations, col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "n_name"))
    val parts = broadcast(
      part.filter(col("p_type") === partType).select("p_partkey", "p_name"))
    val offers = lineitem.select(
        col("l_partkey"), col("l_suppkey"), dec(col("l_extendedprice")).as("price"))
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(rs, col("l_suppkey") === col("s_suppkey"))
    offers
      .withColumn("mn", min(col("price")).over(Window.partitionBy(col("p_partkey"))))
      .filter(col("price") === col("mn"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
        col("n_name"), col("price").cast("double").as("min_price"))
      .distinct()
      .orderBy("p_partkey", "s_suppkey")
  }

  /** TPC-H Q20 shape adapted (no partsupp availability — dominance over
    * the part's own shipped volume stands in for the half-of-stock
    * predicate): suppliers who DOMINATE at least one part of one type,
    * shipping more than `sharePct`% of that part's total shipped
    * quantity. The nested structure survives the adaptation: an inner
    * per-(part, supplier) aggregate, a part-level total it is compared
    * against (window sum — same partitioning as the aggregate, so AQE
    * reuses the shuffle), a DISTINCT supplier set, and the outer
    * supplier⋈nation lookup semi-joined against it. The share compare is
    * exact integer-scaled DECIMAL (`qty·20 > total·3` for 15%) — no
    * double boundary for the gate to trip on.
    *
    * Scale shape: part filter broadcast-semi into the fact scan, one
    * fact shuffle on (l_partkey, l_suppkey), the window rides the same
    * l_partkey distribution, and the final semi joins are
    * dimension-sized. */
  def dominantPartSuppliers(part: DataFrame, lineitem: DataFrame,
                            supplier: DataFrame, nation: DataFrame,
                            partType: String = "PROMO",
                            sharePct: Int = 15): DataFrame = {
    val promo = broadcast(part.filter(col("p_type") === partType).select("p_partkey"))
    val perPS = lineitem.select("l_partkey", "l_suppkey", "l_quantity")
      .join(promo, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(dec(col("l_quantity"))).as("qty"))
    val dominant = perPS
      .withColumn("total", sum(col("qty")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("qty") * lit(100) > col("total") * lit(sharePct))
      .select("l_suppkey").distinct()
    supplier.select("s_suppkey", "s_name", "s_nationkey")
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "n_name")
      .orderBy("s_suppkey")
  }

  /** TPC-H Q4 shape adapted (no commit/receipt dates; "late" = a line item
    * shipped more than `lagDays` after the order date): order counts per
    * priority over a date window, EXISTS expressed as a LEFT SEMI join with
    * a non-equi lateness condition — the semi join keeps the fact scan
    * one-pass and never fans out multi-line orders. */
  def latePriorityCounts(orders: DataFrame, lineitem: DataFrame,
                         start: String = "1996-01-01", end: String = "1996-04-01",
                         lagDays: Int = 60): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit(start).cast("timestamp") &&
        col("o_orderdate") < lit(end).cast("timestamp"))
      .join(lineitem.select("l_orderkey", "l_shipdate"),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lagDays DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")

  /** TPC-H Q13 shape (order priority stands in for the comment filter):
    * distribution of customers by qualifying-order count INCLUDING the
    * zero-order bucket. The priority predicate lives on the orders side
    * BEFORE the left-outer join — the join-condition placement Q13
    * mandates; a post-join WHERE would silently turn the join inner and
    * drop the zero bucket. `count(o_orderkey)` counts only matched rows,
    * so unmatched customers aggregate to 0. Double aggregation: the outer
    * join + per-customer count shuffle on custkey (both sides fact-sized
    * at TPC-H scale, AQE-planned); the histogram over counts is
    * |distinct counts| rows — trivially small. */
  def customerOrderDistribution(customer: DataFrame, orders: DataFrame,
                                excludePriority: String = "1-URGENT"): DataFrame =
    customer.select("c_custkey")
      .join(orders.filter(col("o_orderpriority") =!= excludePriority)
          .select("o_orderkey", "o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q17 shape generalized per brand: revenue from "small" line
    * items — quantity below 20% of the part's average. The correlated avg
    * subquery is decorrelated to window aggregates over ONE l_partkey
    * shuffle (per-part groups are offer-fanout-bounded, scale-stable),
    * and the 0.2·avg compare is exact integer-scaled DECIMAL
    * (`qty·5·cnt < sum_qty`) — no double average for engines to disagree
    * on. The brand dim joins AFTER the filter, broadcast, over the ~10%
    * of rows that survive. */
  def smallQuantityRevenue(part: DataFrame, lineitem: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("l_partkey"))
    lineitem.select(col("l_partkey"), dec(col("l_quantity")).as("qty"),
        dec(col("l_extendedprice")).as("price"))
      .withColumn("sum_qty", sum(col("qty")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("qty") * lit(5) * col("cnt") < col("sum_qty"))
      .join(broadcast(part.select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg((sum(col("price")).cast("double") / lit(7.0)).as("avg_yearly"))
      .orderBy("p_brand")
  }

  /** TPC-H Q18 shape: large-quantity orders — a HAVING filter on a
    * fact-wide aggregate joined back into order+customer detail, top-K.
    * Scale shape: ONE fact shuffle (the per-order quantity sum); the
    * filtered survivors are a small fraction, so the joins back to orders
    * and customer are AQE-planned (broadcast when the survivor set fits);
    * sort+limit plans as TakeOrderedAndProject. The HAVING compare is
    * exact DECIMAL. */
  def largeOrders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                  minQty: Int = 200, k: Int = 100): DataFrame = {
    val big = lineitem.select("l_orderkey", "l_quantity")
      .groupBy("l_orderkey")
      .agg(sum(dec(col("l_quantity"))).as("total_qty"))
      .filter(col("total_qty") > minQty)
    orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(customer.select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"),
        col("total_qty").cast("double").as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(k)
  }

  /** TPC-H Q19 shape: disjunctive join predicate — three (brand, size,
    * quantity-band) disjuncts over the part⋈lineitem equi join. The join
    * stays a single broadcast hash join on partkey with the OR as a
    * residual filter, and the hand-derived quantity ENVELOPE (the union
    * of the three bands) is applied as a scan-level conjunct so the fact
    * scan prunes rows no disjunct can accept — a derived pushdown
    * Catalyst won't infer across a cross-table disjunction. */
  def disjunctiveRevenue(part: DataFrame, lineitem: DataFrame): DataFrame = {
    val bands = Seq(("Brand#12", 15, 1, 11), ("Brand#23", 25, 10, 20),
      ("Brand#5", 35, 20, 30))
    val envelope = col("l_quantity").between(
      bands.map(_._3).min, bands.map(_._4).max)
    val residual = bands.map { case (brand, maxSize, lo, hi) =>
      col("p_brand") === brand && col("p_size").between(1, maxSize) &&
        col("l_quantity").between(lo, hi)
    }.reduce(_ || _)
    lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .filter(envelope)
      .join(broadcast(part.select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .filter(residual)
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
  }

  /** TPC-H Q21 shape adapted (lateness = shipped more than `lagDays`
    * after the order date, as in [[latePriorityCounts]]): suppliers who
    * were the SOLE late supplier on a finished multi-supplier order.
    * Q21's double correlation — EXISTS another supplier's line, NOT
    * EXISTS another supplier's LATE line — becomes a left-semi and a
    * left-anti join, both equi on orderkey with the supplier inequality
    * as residual; the anti side re-reads the same distinct late set, so
    * the lateness subtree is computed once. Scale shape: one fact⋈fact
    * join (lineitem⋈orders on orderkey) feeds a distinct, then
    * order-key-partitioned semi/anti joins — no fanout; supplier is a
    * broadcast dim. */
  def waitingSuppliers(supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
                       lagDays: Int = 60, k: Int = 25): DataFrame = {
    val late = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(orders.filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lagDays DAYS"))
      .select("l_orderkey", "l_suppkey").distinct()
    val others = lineitem.select("l_orderkey", "l_suppkey").toDF("o2", "s2")
    val lateOthers = late.toDF("o3", "s3")
    late
      .join(others,
        col("l_orderkey") === col("o2") && col("l_suppkey") =!= col("s2"),
        "left_semi")
      .join(lateOthers,
        col("l_orderkey") === col("o3") && col("l_suppkey") =!= col("s3"),
        "left_anti")
      .join(broadcast(supplier.select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(k)
  }

  /** TPC-H Q8 shape: national market share — of one region's customers'
    * spending on one part type, the fraction supplied by one nation, by
    * order year. Q8's CASE-inside-sum survives verbatim: the nation
    * revenue and the total ride the SAME hash aggregate as two exact
    * DECIMAL accumulators, and only the final share is a double divide
    * (IEEE-deterministic on exact inputs). Scale shape: the part-type
    * filter broadcasts into the fact scan (joining the smallest edge
    * FIRST shrinks every later shuffle to the type's ~1/6 slice); the
    * supplier⋈nation name lookup broadcasts the tiny nation side into
    * supplier, and the supplier edge itself is AQE-planned (supplier is
    * fact-sized at TPC-H scale — never force-broadcast); the
    * region-membership test on the customer side is a broadcast SEMI
    * join (only membership matters, no customer columns survive); the
    * two fact⋈fact edges (orders, customer) shuffle on their keys. */
  def marketShare(part: DataFrame, lineitem: DataFrame, orders: DataFrame,
                  customer: DataFrame, supplier: DataFrame, nation: DataFrame,
                  region: DataFrame,
                  regionName: String = "ASIA", targetNation: String = "NATION_3",
                  partType: String = "PROMO",
                  start: String = "1996-01-01", end: String = "1998-01-01"): DataFrame = {
    val regionKeys = broadcast(nation
      .join(broadcast(region.filter(col("r_name") === regionName).select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey"))
    val supp = supplier.select("s_suppkey", "s_nationkey")
      .join(broadcast(nation.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "supp_nation")
    val rev = revenue(col("l_extendedprice"), col("l_discount"))
    lineitem.select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(part.filter(col("p_type") === partType).select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(orders
          .filter(col("o_orderdate") >= lit(start).cast("timestamp") &&
            col("o_orderdate") < lit(end).cast("timestamp"))
          .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_nationkey")
          .join(regionKeys, col("c_nationkey") === col("n_nationkey"), "left_semi"),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === targetNation, rev).otherwise(dec(lit(0))))
          .cast("double") /
          sum(rev).cast("double")).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q9 shape adapted (no partsupp — `p_retailprice · quantity`
    * stands in for the supply cost): per-(supplier-nation, order-year)
    * profit on parts whose name matches a pattern. The profit expression
    * is exact end-to-end: DECIMAL revenue minus a DECIMAL(18,2)×(18,2)
    * product (widened by Spark and DuckDB to the same exact type), cast
    * to double only at the output. Scale shape: the name-pattern part
    * slice broadcasts into the fact scan FIRST (every later edge moves
    * only matching rows); supplier⋈nation broadcasts nation and leaves
    * the supplier edge to AQE; lineitem⋈orders shuffles on orderkey —
    * the one unavoidable fact⋈fact edge, carrying just (orderkey,
    * orderdate). */
  def productTypeProfit(part: DataFrame, lineitem: DataFrame, orders: DataFrame,
                        supplier: DataFrame, nation: DataFrame,
                        namePattern: String = "%widget%"): DataFrame = {
    val supp = supplier.select("s_suppkey", "s_nationkey")
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    val amount = revenue(col("l_extendedprice"), col("l_discount")) -
      dec(col("p_retailprice")) * dec(col("l_quantity"))
    lineitem
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity")
      .join(broadcast(part.filter(col("p_name").like(namePattern))
          .select("p_partkey", "p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(amount).cast("double").as("sum_profit"))
      .orderBy(col("nation").asc, col("o_year").desc)
  }

  /** TPC-H Q10 shape: returned-item reporting — the top-k customers by
    * revenue lost to returns in one quarter. Aggregation BEFORE detail:
    * the per-customer revenue sum is computed over just (custkey,
    * revenue) — ONE fact shuffle carrying two columns — and only then
    * joined to customer attributes and the broadcast nation name, so the
    * wide customer row never rides the fact shuffle. Scale shape: date
    * window prunes orders, the returnflag filter prunes lineitem at the
    * scan, orders⋈lineitem is the AQE-planned fact⋈fact edge, and the
    * survivors⋈customer join moves |filtered customers| rows;
    * sort+limit plans as TakeOrderedAndProject. */
  def returnedItemCustomers(customer: DataFrame, orders: DataFrame,
                            lineitem: DataFrame, nation: DataFrame,
                            start: String = "1996-04-01", end: String = "1996-07-01",
                            k: Int = 20): DataFrame = {
    val perCust = orders
      .filter(col("o_orderdate") >= lit(start).cast("timestamp") &&
        col("o_orderdate") < lit(end).cast("timestamp"))
      .select("o_orderkey", "o_custkey")
      .join(lineitem.filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_extendedprice", "l_discount"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
    perCust
      .join(customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(k)
  }

  /** TPC-H Q11 shape adapted (no partsupp — shipped value
    * `sum(l_extendedprice)` by one nation's suppliers stands in for
    * stock value): parts whose value exceeds `1/fractionDen` of the
    * nation's total. Q11's scalar subquery re-runs the whole
    * group-by under a sum; here the per-part aggregate is computed ONCE
    * (bounded [[CacheRegistry]] persist — it is dimension-sized), and
    * the total is a 1-row re-aggregate of those cached rows
    * broadcast-cross-joined into the filter. The share compare is exact
    * integer-scaled DECIMAL (`value · fractionDen > total`) — no double
    * boundary. Scale shape: the nation's supplier keys broadcast-SEMI
    * into the fact scan (~1/|nations| of rows survive), one fact shuffle
    * on partkey, and everything after operates on |parts| rows. */
  def importantParts(lineitem: DataFrame, supplier: DataFrame, nation: DataFrame,
                     nationName: String = "NATION_3",
                     fractionDen: Long = 1000L): DataFrame = {
    val supp = broadcast(supplier.select("s_suppkey", "s_nationkey")
      .join(broadcast(nation.filter(col("n_name") === nationName)
          .select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey"))
    val perPart = CacheRegistry.persistBounded(
      lineitem.select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(supp, col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(sum(dec(col("l_extendedprice"))).as("value")))
    val total = broadcast(perPart.agg(sum(col("value")).as("total")))
    perPart
      .crossJoin(total)
      .filter(col("value") * lit(fractionDen) > col("total"))
      .select(col("l_partkey"), col("value").cast("double").as("value"))
      .orderBy(col("value").desc, col("l_partkey").asc)
  }

  /** TPC-H Q15 shape: the top supplier — per-supplier revenue over one
    * quarter, keeping the supplier(s) achieving the maximum. Q15's
    * revenue VIEW is evaluated twice in the textbook form (once under
    * max, once in the outer query); here it is computed ONCE into the
    * bounded [[CacheRegistry]] (it is |suppliers|-sized) and the max is
    * a 1-row re-aggregate broadcast-cross-joined back — the declarative
    * form of the scalar subquery, with no single-partition window. The
    * max-equality compare happens in exact DECIMAL, so ties (all kept,
    * as Q15 specifies) are engine-independent. Scale shape: date window
    * pruned at the fact scan, ONE fact shuffle (the suppkey aggregate),
    * then supplier-dimension-sized work. */
  def topSupplier(supplier: DataFrame, lineitem: DataFrame,
                  start: String = "1996-01-01", end: String = "1996-04-01"): DataFrame = {
    val perSupp = CacheRegistry.persistBounded(
      lineitem
        .filter(col("l_shipdate") >= lit(start).cast("timestamp") &&
          col("l_shipdate") < lit(end).cast("timestamp"))
        .select("l_suppkey", "l_extendedprice", "l_discount")
        .groupBy("l_suppkey")
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).as("total_rev")))
    val mx = broadcast(perSupp.agg(max(col("total_rev")).as("mx")))
    perSupp
      .crossJoin(mx)
      .filter(col("total_rev") === col("mx"))
      .join(supplier.select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q6 shape: the pure scan-side aggregate — a conjunction of
    * range predicates (shipdate window, discount band, quantity cap) over
    * ONE global sum, zero joins. Every predicate is a plain column
    * comparison, so the whole WHERE reaches the parquet scan as
    * PushedFilters and prunes row groups by min/max statistics — at
    * 100 TB this is the query that reads almost nothing. The discount
    * band compares the RAW double column (parquet float bits are
    * identical across engines and IEEE literal parsing is standardized,
    * so the band is engine-independent AND stays pushable — a
    * DECIMAL-cast band would be exact too but casts don't push);
    * the summed product is exact DECIMAL. */
  def forecastRevenue(lineitem: DataFrame,
                      start: String = "1996-01-01", end: String = "1997-01-01",
                      discLo: Double = 0.05, discHi: Double = 0.07,
                      maxQty: Int = 24): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit(start).cast("timestamp") &&
        col("l_shipdate") < lit(end).cast("timestamp") &&
        col("l_discount").between(discLo, discHi) &&
        col("l_quantity") < maxQty)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue"))

  /** TPC-H Q12 shape adapted (l_linestatus stands in for l_shipmode, and
    * lateness = shipped more than `lagDays` after the order date, the
    * fixture's established commit-date stand-in): per-status counts of
    * late lines split by order priority — the dual conditional aggregate
    * (CASE WHEN inside count) over one fact⋈fact equi join on orderkey
    * with the lateness inequality as a residual. Scale shape: the date
    * window prunes the orders scan, the join is AQE-planned on orderkey,
    * and the conditional split costs nothing extra — both counts ride the
    * same 2-group hash aggregate. */
  def latePriorityModes(orders: DataFrame, lineitem: DataFrame,
                        start: String = "1996-01-01", end: String = "1997-01-01",
                        lagDays: Int = 60): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit(start).cast("timestamp") &&
        col("o_orderdate") < lit(end).cast("timestamp"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
      .join(lineitem.select("l_orderkey", "l_linestatus", "l_shipdate"),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lagDays DAYS"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("l_linestatus")

  /** TPC-H Q14 shape: promotion-revenue share — 100 · promo revenue /
    * total revenue over one shipdate month. Both sums are exact DECIMAL
    * accumulated in the SAME hash aggregate (the CASE puts promo rows in
    * one accumulator without a second scan or join); only the final
    * ratio is a double divide of two exact values, which IEEE 754 makes
    * engine-independent. Scale shape: date window pruned at the fact
    * scan, part joined broadcast (3 columns), zero extra shuffles —
    * the aggregate is global, so the map-side partial collapses
    * everything to one row per task. */
  def promoRevenueShare(part: DataFrame, lineitem: DataFrame,
                        start: String = "1996-09-01", end: String = "1996-10-01"): DataFrame = {
    val rev = revenue(col("l_extendedprice"), col("l_discount"))
    lineitem
      .filter(col("l_shipdate") >= lit(start).cast("timestamp") &&
        col("l_shipdate") < lit(end).cast("timestamp"))
      .select("l_partkey", "l_extendedprice", "l_discount")
      .join(broadcast(part.select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) *
          sum(when(col("p_type") === "PROMO", rev).otherwise(dec(lit(0)))).cast("double") /
          sum(rev).cast("double")).as("promo_revenue"))
  }

  /** TPC-H Q22 shape adapted (nation keys stand in for phone country
    * codes; dormancy = no orders since `cutoff`, because this fixture has
    * no order-free customers): positive-balance stats of above-average
    * customers with no recent orders. Q22's scalar subquery (the global
    * average balance) is a 1-row aggregate broadcast-cross-joined into
    * the row filter — the declarative alternative to a driver collect —
    * and the above-average compare is exact integer-scaled DECIMAL
    * (`bal·n > sum`): a double average would put boundary customers at
    * the mercy of summation order. The no-recent-orders correlation is a
    * left-anti join against the date-pruned orders scan. */
  def dormantCustomers(customer: DataFrame, orders: DataFrame,
                       nationKeys: Seq[Int] = Seq(1, 3, 5, 7, 9, 11, 13),
                       cutoff: String = "2000-01-01"): DataFrame = {
    val slice = customer.filter(col("c_nationkey").isin(nationKeys: _*))
      .select(col("c_custkey"), col("c_nationkey"), dec(col("c_acctbal")).as("bal"))
    val stats = broadcast(slice.filter(col("bal") > 0)
      .agg(sum(col("bal")).as("s"), count(lit(1)).as("n")))
    slice
      .join(orders.filter(col("o_orderdate") >= lit(cutoff).cast("timestamp"))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .crossJoin(stats)
      .filter(col("bal") * col("n") > col("s"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"),
        sum(col("bal")).cast("double").as("total_acctbal"))
      .orderBy("c_nationkey")
  }
}
