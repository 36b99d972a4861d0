package graft

import java.sql.Timestamp

import graft.operators.StarSchema
import org.apache.spark.sql.functions._

/** Edge semantics of the round-6 TPC-H shapes (Q13/Q17/Q18/Q21/Q22) on
  * hand-built fixtures — the oracle gate proves parity on the generated
  * corpus; these pin the boundary behaviors the corpus may never sample
  * (zero-order customers, exact-average balances, single-supplier
  * orders), so a refactor can't regress an edge the gate is blind to.
  */
class StarShapesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("q13 keeps the zero-order bucket and excludes only the filtered priority") {
    // c1: two qualifying orders; c2: only an excluded-priority order
    // (counts as ZERO, not dropped); c3: no orders at all.
    val customer = Seq(1L, 2L, 3L).toDF("c_custkey")
    val orders = Seq(
      (10L, 1L, "2-HIGH"), (11L, 1L, "5-LOW"), (12L, 2L, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val got = StarSchema.customerOrderDistribution(customer, orders)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // two customers (c2, c3) in the 0 bucket, one (c1) in the 2 bucket
    assert(got === Map(0L -> 2L, 2L -> 1L))
  }

  test("q17 small-quantity cut is exact at the 0.2*avg boundary") {
    // Part 1: quantities (1, 4, 5) → sum 10, cnt 3. qty*5*cnt < sum means
    // qty*15 < 10 — nothing qualifies, INCLUDING qty=1 (15 > 10): the
    // strict inequality matches Q17's `<`. Part 2: (1, 9, 10, 30) → sum
    // 50, cnt 4: qty*20 < 50 only for qty=1 (20 < 50); qty=2.5 would be
    // the boundary. A single-line part can never qualify (qty*5 < qty is
    // false for positive qty).
    val lineitem = Seq(
      (1L, 1.0, 100.0), (1L, 4.0, 100.0), (1L, 5.0, 100.0),
      (2L, 1.0, 7.0), (2L, 9.0, 100.0), (2L, 10.0, 100.0), (2L, 30.0, 100.0),
      (3L, 2.0, 100.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val part = Seq((1L, "B1"), (2L, "B2"), (3L, "B3")).toDF("p_partkey", "p_brand")
    val got = StarSchema.smallQuantityRevenue(part, lineitem)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got === Map("B2" -> 1.0)) // only part 2's qty=1 line: 7.0 / 7.0
  }

  test("q18 HAVING threshold is strict and the join-back keeps order detail") {
    val lineitem = Seq(
      (10L, 150.0), (10L, 51.0),  // order 10: 201 > 200 qualifies
      (11L, 200.0),               // order 11: exactly 200 does NOT (strict >)
      (12L, 300.0))               // order 12: qualifies
      .toDF("l_orderkey", "l_quantity")
    val orders = Seq(
      (10L, 1L, ts("1996-01-01"), 500.0),
      (11L, 1L, ts("1996-01-02"), 900.0),
      (12L, 2L, ts("1996-01-03"), 700.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val customer = Seq((1L, "alice"), (2L, "bob")).toDF("c_custkey", "c_name")
    val got = StarSchema.largeOrders(customer, orders, lineitem)
      .select("o_orderkey", "c_name", "total_qty")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // ordered by o_totalprice desc: order 12 (700) before order 10 (500)
    assert(got.toSeq === Seq((12L, "bob", 300.0), (10L, "alice", 201.0)))
  }

  test("q21 blames exactly the sole late supplier of multi-supplier F orders") {
    val orders = Seq(
      (1L, "F", ts("1996-01-01")), // multi-supplier, s1 alone late → blame s1
      (2L, "F", ts("1996-01-01")), // two suppliers BOTH late → nobody blamed
      (3L, "F", ts("1996-01-01")), // single-supplier, late → no other supplier, skipped
      (4L, "O", ts("1996-01-01"))) // not finished → excluded entirely
      .toDF("o_orderkey", "o_orderstatus", "o_orderdate")
    val late = ts("1996-06-01"); val onTime = ts("1996-01-15")
    val lineitem = Seq(
      (1L, 101L, late), (1L, 101L, late), // duplicate late lines count ONCE
      (1L, 102L, onTime),
      (2L, 101L, late), (2L, 103L, late),
      (3L, 104L, late),
      (4L, 105L, late))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val supplier = Seq((101L, "s101"), (102L, "s102"), (103L, "s103"),
      (104L, "s104"), (105L, "s105")).toDF("s_suppkey", "s_name")
    val got = StarSchema.waitingSuppliers(supplier, orders, lineitem)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("s101", 1L)))
  }

  test("q22 above-average compare is exact and excludes the boundary customer") {
    // Positive balances 10.00 and 20.00 → avg 15.00 exactly. A customer
    // AT 15.00 must be excluded (strict >) — under double summation the
    // average could land a ulp below and let the boundary customer leak
    // in; the decimal bal*n > sum compare cannot.
    val customer = Seq(
      (1L, 1, 10.00), (2L, 1, 20.00), (3L, 3, 15.00), (4L, 5, -5.00))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
    val orders = Seq((100L, 2L, ts("2001-05-01")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val got = StarSchema.dormantCustomers(customer, orders,
        nationKeys = Seq(1, 3, 5), cutoff = "2000-01-01")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    // c2 (20.00 > 15.00) is above average but ordered recently → dropped
    // by the anti join; c3 is exactly average → strict compare drops it;
    // c4 is negative → below average. Nobody qualifies... except nobody:
    assert(got.isEmpty)
    // drop the recent order and c2 alone qualifies
    val noOrders = Seq.empty[(Long, Long, Timestamp)]
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val got2 = StarSchema.dormantCustomers(customer, noOrders,
        nationKeys = Seq(1, 3, 5), cutoff = "2000-01-01")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got2.toSeq === Seq((1, 1L, 20.00)))
  }

  test("q19 envelope is the exact union of the disjunct bands") {
    // A quantity of 12 is inside the envelope [1,30] but outside every
    // band for Brand#12 (1-11): the residual must drop it even though the
    // envelope admits it — envelope ⊃ disjunction, never a substitute.
    val part = Seq((1L, "Brand#12", 10), (2L, "Brand#23", 20))
      .toDF("p_partkey", "p_brand", "p_size")
    val lineitem = Seq(
      (1L, 11.0, 100.0, 0.0), // Brand#12 band edge (11 ≤ 11) → kept
      (1L, 12.0, 100.0, 0.0), // inside envelope, outside band → dropped
      (2L, 10.0, 50.0, 0.0),  // Brand#23 band edge (10 ≥ 10) → kept
      (2L, 31.0, 999.0, 0.0)) // outside envelope → dropped at the scan
      .toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val got = StarSchema.disjunctiveRevenue(part, lineitem)
      .collect().head.getDouble(0)
    assert(got === 150.0)
  }

  test("q6 discount band is inclusive at both ends, quantity cut is strict") {
    val in = ts("1996-06-01")
    val lineitem = Seq(
      (in, 0.05, 10.0, 100.0),          // lower band edge → kept
      (in, 0.07, 10.0, 100.0),          // upper band edge → kept
      (in, 0.04, 10.0, 999.0),          // below band → dropped
      (in, 0.08, 10.0, 999.0),          // above band → dropped
      (in, 0.06, 24.0, 999.0),          // quantity AT the cap → dropped (strict <)
      (in, 0.06, 23.0, 100.0),          // under the cap → kept
      (ts("1997-01-01"), 0.06, 1.0, 999.0)) // window end is exclusive → dropped
      .toDF("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
    val got = StarSchema.forecastRevenue(lineitem).collect().head.getDouble(0)
    // 100·0.05 + 100·0.07 + 100·0.06 = 18.0
    assert(got === 18.0)
  }

  test("q12 counts only LATE lines and splits them by priority, not by volume") {
    val orders = Seq(
      (1L, ts("1996-02-01"), "1-URGENT"),
      (2L, ts("1996-03-01"), "5-LOW"),
      (3L, ts("1997-06-01"), "1-URGENT")) // outside the order-date window
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val lineitem = Seq(
      (1L, "F", ts("1996-05-01")),  // late (89 days > 60) → high bucket
      (1L, "F", ts("1996-02-15")),  // on time → counts NOWHERE
      (2L, "F", ts("1996-06-01")),  // late → low bucket
      (2L, "O", ts("1996-08-01")),  // late, other status → low bucket of O
      (3L, "F", ts("1997-12-01")))  // late but order outside window → dropped
      .toDF("l_orderkey", "l_linestatus", "l_shipdate")
    val got = StarSchema.latePriorityModes(orders, lineitem)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(("F", 1L, 1L), ("O", 0L, 1L)))
  }

  test("q11 share threshold is strict at the exact fraction boundary") {
    // Values 1.00 and 999.00 → total 1000.00 with fractionDen=1000:
    // part A sits EXACTLY at value·1000 = total and must be excluded
    // (strict >, the textbook Q11 comparison); B clears it.
    val lineitem = Seq(
      (1L, 1L, 1.0), (2L, 1L, 999.0),
      (3L, 9L, 500.0)) // other-nation supplier → out of scope entirely
      .toDF("l_partkey", "l_suppkey", "l_extendedprice")
    val supplier = Seq((1L, 3), (9L, 9)).toDF("s_suppkey", "s_nationkey")
    val nation = Seq((3, "NATION_3"), (9, "NATION_9")).toDF("n_nationkey", "n_name")
    val got = StarSchema.importantParts(lineitem, supplier, nation)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got === Array((2L, 999.0)))
  }

  test("q15 keeps ALL suppliers tied at the exact maximum revenue") {
    // s1 and s2 both total 200.00 in-window (via different row splits —
    // the DECIMAL sum makes the tie exact, which a double sum could
    // break by addition order); s3 trails; s4's revenue is out-of-window.
    val lineitem = Seq(
      (1L, 200.0, 0.0, ts("1996-02-01")),
      (2L, 100.0, 0.0, ts("1996-02-01")), (2L, 100.0, 0.0, ts("1996-03-01")),
      (3L, 199.0, 0.0, ts("1996-02-01")),
      (4L, 999.0, 0.0, ts("1996-04-01")))
      .toDF("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    val supplier = Seq((1L, "s1"), (2L, "s2"), (3L, "s3"), (4L, "s4"))
      .toDF("s_suppkey", "s_name")
    val got = StarSchema.topSupplier(supplier, lineitem)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got === Array((1L, "s1", 200.0), (2L, "s2", 200.0)))
  }

  test("q8 market share is 0.0 (not NULL) in years the target nation supplied nothing") {
    val region = Seq((0, "ASIA"), (1, "EUROPE")).toDF("r_regionkey", "r_name")
    val nation = Seq((3, "NATION_3", 0), (5, "NATION_5", 0), (7, "NATION_7", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val customer = Seq((1L, 3), (2L, 7)).toDF("c_custkey", "c_nationkey")
    val supplier = Seq((10L, 3), (11L, 5)).toDF("s_suppkey", "s_nationkey")
    val part = Seq((100L, "PROMO"), (101L, "LARGE")).toDF("p_partkey", "p_type")
    val orders = Seq(
      (1000L, 1L, ts("1996-05-01")),  // ASIA customer, 1996
      (1001L, 1L, ts("1997-05-01")),  // ASIA customer, 1997
      (1002L, 2L, ts("1996-06-01")))  // EUROPE customer → out of scope
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val lineitem = Seq(
      (1000L, 100L, 10L, 100.0, 0.0), // 1996, target nation supplies all
      (1000L, 101L, 11L, 999.0, 0.0), // non-PROMO part → out of scope
      (1001L, 100L, 11L, 50.0, 0.0),  // 1997, only the OTHER nation → share 0
      (1002L, 100L, 10L, 999.0, 0.0)) // EUROPE order → out of scope
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    val got = StarSchema.marketShare(part, lineitem, orders, customer, supplier,
        nation, region)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got === Map(1996L -> 1.0, 1997L -> 0.0))
  }
}
