package graft

import java.sql.Date

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** The bucketized range join must be row-identical to the naive
  * range-predicate join AND must not plan a nested loop — the entire point
  * of the operator is replacing O(P·I) BroadcastNestedLoopJoin with an
  * equi-join on grid cells. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private lazy val intervals = Seq(
    (1L, d("2024-01-02"), d("2024-01-05")),   // short, within one cell
    (2L, d("2024-01-04"), d("2024-01-20")),   // spans cells, overlaps #1
    (3L, d("2024-03-01"), d("2024-03-01"))    // degenerate single day
  ).toDF("iv_id", "start_day", "end_day")

  private lazy val points = Seq(
    d("2024-01-01"), d("2024-01-02"), d("2024-01-04"), d("2024-01-05"),
    d("2024-01-06"), d("2024-01-19"), d("2024-01-21"), d("2024-03-01")
  ).toDF("p")

  test("bucketized range join equals the naive range-predicate join") {
    val fast = RangeJoin.pointInInterval(points, "p", intervals, "start_day", "end_day")
      .select("iv_id", "p").collect().map(r => (r.getLong(0), r.getDate(1).toString)).toSet
    val naive = points.crossJoin(intervals)
      .filter(col("p").between(col("start_day"), col("end_day")))
      .select("iv_id", "p").collect().map(r => (r.getLong(0), r.getDate(1).toString)).toSet
    assert(fast === naive)
    // spot-check the expected memberships
    assert(naive.contains((1L, "2024-01-02")) && naive.contains((2L, "2024-01-19")))
    assert(naive.contains((3L, "2024-03-01")) && !naive.contains((1L, "2024-01-06")))
  }

  test("the plan is an equi-join on the grid cell, not a nested loop") {
    val plan = RangeJoin.pointInInterval(points, "p", intervals, "start_day", "end_day")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
  }

  test("granularity does not change results (fanout/selectivity tradeoff only)") {
    def run(g: Int) =
      RangeJoin.pointInInterval(points, "p", intervals, "start_day", "end_day", g)
        .select("iv_id", "p").collect().map(r => (r.getLong(0), r.getDate(1).toString)).toSet
    assert(run(1) === run(7) && run(7) === run(30))
  }

  test("interval overlap equals the naive overlap join, pairs deduped across shared cells") {
    val a = Seq(
      (1L, d("2024-01-01"), d("2024-01-31")),  // long: spans many cells
      (2L, d("2024-02-10"), d("2024-02-12"))
    ).toDF("a_id", "as_day", "ae_day")
    val b = Seq(
      (10L, d("2024-01-15"), d("2024-02-11")), // overlaps BOTH (and shares several cells with #1)
      (11L, d("2024-03-01"), d("2024-03-02"))  // overlaps neither
    ).toDF("b_id", "bs_day", "be_day")
    val fast = RangeJoin.intervalOverlap(a, "as_day", "ae_day", b, "bs_day", "be_day")
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fast.length === fast.distinct.length, "no duplicate pairs from shared cells")
    val naive = a.crossJoin(b)
      .filter(col("as_day") <= col("be_day") && col("bs_day") <= col("ae_day"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fast.toSet === naive.toSet)
    assert(fast.toSet === Set((1L, 10L), (2L, 10L)))
  }

  test("interval overlap preserves legitimately duplicate input rows") {
    // Two identical interval rows on one side must each match — the naive
    // overlap join returns both. The canonical-cell emission keeps them (a
    // full-row dropDuplicates would silently collapse the pair to one row).
    val a = Seq(
      (1L, d("2024-01-01"), d("2024-01-31")),
      (1L, d("2024-01-01"), d("2024-01-31"))  // exact duplicate row
    ).toDF("a_id", "as_day", "ae_day")
    val b = Seq((10L, d("2024-01-15"), d("2024-02-11"))).toDF("b_id", "bs_day", "be_day")
    val fast = RangeJoin.intervalOverlap(a, "as_day", "ae_day", b, "bs_day", "be_day")
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = a.crossJoin(b)
      .filter(col("as_day") <= col("be_day") && col("bs_day") <= col("ae_day"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fast.sorted.toSeq === naive.sorted.toSeq)
    assert(fast.length === 2, "both duplicate intervals must surface")
  }

  test("shipWindowCounts keeps zero-match intervals and is exactly topN rows") {
    val orders = Seq(
      (10L, 900.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (11L, 800.0, java.sql.Timestamp.valueOf("2024-02-01 00:00:00")),
      (12L, 700.0, java.sql.Timestamp.valueOf("2030-01-01 00:00:00")) // no ships
    ).toDF("o_orderkey", "o_totalprice", "o_orderdate")
    val lineitem = Seq(
      java.sql.Timestamp.valueOf("2024-01-03 00:00:00"),
      java.sql.Timestamp.valueOf("2024-01-14 00:00:00"), // inside 14d window of #10
      java.sql.Timestamp.valueOf("2024-01-15 00:00:00"), // outside (day 15 of window)
      java.sql.Timestamp.valueOf("2024-02-05 00:00:00")
    ).toDF("l_shipdate")
    val out = RangeJoin.shipWindowCounts(orders, lineitem, topN = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq === Seq((10L, 2L), (11L, 1L), (12L, 0L)))
  }
}
