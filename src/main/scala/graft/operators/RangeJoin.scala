package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join — an operator Spark has no native physical
  * strategy for (a raw `point BETWEEN start AND end` join condition plans
  * as BroadcastNestedLoopJoin: every point row tested against every
  * interval, O(P·I) work and a broadcast of a whole side).
  *
  * Re-expressed Spark-first via grid bucketization (the standard interval
  * bucketing composition, cf. the range-join optimizations in other
  * engines): both sides map onto a `granularityDays` grid, an interval
  * spanning b grid cells emits b rows (bounded, small fanout), the join
  * becomes a plain equi-join on the cell key — shuffle-partitioned,
  * AQE-planned, broadcastable when one side is small — and the exact
  * range predicate filters within cells. O(P + I·b + matches-per-cell)
  * instead of O(P·I); no nested-loop anywhere.
  */
object RangeJoin {

  private val Epoch = to_date(lit("1970-01-01"))

  private def bucketOf(c: Column, granularityDays: Int): Column =
    floor(datediff(c, Epoch) / granularityDays)

  /** Join `points` (date column `pointCol`) to every interval in
    * `intervals` (`[startCol, endCol]`, inclusive) containing it.
    * `granularityDays` trades interval fanout (span/granularity rows per
    * interval) against cell selectivity (points sharing a cell with
    * non-matching intervals); set it near the typical interval length. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      granularityDays: Int = 7): DataFrame = {
    val pb = points.withColumn("__cell", bucketOf(col(pointCol), granularityDays))
    val ib = intervals.withColumn("__cell",
      explode(sequence(
        bucketOf(col(startCol), granularityDays),
        bucketOf(col(endCol), granularityDays))))
    pb.join(ib, Seq("__cell"))
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__cell")
  }

  /** Interval-overlap join — the two-sided sibling of [[pointInInterval]]:
    * every (left, right) pair whose [start, end] ranges intersect
    * (`l.start <= r.end AND r.start <= l.end`). Both sides explode over
    * their spanned grid cells; overlapping intervals share at least one
    * cell, so the equi-join on the cell finds every candidate
    * (candidate-bounded — span/granularity rows per pair, not |L|·|R|).
    * A pair spanning several shared cells would appear once per cell, so
    * each pair is emitted from exactly ONE canonical cell — the later of
    * the two start cells, which is always the FIRST cell both sides share.
    * That keeps the operator exact on duplicate input rows (a full-row
    * dropDuplicates would collapse two identical intervals into one match,
    * diverging from the naive overlap join) and costs no extra shuffle. */
  def intervalOverlap(left: DataFrame, ls: String, le: String,
                      right: DataFrame, rs: String, re: String,
                      granularityDays: Int = 7): DataFrame = {
    val lb = left.withColumn("__cell",
      explode(sequence(bucketOf(col(ls), granularityDays), bucketOf(col(le), granularityDays))))
    val rb = right.withColumn("__cell",
      explode(sequence(bucketOf(col(rs), granularityDays), bucketOf(col(re), granularityDays))))
    lb.join(rb, Seq("__cell"))
      .filter(col(ls) <= col(re) && col(rs) <= col(le))
      .filter(col("__cell") ===
        greatest(bucketOf(col(ls), granularityDays), bucketOf(col(rs), granularityDays)))
      .drop("__cell")
  }

  /** Fixture query: overlap degree of the top-`topN` order windows — for
    * each window, how many OTHER top windows intersect it. Exercises
    * [[intervalOverlap]] end-to-end with a deterministic oracle. */
  def windowOverlapCounts(orders: DataFrame, topN: Int = 100, windowDays: Int = 14): DataFrame = {
    val ivals = orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc).limit(topN)
      .select(col("o_orderkey"),
        to_date(col("o_orderdate")).as("s"),
        date_add(to_date(col("o_orderdate")), windowDays - 1).as("e"))
    val other = ivals.select(col("o_orderkey").as("b_key"), col("s").as("bs"), col("e").as("be"))
    val counts = intervalOverlap(ivals, "s", "e", other, "bs", "be")
      .filter(col("o_orderkey") =!= col("b_key"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_overlaps"))
    ivals.join(counts, Seq("o_orderkey"), "left_outer")
      .select(col("o_orderkey"),
        date_format(col("s"), "yyyy-MM-dd").as("start_day"),
        coalesce(col("n_overlaps"), lit(0L)).as("n_overlaps"))
      .orderBy("o_orderkey")
  }

  /** Fixture query: for the top-`topN` orders by total price, how many
    * lineitem shipments (any order) fell inside that order's
    * `windowDays`-day window from its order date. Zero-match intervals
    * are kept (left join back), so the output is exactly `topN` rows. */
  def shipWindowCounts(orders: DataFrame, lineitem: DataFrame,
                       topN: Int = 200, windowDays: Int = 14): DataFrame = {
    val ivals = orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc).limit(topN)
      .select(col("o_orderkey"),
        to_date(col("o_orderdate")).as("start_day"),
        date_add(to_date(col("o_orderdate")), windowDays - 1).as("end_day"))
    val pts = lineitem.select(to_date(col("l_shipdate")).as("ship_day"))
    val counts = pointInInterval(pts, "ship_day", ivals, "start_day", "end_day")
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_shipped"))
    ivals
      .join(counts, Seq("o_orderkey"), "left_outer")
      .select(col("o_orderkey"),
        date_format(col("start_day"), "yyyy-MM-dd").as("start_day"),
        coalesce(col("n_shipped"), lit(0L)).as("n_shipped"))
      .orderBy("o_orderkey")
  }
}
