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
