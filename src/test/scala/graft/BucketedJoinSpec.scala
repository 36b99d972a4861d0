package graft

import graft.sinks.Bucketing
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Co-located join via bucketing: both fact tables bucketed+sorted on the
  * join key -> the join plans with zero shuffle exchanges and matches the
  * shuffled join row-for-row. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed orders ⋈ lineitem is shuffle-free and row-identical") {
    val dir = "/root/testdata/sf0.001"
    val orders = sources.Tables.orders(spark, dir)
    val lineitem = sources.Tables.lineitem(spark, dir)

    Bucketing.writeBucketed(orders, "orders_b", 8, "o_orderkey")
    Bucketing.writeBucketed(lineitem, "lineitem_b", 8, "l_orderkey")

    // disable broadcast so the colocated sort-merge path is what's tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = Bucketing.bucketedJoin(spark, "orders_b", "lineitem_b", "o_orderkey", "l_orderkey")
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      val executed = j.queryExecution.executedPlan
      val bucketed = j.collect().map(r => (r.getLong(0), r.getLong(1))).toMap // finalizes AQE
      // AQE query stages hide their subtrees from collect(); the rendered
      // plan string sees through them.
      val planStr = executed match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(planStr.contains("SortMergeJoin"), s"expected a sort-merge join, got:\n$planStr")
      assert(planStr.contains("Bucketed: true"), "scans should read the bucket layout")
      assert(!planStr.contains("Exchange"),
        s"bucketed join (and even the groupBy on the same key) should be shuffle-free:\n$planStr")

      // row parity with the plain shuffled join
      val plain = orders.join(lineitem, orders("o_orderkey") === lineitem("l_orderkey"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(bucketed === plain)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
