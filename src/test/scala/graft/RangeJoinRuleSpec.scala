package graft

import java.sql.Date

import org.apache.spark.sql.functions._

/** The optimizer rewrite: a join written as the natural date BETWEEN
  * predicate must plan as the grid-cell equi-join (no nested loop), with
  * results identical to the untouched plan, and must leave non-matching
  * joins alone. */
class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.installOptimizations(spark)

  private def d(s: String) = Date.valueOf(s)

  private lazy val pts = Seq(
    (1, d("2024-01-01")), (2, d("2024-01-04")), (3, d("2024-01-19")),
    (4, d("2024-02-10")), (5, d("2024-03-01"))
  ).toDF("pid", "p")

  private lazy val ivs = Seq(
    (10, d("2024-01-02"), d("2024-01-05")),
    (11, d("2024-01-04"), d("2024-01-20")),
    (12, d("2024-03-01"), d("2024-03-01"))
  ).toDF("iv_id", "start_day", "end_day")

  private val expected = Set((2, 10), (2, 11), (3, 11), (5, 12))

  test("a natural BETWEEN join is rewritten to a nested-loop-free plan with identical results") {
    val joined = pts.join(ivs, col("p").between(col("start_day"), col("end_day")))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"rule did not fire:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    val rows = joined.select("pid", "iv_id").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(rows === expected)
  }

  test("the reversed orientation (intervals on the left) is rewritten too") {
    val joined = ivs.join(pts, col("p").between(col("start_day"), col("end_day")))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"rule did not fire:\n$plan")
    val rows = joined.select("pid", "iv_id").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(rows === expected)
    // column order of the original join output is preserved
    assert(joined.columns.toSeq === Seq("iv_id", "start_day", "end_day", "pid", "p"))
  }

  test("a broadcast hint follows its side through the reversed rewrite") {
    // intervals.join(broadcast(points)): the hint names the original RIGHT
    // side (points). The rewrite puts the point side on the LEFT, so the
    // hint must swap with it — the planned broadcast build side has to be
    // the point side, not the interval side the hint would otherwise
    // land on.
    val joined = ivs.join(broadcast(pts), col("p").between(col("start_day"), col("end_day")))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected a broadcast hash join:\n$plan")
    assert(plan.contains("BuildLeft"),
      s"hint must follow the point side to the rewritten join's left:\n$plan")
    val rows = joined.select("pid", "iv_id").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(rows === expected)
  }

  test("non-date BETWEEN joins and equi-joins are left untouched") {
    // int BETWEEN: still a nested loop (the rule is date-scoped)
    val a = Seq(1, 5, 9).toDF("x")
    val b = Seq((0, 4), (5, 9)).toDF("lo", "hi")
    val intPlan = a.join(b, col("x").between(col("lo"), col("hi")))
      .queryExecution.executedPlan.toString
    assert(intPlan.contains("BroadcastNestedLoopJoin"))
    // equi-join on dates: no Generate node injected
    val eq = pts.join(ivs, col("p") === col("start_day"))
    assert(!eq.queryExecution.executedPlan.toString.contains("Generate"))
    assert(eq.count() === 2) // 01-04 and 03-01 match start days
  }

  test("granularity is configurable per session and does not change results") {
    spark.conf.set(graft.plans.RangeJoinRule.GranularityConf, "30")
    try {
      val rows = pts.join(ivs, col("p").between(col("start_day"), col("end_day")))
        .select("pid", "iv_id").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(rows === expected)
    } finally spark.conf.unset(graft.plans.RangeJoinRule.GranularityConf)
  }

  test("null dates never match (the post-join filter keeps BETWEEN's null semantics)") {
    val withNull = pts.unionByName(
      Seq((9, Option.empty[Date])).toDF("pid", "p"))
    val rows = withNull.join(ivs, col("p").between(col("start_day"), col("end_day")))
      .select("pid", "iv_id").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(rows === expected)
  }
}
