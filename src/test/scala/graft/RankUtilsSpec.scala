package graft

import graft.operators.RankUtils
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RankUtilsSpec extends SparkSpec {
  import spark.implicits._

  test("distributed global rank equals the single-partition window rank") {
    val df = (1 to 5000).map(i => (i.toLong, (i * 2654435761L % 997).toDouble))
      .toDF("id", "score").repartition(13)
    val order = Seq(col("score").desc, col("id").asc)
    val viaWindow = df
      .withColumn("rank", row_number().over(Window.orderBy(order: _*)).cast("long"))
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaUtils = RankUtils.globalRowNumber(df, order, "rank", partitions = 7)
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaUtils === viaWindow)
  }

  test("ranks are dense 1..n regardless of partition boundaries") {
    val df = (1 to 100).map(i => (i.toLong, 1.0)).toDF("id", "score") // all ties
    val ranks = RankUtils
      .globalRowNumber(df, Seq(col("score").desc, col("id").asc), "rank", partitions = 9)
      .select("rank").collect().map(_.getLong(0)).sorted
    assert(ranks.toSeq === (1L to 100L))
  }

  test("distributed running sum equals the single-partition window prefix sum") {
    val df = (1 to 5000).map(i => (i.toLong, (i * 2654435761L % 997).toDouble,
      (i * 31 % 50 + 1).toLong)).toDF("id", "score", "v").repartition(13)
    val order = Seq(col("score").desc, col("id").asc)
    val viaWindow = df
      .withColumn("cum", sum(col("v")).over(Window.orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (parts <- Seq(1, 7, 32)) {
      val viaUtils = RankUtils.globalRunningSum(df, order, col("v"), "cum", partitions = parts)
        .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaUtils === viaWindow, s"partitions=$parts")
    }
  }

  test("grouped distributed rank equals the per-group window rank") {
    val df = (1 to 5000).map { i =>
      (i.toLong, s"cat${i % 5}", (i * 2654435761L % 97).toDouble) // heavy ties
    }.toDF("id", "cat", "score").repartition(13)
    val order = Seq(col("score").desc, col("id").asc)
    val viaWindow = df
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("cat")).orderBy(order: _*)).cast("long"))
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaUtils = RankUtils
      .groupedRowNumber(df, Seq("cat"), order, "rank", partitions = 7)
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaUtils === viaWindow)
  }

  test("grouped rank treats a NULL group key as its own stratum (no dropped rows)") {
    // Window.partitionBy puts NULL keys in their own partition; the
    // replacement must too — a null-unsafe offsets join would silently
    // DROP every NULL-group row instead.
    val df = Seq(
      (1L, Option("x"), 3.0), (2L, Option("x"), 1.0),
      (3L, Option.empty[String], 9.0), (4L, Option.empty[String], 2.0)
    ).toDF("id", "cat", "score").repartition(5)
    val order = Seq(col("score").desc, col("id").asc)
    val viaWindow = df
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("cat")).orderBy(order: _*)).cast("long"))
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaUtils = RankUtils.groupedRowNumber(df, Seq("cat"), order, "rank", partitions = 3)
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaUtils.size === 4, "NULL-group rows must not vanish")
    assert(viaUtils === viaWindow)
  }

  test("rookmaster plans contain no per-category single-task rank window") {
    // The scale hazard: row_number().over(Window.partitionBy(event_type))
    // sorts each category in ONE task (parallelism = |categories|). Both
    // rookmaster queries must rank via the grouped distributed
    // construction: every WindowExec either partitions by the range
    // partition id (__pid — distributed) or computes the tiny per-group
    // offset cumsum (__offset — runs over the |groups|×|partitions|
    // offsets frame, not the data).
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    val events = sources.Tables.events(spark, "/root/testdata/sf0.001")
    for (q <- Seq(operators.Snapshots.rookmaster(events),
                  operators.Snapshots.rookmasterCategories(events))) {
      val plan = q.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val wins = plan.collect { case w: WindowExec => w }
      assert(wins.nonEmpty, "expected rank windows in the plan")
      wins.foreach { w =>
        val distributed = w.partitionSpec.exists(_.toString.contains("__pid"))
        // The offset cumsum sums the per-(group, partition) counts (__n) —
        // it runs over the tiny offsets frame, not the data.
        val offsetCumsum = w.windowExpression.exists(_.toString.contains("__n"))
        assert(distributed || offsetCumsum,
          s"single-task category window found: partitionSpec=${w.partitionSpec}")
      }
      assert(wins.exists(_.partitionSpec.exists(_.toString.contains("__pid"))),
        "expected a __pid-partitioned (distributed) rank window")
    }
  }
}
