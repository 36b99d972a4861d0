package graft

import java.sql.Timestamp

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

/** As-of join semantics: inclusive latest-at-or-before match, ASOF-LEFT
  * null for rows with no prior right row, equality with the naive
  * per-left-row argmax formulation. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, 100L, t("2024-01-01 10:00:00")), // before any right row -> null
    (1L, 101L, t("2024-01-01 12:00:00")), // exactly at a right ts -> inclusive
    (1L, 102L, t("2024-01-01 23:00:00")), // after two -> latest wins
    (2L, 200L, t("2024-01-01 12:00:00"))  // other key: isolated state
  ).toDF("k", "lid", "ts")

  private lazy val right = Seq(
    (1L, t("2024-01-01 12:00:00"), 10.0),
    (1L, t("2024-01-01 15:00:00"), 20.0),
    (2L, t("2024-01-01 11:00:00"), 99.0),
    (3L, t("2024-01-01 00:00:00"), 7.0)   // key absent on the left: ignored
  ).toDF("k", "rts", "v")

  test("latest at-or-before semantics, inclusive, with ASOF-LEFT nulls") {
    val out = AsofJoin.asofJoin(left, right, "k", "ts", "rts", Seq("v")).collect()
      .map(r => r.getLong(1) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out === Map(
      100L -> None,
      101L -> Some(10.0),
      102L -> Some(20.0),
      200L -> Some(99.0)))
  }

  test("equals the naive per-left-row argmax on a pseudo-random fixture") {
    val l = (1 to 300).map { i =>
      (i % 7L, i.toLong, t(f"2024-01-01 ${i % 24}%02d:${(i * 13) % 60}%02d:00"))
    }.toDF("k", "lid", "ts")
    val r = (1 to 150).map { i =>
      ((i * 3) % 7L, t(f"2024-01-01 ${(i * 5) % 24}%02d:${(i * 29) % 60}%02d:30"), i * 1.0)
    }.toDF("k", "rts", "v")
      // uniqueness requirement: one row per (k, rts)
      .groupBy("k", "rts").agg(max(col("v")).as("v"))
    val fast = AsofJoin.asofJoin(l, r, "k", "ts", "rts", Seq("v")).collect()
      .map(x => x.getLong(1) -> Option(x.get(3))).toMap
    val naive = l.join(r, l("k") === r("k") && col("ts") >= col("rts"), "left_outer")
      .groupBy(l("k"), col("lid"))
      .agg(max_by(col("v"), col("rts")).as("v"))
      .collect().map(x => x.getLong(1) -> Option(x.get(2))).toMap
    assert(fast === naive)
  }

  test("a NULL value in the true as-of row stays NULL (no stale substitution or stitching)") {
    // ASOF semantics attach the latest right ROW; per-column ignoreNulls
    // carry would skip its NULL field and leak an older value — or stitch
    // fields of different rows when several value columns are carried.
    val r = Seq(
      (1L, t("2024-01-01 10:00:00"), Option(5.0), Option(50.0)),
      (1L, t("2024-01-01 12:00:00"), Option.empty[Double], Option(70.0))
    ).toDF("k", "rts", "a", "b")
    val l = Seq((1L, 500L, t("2024-01-01 13:00:00"))).toDF("k", "lid", "ts")
    val out = AsofJoin.asofJoin(l, r, "k", "ts", "rts", Seq("a", "b")).collect().head
    assert(out.isNullAt(3), "latest row's NULL field must surface as NULL")
    assert(out.getDouble(4) === 70.0, "both fields come from the SAME (latest) right row")
  }

  test("reserved internal column names are rejected, not silently clobbered") {
    val l = left.withColumnRenamed("lid", "__tag")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(l, right, "k", "ts", "rts", Seq("v"))
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("the plan has no nested loop (union + window, not a theta join)") {
    val plan = AsofJoin.asofJoin(left, right, "k", "ts", "rts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("native exec matches the composed operator on the semantic fixtures") {
    val out = AsofJoin.asofJoinNative(left, right, "k", "ts", "rts", Seq("v")).collect()
      .map(r => r.getLong(1) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out === Map(
      100L -> None,
      101L -> Some(10.0),
      102L -> Some(20.0),
      200L -> Some(99.0)))
    // NULL value in the as-of row stays NULL; sibling field from SAME row
    val r2 = Seq(
      (1L, t("2024-01-01 10:00:00"), Option(5.0), Option(50.0)),
      (1L, t("2024-01-01 12:00:00"), Option.empty[Double], Option(70.0))
    ).toDF("k", "rts", "a", "b")
    val l2 = Seq((1L, 500L, t("2024-01-01 13:00:00"))).toDF("k", "lid", "ts")
    val row = AsofJoin.asofJoinNative(l2, r2, "k", "ts", "rts", Seq("a", "b")).collect().head
    assert(row.isNullAt(3) && row.getDouble(4) === 70.0)
  }

  test("native exec equals the composed operator on a pseudo-random fixture, any partitioning") {
    val l = (1 to 300).map { i =>
      (i % 7L, i.toLong, t(f"2024-01-01 ${i % 24}%02d:${(i * 13) % 60}%02d:00"))
    }.toDF("k", "lid", "ts")
    val r = (1 to 150).map { i =>
      ((i * 3) % 7L, t(f"2024-01-01 ${(i * 5) % 24}%02d:${(i * 29) % 60}%02d:30"), i * 1.0)
    }.toDF("k", "rts", "v")
      .groupBy("k", "rts").agg(max(col("v")).as("v"))
    def result(lf: org.apache.spark.sql.DataFrame) =
      AsofJoin.asofJoinNative(lf, r, "k", "ts", "rts", Seq("v")).collect()
        .map(x => x.getLong(1) -> Option(x.get(3))).toMap
    val composed = AsofJoin.asofJoin(l, r, "k", "ts", "rts", Seq("v")).collect()
      .map(x => x.getLong(1) -> Option(x.get(3))).toMap
    assert(result(l.repartition(13)) === composed)
    assert(result(l.coalesce(1)) === composed)
  }

  test("native exec plans one exchange + sort per side: no window, no union") {
    val plan = AsofJoin.asofJoinNative(left, right, "k", "ts", "rts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"custom exec missing from:\n$plan")
    assert(!plan.contains("WindowExec") && !plan.contains("Window "),
      s"native path must not fall back to the window formulation:\n$plan")
    assert(!plan.contains("Union"), s"native path must not union the sides:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }
}
