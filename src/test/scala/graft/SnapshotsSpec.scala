package graft

import java.sql.Timestamp

import graft.operators.Snapshots

/** Edge cases from SURVEY.md §7.4 / FIXTURES.md §B: null value excluded
  * from the diff (F5), gain ≤ 0 dropped (F4), player present on one side
  * only, duplicate-free snapshot (first-match join multiplicity), dense
  * 1..n ranks with deterministic tiebreaks. */
class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, h: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  // (event_id, ts, user_id, value)
  private lazy val events = Seq(
    // day 1 snapshot: u1=100, u2=200, u3=50, u5=null-ish (no value -> skip), u6=70
    (1L, ts(1, 1), 1L, 100.0), (2L, ts(1, 2), 2L, 200.0), (3L, ts(1, 3), 3L, 50.0),
    (4L, ts(1, 4), 6L, 70.0),
    // u1 has TWO day-1 events; latest (higher event_id) wins => 100 stays
    (0L, ts(1, 5), 1L, 999.0), // lower event_id despite later wall-clock: ignored
    // day 2: u1=150 (+50), u2=190 (-10 dropped), u3=50 (0 dropped), u4 new (no day-1), u6=80 (+10)
    (10L, ts(2, 1), 1L, 150.0), (11L, ts(2, 2), 2L, 190.0), (12L, ts(2, 3), 3L, 50.0),
    (13L, ts(2, 4), 4L, 500.0), (14L, ts(2, 5), 6L, 80.0)
  ).toDF("event_id", "ts", "user_id", "value")

  test("dailySnapshot keeps latest-by-event_id value per (day,user)") {
    val snap = Snapshots.dailySnapshot(events)
    val d1 = snap.filter($"day" === "2024-01-01").collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(d1 === Map(1L -> 100.0, 2L -> 200.0, 3L -> 50.0, 6L -> 70.0))
    assert(snap.count() === 9)
  }

  test("gain: diff join drops non-positive gains and one-sided users, ranks densely") {
    val g = Snapshots.gain(events, 1).collect()
    // only u1 (+50) and u6 (+10) survive; u4 one-sided, u2/-u3 non-positive
    assert(g.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ===
      Seq((1L, 1L, 50.0), (2L, 6L, 10.0)))
  }

  test("leaderboard: value-desc rank with positional points") {
    val lb = Snapshots.leaderboard(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(lb === Seq((1L, 4L, 500.0, 1000L), (2L, 2L, 190.0, 999L),
      (3L, 1L, 150.0, 998L), (4L, 6L, 80.0, 997L), (5L, 3L, 50.0, 996L)))
  }

  test("gain(s, s) over identical snapshots is empty") {
    val oneDay = events.filter($"ts" < ts(2, 0))
    assert(Snapshots.gainAllTime(oneDay).count() === 0)
  }

  test("single(): returns the row iff exactly one exists (O8)") {
    val one = Seq((1L, 10.0)).toDF("user_id", "value")
    assert(Snapshots.single(one).getLong(0) === 1L)
    intercept[IllegalStateException] { Snapshots.single(one.limit(0)) }
    intercept[IllegalStateException] {
      Snapshots.single(Seq((1L, 1.0), (2L, 2.0)).toDF("user_id", "value"))
    }
  }

  test("rankIfMissing preserves present ranks, assigns fresh ones when absent (O4)") {
    import org.apache.spark.sql.functions.col
    // upstream ranks present (deliberately NOT value order): preserved as-is
    val ranked = Seq((7L, 10.0, 3L), (8L, 20.0, 1L), (9L, 15.0, 2L))
      .toDF("user_id", "value", "rank")
    val kept = Snapshots.rankIfMissing(ranked, Seq(col("value").desc), "rank")
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("rank")).toMap
    assert(kept === Map(7L -> 3L, 8L -> 1L, 9L -> 2L))
    // all ranks absent: fresh dense ranks under the given order
    val unranked = Seq((7L, 10.0), (8L, 20.0), (9L, 15.0))
      .toDF("user_id", "value").withColumn("rank", org.apache.spark.sql.functions.lit(null).cast("long"))
    val fresh = Snapshots.rankIfMissing(unranked, Seq(col("value").desc), "rank")
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("rank")).toMap
    assert(fresh === Map(8L -> 1L, 9L -> 2L, 7L -> 3L))
  }

  test("rankIfMissing repairs a mixed-rank frame (nulls get a fresh rank, no null output)") {
    import org.apache.spark.sql.functions.col
    val mixed = Seq((7L, 10.0, Some(5L)), (8L, 20.0, None), (9L, 15.0, Some(2L)))
      .toDF("user_id", "value", "rank")
    val out = Snapshots.rankIfMissing(mixed, Seq(col("value").desc), "rank").collect()
    assert(out.forall(!_.isNullAt(2)), "no null ranks may survive")
    val m = out.map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("rank")).toMap
    assert(m(7L) === 5L && m(9L) === 2L) // present ranks preserved
    assert(m(8L) === 1L)                 // null repaired with the fresh rank (value desc)
  }

  test("rookmaster: points accumulate across categories, ties broken by user_id") {
    val cat = Seq(
      (1L, ts(1, 1), 1L, "a", 10.0), (2L, ts(1, 1), 2L, "a", 20.0),
      (3L, ts(1, 1), 1L, "b", 30.0), (4L, ts(1, 1), 3L, "b", 30.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val rm = Snapshots.rookmaster(cat).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // cat a: u2=1000, u1=999; cat b: tie 30/30 -> u1 first (1000), u3 999
    // totals: u1=1999 (2 cats), u2=1000, u3=999
    assert(rm === Seq((1L, 1L, 1999L, 2L), (2L, 2L, 1000L, 1L), (3L, 3L, 999L, 1L)))
  }
}
