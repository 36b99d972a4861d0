package graft

import java.sql.Timestamp

import graft.operators.OnlineTime

/** J3/J4/A2/A3 semantics: +5 minutes per sighting, per-day accumulation,
  * period rollup with latest-attribute (SURVEY.md §2.9: batch re-agg is
  * equivalent to the reference's stateful merge given one sample/tick). */
class OnlineTimeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, h: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  private lazy val samples = Seq(
    (1L, ts(1, 0), 1L, "web"), (2L, ts(1, 1), 1L, "app"), (3L, ts(1, 2), 1L, "web"),
    (4L, ts(1, 0), 2L, "app"),
    (5L, ts(2, 0), 1L, "app"), (6L, ts(2, 1), 2L, "web"), (7L, ts(2, 2), 2L, "web")
  ).toDF("event_id", "ts", "user_id", "event_type")
    .withColumn("value", org.apache.spark.sql.functions.lit(1.0))

  test("daily: 5 minutes per sighting, last event_type by event_id") {
    val d = OnlineTime.daily(samples).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getString(3)))).toMap
    assert(d(("2024-01-01", 1L)) === ((15L, "web")))
    assert(d(("2024-01-01", 2L)) === ((5L, "app")))
    assert(d(("2024-01-02", 2L)) === ((10L, "web")))
  }

  test("period rollup sums minutes and keeps latest day, composite sort order") {
    val p = OnlineTime.period(samples, 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // u1: 20 min, u2: 15 min
    assert(p === Seq((1L, 1L, 20L, "2024-01-02"), (2L, 2L, 15L, "2024-01-02")))
  }

  test("period window excludes days before the lookback") {
    val spread = Seq(
      (1L, ts(1, 0), 1L, "web"), (2L, ts(20, 0), 1L, "web")
    ).toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", org.apache.spark.sql.functions.lit(1.0))
    val p = OnlineTime.period(spread, 7).collect()
    assert(p.map(r => r.getLong(2)).toSeq === Seq(5L), "day-1 sample outside 7-day window")
  }
}
