package graft

import java.sql.Timestamp

import graft.operators.EventsAnalytics

class EventsAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize splits on gaps > 30 min, aggregates bounds and values") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 10.0),
      (2L, ts("2024-01-01 10:20:00"), 1L, 5.0),   // same session (20 min)
      (3L, ts("2024-01-01 10:50:01"), 1L, 2.0),   // 30m01s gap -> new session
      (4L, ts("2024-01-01 09:00:00"), 2L, 1.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val s = EventsAnalytics.sessionize(ev).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getString(3), r.getDouble(5))))
      .toMap
    assert(s((1L, 1L)) === ((2L, "2024-01-01 10:00:00", 15.0)))
    assert(s((1L, 2L)) === ((1L, "2024-01-01 10:50:01", 2.0)))
    assert(s((2L, 1L)) === ((1L, "2024-01-01 09:00:00", 1.0)))
  }

  test("sessionize: exactly 30-minute gap stays in the same session") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 1.0),
      (2L, ts("2024-01-01 10:30:00"), 1L, 1.0)
    ).toDF("event_id", "ts", "user_id", "value")
    assert(EventsAnalytics.sessionize(ev).count() === 1)
  }

  test("asof carry-forward: NULL before first marker, sticky afterwards") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
      (2L, ts("2024-01-01 10:01:00"), 1L, "purchase", 42.0),
      (3L, ts("2024-01-01 10:02:00"), 1L, "view", 2.0),
      (4L, ts("2024-01-01 10:03:00"), 1L, "purchase", 99.0),
      (5L, ts("2024-01-01 10:04:00"), 1L, "error", 3.0),
      (6L, ts("2024-01-01 10:00:30"), 2L, "view", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val m = EventsAnalytics.asofCarryForward(ev).collect()
      .map(r => r.getLong(0) -> Option(r.get(4)).map(_.asInstanceOf[Double])).toMap
    assert(m(1L) === None)
    assert(m(2L) === Some(42.0))
    assert(m(3L) === Some(42.0))
    assert(m(4L) === Some(99.0))
    assert(m(5L) === Some(99.0))
    assert(m(6L) === None, "other users' markers don't leak")
  }
}
