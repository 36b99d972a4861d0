package graft

import graft.operators.Snapshots
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** In-flight pipeline instrumentation via Dataset.observe: metrics ride
  * the existing action instead of costing extra passes — at 100 TB a
  * separate count() for monitoring doubles the scan bill. */
class ObserveMetricsSpec extends SparkSpec {

  test("observe collects row/value metrics on the snapshot pipeline for free") {
    val events = sources.Tables.events(spark, "/root/testdata/sf0.001")
    val obs = new Observation("ingest")
    val snap = Snapshots.dailySnapshot(
      events.observe(obs,
        count(lit(1)).as("rows_in"),
        count(when(col("value").isNull, 1)).as("null_values")))
    val outRows = snap.count() // the one real action; metrics piggyback
    val m = obs.get
    assert(m("rows_in") === 1000L)
    assert(m("null_values") === 0L)
    assert(outRows > 0)
  }
}
