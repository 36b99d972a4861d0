package graft

import graft.functions.SnapshotJson
import org.apache.spark.sql.functions.col

/** X3 blob compatibility: legacy JSON-document leaderboards explode to
  * rows and re-serialize; malformed payloads are dropped (F6). */
class SnapshotJsonSpec extends SparkSpec {
  import spark.implicits._

  private val blob =
    """[{"rank":1,"name":"alice","level":30,"value":1000,"world":"W1","vocation":"None"},
      | {"rank":2,"name":"bob","level":20,"value":500,"world":"W1","vocation":"Knight"}]""".stripMargin

  test("blob explodes to one row per entry, malformed rows dropped") {
    val docs = Seq(("2024-01-01", blob), ("2024-01-02", "not json")).toDF("date", "data")
    val rows = SnapshotJson.explodeBlob(docs)
    assert(rows.count() === 2)
    val alice = rows.filter(col("name") === "alice").collect().head
    assert(alice.getAs[Long]("value") === 1000L)
    assert(alice.getAs[String]("date") === "2024-01-01")
  }

  test("rows round-trip back into a parseable blob") {
    val docs = Seq(("2024-01-01", blob)).toDF("date", "data")
    val back = SnapshotJson.toBlob(SnapshotJson.explodeBlob(docs), Seq("date"))
    assert(back.count() === 1)
    val reParsed = SnapshotJson.explodeBlob(back)
    assert(reParsed.count() === 2)
    assert(reParsed.filter(col("name") === "bob").collect().head.getAs[Long]("value") === 500L)
  }

  test("shape guard flags invalid payloads") {
    val df = Seq(blob, "{}", "42").toDF("data")
      .withColumn("ok", SnapshotJson.validBlob(col("data")))
    assert(df.collect().map(_.getBoolean(1)).toSeq === Seq(true, false, false))
  }
}
