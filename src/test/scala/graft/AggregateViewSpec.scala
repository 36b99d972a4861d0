package graft

import java.nio.file.Files

import graft.sinks.VersionedStore
import graft.streaming.AggregateView
import org.apache.spark.sql.functions.{col, lit}

/** The incrementally maintained aggregate view: delta-combine equals a
  * full recompute, replays are exactly-once through the table ledger,
  * and NULL group keys fail loudly instead of forking groups. */
class AggregateViewSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-aggview").toString

  private def rows(day: String, pairs: (String, Long)*) =
    pairs.map { case (t, v) => (day, t, v) }.toDF("day", "event_type", "v")

  test("incremental maintenance equals full recompute across three batches") {
    val view = tmp()
    val b0 = rows("2024-01-01", "click" -> 10L, "click" -> 5L, "view" -> 1L)
    val b1 = rows("2024-01-01", "click" -> 7L, "scroll" -> 2L)
    val b2 = rows("2024-01-02", "view" -> 3L)
    AggregateView.applyBatch(b0, 0L, view, Seq("day", "event_type"), Seq("v"))
    AggregateView.applyBatch(b1, 1L, view, Seq("day", "event_type"), Seq("v"))
    AggregateView.applyBatch(b2, 2L, view, Seq("day", "event_type"), Seq("v"))
    // NOTE: the view partitions by day, and partition-value inference
    // reads the string day back as DATE — compare via toString.
    val got = VersionedStore.read(spark, view).get
      .select("day", "event_type", "n_rows", "sum_v")
      .orderBy("day", "event_type")
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getLong(3)))
    val expect = b0.unionByName(b1).unionByName(b2)
      .groupBy("day", "event_type")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_rows"),
        org.apache.spark.sql.functions.sum(col("v")).as("sum_v"))
      .orderBy("day", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expect.toSeq,
      "delta-combined view must equal the batch GROUP BY over the union")
    // the view advanced one version per batch: commit + 2 merges
    assert(VersionedStore.currentVersion(spark, view) === 3L)
  }

  test("replayed batches are exactly-once: no double-add, before or after later batches") {
    val view = tmp()
    val b0 = rows("2024-01-01", "click" -> 10L)
    val b1 = rows("2024-01-01", "click" -> 7L)
    AggregateView.applyBatch(b0, 0L, view, Seq("day", "event_type"), Seq("v"))
    AggregateView.applyBatch(b0, 0L, view, Seq("day", "event_type"), Seq("v")) // replay
    AggregateView.applyBatch(b1, 1L, view, Seq("day", "event_type"), Seq("v"))
    AggregateView.applyBatch(b0, 0L, view, Seq("day", "event_type"), Seq("v")) // stale replay
    AggregateView.applyBatch(b1, 1L, view, Seq("day", "event_type"), Seq("v")) // replay
    val r = VersionedStore.read(spark, view).get.collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n_rows") === 2L, "two real rows, however many replays")
    assert(r.head.getAs[Long]("sum_v") === 17L)
  }

  test("min/max compose grow-only across batches; avg derives at read as sum/count") {
    val view = tmp()
    def apply(b: org.apache.spark.sql.DataFrame, id: Long): Unit =
      AggregateView.applyBatch(b, id, view, Seq("day", "event_type"), Seq("v"),
        minCols = Seq("v"), maxCols = Seq("v"))
    apply(rows("2024-01-01", "click" -> 10L, "click" -> 4L), 0L)
    apply(rows("2024-01-01", "click" -> 7L, "click" -> 12L), 1L)
    // all-NULL delta: least/greatest skip NULLs, so extrema never regress
    apply(Seq(("2024-01-01", "click", Option.empty[Long]))
      .toDF("day", "event_type", "v"), 2L)
    val got = AggregateView.avgAt(
      VersionedStore.read(spark, view).get, Seq("v")).collect().head
    assert(got.getAs[Long]("n_rows") === 5L)
    assert(got.getAs[Long]("sum_v") === 33L)
    assert(got.getAs[Long]("min_v") === 4L, "min must survive later batches and NULL deltas")
    assert(got.getAs[Long]("max_v") === 12L, "max must grow across batches")
    assert(got.getAs[Double]("avg_v") === 33.0 / 5, "avg = sum/count at read")
    // full-recompute equivalence for every aggregate
    val all = rows("2024-01-01", "click" -> 10L, "click" -> 4L,
      "click" -> 7L, "click" -> 12L)
    val exp = all.groupBy("day", "event_type")
      .agg(org.apache.spark.sql.functions.min(col("v")).as("mn"),
        org.apache.spark.sql.functions.max(col("v")).as("mx")).collect().head
    assert(got.getAs[Long]("min_v") === exp.getAs[Long]("mn"))
    assert(got.getAs[Long]("max_v") === exp.getAs[Long]("mx"))
  }

  test("an all-NULL-valued delta never overwrites an accumulated sum with NULL") {
    val view = tmp()
    AggregateView.applyBatch(rows("2024-01-01", "click" -> 10L), 0L, view,
      Seq("day", "event_type"), Seq("v"))
    // A batch whose every v is NULL for the group: sum(v) delta is NULL,
    // and the combine's full-row MERGE replace would corrupt the view to
    // NULL without the delta-side coalesce. Also a NEW key seen only with
    // NULL values: its sum lands as 0 (declared null-as-zero semantics).
    val nullBatch = Seq(
      ("2024-01-01", "click", Option.empty[Long]),
      ("2024-01-01", "scroll", Option.empty[Long])).toDF("day", "event_type", "v")
    AggregateView.applyBatch(nullBatch, 1L, view, Seq("day", "event_type"), Seq("v"))
    val got = VersionedStore.read(spark, view).get
      .select("event_type", "n_rows", "sum_v").orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("click", 2L, 10L), ("scroll", 1L, 0L)),
      "NULL deltas add zero; they never null out the accumulator")
  }

  test("a group FIRST seen with all-NULL values stores sum 0 on the adopt path too") {
    // The first-batch commit adopts the delta aggregate directly; it must
    // store the same value the merge path would — sum 0, never NULL —
    // for a group whose batch values are all NULL (the two paths may not
    // disagree on what an identical batch writes).
    val view = tmp()
    val nullFirst = Seq(("2024-01-01", "click", Option.empty[Long]))
      .toDF("day", "event_type", "v")
    AggregateView.applyBatch(nullFirst, 0L, view, Seq("day", "event_type"), Seq("v"))
    val r = VersionedStore.read(spark, view).get.collect()
    assert(r.length === 1 && !r.head.isNullAt(r.head.fieldIndex("sum_v")) &&
      r.head.getAs[Long]("sum_v") === 0L,
      "adopt path must coalesce all-NULL sums to 0 like the merge path")
  }

  test("steady-state maintenance batch schedules a BOUNDED number of jobs") {
    // The view's per-batch constant is scheduler rounds × upstream
    // re-evaluation: deltas and the combined frame are pinned once
    // (localCheckpoint) and the control checks share single aggregates,
    // so a maintenance batch must stay within a fixed job budget — a
    // regression here is exactly the ~10-jobs-per-batch constant the
    // probe tier measured before the fold.
    val view = tmp()
    AggregateView.applyBatch(rows("2024-01-01", "click" -> 10L, "view" -> 1L),
      0L, view, Seq("day", "event_type"), Seq("v"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      AggregateView.applyBatch(rows("2024-01-02", "click" -> 3L), 1L, view,
        Seq("day", "event_type"), Seq("v"))
      // listener events are async; give the bus a beat to drain
      Thread.sleep(500)
    } finally spark.sparkContext.removeSparkListener(listener)
    val n = jobs.get()
    info(s"jobs per maintenance batch: $n")
    assert(n <= 8, s"a maintenance batch must schedule <= 8 jobs, saw $n")
  }

  private def signedRows(day: String, triples: (String, Long, String)*) =
    triples.map { case (t, v, ch) => (day, t, v, ch) }
      .toDF("day", "event_type", "v", "_change_type")

  test("signed (CDF) maintenance: deletes subtract, updates replace, and a " +
       "zeroed group persists as a tombstone the canonical read filters") {
    val view = tmp()
    AggregateView.applyBatch(
      signedRows("2024-01-01",
        ("click", 10L, "insert"), ("click", 5L, "insert"), ("view", 1L, "insert")),
      0L, view, Seq("day", "event_type"), Seq("v"))
    // update: click 5 -> 8 (preimage subtracts, postimage adds);
    // delete: the view group's only row — zeroes the group
    AggregateView.applyBatch(
      signedRows("2024-01-01",
        ("click", 5L, "update_preimage"), ("click", 8L, "update_postimage"),
        ("view", 1L, "delete")),
      1L, view, Seq("day", "event_type"), Seq("v"))
    val got = AggregateView.read(spark, view).get
      .select("event_type", "n_rows", "sum_v")
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(got === Seq(("click", 2L, 18L)),
      s"post-DML view must read as a recompute, got $got")
    // the zeroed group is STORED as a tombstone (merge+ledger are one
    // commit), invisible above, reclaimable offline
    val raw = VersionedStore.read(spark, view).get
      .filter(col("n_rows") === 0L)
      .select("event_type").as[String].collect().toSeq
    assert(raw === Seq("view"))
    AggregateView.purgeTombstones(spark, view, keys = Seq("day", "event_type"))
    assert(VersionedStore.read(spark, view).get
      .filter(col("n_rows") === 0L).count() === 0L)
    assert(AggregateView.read(spark, view).get
      .select("event_type").as[String].collect().toSeq === Seq("click"))
  }

  test("a signed replay is exactly-once; min/max reject the signed feed loudly") {
    val view = tmp()
    AggregateView.applyBatch(
      signedRows("2024-01-01", ("click", 10L, "insert")),
      0L, view, Seq("day", "event_type"), Seq("v"))
    AggregateView.applyBatch(
      signedRows("2024-01-01", ("click", 10L, "delete")),
      1L, view, Seq("day", "event_type"), Seq("v"))
    // replay of the delete batch must not subtract twice
    AggregateView.applyBatch(
      signedRows("2024-01-01", ("click", 10L, "delete")),
      1L, view, Seq("day", "event_type"), Seq("v"))
    val raw = VersionedStore.read(spark, view).get
      .select("n_rows", "sum_v").as[(Long, Long)].collect().toSeq
    assert(raw === Seq((0L, 0L)), s"replayed delete must be a no-op, got $raw")
    assert(AggregateView.read(spark, view).get.count() === 0L)
    val err = intercept[IllegalArgumentException] {
      AggregateView.applyBatch(
        signedRows("2024-01-02", ("click", 1L, "insert")),
        2L, view, Seq("day", "event_type"), Seq("v"), minCols = Seq("v"))
    }
    assert(err.getMessage.contains("grow-only"))
  }

  test("NULL group keys throw loudly (MERGE would fork the group); view stays uncommitted") {
    val view = tmp()
    val bad = Seq((null.asInstanceOf[String], "click", 1L)).toDF("day", "event_type", "v")
    val e = intercept[IllegalArgumentException] {
      AggregateView.applyBatch(bad, 0L, view, Seq("day", "event_type"), Seq("v"))
    }
    assert(e.getMessage.contains("NULL group keys"))
    assert(VersionedStore.currentVersion(spark, view) === 0L)
  }

  test("merge commits carry the ledger AND other writers' entries survive view maintenance") {
    val view = tmp()
    AggregateView.applyBatch(rows("2024-01-01", "click" -> 1L), 0L, view,
      Seq("day", "event_type"), Seq("v"))
    // a second writer (e.g. a raw append stream) stamps its own ledger key
    graft.streaming.VersionedStream.commitBatch(
      rows("2024-01-09", "click" -> 9L)
        .groupBy("day", "event_type")
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_rows"),
          org.apache.spark.sql.functions.sum(col("v")).as("sum_v")),
      0L, view, writerId = "other")
    AggregateView.applyBatch(rows("2024-01-01", "view" -> 2L), 1L, view,
      Seq("day", "event_type"), Seq("v"))
    val meta = VersionedStore.currentMeta(spark, view)
    assert(meta("batch.default") === "1")
    assert(meta("batch.other") === "0",
      "view maintenance must carry the other writer's ledger entry")
  }
}
