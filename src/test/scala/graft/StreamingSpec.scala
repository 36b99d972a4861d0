package graft

import java.sql.Timestamp

import graft.streaming.OnlineTimeStream
import graft.streaming.OnlineTimeStream.{Sample, UserMinutes}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, date_format, window}
import org.apache.spark.sql.streaming.OutputMode

/** Streaming semantics (SURVEY.md §2.9): windowed daily accumulation and
  * explicit keyed state, driven deterministically with MemoryStream. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, h: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  test("windowed daily minutes over a streamed sample log") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Sample]
    val q = OnlineTimeStream.startToMemory(
      input.toDF(), "daily_minutes_test")
    try {
      input.addData(Sample(1L, ts(1, 1)), Sample(1L, ts(1, 2)), Sample(2L, ts(1, 3)))
      q.processAllAvailable()
      input.addData(Sample(1L, ts(2, 1)))
      q.processAllAvailable()
      val out = spark.table("daily_minutes_test").collect()
        .map(r => (r.getAs[java.sql.Date]("day").toString, r.getAs[Long]("user_id"), r.getAs[Long]("minutes")))
        .toSet
      assert(out.contains(("2024-01-01", 1L, 10L)))
      assert(out.contains(("2024-01-01", 2L, 5L)))
      assert(out.contains(("2024-01-02", 1L, 5L)))
    } finally q.stop()
  }

  test("hopping windows credit every event to exactly two slides, stream equals batch") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Sample]
    val q = OnlineTimeStream.hoppingMinutes(input.toDF())
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("hopping_minutes_test").start()
    // 01:00 lands in [D-1 12:00, D0 12:00) and [D0 00:00, D1 00:00);
    // 13:00 lands in [D0 00:00, ...) and [D0 12:00, ...): the 00:00
    // window accumulates BOTH events, split across micro-batches.
    val all = Seq(Sample(1L, ts(1, 1)), Sample(1L, ts(1, 13)), Sample(2L, ts(1, 13)))
    try {
      input.addData(all.head)
      q.processAllAvailable()
      input.addData(all.tail: _*)
      q.processAllAvailable()
      val streamed = spark.table("hopping_minutes_test").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2))).toSet
      assert(streamed === Set(
        ("2023-12-31 12:00:00.0", 1L, 5L),
        ("2024-01-01 00:00:00.0", 1L, 10L),
        ("2024-01-01 12:00:00.0", 1L, 5L),
        ("2024-01-01 00:00:00.0", 2L, 5L),
        ("2024-01-01 12:00:00.0", 2L, 5L)))
      // the same transform on the same rows as a BATCH frame agrees
      val batch = OnlineTimeStream.hoppingMinutes(
          all.toDF().select(col("ts"), col("user_id")))
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2))).toSet
      assert(batch === streamed, "hopping windows must unify batch and stream")
    } finally q.stop()
  }

  test("streaming HLL state converges to exactly the batch sketch estimate") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Sample]
    val q = OnlineTimeStream.streamingDistinctUsers(input.toDF())
      .toDF()
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("hll_stream_test").start()
    val all = (1 to 2).flatMap { b =>
      (1 to 40).map(i => Sample((b * 100 + i * 7 % 60).toLong, ts(1, i % 23)))
    }
    try {
      input.addData(all.take(40): _*)
      q.processAllAvailable()
      input.addData(all.drop(40): _*)
      q.processAllAvailable()
      // registers only grow, so the estimate is non-decreasing across
      // batches — the final state's emission is the max
      val streamed = spark.table("hll_stream_test").collect()
        .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
        .map { case (d, rows) => d -> rows.map(_._2).max }
      val batchDf = all.toDF("user_id", "ts")
        .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
      val batch = graft.operators.Sketches.hllDistinct(batchDf, Seq("day"), "user_id")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamed === batch,
        "per-day register state folded across micro-batches must equal the batch sketch")
    } finally q.stop()
  }

  test("streaming KMV state converges to exactly the batch min-k aggregate estimate") {
    implicit val sq = spark.sqlContext
    val k = 16 // small k so the fixture exercises the ≥k (estimating) regime
    val input = MemoryStream[Sample]
    val q = OnlineTimeStream.kmvDistinctUsers(input.toDF(), k)
      .toDF()
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("kmv_stream_test").start()
    val all = (1 to 3).flatMap { b =>
      (1 to 30).map(i => Sample((b * 1000 + i * 13 % 97).toLong, ts(1 + i % 2, i % 23)))
    }
    try {
      all.grouped(25).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      // the sketch only shrinks its k-th hash, so the estimate of the
      // FINAL state is the last emission per day
      val streamed = spark.table("kmv_stream_test").collect()
        .zipWithIndex.map { case (r, i) => (r.getString(0), (i, r.getDouble(1))) }
        .groupBy(_._1).map { case (d, rows) => d -> rows.maxBy(_._2._1)._2._2 }
      // batch twin #1: the same streaming function on a batch frame
      val batchDf = all.toDF("user_id", "ts")
      val viaState = OnlineTimeStream.kmvDistinctUsers(batchDf, k)
        .collect().map(r => r.day -> r.est_distinct).toMap
      // batch twin #2: the MinKAgg column pipeline + column estimator
      val viaAgg = graft.operators.Kmv.sketch(
          batchDf.select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id")),
          col("day"), col("user_id").cast("string"), k)
        .select(col("grp"), graft.operators.Kmv.distinctEstimate(col("kmv"), k).as("est"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(streamed === viaState, "micro-batch folds must equal the batch state run")
      assert(streamed === viaAgg, "state path and MinKAgg column path must agree bit-for-bit")
    } finally q.stop()
  }

  test("hopping-window HLL state across micro-batches equals the batch register pipeline") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Sample]
    val q = OnlineTimeStream.hoppingDistinctUsers(input.toDF())
      .toDF()
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("hopping_hll_test").start()
    // users straddle the 12:00 slide boundary and repeat across batches,
    // so windows accumulate registers from BOTH micro-batches
    val all = (1 to 80).map(i => Sample((i * 13 % 37).toLong, ts(1 + i % 2, i % 23)))
    try {
      input.addData(all.take(37): _*)
      q.processAllAvailable()
      input.addData(all.drop(37): _*)
      q.processAllAvailable()
      // registers only grow → per-window estimates are non-decreasing;
      // the last emission per window is the final state's
      val streamed = spark.table("hopping_hll_test").collect()
        .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
        .map { case (w, rows) => w -> rows.map(_._2).max }
      // the SAME window expansion, declaratively, through the batch
      // register aggregation — must agree exactly
      val expanded = all.toDF("user_id", "ts").select(
        date_format(window(col("ts"), "1 day", "12 hours")("start"),
          "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("user_id"))
      val batch = graft.operators.Sketches.hllDistinct(expanded, Seq("wstart"), "user_id")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamed === batch,
        "per-window register state folded across micro-batches must equal the batch sketch")
    } finally q.stop()
  }

  test("streaming dedup drops re-delivered events across micro-batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val q = OnlineTimeStream.dedupEvents(
      input.toDF().toDF("event_id", "ts"))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_events_test").start()
    try {
      input.addData((1L, ts(1, 1)), (2L, ts(1, 1)), (1L, ts(1, 1))) // dup in-batch
      q.processAllAvailable()
      input.addData((2L, ts(1, 1)), (3L, ts(1, 2)))                 // dup across batches
      q.processAllAvailable()
      val ids = spark.table("dedup_events_test").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("foreachBatch merge-upsert: stream lands in the partitioned store, updates converge") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-store")
    val path = s"$dir/store"
    val input = MemoryStream[Sample]
    val q = OnlineTimeStream.startToStore(input.toDF(), path, s"$dir/ckpt")
    try {
      // batch 1: day1 u1 (2 sightings) + u2
      input.addData(Sample(1L, ts(1, 1)), Sample(1L, ts(1, 2)), Sample(2L, ts(1, 3)))
      q.processAllAvailable()
      // batch 2: day1 u1 again (total must become 15, u2 must SURVIVE the
      // partition rewrite) + a new day2 user
      input.addData(Sample(1L, ts(1, 4)), Sample(3L, ts(2, 1)))
      q.processAllAvailable()
      val out = spark.read.parquet(path)
        .select(org.apache.spark.sql.functions.col("day").cast("string"),
          org.apache.spark.sql.functions.col("user_id"),
          org.apache.spark.sql.functions.col("minutes"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(out === Set(
        ("2024-01-01", 1L, 15L),
        ("2024-01-01", 2L, 5L),
        ("2024-01-02", 3L, 5L)))
    } finally q.stop()
  }

  test("session windows merge within the gap, split across it, finalize on watermark") {
    implicit val sq = spark.sqlContext
    def tm(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val input = MemoryStream[Sample]
    val q = OnlineTimeStream.sessionMinutes(input.toDF(), gap = "30 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("session_minutes_test").start()
    try {
      // u1: 10:00, 10:20 (merge — 20min gap), 11:30 (new session);
      // u2: one lone sample
      input.addData(Sample(1L, tm(10, 0)), Sample(1L, tm(10, 20)), Sample(2L, tm(10, 5)))
      q.processAllAvailable()
      input.addData(Sample(1L, tm(11, 30)))
      q.processAllAvailable()
      input.addData(Sample(9L, tm(14, 0))) // advance watermark past 11:30+30m+10m
      q.processAllAvailable()
      val out = spark.table("session_minutes_test").collect()
        .map(r => (r.getLong(2), r.getTimestamp(0), r.getLong(3)))
      val u1 = out.filter(_._1 == 1L).sortBy(_._2.getTime)
      assert(u1.map(_._3).toSeq === Seq(10L, 5L), "merged 2-sample session, then a new one")
      assert(u1.head._2 === tm(10, 0) && u1.last._2 === tm(11, 30))
      assert(out.filter(_._1 == 2L).map(_._3).toSeq === Seq(5L))
    } finally q.stop()
  }

  test("stream-stream attribution join matches within the horizon across batches") {
    implicit val sq = spark.sqlContext
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    val views = MemoryStream[(Long, Timestamp, Long)]
    val joined = OnlineTimeStream.attributionJoin(
      purchases.toDF().toDF("user_id", "ts", "event_id"),
      views.toDF().toDF("user_id", "ts", "event_id"))
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("attribution_test").start()
    try {
      def t(day: Int, h: Int, m: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:$m%02d:00")
      purchases.addData((1L, t(1, 10, 0), 900L), (2L, t(1, 10, 0), 901L))
      q.processAllAvailable()
      // views arrive in a LATER micro-batch: the buffered purchase state
      // must still match. u1 view inside the 1h horizon; u1 view outside;
      // u2 view before the purchase (no match); u9 view with no purchase.
      views.addData((1L, t(1, 10, 30), 100L), (1L, t(1, 11, 30), 101L),
        (2L, t(1, 9, 30), 102L), (9L, t(1, 10, 15), 103L))
      q.processAllAvailable()
      val out = spark.table("attribution_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(out === Set((1L, 900L, 100L)))
    } finally q.stop()
  }

  test("mapGroupsWithState accumulates +5 per sighting across batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Sample]
    val q = OnlineTimeStream.runningMinutes(input.toDS())
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("running_minutes_test").start()
    try {
      input.addData(Sample(1L, ts(1, 1)), Sample(1L, ts(1, 2)))
      q.processAllAvailable()
      input.addData(Sample(1L, ts(1, 3)), Sample(2L, ts(1, 3)))
      q.processAllAvailable()
      val out = spark.table("running_minutes_test").as[UserMinutes].collect()
      // latest state per user: u1 = 15 (10 then +5), u2 = 5
      assert(out.filter(_.user_id == 1L).map(_.minutes).max === 15L)
      assert(out.filter(_.user_id == 2L).map(_.minutes).max === 5L)
    } finally q.stop()
  }
}
