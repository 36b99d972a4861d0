package graft

import graft.sources.{LeaderboardHttpFixture, PagedLeaderboard}
import org.apache.spark.sql.functions._

/** The live-ingestion path, end to end over a real socket: the DSv2
  * source issues real `java.net.http` GETs against the in-process JSON
  * fixture server, and the pruning claims are measured on what the
  * SERVER saw — not inferred from the plan. */
class HttpPagedSourceSpec extends SparkSpec {

  private def read(maxPages: Int, http: Boolean) = {
    val r = spark.read.format("graft.sources.PagedLeaderboardProvider")
      .option("maxPages", maxPages.toString)
    (if (http) r.option("baseUrl", LeaderboardHttpFixture.ensureStarted()) else r).load()
  }

  test("HTTP rows equal the synthetic generator rows, page for page") {
    val viaHttp = read(40, http = true).collect().map(_.toSeq).toSet
    val viaGen = read(40, http = false).collect().map(_.toSeq).toSet
    assert(viaHttp.size === 40 * PagedLeaderboard.PageSize)
    assert(viaHttp === viaGen, "wire payloads must reproduce the generator exactly")
  }

  test("filter pushdown prunes FETCHES on the wire: level >= 30 = 95 pages of 1000") {
    val before = LeaderboardHttpFixture.requests
    val n = read(1000, http = true).filter(col("level") >= 30).count()
    val served = LeaderboardHttpFixture.requests - before
    assert(n === PagedLeaderboard.lastQualifyingRank(30).toLong)
    assert(served === 95L,
      s"server must see only the 95 qualifying pages, saw $served")
  }

  test("limit pushdown bounds fetches: limit(60) = 2 pages") {
    val before = LeaderboardHttpFixture.requests
    val n = read(1000, http = true).limit(60).collect().length
    val served = LeaderboardHttpFixture.requests - before
    assert(n === 60)
    assert(served === 2L, s"limit(60) must fetch 2 pages, saw $served")
  }

  /** The joined pipeline paged_scan_http runs: scan ⋈ wire-fetched dim. */
  private def scanWithWorldsDim(maxPages: Int) = {
    val base = LeaderboardHttpFixture.ensureStarted()
    val worlds = graft.functions.SnapshotJson
      .parseWorlds(spark, PagedLeaderboard.fetchWorldsJson(base))
      .select(col("name").as("world"))
    read(maxPages, http = true).join(broadcast(worlds), Seq("world"))
  }

  test("worlds dimension arrives over the wire and the full dim is row-preserving") {
    val before = LeaderboardHttpFixture.worldsRequests
    val dim = graft.functions.SnapshotJson
      .parseWorlds(spark, PagedLeaderboard.fetchWorldsJson(LeaderboardHttpFixture.ensureStarted()))
      .collect()
    assert(LeaderboardHttpFixture.worldsRequests - before === 1L, "exactly one dimension GET")
    assert(dim.map(_.getString(0)).sorted.toSeq === LeaderboardHttpFixture.WorldNames)
    assert(dim.forall(r => r.getString(1) != null && r.getString(2) != null))
    // All 8 worlds present -> the dim join keeps every scan row.
    assert(scanWithWorldsDim(5).count() === 5L * PagedLeaderboard.PageSize)
  }

  test("malformed worlds payloads degrade to empty, matching reference shape guards") {
    try {
      for (mode <- Seq("worlds_not_map", "regular_not_list")) {
        LeaderboardHttpFixture.worldsMode = mode
        val dim = graft.functions.SnapshotJson.parseWorlds(
          spark, PagedLeaderboard.fetchWorldsJson(LeaderboardHttpFixture.ensureStarted()))
        assert(dim.count() === 0L, s"$mode must yield zero worlds")
        assert(scanWithWorldsDim(3).count() === 0L,
          s"$mode must degrade the joined scan to empty, not fail")
      }
      // Non-map entries are skipped; valid siblings survive (etl.dart:101).
      LeaderboardHttpFixture.worldsMode = "entry_not_map"
      val partial = graft.functions.SnapshotJson.parseWorlds(
        spark, PagedLeaderboard.fetchWorldsJson(LeaderboardHttpFixture.ensureStarted()))
        .collect()
      assert(partial.map(_.getString(0)).toSeq === Seq("W0"),
        "the one valid map entry must survive its malformed siblings")
      // Only W0 in the dim -> exactly the W0 rows of the scan survive.
      val kept = scanWithWorldsDim(4).select("world").distinct().collect().map(_.getString(0))
      assert(kept.toSeq === Seq("W0"))
    } finally LeaderboardHttpFixture.worldsMode = "ok"
  }

  test("a failing fetch fails the task loudly (non-200 -> exception, not a short page)") {
    val ex = intercept[Exception] {
      spark.read.format("graft.sources.PagedLeaderboardProvider")
        .option("maxPages", "1")
        .option("baseUrl", LeaderboardHttpFixture.ensureStarted() + "/missing")
        .load().count()
    }
    assert(ex.getMessage != null)
  }
}
