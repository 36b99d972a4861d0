package graft.sources

import java.util.concurrent.atomic.AtomicLong

/** In-process HTTP server standing in for the reference's live
  * leaderboard API (/root/reference/lib/src/etl.dart:71-73 — paginated
  * JSON over GET): a JDK `com.sun.net.httpserver.HttpServer` on an
  * ephemeral localhost port serving `GET /highscores?page=N` as
  * `{"page": N, "entries": [{rank, name, level, value, vocation,
  * world}, …]}` built from the SAME deterministic generator the
  * synthetic reader path uses — so the HTTP-backed scan shares the
  * synthetic scan's DuckDB oracle row-for-row.
  *
  * This is the live-ingestion seam made executable in a zero-egress
  * sandbox: [[PageReader]] issues real `java.net.http` GETs, real JSON
  * crosses a real socket, and [[requests]] counts what the SERVER saw —
  * the pruning proof (`level >= 30` must fetch 95 pages of 1000)
  * measured on the wire, not in the client. Swapping this fixture for
  * the external API is a `baseUrl` config change.
  *
  * Lifecycle: started lazily once per JVM, daemon threads, lives until
  * process exit (like the artifact stores, it is process-shared state
  * guarded by a lock).
  */
object LeaderboardHttpFixture {
  import PagedLeaderboard._

  private val requestCount = new AtomicLong(0L)
  private val worldsRequestCount = new AtomicLong(0L)
  @volatile private var started: Option[String] = None

  /** Total `/highscores` requests the server has served. */
  def requests: Long = requestCount.get()

  /** Total `/worlds` requests the server has served. */
  def worldsRequests: Long = worldsRequestCount.get()

  /** The worlds the fixture's dimension endpoint advertises — the same 8
    * names the page rows carry (`world = W{rank % 8}`). */
  val WorldNames: Seq[String] = (0 until 8).map(i => s"W$i")

  /** Test hook: which `/worlds` payload shape to serve. `ok` is the
    * reference-shaped happy path; the malformed variants mirror the
    * shapes the reference guards against (etl.dart:95-96): `worlds` not a
    * map, `regular_worlds` not a list, and non-map entries inside an
    * otherwise valid list. */
  @volatile var worldsMode: String = "ok"

  private def worldsJson: String = worldsMode match {
    case "worlds_not_map" => """{"worlds": 3}"""
    case "regular_not_list" => """{"worlds": {"regular_worlds": {"oops": 1}}}"""
    case "entry_not_map" =>
      """{"worlds": {"regular_worlds": ["garbage",
        | {"name": "W0", "location": "Europe", "pvp_type": "Open PvP"}, 42]}}""".stripMargin
    case _ =>
      val entries = WorldNames.zipWithIndex.map { case (w, i) =>
        s"""{"name": "$w", "location": "${if (i % 2 == 0) "Europe" else "America"}", """ +
          s""""pvp_type": "Open PvP"}"""
      }.mkString(", ")
      s"""{"worlds": {"regular_worlds": [$entries]}}"""
  }

  /** Start (once) and return the base URL, e.g. `http://127.0.0.1:41234`.
    *
    * LOCAL-MODE ASSUMPTION: the server binds loopback in the driver JVM
    * while the HTTP fetch happens inside [[PageReader]] on executors —
    * reachable only because this harness runs `local[*]` (executors share
    * the driver process). On a real cluster this fixture's URL would be
    * unreachable from executors; a deployment points `baseUrl` at a
    * service resolvable cluster-wide instead (the fixture exists solely to
    * make the wire path testable with zero egress).
    */
  def ensureStarted(): String = synchronized {
    started.getOrElse {
      val server = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/highscores", { exchange =>
        try {
          // Count first: the wire-pruning metric must see every request the
          // server received, including malformed ones.
          requestCount.incrementAndGet()
          val q = Option(exchange.getRequestURI.getQuery).getOrElse("")
          val page = q.split("&").collectFirst {
            case kv if kv.startsWith("page=") => kv.drop(5)
          }.getOrElse("1")
          page.toIntOption match {
            case Some(p) =>
              val body = pageJson(p).getBytes("UTF-8")
              exchange.getResponseHeaders.set("Content-Type", "application/json")
              exchange.sendResponseHeaders(200, body.length.toLong)
              exchange.getResponseBody.write(body)
            case None =>
              val body = s"""{"error": "malformed page parameter"}""".getBytes("UTF-8")
              exchange.getResponseHeaders.set("Content-Type", "application/json")
              exchange.sendResponseHeaders(400, body.length.toLong)
              exchange.getResponseBody.write(body)
          }
        } finally exchange.close()
      })
      // The reference's worlds-dimension endpoint (etl.dart:93): one JSON
      // document, `{"worlds": {"regular_worlds": [World, …]}}`.
      server.createContext("/worlds", { exchange =>
        try {
          worldsRequestCount.incrementAndGet()
          val body = worldsJson.getBytes("UTF-8")
          exchange.getResponseHeaders.set("Content-Type", "application/json")
          exchange.sendResponseHeaders(200, body.length.toLong)
          exchange.getResponseBody.write(body)
        } finally exchange.close()
      })
      // Small fixed pool: page partitions fetch concurrently under local[32].
      server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8, r => {
        val t = new Thread(r, "leaderboard-fixture"); t.setDaemon(true); t
      }))
      // The JDK server's HTTP-Dispatcher thread inherits daemon status
      // from the thread that calls start(). Started directly, it is
      // NON-daemon and pins the JVM open after main returns — Verify/
      // Bench would hang after finishing. Start from a daemon thread so
      // every server thread is daemon and process exit stays normal.
      val starter = new Thread(() => server.start(), "leaderboard-fixture-start")
      starter.setDaemon(true)
      starter.start()
      starter.join()
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      started = Some(base)
      base
    }
  }

  /** The page payload — the generator functions serialized as JSON (all
    * values numeric or [a-zA-Z0-9_] strings; no escaping needed). */
  private def pageJson(page: Int): String = {
    val sb = new StringBuilder(s"""{"page": $page, "entries": [""")
    var i = 0
    while (i < PageSize) {
      val rank = (page - 1) * PageSize + i + 1
      if (i > 0) sb.append(',')
      sb.append(s"""{"rank": $rank, "name": "char_$rank", "level": ${levelOf(rank)}, """)
      sb.append(s""""value": ${valueOf(rank)}, "vocation": "${vocationOf(rank)}", """)
      sb.append(s""""world": "W${rank % 8}"}""")
      i += 1
    }
    sb.append("]}").toString
  }
}
