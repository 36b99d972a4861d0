package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query is a pure `(SparkSession, sfDir) => DataFrame` with a
  * DuckDB-runnable oracle in [[oracleSql]]. Determinism rules applied on
  * BOTH sides (SURVEY.md §7.4): unique tiebreak keys in every ORDER BY /
  * window; rank/count columns as BIGINT; money aggregates computed in
  * DECIMAL(18,2) and cast to DOUBLE at the output boundary; `event_id`
  * (unique, monotone) as the "latest" ordering key instead of ns timestamps
  * (Spark truncates parquet ns to µs — SURVEY.md §1.2).
  */
object SparkEntry {

  /** Flagship query (E2 diff-join) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Snapshots.gain(Tables.events(spark, "/root/testdata/sf0.001"), 1)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- domain family: snapshots / gains / leaderboards (SURVEY §2.1-2.7) ---
    "snapshot_daily" -> ((s, dir) =>
      Snapshots.dailySnapshot(Tables.events(s, dir))
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
        .orderBy("day", "user_id")),
    "gain_1d" -> ((s, dir) => Snapshots.gain(Tables.events(s, dir), 1)),
    "gain_7d" -> ((s, dir) => Snapshots.gain(Tables.events(s, dir), 7)),
    "gain_alltime" -> ((s, dir) => Snapshots.gainAllTime(Tables.events(s, dir))),
    "leaderboard" -> ((s, dir) => Snapshots.leaderboard(Tables.events(s, dir))),
    "point_lookup" -> ((s, dir) => Snapshots.pointLookup(Tables.events(s, dir), 3)),
    "exists_probe" -> ((s, dir) => Snapshots.existsProbe(Tables.events(s, dir))),
    "rookmaster" -> ((s, dir) => Snapshots.rookmaster(Tables.events(s, dir))),
    "onlinetime_daily" -> ((s, dir) => OnlineTime.daily(Tables.events(s, dir))),
    "onlinetime_7d" -> ((s, dir) => OnlineTime.period(Tables.events(s, dir), 7)),
    "skill_points" -> ((s, dir) => skillPointsQuery(s, dir)),
    // --- star-schema breadth (SURVEY §7.2 step 7) ---
    "q1_pricing" -> ((s, dir) => StarSchema.q1Pricing(Tables.lineitem(s, dir))),
    "q3_top_orders" -> ((s, dir) =>
      StarSchema.q3TopOrders(Tables.customer(s, dir), Tables.orders(s, dir), Tables.lineitem(s, dir))),
    "q5_region_revenue" -> ((s, dir) =>
      StarSchema.q5RegionRevenue(
        Tables.region(s, dir), Tables.nation(s, dir), Tables.customer(s, dir),
        Tables.orders(s, dir), Tables.lineitem(s, dir), Tables.supplier(s, dir))),
    "top_orders" -> ((s, dir) => StarSchema.topOrders(Tables.orders(s, dir))),
    "segment_stats" -> ((s, dir) => StarSchema.segmentStats(Tables.customer(s, dir))),
    "customer_top_orders" -> ((s, dir) => StarSchema.customerTopOrders(Tables.orders(s, dir))),
    "customers_without_orders" -> ((s, dir) =>
      StarSchema.customersWithoutOrders(Tables.customer(s, dir), Tables.orders(s, dir))),
  )

  /** Skill-points formula (X1) over the distinct level domain derived from
    * `events`, via the codegen'd [[graft.functions.SkillPointsExpr]]. Only
    * b=2 skills are oracle-checked (power-of-two arithmetic is exact in
    * IEEE double on both engines); all 7 skills have golden unit tests. */
  private def skillPointsQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.SkillPoints.skill_points
    Tables.events(s, dir)
      .select((floor(col("value")).cast("int") % 40 + 10).as("v"))
      .distinct()
      .select(
        col("v").cast("long").as("v"),
        skill_points(col("v"), "club").as("points_melee"),
        skill_points(col("v"), "distance").as("points_distance"))
      .orderBy("v")
  }

  /** Shared oracle CTE: the daily snapshot (latest value per day/user). */
  private val SnapCte =
    "snap AS (SELECT CAST(ts AS DATE) AS day, user_id, arg_max(value, event_id) AS value FROM events GROUP BY 1, 2)"
  private val MaxDayCte = "mx AS (SELECT max(day) AS end_day FROM snap)"

  private def gainSql(startExpr: String): String =
    s"""WITH $SnapCte, $MaxDayCte,
       | e AS (SELECT user_id, value AS end_value FROM snap, mx WHERE day = end_day),
       | s AS (SELECT user_id, value AS start_value FROM snap, mx WHERE day = $startExpr),
       | g AS (SELECT e.user_id AS user_id, end_value - start_value AS gain
       |       FROM e JOIN s ON e.user_id = s.user_id WHERE end_value - start_value > 0)
       |SELECT CAST(row_number() OVER (ORDER BY gain DESC, user_id) AS BIGINT) AS rank, user_id, gain
       |FROM g ORDER BY rank""".stripMargin

  private val Revenue =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "snapshot_daily" ->
      s"WITH $SnapCte SELECT CAST(day AS VARCHAR) AS day, user_id, value FROM snap ORDER BY day, user_id",
    "gain_1d" -> gainSql("end_day - 1"),
    "gain_7d" -> gainSql("end_day - 7"),
    "gain_alltime" -> gainSql("(SELECT min(day) FROM snap)"),
    "leaderboard" ->
      s"""WITH $SnapCte, $MaxDayCte,
         | cur AS (SELECT user_id, value FROM snap, mx WHERE day = end_day),
         | r AS (SELECT user_id, value,
         |       CAST(row_number() OVER (ORDER BY value DESC, user_id) AS BIGINT) AS rank FROM cur)
         |SELECT rank, user_id, value, CAST(1001 - rank AS BIGINT) AS points
         |FROM r WHERE rank <= 1000 ORDER BY rank""".stripMargin,
    "point_lookup" ->
      s"""WITH $SnapCte, $MaxDayCte
         |SELECT user_id, value FROM snap, mx WHERE day = end_day - 3 ORDER BY user_id""".stripMargin,
    "exists_probe" ->
      """SELECT count(*) AS n_events FROM events
        |WHERE CAST(ts AS DATE) = (SELECT max(CAST(ts AS DATE)) FROM events)""".stripMargin,
    "rookmaster" ->
      """WITH scores AS (SELECT event_type, user_id, sum(CAST(value AS DECIMAL(18,2))) AS score
        |               FROM events GROUP BY 1, 2),
        | pts AS (SELECT user_id,
        |         1001 - row_number() OVER (PARTITION BY event_type ORDER BY score DESC, user_id) AS points
        |         FROM scores),
        | total AS (SELECT user_id, CAST(sum(points) AS BIGINT) AS total_points,
        |           count(*) AS n_categories FROM pts GROUP BY 1)
        |SELECT CAST(row_number() OVER (ORDER BY total_points DESC, user_id) AS BIGINT) AS rank,
        |       user_id, total_points, n_categories
        |FROM total ORDER BY rank""".stripMargin,
    "onlinetime_daily" ->
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, user_id, CAST(5 * count(*) AS BIGINT) AS minutes,
        |       arg_max(event_type, event_id) AS last_event_type
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "onlinetime_7d" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, user_id, 5 * count(*) AS minutes
        |              FROM events GROUP BY 1, 2),
        | mx AS (SELECT max(day) AS end_day FROM daily),
        | agg AS (SELECT user_id, CAST(sum(minutes) AS BIGINT) AS minutes, max(day) AS last_day
        |         FROM daily, mx WHERE day >= end_day - 6 GROUP BY 1)
        |SELECT CAST(row_number() OVER (ORDER BY minutes DESC, last_day DESC, user_id) AS BIGINT) AS rank,
        |       user_id, minutes, CAST(last_day AS VARCHAR) AS last_day
        |FROM agg ORDER BY rank""".stripMargin,
    "skill_points" ->
      """WITH lv AS (SELECT DISTINCT CAST(floor(value) AS INTEGER) % 40 + 10 AS v FROM events)
        |SELECT CAST(v AS BIGINT) AS v,
        |       CAST((CAST(power(2, v - 10) AS BIGINT) - 1) * 50 // 1800 AS BIGINT) AS points_melee,
        |       CAST((CAST(power(2, v - 10) AS BIGINT) - 1) * 25 // 1000 AS BIGINT) AS points_distance
        |FROM lv ORDER BY v""".stripMargin,
    "q1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         | CAST(sum($Revenue) AS DOUBLE) AS sum_disc_price,
         | count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_orders" ->
      s"""SELECT l_orderkey, o_orderdate, CAST(sum($Revenue) AS DOUBLE) AS revenue
         |FROM customer
         | JOIN orders ON c_custkey = o_custkey
         | JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      s"""SELECT n_name, CAST(sum($Revenue) AS DOUBLE) AS revenue
         |FROM region
         | JOIN nation ON r_regionkey = n_regionkey
         | JOIN customer ON c_nationkey = n_nationkey
         | JOIN orders ON o_custkey = c_custkey
         | JOIN lineitem ON l_orderkey = o_orderkey
         | JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "segment_stats" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "customer_top_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "customers_without_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders) ORDER BY c_custkey""".stripMargin,
  )
}
