package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Parquet fixture loaders for the driver tables (TESTDATA.md / FIXTURES.md).
  *
  * Loaders are deliberately thin `spark.read.parquet` calls: callers narrow
  * with `select`/`filter` and Catalyst pushes projection + predicates into
  * the vectorized parquet scan (visible as `ReadSchema`/`PushedFilters` in
  * `.explain("formatted")`). At 100 TB these become partitioned/bucketed
  * table reads; nothing above this layer would change.
  */
object Tables {
  private def rd(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = rd(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = rd(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = rd(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = rd(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = rd(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = rd(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = rd(spark, dir, "lineitem")

  /** Event/sample log — stands in for the reference's daily-snapshot and
    * 5-minute online-sample time series (SURVEY.md §1.4, FIXTURES.md §A).
    *
    * `ts` has shipped in two physical encodings: parquet TIMESTAMP(NANOS)
    * (which Spark 4 refuses by default — PARQUET_TYPE_ILLEGAL — so we read
    * the nanos as a raw long via the runtime-settable legacy conf and
    * rebuild µs) and native TIMESTAMP(MICROS) without UTC adjustment (which
    * Spark reads directly as TIMESTAMP_NTZ). This loader is the ONE place
    * that knows about encodings: downstream operators always see a
    * TIMESTAMP_NTZ `ts` carrying the event's UTC wall-clock. The native
    * path stays cast-free above the scan, so column pruning AND any literal
    * ts predicates reach the parquet reader untouched; the legacy ns→µs
    * truncation is harmless because all "latest" semantics order by the
    * unique `event_id`, never by raw ts (SURVEY.md §1.2). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = rd(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case _        => raw
    }
  }

  def documents(spark: SparkSession, dir: String): DataFrame  = rd(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = rd(spark, dir, "embeddings")
}
